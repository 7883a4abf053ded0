package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SQL Server MERGE writer (reference: odibi/writers/sql_server_writer.py —
 * staging-table + driver-side T-SQL MERGE pattern; merge SQL generation
 * :1244-1339, execute :1339-1520, key validation :558-607, overwrite
 * strategies :103-108).
 *
 * Architecture: Spark writes the batch to a staging table (via JDBC on a
 * real cluster; the `stage` function is injected so this environment's
 * tests use a stub), then ONE driver-side T-SQL MERGE moves staging into
 * the target atomically on the server. All SQL execution goes through the
 * pluggable [[SqlExecutor]] — a thin seam over `java.sql.Connection`
 * (no DB driver ships in this sandbox, so specs assert the generated SQL
 * and the statement flow against a recording stub).
 */
object SqlServerWriter {

  /** Driver-side SQL seam: statement -> result rows (empty for DDL/DML). */
  trait SqlExecutor {
    def execute(sql: String): Seq[Seq[Any]]
  }

  /**
   * Statement-generation seam. [[TSqlDialect]] (the default everywhere)
   * reproduces the reference's T-SQL byte-for-byte; [[AnsiDialect]] emits
   * standard-SQL MERGE/DDL that embedded engines execute, which is what
   * lets DerbyIntegrationSpec run the REAL staging -> MERGE -> read-back
   * flow against a live database in this sandbox (Derby ships with Spark).
   */
  sealed trait SqlDialect {
    def escapeColumn(c: String): String
    def escapeTable(t: String): String = t.split('.').map(escapeColumn).mkString(".")
    /** server-side "now" for audit columns */
    def nowExpr: String
    def dropStagingSql(staging: String): String
    def addColumnSql(table: String, column: String, sqlType: String): String
    /** single-column result: the table's column names */
    def columnsQuery(table: String): String
    def sqlType(dt: org.apache.spark.sql.types.DataType): String
  }

  /** SQL Server T-SQL (writer.py's target dialect). */
  case object TSqlDialect extends SqlDialect {
    def escapeColumn(c: String): String = s"[${c.replace("]", "]]")}]"
    def nowExpr: String = "GETUTCDATE()"
    def dropStagingSql(staging: String): String =
      s"DROP TABLE IF EXISTS ${escapeTable(staging)}"
    def addColumnSql(table: String, column: String, sqlType: String): String =
      s"ALTER TABLE ${escapeTable(table)} ADD ${escapeColumn(column)} $sqlType NULL"
    def columnsQuery(table: String): String = {
      val parts = table.split('.')
      val (schema, name) = if (parts.length > 1) (parts(0), parts.last) else ("dbo", table)
      "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS " +
        s"WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$name'"
    }
    def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      dt match {
        case IntegerType | ShortType | ByteType => "INT"
        case LongType => "BIGINT"
        case DoubleType => "FLOAT"
        case FloatType => "REAL"
        case BooleanType => "BIT"
        case TimestampType | TimestampNTZType => "DATETIME2"
        case DateType => "DATE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case BinaryType => "VARBINARY(MAX)"
        case _ => "NVARCHAR(MAX)"
      }
    }
  }

  /**
   * Standard-SQL dialect (Derby et al.). Column identifiers are
   * double-quoted exactly as given — matching how Spark's JDBC writer
   * creates staging-table columns — while TABLE names stay unquoted so
   * they case-fold identically on the create path (Spark passes `dbtable`
   * through unquoted) and in the SQL generated here.
   */
  case object AnsiDialect extends SqlDialect {
    def escapeColumn(c: String): String = "\"" + c.replace("\"", "\"\"") + "\""
    override def escapeTable(t: String): String = t
    def nowExpr: String = "CURRENT_TIMESTAMP"
    def dropStagingSql(staging: String): String = s"DROP TABLE $staging"
    def addColumnSql(table: String, column: String, sqlType: String): String =
      s"ALTER TABLE $table ADD COLUMN ${escapeColumn(column)} $sqlType"
    def columnsQuery(table: String): String = {
      val parts = table.split('.')
      val (schema, name) =
        if (parts.length > 1) (parts(0).toUpperCase, parts.last.toUpperCase)
        else ("APP", table.toUpperCase)
      "SELECT c.columnname FROM sys.syscolumns c " +
        "JOIN sys.systables t ON c.referenceid = t.tableid " +
        "JOIN sys.sysschemas s ON t.schemaid = s.schemaid " +
        s"WHERE t.tablename = '$name' AND s.schemaname = '$schema'"
    }
    def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      dt match {
        case IntegerType | ShortType | ByteType => "INTEGER"
        case LongType => "BIGINT"
        case DoubleType => "DOUBLE"
        case FloatType => "REAL"
        case BooleanType => "BOOLEAN"
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case DateType => "DATE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case BinaryType => "BLOB"
        case _ => "VARCHAR(4000)"
      }
    }
  }

  /**
   * [[SqlExecutor]] over a live `java.sql.Connection`. Walks ALL results
   * of a statement (T-SQL batches like DECLARE..MERGE..SELECT return the
   * count rows as a later result set; single ANSI statements return one),
   * so the same executor drives a real SQL Server and embedded engines.
   */
  final class JdbcExecutor(url: String) extends SqlExecutor with AutoCloseable {
    private val conn = java.sql.DriverManager.getConnection(url)
    override def execute(sql: String): Seq[Seq[Any]] = {
      val st = conn.createStatement()
      try {
        var hasResultSet = st.execute(sql)
        val out = Seq.newBuilder[Seq[Any]]
        var more = true
        while (more) {
          if (hasResultSet) {
            val rs = st.getResultSet
            val n = rs.getMetaData.getColumnCount
            while (rs.next()) out += (1 to n).map(rs.getObject(_)).toSeq
          }
          hasResultSet = st.getMoreResults()
          more = hasResultSet || st.getUpdateCount != -1
        }
        out.result()
      } finally st.close()
    }
    override def close(): Unit = conn.close()
  }

  final case class AuditCols(createdCol: Option[String] = None,
                             updatedCol: Option[String] = None)

  final case class MergeOptions(updateCondition: Option[String] = None,
                                insertCondition: Option[String] = None,
                                deleteCondition: Option[String] = None,
                                excludeColumns: Seq[String] = Nil,
                                auditCols: AuditCols = AuditCols())

  final case class MergeResult(inserted: Long = 0, updated: Long = 0, deleted: Long = 0) {
    def totalAffected: Long = inserted + updated + deleted
  }

  final case class ValidationResult(isValid: Boolean, nullKeyCount: Long,
                                    duplicateKeyCount: Long)

  private[sources] def escapeColumn(c: String): String = s"[${c.replace("]", "]]")}]"

  /** `schema.table` -> `[schema].[table]` (writer.py:193-197). */
  private[sources] def escapeTable(t: String): String =
    t.split('.').map(escapeColumn).mkString(".")

  /** Staging table name beside the target (writer.py:145-163). */
  def stagingTableName(targetTable: String, stagingSchema: String = "staging"): String = {
    val base = targetTable.split('.').last
    s"$stagingSchema.${base}_staging"
  }

  /**
   * Pre-merge key validation, computed in Spark before anything is staged
   * (writer.py:558-607): merge keys must be non-null and unique.
   */
  def validateKeys(df: DataFrame, keys: Seq[String]): ValidationResult = {
    val nullKeys = df.filter(keys.map(col(_).isNull).reduce(_ || _)).count()
    val dupKeys = df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).count()
    ValidationResult(nullKeys == 0 && dupKeys == 0, nullKeys, dupKeys)
  }

  /**
   * T-SQL MERGE statement (writer.py:1244-1339): OUTPUT $action into a
   * table variable so the insert/update/delete counts come back in one
   * round trip.
   */
  def buildMergeSql(targetTable: String, stagingTable: String,
                    mergeKeys: Seq[String], columns: Seq[String],
                    options: MergeOptions = MergeOptions()): String = {
    val exclude = options.excludeColumns.toSet
    val created = options.auditCols.createdCol
    val updated = options.auditCols.updatedCol
    val mergeCols = columns.filterNot(exclude)
    val updateCols = mergeCols.filterNot(c => mergeKeys.contains(c) || created.contains(c))
    val insertCols = mergeCols

    val onClause = mergeKeys
      .map(k => s"target.${escapeColumn(k)} = source.${escapeColumn(k)}").mkString(" AND ")
    val updateSet = updateCols.map {
      case c if updated.contains(c) => s"${escapeColumn(c)} = GETUTCDATE()"
      case c => s"${escapeColumn(c)} = source.${escapeColumn(c)}"
    }.mkString(",\n            ")
    val insertValues = insertCols.map {
      case c if created.contains(c) || updated.contains(c) => "GETUTCDATE()"
      case c => s"source.${escapeColumn(c)}"
    }.mkString(", ")

    val parts = Seq.newBuilder[String]
    parts += "DECLARE @MergeActions TABLE (action NVARCHAR(10));"
    parts += ""
    parts += s"MERGE ${escapeTable(targetTable)} AS target"
    parts += s"USING ${escapeTable(stagingTable)} AS source"
    parts += s"ON $onClause"
    parts += options.updateCondition
      .map(c => s"WHEN MATCHED AND $c THEN").getOrElse("WHEN MATCHED THEN")
    parts += "    UPDATE SET"
    parts += s"        $updateSet"
    options.deleteCondition.foreach { c =>
      parts += s"WHEN MATCHED AND $c THEN"
      parts += "    DELETE"
    }
    parts += options.insertCondition
      .map(c => s"WHEN NOT MATCHED BY TARGET AND $c THEN")
      .getOrElse("WHEN NOT MATCHED BY TARGET THEN")
    parts += s"    INSERT (${insertCols.map(escapeColumn).mkString(", ")})"
    parts += s"    VALUES ($insertValues)"
    parts += "OUTPUT $action INTO @MergeActions;"
    parts += ""
    parts += "SELECT"
    parts += "    SUM(CASE WHEN action = 'INSERT' THEN 1 ELSE 0 END) AS inserted,"
    parts += "    SUM(CASE WHEN action = 'UPDATE' THEN 1 ELSE 0 END) AS updated,"
    parts += "    SUM(CASE WHEN action = 'DELETE' THEN 1 ELSE 0 END) AS deleted"
    parts += "FROM @MergeActions;"
    parts.result().mkString("\n")
  }

  /**
   * Standard-SQL MERGE (Derby/ANSI): no OUTPUT clause, so action counts
   * come from [[ansiMergeCounts]] instead. Clause order matches the T-SQL
   * builder (update, then delete, then insert) — both dialects process a
   * matched row with the FIRST applicable WHEN clause.
   */
  def buildMergeSqlAnsi(targetTable: String, stagingTable: String,
                        mergeKeys: Seq[String], columns: Seq[String],
                        options: MergeOptions = MergeOptions()): String = {
    val d = AnsiDialect
    val exclude = options.excludeColumns.toSet
    val created = options.auditCols.createdCol
    val updated = options.auditCols.updatedCol
    val mergeCols = columns.filterNot(exclude)
    val updateCols = mergeCols.filterNot(c => mergeKeys.contains(c) || created.contains(c))
    val insertCols = mergeCols
    val onClause = mergeKeys
      .map(k => s"target.${d.escapeColumn(k)} = source.${d.escapeColumn(k)}")
      .mkString(" AND ")
    val updateSet = updateCols.map {
      case c if updated.contains(c) => s"${d.escapeColumn(c)} = ${d.nowExpr}"
      case c => s"${d.escapeColumn(c)} = source.${d.escapeColumn(c)}"
    }.mkString(", ")
    val insertValues = insertCols.map {
      case c if created.contains(c) || updated.contains(c) => d.nowExpr
      case c => s"source.${d.escapeColumn(c)}"
    }.mkString(", ")
    val parts = Seq.newBuilder[String]
    parts += s"MERGE INTO ${d.escapeTable(targetTable)} target"
    parts += s"USING ${d.escapeTable(stagingTable)} source"
    parts += s"ON $onClause"
    parts += options.updateCondition
      .map(c => s"WHEN MATCHED AND $c THEN").getOrElse("WHEN MATCHED THEN")
    parts += s"    UPDATE SET $updateSet"
    options.deleteCondition.foreach { c =>
      parts += s"WHEN MATCHED AND $c THEN"
      parts += "    DELETE"
    }
    parts += options.insertCondition
      .map(c => s"WHEN NOT MATCHED AND $c THEN")
      .getOrElse("WHEN NOT MATCHED THEN")
    parts += s"    INSERT (${insertCols.map(d.escapeColumn).mkString(", ")})"
    parts += s"    VALUES ($insertValues)"
    parts.result().mkString("\n")
  }

  /**
   * Pre-merge action counts for dialects without an OUTPUT clause,
   * computed BY THE DATABASE with the same first-clause-wins semantics the
   * MERGE applies: updated = matched AND updateCondition; deleted =
   * matched AND deleteCondition AND NOT updateCondition (an unconditional
   * update clause shadows the delete clause entirely — same as T-SQL);
   * inserted = unmatched staging rows passing insertCondition.
   */
  private def ansiMergeCounts(executor: SqlExecutor, targetTable: String,
                              stagingTable: String, mergeKeys: Seq[String],
                              options: MergeOptions): MergeResult = {
    val d = AnsiDialect
    val onClause = mergeKeys
      .map(k => s"target.${d.escapeColumn(k)} = source.${d.escapeColumn(k)}")
      .mkString(" AND ")
    def count(sql: String): Long =
      executor.execute(sql).headOption.flatMap(_.headOption).map(toLong).getOrElse(0L)
    val matchedFrom =
      s"FROM ${d.escapeTable(targetTable)} target " +
        s"JOIN ${d.escapeTable(stagingTable)} source ON $onClause"
    val updated = count(s"SELECT COUNT(*) $matchedFrom" +
      options.updateCondition.map(c => s" WHERE $c").getOrElse(""))
    val deleted = (options.deleteCondition, options.updateCondition) match {
      case (Some(del), Some(upd)) =>
        count(s"SELECT COUNT(*) $matchedFrom WHERE ($del) AND NOT ($upd)")
      case _ => 0L // no delete clause, or an unconditional update shadows it
    }
    val inserted = count(
      s"SELECT COUNT(*) FROM ${d.escapeTable(stagingTable)} source " +
        s"WHERE NOT EXISTS (SELECT 1 FROM ${d.escapeTable(targetTable)} target WHERE $onClause)" +
        options.insertCondition.map(c => s" AND ($c)").getOrElse(""))
    MergeResult(inserted, updated, deleted)
  }

  /**
   * Schema evolution before a write (writer.py:851-889 semantics):
   * `strict` rejects new DataFrame columns, `evolve` ALTERs them into the
   * target (`addColumns = false` skips the DDL), `ignore` writes only the
   * intersection. Returns the columns to write.
   */
  def evolveSchema(df: DataFrame, table: String, executor: SqlExecutor,
                   dialect: SqlDialect = TSqlDialect, mode: String = "evolve",
                   addColumns: Boolean = true): Seq[String] = {
    val existing = executor.execute(dialect.columnsQuery(table))
      .flatMap(_.headOption).map(_.toString)
    require(existing.nonEmpty, s"schema evolution: $table has no columns — does it exist?")
    val newCols = df.schema.fields
      .filterNot(f => existing.exists(_.equalsIgnoreCase(f.name)))
    mode match {
      case "strict" =>
        require(newCols.isEmpty,
          s"schema evolution mode is 'strict' but the DataFrame has new columns " +
            s"not in $table: ${newCols.map(_.name).mkString(", ")}")
        df.columns.toSeq
      case "evolve" =>
        if (addColumns) newCols.foreach { f =>
          executor.execute(dialect.addColumnSql(table, f.name, dialect.sqlType(f.dataType)))
        }
        df.columns.toSeq
      case "ignore" =>
        df.columns.toSeq.filter(c => existing.exists(_.equalsIgnoreCase(c)))
      case other => throw new IllegalArgumentException(
        s"schema evolution mode must be strict/evolve/ignore, got $other")
    }
  }

  private def toLong(v: Any): Long = v match {
    case null => 0L
    case n: Number => n.longValue()
    case other => other.toString.toLong
  }

  /**
   * Full merge flow (writer.py:1522-1640): validate keys → stage the batch
   * → empty-target fast INSERT...SELECT, else full MERGE → drop staging.
   * `stage` writes `df` into `stagingTable` (df.write.jdbc on a cluster).
   */
  def merge(df: DataFrame, targetTable: String, mergeKeys: Seq[String],
            executor: SqlExecutor, stage: (DataFrame, String) => Unit,
            options: MergeOptions = MergeOptions(),
            stagingSchema: String = "staging",
            dialect: SqlDialect = TSqlDialect): MergeResult = {
    val validation = validateKeys(df, mergeKeys)
    require(validation.isValid,
      s"merge key validation failed: ${validation.nullKeyCount} null keys, " +
        s"${validation.duplicateKeyCount} duplicate keys")

    val staging = stagingTableName(targetTable, stagingSchema)
    stage(df, staging)
    try {
      val count = executor.execute(s"SELECT COUNT(*) FROM ${dialect.escapeTable(targetTable)}")
      val targetRows = count.headOption.flatMap(_.headOption).map(toLong).getOrElse(0L)
      if (targetRows == 0L) {
        // empty target: INSERT...SELECT is far cheaper than MERGE
        val cols = df.columns.filterNot(options.excludeColumns.contains)
          .map(dialect.escapeColumn).mkString(", ")
        executor.execute(
          s"INSERT INTO ${dialect.escapeTable(targetTable)} ($cols) " +
            s"SELECT $cols FROM ${dialect.escapeTable(staging)}")
        MergeResult(inserted = df.count())
      } else dialect match {
        case TSqlDialect =>
          val rows = executor.execute(buildMergeSql(targetTable, staging, mergeKeys,
            df.columns.toSeq, options))
          rows.headOption.map(r => MergeResult(
            toLong(r.lift(0).orNull), toLong(r.lift(1).orNull), toLong(r.lift(2).orNull)))
            .getOrElse(MergeResult())
        case AnsiDialect =>
          // no OUTPUT clause in standard MERGE: counts are computed by the
          // database first, then the merge runs
          val counts = ansiMergeCounts(executor, targetTable, staging, mergeKeys, options)
          executor.execute(buildMergeSqlAnsi(targetTable, staging, mergeKeys,
            df.columns.toSeq, options))
          counts
      }
    } finally {
      executor.execute(dialect.dropStagingSql(staging))
      ()
    }
  }

  /**
   * Overwrite strategies (writer.py:103-108 / Phase 2): `truncate_insert`
   * keeps the table + permissions; `delete_insert` is transaction-friendly.
   */
  def overwrite(df: DataFrame, targetTable: String, executor: SqlExecutor,
                stage: (DataFrame, String) => Unit,
                strategy: String = "truncate_insert",
                stagingSchema: String = "staging",
                dialect: SqlDialect = TSqlDialect): Long = {
    val staging = stagingTableName(targetTable, stagingSchema)
    stage(df, staging)
    try {
      strategy match {
        case "truncate_insert" =>
          executor.execute(s"TRUNCATE TABLE ${dialect.escapeTable(targetTable)}")
        case "delete_insert" =>
          executor.execute(s"DELETE FROM ${dialect.escapeTable(targetTable)}")
        case other => throw new IllegalArgumentException(s"unknown strategy: $other")
      }
      val cols = df.columns.map(dialect.escapeColumn).mkString(", ")
      executor.execute(s"INSERT INTO ${dialect.escapeTable(targetTable)} ($cols) " +
        s"SELECT $cols FROM ${dialect.escapeTable(staging)}")
      df.count()
    } finally {
      executor.execute(dialect.dropStagingSql(staging))
      ()
    }
  }
}
