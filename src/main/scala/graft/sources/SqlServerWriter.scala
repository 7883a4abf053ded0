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
            stagingSchema: String = "staging"): MergeResult = {
    val validation = validateKeys(df, mergeKeys)
    require(validation.isValid,
      s"merge key validation failed: ${validation.nullKeyCount} null keys, " +
        s"${validation.duplicateKeyCount} duplicate keys")

    val staging = stagingTableName(targetTable, stagingSchema)
    stage(df, staging)
    try {
      val count = executor.execute(s"SELECT COUNT(*) FROM ${escapeTable(targetTable)}")
      val targetRows = count.headOption.flatMap(_.headOption).map(toLong).getOrElse(0L)
      if (targetRows == 0L) {
        // empty target: INSERT...SELECT is far cheaper than MERGE
        val cols = df.columns.filterNot(options.excludeColumns.contains)
          .map(escapeColumn).mkString(", ")
        executor.execute(
          s"INSERT INTO ${escapeTable(targetTable)} ($cols) " +
            s"SELECT $cols FROM ${escapeTable(staging)}")
        MergeResult(inserted = df.count())
      } else {
        val rows = executor.execute(buildMergeSql(targetTable, staging, mergeKeys,
          df.columns.toSeq, options))
        rows.headOption.map(r => MergeResult(
          toLong(r.lift(0).orNull), toLong(r.lift(1).orNull), toLong(r.lift(2).orNull)))
          .getOrElse(MergeResult())
      }
    } finally {
      executor.execute(s"DROP TABLE IF EXISTS ${escapeTable(staging)}")
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
                stagingSchema: String = "staging"): Long = {
    val staging = stagingTableName(targetTable, stagingSchema)
    stage(df, staging)
    try {
      strategy match {
        case "truncate_insert" =>
          executor.execute(s"TRUNCATE TABLE ${escapeTable(targetTable)}")
        case "delete_insert" =>
          executor.execute(s"DELETE FROM ${escapeTable(targetTable)}")
        case other => throw new IllegalArgumentException(s"unknown strategy: $other")
      }
      val cols = df.columns.map(escapeColumn).mkString(", ")
      executor.execute(s"INSERT INTO ${escapeTable(targetTable)} ($cols) " +
        s"SELECT $cols FROM ${escapeTable(staging)}")
      df.count()
    } finally {
      executor.execute(s"DROP TABLE IF EXISTS ${escapeTable(staging)}")
      ()
    }
  }
}
