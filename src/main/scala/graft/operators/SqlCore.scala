package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The 28 row-level / projection operators of the reference's sql_core
 * module (odibi/transformers/sql_core.py). Each is a pure
 * `DataFrame => DataFrame` built from Catalyst-native expressions so that
 * predicate pushdown, column pruning and whole-stage codegen apply
 * untouched — no UDFs anywhere in this file.
 */
object SqlCore {

  /** filter_rows (sql_core.py:15-90): SQL WHERE condition. */
  def filterRows(df: DataFrame, condition: String): DataFrame =
    df.filter(expr(condition))

  /** derive_columns (sql_core.py:94-172): name -> SQL expression. */
  def deriveColumns(df: DataFrame, derivations: Seq[(String, String)]): DataFrame =
    derivations.foldLeft(df) { case (d, (name, e)) => d.withColumn(name, expr(e)) }

  /** cast_columns (sql_core.py:175-257): col -> target type (DDL name). */
  def castColumns(df: DataFrame, casts: Map[String, String]): DataFrame = {
    val normalized = casts.map { case (c, t) =>
      val ddl = t.toLowerCase match {
        case "int" | "integer" => "int"
        case "float" | "double" => "double"
        case "str" | "string" => "string"
        case "bool" | "boolean" => "boolean"
        case other => other
      }
      c -> ddl
    }
    normalized.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
  }

  /** clean_text (sql_core.py:260-304): trim + case-normalize string cols. */
  def cleanText(df: DataFrame, columns: Seq[String], trimWs: Boolean = true,
                textCase: String = "preserve"): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      val base = if (trimWs) trim(col(c)) else col(c)
      val cased = textCase match {
        case "lower" => lower(base)
        case "upper" => upper(base)
        case _ => base
      }
      d.withColumn(c, cased)
    }

  /** extract_date_parts (sql_core.py:307-351). */
  def extractDateParts(df: DataFrame, sourceCol: String, prefix: String = "",
                       parts: Seq[String] = Seq("year", "month", "day")): DataFrame =
    parts.foldLeft(df) { (d, p) =>
      val e = p match {
        case "year" => year(col(sourceCol))
        case "month" => month(col(sourceCol))
        case "day" => dayofmonth(col(sourceCol))
        case "hour" => hour(col(sourceCol))
        case other => throw new IllegalArgumentException(s"unknown date part: $other")
      }
      d.withColumn(s"$prefix$p", e)
    }

  /** normalize_schema (sql_core.py:354-436): rename + drop + reorder. */
  def normalizeSchema(df: DataFrame, rename: Map[String, String] = Map.empty,
                      drop: Seq[String] = Nil, selectOrder: Seq[String] = Nil): DataFrame = {
    val renamed = df.withColumnsRenamed(rename)
    val dropped = if (drop.nonEmpty) renamed.drop(drop: _*) else renamed
    if (selectOrder.nonEmpty) dropped.select(selectOrder.map(col): _*) else dropped
  }

  /** sort (sql_core.py:439-481). */
  def sort(df: DataFrame, by: Seq[String], ascending: Seq[Boolean] = Nil): DataFrame = {
    val dirs = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    val cols = by.zip(dirs).map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    df.orderBy(cols: _*)
  }

  /** limit (sql_core.py:484-516): n rows after optional offset. */
  def limitRows(df: DataFrame, n: Int, offset: Int = 0): DataFrame =
    if (offset > 0) df.offset(offset).limit(n) else df.limit(n)

  /**
   * sample (sql_core.py:519-566). Spark's Bernoulli sample is seeded but
   * engine-specific; for cross-engine determinism tests we also provide
   * [[deterministicSample]] (md5 bucket on a key column — identical in any
   * engine with md5).
   */
  def sample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Portable deterministic sample: keep rows whose md5(key) falls in the first `percent` buckets of 256. */
  def deterministicSample(df: DataFrame, keyCol: String, percentOf256: Int): DataFrame =
    df.filter(conv(substring(md5(col(keyCol).cast("string")), 1, 2), 16, 10).cast("int") < percentOf256)

  /** distinct (sql_core.py:569-610). */
  def distinctRows(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    if (columns.isEmpty) df.distinct() else df.dropDuplicates(columns)

  /** fill_nulls (sql_core.py:613-659). */
  def fillNulls(df: DataFrame, values: Map[String, Any]): DataFrame =
    df.na.fill(values)

  /** split_part (sql_core.py:662-703): 1-indexed like the SQL function. */
  def splitPart(df: DataFrame, column: String, delimiter: String, index: Int,
                outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(column),
      split_part(col(column), lit(delimiter), lit(index)))

  /** date_add (sql_core.py:706-740): add days/months/etc. */
  def dateAdd(df: DataFrame, column: String, amount: Int, unit: String = "day",
              outputCol: Option[String] = None): DataFrame = {
    val out = outputCol.getOrElse(column)
    val e = unit.toLowerCase match {
      case "day" | "days" => date_add(col(column), amount)
      case "month" | "months" => add_months(col(column), amount)
      case "year" | "years" => add_months(col(column), amount * 12)
      case "hour" | "hours" => col(column) + expr(s"INTERVAL $amount HOURS")
      case "minute" | "minutes" => col(column) + expr(s"INTERVAL $amount MINUTES")
      case other => throw new IllegalArgumentException(s"unknown unit: $other")
    }
    df.withColumn(out, e)
  }

  /** date_trunc (sql_core.py:743-776). */
  def dateTrunc(df: DataFrame, column: String, unit: String,
                outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(column), date_trunc(unit, col(column)))

  /** date_diff (sql_core.py:779-843): end - start in `unit`. */
  def dateDiff(df: DataFrame, startCol: String, endCol: String, unit: String,
               outputCol: String): DataFrame = {
    val e = unit.toLowerCase match {
      case "day" | "days" => datediff(col(endCol), col(startCol)).cast("long")
      case "month" | "months" => floor(months_between(col(endCol), col(startCol)))
      case "year" | "years" => floor(months_between(col(endCol), col(startCol)) / 12)
      case "hour" | "hours" =>
        floor((unix_timestamp(col(endCol)) - unix_timestamp(col(startCol))) / 3600)
      case "minute" | "minutes" =>
        floor((unix_timestamp(col(endCol)) - unix_timestamp(col(startCol))) / 60)
      case "second" | "seconds" =>
        (unix_timestamp(col(endCol)) - unix_timestamp(col(startCol)))
      case other => throw new IllegalArgumentException(s"unknown unit: $other")
    }
    df.withColumn(outputCol, e)
  }

  /** case_when (sql_core.py:846-889): ordered (when, then) pairs + default. */
  def caseWhen(df: DataFrame, cases: Seq[(String, String)], default: Option[String],
               outputCol: String): DataFrame = {
    val start = when(expr(cases.head._1), expr(cases.head._2))
    val chained = cases.tail.foldLeft(start) { case (acc, (w, t)) => acc.when(expr(w), expr(t)) }
    val full = default.map(d => chained.otherwise(expr(d))).getOrElse(chained)
    df.withColumn(outputCol, full)
  }

  /** convert_timezone (sql_core.py:891-947). */
  def convertTimezone(df: DataFrame, column: String, sourceTz: String, targetTz: String,
                      outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(column),
      from_utc_timestamp(to_utc_timestamp(col(column), sourceTz), targetTz))

  /** concat_columns (sql_core.py:950-989). */
  def concatColumns(df: DataFrame, columns: Seq[String], separator: String,
                    outputCol: String): DataFrame =
    df.withColumn(outputCol, concat_ws(separator, columns.map(col): _*))

  /** select_columns (sql_core.py:992-1017). */
  def selectColumns(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(col): _*)

  /** drop_columns (sql_core.py:1020-1055). */
  def dropColumns(df: DataFrame, columns: Seq[String]): DataFrame =
    df.drop(columns: _*)

  /** rename_columns (sql_core.py:1058-1100). */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** add_prefix / add_suffix (sql_core.py:1103-1200). */
  def addPrefix(df: DataFrame, prefix: String, columns: Seq[String] = Nil,
                exclude: Seq[String] = Nil): DataFrame = {
    val targets = (if (columns.nonEmpty) columns else df.columns.toSeq).filterNot(exclude.contains)
    df.withColumnsRenamed(targets.map(c => c -> s"$prefix$c").toMap)
  }

  def addSuffix(df: DataFrame, suffix: String, columns: Seq[String] = Nil,
                exclude: Seq[String] = Nil): DataFrame = {
    val targets = (if (columns.nonEmpty) columns else df.columns.toSeq).filterNot(exclude.contains)
    df.withColumnsRenamed(targets.map(c => c -> s"$c$suffix").toMap)
  }

  /** normalize_column_names (sql_core.py:1203-1290): snake_case etc. */
  def normalizeColumnNames(df: DataFrame, style: String = "snake_case",
                           lowercase: Boolean = true,
                           removeSpecial: Boolean = true): DataFrame = {
    def normalize(name: String): String = {
      var n = name
      if (style == "snake_case") {
        n = n.replaceAll("([a-z0-9])([A-Z])", "$1_$2").replaceAll("[\\s\\-]+", "_")
      }
      if (removeSpecial) n = n.replaceAll("[^A-Za-z0-9_]", "")
      if (lowercase) n = n.toLowerCase
      n
    }
    df.toDF(df.columns.map(normalize): _*)
  }

  /** coalesce_columns (sql_core.py:1293-1359). */
  def coalesceColumns(df: DataFrame, columns: Seq[String], outputCol: String,
                      dropSource: Boolean = false): DataFrame = {
    val out = df.withColumn(outputCol, coalesce(columns.map(col): _*))
    if (dropSource) out.drop(columns.filterNot(_ == outputCol): _*) else out
  }

  /** replace_values (sql_core.py:1362-1491): value -> value per column. */
  def replaceValues(df: DataFrame, columns: Seq[String],
                    mapping: Seq[(String, String)]): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      val replaced = mapping.foldLeft(col(c)) { case (acc, (from, to)) =>
        when(acc === lit(from), lit(to)).otherwise(acc)
      }
      d.withColumn(c, replaced)
    }

  /** trim_whitespace (sql_core.py:1472-1542): all string cols by default. */
  def trimWhitespace(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val targets =
      if (columns.nonEmpty) columns
      else df.schema.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq
    targets.foldLeft(df)((d, c) => d.withColumn(c, trim(col(c))))
  }

  /**
   * row_number (sql_core.py:1545-1610).
   *
   * SCALE WARNING: an empty `partitionBy` is a GLOBAL window — the entire
   * frame flows through one task (reference semantics, reproduced
   * faithfully). At scale, pass partition keys, or use
   * `Patterns`-style range-partition + offset assignment when you need a
   * dense global ordinal (see `Patterns.dimension`'s SK path).
   */
  def rowNumber(df: DataFrame, outputCol: String, partitionBy: Seq[String],
                orderBy: Seq[Column]): DataFrame = {
    val w =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(outputCol, row_number().over(w))
  }
}
