package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Structural / window / enrichment operators (reference:
 * odibi/transformers/advanced.py — 17 transformers). All Catalyst-native.
 */
object Advanced {

  /**
   * deduplicate (advanced.py:16-116): keep first row per `keys` ordered by
   * `orderBy`. One shuffle on the keys; at scale prefer orderBy columns
   * that make "first" meaningful (e.g. updated_at desc).
   */
  def deduplicate(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** explode_list_column (advanced.py:119-209). */
  def explodeListColumn(df: DataFrame, column: String, outer: Boolean = false,
                        outputCol: Option[String] = None): DataFrame = {
    val e = if (outer) explode_outer(col(column)) else explode(col(column))
    df.withColumn(outputCol.getOrElse(column), e)
  }

  /** dict_based_mapping (advanced.py:212-281): value map with default. */
  def dictBasedMapping(df: DataFrame, column: String, mapping: Seq[(String, String)],
                       default: Option[String], outputCol: String): DataFrame = {
    val chained = mapping.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
      Some(acc match {
        case None => when(col(column) === lit(from), lit(to))
        case Some(c) => c.when(col(column) === lit(from), lit(to))
      })
    }.get
    val full = default.map(d => chained.otherwise(lit(d))).getOrElse(chained)
    df.withColumn(outputCol, full)
  }

  /** regex_replace (advanced.py:284-325). */
  def regexReplace(df: DataFrame, column: String, pattern: String, replacement: String,
                   outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(column), regexp_replace(col(column), pattern, replacement))

  /** unpack_struct (advanced.py:328-393): struct fields to top level. */
  def unpackStruct(df: DataFrame, column: String, dropSource: Boolean = true): DataFrame = {
    val out = df.select(col("*"), col(s"$column.*"))
    if (dropSource) out.drop(column) else out
  }

  /** hash_columns (advanced.py:396-466): sha256 / md5 in place. */
  def hashColumns(df: DataFrame, columns: Seq[String], algorithm: String = "sha256"): DataFrame =
    columns.foldLeft(df) { (d, c) =>
      val hashed = algorithm.toLowerCase match {
        case "sha256" => sha2(col(c).cast("string"), 256)
        case "md5" => md5(col(c).cast("string"))
        case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
      }
      d.withColumn(c, hashed)
    }

  /** generate_surrogate_key (advanced.py:469-531): sha256(concat_ws). */
  def generateSurrogateKey(df: DataFrame, columns: Seq[String], outputCol: String,
                           separator: String = "|"): DataFrame =
    df.withColumn(outputCol,
      sha2(concat_ws(separator, columns.map(c => col(c).cast("string")): _*), 256))

  /** generate_numeric_key (advanced.py:534-644): deterministic BIGINT via
    * the reference's exact recipe — trim/null-normalize each column,
    * concat_ws, md5, first 15 hex chars to decimal (fits a long; and
    * being md5-based, the oracle can reproduce it, unlike xxhash64). */
  def generateNumericKey(df: DataFrame, columns: Seq[String], outputCol: String,
                         coalesceWith: Option[String] = None,
                         separator: String = "|"): DataFrame = {
    val normed = columns.map(c =>
      coalesce(nullif(trim(col(c).cast("string")), lit("")), lit("")))
    val key = conv(substring(md5(concat_ws(separator, normed: _*)), 1, 15), 16, 10)
      .cast("long")
    val e = coalesceWith.map(c => coalesce(col(c).cast("long"), key)).getOrElse(key)
    df.withColumn(outputCol, e)
  }

  /** parse_json (advanced.py:647-708): string -> struct via DDL schema. */
  def parseJson(df: DataFrame, column: String, schemaDdl: String,
                outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(column),
      from_json(col(column), StructType.fromDDL(schemaDdl)))

  /**
   * validate_and_flag (advanced.py:711-779): evaluate boolean SQL rules,
   * append a flag column listing failed rule names; rows are NOT dropped.
   */
  def validateAndFlag(df: DataFrame, rules: Seq[(String, String)],
                      flagCol: String = "_validation_flags"): DataFrame = {
    val failures = rules.map { case (name, rule) =>
      when(!coalesce(expr(rule), lit(false)), lit(name))
    }
    df.withColumn(flagCol, array_compact(array(failures: _*)))
      .withColumn(flagCol, concat_ws(",", col(flagCol)))
  }

  /**
   * window_calculation (advanced.py:782-819): arbitrary SQL window function
   * string over PARTITION BY / ORDER BY. Full frame specs supported via the
   * raw SQL escape hatch, exactly like the reference.
   */
  def windowCalculation(df: DataFrame, function: String, partitionBy: Seq[String],
                        orderBy: Seq[String], outputCol: String): DataFrame = {
    val part = if (partitionBy.nonEmpty) s"PARTITION BY ${partitionBy.mkString(", ")}" else ""
    val ord = if (orderBy.nonEmpty) s"ORDER BY ${orderBy.mkString(", ")}" else ""
    df.withColumn(outputCol, expr(s"$function OVER ($part $ord)"))
  }

  /** normalize_json (advanced.py:827-894): flatten one struct level. */
  def normalizeJson(df: DataFrame, column: String): DataFrame =
    unpackStruct(df, column)

  /**
   * sessionize (advanced.py:897-998): new session when the gap since the
   * previous event of the same user exceeds `thresholdSeconds`; session id
   * = `{user}-{cumulative session count}`. The reference leaks its helper
   * columns (advanced.py:969-971) — we drop them (SURVEY §7 risk note).
   */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, thresholdSeconds: Long,
                 sessionCol: String = "session_id",
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol) +: tieBreak: _*)
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w))
    val isNew = when(gap.isNull || gap > thresholdSeconds, 1).otherwise(0)
    df.withColumn("_is_new_session", isNew)
      .withColumn("_session_num", sum(col("_is_new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(sessionCol, concat_ws("-", col(userCol).cast("string"), col("_session_num")))
      .drop("_is_new_session", "_session_num")
  }

  /**
   * split_events_by_period (advanced.py:1036-1517): split [start,end] event
   * rows at period boundaries (day/hour), emit one row per overlapped
   * period with the clipped duration. Implemented as
   * sequence(trunc(start), trunc(end)) + explode + greatest/least clipping —
   * fully distributed, no per-row iteration.
   */
  def splitEventsByPeriod(df: DataFrame, startCol: String, endCol: String,
                          period: String = "day",
                          durationCol: String = "duration_seconds"): DataFrame = {
    val step = period.toLowerCase match {
      case "day" => expr("INTERVAL 1 DAY")
      case "hour" => expr("INTERVAL 1 HOUR")
      case other => throw new IllegalArgumentException(s"unknown period: $other")
    }
    val periodStart = explode(sequence(
      date_trunc(period, col(startCol)), date_trunc(period, col(endCol)), step))
    df.withColumn("period_start", periodStart)
      .withColumn("period_end", col("period_start") + step)
      .withColumn("_clip_start", greatest(col(startCol), col("period_start")))
      .withColumn("_clip_end", least(col(endCol), col("period_end")))
      .withColumn(durationCol,
        (unix_timestamp(col("_clip_end")) - unix_timestamp(col("_clip_start"))).cast("long"))
      .drop("_clip_start", "_clip_end")
  }

  /**
   * flatten_struct (advanced.py:1520-1667): recursively flatten struct
   * columns to `parent{sep}child` leaves up to `depth`.
   */
  def flattenStruct(df: DataFrame, column: String, separator: String = "_",
                    depth: Int = Int.MaxValue, dropSource: Boolean = true): DataFrame = {
    def leaves(path: Seq[String], dt: DataType, d: Int): Seq[Column] = dt match {
      case st: StructType if d > 0 =>
        st.fields.toSeq.flatMap(f => leaves(path :+ f.name, f.dataType, d - 1))
      case _ =>
        Seq(col(path.mkString(".")).alias(path.mkString(separator)))
    }
    val field = df.schema(column)
    val flattened = leaves(Seq(column), field.dataType, depth)
    val kept = df.columns.filterNot(_ == column).map(col).toSeq
    val base = if (dropSource) kept else kept :+ col(column)
    df.select(base ++ flattened: _*)
  }

  /**
   * apply_mapping (advanced.py:1670-1798): enrich via a lookup table.
   * Lookup sides are typically small → broadcast by default.
   */
  def applyMapping(df: DataFrame, lookup: DataFrame, sourceCol: String, lookupKey: String,
                   lookupValue: String, outputCol: String, default: Option[String] = None,
                   broadcastLookup: Boolean = true): DataFrame = {
    val lk = lookup.select(col(lookupKey).as("_mk"), col(lookupValue).as("_mv")).dropDuplicates("_mk")
    val right = if (broadcastLookup) broadcast(lk) else lk
    val joined = df.join(right, df(sourceCol) === right("_mk"), "left")
    val value = default.map(d => coalesce(col("_mv"), lit(d))).getOrElse(col("_mv"))
    joined.withColumn(outputCol, value).drop("_mk", "_mv")
  }
}
