package graft.patterns

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Merge, Scd}

/**
 * Warehouse patterns (reference: odibi/patterns/__init__.py:11-18 —
 * dimension, fact, scd2, merge, aggregation, date_dimension). Each is a
 * composite over the operator library, kept as pure DataFrame transforms.
 */
object Patterns {

  // ------------------------------------------------------------------
  // date_dimension (odibi/patterns/date_dimension.py:13-460; Spark gen
  // :323-415 uses spark.range — already the idiomatic distributed form).
  // ------------------------------------------------------------------

  /**
   * Generate a calendar dimension from `start` to `end` (inclusive, ISO
   * dates), with surrogate key yyyyMMdd, calendar parts, fiscal year/quarter
   * (fiscal year starts at `fiscalStartMonth`), and boundary flags. An
   * unknown member row (date_sk = -1) is prepended like the reference's
   * SK=0 unknown member convention for dims.
   */
  def dateDimension(spark: SparkSession, start: String, end: String,
                    fiscalStartMonth: Int = 10,
                    includeUnknown: Boolean = false): DataFrame = {
    val days = spark.range(0, java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)) + 1)
    val d = col("date")
    val cal = days
      .select(date_add(to_date(lit(start)), col("id").cast("int")).as("date"))
      .withColumn("date_sk", date_format(d, "yyyyMMdd").cast("long"))
      .withColumn("year", year(d).cast("long"))
      .withColumn("quarter", quarter(d).cast("long"))
      .withColumn("month", month(d).cast("long"))
      .withColumn("day", dayofmonth(d).cast("long"))
      .withColumn("day_of_week", dayofweek(d).cast("long"))
      .withColumn("week_of_year", weekofyear(d).cast("long"))
      .withColumn("month_name", date_format(d, "MMMM"))
      .withColumn("day_name", date_format(d, "EEEE"))
      .withColumn("is_weekend", dayofweek(d).isin(1, 7))
      .withColumn("is_month_start", dayofmonth(d) === 1)
      .withColumn("is_month_end", d === last_day(d))
      .withColumn("is_year_start", month(d) === 1 && dayofmonth(d) === 1)
      .withColumn("is_year_end", month(d) === 12 && dayofmonth(d) === 31)
      .withColumn("fiscal_year",
        when(month(d) >= fiscalStartMonth, year(d) + 1).otherwise(year(d)).cast("long"))
      .withColumn("fiscal_quarter",
        (((month(d) - fiscalStartMonth + 12) % 12) / 3 + 1).cast("long"))
    if (!includeUnknown) cal
    else {
      val unknown = cal.limit(0) // schema-only
      cal.unionByName(
        unknown.sparkSession.range(1).select(
          lit(null).cast("date").as("date"), lit(-1L).as("date_sk"),
          lit(-1L).as("year"), lit(-1L).as("quarter"), lit(-1L).as("month"),
          lit(-1L).as("day"), lit(-1L).as("day_of_week"), lit(-1L).as("week_of_year"),
          lit("Unknown").as("month_name"), lit("Unknown").as("day_name"),
          lit(false).as("is_weekend"), lit(false).as("is_month_start"),
          lit(false).as("is_month_end"), lit(false).as("is_year_start"),
          lit(false).as("is_year_end"), lit(-1L).as("fiscal_year"),
          lit(-1L).as("fiscal_quarter")))
    }
  }

  // ------------------------------------------------------------------
  // dimension (odibi/patterns/dimension.py:23-650)
  // ------------------------------------------------------------------

  /**
   * Dense surrogate keys `start+1 .. start+N` in natural-key order WITHOUT a
   * single-partition global window: range-partition on the keys (so ordered
   * partitions hold ordered key ranges), row_number within each partition,
   * then add cumulative per-partition offsets (a tiny driver-side map,
   * broadcast back). SK value = start + global rank in key order — identical
   * to row_number over a global sort, but every stage is partition-parallel,
   * so the bootstrap path survives a 100× dimension (dimension.py:252-296
   * assigns MAX+ROW_NUMBER; this keeps that contract).
   *
   * Determinism: range boundaries come from Spark's deterministic sampler
   * over a deterministic scan, and post-dedup key tuples are unique, so the
   * rank (hence the SK) does not depend on where partition boundaries fall.
   */
  private def assignSks(df: DataFrame, keys: Seq[String], skCol: String,
                        start: Long): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val ranged = df.repartitionByRange(keys.map(col): _*)
      .withColumn("_graft_pid", spark_partition_id())
    val counts = ranged.groupBy(col("_graft_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    val offsetsDf = offsets.toSeq.toDF("_graft_pid", "_graft_off")
    val w = Window.partitionBy(col("_graft_pid")).orderBy(keys.map(col): _*)
    ranged.join(broadcast(offsetsDf), Seq("_graft_pid"))
      .withColumn(skCol,
        (row_number().over(w) + col("_graft_off") + lit(start)).cast("long"))
      .drop("_graft_pid", "_graft_off")
  }

  /**
   * Dimension load: assign surrogate keys to new natural keys as
   * MAX(existing)+ROW_NUMBER() (dimension.py:252-296), SCD1 = overwrite
   * matched attributes. The unknown member (SK=0, dimension.py:578) is
   * ensured. `existing` None = first load. Returns the new dimension
   * snapshot with `skCol`.
   *
   * Scale: the MAX(sk) is a single-row agg (cheap); SK assignment (both
   * bootstrap and incremental) is partition-parallel via [[assignSks]] —
   * no global single-partition window anywhere on this path.
   */
  def dimension(source: DataFrame, naturalKeys: Seq[String], skCol: String,
                existing: Option[DataFrame] = None,
                unknownMember: Boolean = true): DataFrame = {
    val attrs = source.columns.toSeq
    val dedupedSource = source.dropDuplicates(naturalKeys)
    val base = existing match {
      case None =>
        assignSks(dedupedSource, naturalKeys, skCol, 0L)
          .select((skCol +: attrs).map(col): _*)
      case Some(dim) =>
        val maxSk = dim.agg(max(col(skCol))).head().getLong(0)
        val newRows = dedupedSource.join(dim.select(naturalKeys.map(col): _*), naturalKeys, "left_anti")
        val newWithSk = assignSks(newRows, naturalKeys, skCol, maxSk)
        // SCD1: matched rows take fresh source attributes, keep their SK
        val matched = dim.select(col(skCol) +: naturalKeys.map(col): _*)
          .join(dedupedSource, naturalKeys)
        val unmatched = dim.join(dedupedSource.select(naturalKeys.map(col): _*), naturalKeys, "left_anti")
        unmatched.select((skCol +: attrs).map(col): _*)
          .unionByName(matched.select((skCol +: attrs).map(col): _*))
          .unionByName(newWithSk.select((skCol +: attrs).map(col): _*))
    }
    if (!unknownMember) base
    else {
      val unknownRow = base.limit(0).unionByName(
        base.sparkSession.range(1).select(base.schema.fields.map { f =>
          if (f.name == skCol) lit(0L).cast(f.dataType).as(f.name)
          else if (f.dataType.typeName == "string") lit("Unknown").cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*))
      base.filter(col(skCol) =!= 0).unionByName(unknownRow)
    }
  }

  /**
   * SCD2 dimension (dimension.py scd_type=2): version rows via the SCD2
   * operator AND keep one surrogate key per VERSION — existing versions
   * retain their SK (matched on natural key + valid_from, the version
   * identity), new versions get MAX(sk)+rank, partition-parallel via
   * [[assignSks]]. The unknown member keeps SK 0, is_current=true.
   */
  def scd2Dimension(source: DataFrame, naturalKeys: Seq[String], skCol: String,
                    trackCols: Seq[String], effectiveTs: Column,
                    existing: Option[DataFrame] = None,
                    unknownMember: Boolean = true): DataFrame = {
    val deduped = source.dropDuplicates(naturalKeys)
    val versioned = existing match {
      case None =>
        assignSks(Scd.scd2Bootstrap(deduped, effectiveTs), naturalKeys, skCol, 0L)
      case Some(dimAll) =>
        val dim = dimAll.filter(col(skCol) =!= 0) // unknown member re-added below
        val merged = Scd.scd2Apply(dim.drop(skCol), deduped, naturalKeys,
          trackCols, effectiveTs)
        val maxSk = Option(dim.agg(max(col(skCol))).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L) // empty dim = fresh start
        val versionKey = naturalKeys :+ "valid_from"
        val keyed = merged.join(
          broadcast(dim.select((versionKey.map(col) :+ col(skCol)): _*)),
          versionKey, "left")
        keyed.filter(col(skCol).isNotNull)
          .unionByName(assignSks(keyed.filter(col(skCol).isNull).drop(skCol),
            versionKey, skCol, maxSk))
    }
    val ordered = versioned.select(
      (skCol +: versioned.columns.filterNot(_ == skCol).toSeq).map(col): _*)
    if (!unknownMember) ordered
    else ordered.filter(col(skCol) =!= 0).unionByName(
      ordered.limit(0).unionByName(
        ordered.sparkSession.range(1).select(ordered.schema.fields.map { f =>
          if (f.name == skCol) lit(0L).cast(f.dataType).as(f.name)
          else if (f.name == "is_current") lit(true).cast(f.dataType).as(f.name)
          else if (f.dataType.typeName == "string") lit("Unknown").cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*)))
  }

  // ------------------------------------------------------------------
  // fact (odibi/patterns/fact.py:11-860)
  // ------------------------------------------------------------------

  final case class DimLookup(dim: DataFrame, factKeys: Seq[String],
                             dimKeys: Seq[String], skCol: String,
                             outCol: String, scd2Current: Option[String] = None)

  /**
   * Fact load: resolve each dimension surrogate key by left-joining on the
   * natural key (fact.py:392-412; SCD2 dims filtered to is_current), orphans
   * → SK 0 ("unknown" handling, fact.py:326-378). Dimensions are broadcast —
   * they are small relative to the fact at any realistic scale.
   */
  def fact(source: DataFrame, lookups: Seq[DimLookup],
           measures: Seq[(String, String)] = Nil,
           grain: Seq[String] = Nil): DataFrame =
    factWithOrphans(source, lookups, measures)._1

  /**
   * Fact load with the reference's full orphan handling
   * (fact.py:326-378 — unknown|reject|quarantine): returns
   * (fact, quarantined orphans). `orphans = "unknown"` maps them to SK 0;
   * "quarantine" splits rows with any unresolved SK into the second frame;
   * "reject" throws when orphans exist.
   */
  def factWithOrphans(source: DataFrame, lookups: Seq[DimLookup],
                      measures: Seq[(String, String)] = Nil,
                      orphans: String = "unknown"): (DataFrame, DataFrame) = {
    val resolved = lookups.foldLeft(source) { (df, lk) =>
      val current = lk.scd2Current.map(c => lk.dim.filter(col(c))).getOrElse(lk.dim)
      val proj = current.select((lk.dimKeys.map(col) :+ col(lk.skCol).as(lk.outCol)): _*)
      val cond = lk.factKeys.zip(lk.dimKeys).map { case (f, d) => df(f) === proj(d) }
        .reduce(_ && _)
      df.join(broadcast(proj), cond, "left")
        .drop(lk.dimKeys.filterNot(lk.factKeys.contains): _*)
    }
    val anyOrphan = lookups.map(lk => col(lk.outCol).isNull).reduce(_ || _)
    val (kept, quarantined) = orphans match {
      case "unknown" =>
        (lookups.foldLeft(resolved) { (df, lk) =>
          df.withColumn(lk.outCol, coalesce(col(lk.outCol), lit(0L)))
        }, resolved.limit(0))
      case "quarantine" =>
        (resolved.filter(!anyOrphan), resolved.filter(anyOrphan))
      case "reject" =>
        val n = resolved.filter(anyOrphan).count()
        if (n > 0) throw new IllegalStateException(s"fact: $n orphan rows")
        (resolved, resolved.limit(0))
      case other => throw new IllegalArgumentException(s"unknown orphan mode: $other")
    }
    val withMeasures = measures.foldLeft(kept) { case (df, (name, e)) =>
      df.withColumn(name, expr(e))
    }
    (withMeasures, quarantined)
  }

  /** Grain validation (fact.py:666-704): rows per grain must be unique. */
  def grainViolations(df: DataFrame, grain: Seq[String]): DataFrame =
    df.groupBy(grain.map(col): _*).count().filter(col("count") > 1)

  // ------------------------------------------------------------------
  // aggregation (odibi/patterns/aggregation.py:10-570)
  // ------------------------------------------------------------------

  /**
   * Aggregation pattern: `grain` + named SQL measure exprs + HAVING.
   * Incremental strategies (replace|sum|min|max, aggregation.py:319-570)
   * combine a fresh partial aggregate with the existing aggregate table.
   */
  def aggregation(source: DataFrame, grain: Seq[String],
                  measures: Seq[(String, String)],
                  having: Option[String] = None): DataFrame = {
    val aggExprs = measures.map { case (name, e) => expr(e).as(name) }
    val out = source.groupBy(grain.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
    having.map(h => out.filter(expr(h))).getOrElse(out)
  }

  /**
   * Incremental combine of an existing aggregate with a fresh partial.
   * `hll_union` merges mergeable distinct-count sketches
   * ([[graft.operators.Sketches]]) so incremental aggregate tables can
   * maintain distinct counts without re-scanning history.
   */
  def aggregationMerge(existing: DataFrame, fresh: DataFrame, grain: Seq[String],
                       strategies: Map[String, String]): DataFrame = {
    val valueCols = fresh.columns.filterNot(grain.contains).toSeq
    val e = existing.select(grain.map(col) ++ valueCols.map(c => col(c).as(s"_old_$c")): _*)
    fresh.join(e, grain, "full_outer")
      .select(grain.map(col) ++ valueCols.map { c =>
        val combined = strategies.getOrElse(c, "replace") match {
          case "sum" => coalesce(col(c), lit(0)) + coalesce(col(s"_old_$c"), lit(0))
          case "min" => least(col(c), col(s"_old_$c"))
          case "max" => greatest(col(c), col(s"_old_$c"))
          case "hll_union" => graft.operators.Sketches.hllUnion(col(c), col(s"_old_$c"))
          case "kll_union" => graft.operators.Sketches.kllUnion(col(c), col(s"_old_$c"))
          case "theta_union" => graft.operators.Sketches.thetaUnion(col(c), col(s"_old_$c"))
          case _ => coalesce(col(c), col(s"_old_$c")) // replace: fresh wins
        }
        combined.as(c)
      }: _*)
  }

  /** scd2 pattern = thin wrapper over the transformer (patterns/scd2.py). */
  def scd2(target: Option[DataFrame], source: DataFrame, keys: Seq[String],
           trackCols: Seq[String], effectiveTs: Column): DataFrame =
    target match {
      case None => Scd.scd2Bootstrap(source, effectiveTs)
      case Some(t) => Scd.scd2Apply(t, source, keys, trackCols, effectiveTs)
    }

  /** merge pattern = thin wrapper (patterns/merge.py). */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            strategy: String = "upsert"): DataFrame = strategy match {
    case "upsert" => Merge.upsert(target, source, keys)
    case "append_only" => Merge.appendOnly(target, source, keys)
    case "delete_match" => Merge.deleteMatch(target, source, keys)
    case other => throw new IllegalArgumentException(s"unknown strategy: $other")
  }
}
