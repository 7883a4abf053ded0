package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SCD Type-2 (reference: odibi/transformers/scd.py:15-1167).
 *
 * The reference has two physical paths: an optimized Delta MERGE
 * (scd.py:553-736) and a legacy full-snapshot rebuild (scd.py:310-553).
 * This environment ships no Delta jars, so we implement the snapshot
 * algebra: `apply` is a pure (target, source) => new-target DataFrame that a
 * sink then writes atomically (parquet overwrite here; DeltaTable.merge on a
 * cluster with delta-spark — the plan-side logic is identical).
 *
 * Semantics preserved from the reference:
 *  - change detection is null-safe on `trackCols` (scd.py:440-447 eqNullSafe);
 *  - open interval [valid_from, valid_to): current rows have valid_to null,
 *    is_current true; closed rows get valid_to = effectiveTs;
 *  - first run (empty/absent target) bootstraps all source rows as current;
 *  - optional soft-delete: keys absent from source are closed when
 *    `closeDeleted` is set.
 *
 * Scale notes: one shuffle on `keys` for the join; history rows
 * (is_current=false) are untouched and pass through without joining —
 * filter first so the join input is only the current slice.
 */
object Scd {

  final case class Scd2Cols(validFrom: String = "valid_from",
                            validTo: String = "valid_to",
                            isCurrent: String = "is_current")

  /** Bootstrap a first SCD2 snapshot from `source`. */
  def scd2Bootstrap(source: DataFrame, effectiveTs: Column,
                    cols: Scd2Cols = Scd2Cols()): DataFrame =
    source
      .withColumn(cols.validFrom, effectiveTs.cast("timestamp"))
      .withColumn(cols.validTo, lit(null).cast("timestamp"))
      .withColumn(cols.isCurrent, lit(true))

  /**
   * Merge `source` (the new snapshot of attributes) into SCD2 `target`.
   * Target must carry the SCD2 bookkeeping columns; source must not.
   */
  def scd2Apply(target: DataFrame, source: DataFrame, keys: Seq[String],
                trackCols: Seq[String], effectiveTs: Column,
                cols: Scd2Cols = Scd2Cols(),
                closeDeleted: Boolean = false): DataFrame = {
    val history = target.filter(!col(cols.isCurrent))
    val current = target.filter(col(cols.isCurrent))

    val attrCols = source.columns.toSeq
    require(keys.forall(attrCols.contains), s"source must carry keys $keys")

    // Presence markers (not key nullability) classify the full-outer join:
    // a key that is NULL on both sides <=>-matches yet would test "present"
    // on neither side under isNull checks, duplicating the row.
    val src = source.select(attrCols.map(c => col(c).as(s"_src_$c")): _*)
      .withColumn("_src_present", lit(true))
    val cur = current.withColumn("_tgt_present", lit(true))
    val keyCond = keys.map(k => col(k) <=> col(s"_src_$k")).reduce(_ && _)
    val joined = cur.join(src, keyCond, "full_outer")

    val matched = col("_tgt_present").isNotNull && col("_src_present").isNotNull
    val srcOnly = col("_tgt_present").isNull
    val tgtOnly = col("_src_present").isNull
    val changed = trackCols.map(c => !(col(c) <=> col(s"_src_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))

    val ts = effectiveTs.cast("timestamp")
    def tgtRow = attrCols.map(col) ++
      Seq(col(cols.validFrom), col(cols.validTo), col(cols.isCurrent))

    // 1. unchanged matched rows + (optionally kept-open) deleted keys
    val keptOpen = joined.filter((matched && !changed) || (tgtOnly && lit(!closeDeleted)))
      .select(tgtRow: _*)
    // 2. closed-out versions: changed rows, plus deleted keys when closing
    val closed = joined.filter((matched && changed) || (tgtOnly && lit(closeDeleted)))
      .select(attrCols.map(col) ++ Seq(
        col(cols.validFrom), ts.as(cols.validTo), lit(false).as(cols.isCurrent)): _*)
    // 3. new versions: changed rows and brand-new keys, from source attrs
    val opened = joined.filter((matched && changed) || srcOnly)
      .select(attrCols.map(c => col(s"_src_$c").as(c)) ++ Seq(
        ts.as(cols.validFrom),
        lit(null).cast("timestamp").as(cols.validTo),
        lit(true).as(cols.isCurrent)): _*)

    history.select(tgtRow: _*)
      .unionByName(keptOpen).unionByName(closed).unionByName(opened)
  }
}
