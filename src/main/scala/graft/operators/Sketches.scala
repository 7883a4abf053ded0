package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable sketches for incremental aggregation (beyond-reference; the
 * "novel sketch" slot of the builder brief). Built on Spark 4's native
 * Datasketches HLL functions — codegen'd aggregates, no UDFs.
 *
 * The 100 TB pattern: a nightly job stores one SKETCH per (day, group)
 * instead of raw distinct sets; any rolling window's distinct count is
 * then a cheap union of per-day sketches (`hll_union_agg`) — no re-scan
 * of history, which is exactly what `Patterns.aggregationMerge`'s
 * `hll_union` strategy does for incremental aggregate tables.
 */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (binary, mergeable). */
  def hllSketch(df: DataFrame, groupBy: Seq[String], valueCol: String,
                outCol: String = "distinct_sketch",
                lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as(outCol))

  /** Distinct-count estimate from a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Re-aggregate sketches to a coarser grain (union per group). */
  def hllMerge(df: DataFrame, groupBy: Seq[String], sketchCol: String): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as(sketchCol))

  /** Pairwise union for merge strategies (null = absent side). */
  def hllUnion(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a).otherwise(hll_union(a, b))

  // ---- KLL quantile sketches (graft.expressions.KllExpressions) ----

  /** Per-group KLL quantile sketch of `valueCol` (binary, mergeable;
    * ~2 KB and ±1.65% rank error at k=200). */
  def kllSketch(df: DataFrame, groupBy: Seq[String], valueCol: String,
                outCol: String = "quantile_sketch", k: Int = 200): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(graft.expressions.KllFunctions
        .kllSketchAgg(col(valueCol).cast("double"), k).as(outCol))

  /** Re-aggregate quantile sketches to a coarser grain (union per group). */
  def kllMerge(df: DataFrame, groupBy: Seq[String], sketchCol: String,
               k: Int = 200): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(graft.expressions.KllFunctions
        .kllMergeAgg(col(sketchCol), k).as(sketchCol))

  /** Quantile estimate at rank `q` from a sketch column (null if empty). */
  def kllQuantile(sketch: Column, q: Double): Column =
    graft.expressions.KllFunctions.kllQuantile(sketch, q)

  /** Pairwise union for merge strategies (null = absent side). */
  def kllUnion(a: Column, b: Column, k: Int = 200): Column =
    when(a.isNull, b).when(b.isNull, a)
      .otherwise(graft.expressions.KllFunctions.kllPairUnion(a, b, k))

  // ---- Theta distinct-count sketches (set algebra: ∪, ∩, A\B) ----
  // graft.expressions.ThetaExpressions. HLL answers only distinct counts
  // and unions; theta sketches additionally answer "distinct in A AND B"
  // and "in A but not B" from stored per-segment sketches — the audience-
  // overlap / retention questions — with published error bounds, where
  // inclusion-exclusion over HLL estimates compounds error per set.

  /** Per-group theta sketch of `valueCol` (binary, mergeable; exact and
    * deterministic while the group's distinct count <= 2^lgK). */
  def thetaSketch(df: DataFrame, groupBy: Seq[String], valueCol: String,
                  outCol: String = "theta_sketch", lgK: Int = 12): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(graft.expressions.ThetaFunctions
        .thetaSketchAgg(col(valueCol), lgK).as(outCol))

  /** Re-aggregate theta sketches to a coarser grain (union per group). */
  def thetaMerge(df: DataFrame, groupBy: Seq[String], sketchCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(graft.expressions.ThetaFunctions
        .thetaUnionAgg(col(sketchCol), lgK).as(sketchCol))

  /** Distinct-count estimate from a theta sketch column. */
  def thetaEstimate(sketch: Column): Column =
    graft.expressions.ThetaFunctions.thetaEstimate(sketch)

  /** Pairwise set algebra over sketch columns. */
  def thetaUnion(a: Column, b: Column, lgK: Int = 12): Column =
    when(a.isNull, b).when(b.isNull, a)
      .otherwise(graft.expressions.ThetaFunctions.thetaUnion(a, b, lgK))
  def thetaIntersect(a: Column, b: Column): Column =
    graft.expressions.ThetaFunctions.thetaIntersect(a, b)
  def thetaDiff(a: Column, b: Column): Column =
    graft.expressions.ThetaFunctions.thetaDiff(a, b)

  /**
   * Exact per-group top-k values by frequency (corpus analysis: top
   * domains / languages / event types per segment). Two parallel stages:
   * a map-side-combined count per (group, value), then a window ranked
   * WITHIN each group — no global window, no driver collection.
   * Deterministic tie-break: higher count first, then value ascending.
   */
  def topKValues(df: DataFrame, groupBy: Seq[String], valueCol: String,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy((groupBy :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupBy.map(col): _*)
      .orderBy(col("n").desc, col(valueCol).asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
