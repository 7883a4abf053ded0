package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample irregular observations onto a
 * fixed grid with forward-fill or linear interpolation — the step every
 * sensor/industrial pipeline (the reference's domain: psychrometrics,
 * phase detection over plant telemetry) runs before windowed analytics,
 * and a gap in the reference's own operator set (its transformers assume
 * an already-regular grid).
 *
 * Scale design: the grid is generated PER GROUP from each group's own
 * [min, max] span (`sequence` + `explode` — grid rows ≈ spanned steps,
 * never a cross join against a global calendar), and both fill
 * strategies are ONE pass over the union of observations and grid rows
 * under group-keyed windows (bucketed shuffles, no single-partition
 * funnel). Observations at the same instant as a grid point win over
 * carry-forward (they sort before the grid row inside the window).
 *
 * Same-instant duplicate observations: the fill picks the last one in
 * window order, which is nondeterministic across partitionings —
 * pre-aggregate to one row per (group, instant) when duplicates exist.
 */
object TimeSeries {

  /**
   * @param strategy `ffill` (hold the last observation) or
   *        `interpolate` (linear between the neighboring observations;
   *        held flat after the last one, null before the first)
   */
  def resample(df: DataFrame, tsCol: String, valueCols: Seq[String],
               stepSeconds: Long, groupBy: Seq[String] = Nil,
               strategy: String = "ffill"): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    require(Set("ffill", "interpolate").contains(strategy),
      s"strategy must be ffill/interpolate, got '$strategy'")
    require(valueCols.nonEmpty, "resample needs at least one value column")
    val g = groupBy.map(col)

    // per-group grid: floor(min, step) .. max, one row per step
    val bounds = (if (groupBy.isEmpty) df.groupBy() else df.groupBy(g: _*))
      .agg(min(col(tsCol)).as("_gf_min"), max(col(tsCol)).as("_gf_max"))
    val gridTs = explode(expr(
      s"sequence(timestamp_seconds(floor(unix_timestamp(_gf_min) / $stepSeconds) " +
        s"* $stepSeconds), _gf_max, interval $stepSeconds second)"))
    val grid = bounds.select(g ++ Seq(gridTs.as(tsCol), lit(1).as("_gf_grid")) ++
      valueCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)

    val obs = df.select(g ++ Seq(col(tsCol), lit(0).as("_gf_grid")) ++
      valueCols.map(col): _*)
    val all = obs.unionByName(grid)

    // observations order before the grid row at the same instant, so an
    // exact-hit grid point takes the observed value
    val back = Window.partitionBy(g: _*).orderBy(col(tsCol), col("_gf_grid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy(g: _*).orderBy(col(tsCol), col("_gf_grid"))
      .rowsBetween(1, Window.unboundedFollowing)
    // a same-instant observation sits in `back` (it precedes the grid
    // row), so both strategies see it as the "previous" point and emit
    // its exact value
    def filled(c: String): Column = strategy match {
      case "ffill" =>
        coalesce(col(c), last(col(c), ignoreNulls = true).over(back))
      case _ =>
        val prevV = last(col(c), ignoreNulls = true).over(back)
        val prevT = last(when(col(c).isNotNull, col(tsCol)), ignoreNulls = true)
          .over(back)
        val nextV = first(col(c), ignoreNulls = true).over(fwd)
        val nextT = first(when(col(c).isNotNull, col(tsCol)), ignoreNulls = true)
          .over(fwd)
        val span = (unix_micros(nextT) - unix_micros(prevT)).cast("double")
        val frac = (unix_micros(col(tsCol)) - unix_micros(prevT)).cast("double") / span
        coalesce(col(c),
          when(prevT.isNull, lit(null))
            .when(nextT.isNull || span === 0, prevV)
            .otherwise(prevV + (nextV - prevV) * frac))
    }
    all
      .select(g ++ Seq(col(tsCol), col("_gf_grid")) ++
        valueCols.map(c => filled(c).as(c)): _*)
      .where(col("_gf_grid") === 1)
      .drop("_gf_grid")
  }

  /**
   * Event-time rolling aggregate: `function` (any SQL aggregate over the
   * frame, e.g. `avg(value)`) computed over the trailing
   * `windowSeconds`-second RANGE frame per group — a true time-range
   * window, so irregular sampling needs no prior regularization and
   * same-instant rows are frame peers (deterministic regardless of
   * partitioning). One group-keyed window pass; scale-safe like every
   * other grouped window here.
   */
  def rollingAgg(df: DataFrame, tsCol: String, function: String,
                 windowSeconds: Long, groupBy: Seq[String] = Nil,
                 outputCol: String = "rolling"): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    val part =
      if (groupBy.nonEmpty) s"PARTITION BY ${groupBy.mkString(", ")}" else ""
    val micros = windowSeconds * 1000000L
    df.withColumn(outputCol, expr(
      s"$function OVER ($part ORDER BY unix_micros($tsCol) " +
        s"RANGE BETWEEN $micros PRECEDING AND CURRENT ROW)"))
  }

  /**
   * k-sigma outlier flag against the trailing `windowSeconds` RANGE
   * frame (current row and its instant-peers included — the plain
   * rolling z-score every sensor-QA pipeline starts from; the
   * self-inclusion slightly dampens the score, symmetric across
   * engines). Rows without enough history (stddev null/0) are never
   * flagged.
   */
  def flagOutliers(df: DataFrame, tsCol: String, valueCol: String,
                   windowSeconds: Long, k: Double = 3.0,
                   groupBy: Seq[String] = Nil,
                   flagCol: String = "is_outlier"): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val part =
      if (groupBy.nonEmpty) s"PARTITION BY ${groupBy.mkString(", ")}" else ""
    val frame = s"OVER ($part ORDER BY unix_micros($tsCol) " +
      s"RANGE BETWEEN ${windowSeconds * 1000000L} PRECEDING AND CURRENT ROW)"
    df
      .withColumn("_gf_mu", expr(s"avg($valueCol) $frame"))
      .withColumn("_gf_sd", expr(s"stddev_samp($valueCol) $frame"))
      .withColumn(flagCol,
        when(col("_gf_sd").isNull || col("_gf_sd") === 0, lit(false))
          .otherwise(abs(col(valueCol) - col("_gf_mu")) > lit(k) * col("_gf_sd")))
      .drop("_gf_mu", "_gf_sd")
  }
}
