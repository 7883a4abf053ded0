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

  /**
   * Deterministic UUID-shaped string with a version-4 layout
   * (config.py:1563-1580 UUIDGeneratorConfig; generator.py:1464-1503),
   * built from two 64-bit hashes — no RNG state, reproducible per row.
   */
  def fakeUuid(id: Column, seed: Long): Column = {
    val h1 = lpad(lower(hex(xxhash64(id, lit(seed)))), 16, "0")
    val h2 = lpad(lower(hex(xxhash64(id, lit(seed + 1)))), 16, "0")
    concat(
      substring(h1, 1, 8), lit("-"), substring(h1, 9, 4), lit("-4"),
      substring(h1, 14, 3), lit("-8"), substring(h2, 2, 3), lit("-"),
      substring(h2, 5, 12))
  }

  /**
   * Geographic point uniform in a bounding box (config.py:1618-1648
   * GeoGeneratorConfig; bbox = (minLat, minLon, maxLat, maxLon)). Returns a
   * struct(lat, lon); select `.getField` for separate columns.
   */
  def geoPoint(id: Column, seed: Long,
               bbox: (Double, Double, Double, Double)): Column = {
    val (minLat, minLon, maxLat, maxLon) = bbox
    require(minLat < maxLat && minLon < maxLon, s"invalid bbox $bbox")
    struct(
      (lit(minLat) + uniform(id, seed) * (maxLat - minLat)).as("lat"),
      (lit(minLon) + uniform(id, seed + 1) * (maxLon - minLon)).as("lon"))
  }

  /**
   * Derived columns (config.py:1658-1683 DerivedGeneratorConfig): SQL
   * expressions over previously generated columns, applied in list order so
   * later expressions may reference earlier derived names — the reference
   * topo-sorts; here YAML/list order is the dependency order.
   */
  def withDerived(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    cols.foldLeft(df) { case (d, (name, e)) => d.withColumn(name, expr(e)) }

  /**
   * Scheduled event (config.py:1979-2080): forced_value / setpoint_change /
   * parameter_override applied to `column` while active. `endTime` None =
   * permanent change; `recurrenceSeconds` + `durationSeconds` model
   * recurring windows (maintenance every N days for H hours), optionally
   * capped at `maxOccurrences`. Pure column algebra — no per-entity driver
   * state, so it composes with a billion-row frame.
   */
  final case class ScheduledEvent(
      eventType: String, column: String, value: Double, startTime: String,
      endTime: Option[String] = None, entity: Option[String] = None,
      recurrenceSeconds: Option[Long] = None, durationSeconds: Option[Long] = None,
      maxOccurrences: Option[Int] = None)

  def applyScheduledEvent(df: DataFrame, tsCol: String, entityCol: String,
                          ev: ScheduledEvent): DataFrame = {
    val ts = unix_timestamp(col(tsCol))
    val start = unix_timestamp(lit(ev.startTime).cast("timestamp"))
    val entityOk = ev.entity.map(e => col(entityCol) === e).getOrElse(lit(true))
    val active = ev.recurrenceSeconds match {
      case Some(rec) =>
        val dur = ev.durationSeconds.getOrElse(0L)
        val elapsed = ts - start
        val inWindow = elapsed >= 0 && (elapsed % rec) < dur
        ev.maxOccurrences
          .map(m => inWindow && floor(elapsed / rec) < m)
          .getOrElse(inWindow)
      case None =>
        val endOk = ev.endTime
          .map(e => ts < unix_timestamp(lit(e).cast("timestamp")))
          .getOrElse(lit(true)) // no end = permanent (setpoint_change)
        ts >= start && endOk
    }
    df.withColumn(ev.column,
      when(entityOk && active, lit(ev.value)).otherwise(col(ev.column)))
  }

  def applyScheduledEvents(df: DataFrame, tsCol: String, entityCol: String,
                           events: Seq[ScheduledEvent]): DataFrame =
    // priority = list order: later events win on overlap (applied last)
    events.foldLeft(df)(applyScheduledEvent(_, tsCol, entityCol, _))

  /**
   * Per-entity generator override (ColumnGeneratorConfig.entity_overrides,
   * config.py:2230-2247): entities named in `overrides` evaluate their own
   * generator expression; all others use `default`. Pure column algebra.
   */
  def overrideByEntity(entity: Column, default: Column,
                       overrides: Map[String, Column]): Column =
    overrides.foldLeft(default) { case (acc, (name, gen)) =>
      when(entity === name, gen).otherwise(acc)
    }

  /**
   * Chaos injection (config.py:2179-2205 ChaosConfig): outliers (value ×
   * factor at `outlierRate`), row duplication, per-entity downtime windows
   * (rows dropped), and per-column null rates. All hash-seeded on `idCol`
   * so the corrupted frame is bit-reproducible.
   */
  final case class Downtime(startTime: String, endTime: String,
                            entity: Option[String] = None)

  def withNullRate(df: DataFrame, column: String, rate: Double,
                   idCol: String, seed: Long): DataFrame =
    df.withColumn(column,
      when(uniform(col(idCol), seed) < rate, lit(null)).otherwise(col(column)))

  def chaos(df: DataFrame, idCol: String, seed: Long,
            outlierRate: Double = 0.0, outlierFactor: Double = 3.0,
            outlierCols: Seq[String] = Nil,
            duplicateRate: Double = 0.0,
            downtimes: Seq[Downtime] = Nil,
            tsCol: String = "ts", entityCol: String = "entity_id"): DataFrame = {
    val withOutliers =
      if (outlierRate <= 0) df
      else outlierCols.foldLeft(df) { (d, c) =>
        d.withColumn(c,
          when(uniform(col(idCol), seed + c.hashCode) < outlierRate,
            col(c) * outlierFactor).otherwise(col(c)))
      }
    val withDowntime =
      if (downtimes.isEmpty) withOutliers
      else withOutliers.filter(!downtimes.map { dt =>
        dt.entity.map(e => col(entityCol) === e).getOrElse(lit(true)) &&
          col(tsCol) >= lit(dt.startTime).cast("timestamp") &&
          col(tsCol) < lit(dt.endTime).cast("timestamp")
      }.reduce(_ || _))
    if (duplicateRate <= 0) withDowntime
    else withDowntime
      .withColumn("_copies",
        when(uniform(col(idCol), seed - 99) < duplicateRate, lit(2)).otherwise(lit(1)))
      .withColumn("_dup", explode(sequence(lit(1), col("_copies"))))
      .drop("_copies", "_dup")
  }

  /**
   * Bounded random walk with shocks (config.py:1840-1930): the linear walk
   * from [[randomWalk]] plus hash-seeded shock impulses (probability
   * `shockRate`, magnitude uniform in [0, shockMagnitude], direction biased
   * by `shockBias` in [-1, 1]) and hard min/max clamping. Mean reversion in
   * its exact exponential form is sequential; the distributed approximation
   * keeps drift-toward-mean folded into the increment (see [[randomWalk]]),
   * which recovers from shocks over subsequent steps like the reference's
   * PID-ish behavior.
   */
  def boundedRandomWalk(df: DataFrame, entityCol: String, orderCol: String,
                        outputCol: String, seed: Long, start: Double,
                        min: Double, max: Double, volatility: Double = 1.0,
                        drift: Double = 0.0, shockRate: Double = 0.0,
                        shockMagnitude: Double = 10.0,
                        shockBias: Double = 0.0): Column = {
    require(min < max && start >= min && start <= max,
      s"start $start must lie in [$min, $max]")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rowHash = xxhash64(col(entityCol), col(orderCol))
    val base = normal(rowHash, seed) * lit(volatility) + lit(drift)
    val shock =
      if (shockRate <= 0) lit(0.0)
      else {
        val sign = when(uniform(rowHash, seed + 7) < lit((shockBias + 1) / 2), 1.0)
          .otherwise(-1.0)
        when(uniform(rowHash, seed + 13) < shockRate,
          sign * uniform(rowHash, seed + 17) * shockMagnitude).otherwise(lit(0.0))
      }
    least(greatest(sum(base + shock).over(w) + lit(start), lit(min)), lit(max))
  }
}
