package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resample ffill: grid floored to step, holds last obs, null before first") {
    val df = Seq(
      ("a", ts("2026-01-01 00:00:30"), 1.0),
      ("a", ts("2026-01-01 00:02:10"), 3.0),
      ("b", ts("2026-01-01 00:01:00"), 10.0)) // exact grid hit
      .toDF("g", "t", "v")
    val out = TimeSeries.resample(df, "t", Seq("v"), 60, Seq("g"))
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", "2026-01-01 00:00:00.0", None),      // before first obs
      ("a", "2026-01-01 00:01:00.0", Some(1.0)), // held
      ("a", "2026-01-01 00:02:00.0", Some(1.0)), // held (next obs is later)
      ("b", "2026-01-01 00:01:00.0", Some(10.0)) // exact-instant obs wins
    ))
  }

  test("resample interpolate: linear between neighbors, flat after last") {
    val df = Seq(
      ("a", ts("2026-01-01 00:00:30"), 1.0),
      ("a", ts("2026-01-01 00:02:10"), 3.0))
      .toDF("g", "t", "v")
    val out = TimeSeries.resample(df, "t", Seq("v"), 60, Seq("g"),
      strategy = "interpolate")
      .orderBy("t").collect()
      .map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    // 00:00 → before first obs: null
    // 00:01 → (60-30)/(130-30) = 0.3 → 1 + 0.3*2 = 1.6
    // 00:02 → (120-30)/100 = 0.9 → 2.8
    assert(out(0).isEmpty)
    assert(math.abs(out(1).get - 1.6) < 1e-9)
    assert(math.abs(out(2).get - 2.8) < 1e-9)
    // hold-flat after the last observation
    val tail = TimeSeries.resample(
      Seq(("a", ts("2026-01-01 00:00:00"), 5.0),
        ("a", ts("2026-01-01 00:03:30"), 5.0),
        ("a", ts("2026-01-01 00:01:00"), 7.0)).toDF("g", "t", "v"),
      "t", Seq("v"), 60, Seq("g"), strategy = "interpolate")
      .orderBy("t").collect().map(_.getDouble(2))
    // 00:02 and 00:03 interpolate between 00:01(7) and 00:03:30(5)
    assert(math.abs(tail(2) - (7.0 - 2.0 * 60 / 150)) < 1e-9)
  }

  test("rollingAgg: trailing time-range frame, same-instant peers included") {
    val df = Seq(
      ("a", ts("2026-01-01 00:00:00"), 1.0),
      ("a", ts("2026-01-01 00:30:00"), 3.0),
      ("a", ts("2026-01-01 01:15:00"), 5.0), // 00:00 falls out of the hour
      ("a", ts("2026-01-01 01:15:00"), 7.0), // same instant: frame peer
      ("b", ts("2026-01-01 00:00:00"), 100.0))
      .toDF("g", "t", "v")
    val out = TimeSeries.rollingAgg(df, "t", "avg(v)", 3600, Seq("g"), "m")
      .orderBy("g", "t", "v").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == (("a", 1.0, 1.0)))
    assert(out(1) == (("a", 3.0, 2.0)))          // (1+3)/2
    assert(out(2) == (("a", 5.0, 5.0)))          // (3+5+7)/3: peers included
    assert(out(3) == (("a", 7.0, 5.0)))          // identical frame
    assert(out(4) == (("b", 100.0, 100.0)))      // groups independent
  }

  test("flagOutliers: spike flagged against trailing stats, cold start never flags") {
    val base = (0 until 20).map(i => ("a", ts(f"2026-01-01 00:${i}%02d:00"), 10.0))
    val spike = Seq(("a", ts("2026-01-01 00:20:00"), 500.0))
    val flat = (0 until 3).map(i => ("b", ts(f"2026-01-01 00:0$i:00"), 7.0))
    val out = TimeSeries.flagOutliers(
      (base ++ spike ++ flat).toDF("g", "t", "v"), "t", "v", 3600, 3.0, Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(3)))
    // only the spike flags; the flat series (stddev 0) and the cold-start
    // rows never flag
    assert(out.count(_._3) == 1)
    assert(out.find(_._3).get._2 == 500.0)
    graft.core.StandardTransformers.registerAll
    assert(graft.core.TransformerRegistry.names.contains("flag_outliers"))
  }

  test("resample: multiple value columns, ungrouped frame, YAML transformer") {
    val df = Seq(
      (ts("2026-01-01 00:00:00"), 1.0, 100.0),
      (ts("2026-01-01 00:02:00"), 3.0, 300.0))
      .toDF("t", "v1", "v2")
    val out = TimeSeries.resample(df, "t", Seq("v1", "v2"), 60)
      .orderBy("t").collect()
    assert(out.length == 3)
    assert(out(1).getDouble(1) == 1.0 && out(1).getDouble(2) == 100.0)
    // YAML surface
    graft.core.StandardTransformers.registerAll
    assert(graft.core.TransformerRegistry.names.contains("resample"))
    intercept[IllegalArgumentException] {
      TimeSeries.resample(df, "t", Seq("v1"), 60, strategy = "cubic")
    }
  }
}
