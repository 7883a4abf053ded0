package graft

import org.apache.spark.sql.functions._
import graft.operators.Domain

class DomainSpec extends SparkSpec {
  import spark.implicits._

  test("unit conversions: linear factor/offset, gauge pressure") {
    val df = Seq((1.0, 100.0, 1.0)).toDF("kg", "c", "barg")
    val out = Domain.unitConvert(
      Domain.unitConvert(
        Domain.unitConvert(df, "kg", "kg", "lb", Some("lb")),
        "c", "C", "F", Some("f")),
      "barg", "barg", "Pa", Some("pa")).collect()(0)
    assert(math.abs(out.getAs[Double]("lb") - 2.20462262) < 1e-6)
    assert(math.abs(out.getAs[Double]("f") - 212.0) < 1e-9)
    // 1 barg = 100000 + 101325 Pa absolute
    assert(math.abs(out.getAs[Double]("pa") - 201325.0) < 1e-6)
    intercept[IllegalArgumentException] { Domain.conversion("kg", "furlong") }
  }

  test("psychrometrics: textbook values at 25C / 50% RH") {
    val out = Domain.psychrometrics(
      Seq((25.0, 0.5)).toDF("t_c", "rh"), "t_c", "rh").collect()(0)
    // Magnus P_sat(25C) ~ 3169 Pa; W ~ 0.00989; dew point ~ 13.86C
    assert(math.abs(out.getAs[Double]("p_sat") - 3169.0) < 10)
    assert(math.abs(out.getAs[Double]("humidity_ratio") - 0.00989) < 2e-4)
    assert(math.abs(out.getAs[Double]("dew_point") - 13.86) < 0.1)
    assert(math.abs(out.getAs[Double]("enthalpy") - 50.3) < 0.5)
  }

  test("wet bulb: Stull's published example and physical bounds") {
    // Stull (2011) §3: T = 20 C, RH = 50% -> Twb = 13.699 C
    val out = Domain.psychrometrics(
      Seq((20.0, 0.5), (30.0, 0.99), (30.0, 0.10)).toDF("t_c", "rh"),
      "t_c", "rh", wetBulbCol = true)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getAs[Double]("wet_bulb")).toMap
    assert(math.abs(out((20.0, 0.5)) - 13.699) < 0.01, out((20.0, 0.5)))
    // saturated air: Twb ~= T; dry air: Twb well below T, above dew point
    assert(math.abs(out((30.0, 0.99)) - 30.0) < 0.5)
    assert(out((30.0, 0.10)) < 16.0 && out((30.0, 0.10)) > 5.0)
  }

  test("phase detection: boundaries on status change per group") {
    val df = Seq(
      ("b1", 1, "heat", 10.0), ("b1", 2, "heat", 20.0), ("b1", 3, "hold", 5.0),
      ("b1", 4, "heat", 7.0), ("b2", 1, "cool", 1.0))
      .toDF("batch", "seq", "status", "v")
      .withColumn("ts", expr("timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,seq*60)"))
    val phased = Domain.detectPhases(df, "batch", "status", Seq(col("ts")))
    val phases = phased.orderBy("batch", "ts").collect()
      .map(r => (r.getAs[String]("batch"), r.getAs[String]("status"), r.getAs[Long]("phase_id")))
    // heat,heat -> phase 1; hold -> 2; heat again -> 3 (sequential, not merged)
    assert(phases.toSeq == Seq(("b1", "heat", 1L), ("b1", "heat", 1L),
      ("b1", "hold", 2L), ("b1", "heat", 3L), ("b2", "cool", 1L)))

    val summary = Domain.phaseSummary(df, "batch", "status", "ts", Seq(col("ts")),
      metrics = Seq("v_max" -> "max(v)"))
    val s1 = summary.filter($"batch" === "b1" && $"phase_id" === 1).collect()(0)
    assert(s1.getAs[Long]("n_rows") == 2 && s1.getAs[Long]("duration_s") == 60)
    assert(s1.getAs[Double]("v_max") == 20.0)
  }

  test("saturation_properties and fluid_properties closed-form subsets") {
    val df = Seq((20.0, 101325.0)).toDF("temp_c", "p_pa")

    // psat at 20 °C ≈ 2.34 kPa; tsat is the exact Magnus inverse
    val sat = Domain.saturationProperties(df, Some("temp_c"), None).collect()(0)
    val psat = sat.getAs[Double]("psat_pa")
    assert(math.abs(psat - 2339.0) < 30.0)
    val roundtrip = Domain.saturationProperties(
      Domain.saturationProperties(df, Some("temp_c"), None),
      None, Some("psat_pa"), prefix = "rt").collect()(0)
    assert(math.abs(roundtrip.getAs[Double]("rt_tsat_c") - 20.0) < 1e-9)

    // dry air at 20 °C / 1 atm ≈ 1.204 kg/m³
    val rho = Domain.fluidProperties(df, "p_pa", "temp_c").collect()(0)
      .getAs[Double]("density")
    assert(math.abs(rho - 1.204) < 0.003)

    // registered under the reference's transformer names
    graft.core.StandardTransformers.registerAll
    assert(graft.core.TransformerRegistry.get("saturation_properties").isDefined)
    assert(graft.core.TransformerRegistry.get("fluid_properties").isDefined)
    intercept[IllegalArgumentException](
      Domain.saturationProperties(df, None, None))
  }
}
