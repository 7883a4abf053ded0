package graft

import graft.operators.If97
import org.apache.spark.sql.functions._

/**
 * IAPWS-IF97 verification against the standard's own 9-significant-figure
 * computer-program verification tables (IAPWS R7-97(2012), Tables 5, 15,
 * 33, 35, 36, 42 and the B23 example in §4) — a stronger correctness gate
 * than any SQL-engine oracle for this math.
 */
class If97Spec extends SparkSpec {

  private def rel(actual: Double, expected: Double): Double =
    math.abs(actual - expected) / math.abs(expected)

  private def assertProps(got: Array[Double], want: Array[Double],
                          tol: Double, tag: String): Unit = {
    val names = Array("v", "h", "u", "s", "cp", "w")
    var i = 0
    while (i < 6) {
      assert(rel(got(i), want(i)) < tol,
        s"$tag ${names(i)}: got ${got(i)}, want ${want(i)}")
      i += 1
    }
  }

  // Table 5: region 1 at (300 K, 3 MPa), (300 K, 80 MPa), (500 K, 3 MPa)
  test("region 1 matches IF97 Table 5") {
    assertProps(If97.region1(300.0, 3.0e6),
      Array(0.100215168e-2, 0.115331273e3, 0.112324818e3, 0.392294792,
        0.417301218e1, 0.150773921e4), 1e-8, "r1(300,3MPa)")
    assertProps(If97.region1(300.0, 80.0e6),
      Array(0.971180894e-3, 0.184142828e3, 0.106448356e3, 0.368563852,
        0.401008987e1, 0.163469054e4), 1e-8, "r1(300,80MPa)")
    assertProps(If97.region1(500.0, 3.0e6),
      Array(0.120241800e-2, 0.975542239e3, 0.971934985e3, 0.258041912e1,
        0.465580682e1, 0.124071337e4), 1e-8, "r1(500,3MPa)")
  }

  // Table 15: region 2 at (300 K, 3.5 kPa), (700 K, 3.5 kPa), (700 K, 30 MPa)
  test("region 2 matches IF97 Table 15") {
    assertProps(If97.region2(300.0, 0.0035e6),
      Array(0.394913866e2, 0.254991145e4, 0.241169160e4, 0.852238967e1,
        0.191300162e1, 0.427920172e3), 1e-8, "r2(300,3.5kPa)")
    assertProps(If97.region2(700.0, 0.0035e6),
      Array(0.923015898e2, 0.333568375e4, 0.301262819e4, 0.101749996e2,
        0.208141274e1, 0.644289068e3), 1e-8, "r2(700,3.5kPa)")
    assertProps(If97.region2(700.0, 30.0e6),
      Array(0.542946619e-2, 0.263149474e4, 0.246861076e4, 0.517540298e1,
        0.103505092e2, 0.480386523e3), 1e-8, "r2(700,30MPa)")
  }

  // Table 33: region 3 from (T, rho) — p, h, u, s, cp, w
  test("region 3 (T, rho) matches IF97 Table 33") {
    val cases = Seq(
      (650.0, 500.0, Array(0.255837018e8, 0.186343019e4, 0.181226279e4,
        0.405427273e1, 0.138935717e2, 0.502005554e3)),
      (650.0, 200.0, Array(0.222930643e8, 0.237512401e4, 0.226365868e4,
        0.485438792e1, 0.446579342e2, 0.383444594e3)),
      (750.0, 500.0, Array(0.783095639e8, 0.225868845e4, 0.210206932e4,
        0.446971906e1, 0.634165359e1, 0.760696041e3)))
    for ((t, rho, want) <- cases) {
      val got = If97.region3ByDensity(t, rho)
      val names = Array("p", "h", "u", "s", "cp", "w")
      for (i <- 0 until 6)
        assert(rel(got(i), want(i)) < 1e-8,
          s"r3($t,$rho) ${names(i)}: got ${got(i)}, want ${want(i)}")
    }
  }

  // The density solve must invert Table 33's states (and round-trip
  // subcritical liquid/vapor branches where the isotherm has 3 roots).
  test("region 3 density solve inverts the pressure relation") {
    // tolerance 1e-7: near the critical point dp/drho flattens, so the
    // bisection's ~1e-12 pressure resolution maps to ~1e-8 in density
    assert(rel(If97.region3Density(650.0, 0.255837018e8), 500.0) < 1e-7)
    assert(rel(If97.region3Density(650.0, 0.222930643e8), 200.0) < 1e-7)
    assert(rel(If97.region3Density(750.0, 0.783095639e8), 500.0) < 1e-7)
    // subcritical round trips on both stable branches (T < Tc = 647.096)
    for (t <- Seq(630.0, 640.0, 645.0)) {
      val psat = If97.psatPa(t)
      for (rho <- Seq(480.0, 550.0, 620.0)) { // liquid-side densities
        val p = If97.region3PressurePa(t, rho)
        if (p > psat) // stable liquid state
          assert(rel(If97.region3Density(t, p), rho) < 1e-7,
            s"liquid round trip at T=$t rho=$rho")
      }
      for (rho <- Seq(120.0, 150.0, 180.0)) { // vapor-side densities
        val p = If97.region3PressurePa(t, rho)
        if (p < psat && p > 0) // stable vapor state
          assert(rel(If97.region3Density(t, p), rho) < 1e-7,
            s"vapor round trip at T=$t rho=$rho")
      }
    }
  }

  // Tables 35/36: saturation line both directions
  test("region 4 matches IF97 Tables 35 and 36") {
    assert(rel(If97.psatPa(300.0), 0.353658941e4) < 1e-8)
    assert(rel(If97.psatPa(500.0), 0.263889776e7) < 1e-8)
    assert(rel(If97.psatPa(600.0), 0.123443146e8) < 1e-8)
    assert(rel(If97.tsatK(0.1e6), 0.372755919e3) < 1e-8)
    assert(rel(If97.tsatK(1.0e6), 0.453035632e3) < 1e-8)
    assert(rel(If97.tsatK(10.0e6), 0.584149488e3) < 1e-8)
  }

  // Table 42: region 5 at (1500 K, 0.5 MPa), (1500 K, 30 MPa), (2000 K, 30 MPa)
  test("region 5 matches IF97 Table 42") {
    assertProps(If97.region5(1500.0, 0.5e6),
      Array(0.138455090e1, 0.521976855e4, 0.452749310e4, 0.965408875e1,
        0.261609445e1, 0.917068690e3), 1e-8, "r5(1500,0.5MPa)")
    assertProps(If97.region5(1500.0, 30.0e6),
      Array(0.230761299e-1, 0.516723514e4, 0.447495124e4, 0.772970133e1,
        0.272724317e1, 0.928548002e3), 1e-8, "r5(1500,30MPa)")
    assertProps(If97.region5(2000.0, 30.0e6),
      Array(0.311385219e-1, 0.657122604e4, 0.563707038e4, 0.853640523e1,
        0.288569882e1, 0.106736948e4), 1e-8, "r5(2000,30MPa)")
  }

  // §4 B23 example: theta = 623.15 K <-> pi = 16.5291643 MPa
  test("B23 boundary matches the IF97 example point") {
    assert(rel(If97.b23PressurePa(623.15), 0.165291643e8) < 1e-8)
    assert(rel(If97.b23TemperatureK(0.165291643e8), 623.15) < 1e-8)
  }

  test("region classification picks the standard's regions") {
    assert(If97.region(300.0, 3.0e6) == 1)       // compressed liquid
    assert(If97.region(300.0, 0.0035e6) == 2)    // superheated vapor
    assert(If97.region(700.0, 30.0e6) == 2)      // Table 15's own point:
    // pB23(700 K) = 30.477 MPa, so 30 MPa sits just on the region-2 side
    assert(If97.region(650.0, 25.5837018e6) == 3) // above B23(650)=20.0 MPa
    assert(If97.region(700.0, 0.0035e6) == 2)
    assert(If97.region(1500.0, 30.0e6) == 5)
    assert(If97.region(1500.0, 60.0e6) == 0)     // region 5 caps at 50 MPa
    assert(If97.region(200.0, 1.0e6) == 0)       // below the formulation
    // saturation line belongs to region 1 (boundary convention)
    val t = 450.0
    assert(If97.region(t, If97.psatPa(t)) == 1)
    assert(If97.region(t, If97.psatPa(t) * 0.999) == 2)
  }

  test("native expression and column algebra agree with the static math") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((300.0, 3.0e6), (700.0, 0.0035e6), (650.0, 0.255837018e8),
      (1500.0, 30.0e6), (200.0, 1.0e6))
      .toDF("t_k", "p_pa")
      .withColumn("props", If97.waterProps(col("t_k"), col("p_pa")))
      .withColumn("psat", If97.psatColumn(lit(450.0)))
      .withColumn("tsat", If97.tsatColumn(lit(1.0e6)))
    val rows = df.select("t_k", "p_pa", "props.region", "props.h", "props.v",
      "psat", "tsat").collect().sortBy(r => (r.getDouble(0), r.getDouble(1)))
    // (200, 1 MPa) out of range -> region 0, null properties
    val outOfRange = rows.find(_.getDouble(0) == 200.0).get
    assert(outOfRange.getInt(2) == 0 && outOfRange.isNullAt(3))
    val r1 = rows.find(r => r.getDouble(0) == 300.0).get
    assert(r1.getInt(2) == 1 && rel(r1.getDouble(3), 0.115331273e3) < 1e-8)
    val r3 = rows.find(r => r.getDouble(0) == 650.0).get
    assert(r3.getInt(2) == 3 && rel(1.0 / r3.getDouble(4), 500.0) < 1e-7)
    val r5 = rows.find(r => r.getDouble(0) == 1500.0).get
    assert(r5.getInt(2) == 5 && rel(r5.getDouble(3), 0.516723514e4) < 1e-8)
    // column-algebra saturation matches the static math bit-for-bit
    assert(rows.head.getDouble(5) == If97.psatPa(450.0))
    assert(rows.head.getDouble(6) == If97.tsatK(1.0e6))
    // region-3 (T, rho) expression matches the static math
    val d3 = Seq((650.0, 500.0)).toDF("t_k", "rho")
      .select(If97.region3PropsColumn(col("t_k"), col("rho")).as("r"))
      .select("r.p_pa", "r.cp").head()
    assert(rel(d3.getDouble(0), 0.255837018e8) < 1e-8)
    assert(rel(d3.getDouble(1), 0.138935717e2) < 1e-8)
  }

  test("saturated two-phase properties: steam-table endpoints and lever rule") {
    // endpoints = regions 1/2 evaluated AT the region-4 line; values are
    // classic steam-table anchors (0.1 MPa: tsat 99.61 C, hf 417.4,
    // hg 2674.9; 1 MPa: tsat 179.89 C, hf 762.7, hg 2777.1)
    val at1bar = If97.saturatedProps(0.1e6, 0.0)
    assert(rel(at1bar.getDouble(0), 372.756) < 1e-4, s"tsat ${at1bar.getDouble(0)}")
    assert(rel(at1bar.getDouble(2), 417.44) < 1e-3, s"hf ${at1bar.getDouble(2)}")
    val at1barVap = If97.saturatedProps(0.1e6, 1.0)
    assert(rel(at1barVap.getDouble(2), 2674.9) < 1e-3, s"hg ${at1barVap.getDouble(2)}")
    val at10bar = If97.saturatedProps(1.0e6, 1.0)
    assert(rel(at10bar.getDouble(0), 453.03) < 1e-4)
    assert(rel(at10bar.getDouble(2), 2777.1) < 1e-3)
    assert(rel(at10bar.getDouble(5), 762.68) < 1e-3) // hf endpoint rides along
    // lever rule: x = 0.5 is the exact midpoint of the endpoints
    val mid = If97.saturatedProps(1.0e6, 0.5)
    assert(math.abs(mid.getDouble(2) -
      (mid.getDouble(5) + mid.getDouble(6)) / 2.0) < 1e-9)
    // out-of-range pressure or quality -> nulls, never a crash
    assert(If97.saturatedProps(23e6, 0.5).isNullAt(0))
    assert(If97.saturatedProps(1e6, 1.5).isNullAt(0))
    // just inside the region-1/2 bound (tsat(16.5 MPa) ~ 622.9 K)
    val nearB23 = If97.saturatedProps(16.5e6, 1.0)
    assert(!nearB23.isNullAt(0) && nearB23.getDouble(0) < 623.15)
  }

  test("region-3 saturation construction: 16.53-22.06 MPa band") {
    // Above 623.15 K both phase boundaries live in region 3: densities
    // come from the Helmholtz equation on FORCED branches. Gates:
    //
    //  1. Maxwell: at a solved saturation state the Gibbs energies of
    //     the two phases coincide (g = h - T s) — holds only when the
    //     equation, the region-4 psat line and both density roots are
    //     mutually consistent; no external data needed.
    //  2. pressure closure: p(T, rho_f) == p == p(T, rho_g).
    //  3. boundary continuity with the region-1/2 construction at
    //     623.15 K (IF97's documented inter-region consistency).
    //  4. steam-table anchors at 360 C (public saturated-water tables)
    //     and the critical point (v -> 1/322 m3/kg, hf == hg).
    for (pMPa <- Seq(16.6, 17.0, 18.0, 19.0, 20.0, 21.0, 21.9)) {
      val p = pMPa * 1e6
      val liq = If97.saturatedProps(p, 0.0)
      val vap = If97.saturatedProps(p, 1.0)
      val t = liq.getDouble(0)
      assert(t > 623.15 && t < 647.096, s"$pMPa MPa: tsat $t")
      val (vf, hf, sf) = (liq.getDouble(1), liq.getDouble(2), liq.getDouble(4))
      val (vg, hg, sg) = (vap.getDouble(1), vap.getDouble(2), vap.getDouble(4))
      assert(vf < vg, s"$pMPa MPa: vf $vf !< vg $vg")
      assert(hf < hg, s"$pMPa MPa: hf $hf !< hg $hg")
      // 1. Maxwell (kJ/kg; the construction is iterative — allow the
      // bisection tolerance to show through, not a modeling error)
      val gL = hf - t * sf
      val gV = hg - t * sg
      assert(math.abs(gL - gV) < 0.05, s"$pMPa MPa: gf $gL vs gg $gV")
      // 2. pressure closure at both roots
      assert(rel(If97.region3PressurePa(t, 1.0 / vf), p) < 1e-8)
      assert(rel(If97.region3PressurePa(t, 1.0 / vg), p) < 1e-8)
    }
    // 3. continuity across the 623.15 K construction switch: the two
    // constructions meet within IF97's documented boundary consistency
    val below = If97.saturatedProps(If97.psatPa(623.149), 0.0)
    val above = If97.saturatedProps(If97.psatPa(623.151), 0.0)
    assert(math.abs(below.getDouble(2) - above.getDouble(2)) < 1.0,
      s"hf jump at B23: ${below.getDouble(2)} vs ${above.getDouble(2)}")
    assert(math.abs(below.getDouble(4) - above.getDouble(4)) < 0.005,
      s"sf jump at B23: ${below.getDouble(4)} vs ${above.getDouble(4)}")
    // 4a. public steam-table anchors at 360 C (psat 18.666 MPa):
    // vf 0.001895, vg 0.006950 m3/kg; hf 1761.5, hg 2481.1 kJ/kg
    val p360 = If97.psatPa(633.15)
    assert(rel(p360, 18.666e6) < 2e-3, s"psat(360C) = $p360")
    val l360 = If97.saturatedProps(p360, 0.0)
    val v360 = If97.saturatedProps(p360, 1.0)
    assert(rel(l360.getDouble(1), 0.001895) < 5e-3, s"vf ${l360.getDouble(1)}")
    assert(rel(v360.getDouble(1), 0.006950) < 5e-3, s"vg ${v360.getDouble(1)}")
    assert(rel(l360.getDouble(2), 1761.5) < 5e-3, s"hf ${l360.getDouble(2)}")
    assert(rel(v360.getDouble(2), 2481.1) < 5e-3, s"hg ${v360.getDouble(2)}")
    // 4b. the critical point closes: v -> 1/322, hf -> hg
    val lc = If97.saturatedProps(22.063e6, 0.0)
    val vc = If97.saturatedProps(22.063e6, 1.0)
    assert(rel(lc.getDouble(1), 1.0 / 322.0) < 0.15, s"vf ${lc.getDouble(1)}")
    assert(rel(vc.getDouble(1), 1.0 / 322.0) < 0.15, s"vg ${vc.getDouble(1)}")
    assert(math.abs(lc.getDouble(2) - vc.getDouble(2)) < 150.0,
      s"critical hf ${lc.getDouble(2)} vs hg ${vc.getDouble(2)}")

    // the Column surface + YAML transformer run end-to-end
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((100.0, 1.0), (1000.0, 1.0), (100.0, 0.0)).toDF("p_kpa", "x")
    val out = graft.operators.Domain.saturatedSteam(df, "p_kpa", "kPa",
      qualityCol = Some("x"), prefix = "sat")
    val rows = out.select("p_kpa", "x", "sat_tsat_c", "sat_h").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val hg1bar = rows.find(r => r._1 == 100.0 && r._2 == 1.0).get
    assert(rel(hg1bar._3, 99.606) < 1e-3 && rel(hg1bar._4, 2674.9) < 1e-3)
    val hf1bar = rows.find(r => r._1 == 100.0 && r._2 == 0.0).get
    assert(rel(hf1bar._4, 417.44) < 1e-3)
  }
}
