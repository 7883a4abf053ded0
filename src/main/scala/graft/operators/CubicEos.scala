package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Peng-Robinson cubic equation of state (Peng & Robinson 1976, "A New
 * Two-Constant Equation of State", Ind. Eng. Chem. Fundam. 15(1)) for the
 * non-water fluids behind `fluid_properties` (reference:
 * odibi/transformers/thermodynamics.py:189-560 wraps CoolProp for "any
 * fluid"; its guides exercise R134a refrigeration cycles — vapor AND
 * subcooled liquid — plus Air/CO2/Ammonia).
 *
 * Spark-first design: the whole EOS — alpha function, analytic Cardano
 * cubic solve (both the one-real-root and three-real-root branches),
 * stable-root selection by fugacity, the published departure functions
 * for enthalpy/entropy, and the derivative-based cp / speed of sound —
 * evaluates as ONE native codegen'd expression ([[PrProps]], the If97
 * pattern), needing no UDF and no property library. Do NOT "simplify"
 * this back to Column algebra: that formulation duplicated the
 * cubic-solve subtree into every output field, and whole-stage codegen
 * of an aggregate over it split the generated class past Janino's
 * nested-class access rules (runtime IllegalAccessError) — the exact
 * shape is pinned by a CubicEosSpec regression test. Water is NOT
 * handled here: [[If97]] is full-fidelity for water/steam and
 * [[Domain.fluidProperties]] dispatches to it first.
 *
 * Accuracy envelope: vapor densities/fugacities within ~1-2% and
 * saturation pressures within ~1-3% (the published two-constant-cubic
 * envelope). Raw PR liquid densities err -10%..+13% depending on the
 * fluid; the constant volume translation of Péneloux, Rauzy & Fréze 1982
 * ("A consistent correction for Redlich-Kwong-Soave volumes", Fluid
 * Phase Equilib. 8) applied per fluid below cuts that to ~±1.5% over the
 * liquid range (CubicEosSpec pins NIST anchors at states AWAY from each
 * fit point). Still honest cubic-EOS physics, not CoolProp's
 * multiparameter Helmholtz surfaces, and a fail-fast (not a silent
 * ideal-gas answer) for anything outside the registry.
 *
 * Reference state: ideal-gas enthalpy/entropy are zero at T0 = 298.15 K,
 * P0 = 101325 Pa. Absolute h/s therefore differ from CoolProp's
 * per-fluid conventions (IIR/ASHRAE/NBP) by a constant; differences —
 * what cycle analyses use (compressor work, COP) — are convention-free.
 */
object CubicEos {

  /** Universal gas constant [J/(mol K)] (CODATA). */
  val R = 8.314462618

  /**
   * A registered fluid: critical constants + acentric factor (Poling,
   * Prausnitz & O'Connell, "The Properties of Gases and Liquids", 5th ed.
   * appendix / NIST), molar mass [kg/mol], a cubic ideal-gas heat
   * capacity polynomial cp0 = a + bT + cT^2 + dT^3 [J/(mol K)] (Cengel &
   * Boles ideal-gas tables; R134a fit to the Tillner-Roth & Baehr 1994
   * ideal-gas part, +-1% over 250-400 K), and a constant volume
   * translation `cShift` [m3/mol] (Péneloux et al. 1982's v_t = v - c:
   * shifts every molar volume by a fluid constant, leaving the phase
   * split, cp and s untouched while fixing the liquid-density envelope).
   * Each cShift is fit to ONE public NIST saturated-liquid anchor at the
   * normal boiling point (CO2, which sublimes at 1 atm, uses the 0 C
   * saturation state) — the classic Tr≈0.6-0.7 Péneloux regime — and
   * cross-validated in CubicEosSpec at DIFFERENT states to ±2.5%.
   * Air (pseudo-fluid) and hydrogen (quantum gas, PR invalid for its
   * liquid) keep c = 0.
   */
  final case class Fluid(name: String, tc: Double, pcPa: Double,
                         omega: Double, m: Double,
                         cp0: (Double, Double, Double, Double),
                         cShift: Double = 0.0)

  val fluids: Map[String, Fluid] = Seq(
    Fluid("Air", 132.6312, 3.78502e6, 0.0335, 0.0289647,
      (28.11, 0.1967e-2, 0.4802e-5, -1.966e-9)),
    Fluid("Nitrogen", 126.192, 3.3958e6, 0.0372, 0.0280134,
      (28.90, -0.1571e-2, 0.8081e-5, -2.873e-9),
      cShift = -4.051134e-6),  // fit: 77.355 K, 806.6 kg/m3
    Fluid("Oxygen", 154.581, 5.0430e6, 0.0222, 0.0319988,
      (25.48, 1.520e-2, -0.7155e-5, 1.312e-9),
      cShift = -3.190776e-6),  // fit: 90.19 K, 1141.0 kg/m3
    Fluid("CO2", 304.1282, 7.3773e6, 0.22394, 0.0440098,
      (22.26, 5.981e-2, -3.501e-5, 7.469e-9),
      cShift = 8.325329e-7),   // fit: 273.15 K sat (3.4851 MPa), 927.4 kg/m3
    Fluid("Methane", 190.564, 4.5992e6, 0.01142, 0.0160428,
      (19.89, 5.024e-2, 1.269e-5, -11.01e-9),
      cShift = -4.248756e-6),  // fit: 111.67 K, 422.4 kg/m3
    Fluid("Ammonia", 405.40, 11.3330e6, 0.25601, 0.0170305,
      (27.568, 2.5630e-2, 0.99072e-5, -6.6909e-9),
      cShift = 3.046992e-6),   // fit: 239.82 K, 682.0 kg/m3
    Fluid("R134a", 374.21, 4.0593e6, 0.32684, 0.102032,
      (19.0, 0.2581, -1.30e-4, 0.0),
      cShift = 9.265312e-7),   // fit: 247.08 K, 1376.7 kg/m3
    Fluid("Propane", 369.89, 4.2512e6, 0.1521, 0.0440956,
      (-4.04, 30.48e-2, -15.72e-5, 31.74e-9),
      cShift = -5.037549e-6),  // fit: 231.04 K, 580.9 kg/m3
    Fluid("Hydrogen", 33.145, 1.2964e6, -0.219, 0.00201588,
      (29.11, -0.1916e-2, 0.4003e-5, -0.8704e-9)),
    Fluid("Argon", 150.687, 4.8630e6, -0.00219, 0.039948,
      (20.786, 0.0, 0.0, 0.0),
      cShift = -3.445517e-6))  // fit: 87.30 K, 1395.4 kg/m3
    .flatMap(f => aliases(f.name).map(_ -> f)).toMap

  private def aliases(name: String): Seq[String] = (name match {
    case "Air" => Seq("air")
    case "Nitrogen" => Seq("nitrogen", "n2")
    case "Oxygen" => Seq("oxygen", "o2")
    case "CO2" => Seq("co2", "carbondioxide")
    case "Methane" => Seq("methane", "ch4")
    case "Ammonia" => Seq("ammonia", "nh3", "r717")
    case "R134a" => Seq("r134a")
    case "Propane" => Seq("propane", "r290")
    case "Hydrogen" => Seq("hydrogen", "h2")
    case "Argon" => Seq("argon", "ar")
    case other => Seq(other.toLowerCase)
  })

  def lookup(fluid: String): Option[Fluid] = fluids.get(fluid.toLowerCase)

  def supported: Seq[String] =
    fluids.values.map(_.name).toSeq.distinct.sorted

  private val sqrt2 = math.sqrt(2.0)
  private val oneThird = 1.0 / 3.0
  private val fourPiThirds = 4.0 * math.Pi / 3.0

  val propsSchema: StructType = StructType(Seq(
    StructField("z", DoubleType),          // compressibility factor
    StructField("density", DoubleType),    // kg/m3
    StructField("h", DoubleType),          // kJ/kg (ideal-gas ref T0/P0)
    StructField("s", DoubleType),          // kJ/(kg K)
    StructField("cp", DoubleType),         // kJ/(kg K)
    StructField("w", DoubleType),          // m/s
    StructField("phase", StringType)))     // liquid / vapor / supercritical

  /**
   * Full property struct at (T [K], P [Pa]):
   * `struct(z, density [kg/m3], h [kJ/kg], s [kJ/(kg K)], cp, w, phase)`.
   * The reported `z`/`density`/`h` are Péneloux-TRANSLATED
   * (z_t = z_PR − cShift·P/(R·T)); `s`, `cp`, `w` and the phase pick are
   * invariant under the constant volume shift.
   * as ONE native codegen'd expression per row (the If97 pattern). An
   * earlier pure-Column formulation duplicated the cubic-solve subtree
   * into every output field; whole-stage codegen of an aggregate over it
   * split the generated class past Janino's nested-class access rules
   * (IllegalAccessError on BufferedRowIterator.partitionIndex) — a
   * compact static call keeps any surrounding stage's code small.
   */
  def props(f: Fluid, tK: Column, pPa: Column): Column =
    // explicit casts: integer/long T or P columns (whole-Pa pressures are
    // common) must widen in EVERY execution mode — interpreted eval of the
    // raw expression would ClassCastException where codegen silently widens
    ColumnShim.column(PrProps(
      ColumnShim.expression(tK.cast("double")),
      ColumnShim.expression(pPa.cast("double")), f))

  private val phaseLiquid = UTF8String.fromString("liquid")
  private val phaseVapor = UTF8String.fromString("vapor")
  private val phaseSuper = UTF8String.fromString("supercritical")

  /** sign-preserving cube root (Math.pow rejects negative bases). */
  private def cbrt(x: Double): Double =
    Math.signum(x) * Math.pow(Math.abs(x), oneThird)

  /**
   * Scalar evaluation — the 1976 paper's algebra: eq. (4) for a(T)/b,
   * eq. (17) for kappa, the two-branch analytic Cardano solve, the
   * fugacity coefficient from eq. (15) picking the stable root, the
   * standard PR enthalpy/entropy departures, cv from the alpha-function
   * second derivative, cp - cv from the pressure derivatives, and
   * w = sqrt(-(cp/cv) v^2 (dP/dv)_T / M). The association order mirrors
   * the DuckDB oracle in SparkEntry.prOracleSql term for term, so the
   * engines agree to libm-ulp precision. Called from interpreted eval
   * AND generated code.
   */
  def evalProps(tK: Double, pPa: Double, f: Fluid): InternalRow = {
    val kappa = 0.37464 + 1.54226 * f.omega - 0.26992 * f.omega * f.omega
    val ac = 0.45724 * R * R * f.tc * f.tc / f.pcPa
    val b = 0.07780 * R * f.tc / f.pcPa

    val sqrtAlpha = 1.0 + kappa * (1.0 - Math.sqrt(tK / f.tc))
    val a = ac * sqrtAlpha * sqrtAlpha
    val dadT = (-ac * kappa) * sqrtAlpha / Math.sqrt(tK * f.tc)

    val bigA = a * pPa / ((R * R) * tK * tK)
    val bigB = b * pPa / (R * tK)

    // Z^3 + c2 Z^2 + c1 Z + c0 = 0, depressed to t^3 + p t + q = 0
    val c2 = bigB - 1.0
    val c1 = bigA - 3.0 * bigB * bigB - 2.0 * bigB
    val c0 = bigB * bigB * bigB + bigB * bigB - bigA * bigB
    val p3 = c1 - c2 * c2 / 3.0
    val q3 = 2.0 * c2 * c2 * c2 / 27.0 - c2 * c1 / 3.0 + c0
    val disc = q3 * q3 / 4.0 + p3 * p3 * p3 / 27.0
    val threeRoots = disc < 0.0

    // one-real-root branch (Cardano); three-real-root (trigonometric):
    // k=0 largest, k=2 smallest; a "liquid" root at or below B means
    // v <= b — unphysical, discard
    val sd = Math.sqrt(Math.max(disc, 0.0))
    val zSingle = cbrt(q3 / -2.0 + sd) + cbrt(q3 / -2.0 - sd) - c2 / 3.0
    val mC = 2.0 * Math.sqrt(Math.max(p3 / -3.0, 0.0))
    val acosArg = Math.min(Math.max(
      3.0 * q3 / (2.0 * p3) * Math.sqrt(Math.max(-3.0 / p3, 0.0)), -1.0), 1.0)
    val theta = Math.acos(acosArg)
    val zV3 = mC * Math.cos(theta / 3.0) - c2 / 3.0
    val zL3raw = mC * Math.cos(theta / 3.0 - fourPiThirds) - c2 / 3.0
    val liquidValid = zL3raw > bigB * (1.0 + 1e-9)

    // fugacity-stable root pick
    def lnPhi(z: Double): Double =
      (z - 1.0) - Math.log(z - bigB) -
        bigA / ((2.0 * sqrt2) * bigB) *
          Math.log((z + (1.0 + sqrt2) * bigB) / (z + (1.0 - sqrt2) * bigB))
    val pickLiquid = threeRoots && liquidValid && lnPhi(zL3raw) < lnPhi(zV3)
    val z = if (!threeRoots) zSingle else if (pickLiquid) zL3raw else zV3

    // departures [J/mol] at the chosen root
    val lnTerm = Math.log((z + (1.0 + sqrt2) * bigB) / (z + (1.0 - sqrt2) * bigB))
    val hDep = R * tK * (z - 1.0) + (tK * dadT - a) / (2.0 * sqrt2 * b) * lnTerm
    val sDep = R * Math.log(z - bigB) + dadT / (2.0 * sqrt2 * b) * lnTerm

    // ideal-gas caloric part from the cp0 polynomial, T0/P0 reference
    val (ca, cb, cc, cd) = f.cp0
    val t0 = 298.15
    val p0 = 101325.0
    val h0 = ca * (tK - t0) + cb / 2.0 * (tK * tK - t0 * t0) +
      cc / 3.0 * (tK * tK * tK - t0 * t0 * t0) +
      cd / 4.0 * (tK * tK * tK * tK - t0 * t0 * t0 * t0)
    val s0 = ca * Math.log(tK / t0) + cb * (tK - t0) +
      cc / 2.0 * (tK * tK - t0 * t0) +
      cd / 3.0 * (tK * tK * tK - t0 * t0 * t0) -
      R * Math.log(pPa / p0)

    // Péneloux translation v_t = v - c: the EOS derivatives below stay at
    // the UNTRANSLATED root (P(T, v_t) = P_PR(T, v_t + c), so slopes are
    // identical), while the reported volume/density/z/h shift — s, cp and
    // the phase split are provably invariant under a constant translation
    val vMol = z * R * tK / pPa                            // PR m3/mol
    val vT = vMol - f.cShift                               // translated
    val zT = pPa * vT / (R * tK)
    val density = f.m / vT                                 // kg/m3
    val h = (h0 + hDep - f.cShift * pPa) / (f.m * 1000.0)  // kJ/kg
    val s = (s0 + sDep) / (f.m * 1000.0)                   // kJ/(kg K)

    // heat capacities and speed of sound from the EOS derivatives
    // (CubicEosSpec verifies cp == dh/dT at constant P by finite
    // difference):
    //   cv_dep = T d2a/dT2 / (2 sqrt2 b) * lnTerm
    //   cp - cv = -T (dP/dT)_v^2 / (dP/dv)_T ; ideal-gas cp0 - cv0 = R
    //   w = sqrt(-(cp/cv) v^2 (dP/dv)_T / M)
    val d2adT2 = ac * kappa / 2.0 / Math.sqrt(tK * f.tc) *
      (kappa / Math.sqrt(tK * f.tc) + sqrtAlpha / tK)
    val denomQ = vMol * vMol + 2.0 * b * vMol - b * b
    val dPdT = R / (vMol - b) - dadT / denomQ
    val dPdV = -R * tK / ((vMol - b) * (vMol - b)) +
      a * (2.0 * vMol + 2.0 * b) / (denomQ * denomQ)
    val cvDep = tK * d2adT2 / (2.0 * sqrt2 * b) * lnTerm
    val cp0c = ca + cb * tK + cc * tK * tK + cd * tK * tK * tK
    val cvMol = cp0c - R + cvDep
    val cpMol = cvMol - tK * dPdT * dPdT / dPdV
    val cp = cpMol / (f.m * 1000.0)                        // kJ/(kg K)
    // speed of sound at the TRANSLATED volume (dP/dv_t = dP/dv)
    val w = Math.sqrt(cpMol / cvMol * vT * vT * (0.0 - dPdV) / f.m)

    val phase =
      if (tK >= f.tc) phaseSuper
      else if (pickLiquid) phaseLiquid
      else if (!threeRoots && z < 0.3074) phaseLiquid
      else phaseVapor

    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.setDouble(0, zT); r.setDouble(1, density); r.setDouble(2, h)
    r.setDouble(3, s); r.setDouble(4, cp); r.setDouble(5, w)
    r.update(6, phase)
    r
  }
}

/**
 * Native codegen'd Peng-Robinson property bundle: (T [K], p [Pa]) ->
 * struct(z, density, h, s, cp, w, phase) for the fluid captured at plan
 * time. The generated code is a single static call, so the expression
 * stays inside the surrounding WholeStageCodegen span without inflating
 * its generated class.
 */
case class PrProps(left: Expression, right: Expression,
                   fluid: CubicEos.Fluid) extends BinaryExpression {

  override def dataType: DataType = CubicEos.propsSchema
  override def prettyName: String = "pr_props"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, p: Any): Any =
    CubicEos.evalProps(t.asInstanceOf[Double], p.asInstanceOf[Double], fluid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fluidRef = ctx.addReferenceObj("prFluid", fluid,
      classOf[CubicEos.Fluid].getName)
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.operators.CubicEos.evalProps($t, $p, $fluidRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrProps =
    copy(left = newLeft, right = newRight)
}
