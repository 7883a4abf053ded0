package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
 * stable-root selection by fugacity, and the published departure
 * functions for enthalpy/entropy — is pure `Column` algebra, so it stays
 * inside whole-stage codegen (subexpression elimination collapses the
 * shared subtrees) and needs no UDF and no property library. Water is NOT
 * handled here: [[If97]] is full-fidelity for water/steam and
 * [[Domain.fluidProperties]] dispatches to it first.
 *
 * Accuracy envelope (documented, inherent to any two-constant cubic):
 * vapor densities/fugacities within ~1-2%, liquid densities typically
 * 5-10% low, saturation pressures within ~1-3% for the nonpolar and
 * mildly-polar fluids registered below. That is the published PR
 * envelope — honest real-fluid physics, not CoolProp's multiparameter
 * Helmholtz surfaces, and a fail-fast (not a silent ideal-gas answer)
 * for anything outside the registry.
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
   * appendix / NIST), molar mass [kg/mol], and a cubic ideal-gas heat
   * capacity polynomial cp0 = a + bT + cT^2 + dT^3 [J/(mol K)] (Cengel &
   * Boles ideal-gas tables; R134a fit to the Tillner-Roth & Baehr 1994
   * ideal-gas part, +-1% over 250-400 K).
   */
  final case class Fluid(name: String, tc: Double, pcPa: Double,
                         omega: Double, m: Double,
                         cp0: (Double, Double, Double, Double))

  val fluids: Map[String, Fluid] = Seq(
    Fluid("Air", 132.6312, 3.78502e6, 0.0335, 0.0289647,
      (28.11, 0.1967e-2, 0.4802e-5, -1.966e-9)),
    Fluid("Nitrogen", 126.192, 3.3958e6, 0.0372, 0.0280134,
      (28.90, -0.1571e-2, 0.8081e-5, -2.873e-9)),
    Fluid("Oxygen", 154.581, 5.0430e6, 0.0222, 0.0319988,
      (25.48, 1.520e-2, -0.7155e-5, 1.312e-9)),
    Fluid("CO2", 304.1282, 7.3773e6, 0.22394, 0.0440098,
      (22.26, 5.981e-2, -3.501e-5, 7.469e-9)),
    Fluid("Methane", 190.564, 4.5992e6, 0.01142, 0.0160428,
      (19.89, 5.024e-2, 1.269e-5, -11.01e-9)),
    Fluid("Ammonia", 405.40, 11.3330e6, 0.25601, 0.0170305,
      (27.568, 2.5630e-2, 0.99072e-5, -6.6909e-9)),
    Fluid("R134a", 374.21, 4.0593e6, 0.32684, 0.102032,
      (19.0, 0.2581, -1.30e-4, 0.0)),
    Fluid("Propane", 369.89, 4.2512e6, 0.1521, 0.0440956,
      (-4.04, 30.48e-2, -15.72e-5, 31.74e-9)),
    Fluid("Hydrogen", 33.145, 1.2964e6, -0.219, 0.00201588,
      (29.11, -0.1916e-2, 0.4003e-5, -0.8704e-9)),
    Fluid("Argon", 150.687, 4.8630e6, -0.00219, 0.039948,
      (20.786, 0.0, 0.0, 0.0)))
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

  /** sign-preserving cube root as Column algebra (pow rejects negatives). */
  private def cbrtC(x: Column): Column =
    signum(x) * pow(abs(x), lit(1.0 / 3.0))

  /**
   * Full property struct at (T [K], P [Pa]):
   * `struct(z, density [kg/m3], h [kJ/kg], s [kJ/(kg K)], phase)` where
   * phase is 'liquid' / 'vapor' / 'supercritical'. Everything below is the
   * 1976 paper's algebra: eq. (4) for a(T)/b, eq. (17) for kappa, the
   * fugacity coefficient from eq. (15), and the standard enthalpy/entropy
   * departures of the PR form.
   */
  def props(f: Fluid, tK: Column, pPa: Column): Column = {
    // plan-time constants
    val kappa = 0.37464 + 1.54226 * f.omega - 0.26992 * f.omega * f.omega
    val ac = 0.45724 * R * R * f.tc * f.tc / f.pcPa
    val b = 0.07780 * R * f.tc / f.pcPa

    val sqrtAlpha = lit(1.0) + lit(kappa) * (lit(1.0) - sqrt(tK / lit(f.tc)))
    val a = lit(ac) * sqrtAlpha * sqrtAlpha
    val dadT = lit(-ac * kappa) * sqrtAlpha / sqrt(tK * lit(f.tc))

    val bigA = a * pPa / (lit(R * R) * tK * tK)
    val bigB = lit(b) * pPa / (lit(R) * tK)

    // Z^3 + c2 Z^2 + c1 Z + c0 = 0
    val c2 = bigB - lit(1.0)
    val c1 = bigA - lit(3.0) * bigB * bigB - lit(2.0) * bigB
    val c0 = bigB * bigB * bigB + bigB * bigB - bigA * bigB

    // depressed cubic t^3 + p t + q = 0, Z = t - c2/3
    val p3 = c1 - c2 * c2 / lit(3.0)
    val q3 = lit(2.0) * c2 * c2 * c2 / lit(27.0) - c2 * c1 / lit(3.0) + c0
    val disc = q3 * q3 / lit(4.0) + p3 * p3 * p3 / lit(27.0)

    // one-real-root branch (Cardano)
    val sd = sqrt(greatest(disc, lit(0.0)))
    val zSingle = cbrtC(q3 / lit(-2.0) + sd) + cbrtC(q3 / lit(-2.0) - sd) -
      c2 / lit(3.0)

    // three-real-root branch (trigonometric): k=0 largest, k=2 smallest
    val mC = lit(2.0) * sqrt(greatest(p3 / lit(-3.0), lit(0.0)))
    val acosArg = least(greatest(
      lit(3.0) * q3 / (lit(2.0) * p3) * sqrt(greatest(lit(-3.0) / p3, lit(0.0))),
      lit(-1.0)), lit(1.0))
    val theta = acos(acosArg)
    val zV3 = mC * cos(theta / lit(3.0)) - c2 / lit(3.0)
    val zL3raw = mC * cos(theta / lit(3.0) - lit(4.0 * math.Pi / 3.0)) -
      c2 / lit(3.0)
    // a "liquid" root at or below B means v <= b — unphysical, discard
    val liquidValid = zL3raw > bigB * lit(1.0 + 1e-9)

    // ln(phi) — pick the root with the lower fugacity (stable phase)
    def lnPhi(z: Column): Column =
      (z - lit(1.0)) - log(z - bigB) -
        bigA / (lit(2.0 * sqrt2) * bigB) *
          log((z + lit(1.0 + sqrt2) * bigB) / (z + lit(1.0 - sqrt2) * bigB))

    val threeRoots = disc < lit(0.0)
    val pickLiquid = threeRoots && liquidValid && (lnPhi(zL3raw) < lnPhi(zV3))
    val z = when(!threeRoots, zSingle)
      .when(pickLiquid, zL3raw)
      .otherwise(zV3)

    // departures [J/mol] at the chosen root
    val lnTerm = log((z + lit(1.0 + sqrt2) * bigB) / (z + lit(1.0 - sqrt2) * bigB))
    val hDep = lit(R) * tK * (z - lit(1.0)) +
      (tK * dadT - a) / lit(2.0 * sqrt2 * b) * lnTerm
    val sDep = lit(R) * log(z - bigB) + dadT / lit(2.0 * sqrt2 * b) * lnTerm

    // ideal-gas caloric part from the cp0 polynomial, T0/P0 reference
    val (ca, cb, cc, cd) = f.cp0
    val t0 = 298.15
    val p0 = 101325.0
    def h0(t: Column): Column =
      lit(ca) * (t - lit(t0)) + lit(cb / 2.0) * (t * t - lit(t0 * t0)) +
        lit(cc / 3.0) * (t * t * t - lit(t0 * t0 * t0)) +
        lit(cd / 4.0) * (t * t * t * t - lit(t0 * t0 * t0 * t0))
    def s0(t: Column, p: Column): Column =
      lit(ca) * log(t / lit(t0)) + lit(cb) * (t - lit(t0)) +
        lit(cc / 2.0) * (t * t - lit(t0 * t0)) +
        lit(cd / 3.0) * (t * t * t - lit(t0 * t0 * t0)) -
        lit(R) * log(p / lit(p0))

    val vMol = z * lit(R) * tK / pPa                       // m3/mol
    val density = lit(f.m) / vMol                          // kg/m3
    val h = (h0(tK) + hDep) / lit(f.m * 1000.0)            // kJ/kg
    val s = (s0(tK, pPa) + sDep) / lit(f.m * 1000.0)       // kJ/(kg K)
    val phase = when(tK >= lit(f.tc), lit("supercritical"))
      .when(pickLiquid, lit("liquid"))
      .otherwise(when(!threeRoots && z < lit(0.3074), lit("liquid"))
        .otherwise(lit("vapor")))

    // heat capacities and speed of sound from the EOS derivatives
    // (CpSpec verifies cp == dh/dT at constant P by finite difference):
    //   d2a/dT2      (second derivative of the alpha function)
    //   cv_dep = T d2a/dT2 / (2 sqrt2 b) * lnTerm
    //   cp - cv = -T (dP/dT)_v^2 / (dP/dv)_T ; ideal-gas cp0 - cv0 = R
    //   w = sqrt(-(cp/cv) v^2 (dP/dv)_T / M)
    val d2adT2 = lit(ac * kappa / 2.0) / sqrt(tK * lit(f.tc)) *
      (lit(kappa) / sqrt(tK * lit(f.tc)) + sqrtAlpha / tK)
    val denomQ = vMol * vMol + lit(2.0 * b) * vMol - lit(b * b)
    val dPdT = lit(R) / (vMol - lit(b)) - dadT / denomQ
    val dPdV = lit(-R) * tK / ((vMol - lit(b)) * (vMol - lit(b))) +
      a * (lit(2.0) * vMol + lit(2.0 * b)) / (denomQ * denomQ)
    val cvDep = tK * d2adT2 / lit(2.0 * sqrt2 * b) * lnTerm
    val cp0c = lit(ca) + lit(cb) * tK + lit(cc) * tK * tK + lit(cd) * tK * tK * tK
    val cvMol = cp0c - lit(R) + cvDep
    val cpMol = cvMol - tK * dPdT * dPdT / dPdV
    val cp = cpMol / lit(f.m * 1000.0)                     // kJ/(kg K)
    val w = sqrt((cpMol / cvMol) * vMol * vMol * (lit(0.0) - dPdV) / lit(f.m))

    struct(z.as("z"), density.as("density"), h.as("h"), s.as("s"),
      cp.as("cp"), w.as("w"), phase.as("phase"))
  }
}
