package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * IAPWS-IF97 industrial formulation for water and steam — the public
 * standard behind the reference's CoolProp water backend
 * (reference/odibi/transformers/thermodynamics.py:5 "Uses CoolProp ...
 * IAPWS-IF97 for water/steam"). Implemented from the published Revised
 * Release (IAPWS R7-97(2012)): regions 1 (liquid), 2 (vapor),
 * 3 (near-critical, via a bracketed density solve), 4 (saturation line)
 * and 5 (high-T steam), plus the 2/3 boundary equation.
 *
 * Spark-first design: one native codegen'd expression computes every
 * property (v, h, u, s, cp, w) in a single unboxed pass per row — the
 * polynomial sums share their Gibbs/Helmholtz derivative evaluations,
 * which a composed-Column formulation would recompute per property after
 * alias inlining. Saturation-line psat/tsat are ALSO exposed as pure
 * Column algebra: the region-4 equation needs only +,-,*,/ and sqrt —
 * all IEEE-754 correctly-rounded — so those columns hash-match a DuckDB
 * reformulation bit-for-bit (q_if97_sat is oracle-gated on that).
 *
 * Correctness: asserted against the standard's own 9-significant-figure
 * verification tables (Tables 5, 15, 33, 35, 36, 42) in If97Spec —
 * a stronger gate than any SQL-engine oracle for this math.
 */
object If97 {

  /** Specific gas constant of ordinary water, J/(kg K) (IF97 eq. 1). */
  final val R = 461.526

  final val Tc = 647.096     // critical temperature, K
  final val Pc = 22.064e6    // critical pressure, Pa
  final val RhoC = 322.0     // critical density, kg/m3

  // ------------------------------------------------------------------
  // Region 1 (IF97 eq. 7, Table 2): liquid, 273.15 K <= T <= 623.15 K,
  // psat(T) <= p <= 100 MPa. gamma(pi, tau) with pi = p/16.53 MPa,
  // tau = 1386/T; base terms (7.1 - pi), (tau - 1.222).
  // ------------------------------------------------------------------
  private val r1I = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 2, 2,
    2, 2, 3, 3, 3, 4, 4, 4, 5, 8, 8, 21, 23, 29, 30, 31, 32)
  private val r1J = Array(-2, -1, 0, 1, 2, 3, 4, 5, -9, -7, -1, 0, 1, 3, -3,
    0, 1, 3, 17, -4, 0, 6, -5, -2, 10, -8, -11, -6, -29, -31, -38, -39, -40, -41)
  private val r1N = Array(
    0.14632971213167, -0.84548187169114, -0.37563603672040e1,
    0.33855169168385e1, -0.95791963387872, 0.15772038513228,
    -0.16616417199501e-1, 0.81214629983568e-3, 0.28319080123804e-3,
    -0.60706301565874e-3, -0.18990068218419e-1, -0.32529748770505e-1,
    -0.21841717175414e-1, -0.52838357969930e-4, -0.47184321073267e-3,
    -0.30001780793026e-3, 0.47661393906987e-4, -0.44141845330846e-5,
    -0.72694996297594e-15, -0.31679644845054e-4, -0.28270797985312e-5,
    -0.85205128120103e-9, -0.22425281908000e-5, -0.65171222895601e-6,
    -0.14341729937924e-12, -0.40516996860117e-6, -0.12734301741641e-8,
    -0.17424871230634e-9, -0.68762131295531e-18, 0.14478307828521e-19,
    0.26335781662795e-22, -0.11947622640071e-22, 0.18228094581404e-23,
    -0.93537087292458e-25)

  // ------------------------------------------------------------------
  // Region 2 (IF97 eq. 15-17, Tables 10-11): vapor. pi = p/1 MPa,
  // tau = 540/T; ideal part gamma0 = ln pi + sum n tau^J, residual
  // gammaR = sum n pi^I (tau - 0.5)^J.
  // ------------------------------------------------------------------
  private val r2J0 = Array(0, 1, -5, -4, -3, -2, -1, 2, 3)
  private val r2N0 = Array(
    -0.96927686500217e1, 0.10086655968018e2, -0.56087911283020e-2,
    0.71452738081455e-1, -0.40710498223928, 0.14240819171444e1,
    -0.43839511319450e1, -0.28408632460772, 0.21268463753307e-1)
  private val r2I = Array(1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 4, 4,
    4, 5, 6, 6, 6, 7, 7, 7, 8, 8, 9, 10, 10, 10, 16, 16, 18, 20, 20, 20, 21,
    22, 23, 24, 24, 24)
  private val r2Jr = Array(0, 1, 2, 3, 6, 1, 2, 4, 7, 36, 0, 1, 3, 6, 35, 1,
    2, 3, 7, 3, 16, 35, 0, 11, 25, 8, 36, 13, 4, 10, 14, 29, 50, 57, 20, 35,
    48, 21, 53, 39, 26, 40, 58)
  private val r2Nr = Array(
    -0.17731742473213e-2, -0.17834862292358e-1, -0.45996013696365e-1,
    -0.57581259083432e-1, -0.50325278727930e-1, -0.33032641670203e-4,
    -0.18948987516315e-3, -0.39392777243355e-2, -0.43797295650573e-1,
    -0.26674547914087e-4, 0.20481737692309e-7, 0.43870667284435e-6,
    -0.32277677238570e-4, -0.15033924542148e-2, -0.40668253562649e-1,
    -0.78847309559367e-9, 0.12790717852285e-7, 0.48225372718507e-6,
    0.22922076337661e-5, -0.16714766451061e-10, -0.21171472321355e-2,
    -0.23895741934104e2, -0.59059564324270e-17, -0.12621808899101e-5,
    -0.38946842435739e-1, 0.11256211360459e-10, -0.82311340897998e1,
    0.19809712802088e-7, 0.10406965210174e-18, -0.10234747095929e-12,
    -0.10018179379511e-8, -0.80882908646985e-10, 0.10693031879409,
    -0.33662250574171, 0.89185845355421e-24, 0.30629316876232e-12,
    -0.42002467698208e-5, -0.59056029685639e-25, 0.37826947613457e-5,
    -0.12768608934681e-14, 0.73087610595061e-28, 0.55414715350778e-16,
    -0.94369707241210e-6)

  // ------------------------------------------------------------------
  // Region 3 (IF97 eq. 28, Table 30): Helmholtz phi(delta, tau) with
  // delta = rho/322, tau = 647.096/T; first coefficient multiplies
  // ln(delta).
  // ------------------------------------------------------------------
  private val r3I = Array(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 6, 6, 6, 7, 8, 9, 9, 10, 10, 11)
  private val r3J = Array(0, 1, 2, 7, 10, 12, 23, 2, 6, 15, 17, 0, 2, 6, 7,
    22, 26, 0, 2, 4, 16, 26, 0, 2, 4, 26, 1, 3, 26, 0, 2, 26, 2, 26, 2, 26,
    0, 1, 26)
  private val r3N1 = 0.10658070028513e1 // * ln(delta)
  private val r3N = Array(
    -0.15732845290239e2, 0.20944396974307e2, -0.76867707878716e1,
    0.26185947787954e1, -0.28080781148620e1, 0.12053369696517e1,
    -0.84566812812502e-2, -0.12654315477714e1, -0.11524407806681e1,
    0.88521043984318, -0.64207765181607, 0.38493460186671,
    -0.85214708824206, 0.48972281541877e1, -0.30502617256965e1,
    0.39420536879154e-1, 0.12558408424308, -0.27999329698710,
    0.13899799569460e1, -0.20189915023570e1, -0.82147637173963e-2,
    -0.47596035734923, 0.43984074473500e-1, -0.44476435428739,
    0.90572070719733, 0.70522450087967, 0.10770512626332,
    -0.32913623258954, -0.50871062041158, -0.22175400873096e-1,
    0.94260751665092e-1, 0.16436278447961, -0.13503372241348e-1,
    -0.14834345352472e-1, 0.57922953628084e-3, 0.32308904703711e-2,
    0.80964802996215e-4, -0.16557679795037e-3, -0.44923899061815e-4)

  // Region 4 saturation line (IF97 eq. 29-31, Table 34).
  private val n4 = Array(
    0.11670521452767e4, -0.72421316703206e6, -0.17073846940092e2,
    0.12020824702470e5, -0.32325550322333e7, 0.14915108613530e2,
    -0.48232657361591e4, 0.40511340542057e6, -0.23855557567849,
    0.65017534844798e3)

  // Region 2/3 boundary (IF97 eq. 5-6, Table 1).
  private val nB23 = Array(
    0.34805185628969e3, -0.11671859879975e1, 0.10192970039326e-2,
    0.57254459862746e3, 0.13918839778870e2)

  // Region 5 (IF97 2007 revision, Tables 37-38). pi = p/1 MPa, tau = 1000/T.
  private val r5J0 = Array(0, 1, -3, -2, -1, 2)
  private val r5N0 = Array(
    -0.13179983674201e2, 0.68540841634434e1, -0.24805148933466e-1,
    0.36901534980333, -0.31161318213925e1, -0.32961626538917)
  private val r5I = Array(1, 1, 1, 2, 2, 3)
  private val r5Jr = Array(1, 2, 3, 3, 9, 7)
  private val r5Nr = Array(
    0.15736404855259e-2, 0.90153761673944e-3, -0.50270077677648e-2,
    0.22440037409485e-5, -0.41163275453471e-5, 0.37919454822955e-7)

  /** Integer power by repeated multiplication — deterministic (no libm)
    * and faster than Math.pow for the small exponents IF97 uses. */
  private def powi(x: Double, n: Int): Double = {
    if (n == 0) return 1.0
    var e = if (n < 0) -n else n
    var base = x
    var acc = 1.0
    while (e > 0) {
      if ((e & 1) == 1) acc *= base
      base *= base
      e >>= 1
    }
    if (n < 0) 1.0 / acc else acc
  }

  // ---------------- region 4: saturation line ----------------

  /** Saturation pressure [Pa] for 273.15 K <= T <= 647.096 K (eq. 30). */
  def psatPa(tK: Double): Double = {
    val theta = tK + n4(8) / (tK - n4(9))
    val a = theta * theta + n4(0) * theta + n4(1)
    val b = n4(2) * theta * theta + n4(3) * theta + n4(4)
    val c = n4(5) * theta * theta + n4(6) * theta + n4(7)
    val x = 2.0 * c / (-b + math.sqrt(b * b - 4.0 * a * c))
    val x2 = x * x
    x2 * x2 * 1.0e6
  }

  /** Saturation temperature [K] for 611.213 Pa <= p <= 22.064 MPa (eq. 31). */
  def tsatK(pPa: Double): Double = {
    val beta = math.sqrt(math.sqrt(pPa / 1.0e6))
    val e = beta * beta + n4(2) * beta + n4(5)
    val f = n4(0) * beta * beta + n4(3) * beta + n4(6)
    val g = n4(1) * beta * beta + n4(4) * beta + n4(7)
    val d = 2.0 * g / (-f - math.sqrt(f * f - 4.0 * e * g))
    val s = n4(9) + d
    (s - math.sqrt(s * s - 4.0 * (n4(8) + n4(9) * d))) / 2.0
  }

  /** Region 2/3 boundary pressure [Pa] from T [K] (eq. 5). */
  def b23PressurePa(tK: Double): Double =
    (nB23(0) + nB23(1) * tK + nB23(2) * tK * tK) * 1.0e6

  /** Region 2/3 boundary temperature [K] from p [Pa] (eq. 6). */
  def b23TemperatureK(pPa: Double): Double =
    nB23(3) + math.sqrt((pPa / 1.0e6 - nB23(4)) / nB23(2))

  // ---------------- region classification ----------------

  /**
   * IF97 region for (T [K], p [Pa]): 1, 2, 3, 5; 0 = outside the
   * formulation's range. The saturation line itself classifies as the
   * liquid region (p == psat -> 1), matching the standard's convention
   * that region 1 includes its boundaries.
   */
  def region(tK: Double, pPa: Double): Int = {
    if (tK.isNaN || pPa.isNaN || tK < 273.15 || pPa <= 0 || pPa > 100.0e6) return 0
    if (tK <= 623.15) {
      if (pPa >= psatPa(tK)) 1 else 2
    } else if (tK <= 863.15) {
      if (pPa > b23PressurePa(tK)) 3 else 2
    } else if (tK <= 1073.15) {
      2
    } else if (tK <= 2273.15 && pPa <= 50.0e6) {
      5
    } else 0
  }

  // ---------------- region 1 ----------------

  /** Region 1 properties: Array(v, h, u, s, cp, w) in m3/kg, kJ/kg,
    * kJ/kg, kJ/(kg K), kJ/(kg K), m/s. */
  def region1(tK: Double, pPa: Double): Array[Double] = {
    val pi = pPa / 16.53e6
    val tau = 1386.0 / tK
    val xp = 7.1 - pi
    val xt = tau - 1.222
    var g = 0.0; var gp = 0.0; var gpp = 0.0
    var gt = 0.0; var gtt = 0.0; var gpt = 0.0
    var i = 0
    while (i < r1N.length) {
      val ii = r1I(i); val jj = r1J(i); val n = r1N(i)
      val pI = powi(xp, ii)
      val tJ = powi(xt, jj)
      g += n * pI * tJ
      gp -= n * ii * powi(xp, ii - 1) * tJ
      gpp += n * ii * (ii - 1) * powi(xp, ii - 2) * tJ
      gt += n * pI * jj * powi(xt, jj - 1)
      gtt += n * pI * jj * (jj - 1) * powi(xt, jj - 2)
      gpt -= n * ii * powi(xp, ii - 1) * jj * powi(xt, jj - 1)
      i += 1
    }
    val rt = R * tK
    val v = pi * gp * rt / pPa
    val h = rt * tau * gt / 1000.0
    val u = rt * (tau * gt - pi * gp) / 1000.0
    val s = R * (tau * gt - g) / 1000.0
    val cp = -R * tau * tau * gtt / 1000.0
    val w2 = rt * gp * gp / ((gp - tau * gpt) * (gp - tau * gpt) / (tau * tau * gtt) - gpp)
    Array(v, h, u, s, cp, math.sqrt(w2))
  }

  // ---------------- regions 2 and 5 (shared Gibbs form) ----------------

  private def gibbsVapor(tK: Double, pPa: Double, tStar: Double,
                         j0: Array[Int], nn0: Array[Double],
                         ir: Array[Int], jr: Array[Int], nr: Array[Double],
                         tauShift: Double): Array[Double] = {
    val pi = pPa / 1.0e6
    val tau = tStar / tK
    // ideal part
    var g0t = 0.0; var g0tt = 0.0; var g0 = math.log(pi)
    var i = 0
    while (i < nn0.length) {
      val jj = j0(i); val n = nn0(i)
      g0 += n * powi(tau, jj)
      g0t += n * jj * powi(tau, jj - 1)
      g0tt += n * jj * (jj - 1) * powi(tau, jj - 2)
      i += 1
    }
    // residual part in (tau - tauShift)
    val xt = tau - tauShift
    var gr = 0.0; var grp = 0.0; var grpp = 0.0
    var grt = 0.0; var grtt = 0.0; var grpt = 0.0
    i = 0
    while (i < nr.length) {
      val ii = ir(i); val jj = jr(i); val n = nr(i)
      val pI = powi(pi, ii)
      val tJ = powi(xt, jj)
      gr += n * pI * tJ
      grp += n * ii * powi(pi, ii - 1) * tJ
      grpp += n * ii * (ii - 1) * powi(pi, ii - 2) * tJ
      grt += n * pI * jj * powi(xt, jj - 1)
      grtt += n * pI * jj * (jj - 1) * powi(xt, jj - 2)
      grpt += n * ii * powi(pi, ii - 1) * jj * powi(xt, jj - 1)
      i += 1
    }
    val rt = R * tK
    val gpTot = 1.0 / pi + grp
    val gtTot = g0t + grt
    val v = pi * gpTot * rt / pPa
    val h = rt * tau * gtTot / 1000.0
    val u = rt * (tau * gtTot - pi * gpTot) / 1000.0
    val s = R * (tau * gtTot - (g0 + gr)) / 1000.0
    val cp = -R * tau * tau * (g0tt + grtt) / 1000.0
    val num = 1.0 + 2.0 * pi * grp + pi * pi * grp * grp
    val b = 1.0 + pi * grp - tau * pi * grpt
    val den = (1.0 - pi * pi * grpp) + b * b / (tau * tau * (g0tt + grtt))
    val w2 = rt * num / den
    Array(v, h, u, s, cp, math.sqrt(w2))
  }

  /** Region 2 properties (same units as [[region1]]). */
  def region2(tK: Double, pPa: Double): Array[Double] =
    gibbsVapor(tK, pPa, 540.0, r2J0, r2N0, r2I, r2Jr, r2Nr, 0.5)

  /** Region 5 properties (same units as [[region1]]). */
  def region5(tK: Double, pPa: Double): Array[Double] =
    gibbsVapor(tK, pPa, 1000.0, r5J0, r5N0, r5I, r5Jr, r5Nr, 0.0)

  // ---------------- region 3 ----------------

  /** Region 3 Helmholtz derivatives at (delta, tau):
    * Array(phi, phi_d, phi_dd, phi_t, phi_tt, phi_dt). */
  private def phi3(delta: Double, tau: Double): Array[Double] = {
    var f = r3N1 * math.log(delta)
    var fd = r3N1 / delta
    var fdd = -r3N1 / (delta * delta)
    var ft = 0.0; var ftt = 0.0; var fdt = 0.0
    var i = 0
    while (i < r3N.length) {
      val ii = r3I(i); val jj = r3J(i); val n = r3N(i)
      val dI = powi(delta, ii)
      val tJ = powi(tau, jj)
      f += n * dI * tJ
      fd += n * ii * powi(delta, ii - 1) * tJ
      fdd += n * ii * (ii - 1) * powi(delta, ii - 2) * tJ
      ft += n * dI * jj * powi(tau, jj - 1)
      ftt += n * dI * jj * (jj - 1) * powi(tau, jj - 2)
      fdt += n * ii * powi(delta, ii - 1) * jj * powi(tau, jj - 1)
      i += 1
    }
    Array(f, fd, fdd, ft, ftt, fdt)
  }

  /** Region 3 pressure [Pa] from (T [K], rho [kg/m3]) — eq. 28's p relation. */
  def region3PressurePa(tK: Double, rho: Double): Double = {
    val delta = rho / RhoC
    val tau = Tc / tK
    val d = phi3(delta, tau)
    rho * R * tK * delta * d(1)
  }

  /** Region 3 properties from (T [K], rho [kg/m3]):
    * Array(pPa, h, u, s, cp, w) — kJ/kg, kJ/(kg K), m/s. */
  def region3ByDensity(tK: Double, rho: Double): Array[Double] = {
    val delta = rho / RhoC
    val tau = Tc / tK
    val d = phi3(delta, tau)
    val f = d(0); val fd = d(1); val fdd = d(2)
    val ft = d(3); val ftt = d(4); val fdt = d(5)
    val rt = R * tK
    val p = rho * rt * delta * fd
    val u = rt * tau * ft / 1000.0
    val h = rt * (tau * ft + delta * fd) / 1000.0
    val s = R * (tau * ft - f) / 1000.0
    val a = delta * fd - delta * tau * fdt
    val b = 2.0 * delta * fd + delta * delta * fdd
    val cp = R * (-tau * tau * ftt + a * a / b) / 1000.0
    val w2 = rt * (b - a * a / (tau * tau * ftt))
    Array(p, h, u, s, cp, math.sqrt(w2))
  }

  /**
   * Solve region 3 density [kg/m3] from (T [K], p [Pa]).
   *
   * Below Tc an isotherm crosses a target pressure up to three times
   * (the two-phase loop); the stable branch is picked by p vs psat(T):
   * the liquid root is the LAST sign change scanning density downward
   * from 765 kg/m3, the vapor root the FIRST scanning upward from
   * ~ideal gas. A monotone step scan brackets exactly one crossing on
   * the stable branch, then bisection converges to ~1e-12 relative —
   * deterministic (no libm beyond sqrt/log), so results are
   * reproducible across JVMs.
   */
  def region3Density(tK: Double, pPa: Double): Double =
    if (tK >= Tc) bisectRho(tK, pPa, 1.0, 765.0)
    else region3SatDensity(tK, pPa, liquid = pPa >= psatPa(tK))

  /**
   * Branch-FORCED density solve below Tc: at p == psat(T) an isotherm
   * has both a liquid and a vapor root (the two phase boundaries) and
   * the stability pick above would choose one arbitrarily by floating
   * noise — the region-3 saturation construction needs each explicitly.
   */
  def region3SatDensity(tK: Double, pPa: Double, liquid: Boolean): Double = {
    def f(rho: Double): Double = region3PressurePa(tK, rho) - pPa
    var lo = 0.0; var hi = 0.0
    if (liquid) {
      // liquid branch: scan down from the dense end to the first crossing
      var x = 765.0
      var prev = f(x)
      var found = false
      while (!found && x > RhoC) {
        val nx = x / 1.02
        val fn = f(nx)
        if (prev > 0 && fn <= 0) { lo = nx; hi = x; found = true }
        else { x = nx; prev = fn }
      }
      if (!found) { lo = RhoC; hi = 765.0 }
    } else {
      // vapor branch: scan up from a dilute start to the first crossing
      var x = math.max(pPa / (R * tK) / 2.0, 0.01)
      var prev = f(x)
      var found = false
      while (!found && x < RhoC) {
        val nx = math.min(x * 1.5, RhoC)
        val fn = f(nx)
        if (prev < 0 && fn >= 0) { lo = x; hi = nx; found = true }
        else { x = nx; prev = fn }
        if (nx >= RhoC && !found) { lo = x; hi = RhoC; found = true }
      }
    }
    bisectRho(tK, pPa, lo, hi)
  }

  private def bisectRho(tK: Double, pPa: Double, lo0: Double, hi0: Double): Double = {
    def f(rho: Double): Double = region3PressurePa(tK, rho) - pPa
    var lo = lo0; var hi = hi0
    var i = 0
    while (i < 200 && (hi - lo) > 1e-12 * hi) {
      val mid = (lo + hi) / 2.0
      if (f(mid) <= 0) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2.0
  }

  /** Region 3 properties from (T [K], p [Pa]) via the density solve:
    * Array(v, h, u, s, cp, w). */
  def region3(tK: Double, pPa: Double): Array[Double] = {
    val rho = region3Density(tK, pPa)
    val d = region3ByDensity(tK, rho)
    Array(1.0 / rho, d(1), d(2), d(3), d(4), d(5))
  }

  // ---------------- dispatch ----------------

  private val nullRow: InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.setInt(0, 0)
    r
  }

  /**
   * Two-phase saturated properties at (p [Pa], quality x in [0, 1]):
   * struct(tsat_k, v, h, u, s, hf, hg) — the reference's fixed-quality
   * steam surface (`quality: 1.0` saturated vapor, `0.0` saturated
   * liquid). Below 623.15 K (psat ≈ 16.529 MPa) hf/hg come from
   * evaluating region 1 / region 2 AT the region-4 saturation line (the
   * standard IF97 construction, IAPWS R7-97 §§5-6); from there to the
   * critical point the boundaries live in REGION 3, so both phase
   * densities are solved from the Helmholtz equation on their forced
   * branches ([[region3SatDensity]]) and the properties evaluated at
   * those roots — the construction IAPWS SR3-03 exists to approximate
   * in closed form (the iteration here trades a few bisection steps for
   * zero extra coefficient tables). Mixed properties are the lever-rule
   * blend. Out-of-range pressure or quality yields nulls, matching
   * [[props]]'s flag-don't-crash convention.
   */
  def saturatedProps(pPa: Double, x: Double): InternalRow = {
    if (!(pPa >= 611.213 && pPa <= 22.064e6) || !(x >= 0.0 && x <= 1.0))
      return satNullRow
    val t = tsatK(pPa)
    val (f, g) =
      if (t <= 623.15) (region1(t, pPa), region2(t, pPa))
      else {
        // region-3 band: Array(v, h, u, s) at each forced-branch root,
        // matching the region1/region2 output layout used below
        val rhoL = region3SatDensity(t, pPa, liquid = true)
        val rhoG = region3SatDensity(t, pPa, liquid = false)
        val dl = region3ByDensity(t, rhoL)
        val dg = region3ByDensity(t, rhoG)
        (Array(1.0 / rhoL, dl(1), dl(2), dl(3)),
          Array(1.0 / rhoG, dg(1), dg(2), dg(3)))
      }
    def mix(i: Int): Double = f(i) + x * (g(i) - f(i))
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.setDouble(0, t)
    r.setDouble(1, mix(0)); r.setDouble(2, mix(1)); r.setDouble(3, mix(2))
    r.setDouble(4, mix(3))
    r.setDouble(5, f(1)); r.setDouble(6, g(1))
    r
  }

  private val satNullRow: InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    (0 until 7).foreach(r.setNullAt)
    r
  }

  val satPropsSchema: StructType = StructType(Seq(
    StructField("tsat_k", DoubleType),
    StructField("v", DoubleType),          // m3/kg
    StructField("h", DoubleType),          // kJ/kg
    StructField("u", DoubleType),          // kJ/kg
    StructField("s", DoubleType),          // kJ/(kg K)
    StructField("hf", DoubleType),         // sat liquid enthalpy
    StructField("hg", DoubleType)))        // sat vapor enthalpy

  /** Saturated two-phase bundle as ONE native expression (pPa, x). */
  def saturatedPropsColumn(pPa: Column, x: Column): Column =
    ColumnShim.column(If97SaturatedProps(
      ColumnShim.expression(pPa.cast("double")),
      ColumnShim.expression(x.cast("double"))))

  /** Full (T [K], p [Pa]) property dispatch across regions 1/2/3/5:
    * struct(region, v, h, u, s, cp, w). Region 0 (out of range) yields
    * null properties. Called from interpreted eval AND generated code. */
  def props(tK: Double, pPa: Double): InternalRow = {
    val reg = region(tK, pPa)
    if (reg == 0) return nullRow
    val a = reg match {
      case 1 => region1(tK, pPa)
      case 2 => region2(tK, pPa)
      case 3 => region3(tK, pPa)
      case 5 => region5(tK, pPa)
    }
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.setInt(0, reg)
    r.setDouble(1, a(0)); r.setDouble(2, a(1)); r.setDouble(3, a(2))
    r.setDouble(4, a(3)); r.setDouble(5, a(4)); r.setDouble(6, a(5))
    r
  }

  /** (T [K], rho [kg/m3]) -> struct(p_pa, h, u, s, cp, w) for region 3
    * callers that carry density (the standard's own region-3 variables). */
  def propsByDensity(tK: Double, rho: Double): InternalRow = {
    val a = region3ByDensity(tK, rho)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(6)
    var i = 0
    while (i < 6) { r.setDouble(i, a(i)); i += 1 }
    r
  }

  // ---------------- column surface ----------------

  val propsSchema: StructType = StructType(Seq(
    StructField("region", IntegerType, nullable = false),
    StructField("v", DoubleType),          // specific volume, m3/kg
    StructField("h", DoubleType),          // enthalpy, kJ/kg
    StructField("u", DoubleType),          // internal energy, kJ/kg
    StructField("s", DoubleType),          // entropy, kJ/(kg K)
    StructField("cp", DoubleType),         // isobaric heat capacity, kJ/(kg K)
    StructField("w", DoubleType)))         // speed of sound, m/s

  /** All IF97 properties as ONE native expression call (tempK, presPa). */
  def waterProps(tempK: Column, presPa: Column): Column =
    ColumnShim.column(If97WaterProps(
      ColumnShim.expression(tempK), ColumnShim.expression(presPa)))

  /** Region-3 properties from (tempK, rho) as ONE native expression call. */
  def region3PropsColumn(tempK: Column, rho: Column): Column =
    ColumnShim.column(If97Region3Props(
      ColumnShim.expression(tempK), ColumnShim.expression(rho)))

  /**
   * Saturation pressure [Pa] as pure Column algebra (eq. 30). Uses only
   * +,-,*,/ and sqrt — every op IEEE-754 correctly rounded, so a DuckDB
   * reformulation with the same association order is bit-identical
   * (the q_if97_sat oracle rides on this).
   */
  def psatColumn(tK: Column): Column = {
    val theta = tK + lit(n4(8)) / (tK - lit(n4(9)))
    val a = theta * theta + lit(n4(0)) * theta + lit(n4(1))
    val b = lit(n4(2)) * theta * theta + lit(n4(3)) * theta + lit(n4(4))
    val c = lit(n4(5)) * theta * theta + lit(n4(6)) * theta + lit(n4(7))
    val x = lit(2.0) * c / (-b + sqrt(b * b - lit(4.0) * a * c))
    val x2 = x * x
    x2 * x2 * lit(1.0e6)
  }

  /** Saturation temperature [K] as pure Column algebra (eq. 31) —
    * same bit-exactness argument as [[psatColumn]]. */
  def tsatColumn(pPa: Column): Column = {
    val beta = sqrt(sqrt(pPa / lit(1.0e6)))
    val e = beta * beta + lit(n4(2)) * beta + lit(n4(5))
    val f = lit(n4(0)) * beta * beta + lit(n4(3)) * beta + lit(n4(6))
    val g = lit(n4(1)) * beta * beta + lit(n4(4)) * beta + lit(n4(7))
    val d = lit(2.0) * g / (-f - sqrt(f * f - lit(4.0) * e * g))
    val s = lit(n4(9)) + d
    (s - sqrt(s * s - lit(4.0) * (lit(n4(8)) + lit(n4(9)) * d))) / lit(2.0)
  }
}

/**
 * Native codegen'd IF97 property bundle: (T [K], p [Pa]) ->
 * struct(region, v, h, u, s, cp, w). One call evaluates all shared
 * Gibbs/Helmholtz derivative sums exactly once per row; the generated
 * code is a single static call, so the expression stays inside the
 * surrounding WholeStageCodegen span.
 */
case class If97WaterProps(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = If97.propsSchema
  override def prettyName: String = "if97_water_props"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, p: Any): Any =
    If97.props(t.asInstanceOf[Double], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.operators.If97.props($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): If97WaterProps =
    copy(left = newLeft, right = newRight)
}

/**
 * Region-3 property bundle from the standard's own region-3 variables:
 * (T [K], rho [kg/m3]) -> struct(p_pa, h, u, s, cp, w).
 */
case class If97Region3Props(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("p_pa", DoubleType),
    StructField("h", DoubleType),
    StructField("u", DoubleType),
    StructField("s", DoubleType),
    StructField("cp", DoubleType),
    StructField("w", DoubleType)))
  override def prettyName: String = "if97_region3_props"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, rho: Any): Any =
    If97.propsByDensity(t.asInstanceOf[Double], rho.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) =>
      s"${ev.value} = graft.operators.If97.propsByDensity($t, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): If97Region3Props =
    copy(left = newLeft, right = newRight)
}

/**
 * Two-phase saturated property bundle: (p [Pa], quality x) ->
 * struct(tsat_k, v, h, u, s, hf, hg) — one static call, same codegen
 * shape as [[If97WaterProps]].
 */
case class If97SaturatedProps(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = If97.satPropsSchema
  override def prettyName: String = "if97_saturated_props"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(p: Any, x: Any): Any =
    If97.saturatedProps(p.asInstanceOf[Double], x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, x) =>
      s"${ev.value} = graft.operators.If97.saturatedProps($p, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): If97SaturatedProps =
    copy(left = newLeft, right = newRight)
}
