package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Domain transformers (reference: odibi/transformers/units.py,
 * thermodynamics.py, manufacturing.py).
 *
 * Design: the reference routes these through pint / CoolProp Python
 * libraries behind pandas UDFs (thermodynamics.py:490). Here everything is
 * plan-time arithmetic — linear unit conversions become `col * factor +
 * offset` (codegen'd, no UDF, as SURVEY §2.6 prescribes), and the
 * psychrometric properties use the published Magnus/ASHRAE closed-form
 * approximations rather than a property-library lookup. Real-fluid
 * equations of state are plan-time Column algebra too: IAPWS-IF97 for
 * water/steam ([[If97]]) and the Peng-Robinson cubic for the registry
 * gases/refrigerants ([[CubicEos]]); everything else fails fast rather
 * than returning a silently-wrong ideal-gas answer.
 */
object Domain {

  // ------------------------------------------------------------------
  // unit_convert (units.py:67-438): factor/offset table, incl. gauge
  // pressure offsets (units.py:182). Conversion = x * factor + offset.
  // ------------------------------------------------------------------

  /** (factor, offset) to convert FROM the key unit TO the SI base unit. */
  private val toSi: Map[String, (Double, Double)] = Map(
    // length -> m
    "m" -> (1.0, 0.0), "km" -> (1000.0, 0.0), "cm" -> (0.01, 0.0),
    "mm" -> (0.001, 0.0), "ft" -> (0.3048, 0.0), "in" -> (0.0254, 0.0),
    "mi" -> (1609.344, 0.0),
    // mass -> kg
    "kg" -> (1.0, 0.0), "g" -> (0.001, 0.0), "lb" -> (0.45359237, 0.0),
    "oz" -> (0.028349523125, 0.0), "t" -> (1000.0, 0.0),
    // temperature -> K
    "K" -> (1.0, 0.0), "C" -> (1.0, 273.15), "F" -> (5.0 / 9.0, 255.3722222222222),
    // pressure -> Pa (gauge units add 1 atm)
    "Pa" -> (1.0, 0.0), "kPa" -> (1000.0, 0.0), "bar" -> (100000.0, 0.0),
    "psi" -> (6894.757293168, 0.0), "atm" -> (101325.0, 0.0),
    "barg" -> (100000.0, 101325.0), "psig" -> (6894.757293168, 101325.0),
    // energy -> J
    "J" -> (1.0, 0.0), "kJ" -> (1000.0, 0.0), "Wh" -> (3600.0, 0.0),
    "kWh" -> (3600000.0, 0.0), "BTU" -> (1055.05585262, 0.0),
    // volume -> m3
    "m3" -> (1.0, 0.0), "L" -> (0.001, 0.0), "gal" -> (0.003785411784, 0.0),
    // time -> s
    "s" -> (1.0, 0.0), "min" -> (60.0, 0.0), "h" -> (3600.0, 0.0), "d" -> (86400.0, 0.0))

  /** Resolve (factor, offset) converting `from` -> `to` at plan time. */
  def conversion(from: String, to: String): (Double, Double) = {
    val (fa, fo) = toSi.getOrElse(from,
      throw new IllegalArgumentException(s"unknown unit: $from"))
    val (ta, to_) = toSi.getOrElse(to,
      throw new IllegalArgumentException(s"unknown unit: $to"))
    // x_to = (x_from * fa + fo - to_) / ta
    (fa / ta, (fo - to_) / ta)
  }

  /** unit_convert: pure linear arithmetic, stays in codegen. */
  def unitConvert(df: DataFrame, column: String, from: String, to: String,
                  outputCol: Option[String] = None): DataFrame = {
    val (factor, offset) = conversion(from, to)
    df.withColumn(outputCol.getOrElse(column),
      col(column) * lit(factor) + lit(offset))
  }

  // ------------------------------------------------------------------
  // psychrometrics / thermodynamics (thermodynamics.py:189-1054) —
  // Magnus-form closed-form approximations (public formulas).
  // ------------------------------------------------------------------

  /** Saturation vapor pressure of water [Pa] from T [°C] (Magnus). */
  def saturationPressure(tempC: Column): Column =
    lit(610.94) * exp(lit(17.625) * tempC / (tempC + lit(243.04)))

  /** Humidity ratio [kg water / kg dry air] from T [°C], RH [0-1], P [Pa]. */
  def humidityRatio(tempC: Column, rh: Column, pressurePa: Column): Column = {
    val pv = rh * saturationPressure(tempC)
    lit(0.621945) * pv / (pressurePa - pv)
  }

  /** Dew point [°C] from T [°C] and RH [0-1] (inverse Magnus). */
  def dewPoint(tempC: Column, rh: Column): Column = {
    val gamma = log(rh) + lit(17.625) * tempC / (tempC + lit(243.04))
    lit(243.04) * gamma / (lit(17.625) - gamma)
  }

  /** Moist-air specific enthalpy [kJ/kg dry air] from T [°C] and W. */
  def moistAirEnthalpy(tempC: Column, w: Column): Column =
    lit(1.006) * tempC + w * (lit(2501.0) + lit(1.86) * tempC)

  /**
   * Wet-bulb temperature [°C] from T [°C] and RH [0-1] — Stull (2011),
   * "Wet-Bulb Temperature from Relative Humidity and Air Temperature",
   * J. Appl. Meteor. Climatol. 50: the published regression replacing a
   * psychrometric iteration (±0.3 °C over RH 5-99%, T -20..50 °C at sea
   * level). Completes the HAPropsSI output set (Twb) the reference
   * exposes through CoolProp (thermodynamics.py:683).
   */
  def wetBulb(tempC: Column, rh: Column): Column = {
    val p = rh * lit(100.0) // the regression takes RH in percent
    tempC * atan(lit(0.151977) * sqrt(p + lit(8.313659))) +
      atan(tempC + p) - atan(p - lit(1.676331)) +
      lit(0.00391838) * p * sqrt(p) * atan(lit(0.023101) * p) -
      lit(4.686035)
  }

  /** Ideal-gas density [kg/m3] from P [Pa], T [K], molar mass [kg/mol]. */
  def fluidDensityIdealGas(pressurePa: Column, tempK: Column,
                           molarMass: Double = 0.0289647): Column =
    pressurePa * lit(molarMass) / (lit(8.314462618) * tempK)

  /** Saturation temperature [°C] from water vapor pressure [Pa]
    * (inverse Magnus — exact inverse of [[saturationPressure]]). */
  def saturationTemperature(pressurePa: Column): Column = {
    val gamma = log(pressurePa / lit(610.94))
    lit(243.04) * gamma / (lit(17.625) - gamma)
  }

  /**
   * saturation_properties (thermodynamics.py:566-660). Two methods:
   *  - `magnus` (default, the historical surface): Magnus psat from
   *    temperature, inverse-Magnus tsat from pressure — an approximation
   *    good to ~0.3% over 0-60 °C.
   *  - `if97`: the IAPWS-IF97 region-4 saturation line ([[If97]]),
   *    exact to the standard's 9 significant figures over the whole
   *    273.15 K - 647.096 K range — the same equation CoolProp evaluates
   *    for Water behind the reference's `saturation_properties`.
   */
  def saturationProperties(df: DataFrame, tempCCol: Option[String],
                           pressureCol: Option[String],
                           prefix: String = "",
                           method: String = "magnus"): DataFrame = {
    val p = if (prefix.isEmpty) "" else s"${prefix}_"
    val if97 = method match {
      case "magnus" => false
      case "if97" => true
      case other => throw new IllegalArgumentException(
        s"saturation_properties method must be magnus or if97, got $other")
    }
    (tempCCol, pressureCol) match {
      case (Some(t), _) =>
        val psat = if (if97) If97.psatColumn(col(t) + lit(273.15))
                   else saturationPressure(col(t))
        df.withColumn(s"${p}psat_pa", psat)
      case (_, Some(pc)) =>
        val tsat = if (if97) If97.tsatColumn(col(pc)) - lit(273.15)
                   else saturationTemperature(col(pc))
        df.withColumn(s"${p}tsat_c", tsat)
      case _ => throw new IllegalArgumentException(
        "saturation_properties needs temp_col or pressure_col")
    }
  }

  /**
   * fluid_properties (thermodynamics.py:189-560). Dispatch by fluid:
   *  - `Water`/`Steam`: the full IAPWS-IF97 industrial formulation
   *    ([[If97]]: regions 1/2/3/5, verified against the standard's own
   *    tables in If97Spec) — density, enthalpy, entropy, cp and speed of
   *    sound in ONE native codegen'd expression per row.
   *  - Any fluid in the [[CubicEos]] registry (Air, N2, O2, CO2, CH4,
   *    NH3, R134a, propane, H2, Ar — the fluids the reference's guides
   *    exercise): the Peng-Robinson EOS as one native expression — real
   *    liquid AND vapor densities, enthalpy/entropy with departure
   *    functions, stable-phase selection by fugacity (CubicEosSpec
   *    verifies saturation pressures and thermodynamic consistency).
   *  - Anything else FAILS FAST — an ideal-gas answer for an unknown
   *    fluid (possibly a liquid) would be silently wrong by orders of
   *    magnitude. Callers who genuinely have a dilute gas outside the
   *    registry opt in with `assumeIdealGas = true` + `molarMass`.
   */
  def fluidProperties(df: DataFrame, pressureCol: String, tempCCol: String,
                      molarMass: Double = 0.0289647,
                      prefix: String = "",
                      fluid: String = "Air",
                      assumeIdealGas: Boolean = false): DataFrame = {
    val p = if (prefix.isEmpty) "" else s"${prefix}_"
    if (fluid.equalsIgnoreCase("water") || fluid.equalsIgnoreCase("steam")) {
      val props = If97.waterProps(col(tempCCol) + lit(273.15), col(pressureCol))
      df.withColumn("_gf_if97", props)
        .withColumn(s"${p}region", col("_gf_if97.region"))
        .withColumn(s"${p}density", lit(1.0) / col("_gf_if97.v"))
        .withColumn(s"${p}enthalpy", col("_gf_if97.h"))
        .withColumn(s"${p}entropy", col("_gf_if97.s"))
        .withColumn(s"${p}cp", col("_gf_if97.cp"))
        .withColumn(s"${p}speed_of_sound", col("_gf_if97.w"))
        .drop("_gf_if97")
    } else if (assumeIdealGas) {
      df.withColumn(s"${p}density",
        fluidDensityIdealGas(col(pressureCol), col(tempCCol) + lit(273.15),
          molarMass))
    } else CubicEos.lookup(fluid) match {
      case Some(f) =>
        val props = CubicEos.props(f, col(tempCCol) + lit(273.15), col(pressureCol))
        df.withColumn("_gf_pr", props)
          .withColumn(s"${p}z", col("_gf_pr.z"))
          .withColumn(s"${p}density", col("_gf_pr.density"))
          .withColumn(s"${p}enthalpy", col("_gf_pr.h"))
          .withColumn(s"${p}entropy", col("_gf_pr.s"))
          .withColumn(s"${p}cp", col("_gf_pr.cp"))
          .withColumn(s"${p}speed_of_sound", col("_gf_pr.w"))
          .withColumn(s"${p}phase", col("_gf_pr.phase"))
          .drop("_gf_pr")
      case None => throw new IllegalArgumentException(
        s"fluid_properties: unsupported fluid '$fluid'. Water/Steam use " +
          s"IAPWS-IF97; ${CubicEos.supported.mkString(", ")} use the " +
          "Peng-Robinson EOS. For a dilute gas outside this list pass " +
          "assume_ideal_gas: true with molar_mass — refusing to return " +
          "ideal-gas values that would be orders of magnitude wrong for " +
          "a liquid.")
    }
  }

  /**
   * steam_properties: the full IF97 property set for water/steam from
   * (T, p) in caller units — region id, specific volume [m3/kg], density
   * [kg/m3], enthalpy [kJ/kg], internal energy [kJ/kg], entropy
   * [kJ/(kg K)], cp [kJ/(kg K)], speed of sound [m/s]. Out-of-range
   * states carry region 0 with null properties rather than failing the
   * job (sensor data contains garbage; flag, don't crash).
   */
  def steamProperties(df: DataFrame, tempCol: String, presCol: String,
                      tempUnit: String = "K", presUnit: String = "Pa",
                      prefix: String = ""): DataFrame = {
    val p = if (prefix.isEmpty) "" else s"${prefix}_"
    val (tf, to) = conversion(tempUnit, "K")
    val (pf, po) = conversion(presUnit, "Pa")
    val tK = col(tempCol) * lit(tf) + lit(to)
    val pPa = col(presCol) * lit(pf) + lit(po)
    df.withColumn("_gf_if97", If97.waterProps(tK, pPa))
      .withColumn(s"${p}region", col("_gf_if97.region"))
      .withColumn(s"${p}v", col("_gf_if97.v"))
      .withColumn(s"${p}density", lit(1.0) / col("_gf_if97.v"))
      .withColumn(s"${p}h", col("_gf_if97.h"))
      .withColumn(s"${p}u", col("_gf_if97.u"))
      .withColumn(s"${p}s", col("_gf_if97.s"))
      .withColumn(s"${p}cp", col("_gf_if97.cp"))
      .withColumn(s"${p}w", col("_gf_if97.w"))
      .drop("_gf_if97")
  }

  /**
   * saturated_steam: the reference's fixed-quality steam surface
   * (docs/guides/thermodynamics.md "Saturated Steam (using fixed
   * quality)": `fluid: Water, quality: 1.0` → hg + saturation temp).
   * From pressure (caller units) and a quality — constant or per-row
   * column — the IF97 two-phase bundle: tsat [°C], v, h, u, s plus the
   * hf/hg endpoints. Out-of-range pressures yield nulls (sensor garbage
   * flags, never crashes), matching steam_properties.
   */
  def saturatedSteam(df: DataFrame, presCol: String, presUnit: String = "Pa",
                     quality: Double = 1.0, qualityCol: Option[String] = None,
                     prefix: String = ""): DataFrame = {
    val p = if (prefix.isEmpty) "" else s"${prefix}_"
    val (pf, po) = conversion(presUnit, "Pa")
    val pPa = col(presCol) * lit(pf) + lit(po)
    val x = qualityCol.map(col).getOrElse(lit(quality))
    df.withColumn("_gf_sat", If97.saturatedPropsColumn(pPa, x))
      .withColumn(s"${p}tsat_c", col("_gf_sat.tsat_k") - lit(273.15))
      .withColumn(s"${p}v", col("_gf_sat.v"))
      .withColumn(s"${p}h", col("_gf_sat.h"))
      .withColumn(s"${p}u", col("_gf_sat.u"))
      .withColumn(s"${p}s", col("_gf_sat.s"))
      .withColumn(s"${p}hf", col("_gf_sat.hf"))
      .withColumn(s"${p}hg", col("_gf_sat.hg"))
      .drop("_gf_sat")
  }

  /** Append the standard psychrometric columns (thermodynamics.py surface);
    * `wetBulbCol = true` adds Stull's wet-bulb temperature. */
  def psychrometrics(df: DataFrame, tempCCol: String, rhCol: String,
                     pressurePa: Double = 101325.0,
                     wetBulbCol: Boolean = false): DataFrame = {
    val base = df.withColumn("p_sat", saturationPressure(col(tempCCol)))
      .withColumn("humidity_ratio",
        humidityRatio(col(tempCCol), col(rhCol), lit(pressurePa)))
      .withColumn("dew_point", dewPoint(col(tempCCol), col(rhCol)))
      .withColumn("enthalpy",
        moistAirEnthalpy(col(tempCCol), col("humidity_ratio")))
    if (wetBulbCol)
      base.withColumn("wet_bulb", wetBulb(col(tempCCol), col(rhCol)))
    else base
  }

  // ------------------------------------------------------------------
  // detect_sequential_phases (manufacturing.py:23-1350): status-change
  // boundary detection per batch via lag + conditional cumsum — the
  // window/aggregation rebuild of the reference's row-wise pandas loop.
  // ------------------------------------------------------------------

  /**
   * Assign a phase id per group: a new phase starts whenever `statusCol`
   * differs from the previous row (ordered by `orderBy`).
   */
  def detectPhases(df: DataFrame, groupCol: String, statusCol: String,
                   orderBy: Seq[Column], phaseCol: String = "phase_id"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
    val changed = when(
      lag(col(statusCol), 1).over(w).isNull ||
        !(col(statusCol) <=> lag(col(statusCol), 1).over(w)), 1).otherwise(0)
    df.withColumn("_chg", changed)
      .withColumn(phaseCol,
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("_chg")
  }

  /**
   * Per-phase summary: duration (max-min of `tsCol`), row count, plus
   * caller metrics (SQL agg exprs) — the reference's phase_metrics /
   * status_mapping time-in-state rollup.
   */
  def phaseSummary(df: DataFrame, groupCol: String, statusCol: String,
                   tsCol: String, orderBy: Seq[Column],
                   metrics: Seq[(String, String)] = Nil): DataFrame = {
    val phased = detectPhases(df, groupCol, statusCol, orderBy)
    val base = Seq(
      count(lit(1)).as("n_rows"),
      (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
        .cast("long").as("duration_s"))
    val extra = metrics.map { case (name, e) => expr(e).as(name) }
    phased.groupBy(col(groupCol), col("phase_id"), col(statusCol))
      .agg((base ++ extra).head, (base ++ extra).tail: _*)
  }
}
