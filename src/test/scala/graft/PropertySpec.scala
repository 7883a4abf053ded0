package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.semantics.Semantics
import graft.operators.Domain

/**
 * Property-based checks (scalacheck) for the pure plan-time layers:
 * the semantic query parser/SQL generator, the unit-conversion algebra,
 * and the Magnus saturation forms. Spark-evaluated properties batch all
 * generated cases into one action.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  test("semantic parser: metrics/dims/where survive arbitrary spacing and keyword case") {
    val sp = Gen.oneOf(" ", "  ", "\t")
    val byKw = Gen.oneOf("BY", "by", "By", "bY")
    val whereKw = Gen.oneOf("WHERE", "where", "Where")
    val p = Prop.forAll(
      Gen.nonEmptyListOf(ident).map(_.distinct.take(4)).suchThat(_.nonEmpty),
      Gen.listOf(ident).map(_.distinct.take(3)),
      Gen.option(ident), sp, byKw, whereKw) { (ms, ds, w, s, by, whr) =>
      val q = new StringBuilder(ms.mkString(s", $s"))
      if (ds.nonEmpty) q.append(s"$s$by$s").append(ds.mkString(", "))
      w.foreach(c => q.append(s"$s$whr$s$c > 0"))
      val pq = Semantics.parse(q.toString)
      pq.metrics == ms && pq.dimensions == ds &&
        pq.where == w.map(c => s"$c > 0")
    }
    check(p)
  }

  test("derived-metric substitution: calls and qualified refs never rewritten") {
    val p = Prop.forAll(ident, ident) { (n1, n2) =>
      (n1 != n2) ==> {
        val model = Semantics.SemanticModel(
          metrics = Map(
            n1 -> Semantics.Metric(n1, "sum(x)", "t"),
            n2 -> Semantics.Metric(n2, "count(y)", "t"),
            "d" -> Semantics.Metric("d", "", "t",
              formula = Some(s"$n1 + $n2 + $n1($n2) + t.$n1"))),
          dimensions = Map.empty)
        val sql = Semantics.generateSql(model, Semantics.ParsedQuery(Seq("d"), Nil, None))
        // bare refs substituted (parenthesized), call + qualified preserved
        sql.contains("(sum(x))") && sql.contains("(count(y))") &&
          sql.contains(s"$n1((count(y)))") && sql.contains(s"t.$n1") &&
          sql.endsWith("AS d FROM t")
      }
    }
    check(p, n = 100)
  }

  test("unit conversion: a -> b -> a is the identity for every unit pair") {
    val units = Seq(
      Seq("m", "km", "cm", "mm", "ft", "in", "mi"),
      Seq("kg", "g", "lb", "oz", "t"),
      Seq("K", "C", "F"),
      Seq("Pa", "kPa", "bar", "psi", "atm", "barg", "psig"),
      Seq("J", "kJ", "Wh", "kWh", "BTU"),
      Seq("m3", "L", "gal"),
      Seq("s", "min", "h", "d"))
    for (family <- units; a <- family; b <- family) {
      val (f1, o1) = Domain.conversion(a, b)
      val (f2, o2) = Domain.conversion(b, a)
      val x = 123.456
      val back = (x * f1 + o1) * f2 + o2
      assert(math.abs(back - x) < 1e-6, s"$a -> $b -> $a drifted: $back")
    }
  }

  test("Magnus saturation: tsat(psat(t)) == t over the meteorological range") {
    // all generated cases in ONE Spark action
    val temps = Gen.listOfN(64, Gen.choose(-40.0, 60.0)).sample.get
    val df = temps.toDF("t_c")
    val rt = Domain.saturationProperties(
      Domain.saturationProperties(df, Some("t_c"), None),
      None, Some("psat_pa"), "rt")
    val maxErr = rt.selectExpr("max(abs(rt_tsat_c - t_c))").collect()(0).getDouble(0)
    assert(maxErr < 1e-9, s"roundtrip error $maxErr")
  }
}
