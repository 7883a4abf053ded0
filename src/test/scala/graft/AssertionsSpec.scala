package graft

import graft.testing.Assertions

class AssertionsSpec extends SparkSpec {

  import spark.implicits._

  test("assertFrameEqual: set-semantic, duplicates count, readable failures") {
    val a = Seq((1, "x"), (2, "y"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (1, "x"), (2, "y")).toDF("k", "v")
    Assertions.assertFrameEqual(a, b) // order differs: fine

    val missingDup = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val e1 = intercept[AssertionError] {
      Assertions.assertFrameEqual(a, missingDup)
    }
    assert(e1.getMessage.contains("row counts differ"))

    val different = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val e2 = intercept[AssertionError] {
      Assertions.assertFrameEqual(a, different)
    }
    assert(e2.getMessage.contains("only in"))
  }

  test("assertFrameEqual: tolerance is an absolute difference bound") {
    val a = Seq((1, 0.1234567)).toDF("k", "v")
    val b = Seq((1, 0.1234569)).toDF("k", "v")
    intercept[AssertionError] { Assertions.assertFrameEqual(a, b) }
    Assertions.assertFrameEqual(a, b, tolerance = 1e-6)

    // within tolerance but straddling a decimal-rounding boundary — the
    // case digit-rounding spuriously failed
    val s1 = Seq((1, 1.4999995e-6)).toDF("k", "v")
    val s2 = Seq((1, 1.5000005e-6)).toDF("k", "v")
    Assertions.assertFrameEqual(s1, s2, tolerance = 1e-6)

    // ~2x tolerance apart on the same side of a boundary — the case
    // digit-rounding spuriously passed
    val f1 = Seq((1, 0.12340021)).toDF("k", "v")
    val f2 = Seq((1, 0.12340209)).toDF("k", "v")
    val e = intercept[AssertionError] {
      Assertions.assertFrameEqual(f1, f2, tolerance = 1e-6)
    }
    assert(e.getMessage.contains("tolerance"))

    // duplicates under the same key pair up in float-sorted order
    val d1 = Seq((1, 1.0), (1, 2.0)).toDF("k", "v")
    val d2 = Seq((1, 2.0000001), (1, 1.0000001)).toDF("k", "v")
    Assertions.assertFrameEqual(d1, d2, tolerance = 1e-6)
    intercept[AssertionError] {
      Assertions.assertFrameEqual(d1, d2, tolerance = 1e-9)
    }

    // NULL vs value must FAIL under tolerance (a NULL predicate would
    // otherwise be dropped by filter and silently pass)
    val n1 = Seq((1, Some(1.0))).toDF("k", "v")
    val n2 = Seq((1, Option.empty[Double])).toDF("k", "v")
    intercept[AssertionError] {
      Assertions.assertFrameEqual(n1, n2, tolerance = 1e-6)
    }
    // both-NULL still matches
    Assertions.assertFrameEqual(n2, n2, tolerance = 1e-6)

    // tolerance + checkOrder: ordered compare uses the same abs bound
    Assertions.assertFrameEqual(
      Seq((1, 1.0), (2, 2.0)).toDF("k", "v").orderBy("k").coalesce(1),
      Seq((1, 1.0000001), (2, 2.0000001)).toDF("k", "v").orderBy("k").coalesce(1),
      checkOrder = true, tolerance = 1e-6)
  }

  test("assertFrameEqual checkOrder catches order mismatch after sort") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v").orderBy("k")
    val b = Seq((2, "y"), (1, "x")).toDF("k", "v")
    val e = intercept[AssertionError] {
      Assertions.assertFrameEqual(a, b.coalesce(1), checkOrder = true)
    }
    assert(e.getMessage.contains("order"))
    Assertions.assertFrameEqual(a, b.orderBy("k").coalesce(1), checkOrder = true)
  }

  test("assertSchemaEqual ignores nullability, catches type drift") {
    val a = Seq((1, "x")).toDF("k", "v")
    Assertions.assertSchemaEqual(a, a.filter($"k" > 0))
    val e = intercept[AssertionError] {
      Assertions.assertSchemaEqual(a, Seq((1L, "x")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("assertRowCount and assertHasColumns") {
    val a = Seq((1, "x")).toDF("k", "v")
    Assertions.assertRowCount(a, 1)
    intercept[AssertionError] { Assertions.assertRowCount(a, 2) }
    Assertions.assertHasColumns(a, Seq("k"))
    val e = intercept[AssertionError] { Assertions.assertHasColumns(a, Seq("nope")) }
    assert(e.getMessage.contains("nope"))
  }
}
