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

  test("assertFrameEqual: numeric tolerance rounds before comparing") {
    val a = Seq((1, 0.1234567)).toDF("k", "v")
    val b = Seq((1, 0.1234569)).toDF("k", "v")
    intercept[AssertionError] { Assertions.assertFrameEqual(a, b) }
    Assertions.assertFrameEqual(a, b, tolerance = 1e-6)
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
