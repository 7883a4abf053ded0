package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val ts1 = lit("2026-01-01 00:00:00").cast("timestamp")
  private val ts2 = lit("2026-02-01 00:00:00").cast("timestamp")

  test("scd2 bootstrap marks all rows current") {
    val src = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "name", "bal")
    val out = Scd.scd2Bootstrap(src, ts1)
    assert(out.count() == 2)
    assert(out.filter($"is_current").count() == 2)
    assert(out.filter($"valid_to".isNull).count() == 2)
  }

  test("scd2 apply closes changed rows and inserts new versions") {
    val t0 = Scd.scd2Bootstrap(Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "name", "bal"), ts1)
    // id=1 changes bal, id=2 unchanged, id=3 is new
    val src = Seq((1, "a", 99.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "name", "bal")
    val out = Scd.scd2Apply(t0, src, Seq("id"), Seq("name", "bal"), ts2).cache()

    assert(out.count() == 4) // closed v1 of id1, open v2 of id1, id2, id3
    val id1 = out.filter($"id" === 1).orderBy($"valid_from")
    val rows = id1.collect()
    assert(rows.length == 2)
    assert(!rows(0).getAs[Boolean]("is_current") && rows(0).getAs[Double]("bal") == 10.0)
    assert(rows(1).getAs[Boolean]("is_current") && rows(1).getAs[Double]("bal") == 99.0)
    assert(rows(0).getAs[java.sql.Timestamp]("valid_to") != null)
    // unchanged row untouched
    val id2 = out.filter($"id" === 2).collect()
    assert(id2.length == 1 && id2(0).getAs[Boolean]("is_current"))
    // new key inserted current
    val id3 = out.filter($"id" === 3).collect()
    assert(id3.length == 1 && id3(0).getAs[Boolean]("is_current"))
  }

  test("scd2 change detection is null-safe") {
    val t0 = Scd.scd2Bootstrap(Seq((1, Option.empty[String])).toDF("id", "name"), ts1)
    // null -> null is NOT a change
    val same = Scd.scd2Apply(t0, Seq((1, Option.empty[String])).toDF("id", "name"),
      Seq("id"), Seq("name"), ts2)
    assert(same.count() == 1)
    // null -> value IS a change
    val changed = Scd.scd2Apply(t0, Seq((1, Option("x"))).toDF("id", "name"),
      Seq("id"), Seq("name"), ts2)
    assert(changed.count() == 2)
  }

  test("scd2 key NULL on both sides is one matched row, not duplicated") {
    // <=> matches null keys, so classification must use presence markers:
    // with isNull-based tests this row landed in BOTH keptOpen and opened.
    val t0 = Scd.scd2Bootstrap(Seq((Option.empty[Int], "a")).toDF("id", "name"), ts1)
    val same = Scd.scd2Apply(t0, Seq((Option.empty[Int], "a")).toDF("id", "name"),
      Seq("id"), Seq("name"), ts2)
    assert(same.count() == 1)
    assert(same.collect()(0).getAs[Boolean]("is_current"))
    val changed = Scd.scd2Apply(t0, Seq((Option.empty[Int], "b")).toDF("id", "name"),
      Seq("id"), Seq("name"), ts2)
    assert(changed.count() == 2)
    assert(changed.filter($"is_current").count() == 1)
  }

  test("scd2 closeDeleted closes keys absent from source") {
    val t0 = Scd.scd2Bootstrap(Seq((1, "a"), (2, "b")).toDF("id", "name"), ts1)
    val out = Scd.scd2Apply(t0, Seq((1, "a")).toDF("id", "name"),
      Seq("id"), Seq("name"), ts2, closeDeleted = true)
    val id2 = out.filter($"id" === 2).collect()
    assert(id2.length == 1 && !id2(0).getAs[Boolean]("is_current"))
  }
}
