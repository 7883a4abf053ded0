package graft

import org.apache.spark.sql.functions._
import graft.operators.{DeleteDetection, Merge}

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "name", "v")

  test("upsert replaces matched and inserts new") {
    val src = Seq((2, "b2", 99), (3, "c", 30)).toDF("id", "name", "v")
    val out = Merge.upsert(target, src, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(out(1).getString(1) == "b2" && out(1).getInt(2) == 99)
    assert(out(2).getString(1) == "c")
  }

  test("upsert honors update_condition") {
    val src = Seq((1, "a2", 5), (2, "b2", 99)).toDF("id", "name", "v")
    // only update when source v is larger than target v
    val out = Merge.upsert(target, src, Seq("id"),
      updateCondition = Some("source.v > target.v")).orderBy("id").collect()
    assert(out(0).getString(1) == "a")  // 5 < 10: kept
    assert(out(1).getString(1) == "b2") // 99 > 20: replaced
  }

  test("appendOnly inserts only unseen keys") {
    val src = Seq((2, "DUP", 0), (3, "c", 30)).toDF("id", "name", "v")
    val out = Merge.appendOnly(target, src, Seq("id")).orderBy("id").collect()
    assert(out.length == 3)
    assert(out(1).getString(1) == "b") // existing row untouched
  }

  test("deleteMatch removes matched keys") {
    val src = Seq((1, "x", 0)).toDF("id", "name", "v")
    val out = Merge.deleteMatch(target, src, Seq("id")).collect()
    assert(out.length == 1 && out(0).getInt(0) == 2)
  }

  test("delete detection snapshot_diff + soft apply + threshold guard") {
    val prev = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name")
    val cur = Seq((1, "a")).toDF("id", "name")
    val deleted = DeleteDetection.detectSnapshotDiff(prev, cur, Seq("id"))
    assert(deleted.as[Int].collect().sorted.toSeq == Seq(2, 3))

    val soft = DeleteDetection.applySoft(prev, deleted, Seq("id"),
      deletedAt = lit("2026-01-01").cast("timestamp"))
    assert(soft.filter($"_is_deleted").count() == 2)
    assert(soft.filter(!$"_is_deleted" && $"_deleted_at".isNull).count() == 1)

    val hard = DeleteDetection.applyHard(prev, deleted, Seq("id"))
    assert(hard.count() == 1)

    intercept[DeleteDetection.DeleteThresholdExceeded] {
      DeleteDetection.applyHard(prev, deleted, Seq("id"), maxDeleteFraction = Some(0.5))
    }
  }
}
