package graft

import java.nio.file.Files

import graft.sources.{IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._

/**
 * Position-delete WRITE + merge-on-read compaction: deletes commit as
 * spec-v2 delete files (content=1 manifests), the repo's own reader
 * applies them sequence-aware, stacked deletes compose, partition
 * pruning still loads the (unpartitioned-tuple) delete manifests, and
 * optimize purges deletes for compacted files while carrying the delete
 * manifests kept files still need.
 */
class IcebergDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iceberg_del").toString + "/t"

  private def dataParquets(root: String): Set[String] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(root, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  test("position delete: no data file rewritten, reader drops the rows") {
    val root = tmp()
    IcebergSource.write((0 until 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "m").repartition(4), root)
    val before = dataParquets(root)

    val res = IcebergSource.delete(spark, root, "m = 3")
    assert(res.deletedRows == 100 && res.snapshotId.nonEmpty, s"$res")
    // data files untouched; only NEW delete parquet files appeared
    assert(before.subsetOf(dataParquets(root)), "delete rewrote data files")
    assert((dataParquets(root) -- before).nonEmpty, "no delete file written")

    val got = IcebergSource.read(spark, root)
    assert(got.count() == 900)
    assert(got.filter("m = 3").count() == 0)
    // time travel to the pre-delete snapshot still sees everything
    val first = IcebergSource.snapshots(spark, root).head
    assert(IcebergSource.read(spark, root,
      snapshotId = Some(first.snapshotId)).count() == 1000)
  }

  test("stacked deletes compose; re-delete is a no-op") {
    val root = tmp()
    IcebergSource.write((0 until 500).map(i => (i.toLong, i % 5)).toDF("id", "m"), root)
    assert(IcebergSource.delete(spark, root, "m = 0").deletedRows == 100)
    assert(IcebergSource.delete(spark, root, "m = 1").deletedRows == 100)
    // rows already position-deleted must not match again
    val again = IcebergSource.delete(spark, root, "m <= 1")
    assert(again.deletedRows == 0 && again.snapshotId.isEmpty, s"$again")
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 300 && got.filter("m <= 1").count() == 0)
  }

  test("deletes against a partitioned spec; pruning keeps them applied") {
    val root = tmp()
    val df = (0 until 600).map(i => (i.toLong, 100.0 + i, s"P${i % 3}"))
      .toDF("id", "price", "status")
    IcebergSource.write(df.coalesce(2), root, partitionBy = Seq("status"))
    val res = IcebergSource.delete(spark, root, "status = 'P1' AND price > 400")
    val gone = df.filter("status = 'P1' AND price > 400").count()
    assert(res.deletedRows == gone)
    assert(IcebergSource.read(spark, root).count() == 600 - gone)
    // a partition-pruned read of the DELETED partition must still apply
    // the delete files (their manifest carries no partition summaries)
    val pruned = IcebergSource.read(spark, root, partitionFilter =
      Seq(IcebergSource.PartitionPredicate("status", "=", "P1")))
    assert(pruned.count() == 200 - gone, "pruned read skipped the deletes")
    // appends after a delete stay correct (delete seq < new data seq)
    IcebergSource.write(Seq((9999L, 450.0, "P1")).toDF("id", "price", "status"),
      root, "append", partitionBy = Seq("status"))
    val after = IcebergSource.read(spark, root)
    assert(after.filter("id = 9999").count() == 1,
      "older position delete wrongly bound to a newer data file")
    assert(after.count() == 600 - gone + 1)
  }

  test("partitionFilter prunes the delete's position scan") {
    val root = tmp()
    val df = (0 until 300).map(i => (i.toLong, 100.0 + i, s"P${i % 3}"))
      .toDF("id", "price", "status")
    IcebergSource.write(df.coalesce(1), root, partitionBy = Seq("status"))
    // predicate alone matches every partition; the filter scopes the
    // scan to P1, so other partitions' rows survive untouched
    val res = IcebergSource.delete(spark, root, "price > 200",
      partitionFilter = Seq(IcebergSource.PartitionPredicate("status", "=", "P1")))
    val expected = df.filter("status = 'P1' AND price > 200").count()
    assert(res.deletedRows == expected, s"$res")
    val got = IcebergSource.read(spark, root)
    assert(got.filter("status = 'P1' AND price > 200").count() == 0)
    assert(got.filter("status <> 'P1' AND price > 200").count() ==
      df.filter("status <> 'P1' AND price > 200").count())
  }

  test("merge-on-read optimize: purges compacted deletes, keeps the rest") {
    val root = tmp()
    // 3 small appends -> 3 files, then delete across them
    for (i <- 0 until 3)
      IcebergSource.write((0 until 200).map(j => ((i * 200 + j).toLong, j % 4))
        .toDF("id", "m").coalesce(1), root, if (i == 0) "overwrite" else "append")
    IcebergSource.delete(spark, root, "m = 2")
    assert(IcebergSource.read(spark, root).count() == 450)

    val res = IcebergMaintenance.optimize(spark, root)
    assert(res.snapshotId.nonEmpty && res.filesRemoved == 3 && res.filesAdded == 1,
      s"MOR optimize: $res")
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 450, "optimize resurrected position-deleted rows")
    assert(got.filter("m = 2").count() == 0)
    // the replace snapshot skips the change feed like any compaction
    assert(IcebergSource.snapshots(spark, root).last.operation == "replace")
    // deletes after compaction still work
    IcebergSource.delete(spark, root, "m = 3")
    assert(IcebergSource.read(spark, root).count() == 300)
  }

  test("delete planning scan: predicate pushes into the parquet scan") {
    // the position scan is the whole distributed cost of a DELETE — the
    // predicate must reach the parquet reader as a pushed filter so row
    // groups skip, exactly like any other scan
    val root = tmp()
    IcebergSource.write((0 until 10000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v").coalesce(2), root)
    val dataF = dataParquets(root).toSeq
    val readSchema = IcebergSource.read(spark, root).schema
    val planner = spark.read.schema(readSchema).parquet(dataF: _*)
      .withColumn("_gf_pos", col("_metadata.row_index"))
      .filter(expr("v = 3"))
      .select("_gf_pos")
    val a = graft.core.PlanAudit.audit(planner)
    assert(a.pushedFilters.exists(_.contains("v")),
      s"delete predicate not pushed: ${a.pushedFilters}")
    assert(a.numCartesianProducts == 0)
  }

  test("expire keeps live delete files, drops retired ones") {
    val root = tmp()
    IcebergSource.write((0 until 300).map(i => (i.toLong, i % 3)).toDF("id", "m"), root)
    IcebergSource.delete(spark, root, "m = 0")
    val exp = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(exp.expiredSnapshots.size == 1)
    // the delete files survive (current snapshot references them)
    assert(IcebergSource.read(spark, root).count() == 200)
    assert(IcebergSource.read(spark, root).filter("m = 0").count() == 0)
  }
}
