package graft

import graft.sources.{IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Iceberg per-column manifest bounds + read-side file skipping: every
 * data file the writer commits carries null_value_counts / lower_bounds /
 * upper_bounds keyed by table field id, the reader prunes data files a
 * predicate provably cannot match, and maintenance rewrites carry the
 * stats forward (compaction must not lose skipping).
 */
class IcebergSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iskip").toString

  test("range-clustered table: range predicate skips files, result exact") {
    val root = tmp()
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    IcebergSource.write(df.repartitionByRange(8, $"k"), root)
    val pr = IcebergSource.pruneReport(spark, root, col("k") >= 900L)
    assert(pr.candidates == 8 && pr.kept <= 2, s"$pr")
    val got = IcebergSource.read(spark, root, dataFilter = Some(col("k") >= 900L))
    assert(got.count() == 100)
    assert(got.agg(min("k")).head.getLong(0) == 900L)
    // point lookup: one file; impossible range: zero
    assert(IcebergSource.pruneReport(spark, root, col("k") === 37L).kept == 1)
    assert(IcebergSource.pruneReport(spark, root, col("k") < -1L).kept == 0)
    assert(IcebergSource.read(spark, root,
      dataFilter = Some(col("k") < -1L)).count() == 0)
    // strings bound too
    assert(IcebergSource.pruneReport(spark, root,
      col("v") === "nope").kept < 8)
  }

  test("soundness: opaque predicates keep all files, answers stay exact") {
    val root = tmp()
    IcebergSource.write((0 until 200).map(i => (i.toLong, i % 5))
      .toDF("k", "m").repartitionByRange(4, $"k"), root)
    assert(IcebergSource.pruneReport(spark, root, expr("k % 2 = 0")).kept == 4)
    assert(IcebergSource.read(spark, root,
      dataFilter = Some(expr("k % 2 = 0"))).count() == 100)
  }

  test("nulls: all-null files prune comparisons; IsNull prunes value files") {
    val root = tmp()
    val df = (0 until 100).map(i => (i.toLong, if (i < 50) Some(s"x$i") else None))
      .toDF("k", "s").repartitionByRange(2, $"k")
    IcebergSource.write(df, root)
    assert(IcebergSource.pruneReport(spark, root, col("s") === "x7").kept == 1)
    assert(IcebergSource.pruneReport(spark, root, col("s").isNull).kept == 1)
    assert(IcebergSource.read(spark, root,
      dataFilter = Some(col("s") === "x7")).count() == 1)
  }

  test("MOR compaction carries bounds: skipping survives optimize") {
    val root = tmp()
    // several small range-clustered appends, then position-delete + compact
    (0 until 4).foreach { i =>
      IcebergSource.write((i * 100 until (i + 1) * 100)
        .map(j => (j.toLong, j % 10)).toDF("k", "m").coalesce(1), root)
    }
    IcebergSource.delete(spark, root, "m = 3")
    val res = IcebergMaintenance.optimize(spark, root, targetFileBytes = 1L << 20)
    assert(res.filesAdded >= 1, s"$res")
    val pr = IcebergSource.pruneReport(spark, root, col("k") >= 350L)
    assert(pr.kept < pr.candidates || pr.candidates == 1,
      s"compacted table lost its bounds: $pr")
    val got = IcebergSource.read(spark, root, dataFilter = Some(col("k") >= 350L))
    assert(got.count() == 50 - 5) // 350..399 minus m=3 hits
  }

  test("kept EXISTING entries re-emit original bounds through compaction") {
    val root = tmp()
    // one big file ABOVE the pack target (stays EXISTING) + several
    // compactable one-row files
    IcebergSource.write((0 until 5000).map(i => (i.toLong, "big"))
      .toDF("k", "tag").coalesce(1), root)
    (0 until 3).foreach { i =>
      IcebergSource.write(Seq((10000L + i, "small")).toDF("k", "tag"), root)
    }
    val res = IcebergMaintenance.optimize(spark, root, targetFileBytes = 4096)
    assert(res.filesRemoved >= 2, s"$res")
    // the untouched big file must still prune on its original bounds
    val pr = IcebergSource.pruneReport(spark, root, col("k") >= 10000L)
    assert(pr.kept < pr.candidates, s"EXISTING entry lost bounds: $pr")
    assert(IcebergSource.read(spark, root,
      dataFilter = Some(col("k") >= 10000L)).count() == 3)
  }

  test("equality deletes + skipping compose") {
    val root = tmp()
    IcebergSource.write((0 until 300).map(i => (i.toLong, s"u$i"))
      .toDF("id", "u").repartitionByRange(3, $"id"), root)
    IcebergSource.deleteKeys(spark, root,
      (0 until 300 by 10).map(i => Tuple1(i.toLong)).toDF("id"), Seq("id"))
    val got = IcebergSource.read(spark, root, dataFilter = Some(col("id") >= 200L))
    assert(got.count() == 100 - 10) // 200..299 minus the %10 keys
    assert(IcebergSource.pruneReport(spark, root, col("id") >= 200L).kept == 1)
  }

  test("partitioned table: bounds on the identity column still prune") {
    val root = tmp()
    val df = (0 until 300).map(i => (i.toLong, s"d${i % 3}")).toDF("k", "day")
    IcebergSource.write(df, root, partitionBy = Seq("day"))
    val pr = IcebergSource.pruneReport(spark, root, col("day") === "d1")
    assert(pr.kept < pr.candidates && pr.kept >= 1, s"$pr")
    assert(IcebergSource.read(spark, root,
      dataFilter = Some(col("day") === "d1")).count() == 100)
  }
}
