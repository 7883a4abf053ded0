package graft

import graft.sources.{IcebergMaintenance, IcebergSource, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import java.nio.file.Files

/**
 * Iceberg table as a streaming SOURCE (graft-iceberg): MOR-correct
 * initial snapshot + per-snapshot tailed appends, exactly-once across
 * restarts, compaction skipped, delete/overwrite contract enforcement.
 */
class IcebergStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("istream").toString

  private var n = 0
  private def mem(): String = { n += 1; s"iss_$n" }

  test("initial snapshot then tailed appends, each exactly once") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root)
    val name = mem()
    val q = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      IcebergSource.write(Seq((4L, "d")).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("initial snapshot is MOR-correct: deleted rows never stream") {
    val root = tmp()
    IcebergSource.write((0L until 20L).map(i => (i, i % 2)).toDF("k", "m"), root)
    IcebergSource.delete(spark, root, "m = 1")
    val name = mem()
    val q = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, Long)].collect()
      assert(got.length == 10 && got.forall(_._2 == 0L))
    } finally q.stop()
  }

  test("compaction (replace) is skipped; a delete fails without ignoreDeletes") {
    val root = tmp()
    (0 until 3).foreach(i =>
      IcebergSource.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    val name = mem()
    val q = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 3)
      // compaction rewrites everything but streams NOTHING new
      val res = IcebergMaintenance.optimize(spark, root, targetFileBytes = 1L << 20)
      assert(res.filesAdded >= 1, s"$res")
      q.processAllAvailable()
      assert(spark.table(name).count() == 3, "replace snapshot leaked rows")
      // but a delete snapshot fails the stream
      IcebergSource.delete(spark, root, "k = 0")
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("ignoreDeletes") ||
        e.getCause.getMessage.contains("ignoreDeletes"))
    } finally q.stop()

    // with ignoreDeletes the delete snapshot is skipped and appends resume
    val name2 = mem()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("ignoreDeletes", "true").load(root)
      .writeStream.format("memory").queryName(name2)
      .option("checkpointLocation", tmp()).start()
    try {
      q2.processAllAvailable()
      IcebergSource.write(Seq((9L, "z")).toDF("k", "v"), root)
      q2.processAllAvailable()
      assert(spark.table(name2).filter("k = 9").count() == 1)
    } finally q2.stop()
  }

  test("exactly-once across restart with maxFilesPerTrigger") {
    val root = tmp()
    val out = tmp()
    val cp = tmp()
    (0 until 4).foreach(i =>
      IcebergSource.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    val q1 = spark.readStream.format("graft-iceberg")
      .option("startingSnapshotId", "latest").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q1.processAllAvailable() finally q1.stop()
    // data lands while the stream is DOWN (two snapshots), restart with a
    // 1-snapshot-per-trigger cap must emit exactly the new rows
    IcebergSource.write(Seq((100L, "x")).toDF("k", "v"), root)
    IcebergSource.write(Seq((101L, "y")).toDF("k", "v"), root)
    val q2 = spark.readStream.format("graft-iceberg")
      .option("startingSnapshotId", "latest")
      .option("maxFilesPerTrigger", "1").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 2, "restart duplicated or dropped snapshots")
    assert(got.select("k").as[Long].collect().toSet == Set(100L, 101L))
  }

  test("startingSnapshotId tails from that snapshot inclusive") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root)
    val second = IcebergSource.tableMeta(spark, root).currentSnapshotId.get
    val name = mem()
    val q = spark.readStream.format("graft-iceberg")
      .option("startingSnapshotId", second.toString).load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, String)].collect().toSet == Set((2L, "b")))
    } finally q.stop()
  }

  test("readChangeFeed: snapshot as inserts, then per-snapshot changes") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    val name = mem()
    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val snap = spark.table(name).collect()
      assert(snap.length == 2)
      assert(snap.forall(_.getAs[String]("_change_type") == "insert"))
      // an append tails in as inserts; an overwrite as delete+insert rows
      IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(spark.table(name).filter("k = 3 and _change_type = 'insert'")
        .count() == 1)
      IcebergSource.write(Seq((9L, "z")).toDF("k", "v"), root, mode = "overwrite")
      q.processAllAvailable()
      val rows = spark.table(name).select("k", "_change_type")
        .as[(Long, String)].collect().toSet
      assert(rows.contains((9L, "insert")), rows.toString)
      assert(rows.contains((1L, "delete")) && rows.contains((3L, "delete")),
        rows.toString)
    } finally q.stop()
  }

  test("declarative surface: ReadConfig(streaming=true, iceberg) streams") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "x")).toDF("k", "v"), root)
    val df = Sources.read(spark,
      Sources.ReadConfig("iceberg", path = Some(root), streaming = true))
    assert(df.isStreaming)
    val name = mem()
    val q = df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 1)
    } finally q.stop()
  }
}
