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

  test("MOR base snapshot drains file-by-file under the cap, deletes applied") {
    val root = tmp()
    IcebergSource.write((0L until 60L).map(i => (i, i % 2)).toDF("k", "m")
      .repartition(6), root)
    IcebergSource.delete(spark, root, "m = 1")
    val name = mem()
    val q = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "2").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, Long)].collect()
      assert(got.length == 30 && got.forall(_._2 == 0L),
        s"expected the 30 surviving rows, got ${got.length}")
      assert(got.map(_._1).toSet == (0L until 60L by 2).toSet)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "a 6-file MOR snapshot under a 2-file cap should take >=3 batches")
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

  test("file-level offsets: one bulk snapshot drains in capped batches, restart-safe") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    // ONE snapshot holding 12 files — snapshot-granularity offsets would
    // drain it as a single micro-batch regardless of the cap
    IcebergSource.write((0 until 120).toDF("k").repartition(12), root)
    // first run: exactly one capped micro-batch, then stop MID-snapshot
    val q1 = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "2").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val partial = spark.read.parquet(out).count()
    assert(partial > 0 && partial < 120,
      s"expected a mid-snapshot stop, got $partial of 120 rows")
    // restart resumes from the file index and drains the rest, capped
    val q2 = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "5").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try {
      q2.processAllAvailable()
      assert(q2.recentProgress.count(_.numInputRows > 0) >= 2,
        "5-files-per-trigger over the remaining 10 files should take >=2 batches")
    } finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 120, "mid-snapshot restart duplicated or dropped rows")
    assert(got.as[Int].collect().toSet == (0 until 120).toSet)
    // appends after the drain still tail in
    IcebergSource.write(Seq(999).toDF("k"), root)
    val q3 = spark.readStream.format("graft-iceberg")
      .option("maxBytesPerTrigger", "1") // below any file: one file/batch
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(out).count() == 121)
  }

  test("uncommitted batch-0 replay after the table advances loses nothing") {
    import graft.sources.IcebergStreamSource
    def batchRows(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.logical
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.count()
    val root = tmp()
    IcebergSource.write((0 until 20).toDF("k").repartition(4), root)
    val metaDir = tmp()
    val s1 = new IcebergStreamSource(spark, root, Map.empty, metaDir)
    val end = s1.getOffset.get // logged to the WAL, then the engine dies
    IcebergSource.write((100 until 105).toDF("k"), root) // lands while down
    // restart replays the batch against the PERSISTED base snapshot
    val s2 = new IcebergStreamSource(spark, root, Map.empty, metaDir)
    assert(batchRows(s2.getBatch(None, end)) == 20,
      "replayed batch 0 must pin the original base snapshot")
    val end2 = s2.getOffset.get
    assert(batchRows(s2.getBatch(Some(end), end2)) == 5)
  }

  test("schemaTrackingLocation: additive evolution resumes after restart") {
    val root = tmp(); val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 1)
      // the table widens while the stream is RUNNING: the run must fail
      // (its declared schema is fixed), recording the change for restart
      IcebergSource.write(Seq((2L, "b", 1.5)).toDF("k", "v", "w"), root,
        schemaPolicy = graft.sources.DeltaSchema.Evolve)
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("restart the stream to continue"), msg)
    // more data while down; the restart serves the WIDENED schema and
    // drains the backlog with null-filled history
    IcebergSource.write(Seq((3L, "c", 2.5)).toDF("k", "v", "w"), root)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.columns.sorted.toSeq == Seq("k", "v", "w"))
    val rows = got.select("k", "v", "w").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(1.5)),
      (3L, "c", Some(2.5))), rows.toString)
  }

  test("a torn position file recovers from the offset WAL, exactly once") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    IcebergSource.write((0L until 12L).toDF("k").repartition(3), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "1").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 12)
    // a crash mid-write under a non-atomic publish leaves a torn JSON; a
    // capped restart treating it as FRESH would re-cap from the base and
    // replay delivered files -- the cursor must come back from the WAL
    val pos = new java.io.File(new java.io.File(cp, "sources/0"),
      "graft-iceberg-position")
    assert(pos.exists, s"position file missing at $pos")
    java.nio.file.Files.write(pos.toPath, "{\"snapshotId\":".getBytes("UTF-8"))
    IcebergSource.write((12L until 15L).toDF("k"), root)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 15, "torn position file duplicated or dropped rows")
    assert(got.as[Long].collect().toSet == (0L until 15L).toSet)
    // a DELETED position file (crash between delete and rename on an
    // HDFS-contract store) recovers the same way
    assert(pos.delete())
    IcebergSource.write((15L until 18L).toDF("k"), root)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val all = spark.read.parquet(out)
    assert(all.count() == 18, "absent position file broke exactly-once")
    assert(all.as[Long].collect().toSet == (0L until 18L).toSet)
  }

  test("CDF: a bulk snapshot drains as file-level changelog batches across restart") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    IcebergSource.write(Seq((0L, "seed")).toDF("k", "v"), root)        // snap 1
    IcebergSource.write((1L to 30L).map(i => (i, s"r$i")).toDF("k", "v")
      .repartition(6), root, mode = "append")                          // snap 2: 6 files
    def reader() = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "2").load(root)
    // one capped batch: stops MID-snapshot (2 of 7 base files) -- the
    // shape that used to land the whole changelog snapshot as one batch
    val q1 = reader().writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val partial = spark.read.parquet(out).count()
    assert(partial > 0 && partial < 31, s"expected a mid-batch stop, got $partial")
    // a DELETE lands while down -- in changelog mode deletes are DATA
    IcebergSource.delete(spark, root, "k = 5")                         // snap 3
    val q2 = reader().writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try {
      q2.processAllAvailable()
      assert(q2.recentProgress.count(_.numInputRows > 0) >= 2,
        "the 2-file cap should split the remaining backlog into >=2 batches")
    } finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 32, "file-level changelog restart duplicated or dropped rows")
    assert(got.filter(col("_change_type") === "insert").count() == 31)
    assert(got.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSeq == Seq(5L))
  }

  test("rename mid-stream tracks by field id and the stream resumes") {
    val root = tmp(); val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 1)
      IcebergMaintenance.renameColumn(spark, root, "v", "label")
      IcebergSource.write(Seq((2L, "b")).toDF("k", "label"), root,
        mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("restart the stream to continue"), msg)
    assert(msg.contains("field id"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.count() == 2, "rename restart duplicated or dropped rows")
    assert(got.filter(col("label") === "b").select("k").as[Long]
      .collect().toSeq == Seq(2L))
    // a FRESH stream over the table serves the renamed schema, with the
    // pre-rename file resolving through the historical alias
    val name = mem()
    val q3 = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q3.processAllAvailable()
      val t = spark.table(name)
      assert(t.columns.toSeq == Seq("k", "label"), t.columns.mkString(","))
      assert(t.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
        "pre-rename file did not resolve by its historical alias")
    } finally q3.stop()
  }

  test("a fully-drained cursor survives its snapshot expiring while down") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root)
    def start() = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // while the stream is DOWN: two commits land and retention expires
    // the drained cursor's snapshot — but its SUCCESSOR is retained, so
    // the parent pointer proves nothing delivered is re-read and nothing
    // pending is skipped
    IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root)
    IcebergSource.write(Seq((4L, "d")).toDF("k", "v"), root)
    IcebergMaintenance.expireSnapshots(spark, root, keepLast = 2)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).as[(Long, String)].collect()
    assert(got.length == 4, s"replayed or dropped rows: ${got.toSeq}")
    assert(got.toSet == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("a drained cursor whose SUCCESSOR also expired still fails loudly") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    def start() = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root)
    IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root)
    // keepLast=1 drops the cursor's snapshot AND its successor: the gap
    // commit's rows are unreachable — resuming would silently skip them
    IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    val q2 = start()
    val e = try intercept[StreamingQueryException] { q2.processAllAvailable() }
    finally q2.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("expired"), msg)
  }

  test("CDF: a drained cursor survives its snapshot expiring while down") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root)
    IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root)
    IcebergMaintenance.expireSnapshots(spark, root, keepLast = 2)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "changelog replayed or dropped items")
    assert(got.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
