package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file stream read -> parquet sink with available-now trigger") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v")
      .write.mode("overwrite").parquet(s"$dir/in")

    val stream = Streaming.readStream(spark, "parquet", Some(s"$dir/in"),
      schemaDdl = Some("id BIGINT, k STRING, v DOUBLE"))
    assert(stream.isStreaming)
    val q = Streaming.writeStream(stream, Some(s"$dir/out"),
      Streaming.StreamWriteConfig(checkpointLocation = Some(s"$dir/cp"),
        trigger = Some(Streaming.trigger("available_now"))))
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("iceberg sink recovery scans newest-first; steady state reads no metadata") {
    import graft.sources.IcebergSource
    val root = java.nio.file.Files.createTempDirectory("graft_ice_tr").toString + "/t"
    val mk = Seq((1L, "a")).toDF("id", "v")
    // three stream batches, then three FOREIGN appends without markers —
    // a long-lived table where the marker is not on the newest snapshot
    (0 to 2).foreach(b => IcebergSource.write(mk, root,
      summaryProps = Map("graft-stream-x" -> b.toString)))
    (0 until 3).foreach(_ => IcebergSource.write(mk, root))
    assert(IcebergSource.snapshots(spark, root).size == 6)

    val tr = new Streaming.IcebergBatchTracker("graft-stream-x")
    // recovery: newest-first, stops at the FIRST marker hit — 3 foreign
    // snapshots + the marker-bearing one, never the whole history
    assert(tr.committed(spark, root) == 2L)
    assert(tr.lastRecoveryScanned == 4,
      s"recovery scanned ${tr.lastRecoveryScanned} snapshots, expected 4")
    // steady state: the cache answers, zero further metadata reads
    tr.record(3L)
    (0 until 5).foreach(_ => assert(tr.committed(spark, root) == 3L))
    assert(tr.lastRecoveryScanned == 4, "steady-state batch re-read metadata")
  }

  test("iceberg streaming sink: exactly-once batch markers in snapshot summaries") {
    import graft.sources.IcebergSource
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ice").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/in")
    def drain(): Unit = {
      val stream = Streaming.readStream(spark, "parquet", Some(s"$dir/in"),
        schemaDdl = Some("id BIGINT, v STRING"))
      val q = Streaming.writeStream(stream, Some(s"$dir/out"),
        Streaming.StreamWriteConfig(format = "iceberg",
          checkpointLocation = Some(s"$dir/cp"),
          trigger = Some(Streaming.trigger("available_now"))))
      q.awaitTermination(60000)
    }
    drain()
    assert(IcebergSource.read(spark, s"$dir/out").count() == 2)
    // batch marker recorded in the snapshot summary
    val snaps1 = IcebergSource.snapshots(spark, s"$dir/out")
    assert(snaps1.exists(_.summary.exists(_._1.startsWith("graft-stream-"))))

    // second run over the same checkpoint: only NEW files process, the
    // marker SURVIVES the later append's snapshot re-serialization
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(s"$dir/in")
    drain()
    assert(IcebergSource.read(spark, s"$dir/out").count() == 3)
    val snaps2 = IcebergSource.snapshots(spark, s"$dir/out")
    assert(snaps2.count(_.summary.exists(_._1.startsWith("graft-stream-"))) == 2)
    // a replayed batch id is a no-op: simulate by re-invoking the batch
    // writer with an already-recorded id through the same code path
    val marker = snaps2.flatMap(_.summary.keys)
      .find(_.startsWith("graft-stream-")).get
    val maxBatch = snaps2.flatMap(_.summary.get(marker)).map(_.toLong).max
    // wipe the checkpoint and drain again: the stream replays from batch
    // 0, but every batch id is <= the recorded marker, so nothing lands
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(s"$dir/cp"))
    drain()
    assert(IcebergSource.read(spark, s"$dir/out").count() == 3,
      "checkpoint-replayed batches duplicated rows")
    assert(maxBatch >= 0)
  }

  test("foreachBatch streaming merge upserts into target snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    // seed target with id=1 (old) and id=9 (untouched)
    Seq((1L, "old"), (9L, "keep")).toDF("id", "v").write.parquet(s"$dir/target")

    val input = MemoryStream[(Long, String)](spark)
    input.addData((1L, "new"), (2L, "ins"))
    val q = Streaming.writeStreamMerge(input.toDF().toDF("id", "v"),
      s"$dir/target", s"$dir/cp", Seq("id"), graft.operators.Merge.upsert(_, _, _))
    q.processAllAvailable()
    // second micro-batch merges into the target produced by the first
    input.addData((2L, "upd"), (3L, "ins3"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/target").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "new", 2L -> "upd", 3L -> "ins3", 9L -> "keep"))
    // the swap leaves no temp/old debris next to the target
    val debris = new java.io.File(dir).list().filter(_.contains("_graft_"))
    assert(debris.isEmpty, s"leftover swap dirs: ${debris.mkString(",")}")
  }

  test("trigger mapping covers all four reference kinds") {
    import org.apache.spark.sql.streaming.Trigger
    assert(Streaming.trigger("processing_time", "5 seconds") ==
      Trigger.ProcessingTime("5 seconds"))
    assert(Streaming.trigger("available_now") == Trigger.AvailableNow())
    assert(Streaming.trigger("once") == Trigger.AvailableNow())
    assert(Streaming.trigger("continuous", "1 second") == Trigger.Continuous("1 second"))
    intercept[IllegalArgumentException] { Streaming.trigger("nope") }
  }

  test("watermarked tumbling window aggregation (extension)") {
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val df = input.toDF().toDF("ts", "k", "v")
    val agg = Streaming.windowedAgg(df, "ts", "10 minutes", "5 minutes",
      groupBy = Seq("k"), aggs = Seq("total" -> "sum(v)", "n" -> "count(*)"))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2026-01-01 00:01:00"), "a", 1.0),
      (t("2026-01-01 00:02:00"), "a", 2.0),
      (t("2026-01-01 00:07:00"), "a", 5.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, window.start, total, n FROM win_agg ORDER BY 2").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(2) == 3.0 && rows(0).getLong(3) == 2L)
    assert(rows(1).getDouble(2) == 5.0)
    q.stop()
  }

  test("session window aggregation (extension)") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val agg = Streaming.sessionWindowAgg(input.toDF().toDF("ts", "u"),
      "ts", "10 minutes", "5 minutes", Seq("u"), Seq("n" -> "count(*)"))
    val q = agg.writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // two events 2 min apart (one session), then a 20-min gap (new session)
    input.addData((t("2026-01-01 00:00:00"), "u1"), (t("2026-01-01 00:02:00"), "u1"),
      (t("2026-01-01 00:22:00"), "u1"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT n FROM sess_agg ORDER BY 1").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    q.stop()
  }

  test("streaming dedup within watermark drops repeated keys across batches") {
    val input = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val deduped = Streaming.dedupWithinWatermark(
      input.toDF().toDF("ts", "id", "v"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2026-01-01 00:00:00"), 1L, "a"),
      (t("2026-01-01 00:00:30"), 1L, "dup-in-batch"),
      (t("2026-01-01 00:01:00"), 2L, "b"))
    q.processAllAvailable()
    // same key again in a later micro-batch, still inside the watermark
    input.addData((t("2026-01-01 00:02:00"), 1L, "dup-across-batch"),
      (t("2026-01-01 00:03:00"), 3L, "c"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT id FROM stream_dedup ORDER BY 1").collect()
      .map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")

    // batch frames fall back to plain dropDuplicates
    val batch = Seq((t("2026-01-01 00:00:00"), 1L, "a"),
      (t("2026-01-01 00:01:00"), 1L, "b")).toDF("ts", "id", "v")
    assert(Streaming.dedupWithinWatermark(batch, Seq("id"), "ts", "10 minutes")
      .count() == 1)
  }

  test("a watermark on a DIFFERENT column does not satisfy a windowed agg") {
    val input = MemoryStream[(java.sql.Timestamp, java.sql.Timestamp, Long)](spark)
    val frame = input.toDF().toDF("ingest_ts", "event_ts", "id")
    // dedup watermarks ingest_ts; the aggregation needs one on event_ts —
    // the guard must still set it (same-column reuse only)
    val chained = Streaming.windowedAgg(
      Streaming.dedupWithinWatermark(frame, Seq("id"), "ingest_ts", "10 minutes"),
      "event_ts", "10 minutes", "1 minute", aggs = Seq("n" -> "count(*)"))
    val plan = chained.queryExecution.analyzed
    val watermarked = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        w.eventTime.name
    }
    assert(watermarked.contains("event_ts") && watermarked.contains("ingest_ts"))
  }
}
