package graft

import java.nio.file.Files

import graft.sources.{DeltaWriter, IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

/**
 * Opt-in recovery for streams wedged at a column-DROP commit
 * (`allowColumnDrop` + `schemaTrackingLocation`): the drop records the
 * narrowed schema, the restart drains the remaining commits exactly
 * once under it. The DEFAULT stays a loud permanent failure — silently
 * truncating a consumer's output is quiet corruption.
 */
class StreamDropRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("dropstream").toString

  test("iceberg: drop wedges, opt-in restart resumes the narrowed schema exactly once") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "junk"), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track)
      .option("allowColumnDrop", "true").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      IcebergMaintenance.dropColumn(spark, root, "junk")
      IcebergSource.write(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), root,
        mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("column DROP"), msg)
    assert(msg.contains("restart the stream"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.count() == 4, "drop restart duplicated or dropped rows")
    assert(got.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // the post-restart batches carry the NARROWED schema
    assert(got.filter(col("k") >= 3L).select("v").as[String]
      .collect().toSet == Set("c", "d"))
    // a FRESH stream over the dropped table serves the narrowed schema
    // for ALL generations
    val name = s"idrop_${System.nanoTime()}"
    val q3 = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q3.processAllAvailable()
      val t = spark.table(name)
      assert(t.columns.toSeq == Seq("k", "v"), t.columns.mkString(","))
      assert(t.count() == 4)
    } finally q3.stop()
  }

  test("iceberg: a NESTED member drop recovers through the same opt-in") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "junk")
        .select(col("k"), struct(col("v"), col("junk")).as("info")), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track)
      .option("allowColumnDrop", "true").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      IcebergMaintenance.dropColumn(spark, root, "info.junk")
      IcebergSource.write(
        Seq((3L, "c")).toDF("k", "v")
          .select(col("k"), struct(col("v")).as("info")),
        root, mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("column DROP"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.option("mergeSchema", "true").parquet(out).count() == 3,
      "nested-drop restart duplicated or dropped rows")
  }

  test("iceberg: without the opt-in a drop stays a loud permanent failure") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(Seq((1L, "a", 10.0)).toDF("k", "v", "junk"), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      IcebergMaintenance.dropColumn(spark, root, "junk")
      IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root, mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    // the restart wedges at the same commit — by design
    val q2 = start()
    val e2 = try intercept[StreamingQueryException] { q2.processAllAvailable() }
      finally q2.stop()
    val msg = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema tracking cannot resume") ||
      msg.contains("restart the stream"), msg)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("delta: drop wedges, opt-in restart resumes the narrowed schema exactly once") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    DeltaWriter.write(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "junk"), root, columnMapping = true)
    def start() = spark.readStream.format("graft-delta")
      .option("schemaTrackingLocation", track)
      .option("allowColumnDrop", "true").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      DeltaWriter.dropColumn(spark, root, "junk")
      DeltaWriter.write(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), root,
        mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("column DROP"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.count() == 4, "drop restart duplicated or dropped rows")
    assert(got.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(got.filter(col("k") >= 3L).select("v").as[String]
      .collect().toSet == Set("c", "d"))
  }

  test("delta: without the opt-in a drop stays a loud permanent failure") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    DeltaWriter.write(Seq((1L, "a", 10.0)).toDF("k", "v", "junk"), root,
      columnMapping = true)
    def start() = spark.readStream.format("graft-delta")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      DeltaWriter.dropColumn(spark, root, "junk")
      DeltaWriter.write(Seq((2L, "b")).toDF("k", "v"), root, mode = "append")
      intercept[StreamingQueryException] { q1.processAllAvailable() }
    } finally q1.stop()
    val q2 = start()
    val e2 = try intercept[StreamingQueryException] { q2.processAllAvailable() }
      finally q2.stop()
    val msg = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema tracking cannot resume") ||
      msg.contains("restart the stream"), msg)
    assert(spark.read.parquet(out).count() == 1)
  }
}
