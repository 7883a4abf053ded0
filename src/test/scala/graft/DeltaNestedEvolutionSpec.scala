package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, DeltaWriter}
import org.apache.spark.sql.functions._

/**
 * Nested (struct-member) schema evolution on column-mapped Delta
 * tables: metadata-only RENAME and DROP addressed by dot path. Every
 * nested field carries its own mapping id + physical name
 * ([[graft.sources.DeltaSchema.createMapped]]), so the rename never
 * touches a data file and reads of every generation resolve the member
 * through its unchanged nested PHYSICAL name.
 */
class DeltaNestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("deltanested").toString

  private def docFrame(ids: Range) =
    ids.map(i => (i.toLong, s"t$i", i * 1.5, s"u$i"))
      .toDF("id", "title", "score", "author")
      .select(col("id"),
        struct(col("title"), struct(col("score"), col("author")).as("meta"))
          .as("info"))

  test("columnMapping=true creates a fully mapped table (nested ids too)") {
    val root = tmp() + "/t"
    DeltaWriter.write(docFrame(1 to 10), root, columnMapping = true)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.configuration("delta.columnMapping.mode") == "name")
    assert(snap.minReaderVersion == 2 && snap.minWriterVersion == 5)
    val meta = snap.schema("info").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("meta")
    assert(meta.metadata.contains("delta.columnMapping.physicalName"))
    val score = meta.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("score")
    assert(score.metadata.contains("delta.columnMapping.id"))
    // data round-trips through the physical-name files
    val got = DeltaLog.read(spark, root)
    assert(got.select(sum("info.meta.score")).first().getDouble(0) ==
      (1 to 10).map(_ * 1.5).sum)
  }

  test("nested rename is metadata-only and reads span both file generations") {
    val root = tmp() + "/t"
    DeltaWriter.write(docFrame(1 to 50), root, columnMapping = true)
    val c = DeltaWriter.renameColumn(spark, root, "info.meta.score", "rank")
    assert(c.version == 1L)
    // post-rename generation appends under the NEW member name
    DeltaWriter.write(
      docFrame(51 to 100).withColumn("info",
        col("info").withField("meta",
          struct(col("info.meta.score").as("rank"), col("info.meta.author")))),
      root, mode = "append")
    val df = DeltaLog.read(spark, root)
    val got = df.select(col("id"), col("info.meta.rank").as("rank"))
      .orderBy("id").collect()
    assert(got.length == 100)
    assert(got.forall(r => r.getDouble(1) == r.getLong(0) * 1.5))
    assert(df.filter(col("info.meta.rank") > 75.0 * 1.5).count() == 25)
    // time travel to v0 serves the member under its OLD logical name
    val v0 = DeltaLog.read(spark, root, versionAsOf = Some(0L))
    assert(v0.select(sum("info.meta.score")).first().getDouble(0) ==
      (1 to 50).map(_ * 1.5).sum)
  }

  test("nested drop is metadata-only; time travel keeps the member") {
    val root = tmp() + "/t"
    DeltaWriter.write(docFrame(1 to 30), root, columnMapping = true)
    DeltaWriter.dropColumn(spark, root, "info.meta.author")
    // post-drop appends carry only the narrowed struct
    DeltaWriter.write(
      docFrame(31 to 60).withColumn("info",
        col("info").withField("meta", struct(col("info.meta.score")))),
      root, mode = "append")
    val df = DeltaLog.read(spark, root)
    assert(df.schema("info").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("score"))
    assert(df.count() == 60)
    assert(df.select(sum("info.meta.score")).first().getDouble(0) ==
      (1 to 60).map(_ * 1.5).sum)
    // the bytes were never touched: v0 still serves the dropped member
    val v0 = DeltaLog.read(spark, root, versionAsOf = Some(0L))
    assert(v0.select("info.meta.author").distinct().count() == 30)
  }

  test("guards: sibling collision, moved leaf, missing path, last member") {
    val root = tmp() + "/t"
    DeltaWriter.write(docFrame(1 to 5), root, columnMapping = true)
    val e1 = intercept[IllegalArgumentException](
      DeltaWriter.renameColumn(spark, root, "info.meta.score", "author"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      DeltaWriter.renameColumn(spark, root, "info.meta.score", "meta.s"))
    assert(e2.getMessage.contains("leaf name"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      DeltaWriter.renameColumn(spark, root, "info.nope", "x"))
    assert(e3.getMessage.contains("no column"), e3.getMessage)
    DeltaWriter.dropColumn(spark, root, "info.meta.author")
    val e4 = intercept[IllegalArgumentException](
      DeltaWriter.dropColumn(spark, root, "info.meta.score"))
    assert(e4.getMessage.contains("last member"), e4.getMessage)
    // dropping the narrowed struct itself is fine
    DeltaWriter.dropColumn(spark, root, "info.meta")
    assert(DeltaLog.read(spark, root).select("info.*").columns.toSeq ==
      Seq("title"))
  }

  test("columnMapping=true is never silently ignored on an existing table") {
    val root = tmp() + "/t"
    DeltaWriter.write(Seq((1L, "a")).toDF("k", "v"), root) // unmapped
    val e = intercept[IllegalArgumentException](
      DeltaWriter.write(Seq((2L, "b")).toDF("k", "v"), root,
        mode = "append", columnMapping = true))
    assert(e.getMessage.contains("UNMAPPED"), e.getMessage)
    // a FULL overwrite upgrades: files rewrite under physical names and
    // the protocol bumps in the same commit
    DeltaWriter.write(Seq((3L, "c")).toDF("k", "v"), root,
      mode = "overwrite", columnMapping = true)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.configuration("delta.columnMapping.mode") == "name")
    assert(snap.minReaderVersion == 2 && snap.minWriterVersion == 5,
      s"${snap.minReaderVersion}/${snap.minWriterVersion}")
    assert(DeltaLog.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((3L, "c")))
    // the upgraded table now supports metadata-only rename
    DeltaWriter.renameColumn(spark, root, "v", "label")
    assert(DeltaLog.read(spark, root).columns.toSeq == Seq("k", "label"))
  }

  test("nested rename mid-stream tracks by mapping id and the stream resumes") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    DeltaWriter.write(docFrame(1 to 5), root, columnMapping = true)
    def start() = spark.readStream.format("graft-delta")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 5)
      DeltaWriter.renameColumn(spark, root, "info.meta.score", "rank")
      DeltaWriter.write(
        docFrame(6 to 10).withColumn("info",
          col("info").withField("meta",
            struct(col("info.meta.score").as("rank"),
              col("info.meta.author")))),
        root, mode = "append")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("restart the stream to continue"), msg)
    assert(msg.contains("column-mapping id"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.option("mergeSchema", "true").parquet(out).count() == 10,
      "nested-rename restart duplicated or dropped rows")
    // a FRESH stream serves ALL files under the current schema — the
    // member resolves through its unchanged nested physical name
    val name = s"dnested_ren_${System.nanoTime()}"
    val q3 = spark.readStream.format("graft-delta").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q3.processAllAvailable()
      val got = spark.table(name)
        .select(col("id"), col("info.meta.rank").as("rank")).orderBy("id")
        .collect()
      assert(got.length == 10, s"expected 10 rows, got ${got.length}")
      assert(got.forall(r => r.getDouble(1) == r.getLong(0) * 1.5))
    } finally q3.stop()
  }
}
