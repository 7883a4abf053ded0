package graft

import java.nio.file.Files

import graft.sources.{IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._

/**
 * Nested (struct-member) schema evolution on the native Iceberg tables:
 * metadata-only RENAME and DROP addressed by dot path, with reads that
 * stay coherent across pre/post-evolution file generations via
 * member-level alias coalescing ([[IcebergSource.nestedAliases]]).
 */
class IcebergNestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("icenested").toString

  private def docFrame(ids: Range) =
    ids.map(i => (i.toLong, s"t$i", i * 1.5, s"u$i"))
      .toDF("id", "title", "score", "author")
      .select(col("id"),
        struct(col("title"), struct(col("score"), col("author")).as("meta"))
          .as("info"))

  test("nested rename reads coherently across pre/post-rename file generations") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 100), root)
    val v = IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
    assert(v >= 1L)
    // post-rename generation appends under the NEW member name
    IcebergSource.write(
      docFrame(101 to 200).withColumn("info",
        col("info").withField("meta",
          struct(col("info.meta.score").as("rank"), col("info.meta.author")))),
      root, mode = "append")
    val df = IcebergSource.read(spark, root)
    assert(df.schema("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("meta")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("rank", "author"))
    // both generations serve the member under the new name, values intact
    val got = df.select(col("id"), col("info.meta.rank").as("rank"))
      .orderBy("id").collect()
    assert(got.length == 200)
    assert(got.forall(r => r.getDouble(1) == r.getLong(0) * 1.5))
    // filtering on the renamed member hits both generations
    assert(df.filter(col("info.meta.rank") > 150.0 * 1.5).count() == 50)
    // untouched members unaffected
    assert(df.select("info.meta.author").distinct().count() == 200)
  }

  test("renaming a mid-level STRUCT member coalesces the whole substruct") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 50), root)
    IcebergMaintenance.renameColumn(spark, root, "info.meta", "details")
    IcebergSource.write(
      docFrame(51 to 100).withColumn("info",
        struct(col("info.title"), col("info.meta").as("details"))),
      root, mode = "append")
    val df = IcebergSource.read(spark, root)
    val got = df.select(col("id"), col("info.details.score").as("s"))
      .orderBy("id").collect()
    assert(got.length == 100)
    assert(got.forall(r => r.getDouble(1) == r.getLong(0) * 1.5))
  }

  test("nested drop stops serving the member; both generations read") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 60), root)
    IcebergMaintenance.dropColumn(spark, root, "info.meta.author")
    // post-drop appends carry only the narrowed struct
    IcebergSource.write(
      docFrame(61 to 120).withColumn("info",
        col("info").withField("meta", struct(col("info.meta.score")))),
      root, mode = "append")
    val df = IcebergSource.read(spark, root)
    assert(df.schema("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("meta")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("score"))
    assert(df.count() == 120)
    assert(df.select(sum("info.meta.score")).first().getDouble(0) ==
      (1 to 120).map(_ * 1.5).sum)
  }

  test("rename guards: sibling collision, moved leaf, foreign former name") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 10), root)
    val e1 = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "author"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "meta.s"))
    assert(e2.getMessage.contains("leaf name"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info.nope", "x"))
    assert(e3.getMessage.contains("no column"), e3.getMessage)
    // a dropped member's name must not be reclaimed by a DIFFERENT field
    IcebergMaintenance.dropColumn(spark, root, "info.meta.author")
    val e4 = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "author"))
    assert(e4.getMessage.contains("previously the name"), e4.getMessage)
  }

  test("renaming both a struct and one of its members is refused until compacted") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 10), root)
    IcebergMaintenance.renameColumn(spark, root, "info.meta", "details")
    val e = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info.details.score", "rank"))
    assert(e.getMessage.contains("ancestor"), e.getMessage)
  }

  test("renaming a struct AFTER member evolution is refused (would brick reads)") {
    // member renamed first: renaming the parent struct later would trip
    // the alias type guard on EVERY subsequent scan — schemas history,
    // not files, carries the conflict, so nothing could repair it
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 10), root)
    IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
    val e = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root, "info", "data"))
    assert(e.getMessage.contains("member evolution"), e.getMessage)
    // member DROPPED first: same refusal (the type JSON differs across
    // retained schemas), and the table stays fully readable
    val root2 = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 10), root2)
    IcebergMaintenance.dropColumn(spark, root2, "info.meta.author")
    val e2 = intercept[IllegalArgumentException](
      IcebergMaintenance.renameColumn(spark, root2, "info", "data"))
    assert(e2.getMessage.contains("member evolution"), e2.getMessage)
    assert(IcebergSource.read(spark, root2).count() == 10)
    assert(IcebergSource.read(spark, root).count() == 10)
  }

  test("drop guards: last member of a struct, missing path") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 10), root)
    IcebergMaintenance.dropColumn(spark, root, "info.meta.author")
    val e = intercept[IllegalArgumentException](
      IcebergMaintenance.dropColumn(spark, root, "info.meta.score"))
    assert(e.getMessage.contains("last member"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergMaintenance.dropColumn(spark, root, "info.meta.nope"))
    assert(e2.getMessage.contains("no column"), e2.getMessage)
    // dropping the narrowed struct itself is fine
    IcebergMaintenance.dropColumn(spark, root, "info.meta")
    val df = IcebergSource.read(spark, root)
    assert(df.select("info.*").columns.toSeq == Seq("title"))
  }

  test("optimize compacts old-name files to the current schema; plain reads after") {
    val root = tmp() + "/t"
    // several tiny files so the bin-pack has work
    IcebergSource.write(docFrame(1 to 100).repartition(4), root, "append")
    IcebergSource.write(docFrame(101 to 200).repartition(4), root, "append")
    IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
    val r = IcebergMaintenance.optimize(spark, root)
    assert(r.snapshotId.isDefined && r.filesRemoved > 0, r.toString)
    // the compacted files carry the CURRENT member name: a raw scan under
    // the current schema (no aliasing) already serves every value
    val df = IcebergSource.read(spark, root)
    assert(df.count() == 200)
    assert(df.select(sum("info.meta.rank")).first().getDouble(0) ==
      (1 to 200).map(_ * 1.5).sum)
    val raw = spark.read.schema(df.schema).parquet(df.inputFiles: _*)
    assert(raw.select(sum("info.meta.rank")).first().getDouble(0) ==
      (1 to 200).map(_ * 1.5).sum)
  }

  test("post-rename files keep parquet pushdown; optimize restores it for all") {
    val root = tmp() + "/t"
    val flat = (ids: Range) => ids.map(i => (i.toLong, i * 1.5)).toDF("id", "acct")
    IcebergSource.write(flat(1 to 100).repartition(2), root)
    IcebergMaintenance.renameColumn(spark, root, "acct", "balance")
    IcebergSource.write(
      flat(101 to 200).withColumnRenamed("acct", "balance").repartition(2),
      root, mode = "append")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val filtered = IcebergSource.read(spark, root,
      dataFilter = Some(col("balance") > 50 * 1.5))
    assert(filtered.count() == 150)
    val p1 = planOf(filtered)
    // generation split: the POST-rename files scan plain, so their leg
    // pushes the renamed-column predicate into parquet row groups; the
    // pre-rename leg pays the (pushdown-opaque) alias coalesce
    assert(p1.contains("Union"), p1.takeRight(800))
    assert(p1.contains("GreaterThan(balance"),
      "renamed-column predicate not pushed on the post-rename generation:\n" +
        p1.takeRight(800))
    // compaction rewrites every file under the CURRENT schema-id: the
    // union and the coalesce disappear — one plain scan, full pushdown
    val r = IcebergMaintenance.optimize(spark, root)
    assert(r.snapshotId.isDefined && r.filesRemoved > 0, r.toString)
    val after = IcebergSource.read(spark, root,
      dataFilter = Some(col("balance") > 50 * 1.5))
    assert(after.count() == 150)
    val p2 = planOf(after)
    assert(!p2.contains("Union"), p2.takeRight(800))
    assert(p2.contains("GreaterThan(balance"), p2.takeRight(800))
    assert(!p2.contains("coalesce("), p2.takeRight(800))
  }

  test("a nested rename splits generations too; results agree across the union") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 100).repartition(2), root)
    IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
    IcebergSource.write(
      docFrame(101 to 200).withColumn("info",
        col("info").withField("meta",
          struct(col("info.meta.score").as("rank"), col("info.meta.author"))))
        .repartition(2),
      root, mode = "append")
    val df = IcebergSource.read(spark, root)
    assert(df.queryExecution.executedPlan.toString.contains("Union"))
    assert(df.select(sum("info.meta.rank")).first().getDouble(0) ==
      (1 to 200).map(_ * 1.5).sum)
  }

  test("nested rename mid-stream tracks by field id and the stream resumes") {
    val root = tmp() + "/t"; val cp = tmp(); val track = tmp(); val out = tmp()
    IcebergSource.write(docFrame(1 to 5), root)
    def start() = spark.readStream.format("graft-iceberg")
      .option("schemaTrackingLocation", track).load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    val e = try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 5)
      IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
      IcebergSource.write(
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
    assert(msg.contains("field id"), msg)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // both generations drained exactly once (batch 0 landed under the
    // old member name — a sink concern; the source never re-served it)
    assert(spark.read.option("mergeSchema", "true").parquet(out).count() == 10,
      "nested-rename restart duplicated or dropped rows")
    // a FRESH stream serves ALL files under the current schema, the
    // pre-rename generation resolving through the nested alias
    val name = s"nested_ren_${System.nanoTime()}"
    val q3 = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q3.processAllAvailable()
      val got = spark.table(name)
        .select(col("id"), col("info.meta.rank").as("rank")).orderBy("id")
        .collect()
      assert(got.length == 10, s"expected 10 rows, got ${got.length}")
      assert(got.forall(r => r.getDouble(1) == r.getLong(0) * 1.5),
        "pre-rename files did not resolve the member through the alias")
    } finally q3.stop()
  }

  test("time travel to a pre-rename snapshot alias-resolves to the current name") {
    val root = tmp() + "/t"
    IcebergSource.write(docFrame(1 to 20), root)
    val firstSnap = IcebergSource.snapshots(spark, root).head.snapshotId
    IcebergMaintenance.renameColumn(spark, root, "info.meta.score", "rank")
    IcebergSource.write(
      docFrame(21 to 40).withColumn("info",
        col("info").withField("meta",
          struct(col("info.meta.score").as("rank"), col("info.meta.author")))),
      root, mode = "append")
    val old = IcebergSource.read(spark, root, snapshotId = Some(firstSnap))
    assert(old.count() == 20)
    assert(old.select(sum("info.meta.rank")).first().getDouble(0) ==
      (1 to 20).map(_ * 1.5).sum)
  }
}
