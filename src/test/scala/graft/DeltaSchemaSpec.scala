package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, DeltaMerge, DeltaSchema, DeltaWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Merge/append schema evolution (the reference's autoMerge +
 * SchemaMode/OnNewColumns/OnMissingColumns semantics): a source that
 * gains a column widens the table schema IN THE SAME COMMIT as the data;
 * old files are untouched and read the new column as null; missing
 * source columns null-fill per policy; column-mapped tables assign fresh
 * mapping ids and bump maxColumnId.
 */
class DeltaSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("delta_schema").toString + "/t"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def commitText(root: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", f"$v%020d.json")), "UTF-8")

  test("upsert with a NEW source column widens the schema in the same commit") {
    val root = tmp()
    DeltaWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), root)
    val before = DeltaLog.snapshot(spark, root)

    val src = Seq((10L, "UPD", 1.5), (200L, "NEW", 2.5)).toDF("id", "v", "score")
    // enforce (default) refuses the new column? No — enforce DROPS extra
    // source columns (the pre-evolution projection); it must not widen
    val r0 = DeltaMerge.upsert(spark, root, src, Seq("id"), cdf = false)
    assert(DeltaLog.snapshot(spark, root).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(r0.rowsAppended == 2)

    // evolve: ONE commit carries the widened metaData + the merged rows
    val r = DeltaMerge.upsert(spark, root,
      src.withColumn("v", concat(col("v"), lit("2"))), Seq("id"),
      schemaPolicy = DeltaSchema.Evolve)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.version == r.version, "evolution took more than one commit")
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(snap.schema("score").nullable)
    val txt = commitText(root, r.version)
    assert(txt.contains(""""metaData""""), "widened metaData not in the merge commit")

    val got = DeltaLog.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "v", "score"))
    // untouched old rows read the evolved column as null
    assert(got.filter("id = 5").collect().head.isNullAt(2))
    assert(rows(got.filter("id in (10, 200)")) ==
      Set("10|UPD2|1.5", "200|NEW2|2.5"))
    assert(got.count() == 101)
    // untouched files kept their bytes (their add entries survive)
    val beforeByPath = before.files.map(a => a.path -> a).toMap
    assert(snap.files.exists(a => beforeByPath.get(a.path).contains(a)),
      "no untouched file survived the evolving merge")
    // the CDF commit classified the evolved rows (both keys already
    // existed after the enforce-mode merge, so both are updates)
    val ch = DeltaLog.changes(spark, root, r.version, Some(r.version))
    assert(rows(ch.filter("_change_type = 'update_postimage'")
      .select("id", "v", "score")) == Set("10|UPD2|1.5", "200|NEW2|2.5"))

    // a later merge whose source still lacks the column: fill_null
    val r2 = DeltaMerge.upsert(spark, root,
      Seq((20L, "UPD3"), (300L, "NEW3")).toDF("id", "v"), Seq("id"),
      cdf = false, schemaPolicy = DeltaSchema.Evolve)
    assert(r2.rowsAppended == 2)
    assert(rows(DeltaLog.read(spark, root).filter("id in (20, 300)")) ==
      Set("20|UPD3|null", "300|NEW3|null"))
  }

  test("case-drifted source columns align instead of null-filling the data") {
    val root = tmp()
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    // a source with uppercase headers IS the same columns (Spark resolves
    // case-insensitively): align must rename, never null-fill + re-add
    val src = Seq((1L, "A2"), (3L, "c")).toDF("ID", "V")
    val r = DeltaMerge.upsert(spark, root, src, Seq("id"),
      schemaPolicy = DeltaSchema.Evolve)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"),
      s"case drift widened the schema: ${snap.schema.fieldNames.toSeq}")
    val got = DeltaLog.read(spark, root).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A2"), (2L, "b"), (3L, "c")),
      s"key values were destroyed: $got")
    assert(r.rowsAppended == 2 || r.rowsAppended == 1, s"$r")
  }

  test("policy knobs: ignore drops, fail fails, enforce requires all columns") {
    val root = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), root)
    val src = Seq((1L, "b", 9)).toDF("id", "v", "extra")
    // onNew = ignore: no widening
    DeltaMerge.upsert(spark, root, src, Seq("id"), cdf = false,
      schemaPolicy = DeltaSchema.Policy(mode = "evolve", onNew = "ignore"))
    assert(DeltaLog.snapshot(spark, root).schema.fieldNames.toSeq == Seq("id", "v"))
    // onNew = fail
    intercept[IllegalArgumentException] {
      DeltaMerge.upsert(spark, root, src, Seq("id"), cdf = false,
        schemaPolicy = DeltaSchema.Policy(mode = "evolve", onNew = "fail"))
    }
    // onMissing = fail
    intercept[IllegalArgumentException] {
      DeltaMerge.upsert(spark, root, Seq(1L).toDF("id"), Seq("id"), cdf = false,
        schemaPolicy = DeltaSchema.Policy(mode = "evolve", onMissing = "fail"))
    }
    // enforce: a missing table column is an error (the old contract)
    intercept[IllegalArgumentException] {
      DeltaMerge.upsert(spark, root, Seq(1L).toDF("id"), Seq("id"), cdf = false)
    }
  }

  test("column-mapped evolution assigns fresh ids and bumps maxColumnId") {
    import org.apache.spark.sql.types._
    val root = tmp()
    // hand-build a name-mapped table (ids 1..2, maxColumnId 2)
    val cm = (name: String, dt: DataType, phys: String, id: Long) =>
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cm("id", LongType, "col-a", 1), cm("v", StringType, "col-b", 2)))
    val staging = Files.createTempDirectory("cmevo").toFile
    Seq((1L, "a"), (2L, "b")).toDF("x", "y")
      .select(col("x").as("col-a"), col("y").as("col-b"))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = staging.listFiles().find(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(root, "d0.parquet")
    dest.getParentFile.mkdirs()
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    val jq = (s: String) => "\"" + s + "\""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{${
          jq("delta.columnMapping.mode")}:${jq("name")},${
          jq("delta.columnMapping.maxColumnId")}:${jq("2")}},"createdTime":1}}""",
        s"""{"add":{"path":"d0.parquet","partitionValues":{},"size":1,"modificationTime":1000,"dataChange":true}}""")
        .mkString("\n").getBytes("UTF-8"))

    val src = Seq((1L, "UPD", 7.0), (9L, "NEW", 8.0)).toDF("id", "v", "w")
    val r = DeltaMerge.upsert(spark, root, src, Seq("id"), cdf = false,
      schemaPolicy = DeltaSchema.Evolve)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    val wf = snap.schema("w")
    assert(wf.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(wf.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"))
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    assert(snap.configuration("delta.columnMapping.mode") == "name")
    // logical read-back: the mapped update landed, old row nulls w
    val got = DeltaLog.read(spark, root)
    assert(rows(got) == Set("1|UPD|7.0", "2|b|null", "9|NEW|8.0"))
    assert(r.rowsDeleted == 1 && r.rowsAppended == 2)
  }

  test("appendOnly + scd2Apply evolve; bookkeeping columns stay intact") {
    val root = tmp()
    DeltaWriter.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    val r = DeltaMerge.appendOnly(spark, root,
      Seq((5L, "dup", 1), (90L, "new", 2)).toDF("id", "v", "n"), Seq("id"),
      schemaPolicy = DeltaSchema.Evolve)
    assert(r.rowsAppended == 1)
    val got = DeltaLog.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "v", "n"))
    assert(rows(got.filter("id in (5, 90)")) == Set("5|v5|null", "90|new|2"))
    // the CDF insert row carries the evolved column
    val ch = DeltaLog.changes(spark, root, r.version, Some(r.version))
    assert(rows(ch.select("id", "v", "n", "_change_type")) == Set("90|new|2|insert"))

    // scd2: a source gaining an attribute widens the dim; history rows
    // and the bookkeeping columns are untouched
    val root2 = tmp()
    DeltaWriter.write(graft.operators.Scd.scd2Bootstrap(
      Seq((1L, "a"), (2L, "b")).toDF("k", "attr"),
      lit("2026-01-01 00:00:00")), root2)
    val r2 = DeltaMerge.scd2Apply(spark, root2,
      Seq((1L, "a2", "x"), (2L, "b", "y")).toDF("k", "attr", "extra"),
      Seq("k"), Seq("attr"), lit("2026-02-01 00:00:00"),
      schemaPolicy = DeltaSchema.Evolve)
    assert(r2.rowsDeleted == 1 && r2.rowsAppended == 2, s"$r2")
    val dim = DeltaLog.read(spark, root2)
    assert(dim.columns.toSeq ==
      Seq("k", "attr", "valid_from", "valid_to", "is_current", "extra"))
    assert(dim.count() == 3)
    val cur1 = dim.filter("k = 1 and is_current").collect().head
    assert(cur1.getAs[String]("attr") == "a2" && cur1.getAs[String]("extra") == "x")
    // the closed history row null-fills the evolved column
    val old1 = dim.filter("k = 1 and not is_current").collect().head
    assert(old1.getAs[String]("attr") == "a" && old1.isNullAt(5))
    // k=2 unchanged on tracked attrs → untouched, extra stays null
    assert(dim.filter("k = 2 and is_current").collect().head.isNullAt(5))
  }

  test("evolving plain append widens via DeltaWriter.write") {
    val root = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "v"), root)
    // enforce still refuses
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((2L, "b", 1)).toDF("id", "v", "n"), root)
    }
    val c = DeltaWriter.write(Seq((2L, "b", 1)).toDF("id", "v", "n"), root,
      schemaPolicy = DeltaSchema.Evolve)
    assert(c.rowsWritten == 1)
    val got = DeltaLog.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "v", "n"))
    assert(rows(got) == Set("1|a|null", "2|b|1"))
    // missing column null-fills on append too
    DeltaWriter.write(Seq((3L, 4)).toDF("id", "n"), root,
      schemaPolicy = DeltaSchema.Evolve)
    assert(rows(DeltaLog.read(spark, root).filter("id = 3")) == Set("3|null|4"))
    // a TYPE change on an existing column is not evolution
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq(("x", "b", 1)).toDF("id", "v", "n"), root,
        schemaPolicy = DeltaSchema.Evolve)
    }
  }

  test("DeltaWriter.write stages PHYSICAL names against column-mapped tables") {
    import org.apache.spark.sql.types._
    // a mapped table written to with write() used to stage LOGICAL-named
    // parquet — the physical-name reader resolved every column to null
    val root = tmp()
    val cm = (name: String, dt: DataType, phys: String, id: Long) =>
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cm("id", LongType, "col-a", 1), cm("v", StringType, "col-b", 2),
      cm("day", StringType, "col-d", 3)))
    val staging = Files.createTempDirectory("cmwrite").toFile
    Seq((1L, "a")).toDF("x", "y")
      .select(col("x").as("col-a"), col("y").as("col-b"))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = staging.listFiles().find(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(root, "col-d=mon/d0.parquet")
    dest.getParentFile.mkdirs()
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    val jq = (s: String) => "\"" + s + "\""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(logical.json)},"partitionColumns":["day"],"configuration":{${
          jq("delta.columnMapping.mode")}:${jq("name")},${
          jq("delta.columnMapping.maxColumnId")}:${jq("3")}},"createdTime":1}}""",
        s"""{"add":{"path":"col-d=mon/d0.parquet","partitionValues":{${
          jq("col-d")}:${jq("mon")}},"size":1,"modificationTime":1000,"dataChange":true}}""")
        .mkString("\n").getBytes("UTF-8"))

    // append with the LOGICAL schema: files + partition dirs go physical
    DeltaWriter.write(Seq((2L, "b", "tue")).toDF("id", "v", "day"), root)   // v1
    assert(rows(DeltaLog.read(spark, root)) == Set("1|a|mon", "2|b|tue"))
    val appended = DeltaLog.snapshot(spark, root).files
      .filterNot(_.path == "col-d=mon/d0.parquet")
    assert(appended.nonEmpty)
    appended.foreach { a =>
      assert(a.partitionValues.keySet == Set("col-d"), s"logical pv keys: $a")
      assert(a.path.startsWith("col-d="), s"logical partition dir: ${a.path}")
    }

    // replaceWhere resolves the logical key to the physical pv key
    DeltaWriter.write(Seq((9L, "B", "tue")).toDF("id", "v", "day"), root,
      "overwrite", Seq("day"), replaceWhere = Map("day" -> "tue"))          // v2
    assert(rows(DeltaLog.read(spark, root)) == Set("1|a|mon", "9|B|tue"))

    // evolving append assigns a fresh mapping id to the new column
    DeltaWriter.write(Seq((3L, "c", "wed", 1.5)).toDF("id", "v", "day", "w"),
      root, schemaPolicy = graft.sources.DeltaSchema.Evolve)                // v3
    val snap3 = DeltaLog.snapshot(spark, root)
    assert(snap3.schema("w").metadata.getLong("delta.columnMapping.id") == 4L)
    assert(snap3.configuration("delta.columnMapping.maxColumnId") == "4")
    assert(rows(DeltaLog.read(spark, root)) ==
      Set("1|a|mon|null", "9|B|tue|null", "3|c|wed|1.5"))

    // full overwrite: same-named unchanged fields keep their mapping
    // metadata, the replaced column set stays externally coherent
    DeltaWriter.write(Seq((7L, "z", "thu")).toDF("id", "v", "day"), root,
      "overwrite", Seq("day"))                                              // v4
    val snap4 = DeltaLog.snapshot(spark, root)
    assert(snap4.schema.fieldNames.toSeq == Seq("id", "v", "day"))
    assert(snap4.schema("id").metadata
      .getString("delta.columnMapping.physicalName") == "col-a")
    assert(snap4.configuration("delta.columnMapping.mode") == "name")
    assert(rows(DeltaLog.read(spark, root)) == Set("7|z|thu"))
    // pre-overwrite state still time-travels with ITS schema
    assert(DeltaLog.read(spark, root, versionAsOf = Some(3L)).count() == 3)
  }

  test("declarative delta/iceberg sinks evolve via write options") {
    import graft.sources.{IcebergSource, Sources}
    val root = tmp()
    Sources.write(Seq((1L, "a")).toDF("id", "v"), root,
      Sources.WriteConfig(format = "delta", mode = "overwrite"))
    // enforce (default) refuses the widened append
    intercept[IllegalArgumentException] {
      Sources.write(Seq((2L, "b", 1)).toDF("id", "v", "n"), root,
        Sources.WriteConfig(format = "delta", mode = "append"))
    }
    Sources.write(Seq((2L, "b", 1)).toDF("id", "v", "n"), root,
      Sources.WriteConfig(format = "delta", mode = "append",
        options = Map("schema_mode" -> "evolve")))
    assert(rows(DeltaLog.read(spark, root)) == Set("1|a|null", "2|b|1"))

    val root2 = tmp()
    Sources.write(Seq((1L, "a")).toDF("id", "v"), root2,
      Sources.WriteConfig(format = "iceberg", mode = "append"))
    Sources.write(Seq((2L, "b", 1)).toDF("id", "v", "n"), root2,
      Sources.WriteConfig(format = "iceberg", mode = "append",
        options = Map("schema_mode" -> "evolve")))
    assert(rows(IcebergSource.read(spark, root2)) == Set("1|a|null", "2|b|1"))
  }

  test("merge_delta transformer exposes the schema_mode knobs") {
    graft.core.StandardTransformers.registerAll
    val root = tmp()
    DeltaWriter.write(Seq((1L, "a")).toDF("k", "v"), root)
    val t = graft.core.TransformerRegistry.get("merge_delta").get
    val out = t(graft.core.EngineContext(
      Seq((1L, "UPD", 3.5), (2L, "NEW", 4.5)).toDF("k", "v", "score")),
      Map("target_path" -> root, "keys" -> Seq("k"),
        "schema_mode" -> "evolve"))
    assert(out.columns.toSeq == Seq("k", "v", "score"))
    assert(rows(out) == Set("1|UPD|3.5", "2|NEW|4.5"))
  }

  test("dropColumn on a mapped table: metadata-only, time travel keeps the column") {
    import org.apache.spark.sql.types._
    val root = tmp()
    val cm = (name: String, dt: DataType, phys: String, id: Long) =>
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cm("id", LongType, "col-a", 1), cm("v", StringType, "col-b", 2)))
    val staging = Files.createTempDirectory("cmdrop").toFile
    Seq((1L, "a"), (2L, "b")).toDF("x", "y")
      .select(col("x").as("col-a"), col("y").as("col-b"))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = staging.listFiles().find(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(root, "d0.parquet")
    dest.getParentFile.mkdirs()
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    val jq = (s: String) => "\"" + s + "\""
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{${
          jq("delta.columnMapping.mode")}:${jq("name")},${
          jq("delta.columnMapping.maxColumnId")}:${jq("2")}},"createdTime":1}}""",
        s"""{"add":{"path":"d0.parquet","partitionValues":{},"size":1,"modificationTime":1000,"dataChange":true}}""")
        .mkString("\n").getBytes("UTF-8"))

    val c = DeltaWriter.dropColumn(spark, root, "v") // v1: metadata only
    assert(c.version == 1L)
    val got = DeltaLog.read(spark, root)
    assert(got.columns.toSeq == Seq("id"), got.columns.mkString(","))
    assert(got.as[Long].collect().toSet == Set(1L, 2L))
    // the bytes were never touched: time travel still serves the column
    val v0 = DeltaLog.read(spark, root, versionAsOf = Some(0L))
    assert(v0.columns.toSeq == Seq("id", "v"))
    assert(v0.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // appends under the narrowed schema keep working
    DeltaWriter.write(Seq(3L).toDF("id"), root)
    assert(DeltaLog.read(spark, root).as[Long].collect().toSet == Set(1L, 2L, 3L))
    // guards: last column, unknown column, unmapped table
    intercept[IllegalArgumentException] { DeltaWriter.dropColumn(spark, root, "id") }
    intercept[IllegalArgumentException] { DeltaWriter.dropColumn(spark, root, "zz") }
    val plain = tmp()
    DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), plain)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.dropColumn(spark, plain, "v")
    }
    assert(e.getMessage.contains("column-mapped"), e.getMessage)
  }
}
