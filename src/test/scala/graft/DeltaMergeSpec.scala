package graft

import java.nio.file.Files

import graft.operators.{Merge, Scd}
import graft.sources.{DeltaLog, DeltaMerge, DeltaWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * File-scoped copy-on-write Delta MERGE: semantics must equal the
 * snapshot algebra (Merge/Scd), while the physical commit touches only
 * the files containing matched rows — untouched add entries survive
 * verbatim and write amplification tracks the touched-file count, not
 * table size.
 */
class DeltaMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("delta_merge").toString + "/t"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def commitText(root: String, v: Long): String = {
    val p = java.nio.file.Paths.get(root, "_delta_log", f"$v%020d.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("upsert matches the snapshot algebra and only touches matched files") {
    val root = tmp()
    val target = (0 until 1000).map(i => (i.toLong, s"v$i", i % 10))
      .toDF("id", "payload", "grp")
    // 8 files so "touched" is a strict subset
    DeltaWriter.write(target.repartition(8), root)
    val before = DeltaLog.snapshot(spark, root)
    assert(before.files.size == 8)

    // updates hit a few keys; inserts are brand-new keys
    val source = ((0 until 20).map(i => (i * 50L, s"UPD$i", 99)) ++
      (0 until 5).map(i => (5000L + i, s"NEW$i", 7))).toDF("id", "payload", "grp")

    val res = DeltaMerge.upsert(spark, root, source, Seq("id"))
    assert(res.rowsDeleted == 20 && res.rowsAppended == 25, s"got $res")

    // semantics: exactly the snapshot algebra's result
    val expected = Merge.upsert(target, source, Seq("id"))
    assert(rows(DeltaLog.read(spark, root)) == rows(expected))

    // physics: untouched files' add entries survive the commit verbatim
    val after = DeltaLog.snapshot(spark, root)
    val touched = after.files.filter(_.deletionVector.isDefined).map(_.path).toSet
    assert(touched.size == res.filesTouched && touched.nonEmpty)
    val beforeByPath = before.files.map(a => a.path -> a).toMap
    after.files.filterNot(a => touched.contains(a.path))
      .filter(a => beforeByPath.contains(a.path))
      .foreach(a => assert(a == beforeByPath(a.path),
        s"untouched add entry changed: $a vs ${beforeByPath(a.path)}"))
    // ... and are not even re-emitted in the commit JSON (delta-based log)
    val commit = commitText(root, res.version)
    before.files.filterNot(a => touched.contains(a.path)).foreach(a =>
      assert(!commit.contains(a.path), s"untouched ${a.path} re-emitted"))
    // no original data file was rewritten: all 8 still on disk
    before.files.foreach(a => assert(
      new java.io.File(root, a.path).exists()))
  }

  test("update/insert conditions and audit columns") {
    val root = tmp()
    val target = (0 until 100).map(i => (i.toLong, i * 10, "old"))
      .toDF("id", "amt", "tag")
    DeltaWriter.write(target.repartition(4), root)
    val source = (50 until 150).map(i => (i.toLong, i, "new"))
      .toDF("id", "amt", "tag")
    val res = DeltaMerge.upsert(spark, root, source, Seq("id"),
      updateCondition = Some("source.amt > 70"),   // ids 71..99 update
      insertCondition = Some("source.amt < 120"),  // ids 100..119 insert
      auditCols = Map("tag" -> lit("merged")))
    assert(res.rowsDeleted == 29 && res.rowsAppended == 49, s"got $res")
    val got = DeltaLog.read(spark, root)
    assert(got.count() == 120)
    assert(got.filter("tag = 'merged'").count() == 49)
    // a matched row failing the update condition keeps its target bytes
    assert(rows(got.filter("id = 60")) == Set("60|600|old"))
    assert(rows(got.filter("id = 80")) == Set("80|80|merged"))
    assert(got.filter("id >= 120").count() == 0)
  }

  test("merge into empty table degenerates to insert; deleteMatch is bitmap-only") {
    val root = tmp()
    DeltaWriter.write(Seq.empty[(Long, String)].toDF("id", "v"), root)
    val r1 = DeltaMerge.upsert(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    assert(r1.rowsDeleted == 0 && r1.rowsAppended == 2 && r1.filesTouched == 0)
    assert(DeltaLog.read(spark, root).count() == 2)

    val dataBefore = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val r2 = DeltaMerge.deleteMatch(spark, root, Seq(1L).toDF("id"), Seq("id"))
    assert(r2.rowsDeleted == 1 && r2.rowsAppended == 0 && r2.filesAdded == 0)
    val dataAfter = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataAfter == dataBefore, "deleteMatch wrote data files")
    assert(rows(DeltaLog.read(spark, root)) == Set("2|b"))
    // conditional variant over target./source. columns
    DeltaMerge.upsert(spark, root,
      Seq((3L, "c"), (4L, "d")).toDF("id", "v"), Seq("id"))
    val r3 = DeltaMerge.deleteMatch(spark, root,
      Seq((3L, "x"), (4L, "d")).toDF("id", "v"), Seq("id"),
      deleteCondition = Some("target.v = source.v"))
    assert(r3.rowsDeleted == 1)
    assert(rows(DeltaLog.read(spark, root).select("id")) == Set("2", "3"))
  }

  test("appendOnly inserts absent keys only, as a pure add commit") {
    val root = tmp()
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val res = DeltaMerge.appendOnly(spark, root,
      Seq((2L, "DUP"), (3L, "c")).toDF("id", "v"), Seq("id"))
    assert(res.rowsDeleted == 0 && res.rowsAppended == 1 && res.filesTouched == 0)
    assert(rows(DeltaLog.read(spark, root)) == Set("1|a", "2|b", "3|c"))
    // idempotent: the same batch again is a no-op commit
    val again = DeltaMerge.appendOnly(spark, root,
      Seq((2L, "DUP"), (3L, "c")).toDF("id", "v"), Seq("id"))
    assert(again.rowsAppended == 0)
  }

  test("scd2Apply matches the snapshot algebra; history rows keep their bytes") {
    val root = tmp()
    val base = (0 until 200).map(i => (i.toLong, s"addr$i", i % 5))
      .toDF("id", "addr", "tier")
    val boot = Scd.scd2Bootstrap(base, lit("2026-01-01 00:00:00"))
    DeltaWriter.write(boot.repartition(4), root)
    // 20 changed, 5 new
    val src = ((0 until 200).map(i =>
      (i.toLong, if (i % 10 == 0) s"moved$i" else s"addr$i", i % 5)) ++
      (0 until 5).map(i => (900L + i, s"addr9$i", 1)))
      .toDF("id", "addr", "tier")
    val res = DeltaMerge.scd2Apply(spark, root, src, Seq("id"), Seq("addr"),
      lit("2026-02-01 00:00:00"))
    assert(res.rowsDeleted == 20 && res.rowsAppended == 45, s"got $res")

    val expected = Scd.scd2Apply(boot, src, Seq("id"), Seq("addr"),
      lit("2026-02-01 00:00:00"))
    assert(rows(DeltaLog.read(spark, root)) == rows(expected))

    // second pass with closeDeleted: drop id>=100 from source
    val src2 = src.filter("id < 100")
    val res2 = DeltaMerge.scd2Apply(spark, root, src2, Seq("id"), Seq("addr"),
      lit("2026-03-01 00:00:00"), closeDeleted = true)
    val expected2 = Scd.scd2Apply(expected, src2, Seq("id"), Seq("addr"),
      lit("2026-03-01 00:00:00"), closeDeleted = true)
    assert(rows(DeltaLog.read(spark, root)) == rows(expected2))
    assert(res2.rowsDeleted > 0)
  }

  test("CDF attributes merge deletes and inserts; txn makes replays no-ops") {
    val root = tmp()
    DeltaWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2), root)
    val src = Seq((10L, "X"), (200L, "Y")).toDF("id", "v")
    val res = DeltaMerge.upsert(spark, root, src, Seq("id"),
      txn = Some(("app1", 7L)))
    val ch = DeltaLog.changes(spark, root, res.version, Some(res.version))
    // faithful MERGE classification: replaced rows are UPDATES
    // (preimage/postimage), unmatched source rows are inserts
    assert(rows(ch.select("id", "v", "_change_type")) ==
      Set("10|v10|update_preimage", "10|X|update_postimage", "200|Y|insert"))
    // replayed batch: same (appId, version) → no-op, no new version
    val replay = DeltaMerge.upsert(spark, root, src, Seq("id"),
      txn = Some(("app1", 7L)))
    assert(replay.version == res.version && replay.rowsAppended == 0)
    assert(DeltaLog.read(spark, root).count() == 101)
  }

  test("partition-scoped upsert prunes candidates and polices its scope") {
    val root = tmp()
    val target = (0 until 900).map(i => (i.toLong, s"v$i", s"d${i % 3}"))
      .toDF("id", "v", "day")
    DeltaWriter.write(target.repartition(6), root, partitionBy = Seq("day"))
    val before = DeltaLog.snapshot(spark, root)

    // scoped to day=d1: only d1 files are scanned/vectored
    val src = Seq((1L, "UPD", "d1"), (9001L, "NEW", "d1")).toDF("id", "v", "day")
    val res = DeltaMerge.upsert(spark, root, src, Seq("id"),
      partitionFilter = Map("day" -> "d1"))
    assert(res.rowsDeleted == 1 && res.rowsAppended == 2, s"$res")
    val after = DeltaLog.snapshot(spark, root)
    after.files.filter(_.deletionVector.isDefined).foreach(a =>
      assert(a.partitionValues.get("day").flatten.contains("d1"),
        s"out-of-scope file vectored: $a"))
    // out-of-scope partitions keep their add entries verbatim
    val beforeByPath = before.files.map(a => a.path -> a).toMap
    after.files.filter(a => beforeByPath.contains(a.path) &&
      !a.partitionValues.get("day").flatten.contains("d1"))
      .foreach(a => assert(a == beforeByPath(a.path)))
    assert(rows(DeltaLog.read(spark, root).filter("id in (1, 9001)")
      .select("v")) == Set("UPD", "NEW"))

    // out-of-scope SOURCE rows fail fast, naming the offending value —
    // they'd otherwise insert a duplicate next to the un-updated original
    val vBefore = DeltaLog.snapshot(spark, root).version
    val ex = intercept[IllegalArgumentException] {
      DeltaMerge.upsert(spark, root,
        Seq((9002L, "X", "d2")).toDF("id", "v", "day"), Seq("id"),
        partitionFilter = Map("day" -> "d1"))
    }
    assert(ex.getMessage.contains("day=d2"), ex.getMessage)
    assert(DeltaLog.snapshot(spark, root).version == vBefore,
      "aborted scoped merge still committed")
  }

  test("duplicate source keys fail loudly (Delta MERGE cardinality contract)") {
    // the DV bitmap dedupes positions, which would HIDE a multi-match —
    // but upsert appends one replacement per joined pair, silently
    // duplicating rows. Fail like delta-spark's MERGE instead.
    val root = tmp()
    DeltaWriter.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    val dup = Seq((1L, "A"), (1L, "B"), (2L, "C")).toDF("id", "v")
    val ex = intercept[UnsupportedOperationException] {
      DeltaMerge.upsert(spark, root, dup, Seq("id"))
    }
    assert(ex.getMessage.contains("multiple source rows"))
    assert(DeltaLog.snapshot(spark, root).version == 0L,
      "failed merge still committed")
    // scd2Apply owes the same contract
    val root2 = tmp()
    DeltaWriter.write(Scd.scd2Bootstrap(Seq((1L, "a")).toDF("k", "attr"),
      lit("2026-01-01 00:00:00")), root2)
    intercept[UnsupportedOperationException] {
      DeltaMerge.scd2Apply(spark, root2,
        Seq((1L, "x"), (1L, "y")).toDF("k", "attr"),
        Seq("k"), Seq("attr"), lit("2026-02-01 00:00:00"))
    }
    // deleteMatch stays tolerant (nothing appends): the bitmap dedupes
    // and the CDF delete rows are deduped on position too
    val r = DeltaMerge.deleteMatch(spark, root, dup, Seq("id"),
      deleteCondition = Some("source.v <> 'nope'"))
    assert(r.rowsDeleted == 2, s"$r")
    val ch = DeltaLog.changes(spark, root, r.version, Some(r.version))
    assert(ch.filter("id = 1").count() == 1,
      "duplicate source matches duplicated CDF delete rows")
    assert(DeltaLog.read(spark, root).count() == 8)
  }

  test("appendOnly with CDF on a column-mapped table stages physical cdc") {
    import org.apache.spark.sql.types._
    // regression: the derived cdc path unioned the PHYSICAL-named delete
    // frame with LOGICAL-named append rows — appendOnly + cdf on a
    // mapped table threw AnalysisException and insert cdc rows were
    // never renamed physical
    val root = tmp()
    def cmField(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cmField("id", LongType, "col-i1", 1),
      cmField("v", StringType, "col-v1", 2)))
    val staging = Files.createTempDirectory("cmappend").toFile
    Seq((1L, "a"), (2L, "b")).toDF("a", "b")
      .select(col("a").as("col-i1"), col("b").as("col-v1"))
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
          jq("delta.enableChangeDataFeed")}:${jq("true")}},"createdTime":1}}""",
        s"""{"add":{"path":"d0.parquet","partitionValues":{},"size":1,"modificationTime":1000,"dataChange":true}}""")
        .mkString("\n").getBytes("UTF-8"))

    val res = DeltaMerge.appendOnly(spark, root,
      Seq((2L, "dup"), (100L, "n")).toDF("id", "v"), Seq("id"), cdf = true)
    assert(res.rowsAppended == 1, s"$res")
    assert(rows(DeltaLog.read(spark, root)) == Set("1|a", "2|b", "100|n"))
    // the change feed reads back LOGICAL and classifies the insert
    val ch = DeltaLog.changes(spark, root, res.version, Some(res.version))
    assert(rows(ch.select("id", "v", "_change_type")) == Set("100|n|insert"))
  }

  test("aborted scope-escaping merge reclaims its DV bin files") {
    val root = tmp()
    DeltaWriter.write((0 until 100).map(i => (i.toLong, s"v$i", s"d${i % 2}"))
      .toDF("id", "v", "day"), root, partitionBy = Seq("day"))
    def bins() = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).map(_.getName).toSet
    assert(bins().isEmpty)
    // the source keys sit inside the scope, but an audit column rewrites
    // the partition value so the APPENDED replacement escapes it — the
    // abort must reclaim the staged adds AND this attempt's DV bins
    intercept[IllegalArgumentException] {
      DeltaMerge.upsert(spark, root,
        Seq((0L, "UPD", "d0")).toDF("id", "v", "day"), Seq("id"),
        auditCols = Map("day" -> lit("d9")),
        partitionFilter = Map("day" -> "d0"))
    }
    assert(bins().isEmpty, "aborted merge leaked DV bin files")
    assert(DeltaLog.snapshot(spark, root).version == 0L)
  }

  test("merge_delta / scd2_delta transformers reach the file-scoped path") {
    graft.core.StandardTransformers.registerAll
    val root = tmp()
    DeltaWriter.write((1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v"), root)
    val dataBefore = new java.io.File(root).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val src = Seq((1L, "UPD"), (11L, "NEW")).toDF("k", "v")
    val t = graft.core.TransformerRegistry.get("merge_delta").get
    val out = t(graft.core.EngineContext(src),
      Map("target_path" -> root, "keys" -> Seq("k")))
    assert(out.count() == 11)
    assert(rows(out.filter("k in (1, 11)")) == Set("1|UPD", "11|NEW"))
    // original data files untouched on disk (bitmaps + one new file)
    dataBefore.foreach(n => assert(new java.io.File(root, n).exists()))

    val root2 = tmp()
    DeltaWriter.write(Scd.scd2Bootstrap(
      Seq((1L, "a"), (2L, "b")).toDF("k", "attr"), lit("2026-01-01 00:00:00")), root2)
    val t2 = graft.core.TransformerRegistry.get("scd2_delta").get
    val out2 = t2(graft.core.EngineContext(Seq((1L, "a2"), (2L, "b")).toDF("k", "attr")),
      Map("target_path" -> root2, "keys" -> Seq("k"),
        "track_cols" -> Seq("attr"), "effective_ts" -> "2026-02-01 00:00:00"))
    assert(out2.count() == 3) // closed v1 of k=1, open v2 of k=1, untouched k=2
    assert(out2.filter("k = 1 and is_current").collect().head
      .getAs[String]("attr") == "a2")
  }

  test("successive merges on the same files MERGE their bitmaps") {
    val root = tmp()
    DeltaWriter.write((0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1), root)
    DeltaMerge.upsert(spark, root, Seq((10L, "a")).toDF("id", "v"), Seq("id"))
    // second merge hits the SAME original file (id 20 still lives there):
    // its DV must carry BOTH positions, the first update must stay applied
    DeltaMerge.upsert(spark, root, Seq((20L, "b")).toDF("id", "v"), Seq("id"))
    val snap = DeltaLog.snapshot(spark, root)
    val origDv = snap.files.filter(_.deletionVector.isDefined)
    assert(origDv.map(_.deletionVector.get.cardinality).sum == 2,
      s"bitmaps did not merge: ${origDv.map(_.deletionVector)}")
    val got = DeltaLog.read(spark, root)
    assert(got.count() == 400)
    assert(rows(got.filter("id in (10, 20)")) == Set("10|a", "20|b"))
    // third merge UPDATING a previously-merged row: the replacement row
    // lives in a small new file; it gets its own vector, original stays
    DeltaMerge.upsert(spark, root, Seq((10L, "a2")).toDF("id", "v"), Seq("id"))
    assert(rows(DeltaLog.read(spark, root).filter("id = 10")) == Set("10|a2"))
    assert(DeltaLog.read(spark, root).count() == 400)
  }

  test("concurrent merges on disjoint keys: both land, retry loop re-plans") {
    val root = tmp()
    DeltaWriter.write((0 until 1000).map(i => (i.toLong, "orig")).toDF("id", "v")
      .repartition(4), root)
    // two writers race version claims on DISJOINT key ranges; the loser
    // must reclaim its DV/staged files and re-plan against the winner
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(DeltaMerge.upsert(spark, root,
      (0 until 50).map(i => (i.toLong, "w1")).toDF("id", "v"), Seq("id"),
      cdf = false))
    val f2 = Future(DeltaMerge.upsert(spark, root,
      (500 until 560).map(i => (i.toLong, "w2")).toDF("id", "v"), Seq("id"),
      cdf = false))
    val (r1, r2) = (Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    assert(Set(r1.version, r2.version) == Set(1L, 2L),
      s"versions not contiguous: $r1 / $r2")
    val got = DeltaLog.read(spark, root)
    assert(got.count() == 1000)
    assert(got.filter("v = 'w1'").count() == 50)
    assert(got.filter("v = 'w2'").count() == 60)
    assert(got.filter("v = 'orig'").count() == 890)
    // no orphaned uncommitted artifacts survive the race: every parquet
    // under the root is either an active add or a vacuum-able replaced
    // file — vacuum(0) then re-read must still be exact
    graft.sources.DeltaMaintenance.vacuum(spark, root, retentionHours = 0.0)
    assert(DeltaLog.read(spark, root).count() == 1000)
  }

  test("upsert into a COLUMN-MAPPED partitioned table renames appends physical") {
    import org.apache.spark.sql.types._
    // hand-build a name-mode mapped table like a real mapping writer
    // emits: physical names differ everywhere, partitionValues physical
    val root = tmp()
    def cmField(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cmField("id", LongType, "col-a1", 1),
      cmField("v", DoubleType, "col-v1", 2),
      cmField("day", StringType, "col-d1", 3)))
    def jq(s: String) = "\"" + s + "\""
    def dataFile(df: DataFrame, name: String): Unit = {
      val staging = Files.createTempDirectory("mergemapstage").toFile
      df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = staging.listFiles().find(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dest = new java.io.File(root, name)
      dest.getParentFile.mkdirs()
      Files.copy(part.toPath, dest.toPath); ()
    }
    dataFile((0 until 50).map(i => (i.toLong, i.toDouble)).toDF("a", "b")
      .select(col("a").as("col-a1"), col("b").as("col-v1")), "d0.parquet")
    dataFile((50 until 100).map(i => (i.toLong, i.toDouble)).toDF("a", "b")
      .select(col("a").as("col-a1"), col("b").as("col-v1")), "d1.parquet")
    val logDir = new java.io.File(root, "_delta_log"); logDir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(logDir, "00000000000000000000.json").toPath,
      Seq(
        """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(logical.json)},"partitionColumns":["day"],"configuration":{${
          jq("delta.columnMapping.mode")}:${jq("name")}},"createdTime":1}}""",
        s"""{"add":{"path":"d0.parquet","partitionValues":{${jq("col-d1")}:${jq("mon")}},"size":1,"modificationTime":1000,"dataChange":true}}""",
        s"""{"add":{"path":"d1.parquet","partitionValues":{${jq("col-d1")}:${jq("tue")}},"size":1,"modificationTime":1000,"dataChange":true}}""")
        .mkString("\n").getBytes("UTF-8"))

    // LOGICAL-schema source: one update (id=10, lives in mon) and one
    // brand-new row landing in a fresh partition
    val src = Seq((10L, 99.0, "mon"), (500L, 1.0, "wed")).toDF("id", "v", "day")
    val res = DeltaMerge.upsert(spark, root, src, Seq("id"), cdf = false)
    assert(res.rowsDeleted == 1 && res.rowsAppended == 2, s"$res")

    val got = DeltaLog.read(spark, root)
    assert(got.count() == 101)
    assert(rows(got.filter("id in (10, 500)").select("id", "v", "day")) ==
      Set("10|99.0|mon", "500|1.0|wed"))
    // appended add actions key their partition values PHYSICAL
    val snap = DeltaLog.snapshot(spark, root)
    val newAdds = snap.files.filterNot(a => Set("d0.parquet", "d1.parquet")(a.path))
    assert(newAdds.nonEmpty)
    newAdds.foreach(a => assert(a.partitionValues.keySet == Set("col-d1"),
      s"append keyed logical: ${a.partitionValues}"))
    // the untouched tue file kept its bytes; mon carries the vector
    assert(snap.files.find(_.path == "d1.parquet").get.deletionVector.isEmpty)
    assert(snap.files.find(_.path == "d0.parquet").get.deletionVector.isDefined)
  }

  test("soak: write amplification tracks touched files, not table size") {
    val root = tmp()
    val n = 2000000
    DeltaWriter.write(spark.range(n.toLong).toDF("id")
      .withColumn("payload", concat(lit("p"), col("id")))
      .withColumn("bucket", (col("id") % 100).cast("int"))
      .repartition(64), root)
    val before = DeltaLog.snapshot(spark, root)
    assert(before.files.size == 64)
    val bytesBefore = before.files.map(_.size).sum

    // a 200-row upsert (0.01%) into the 2M-row table
    val src = spark.range(200).toDF("id")
      .withColumn("id", col("id") * 10000L)
      .withColumn("payload", lit("UPDATED"))
      .withColumn("bucket", lit(-1).cast("int"))
    val t0 = System.nanoTime()
    val res = DeltaMerge.upsert(spark, root, src, Seq("id"))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"2M-row upsert of 200 keys: $secs%.1f s, $res")
    assert(res.rowsDeleted == 200 && res.rowsAppended == 200)

    // amplification: NEW data bytes are the appended rows only — orders
    // of magnitude below the table; original files all survive on disk
    val after = DeltaLog.snapshot(spark, root)
    val newAdds = after.files.filterNot(a =>
      before.files.exists(_.path == a.path))
    val newBytes = newAdds.map(_.size).sum
    assert(newBytes < bytesBefore / 100,
      s"appended $newBytes bytes vs table $bytesBefore")
    before.files.foreach(a => assert(
      new java.io.File(root, a.path).exists(),
      s"original file ${a.path} was rewritten"))
    // row conservation through the merge
    assert(DeltaLog.read(spark, root).count() == n)
    assert(DeltaLog.read(spark, root).filter("payload = 'UPDATED'").count() == 200)
  }
}
