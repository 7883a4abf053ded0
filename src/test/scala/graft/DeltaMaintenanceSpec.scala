package graft

import graft.sources.{DeltaLog, DeltaMaintenance, DeltaStats, DeltaWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * OPTIMIZE / Z-ORDER / VACUUM / HISTORY over the native Delta writer:
 * compaction must be invisible to readers (identical rows, dataChange=
 * false), conflict-checked, and time-travel-preserving until VACUUM
 * reclaims aged files — the public Delta maintenance contract the
 * reference reaches through the delta-spark jar.
 */
class DeltaMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("deltamaint").toString

  private def logText(root: String, v: Long): String =
    new String(Files.readAllBytes(
      new java.io.File(root, f"_delta_log/$v%020d.json").toPath), "UTF-8")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.select("id", "s").as[(Int, String)].collect().toSet

  private def mk(n: Int, tag: String): DataFrame =
    spark.range(n).select($"id".cast("int").as("id"),
      concat(lit(tag), $"id").as("s"))

  test("optimize bin-packs small files, readers see identical rows, dataChange=false") {
    val root = tmp()
    (0 until 4).foreach(i => DeltaWriter.write(mk(50, s"b$i-"), root, "append"))
    val before = DeltaLog.snapshot(spark, root)
    assert(before.files.size >= 4)
    val expected = rows(DeltaLog.read(spark, root))

    val res = DeltaMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    assert(res.version.contains(before.version + 1))
    assert(res.filesRemoved == before.files.size && res.filesAdded == 1)

    val after = DeltaLog.snapshot(spark, root)
    assert(after.files.size == 1)
    assert(rows(DeltaLog.read(spark, root)) == expected)
    // pre-optimize version still time-travels (old files not deleted)
    assert(rows(DeltaLog.read(spark, root, versionAsOf = Some(before.version))) == expected)
    // the commit is a metadata-only rewrite
    val txt = logText(root, res.version.get)
    assert(txt.contains(""""operation":"OPTIMIZE""""))
    assert(txt.contains(""""dataChange":false"""))
    assert(!txt.contains(""""dataChange":true"""))
  }

  test("optimize is a no-op on an already-compact table") {
    val root = tmp()
    DeltaWriter.write(mk(100, "x").coalesce(1), root, "append")
    val res = DeltaMaintenance.optimize(spark, root)
    assert(res == DeltaMaintenance.OptimizeResult(None, 0, 0, 0L, 0L))
    assert(DeltaLog.versions(spark, root) == Seq(0L))
  }

  test("partitioned optimize compacts per partition and honors partitionFilter") {
    val root = tmp()
    def part(n: Int, tag: String): DataFrame =
      mk(n, tag).withColumn("p", ($"id" % 2).cast("string"))
    (0 until 3).foreach(i => DeltaWriter.write(part(40, s"p$i-").coalesce(1), root,
      "append", partitionBy = Seq("p")))
    val before = DeltaLog.snapshot(spark, root)
    assert(before.files.size == 6) // 3 appends x 2 partitions
    val expected = DeltaLog.read(spark, root)
      .select("id", "s", "p").as[(Int, String, String)].collect().toSet

    // filter to partition p=0 only: p=1 files untouched
    val res0 = DeltaMaintenance.optimize(spark, root,
      targetFileBytes = 512L << 20, partitionFilter = Map("p" -> "0"))
    val mid = DeltaLog.snapshot(spark, root)
    assert(res0.filesRemoved == 3 && res0.filesAdded == 1)
    assert(mid.files.count(_.partitionValues.get("p").flatten.contains("0")) == 1)
    assert(mid.files.count(_.partitionValues.get("p").flatten.contains("1")) == 3)

    val res1 = DeltaMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    assert(res1.filesRemoved == 3 && res1.filesAdded == 1)
    val after = DeltaLog.read(spark, root)
      .select("id", "s", "p").as[(Int, String, String)].collect().toSet
    assert(after == expected)
    assert(DeltaLog.snapshot(spark, root).files.size == 2)
  }

  test("zorder optimize re-clusters all files; partitioned tables fail fast") {
    val root = tmp()
    val df = spark.range(2000).select(
      $"id".cast("int").as("id"),
      concat(lit("r"), $"id").as("s"),
      (rand(7) * 1000).cast("int").as("a"),
      (rand(11) * 1000).cast("int").as("b"))
    DeltaWriter.write(df.repartition(6), root, "append")
    val expected = DeltaLog.read(spark, root)
      .select("id", "s", "a", "b").as[(Int, String, Int, Int)].collect().toSet

    val res = DeltaMaintenance.optimize(spark, root,
      targetFileBytes = 512L << 20, zorderBy = Seq("a", "b"))
    assert(res.filesRemoved == 6)
    assert(DeltaLog.read(spark, root)
      .select("id", "s", "a", "b").as[(Int, String, Int, Int)].collect().toSet == expected)
    val txt = logText(root, res.version.get)
    assert(txt.contains(""""zOrderBy":"a,b""""))

    // z-ordering a partition COLUMN is pointless (constant per file)
    val proot = tmp()
    DeltaWriter.write(df.withColumn("p", lit("x")), proot, "append",
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      DeltaMaintenance.optimize(spark, proot, zorderBy = Seq("p"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("zRanges derives zorder scaling bounds from log stats — no data scan") {
    val root = tmp()
    val df = spark.range(1000).select(
      $"id".cast("int").as("id"),
      concat(lit("r"), $"id").as("s"),
      (rand(3) * 500 - 100).cast("int").as("a"),
      ($"id".cast("double") / 7.0).as("b"))
    DeltaWriter.write(df.repartition(4), root, "append")
    val snap = DeltaLog.snapshot(spark, root)
    val hint = DeltaStats.zRanges(snap, snap.files, Seq("a", "b"))
    // the hint must cover BOTH columns (otherwise zOrderFrame silently
    // falls back to the min/max scan this fast path exists to remove)
    assert(hint.keySet == Set("a", "b"), s"hint missing columns: $hint")
    val truth = DeltaLog.read(spark, root)
      .agg(min($"a"), max($"a"), min($"b"), max($"b")).head()
    assert(hint("a") == ((truth.getInt(0).toDouble, truth.getInt(1).toDouble)))
    assert(hint("b") == ((truth.getDouble(2), truth.getDouble(3))))
    // a file with no recorded stats degrades to fallback, not garbage
    val noStats = snap.files.map(_.copy(stats = None))
    assert(DeltaStats.zRanges(snap, noStats, Seq("a", "b")).isEmpty)
    // string columns are never hinted (zNumeric rejects them anyway)
    assert(DeltaStats.zRanges(snap, snap.files, Seq("s")).isEmpty)
  }

  test("zorder on a PARTITIONED table clusters within partitions") {
    val root = tmp()
    // interleaved layout within each of two partitions
    val df = (0 until 4096).map { i =>
      (i % 64, i / 64, s"d${i % 2}")
    }.toDF("x", "y", "day")
    DeltaWriter.write(df.repartition(8), root, "append",
      partitionBy = Seq("day"))
    val expected = DeltaLog.read(spark, root)
      .as[(Int, Int, String)].collect().toSet

    val res = DeltaMaintenance.optimize(spark, root,
      targetFileBytes = 4096, zorderBy = Seq("x", "y"))
    assert(res.version.nonEmpty, s"$res")
    val snap = DeltaLog.snapshot(spark, root)
    // rows conserved, every file still in its hive partition dir
    assert(DeltaLog.read(spark, root).as[(Int, Int, String)]
      .collect().toSet == expected)
    assert(snap.files.forall(a => a.partitionValues.get("day").flatten.isDefined))
    // the point: a 2-dim predicate WITH a partition pin now skips files
    val pr = DeltaStats.prune(spark, snap,
      col("day") === "d0" && col("x") < 8 && col("y") < 8)
    assert(pr.kept < pr.candidates,
      s"partitioned z-order must enable skipping: kept ${pr.kept}/${pr.candidates}")
    assert(DeltaLog.read(spark, root, dataFilter =
      Some(col("day") === "d0" && col("x") < 8 && col("y") < 8)).count() == 32)
  }

  test("vacuum reclaims unreferenced files after retention; dry-run only lists") {
    val root = tmp()
    DeltaWriter.write(mk(60, "v0-"), root, "append")
    DeltaWriter.write(mk(60, "v1-"), root, "overwrite") // v0's files now inactive
    val expected = rows(DeltaLog.read(spark, root))
    val dataFiles = (r: String) => new java.io.File(r).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val beforeFiles = dataFiles(root)

    val dry = DeltaMaintenance.vacuum(spark, root, retentionHours = 0, dryRun = true)
    assert(dry.dryRun && dry.deleted.nonEmpty)
    assert(dataFiles(root) == beforeFiles) // nothing deleted

    // within retention: nothing eligible
    assert(DeltaMaintenance.vacuum(spark, root, retentionHours = 24).deleted.isEmpty)

    val res = DeltaMaintenance.vacuum(spark, root, retentionHours = 0)
    assert(res.deleted == dry.deleted)
    assert(rows(DeltaLog.read(spark, root)) == expected) // current version intact
    val active = DeltaLog.snapshot(spark, root).files.map(_.path).toSet
    assert(dataFiles(root) == active) // exactly the active set remains
  }

  test("cleanupLogs: pre-checkpoint commits, superseded checkpoints and orphaned sidecars go") {
    import spark.implicits._
    val root = tmp()
    spark.conf.set("graft.delta.checkpoint.v2.threshold", "3")
    spark.conf.set("graft.delta.checkpoint.sidecar.files", "2")
    try {
      DeltaWriter.write((0 until 30).toDF("k").repartition(3), root) // v0
      DeltaWriter.write((30 until 60).toDF("k").repartition(3), root) // v1
      DeltaWriter.writeCheckpoint(spark, root, 1L) // V2 + sidecars (superseded later)
      DeltaWriter.write((60 until 90).toDF("k").repartition(3), root) // v2
      DeltaWriter.writeCheckpoint(spark, root, 2L) // newest checkpoint
      val log = new java.io.File(root, "_delta_log")
      def sidecars = new java.io.File(log, "_sidecars").listFiles()
        .count(_.getName.endsWith(".parquet"))
      val beforeSidecars = sidecars
      assert(beforeSidecars >= 8, s"expected >=8 sidecar shards, got $beforeSidecars")

      // dry run lists, deletes nothing
      val dry = DeltaMaintenance.cleanupLogs(spark, root, retentionHours = 0, dryRun = true)
      assert(dry.dryRun && dry.deletedCommits == Seq(0L, 1L))
      assert(sidecars == beforeSidecars)
      // within retention: nothing eligible
      assert(DeltaMaintenance.cleanupLogs(spark, root, retentionHours = 24)
        .deletedCommits.isEmpty)

      val res = DeltaMaintenance.cleanupLogs(spark, root, retentionHours = 0)
      assert(res.deletedCommits == Seq(0L, 1L))
      assert(res.deletedCheckpoints.size == 1, res.deletedCheckpoints.toString)
      assert(res.deletedSidecars.nonEmpty && sidecars < beforeSidecars,
        "the superseded checkpoint's sidecar shards should be collected")
      // the newest checkpoint's sidecars all survive and the table reads
      assert(DeltaLog.read(spark, root).count() == 90)
      assert(DeltaLog.read(spark, root).agg(sum("k")).head.getLong(0) ==
        (0 until 90).sum.toLong)
      // time travel to a cleaned version is gone — the documented trade
      intercept[Exception] {
        DeltaLog.read(spark, root, versionAsOf = Some(0L)).count()
      }
      // a second cleanup is a no-op
      assert(DeltaMaintenance.cleanupLogs(spark, root, retentionHours = 0)
        .deletedCommits.isEmpty)
    } finally {
      spark.conf.unset("graft.delta.checkpoint.v2.threshold")
      spark.conf.unset("graft.delta.checkpoint.sidecar.files")
    }
  }

  test("vacuum prunes emptied partition dirs but never hidden dirs or the log") {
    val root = tmp()
    val df = mk(40, "a").withColumn("p", lit("old"))
    DeltaWriter.write(df, root, "append", partitionBy = Seq("p"))
    DeltaWriter.write(mk(40, "b").withColumn("p", lit("new")), root, "overwrite",
      partitionBy = Seq("p"))
    DeltaMaintenance.vacuum(spark, root, retentionHours = 0)
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!names.contains("p=old")) // emptied partition dir pruned
    assert(names.contains("p=new") && names.contains("_delta_log"))
    assert(rows(DeltaLog.read(spark, root).select("id", "s")) ==
      rows(mk(40, "b")))
  }

  test("RESTORE rewinds table state as one metadata commit, history intact") {
    import graft.sources.DeltaDvWriter
    val root = tmp() + "/t"
    DeltaWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(2), root)                                   // v0
    DeltaWriter.write(Seq((500L, "new")).toDF("id", "v"), root) // v1 append
    DeltaDvWriter.delete(spark, root, "id < 10")            // v2 DV delete
    assert(DeltaLog.read(spark, root).count() == 91)

    // restore to v0: the appended file is removed, the DV narrows away
    val res = DeltaMaintenance.restore(spark, root, 0L)
    assert(res.version == 3L && res.restoredToVersion == 0L, s"$res")
    val got = DeltaLog.read(spark, root)
    assert(got.count() == 100)
    assert(got.filter("id = 500").count() == 0)
    assert(got.filter("id < 10").count() == 10, "restore kept the DV")
    // pure metadata: every version is still time-travelable
    assert(DeltaLog.read(spark, root, versionAsOf = Some(2L)).count() == 91)
    assert(DeltaLog.read(spark, root, versionAsOf = Some(1L)).count() == 101)
    // restore FORWARD to v2 re-applies the delete + the appended file —
    // by TIMESTAMP: the newest commit at/before "now" IS v3 (the restore
    // itself), so aim just above v2's commit time
    val v2ts = spark.read.json(spark.createDataset(Seq(logText(root, 2L)
      .linesIterator.toSeq.head))(org.apache.spark.sql.Encoders.STRING))
      .select("commitInfo.timestamp").collect().head.getLong(0)
    val fwd = DeltaMaintenance.restoreTimestamp(spark, root, v2ts)
    assert(fwd.version == 4L && fwd.restoredToVersion == 2L, s"$fwd")
    assert(DeltaLog.read(spark, root).count() == 91)
    // already-current restore is a no-op, no new version
    assert(DeltaMaintenance.restore(spark, root, 2L).version == 4L)
    // a vacuumed target refuses loudly instead of silently corrupting:
    // rewind to v0 (v1's appended file becomes unreferenced), vacuum it
    // away, then a restore to v1 must fail fast
    DeltaMaintenance.restore(spark, root, 0L)
    DeltaMaintenance.vacuum(spark, root, retentionHours = 0.0)
    intercept[IllegalArgumentException] {
      DeltaMaintenance.restore(spark, root, 1L)
    }
    assert(DeltaLog.read(spark, root).count() == 100)
  }

  test("restore with metadata drift preserves table configuration") {
    // a RESTORE past a schema change must re-emit the target version's
    // metaData WITH its configuration — emitting {} would wipe
    // delta.enableChangeDataFeed / delta.columnMapping.mode and corrupt
    // mapped tables
    val root = tmp() + "/t"
    DeltaWriter.write(mk(20, "a"), root)                               // v0
    // v1: hand-published metaData adding a table property (the shape a
    // SET TBLPROPERTIES commit leaves behind)
    val snap0 = DeltaLog.snapshot(spark, root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def jq(s: String) = mapper.writeValueAsString(s)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(DeltaWriter.tryPublish(f, root, 1L, Seq(
      """{"commitInfo":{"timestamp":2000,"operation":"SET TBLPROPERTIES"}}""",
      s"""{"metaData":{"id":${jq(snap0.tableId.get)},"format":{"provider":"parquet","options":{}},"schemaString":${
        jq(snap0.schema.json)},"partitionColumns":[],"configuration":{${
        jq("delta.enableChangeDataFeed")}:${jq("true")}},"createdTime":1}}"""),
      "cfg"))
    // v2: overwrite EVOLVING the schema — the new metaData must keep the
    // existing configuration, not reset it
    DeltaWriter.write(mk(20, "b").withColumn("extra", lit(1)), root, "overwrite")
    assert(DeltaLog.snapshot(spark, root).configuration ==
      Map("delta.enableChangeDataFeed" -> "true"),
      "evolving overwrite wiped table configuration")
    // restore to v1 (schema drifted since): configuration must survive
    val res = DeltaMaintenance.restore(spark, root, 1L)
    val after = DeltaLog.snapshot(spark, root)
    assert(res.restoredToVersion == 1L)
    assert(after.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(after.configuration == Map("delta.enableChangeDataFeed" -> "true"),
      s"restore wiped configuration: ${after.configuration}")
    assert(rows(DeltaLog.read(spark, root)) == rows(mk(20, "a")))
  }

  test("hive-escaped partition values survive overwrite, restore and checkpoint") {
    // ':' hive-escapes to %3A in partition dirs, so log paths contain a
    // literal '%'. encodePath is NOT idempotent ('%'→'%25'): re-encoding
    // a snapshot path on remove would miss the live add key (files
    // wrongly staying live) and on re-add would point at a nonexistent
    // file. Paths read from the log must be re-emitted verbatim.
    val root = tmp() + "/t"
    val orig = Seq((1, "a:b"), (2, "c=d"), (3, "a:b")).toDF("id", "p")
    DeltaWriter.write(orig, root, partitionBy = Seq("p"))              // v0
    val v0adds = DeltaLog.snapshot(spark, root).files.map(_.path).toSet
    assert(v0adds.exists(_.contains("%253A")),
      s"fixture did not produce an escaped partition dir: $v0adds")
    val over = Seq((9, "a:b")).toDF("id", "p")
    DeltaWriter.write(over, root, "overwrite", Seq("p"))               // v1
    // a double-encoded remove would leave the v0 files live → 4 rows
    assert(DeltaLog.read(spark, root).count() == 1,
      "overwrite removes missed hive-escaped live files")
    // restore to v0 re-adds the escaped paths verbatim
    DeltaMaintenance.restore(spark, root, 0L)                          // v2
    val back = DeltaLog.read(spark, root)
    assert(back.count() == 3)
    assert(back.filter("p = 'a:b'").count() == 2)
    assert(DeltaLog.snapshot(spark, root).files.map(_.path).toSet == v0adds)
    // a checkpoint must also carry the paths verbatim — replay through it
    DeltaWriter.writeCheckpoint(spark, root, 2L)
    val viaCp = DeltaLog.snapshot(spark, root)
    assert(viaCp.files.map(_.path).toSet == v0adds,
      "checkpoint double-encoded hive-escaped paths")
    assert(DeltaLog.read(spark, root).count() == 3)
    // and OPTIMIZE's removes must retire the escaped-path files
    DeltaWriter.write(Seq((4, "a:b")).toDF("id", "p"), root, partitionBy = Seq("p"))
    val opt = DeltaMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    assert(opt.filesRemoved >= 2)
    val optSnap = DeltaLog.snapshot(spark, root)
    assert(optSnap.files.count(_.path.contains("a%253A")) == 1,
      s"optimize left escaped-path files live: ${optSnap.files.map(_.path)}")
    assert(DeltaLog.read(spark, root).count() == 4)
  }

  test("history reports per-version operations") {
    val root = tmp()
    DeltaWriter.write(mk(30, "h"), root, "append")
    DeltaWriter.write(mk(30, "h2"), root, "append")
    DeltaMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    val h = DeltaMaintenance.history(spark, root)
      .select("version", "operation").as[(Long, String)].collect().toMap
    assert(h(0L) == "WRITE" && h(1L) == "WRITE" && h(2L) == "OPTIMIZE")
  }

  test("declarative delta sink: zorder_by clusters, optimize_after compacts") {
    val root = tmp()
    val df = spark.range(1000).select(
      $"id".cast("int").as("id"), concat(lit("z"), $"id").as("s"),
      (rand(3) * 100).cast("int").as("a"))
    graft.sources.Sources.writeWithStats(df.repartition(5), root,
      graft.sources.Sources.WriteConfig(format = "delta", mode = "overwrite",
        zorderBy = Seq("a")))
    assert(DeltaLog.read(spark, root).count() == 1000)

    val root2 = tmp()
    graft.sources.Sources.writeWithStats(df.repartition(5), root2,
      graft.sources.Sources.WriteConfig(format = "delta", mode = "overwrite",
        options = Map("optimize_after" -> "true")))
    val snap = DeltaLog.snapshot(spark, root2)
    assert(snap.files.size == 1) // compacted post-commit
    assert(DeltaLog.read(spark, root2).count() == 1000)
    val h = DeltaMaintenance.history(spark, root2)
      .select("operation").as[String].collect().toSeq
    assert(h.contains("OPTIMIZE"))

    // zorder_by + partition_by now compose (clusters within partitions)
    val root3 = tmp()
    graft.sources.Sources.writeWithStats(
      df.withColumn("day", concat(lit("d"), $"id" % 2)).repartition(5), root3,
      graft.sources.Sources.WriteConfig(format = "delta", mode = "overwrite",
        partitionBy = Seq("day"), zorderBy = Seq("a"),
        coalescePartitions = Some(8)))
    val snap3 = DeltaLog.snapshot(spark, root3)
    assert(snap3.partitionColumns == Seq("day"))
    assert(DeltaLog.read(spark, root3).count() == 1000)
    val pr = DeltaStats.prune(spark, snap3,
      col("day") === "d0" && col("a") < 10)
    assert(pr.kept < pr.candidates,
      s"partitioned declarative zorder must skip: ${pr.kept}/${pr.candidates}")
  }

  test("Tools delta verbs: optimize, history, vacuum dry-run, restore") {
    val root = tmp()
    (0 until 3).foreach(i => DeltaWriter.write(mk(20, s"t$i"), root, "append"))
    assert(Tools.mainExit(Array("delta", "optimize", root)) == 0)
    assert(Tools.mainExit(Array("delta", "history", root)) == 0)
    assert(Tools.mainExit(Array("delta", "vacuum", root, "--retention-hours", "0",
      "--dry-run")) == 0)
    assert(DeltaLog.snapshot(spark, root).files.size == 1)
    // restore by version, then by timestamp ("now" resolves the latest
    // version — a no-op restore); malformed args exit with usage
    assert(Tools.mainExit(Array("delta", "restore", root, "0")) == 0)
    assert(DeltaLog.read(spark, root).count() == 20)
    assert(Tools.mainExit(Array("delta", "restore", root, "--timestamp-ms",
      System.currentTimeMillis().toString)) == 0)
    assert(Tools.mainExit(Array("delta", "restore", root, "--oops", "1")) == 2)
  }

  test("Tools delta merge verb honors --schema-mode evolve") {
    val root = tmp()
    DeltaWriter.write(mk(10, "m"), root, "append")
    val srcDir = tmp()
    mk(5, "u").withColumn("extra", lit(7)).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    // enforce (default) drops the new column; evolve widens
    assert(Tools.mainExit(Array("delta", "merge", root,
      "--keys", "id", "--from", srcDir)) == 0)
    assert(DeltaLog.snapshot(spark, root).schema.fieldNames.toSeq == Seq("id", "s"))
    assert(Tools.mainExit(Array("delta", "merge", root,
      "--keys", "id", "--from", srcDir, "--schema-mode", "evolve")) == 0)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
    assert(DeltaLog.read(spark, root).filter("extra = 7").count() == 5)
    // bad policy values exit with usage, unknown args too
    assert(Tools.mainExit(Array("delta", "merge", root, "--keys", "id",
      "--from", srcDir, "--schema-mode", "bogus")) == 2)
    assert(Tools.mainExit(Array("delta", "merge", root, "--keys", "id",
      "--from", srcDir, "--nope", "1")) == 2)
  }
}
