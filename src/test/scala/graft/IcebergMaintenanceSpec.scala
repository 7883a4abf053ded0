package graft

import java.nio.file.Files

import graft.sources.{IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._

/**
 * Iceberg maintenance: bin-pack optimize committing a `replace`
 * snapshot (rows identical, time travel intact, incremental changes
 * silent) and snapshot expiration with orphan file cleanup.
 */
class IcebergMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("icemaint").toString

  test("optimize bin-packs small files; readers see identical rows; changes stay silent") {
    val root = tmp() + "/t"
    // two appends of deliberately tiny files (8 partitions each)
    IcebergSource.write((1L to 400L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(8), root, "append")
    IcebergSource.write((401L to 800L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(8), root, "append")
    val before = IcebergSource.read(spark, root)
    val beforeFiles = before.inputFiles.length
    val beforeRows = before.orderBy("id").collect().map(_.getLong(0)).toSeq
    val preSnaps = IcebergSource.snapshots(spark, root)

    val r = IcebergMaintenance.optimize(spark, root)
    assert(r.snapshotId.isDefined)
    assert(r.filesRemoved == beforeFiles && r.filesAdded < beforeFiles,
      s"removed ${r.filesRemoved}, added ${r.filesAdded}, before $beforeFiles")

    val after = IcebergSource.read(spark, root)
    assert(after.inputFiles.length == r.filesAdded)
    assert(after.orderBy("id").collect().map(_.getLong(0)).toSeq == beforeRows)

    // time travel to a pre-optimize snapshot still resolves
    assert(IcebergSource.read(spark, root,
      snapshotId = Some(preSnaps.head.snapshotId)).count() == 400)
    // the replace snapshot is invisible to incremental consumers
    val ch = IcebergSource.changes(spark, root,
      fromSnapshotId = Some(preSnaps.last.snapshotId))
    assert(ch.count() == 0, "replace snapshot must be silent in changes()")
    // idempotent: a second optimize is a no-op
    assert(IcebergMaintenance.optimize(spark, root).snapshotId.isEmpty)
  }

  test("partitioned optimize compacts within partitions and pruning still works") {
    import IcebergSource.{PartitionPredicate => PP}
    val root = tmp() + "/p"
    val df = (1 to 300).map(i => (i.toLong, Seq("US", "DE", "JP")(i % 3)))
      .toDF("id", "region")
    IcebergSource.write(df.repartition(6), root, "append", partitionBy = Seq("region"))
    IcebergSource.write(df.repartition(6), root, "append", partitionBy = Seq("region"))
    val before = IcebergSource.read(spark, root).inputFiles.length
    val r = IcebergMaintenance.optimize(spark, root)
    assert(r.snapshotId.isDefined && r.filesAdded < r.filesRemoved)
    val all = IcebergSource.read(spark, root)
    assert(all.count() == 600)
    assert(all.inputFiles.length < before)
    val us = IcebergSource.read(spark, root,
      partitionFilter = Seq(PP("region", "=", "US")))
    assert(us.inputFiles.length < all.inputFiles.length)
    assert(us.count() == 2 * (1 to 300).count(_ % 3 == 0))
    assert(us.select("region").distinct().collect().map(_.getString(0)).toSeq == Seq("US"))
  }

  test("declarative sink: optimize_after compacts the fresh load") {
    val root = tmp() + "/d"
    val df = (1L to 200L).map(i => (i, s"n$i")).toDF("id", "name").repartition(8)
    graft.sources.Sources.writeWithStats(df, root, graft.sources.Sources.WriteConfig(
      format = "iceberg", mode = "append",
      options = Map("optimize_after" -> "true")))
    val snaps = IcebergSource.snapshots(spark, root)
    assert(snaps.map(_.operation) == Seq("append", "replace"))
    val read = IcebergSource.read(spark, root)
    assert(read.inputFiles.length == 1 && read.count() == 200)
  }

  test("rollback rewinds the current pointer; history and re-rollforward intact") {
    val root = tmp() + "/t"
    IcebergSource.write((0 until 50).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    IcebergSource.write((50 until 80).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    val snaps = IcebergSource.snapshots(spark, root).sortBy(_.timestampMs)
    assert(IcebergSource.read(spark, root).count() == 80)

    val v = IcebergMaintenance.rollback(spark, root, snaps.head.snapshotId)
    assert(IcebergSource.read(spark, root).count() == 50)
    // every snapshot still in history: time travel + roll FORWARD work
    assert(IcebergSource.read(spark, root,
      snapshotId = Some(snaps(1).snapshotId)).count() == 80)
    val v2 = IcebergMaintenance.rollback(spark, root, snaps(1).snapshotId)
    assert(v2 == v + 1)
    assert(IcebergSource.read(spark, root).count() == 80)
    // already-current rollback is a no-op; unknown snapshot fails fast
    assert(IcebergMaintenance.rollback(spark, root, snaps(1).snapshotId) == v2)
    intercept[IllegalArgumentException] {
      IcebergMaintenance.rollback(spark, root, 424242L)
    }
    // a later APPEND lands on the rolled-to state
    IcebergSource.write(Seq((900L, "c")).toDF("id", "v"), root)
    assert(IcebergSource.read(spark, root).count() == 81)
  }

  test("expireSnapshots drops aged history and reclaims unreferenced files") {
    val root = tmp() + "/e"
    IcebergSource.write(Seq((1L, "a")).toDF("id", "name"), root, "append")
    IcebergSource.write(Seq((2L, "b")).toDF("id", "name"), root, "append")
    // overwrite: files of snapshots 1-2 become unreferenced by current
    IcebergSource.write(Seq((9L, "z")).toDF("id", "name"), root, "overwrite")
    assert(IcebergSource.snapshots(spark, root).size == 3)

    val dry = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1,
      dryRun = true)
    assert(dry.dryRun && dry.expiredSnapshots.size == 2 && dry.deletedFiles.nonEmpty)
    // dry run deleted nothing
    assert(IcebergSource.snapshots(spark, root).size == 3)

    val r = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(r.expiredSnapshots == dry.expiredSnapshots)
    assert(IcebergSource.snapshots(spark, root).size == 1)
    // current data intact, expired files gone from disk
    assert(IcebergSource.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(9L))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    r.deletedFiles.foreach(p =>
      assert(!f.exists(new org.apache.hadoop.fs.Path(p)), s"still exists: $p"))
    // nothing more to expire
    assert(IcebergMaintenance.expireSnapshots(spark, root).expiredSnapshots.isEmpty)
  }

  test("transform-spec maintenance: bin-pack + expiry over a day+bucket v2 table") {
    import IcebergSource.{PartitionPredicate => PP}
    val root = tmp() + "/tr"
    val rows = for {
      day <- Seq("2024-01-01", "2024-01-02")
      i <- 1 to 60
    } yield (i, java.sql.Date.valueOf(day), s"p$i")
    graft.sources.IcebergTestTables.writeDayBucketTable(spark, root, rows)

    val before = IcebergSource.read(spark, root)
    val beforeFiles = before.inputFiles.length
    val beforeRows = before.orderBy("id", "ts").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString)).toSeq
    assert(beforeRows.size == 120)
    assert(beforeFiles > 8, s"fixture should spread files, got $beforeFiles")
    // the transform spec prunes BEFORE maintenance (fixture is conformant)
    val day1 = java.sql.Date.valueOf("2024-01-01").toLocalDate.toEpochDay
    val oneDay = IcebergSource.read(spark, root,
      partitionFilter = Seq(PP("ts_day", "=", day1)))
    assert(oneDay.count() == 60 && oneDay.inputFiles.length < beforeFiles)

    // bin-pack: rows identical, fewer files, tuples preserved → pruning
    // still works after the rewrite
    val r = IcebergMaintenance.optimize(spark, root)
    assert(r.snapshotId.isDefined, "transform-spec optimize must compact")
    val after = IcebergSource.read(spark, root)
    assert(after.inputFiles.length < beforeFiles)
    assert(after.orderBy("id", "ts").collect()
      .map(x => (x.getInt(0), x.getDate(1).toString)).toSeq == beforeRows)
    val oneDayAfter = IcebergSource.read(spark, root,
      partitionFilter = Seq(PP("ts_day", "=", day1)))
    assert(oneDayAfter.count() == 60)
    assert(oneDayAfter.inputFiles.length < after.inputFiles.length,
      "day pruning lost after transform-spec optimize")

    // expiry over the transform table drops the pre-optimize snapshot
    // and reclaims its compacted-away files
    val e = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(e.expiredSnapshots.size == 1 && e.deletedFiles.nonEmpty)
    assert(IcebergSource.read(spark, root).count() == 120)
    assert(IcebergSource.snapshots(spark, root).size == 1)
  }

  test("cleanupMetadata retires old vN.metadata.json; reads and streams stay green") {
    val root = tmp()
    // 50 commits -> v1..v50 metadata files accumulate
    (0 until 50).foreach(i =>
      IcebergSource.write(Seq((i.toLong, s"r$i")).toDF("k", "v"), root,
        mode = "append"))
    val metaDir = new java.io.File(root, "metadata")
    def metaFiles(): Seq[String] = metaDir.listFiles()
      .map(_.getName).filter(n => n.matches("v\\d+\\.metadata\\.json")).toSeq
    assert(metaFiles().size == 50)
    // a stream consumes part of the backlog BEFORE cleanup (its base and
    // cursor pin SNAPSHOT ids, which live in the current metadata)
    val out = Files.createTempDirectory("icemaint_out").toString
    val cp = Files.createTempDirectory("icemaint_cp").toString
    def start() = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 50)

    val dry = IcebergMaintenance.cleanupMetadata(spark, root, keepLast = 5,
      dryRun = true)
    assert(dry.size == 45 && metaFiles().size == 50, "dry run must not delete")
    val deleted = IcebergMaintenance.cleanupMetadata(spark, root, keepLast = 5)
    assert(deleted.size == 45, s"expected 45 retired files, got ${deleted.size}")
    assert(metaFiles().map(n => n.stripPrefix("v").stripSuffix(".metadata.json")
      .toLong).sorted == (46L to 50L), s"kept ${metaFiles()}")
    // idempotent: nothing below the floor remains
    assert(IcebergMaintenance.cleanupMetadata(spark, root, keepLast = 5).isEmpty)
    // full snapshot history survives in the current metadata
    val meta = IcebergSource.tableMeta(spark, root)
    assert(meta.snapshots.size == 50)
    assert(IcebergSource.read(spark, root).count() == 50)
    // time travel to any retained SNAPSHOT still works
    val firstSnap = meta.snapshots.minBy(_.timestampMs)
    assert(IcebergSource.read(spark, root,
      snapshotId = Some(firstSnap.snapshotId)).count() == 1)
    // the stream resumes across the cleanup and drains only new commits
    IcebergSource.write(Seq((100L, "new")).toDF("k", "v"), root, mode = "append")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 51,
      "stream restart across metadata GC duplicated or dropped rows")
    // a stale version-hint pointing at a retired file still resolves
    // (advisory hint; readers fall back to the directory scan)
    val hint = new java.io.File(metaDir, "version-hint.text")
    java.nio.file.Files.write(hint.toPath, "3".getBytes("UTF-8"))
    new java.io.File(metaDir, ".version-hint.text.crc").delete()
    assert(IcebergSource.read(spark, root).count() == 51)
  }

  test("renameColumn: metadata-only rename; old files resolve by historical alias") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    IcebergSource.delete(spark, root, "k = 2") // MOR deletes stay live
    val ver = IcebergMaintenance.renameColumn(spark, root, "v", "label")
    assert(ver > 0)
    // the current read serves the NEW name; the pre-rename file's bytes
    // (written under 'v', no footer field ids) resolve through the alias
    val got = IcebergSource.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "label"), got.columns.mkString(","))
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a")))
    // appends under the new name coexist with old-name files
    IcebergSource.write(Seq((3L, "c")).toDF("k", "label"), root, mode = "append")
    assert(IcebergSource.read(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    // filters on the renamed column stay correct across both file kinds
    assert(IcebergSource.read(spark, root,
        dataFilter = Some(col("label") === "a"))
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    // the changelog serves the current name end-to-end
    val ch = IcebergSource.changes(spark, root)
    assert(ch.columns.contains("label") && !ch.columns.contains("v"))
    assert(ch.filter(col("_change_type") === "insert").count() == 3)
    // renaming onto a FORMER name of a DIFFERENT field refuses: those
    // footer-id-less historical files would become ambiguous
    IcebergMaintenance.renameColumn(spark, root, "k", "id")
    val e = intercept[IllegalArgumentException] {
      IcebergMaintenance.renameColumn(spark, root, "label", "k")
    }
    assert(e.getMessage.contains("different field"), e.getMessage)
    assert(IcebergSource.read(spark, root).columns.toSeq == Seq("id", "label"))
  }

  test("pre-rename equality-deletes and compaction stay correct after a rename") {
    val root = tmp()
    IcebergSource.write((1L to 10L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(2), root)
    // equality delete KEYED ON v, its delete file written under the
    // ORIGINAL column name
    val res = IcebergSource.deleteKeys(spark, root,
      Seq("n3", "n7").toDF("v"), Seq("v"))
    assert(res.deletedRows > 0)
    IcebergMaintenance.renameColumn(spark, root, "v", "label")
    val expect = (1L to 10L).filterNot(i => i == 3 || i == 7)
      .map(i => (i, s"n$i")).toSet
    // the delete file's parquet column is still 'v' -- it must resolve
    assert(IcebergSource.read(spark, root).as[(Long, String)]
      .collect().toSet == expect)
    // MOR compaction after the rename lifts the deletes AND materializes
    // the renamed column from old-name files (a current-name-only scan
    // would permanently rewrite it as null)
    val opt = IcebergMaintenance.optimize(spark, root)
    assert(opt.snapshotId.isDefined, s"optimize should purge deletes: $opt")
    val after = IcebergSource.read(spark, root)
    assert(after.columns.toSeq == Seq("k", "label"))
    assert(after.as[(Long, String)].collect().toSet == expect,
      "compaction nulled or lost the renamed column")
    // a widening append cannot reclaim the FORMER name: old files would
    // serve the renamed field's bytes under the new column
    val e = intercept[IllegalArgumentException] {
      IcebergSource.write(
        (11L to 12L).map(i => (i, s"n$i", 1.0)).toDF("k", "label", "v"),
        root, mode = "append",
        schemaPolicy = graft.sources.DeltaSchema.Evolve)
    }
    assert(e.getMessage.contains("previously used"), e.getMessage)
  }

  test("dropColumn: metadata-only narrow; burned names stay unreclaimable") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "w"),
      root)
    IcebergMaintenance.dropColumn(spark, root, "w")
    val got = IcebergSource.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "v"), got.columns.mkString(","))
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // appends continue under the narrowed schema
    IcebergSource.write(Seq((3L, "c")).toDF("k", "v"), root, mode = "append")
    assert(IcebergSource.read(spark, root).count() == 3)
    // the dropped name cannot be reclaimed by a widening append: the old
    // files' physical 'w' bytes would surface under the new field
    val e = intercept[IllegalArgumentException] {
      IcebergSource.write(Seq((4L, "d", true)).toDF("k", "v", "w"), root,
        mode = "append", schemaPolicy = graft.sources.DeltaSchema.Evolve)
    }
    assert(e.getMessage.contains("previously used"), e.getMessage)
    // guards: unknown column; a partition-source column cannot drop
    intercept[IllegalArgumentException] {
      IcebergMaintenance.dropColumn(spark, root, "nope")
    }
    val root2 = tmp()
    IcebergSource.write(Seq((1L, "x")).toDF("d", "v"), root2,
      partitionBy = Seq("d"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergMaintenance.dropColumn(spark, root2, "d")
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)
  }

  test("zorder optimize clusters files; 2-D predicates admit fewer files") {
    val root = tmp() + "/t"
    // interleaved layout: every random-split file spans the FULL x/y
    // range, so bounds-based skipping starts out powerless
    val df = (0 until 4096).map(i => (i.toLong, i % 64, i / 64))
      .toDF("id", "x", "y")
    IcebergSource.write(df.repartition(8), root, "append")
    val pred = col("x") < 8 && col("y") < 8
    val before = IcebergSource.pruneReport(spark, root, pred)
    assert(before.kept == before.candidates, s"$before")
    val expected = IcebergSource.read(spark, root)
      .as[(Long, Int, Int)].collect().toSet

    val r = IcebergMaintenance.optimize(spark, root,
      targetFileBytes = 16L << 10, zorderBy = Seq("x", "y"))
    assert(r.snapshotId.isDefined && r.filesRemoved == 8, r.toString)
    assert(r.filesAdded >= 2, s"need multiple clustered outputs: $r")
    // rows conserved exactly
    assert(IcebergSource.read(spark, root)
      .as[(Long, Int, Int)].collect().toSet == expected)
    // the point: the 2-D predicate now admits FEWER files via manifest
    // bounds, and the filtered read stays exact
    val after = IcebergSource.pruneReport(spark, root, pred)
    assert(after.kept < after.candidates,
      s"z-order must enable 2-D skipping: $after")
    assert(IcebergSource.read(spark, root, dataFilter = Some(pred))
      .count() == 64)
    // the clustering is recorded as the DEFAULT sort order and survives
    // subsequent commits (round-tripped by the writer)
    def sortOrder() = {
      val m = IcebergSource.tableMeta(spark, root)
      (m.defaultSortOrderId, m.sortOrdersJson.map(_.toString).mkString(","))
    }
    val (oid, os) = sortOrder()
    assert(oid == 1, s"default-sort-order-id: $oid")
    assert(os.contains("\"order-id\":1") && os.contains("identity"), os)
    IcebergSource.write(Seq((9999L, 1, 1)).toDF("id", "x", "y"), root,
      mode = "append")
    val (oid2, os2) = sortOrder()
    assert(oid2 == 1 && os2.contains("\"order-id\":1"),
      s"sort order lost on append: $oid2 / $os2")
  }

  test("zorder on an identity-partition column fails fast") {
    val root = tmp() + "/t"
    IcebergSource.write((1 to 100).map(i => (i.toLong, s"r${i % 3}", i))
      .toDF("id", "region", "v"), root, "append",
      partitionBy = Seq("region"))
    val e = intercept[IllegalArgumentException] {
      IcebergMaintenance.optimize(spark, root, zorderBy = Seq("region"))
    }
    assert(e.getMessage.contains("identity-partition"), e.getMessage)
  }

  test("write.metadata.previous-versions-max trims metadata at every commit") {
    val root = tmp()
    def metaFiles() = new java.io.File(root, "metadata").listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json")).map(_.getName).sorted
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    IcebergMaintenance.setProperties(spark, root,
      Map("write.metadata.previous-versions-max" -> "3"))
    // 2N+ commits after configuring N=3: the unattended-writer scenario
    (2L to 9L).foreach(i =>
      IcebergSource.write(Seq((i, s"v$i")).toDF("k", "v"), root,
        mode = "append"))
    assert(metaFiles().length <= 4, metaFiles().mkString(",")) // N+1
    // the property itself survives commit round-trips
    assert(IcebergSource.tableMeta(spark, root).properties
      .get("write.metadata.previous-versions-max").contains("3"))
    // reads serve everything; history (snapshots) is untouched by the
    // METADATA-file trim
    assert(IcebergSource.read(spark, root).count() == 9)
    assert(IcebergSource.tableMeta(spark, root).snapshots.size == 9)
    // maintenance commits funnel through the same enforcement
    IcebergMaintenance.renameColumn(spark, root, "v", "label")
    assert(metaFiles().length <= 4, metaFiles().mkString(","))
    assert(IcebergSource.read(spark, root).columns.toSeq == Seq("k", "label"))
    // a pinned stream over the table still drains: bases/cursors key on
    // SNAPSHOT ids, which resolve from current metadata
    val q = spark.readStream.format("graft-iceberg").load(root)
      .writeStream.format("memory").queryName("ipvm")
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ipvm").count() == 9)
    } finally q.stop()
  }

  test("setProperties validates retention values BEFORE committing") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    val vBefore = IcebergSource.tableMeta(spark, root).version
    val e1 = intercept[IllegalArgumentException](
      IcebergMaintenance.setProperties(spark, root,
        Map("write.metadata.previous-versions-max" -> "0")))
    assert(e1.getMessage.contains(">= 1"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergMaintenance.setProperties(spark, root,
        Map("write.metadata.previous-versions-max" -> "3x")))
    assert(e2.getMessage.contains("integer"), e2.getMessage)
    // nothing committed, and FOREIGN garbage in the property (simulated
    // via a valid commit then checking the writer path tolerates it)
    assert(IcebergSource.tableMeta(spark, root).version == vBefore)
    // a table whose property is garbage (foreign-written) must not make
    // later commits look failed — the trim silently disables
    IcebergMaintenance.setProperties(spark, root, Map("owner" -> "t"))
    IcebergSource.write(Seq((2L, "b")).toDF("k", "v"), root, mode = "append")
    assert(IcebergSource.read(spark, root).count() == 2)
  }

  test("a rename accompanied by a TYPE change fails loudly, never nulls") {
    val root = tmp()
    IcebergSource.write(Seq((1L, "a")).toDF("k", "v"), root)
    IcebergMaintenance.renameColumn(spark, root, "k", "id")
    // a FOREIGN writer retypes the renamed column (this repo's own ops
    // refuse retypes): reading old-name files at the promoted type would
    // throw in the parquet reader — or worse, misread — so the alias
    // resolver must refuse up front with an actionable message
    val metaDir = new java.io.File(root, "metadata")
    val latest = metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(latest)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val curId = node.get("current-schema-id").asInt()
    import scala.jdk.CollectionConverters._
    node.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() == curId).get
      .get("fields").elements().asScala
      .find(_.get("name").asText() == "id").get
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("type", "string")
    java.nio.file.Files.write(latest.toPath, mapper.writeValueAsBytes(node))
    new java.io.File(metaDir, s".${latest.getName}.crc").delete()
    val e = intercept[IllegalArgumentException] {
      IcebergSource.read(spark, root).collect()
    }
    assert(e.getMessage.contains("changed type"), e.getMessage)
  }
}
