package graft

import java.nio.file.Files

import graft.sources.{IcebergMaintenance, IcebergSource}
import org.apache.spark.sql.functions._

/**
 * Position-delete WRITE + merge-on-read compaction: deletes commit as
 * spec-v2 delete files (content=1 manifests), the repo's own reader
 * applies them sequence-aware, stacked deletes compose, partition
 * pruning still loads the (unpartitioned-tuple) delete manifests, and
 * optimize purges deletes for compacted files while carrying the delete
 * manifests kept files still need.
 */
class IcebergDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iceberg_del").toString + "/t"

  private def dataParquets(root: String): Set[String] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(root, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  test("append schema evolution: new field ids, equality deletes keep resolving") {
    import graft.sources.DeltaSchema
    val root = tmp()
    IcebergSource.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    val m0 = IcebergSource.tableMeta(spark, root)
    assert(m0.lastColumnId == 2)

    // enforce refuses; evolve widens IN the append commit
    intercept[IllegalArgumentException] {
      IcebergSource.write(Seq((100L, "n", 1.5)).toDF("id", "v", "score"), root)
    }
    IcebergSource.write((100 until 110).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "v", "score"), root, schemaPolicy = DeltaSchema.Evolve)
    val m1 = IcebergSource.tableMeta(spark, root)
    assert(m1.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(m1.lastColumnId == 3, s"last-column-id ${m1.lastColumnId}")
    // existing ids untouched, the new field continues the sequence, the
    // prior schema entry is retained (spec: old snapshots keep theirs)
    val ids = m1.schemaJson.get("fields").elements()
    import scala.jdk.CollectionConverters._
    assert(ids.asScala.map(fd =>
      fd.get("name").asText() -> fd.get("id").asInt()).toSeq ==
      Seq("id" -> 1, "v" -> 2, "score" -> 3))
    val raw = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(m1.metadataPath)), "UTF-8"))
    assert(raw.get("schemas").size() == 2)
    assert(raw.get("current-schema-id").asInt() == 1)
    // old rows read the evolved column as null
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 110)
    assert(got.filter("id = 5").collect().head.isNullAt(2))
    assert(got.filter("id = 105").collect().head.getDouble(2) == 52.5)

    // equality delete on a PRE-evolution key id still resolves — the
    // evolution never renumbered field 1 — and hits old and new rows
    IcebergSource.deleteKeys(spark, root,
      Seq(5L, 105L).toDF("id"), Seq("id"))
    val afterDel = IcebergSource.read(spark, root)
    assert(afterDel.count() == 108)
    assert(afterDel.filter("id in (5, 105)").count() == 0)

    // MOR compaction keeps the evolved schema and the surviving rows
    IcebergMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    val afterOpt = IcebergSource.read(spark, root)
    assert(afterOpt.columns.toSeq == Seq("id", "v", "score"))
    assert(afterOpt.count() == 108)
    assert(afterOpt.filter("score is null").count() == 99)

    // a LATER plain append must keep the evolved schemas array intact
    // (regression: appends used to re-emit current-schema-id 0)
    IcebergSource.write(Seq((200L, "z", 9.0)).toDF("id", "v", "score"), root)
    assert(IcebergSource.read(spark, root).count() == 109)
    // missing-column append under evolve null-fills
    IcebergSource.write(Seq((201L, "y")).toDF("id", "v"), root,
      schemaPolicy = DeltaSchema.Evolve)
    assert(IcebergSource.read(spark, root).filter("id = 201")
      .collect().head.isNullAt(2))
  }

  test("position delete: no data file rewritten, reader drops the rows") {
    val root = tmp()
    IcebergSource.write((0 until 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "m").repartition(4), root)
    val before = dataParquets(root)

    val res = IcebergSource.delete(spark, root, "m = 3")
    assert(res.deletedRows == 100 && res.snapshotId.nonEmpty, s"$res")
    // data files untouched; only NEW delete parquet files appeared
    assert(before.subsetOf(dataParquets(root)), "delete rewrote data files")
    assert((dataParquets(root) -- before).nonEmpty, "no delete file written")

    val got = IcebergSource.read(spark, root)
    assert(got.count() == 900)
    assert(got.filter("m = 3").count() == 0)
    // time travel to the pre-delete snapshot still sees everything
    val first = IcebergSource.snapshots(spark, root).head
    assert(IcebergSource.read(spark, root,
      snapshotId = Some(first.snapshotId)).count() == 1000)
  }

  test("position-delete files carry the spec's reserved parquet field ids") {
    val root = tmp()
    IcebergSource.write((0 until 100).map(i => (i.toLong, i % 10)).toDF("id", "m"), root)
    val before = dataParquets(root)
    IcebergSource.delete(spark, root, "m = 0")
    val delFile = (dataParquets(root) -- before).head
    // conformant engines resolve delete columns BY FIELD ID
    // (file_path = 2147483546, pos = 2147483545), not by name
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(delFile), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fields = try r.getFileMetaData.getSchema.getFields finally r.close()
    import scala.jdk.CollectionConverters._
    val ids = fields.asScala.map(f => f.getName -> Option(f.getId).map(_.intValue())).toMap
    assert(ids("file_path").contains(2147483546))
    assert(ids("pos").contains(2147483545))
  }

  test("reader applies a delete file carrying the optional row payload column") {
    // The v2 spec lets a writer append a `row` column (the deleted row's
    // values) after file_path/pos. The r18 explicit read schema must
    // project it away, not choke on it — rewrite a delete file with the
    // extra column in place and re-read.
    val root = tmp()
    IcebergSource.write((0 until 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "m").repartition(4), root)
    val before = dataParquets(root)
    IcebergSource.delete(spark, root, "m = 3")
    val delFile = (dataParquets(root) -- before).head
    val widened = spark.read.parquet(delFile)
      .withColumn("row", concat(lit("payload-"), col("pos")))
    val staging = java.nio.file.Files.createTempDirectory("posrow").toString + "/out"
    widened.coalesce(1).write.parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(delFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar of the replaced file — the new
    // bytes no longer match the stale .crc
    val delPath = java.nio.file.Paths.get(delFile)
    java.nio.file.Files.deleteIfExists(
      delPath.resolveSibling("." + delPath.getFileName + ".crc"))
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 900)
    assert(got.filter("m = 3").count() == 0)
  }

  test("partitioned delete manifests reference an UNPARTITIONED spec") {
    val root = tmp()
    IcebergSource.write((0 until 300).map(i => (i.toLong, 1.0 * i, i % 3))
      .toDF("id", "price", "bucket").repartition(3), root,
      partitionBy = Seq("bucket"))
    IcebergSource.delete(spark, root, "id % 10 = 0")
    // the metadata now registers an empty-fields spec alongside spec 0,
    // and deletes still apply through the reader
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new java.io.File(root, "metadata")
    val latest = metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(latest)
    import scala.jdk.CollectionConverters._
    val specs = node.get("partition-specs").elements().asScala.toSeq
    assert(specs.exists(s => s.get("fields").size() == 0),
      "no unpartitioned spec registered for delete manifests")
    assert(node.get("default-spec-id").asInt() == 0, "default spec changed")
    assert(IcebergSource.read(spark, root).count() == 270)
    // unpartitioned tables keep using spec 0 directly (no extra spec)
    val root2 = tmp()
    IcebergSource.write((0 until 50).map(i => (i.toLong, i)).toDF("id", "m"), root2)
    IcebergSource.delete(spark, root2, "m < 5")
    val latest2 = new java.io.File(root2, "metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val node2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(latest2)
    assert(node2.get("partition-specs").size() == 1)
  }

  test("equality delete: key-scoped, scan-free, re-inserts survive") {
    val root = tmp()
    IcebergSource.write((0 until 200).map(i => (i.toLong, s"v$i", i % 4))
      .toDF("id", "v", "m").repartition(2), root)
    val before = dataParquets(root)

    // delete two keys WITHOUT scanning the table
    val res = IcebergSource.deleteKeys(spark, root,
      Seq(10L, 20L, 9999L).toDF("id"), Seq("id"))
    assert(res.deletedRows == 3 && res.snapshotId.nonEmpty, s"$res")
    assert(before.subsetOf(dataParquets(root)), "equality delete rewrote data")
    val delFile = (dataParquets(root) -- before).head
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 198)
    assert(got.filter("id in (10, 20)").count() == 0)

    // a LATER append re-inserting key 10 SURVIVES: equality deletes bind
    // only to data sequences STRICTLY BELOW their own
    IcebergSource.write(Seq((10L, "reborn", 0)).toDF("id", "v", "m"), root)
    val after = IcebergSource.read(spark, root)
    assert(after.count() == 199)
    assert(after.filter("id = 10").collect().map(_.getString(1)).toSeq == Seq("reborn"))

    // the delete file resolves by the TABLE's field id for `id`
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(delFile), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fields = try r.getFileMetaData.getSchema.getFields finally r.close()
    import scala.jdk.CollectionConverters._
    assert(fields.asScala.exists(f =>
      f.getName == "id" && Option(f.getId).exists(_.intValue() == 1)))

    // equality + position deletes stack; MOR optimize purges both
    IcebergSource.delete(spark, root, "m = 3")
    val live = IcebergSource.read(spark, root)
    val expect = live.count()
    val opt = IcebergMaintenance.optimize(spark, root, targetFileBytes = 512L << 20)
    assert(opt.snapshotId.nonEmpty)
    val compacted = IcebergSource.read(spark, root)
    assert(compacted.count() == expect)
    assert(compacted.filter("id in (10, 20)").collect()
      .map(_.getString(1)).toSeq == Seq("reborn"))
  }

  test("detect_deletes_eq transformer: vanished keys land as equality deletes") {
    graft.core.StandardTransformers.registerAll
    val root = tmp()
    IcebergSource.write((1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v"), root)
    val before = dataParquets(root)
    val source = (1 to 10).filterNot(i => i == 3 || i == 7)
      .map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = graft.core.TransformerRegistry.get("detect_deletes_eq").get
    val out = t(graft.core.EngineContext(source),
      Map("target_path" -> root, "keys" -> Seq("k")))
    assert(out.count() == 8)
    assert(out.filter(col("k").isin(3L, 7L)).count() == 0)
    assert(before.subsetOf(dataParquets(root)), "transformer rewrote data files")
    // threshold guard still applies
    intercept[graft.operators.DeleteDetection.DeleteThresholdExceeded] {
      t(graft.core.EngineContext(source.limit(1)),
        Map("target_path" -> root, "keys" -> Seq("k"),
          "max_delete_fraction" -> 0.5))
    }
  }

  test("incremental changes attribute row-level delete snapshots") {
    val root = tmp()
    IcebergSource.write((0 until 100).map(i => (i.toLong, s"v$i", i % 5))
      .toDF("id", "v", "m"), root)
    // snapshot 2: position-delete m=0 (20 rows); snapshot 3: equality-
    // delete two keys (one already position-deleted — must NOT re-count)
    IcebergSource.delete(spark, root, "m = 0")
    IcebergSource.deleteKeys(spark, root, Seq(5L, 7L).toDF("id"), Seq("id"))
    val snaps = IcebergSource.snapshots(spark, root).sortBy(_.timestampMs)
    val ch = IcebergSource.changes(spark, root)
    def rowsOf(ord: Int, ct: String): Set[Long] =
      ch.filter(col("_change_ordinal") === ord && col("_change_type") === ct)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(rowsOf(1, "insert") == (0L until 100L).toSet)
    assert(rowsOf(2, "delete") == (0L until 100L).filter(_ % 5 == 0).toSet)
    // id=5 was already dead at snapshot 2; only id=7 is deleted at 3
    assert(rowsOf(3, "delete") == Set(7L), s"got ${rowsOf(3, "delete")}")
    assert(ch.filter("_change_type = 'delete' and _change_ordinal = 3")
      .count() == 1)
    // the exclusive cursor still works across delete snapshots
    val tail = IcebergSource.changes(spark, root,
      fromSnapshotId = Some(snaps(1).snapshotId))
    assert(tail.select("_change_ordinal").distinct().count() == 1)
    assert(tail.filter("_change_type = 'delete'").select("id")
      .collect().map(_.getLong(0)).toSet == Set(7L))
  }

  test("stacked deletes compose; re-delete is a no-op") {
    val root = tmp()
    IcebergSource.write((0 until 500).map(i => (i.toLong, i % 5)).toDF("id", "m"), root)
    assert(IcebergSource.delete(spark, root, "m = 0").deletedRows == 100)
    assert(IcebergSource.delete(spark, root, "m = 1").deletedRows == 100)
    // rows already position-deleted must not match again
    val again = IcebergSource.delete(spark, root, "m <= 1")
    assert(again.deletedRows == 0 && again.snapshotId.isEmpty, s"$again")
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 300 && got.filter("m <= 1").count() == 0)
  }

  test("deletes against a partitioned spec; pruning keeps them applied") {
    val root = tmp()
    val df = (0 until 600).map(i => (i.toLong, 100.0 + i, s"P${i % 3}"))
      .toDF("id", "price", "status")
    IcebergSource.write(df.coalesce(2), root, partitionBy = Seq("status"))
    val res = IcebergSource.delete(spark, root, "status = 'P1' AND price > 400")
    val gone = df.filter("status = 'P1' AND price > 400").count()
    assert(res.deletedRows == gone)
    assert(IcebergSource.read(spark, root).count() == 600 - gone)
    // a partition-pruned read of the DELETED partition must still apply
    // the delete files (their manifest carries no partition summaries)
    val pruned = IcebergSource.read(spark, root, partitionFilter =
      Seq(IcebergSource.PartitionPredicate("status", "=", "P1")))
    assert(pruned.count() == 200 - gone, "pruned read skipped the deletes")
    // appends after a delete stay correct (delete seq < new data seq)
    IcebergSource.write(Seq((9999L, 450.0, "P1")).toDF("id", "price", "status"),
      root, "append", partitionBy = Seq("status"))
    val after = IcebergSource.read(spark, root)
    assert(after.filter("id = 9999").count() == 1,
      "older position delete wrongly bound to a newer data file")
    assert(after.count() == 600 - gone + 1)
  }

  test("partitionFilter prunes the delete's position scan") {
    val root = tmp()
    val df = (0 until 300).map(i => (i.toLong, 100.0 + i, s"P${i % 3}"))
      .toDF("id", "price", "status")
    IcebergSource.write(df.coalesce(1), root, partitionBy = Seq("status"))
    // predicate alone matches every partition; the filter scopes the
    // scan to P1, so other partitions' rows survive untouched
    val res = IcebergSource.delete(spark, root, "price > 200",
      partitionFilter = Seq(IcebergSource.PartitionPredicate("status", "=", "P1")))
    val expected = df.filter("status = 'P1' AND price > 200").count()
    assert(res.deletedRows == expected, s"$res")
    val got = IcebergSource.read(spark, root)
    assert(got.filter("status = 'P1' AND price > 200").count() == 0)
    assert(got.filter("status <> 'P1' AND price > 200").count() ==
      df.filter("status <> 'P1' AND price > 200").count())
  }

  test("merge-on-read optimize: purges compacted deletes, keeps the rest") {
    val root = tmp()
    // 3 small appends -> 3 files, then delete across them
    for (i <- 0 until 3)
      IcebergSource.write((0 until 200).map(j => ((i * 200 + j).toLong, j % 4))
        .toDF("id", "m").coalesce(1), root, if (i == 0) "overwrite" else "append")
    IcebergSource.delete(spark, root, "m = 2")
    assert(IcebergSource.read(spark, root).count() == 450)

    val res = IcebergMaintenance.optimize(spark, root)
    assert(res.snapshotId.nonEmpty && res.filesRemoved == 3 && res.filesAdded == 1,
      s"MOR optimize: $res")
    val got = IcebergSource.read(spark, root)
    assert(got.count() == 450, "optimize resurrected position-deleted rows")
    assert(got.filter("m = 2").count() == 0)
    // the replace snapshot skips the change feed like any compaction
    assert(IcebergSource.snapshots(spark, root).last.operation == "replace")
    // deletes after compaction still work
    IcebergSource.delete(spark, root, "m = 3")
    assert(IcebergSource.read(spark, root).count() == 300)
  }

  test("delete planning scan: predicate pushes into the parquet scan") {
    // the position scan is the whole distributed cost of a DELETE — the
    // predicate must reach the parquet reader as a pushed filter so row
    // groups skip, exactly like any other scan
    val root = tmp()
    IcebergSource.write((0 until 10000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v").coalesce(2), root)
    val dataF = dataParquets(root).toSeq
    val readSchema = IcebergSource.read(spark, root).schema
    val planner = spark.read.schema(readSchema).parquet(dataF: _*)
      .withColumn("_gf_pos", col("_metadata.row_index"))
      .filter(expr("v = 3"))
      .select("_gf_pos")
    val a = graft.core.PlanAudit.audit(planner)
    assert(a.pushedFilters.exists(_.contains("v")),
      s"delete predicate not pushed: ${a.pushedFilters}")
    assert(a.numCartesianProducts == 0)
  }

  test("expire keeps live delete files, drops retired ones") {
    val root = tmp()
    IcebergSource.write((0 until 300).map(i => (i.toLong, i % 3)).toDF("id", "m"), root)
    IcebergSource.delete(spark, root, "m = 0")
    val exp = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(exp.expiredSnapshots.size == 1)
    // the delete files survive (current snapshot references them)
    assert(IcebergSource.read(spark, root).count() == 200)
    assert(IcebergSource.read(spark, root).filter("m = 0").count() == 0)
  }
}
