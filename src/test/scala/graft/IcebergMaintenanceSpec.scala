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
}
