package graft

import graft.sources.{DeltaLog, DeltaWriter, Sources}
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.Files

/**
 * Native Delta WRITER: commits published by the writer must replay
 * correctly through the native reader (and be shaped like the log a real
 * Delta writer produces — protocol/metaData at v0, stable table id,
 * remove+add overwrites, hive partition dirs with URL-encoded add.paths,
 * periodic checkpoints + `_last_checkpoint`).
 */
class DeltaWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("deltaw").toString

  private def logFiles(root: String): Seq[String] =
    new File(root, "_delta_log").listFiles().map(_.getName).toSeq.sorted

  test("append commits accumulate; read-back matches union; id stable") {
    val root = tmp()
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((3, "z")).toDF("k", "v")
    val c0 = DeltaWriter.write(a, root, mode = "append")
    val c1 = DeltaWriter.write(b, root, mode = "append")
    assert(c0.version == 0L && c1.version == 1L)
    assert(c0.rowsWritten == 2L && c1.rowsWritten == 1L)
    val got = DeltaLog.read(spark, root).as[(Int, String)].collect().toSet
    assert(got == Set((1, "x"), (2, "y"), (3, "z")))
    // table id must not change between commits (metaData only at v0)
    val s0 = DeltaLog.snapshot(spark, root, versionAsOf = Some(0L))
    val s1 = DeltaLog.snapshot(spark, root)
    assert(s0.tableId.isDefined && s0.tableId == s1.tableId)
  }

  test("overwrite removes prior files but keeps them on disk: time travel works") {
    val root = tmp()
    DeltaWriter.write(Seq((1, "old")).toDF("k", "v"), root, mode = "append")
    DeltaWriter.write(Seq((2, "new")).toDF("k", "v"), root, mode = "overwrite")
    assert(DeltaLog.read(spark, root).as[(Int, String)].collect().toSet ==
      Set((2, "new")))
    assert(DeltaLog.read(spark, root, versionAsOf = Some(0L))
      .as[(Int, String)].collect().toSet == Set((1, "old")))
    // v0's data files must still exist (Delta never deletes on overwrite)
    val v0Files = DeltaLog.snapshot(spark, root, versionAsOf = Some(0L)).files
    v0Files.foreach(f => assert(new File(root, f.path).exists(), f.path))
  }

  test("partitioned write: hive dirs, partitionValues in log, null partition") {
    val root = tmp()
    val df = Seq((1, Some("F"), 10.0), (2, Some("O"), 20.0), (3, None, 30.0))
      .toDF("id", "status", "amt")
    DeltaWriter.write(df, root, mode = "append", partitionBy = Seq("status"))
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.partitionColumns == Seq("status"))
    // every file path carries its partition dir and a matching value map
    snap.files.foreach { f =>
      assert(f.path.startsWith("status="), f.path)
      assert(f.partitionValues.contains("status"))
    }
    assert(snap.files.exists(_.partitionValues("status").isEmpty)) // the null
    val got = DeltaLog.read(spark, root)
      .select("id", "status", "amt").as[(Int, Option[String], Double)]
      .collect().toSet
    assert(got == Set((1, Some("F"), 10.0), (2, Some("O"), 20.0), (3, None, 30.0)))
    // ONE task writing MANY partition dirs (Spark reuses the task's
    // basename across dirs) must still yield unique file basenames —
    // the per-file UUID naming contract every Delta writer follows
    val root2 = tmp()
    DeltaWriter.write(df.repartition(1), root2, mode = "append",
      partitionBy = Seq("status"))
    val names2 = DeltaLog.snapshot(spark, root2).files
      .map(f => f.path.substring(f.path.lastIndexOf('/') + 1))
    assert(names2.distinct.size == names2.size && names2.size == 3, names2)
    assert(DeltaLog.read(spark, root2).count() == 3)
    // appends inherit the table partitioning when partitionBy is omitted
    DeltaWriter.write(Seq((4, Some("F"), 40.0)).toDF("id", "status", "amt"), root)
    assert(DeltaLog.read(spark, root).count() == 4)
    // non-matching explicit partitioning fails fast
    intercept[IllegalArgumentException] {
      DeltaWriter.write(df, root, mode = "append", partitionBy = Seq("id"))
    }
  }

  test("checkpoint every N commits; replay survives aged-out JSON commits") {
    val root = tmp()
    (0 until 12).foreach { i =>
      DeltaWriter.write(Seq((i, s"r$i")).toDF("k", "v"), root,
        mode = "append", checkpointInterval = 10)
    }
    val names = logFiles(root)
    assert(names.contains(f"${10L}%020d.checkpoint.parquet"), names)
    assert(names.contains("_last_checkpoint"))
    // vacuum the pre-checkpoint JSON commits: state must still reconstruct
    (0L until 10L).foreach { v =>
      assert(new File(new File(root, "_delta_log"), f"$v%020d.json").delete())
    }
    val got = DeltaLog.read(spark, root).as[(Int, String)].collect().toSet
    assert(got == (0 until 12).map(i => (i, s"r$i")).toSet)
    // and time travel to the checkpointed version itself works
    assert(DeltaLog.read(spark, root, versionAsOf = Some(10L)).count() == 11)
  }

  test("schema: append mismatch fails; overwrite evolves with new metaData") {
    val root = tmp()
    DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), root)
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((1, 2)).toDF("k", "n"), root, mode = "append")
    }
    DeltaWriter.write(Seq((1, 2)).toDF("k", "n"), root, mode = "overwrite")
    assert(DeltaLog.snapshot(spark, root).schema.fieldNames.toSeq == Seq("k", "n"))
    // old schema still readable at v0
    assert(DeltaLog.snapshot(spark, root, versionAsOf = Some(0L))
      .schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("save modes: ignore no-ops on existing, errorifexists throws") {
    val root = tmp()
    DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), root)
    val ig = DeltaWriter.write(Seq((9, "z")).toDF("k", "v"), root, mode = "ignore")
    assert(ig.rowsWritten == 0L)
    assert(DeltaLog.read(spark, root).count() == 1)
    intercept[IllegalStateException] {
      DeltaWriter.write(Seq((9, "z")).toDF("k", "v"), root, mode = "errorifexists")
    }
  }

  test("txn actions: replayed (appId, version) commits are no-ops, state survives checkpoints") {
    val root = tmp()
    val c0 = DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), root,
      txn = Some(("app", 0L)))
    assert(c0.rowsWritten == 1L)
    // replay of batch 0: must not append again
    val replay = DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), root,
      txn = Some(("app", 0L)))
    assert(replay.rowsWritten == 0L && replay.version == c0.version)
    assert(DeltaLog.read(spark, root).count() == 1)
    // next batch commits normally
    DeltaWriter.write(Seq((2, "b")).toDF("k", "v"), root, txn = Some(("app", 1L)))
    assert(DeltaLog.read(spark, root).count() == 2)
    assert(DeltaLog.snapshot(spark, root).transactions == Map("app" -> 1L))
    // txn watermarks must survive checkpointing + vacuumed JSON commits
    (2 to 10).foreach { i =>
      DeltaWriter.write(Seq((i + 1, s"x$i")).toDF("k", "v"), root,
        checkpointInterval = 10, txn = Some(("app", i.toLong)))
    }
    (0L until 10L).foreach { v =>
      assert(new File(new File(root, "_delta_log"), f"$v%020d.json").delete())
    }
    val lateReplay = DeltaWriter.write(Seq((99, "dup")).toDF("k", "v"), root,
      txn = Some(("app", 5L)))
    assert(lateReplay.rowsWritten == 0L)
    assert(DeltaLog.snapshot(spark, root).transactions("app") == 10L)
  }

  test("streaming delta sink: micro-batches append through the commit protocol") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    val root = tmp()
    val ckpt = tmp()
    val input = MemoryStream[(Int, String)](spark)
    input.addData((1, "a"), (2, "b"))
    val q = Streaming.writeStream(input.toDF().toDF("k", "v"), Some(s"$root/tbl"),
      Streaming.StreamWriteConfig("delta", "append", Some(ckpt),
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())))
    q.awaitTermination()
    input.addData((3, "c"))
    val q2 = Streaming.writeStream(input.toDF().toDF("k", "v"), Some(s"$root/tbl"),
      Streaming.StreamWriteConfig("delta", "append", Some(ckpt),
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())))
    q2.awaitTermination()
    val got = DeltaLog.read(spark, s"$root/tbl").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b"), (3, "c")))
    // each micro-batch left its txn watermark
    assert(DeltaLog.snapshot(spark, s"$root/tbl").transactions.nonEmpty)
  }

  test("declarative sink: format delta through Sources.write, read through Sources.read") {
    val root = tmp() + "/tbl"
    val df = Seq((1, "F", 10.0), (2, "O", 20.0)).toDF("id", "status", "amt")
    val rows = Sources.writeWithStats(df, root,
      Sources.WriteConfig(format = "delta", mode = "overwrite",
        partitionBy = Seq("status")))
    assert(rows == 2L)
    Sources.writeWithStats(Seq((3, "F", 30.0)).toDF("id", "status", "amt"),
      root, Sources.WriteConfig(format = "delta", mode = "append"))
    val back = Sources.read(spark,
      Sources.ReadConfig(format = "delta", path = Some(root)))
    assert(back.count() == 3)
    // self-referential overwrite (plan reads the table it replaces) is
    // safe: old data files are never deleted, the commit is the swap
    val doubled = Sources.read(spark,
      Sources.ReadConfig(format = "delta", path = Some(root)))
      .withColumn("amt", col("amt") * 2)
    Sources.writeWithStats(doubled, root,
      Sources.WriteConfig(format = "delta", mode = "overwrite",
        partitionBy = Seq("status")))
    val after = DeltaLog.read(spark, root).agg(sum("amt")).as[Double].head()
    assert(after == 120.0)
  }

  test("replaceWhere rewrites only the matching partition") {
    val root = tmp()
    val base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "b", 40.0))
      .toDF("id", "p", "amt")
    DeltaWriter.write(base, root, "overwrite", partitionBy = Seq("p"))
    val v0 = DeltaLog.snapshot(spark, root)

    // rewrite partition p=a only
    val fresh = Seq((9, "a", 99.0)).toDF("id", "p", "amt")
    val c = DeltaWriter.write(fresh, root, "overwrite",
      replaceWhere = Map("p" -> "a"))
    assert(c.rowsWritten == 1)

    val back = DeltaLog.read(spark, root).select("id", "p", "amt")
      .as[(Int, String, Double)].collect().toSet
    assert(back == Set((9, "a", 99.0), (2, "b", 20.0), (4, "b", 40.0)))
    // b-partition files are THE SAME files (not rewritten)
    val v1 = DeltaLog.snapshot(spark, root)
    val bFiles = (s: DeltaLog.Snapshot) => s.files
      .filter(_.partitionValues.get("p").flatten.contains("b")).map(_.path).toSet
    assert(bFiles(v1) == bFiles(v0))
    // time travel to the pre-replace version still sees old p=a rows
    val old = DeltaLog.read(spark, root, versionAsOf = Some(v0.version))
      .filter($"p" === "a").select("id").as[Int].collect().toSet
    assert(old == Set(1, 3))
  }

  test("replaceWhere fails fast on out-of-scope rows, bad keys, bad modes") {
    val root = tmp()
    val base = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "p", "amt")
    DeltaWriter.write(base, root, "overwrite", partitionBy = Seq("p"))

    // incoming rows outside the replaced scope abort before any commit
    val vsBefore = DeltaLog.versions(spark, root)
    val mixed = Seq((9, "a", 1.0), (8, "b", 2.0)).toDF("id", "p", "amt")
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(mixed, root, "overwrite", replaceWhere = Map("p" -> "a"))
    }
    assert(e.getMessage.contains("outside the replaced scope"))
    assert(DeltaLog.versions(spark, root) == vsBefore) // nothing committed
    assert(DeltaLog.read(spark, root).count() == 2)    // table intact

    intercept[IllegalArgumentException] {
      DeltaWriter.write(base, root, "append", replaceWhere = Map("p" -> "a"))
    }
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((9, "a", 1.0)).toDF("id", "p", "amt"), root,
        "overwrite", replaceWhere = Map("amt" -> "1.0")) // not a partition col
    }
  }

  test("declarative replace_where through the delta sink") {
    val root = tmp()
    Sources.writeWithStats(
      Seq((1, "x", 1.0), (2, "y", 2.0)).toDF("id", "p", "amt"), root,
      Sources.WriteConfig(format = "delta", mode = "overwrite",
        partitionBy = Seq("p")))
    Sources.writeWithStats(
      Seq((7, "x", 7.0)).toDF("id", "p", "amt"), root,
      Sources.WriteConfig(format = "delta", mode = "overwrite",
        options = Map("replace_where" -> "p=x")))
    val back = DeltaLog.read(spark, root).select("id").as[Int].collect().toSet
    assert(back == Set(7, 2))
  }
  test("optimize_write clusters partitioned writes: files track partitions") {
    val root = tmp()
    val df = (0 until 3000).map(i => (i, s"d${i % 3}")).toDF("k", "day")
      .repartition(8) // unclustered: every task holds every partition
    DeltaWriter.write(df, root, partitionBy = Seq("day"), clusterWrite = true)
    val snap = DeltaLog.snapshot(spark, root)
    // without clustering this layout stages up to 8 x 3 files
    assert(snap.files.size <= 6, s"optimized write left ${snap.files.size} files")
    assert(DeltaLog.read(spark, root).count() == 3000)

    val root2 = tmp()
    graft.sources.IcebergSource.write(df, root2, partitionBy = Seq("day"),
      clusterWrite = true)
    assert(graft.sources.IcebergSource.read(spark, root2).count() == 3000)
    val meta = graft.sources.IcebergSource.tableMeta(spark, root2)
    // snapshot summary carries added-files via manifest; check via files
    val pr = graft.sources.IcebergSource.pruneReport(spark, root2,
      org.apache.spark.sql.functions.lit(true))
    assert(pr.candidates <= 6, s"optimized iceberg write left ${pr.candidates} files")
  }

}
