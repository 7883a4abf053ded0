package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.sources.{DeltaLog, DeltaWriter}
import org.apache.spark.sql.functions._

import scala.util.Try

/**
 * Adversarial test of the optimistic-concurrency commit path: N writers
 * racing rename-if-absent commits from multiple threads (Delta's
 * protocol permits exactly one winner per version; everyone else must
 * rebase and retry). Asserts linearizable versions (contiguous, no
 * gaps, no double-claims), no lost adds, overwrite/append interleaving
 * that replays to a consistent snapshot, and checkpoint correctness for
 * checkpoints written DURING the race.
 */
class DeltaConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("delta_conc").toString

  /** Run `n` tasks concurrently after a common start barrier. */
  private def race[T](n: Int)(task: Int => T): Seq[Try[T]] = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val futs = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[T] {
        override def call(): T = { start.await(); task(i) }
      })
    }
    start.countDown()
    pool.shutdown()
    pool.awaitTermination(300, TimeUnit.SECONDS)
    futs.map(fut => Try(fut.get()))
  }

  test("concurrent appends: every commit wins a distinct contiguous version, no lost adds") {
    val root = tmp() + "/t"
    // seed the table so racers contend on version 1+
    DeltaWriter.write(Seq((-1, "seed")).toDF("id", "who"), root)
    val n = 8
    val results = race(n) { i =>
      DeltaWriter.write(Seq((i, s"writer_$i")).toDF("id", "who"), root, "append")
    }
    val commits = results.map(_.get) // all writers must succeed
    val versions = commits.map(_.version).sorted
    assert(versions == (1L to n.toLong), s"versions not contiguous: $versions")

    // no lost adds: every writer's row is present exactly once
    val rows = DeltaLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == ((-1, "seed") +: (0 until n).map(i => (i, s"writer_$i"))))

    // each intermediate version replays to seed + the writers committed so far
    for (v <- 1L to n.toLong) {
      assert(DeltaLog.read(spark, root, versionAsOf = Some(v)).count() == v + 1)
    }
  }

  test("appends racing an overwrite: replay is consistent at every version") {
    val root = tmp() + "/t"
    DeltaWriter.write((0 until 10).map(i => (i, "base")).toDF("id", "who"), root)
    val results = race(6) { i =>
      if (i == 0)
        DeltaWriter.write(Seq((100, "overwriter")).toDF("id", "who"), root, "overwrite")
      else
        DeltaWriter.write(Seq((i, s"appender_$i")).toDF("id", "who"), root, "append")
    }
    val commits = results.map(_.get)
    val versions = commits.map(_.version).sorted
    assert(versions == (1L to 6L), s"versions not contiguous: $versions")
    val overwriteV = commits(0).version

    // final state = overwrite survivors + appends that committed after it
    val expected = Set((100, "overwriter")) ++
      commits.zipWithIndex.drop(1).collect {
        case (c, i) if c.version > overwriteV => (i, s"appender_$i")
      }
    val got = DeltaLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == expected, s"got $got, want $expected")

    // every version replays without error and row counts are coherent:
    // versions <= overwrite grow from 10; versions > overwrite grow from 1
    for (v <- 0L to 6L) {
      val c = DeltaLog.read(spark, root, versionAsOf = Some(v)).count()
      if (v < overwriteV) assert(c == 10 + v, s"v$v: $c")
      else assert(c == 1 + (v - overwriteV), s"v$v: $c")
    }
  }

  test("checkpoints written during the race replay identically to the JSON log") {
    val root = tmp() + "/t"
    DeltaWriter.write(Seq((0, "seed")).toDF("id", "who"), root,
      checkpointInterval = 2)
    val n = 9 // with interval 2, several checkpoints land mid-race
    val results = race(n) { i =>
      DeltaWriter.write(Seq((i + 1, s"w$i")).toDF("id", "who"), root, "append",
        checkpointInterval = 2)
    }
    results.foreach(r => assert(r.isSuccess, s"writer failed: $r"))
    val f = new org.apache.hadoop.fs.Path(root, "_delta_log")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cps = f.listStatus(new org.apache.hadoop.fs.Path(root, "_delta_log"))
      .map(_.getPath.getName).filter(_.endsWith(".checkpoint.parquet")).sorted
    assert(cps.nonEmpty, "no checkpoint written during the race")

    // full-JSON replay and checkpoint-based replay agree
    val full = DeltaLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(full == (Set((0, "seed")) ++ (1 to n).map(i => (i, s"w${i - 1}"))))
    // force checkpoint-seeded replay: delete JSON commits at or below the
    // last checkpoint (what retention would age out)
    val lastCp = cps.last.takeWhile(_ != '.').toLong
    (0L to lastCp).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(root, f"_delta_log/$v%020d.json"), false)
    }
    val fromCp = DeltaLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(fromCp == full, "checkpoint replay diverged from JSON replay")
  }

  test("tryPublish: exactly one winner per version under a direct hammer") {
    // hammer the publish primitive itself, 16 threads x same version
    val root = tmp() + "/t"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 0 until 5) {
      val wins = race(16) { i =>
        DeltaWriter.tryPublish(f, root, round.toLong,
          Seq(s"""{"commitInfo":{"writer":$i}}"""), s"n${round}_$i")
      }.map(_.get)
      assert(wins.count(identity) == 1,
        s"round $round: ${wins.count(identity)} writers claimed one version")
      // the winner's content survived intact (no torn/overwritten file)
      val content = new String(org.apache.commons.io.IOUtils.toByteArray(
        f.open(new org.apache.hadoop.fs.Path(root, f"_delta_log/$round%020d.json"))),
        "UTF-8")
      assert(content.startsWith("""{"commitInfo":{"writer":""") &&
        content.endsWith("}}\n"), s"torn commit file: $content")
    }
  }
}
