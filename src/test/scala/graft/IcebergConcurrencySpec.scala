package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.sources.{IcebergMaintenance, IcebergSource}

import scala.util.Try

/**
 * Adversarial test of the Iceberg optimistic-concurrency commit path —
 * the mirror of DeltaConcurrencySpec, which proved the lost-commit race
 * REAL on local filesystems (multiple winners per version before the
 * link(2) claim). Exactly one committer may win `v{N}.metadata.json`;
 * everyone else must rebase onto the winner's metadata and retry
 * without abandoning their committed data files.
 */
class IcebergConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iceberg_conc").toString

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

  private def metaVersions(root: String): Seq[Long] = {
    val dir = new java.io.File(root, "metadata")
    val versioned = "v(\\d+)\\.metadata\\.json".r
    dir.listFiles().toSeq.map(_.getName).collect {
      case versioned(v) => v.toLong
    }.sorted
  }

  test("concurrent appends: contiguous metadata versions, no lost rows") {
    val root = tmp() + "/t"
    IcebergSource.write(Seq((-1, "seed")).toDF("id", "who"), root)
    val n = 8
    val results = race(n) { i =>
      IcebergSource.write(Seq((i, s"writer_$i")).toDF("id", "who"), root, "append")
    }
    results.foreach(r => assert(r.isSuccess, s"append failed: $r"))

    // one metadata version per commit, contiguous, no double-claims
    assert(metaVersions(root) == (1L to (n + 1).toLong),
      s"versions not contiguous: ${metaVersions(root)}")

    // no lost adds: every writer's row present exactly once
    val rows = IcebergSource.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == ((-1, "seed") +: (0 until n).map(i => (i, s"writer_$i"))))

    // snapshot history is linear: each snapshot's cumulative count grows by 1
    val snaps = IcebergSource.snapshots(spark, root)
    assert(snaps.size == n + 1)
    snaps.zipWithIndex.foreach { case (s, i) =>
      assert(IcebergSource.read(spark, root,
        snapshotId = Some(s.snapshotId)).count() == i + 1,
        s"snapshot ${s.snapshotId} (#$i) has wrong cumulative count")
    }
  }

  test("appends racing an overwrite: every snapshot replays consistently") {
    val root = tmp() + "/t"
    IcebergSource.write((0 until 10).map(i => (i, "base")).toDF("id", "who"), root)
    val results = race(6) { i =>
      if (i == 0)
        IcebergSource.write(Seq((100, "overwriter")).toDF("id", "who"), root, "overwrite")
      else
        IcebergSource.write(Seq((i, s"appender_$i")).toDF("id", "who"), root, "append")
    }
    results.foreach(r => assert(r.isSuccess, s"writer failed: $r"))
    assert(metaVersions(root) == (1L to 7L))

    // replay every snapshot: counts must be coherent with a single
    // linear history (grow-by-one before the overwrite from 10; the
    // overwrite resets to 1; grow-by-one after)
    val snaps = IcebergSource.snapshots(spark, root)
    assert(snaps.size == 7)
    val counts = snaps.map(s =>
      IcebergSource.read(spark, root, snapshotId = Some(s.snapshotId)).count())
    val owIdx = snaps.indexWhere(_.operation == "overwrite")
    assert(owIdx >= 0, "overwrite snapshot missing from history")
    counts.zipWithIndex.foreach { case (c, i) =>
      if (i < owIdx) assert(c == 10 + i, s"snapshot #$i: $c")
      else assert(c == 1 + (i - owIdx), s"snapshot #$i: $c")
    }

    // final state = overwrite survivor + appends committed after it
    val got = IcebergSource.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got.contains((100, "overwriter")))
    assert(got.size == counts.last)
  }

  test("tryPublishMeta: exactly one winner per version under a direct hammer") {
    val root = tmp() + "/t"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 1 to 5) {
      val wins = race(16) { i =>
        IcebergSource.tryPublishMeta(f, root, round.toLong,
          s"""{"writer":$i}""".getBytes("UTF-8"), s"n${round}_$i")
      }.map(_.get)
      assert(wins.count(identity) == 1,
        s"round $round: ${wins.count(identity)} writers claimed one version")
      // the winner's content survived intact (no torn/overwritten file)
      val content = new String(org.apache.commons.io.IOUtils.toByteArray(
        f.open(new org.apache.hadoop.fs.Path(root,
          s"metadata/v$round.metadata.json"))), "UTF-8")
      assert(content.matches("""\{"writer":\d+\}"""), s"torn commit: $content")
      // no temp litter left behind
      val tmps = f.listStatus(new org.apache.hadoop.fs.Path(root, "metadata"))
        .map(_.getPath.getName).filter(_.startsWith(".tmp_"))
      assert(tmps.isEmpty, s"temp files leaked: ${tmps.mkString(", ")}")
    }
  }

  test("stale version-hint: readers probe forward to the true latest") {
    val root = tmp() + "/t"
    IcebergSource.write(Seq((1, "a")).toDF("id", "who"), root)
    IcebergSource.write(Seq((2, "b")).toDF("id", "who"), root, "append")
    IcebergSource.write(Seq((3, "c")).toDF("id", "who"), root, "append")
    // simulate a slow writer publishing its stale hint AFTER newer commits
    val hint = new java.io.FileWriter(new java.io.File(root, "metadata/version-hint.text"))
    try hint.write("1") finally hint.close()
    assert(IcebergSource.read(spark, root).count() == 3,
      "reader trusted a stale version hint")
  }

  test("optimize racing appends: conflict re-plans, no rows lost, no clobber") {
    val root = tmp() + "/t"
    // many small files so optimize has real work (and a real commit window)
    for (i <- 0 until 6)
      IcebergSource.write(Seq((i, s"seed_$i")).toDF("id", "who"), root,
        if (i == 0) "overwrite" else "append")
    val results = race(4) { i =>
      if (i == 0) IcebergMaintenance.optimize(spark, root).filesRemoved
      else {
        IcebergSource.write(Seq((100 + i, s"racer_$i")).toDF("id", "who"),
          root, "append")
        -1
      }
    }
    results.foreach(r => assert(r.isSuccess, s"participant failed: $r"))
    // every seed row AND every racer's row is in the final state: the
    // optimize replace snapshot may not clobber a concurrent append
    val got = IcebergSource.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val want = (0 until 6).map(i => (i, s"seed_$i")).toSet ++
      (1 to 3).map(i => (100 + i, s"racer_$i")).toSet
    assert(got == want, s"lost rows: missing ${want -- got}, extra ${got -- want}")
  }

  test("in-flight commit temps are invisible to discovery and reads") {
    // a crashed committer can leave `.tmp_v*-<nonce>.metadata.json`
    // behind; a raw suffix match would parse the torn/unpublished file as
    // committed state (and, post-rebase, double-commit the loser's rows)
    val root = tmp() + "/t"
    val metaDir = new java.io.File(root, "metadata")

    // litter alone must not make the directory look like a table
    metaDir.mkdirs()
    val litter = new java.io.File(metaDir, ".tmp_v1-deadbeef.metadata.json")
    val w0 = new java.io.FileWriter(litter); w0.write("{\"torn"); w0.close()
    assert(!IcebergSource.isIcebergTable(spark, root),
      "a .tmp temp alone was mistaken for a committed table")

    // with a real table + a lexically-late torn temp + no hint, readers
    // must resolve the real latest, not the temp
    litter.delete()
    IcebergSource.write(Seq((1, "a")).toDF("id", "who"), root)
    IcebergSource.write(Seq((2, "b")).toDF("id", "who"), root, "append")
    val late = new java.io.FileWriter(
      new java.io.File(metaDir, ".tmp_v9-ffffffff.metadata.json"))
    late.write("{\"torn\":"); late.close()
    new java.io.File(metaDir, "version-hint.text").delete()
    assert(IcebergSource.read(spark, root).count() == 2,
      "reader parsed an in-flight commit temp as table state")
  }

  test("maintenance on a foreign-layout (non-v-named) metadata table") {
    // tables written by other engines can use `00001-<uuid>.metadata.json`
    // names — latestMetadata supports them via the lexical fallback
    // (version 0); optimize/expire must claim v1 instead of failing with
    // 'plan-time metadata vanished'
    val root = tmp() + "/t"
    for (i <- 0 until 3)
      IcebergSource.write(Seq((i, s"w$i")).toDF("id", "who"), root,
        if (i == 0) "overwrite" else "append")
    val metaDir = new java.io.File(root, "metadata")
    for (v <- 1 to 3) {
      val from = new java.io.File(metaDir, s"v$v.metadata.json")
      val to = new java.io.File(metaDir,
        s"0000$v-00000000-0000-0000-0000-00000000000$v.metadata.json")
      assert(from.renameTo(to), s"rename of v$v failed")
    }
    new java.io.File(metaDir, "version-hint.text").delete()
    assert(IcebergSource.tableMeta(spark, root).version == 0L)

    val res = IcebergMaintenance.optimize(spark, root)
    assert(res.filesRemoved == 3 && res.filesAdded == 1,
      s"foreign-layout optimize: $res")
    assert(IcebergSource.read(spark, root).count() == 3)
    // the claim landed as v1 and subsequent maintenance proceeds normally
    assert(metaVersions(root) == Seq(1L))
    val exp = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(exp.expiredSnapshots.size == 3)
    assert(IcebergSource.read(spark, root).count() == 3)
  }

  test("terminal write failure reclaims the staged data directory") {
    val root = tmp() + "/t"
    IcebergSource.write(Seq((1, 10)).toDF("id", "v"), root, "overwrite",
      partitionBy = Seq("v"))
    // identity-partition null is a terminal (non-retryable) failure that
    // fires AFTER the parquet staging job
    val bad = Seq((2, Some(20)), (3, None)).toDF("id", "v")
    val thrown = intercept[Exception] {
      IcebergSource.write(bad, root, "append", partitionBy = Seq("v"))
    }
    assert(thrown.getMessage.contains("null value"), thrown.getMessage)
    // the staged-but-never-committed files are gone: data/ holds only the
    // first commit's directory
    val dataDirs = new java.io.File(root, "data").listFiles().toSeq
      .filter(_.isDirectory)
    assert(dataDirs.size == 1,
      s"orphaned staging dirs left behind: ${dataDirs.map(_.getName)}")
    assert(IcebergSource.read(spark, root).count() == 1)
  }

  test("expire crash window: metadata commits before file deletes") {
    val root = tmp() + "/t"
    for (i <- 0 until 4)
      IcebergSource.write(Seq((i, s"w$i")).toDF("id", "who"), root,
        if (i == 0) "overwrite" else "append")
    val before = IcebergSource.snapshots(spark, root).size
    assert(before == 4)
    val res = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(res.expiredSnapshots.size == 3)
    // table remains fully readable after expiry (metadata-first ordering
    // means a crash between commit and deletes leaves orphans, never a
    // table referencing deleted files)
    assert(IcebergSource.read(spark, root).count() == 4)
    assert(IcebergSource.snapshots(spark, root).size == 1)
    // a second expire over the already-expired table is a clean no-op
    val again = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    assert(again.expiredSnapshots.isEmpty)
    assert(IcebergSource.read(spark, root).count() == 4)
  }
}
