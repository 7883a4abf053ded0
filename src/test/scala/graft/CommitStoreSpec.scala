package graft

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.sources._
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._

import scala.util.Try

/**
 * A RawLocalFileSystem masquerading as S3: rename is last-writer-wins
 * (File.renameTo on POSIX silently replaces the destination — the same
 * hazard as S3's copy+delete "rename"), and create(overwrite = false) is
 * a non-atomic check-then-create. No atomic put-if-absent anywhere —
 * the store class the CommitStore refusal/coordination paths exist for.
 */
class MockS3FileSystem extends RawLocalFileSystem {
  import org.apache.hadoop.fs.FileStatus
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a://mock/")

  /** RawLocal statuses load permissions lazily via `new File(uri)`,
    * which rejects the s3a scheme — return eager copies instead. */
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, 0L,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "", "", st.getPath)

  override def getFileStatus(p: Path): FileStatus = eager(super.getFileStatus(p))
  override def listStatus(p: Path): Array[FileStatus] =
    super.listStatus(p).map(eager)
}

/** The same store with a CONDITIONAL PUT: create(overwrite = false)
  * buffers the payload and publishes it atomically at close, failing
  * with FileAlreadyExists when the key appeared meanwhile — S3
  * `If-None-Match: *` semantics (visibility only on complete PUT). */
class MockConditionalPutFileSystem extends MockS3FileSystem {
  // RawLocalFileSystem overrides THIS signature, and
  // FileSystem.create(path, overwrite) dispatches to it directly —
  // without this override the conditional path would be bypassed
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else conditional(f)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditional(f)

  private def conditional(f: Path): FSDataOutputStream = {
      val buf = new java.io.ByteArrayOutputStream()
      val self = this
      val wrapped = new java.io.OutputStream {
        override def write(b: Int): Unit = buf.write(b)
        override def write(b: Array[Byte], o: Int, l: Int): Unit = buf.write(b, o, l)
        override def close(): Unit = MockConditionalPutFileSystem.putLock.synchronized {
          if (self.exists(f))
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
          val out = self.create(f, true)
          try out.write(buf.toByteArray) finally out.close()
        }
      }
      new FSDataOutputStream(wrapped, null)
    }
}

object MockConditionalPutFileSystem {
  val putLock = new Object
}

/** Unrecognized-scheme stand-in for resolver tests (no IO). */
class WeirdFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "weirdfs"
  override def getUri: URI = URI.create("weirdfs:///")
}

/** MockS3 whose create() STALLS when the path carries the slow marker —
  * CommitStore temps are named `.tmp_<nonce>_…`, so a committer using
  * that nonce pauses mid-staging past the lock TTL: the GC-pause /
  * slow-object-store-write scenario the lease fencing exists for. */
class StallingS3FileSystem extends MockS3FileSystem {
  private def maybeStall(f: Path): Unit =
    if (f.getName.contains("slowstall")) Thread.sleep(900)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    maybeStall(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    maybeStall(f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

/**
 * Object-store commit coordination through the pluggable [[CommitStore]]:
 * on a store with NO atomic put-if-absent, concurrent writers either
 * serialize through the configured coordinator (lock dir on a consistent
 * store, or the store's conditional put) or the commit fails LOUDLY —
 * never a silent last-writer-wins that erases a transaction.
 */
class CommitStoreSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def tmp(): String = Files.createTempDirectory("cstore").toString

  /** Point s3a:// at the mock, run, restore. Cache disabled so every
    * getFileSystem rereads the live conf. */
  private def withMockS3[T](impl: Class[_], extra: (String, String)*)(body: => T): T = {
    val keys = Seq("fs.s3a.impl", "fs.s3a.impl.disable.cache") ++ extra.map(_._1)
    val saved = keys.map(k => k -> Option(hconf.get(k)))
    hconf.set("fs.s3a.impl", impl.getName)
    hconf.set("fs.s3a.impl.disable.cache", "true")
    extra.foreach { case (k, v) => hconf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => hconf.set(k, v)
      case (k, None) => hconf.unset(k)
    }
  }

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

  test("the mock store really is unsafe: rename silently replaces the target") {
    withMockS3(classOf[MockS3FileSystem]) {
      val f = new Path("s3a://mock" + tmp()).getFileSystem(hconf)
      assert(f.isInstanceOf[MockS3FileSystem])
      val d = "s3a://mock" + tmp()
      val a = new Path(d, "a"); val b = new Path(d, "target")
      Seq((a, "first"), (b, "second")).foreach { case (p, s) =>
        val o = f.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
      }
      // S3-style rename: last writer wins, no error — the exact hazard
      // rename-if-absent cannot survive
      assert(f.rename(a, b))
      val in = f.open(b)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      assert(got == "first", "mock rename should have clobbered the target")
    }
  }

  test("no coordination configured: commit REFUSES loudly, table never corrupts") {
    withMockS3(classOf[MockS3FileSystem]) {
      val root = "s3a://mock" + tmp() + "/t"
      val e = intercept[IllegalStateException] {
        DeltaWriter.write(Seq((1, "a")).toDF("k", "v"), root)
      }
      assert(e.getMessage.contains("refusing to commit"), e.getMessage)
      assert(e.getMessage.contains("graft.commit.lock.dir"), e.getMessage)
      // nothing half-committed: no _delta_log versions exist
      assert(DeltaLog.versions(spark, root).isEmpty)
    }
  }

  test("lock-dir coordination: 8 racing Delta writers serialize, no lost commits") {
    val lockDir = tmp()
    withMockS3(classOf[MockS3FileSystem], "graft.commit.lock.dir" -> lockDir) {
      val root = "s3a://mock" + tmp() + "/t"
      DeltaWriter.write(Seq((-1, "seed")).toDF("id", "who"), root)
      val n = 8
      val results = race(n) { i =>
        DeltaWriter.write(Seq((i, s"writer_$i")).toDF("id", "who"), root, "append")
      }
      val versions = results.map(_.get.version).sorted
      assert(versions == (1L to n.toLong), s"versions not contiguous: $versions")
      val rows = DeltaLog.read(spark, root).collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == ((-1, "seed") +: (0 until n).map(i => (i, s"writer_$i"))))
      // every intermediate version replays consistently
      for (v <- 1L to n.toLong)
        assert(DeltaLog.read(spark, root, versionAsOf = Some(v)).count() == v + 1)
      // all locks released
      val lockFs = new Path(lockDir).getFileSystem(hconf)
      assert(lockFs.listStatus(new Path(lockDir)).isEmpty, "locks left behind")
    }
  }

  test("conditional-put coordination: 8 racing Delta writers serialize") {
    withMockS3(classOf[MockConditionalPutFileSystem],
      "graft.commit.conditional-put" -> "true") {
      val root = "s3a://mock" + tmp() + "/t"
      DeltaWriter.write(Seq((-1, "seed")).toDF("id", "who"), root)
      val n = 8
      val results = race(n) { i =>
        DeltaWriter.write(Seq((i, s"writer_$i")).toDF("id", "who"), root, "append")
      }
      val versions = results.map(_.get.version).sorted
      assert(versions == (1L to n.toLong), s"versions not contiguous: $versions")
      assert(DeltaLog.read(spark, root).count() == n + 1L)
    }
  }

  test("Iceberg commits run through the same seam: lock-coordinated appends") {
    val lockDir = tmp()
    withMockS3(classOf[MockS3FileSystem], "graft.commit.lock.dir" -> lockDir) {
      val root = "s3a://mock" + tmp() + "/t"
      IcebergSource.write(Seq((0L, "seed")).toDF("id", "who"), root)
      val n = 4
      val results = race(n) { i =>
        IcebergSource.write(Seq((i.toLong + 1L, s"w$i")).toDF("id", "who"),
          root, mode = "append")
      }
      results.foreach(r => assert(r.isSuccess, r.failed.map(_.toString)))
      assert(IcebergSource.read(spark, root).count() == n + 1L)
      // and refusal without the lock dir
      hconf.unset("graft.commit.lock.dir")
      val e = intercept[Exception] {
        IcebergSource.write(Seq((99L, "x")).toDF("id", "who"), root, mode = "append")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("refusing to commit")),
        s"expected loud refusal, got $e")
    }
  }

  test("resolver: scheme defaults, overrides, and misconfigurations") {
    val local = FileSystem.newInstance(URI.create("file:///"), hconf)
    assert(CommitStore.forFs(local) eq LinkCommitStore)

    val weird = new WeirdFileSystem
    weird.setConf(hconf)
    assert(CommitStore.forFs(weird).isInstanceOf[RefusingCommitStore])

    val saved = Option(hconf.get("graft.commit.store"))
    try {
      hconf.set("graft.commit.store", "rename")
      assert(CommitStore.forFs(local) eq RenameCommitStore)
      hconf.set("graft.commit.store", "create")
      assert(CommitStore.forFs(local) eq CreateIfAbsentCommitStore)
      hconf.set("graft.commit.store", "lock") // without a lock dir: loud
      intercept[IllegalStateException] { CommitStore.forFs(local) }
      hconf.set("graft.commit.store", "bogus")
      intercept[IllegalArgumentException] { CommitStore.forFs(local) }
    } finally saved match {
      case Some(v) => hconf.set("graft.commit.store", v)
      case None => hconf.unset("graft.commit.store")
    }
  }

  test("explicit graft.commit.store=link on a non-local scheme refuses loudly") {
    withMockS3(classOf[MockS3FileSystem], "graft.commit.store" -> "link") {
      val f = new Path("s3a://mock" + tmp()).getFileSystem(hconf)
      // link(2) against a local interpretation of an object-store path
      // would silently fall back to non-atomic rename — refuse instead
      val e = intercept[IllegalArgumentException] { CommitStore.forFs(f) }
      assert(e.getMessage.contains("link"), e.getMessage)
      assert(e.getMessage.contains("s3a"), e.getMessage)
    }
    // the explicit override is still honored where it is safe
    val saved = Option(hconf.get("graft.commit.store"))
    hconf.set("graft.commit.store", "link")
    try {
      val local = FileSystem.newInstance(URI.create("file:///"), hconf)
      assert(CommitStore.forFs(local) eq LinkCommitStore)
    } finally saved match {
      case Some(v) => hconf.set("graft.commit.store", v)
      case None => hconf.unset("graft.commit.store")
    }
  }

  test("lease fencing: a TTL-expired holder and its breaker never both succeed") {
    val lockDir = tmp()
    withMockS3(classOf[StallingS3FileSystem],
      "graft.commit.lock.dir" -> lockDir,
      "graft.commit.lock.timeout.ms" -> "300") {
      val f = new Path("s3a://mock" + tmp()).getFileSystem(hconf)
      val target = new Path("s3a://mock" + tmp(), "00000000000000000001.json")
      val store = new LockCommitStore(new Path(lockDir), OverwriteWithinLock)
      val pool = Executors.newFixedThreadPool(2)
      // writer S acquires the lock, then stalls 900 ms while staging its
      // temp (nonce-marked) — three TTLs past its lease
      val slow = pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean =
          store.putIfAbsent(f, target, "SLOW".getBytes("UTF-8"), "slowstall")
      })
      Thread.sleep(100)
      // writer B arrives while S holds, waits out the stale lease, breaks
      // it, and publishes; its own acquire deadline may lapse first —
      // retrying is what a real committer does
      val fast = pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          def attempt(n: Int): Boolean =
            try store.putIfAbsent(f, target, "FAST".getBytes("UTF-8"), "fastpub")
            catch { case _: IllegalStateException if n > 0 => attempt(n - 1) }
          attempt(8)
        }
      })
      pool.shutdown()
      pool.awaitTermination(120, TimeUnit.SECONDS)
      val s = slow.get(); val b = fast.get()
      assert(!(s && b),
        "the stalled holder and the lease-breaker both claimed the commit")
      assert(s || b, "someone must have committed")
      val in = f.open(target)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val winner = if (s) "SLOW" else "FAST"
      assert(got == winner,
        s"$winner reported success but '$got' is what got published")
    }
  }

  test("stale lock from a crashed committer is broken after the TTL") {
    val lockDir = tmp()
    val local = FileSystem.getLocal(hconf)
    local.setConf(hconf)
    val target = new Path(tmp(), "00000000000000000000.json")
    // plant a stale lock for this target (old mtime via short TTL conf)
    val saved = Option(hconf.get("graft.commit.lock.timeout.ms"))
    hconf.set("graft.commit.lock.timeout.ms", "300")
    try {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(target.toString.getBytes("UTF-8"))
        .take(16).map("%02x".format(_)).mkString
      val lockFile = new Path(lockDir, s"$digest.lock")
      val o = local.create(lockFile, true); o.write("dead".getBytes); o.close()
      Thread.sleep(400) // lock is now older than the 300 ms TTL
      val store = new LockCommitStore(new Path(lockDir), OverwriteWithinLock)
      assert(store.putIfAbsent(local, target, "payload".getBytes, "n1"))
      val in = local.open(target)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      assert(got == "payload")
    } finally saved match {
      case Some(v) => hconf.set("graft.commit.lock.timeout.ms", v)
      case None => hconf.unset("graft.commit.lock.timeout.ms")
    }
  }
}
