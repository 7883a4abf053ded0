package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/**
 * Per-query profiler for the optimization rounds: runs ONE board query with
 * a listener that prints every Spark job's wall time and description, plus
 * the driver-side gaps between jobs (footer reads, avro/manifest writes,
 * commit I/O live there). Usage:
 *
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileQ q_iceberg_delete [reps]"
 */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ProfileQ <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = 0L
    // host-steal-proof structure metrics: bytes read/shuffled and task
    // counts are a property of the PLAN, not of hypervisor contention —
    // they are the reliable before/after evidence when wall-clock is noisy
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          taskCount.incrementAndGet()
        }
        ()
      }
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val now = System.nanoTime()
        val gap = if (lastEnd == 0) 0.0 else (now - lastEnd) / 1e3 / 1e3
        starts.put(js.jobId, (now, desc))
        if (gap > 1.0) println(f"        [driver gap ${gap}%8.1f ms]")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val now = System.nanoTime()
        lastEnd = now
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          println(f"  job ${je.jobId}%3d ${(now - t0) / 1e6}%8.1f ms  $desc")
        }
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      println(s"=== $name run $i ===")
      lastEnd = 0L
      inputBytes.set(0); shuffleRead.set(0); shuffleWrite.set(0); taskCount.set(0)
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      // listener events are async; give the queue a moment to drain
      Thread.sleep(300)
      println(f"=== total ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c " +
        f"input=${inputBytes.get / 1e6}%.1fMB shufR=${shuffleRead.get / 1e6}%.1fMB " +
        f"shufW=${shuffleWrite.get / 1e6}%.1fMB tasks=${taskCount.get} ===")
    }
    spark.stop()
  }
}
