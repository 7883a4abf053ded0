package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.util.Try

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Per-node EXECUTOR metrics — shuffle bytes, spill, input bytes, task
 * time — captured while a pipeline node runs and recorded to the
 * catalog (`meta_node_metrics`). Wall-clock duration says a node was
 * slow; these say WHY: a node spilling gigabytes needs more shuffle
 * partitions or a salted aggregate, a node shuffling 100× its input
 * has a join order problem — exactly the signals a 1000-executor run
 * surfaces too late.
 *
 * Mechanics: node execution runs under a thread-local Spark job group
 * (`graft:<pipeline>:<node>`); one registered listener per
 * SparkContext maps that group's stages to an aggregate. Reads drain
 * the listener bus first (listener delivery is async), so totals are
 * exact, not racy samples. Overhead is one map update per task end —
 * negligible against any real task.
 */
final class NodeMetricsListener extends SparkListener {
  private val stageToGroup = new ConcurrentHashMap[Int, String]()
  private val agg = new ConcurrentHashMap[String, Array[Long]]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val group = Option(js.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (group != null && group.startsWith("graft:"))
      js.stageIds.foreach(sid => stageToGroup.put(sid, group))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val group = stageToGroup.get(te.stageId)
    val m = te.taskMetrics
    if (group != null && m != null) {
      val arr = agg.computeIfAbsent(group, _ => new Array[Long](7))
      arr.synchronized {
        arr(0) += 1 // tasks
        arr(1) += m.executorRunTime
        arr(2) += m.inputMetrics.bytesRead
        arr(3) += m.shuffleReadMetrics.totalBytesRead
        arr(4) += m.shuffleWriteMetrics.bytesWritten
        arr(5) += m.memoryBytesSpilled
        arr(6) += m.diskBytesSpilled
      }
    }
  }

  // tasks of a completed stage have all reached onTaskEnd (delivery order
  // within the bus is FIFO), so the mapping entry is no longer needed;
  // dropping it here keeps the map bounded in long-lived sessions
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    stageToGroup.remove(sc.stageInfo.stageId); ()
  }

  def snapshot(group: String): Map[String, Long] = {
    val arr = agg.get(group)
    if (arr == null) Map.empty
    else arr.synchronized {
      Map("tasks" -> arr(0), "executor_run_time_ms" -> arr(1),
        "input_bytes" -> arr(2), "shuffle_read_bytes" -> arr(3),
        "shuffle_write_bytes" -> arr(4), "memory_spill_bytes" -> arr(5),
        "disk_spill_bytes" -> arr(6))
    }
  }

  def clear(group: String): Unit = { agg.remove(group); () }
}

object NodeMetrics {

  // one listener per SparkContext (keyed by applicationId + startTime so
  // a restarted context gets a fresh one)
  private val listeners = new ConcurrentHashMap[String, NodeMetricsListener]()

  def listenerFor(spark: SparkSession): NodeMetricsListener = {
    val sc = spark.sparkContext
    val key = s"${sc.applicationId}:${sc.startTime}"
    val cur = listeners.computeIfAbsent(key, _ => {
      val l = new NodeMetricsListener
      sc.addSparkListener(l)
      l
    })
    // only one SparkContext exists per JVM, so every other key belongs to
    // a stopped context and can never be requested again — evict them
    val it = listeners.keySet.iterator()
    while (it.hasNext) { if (it.next() != key) it.remove() }
    cur
  }

  /**
   * Run `body` under the job group for (pipeline, node) and return its
   * result plus the group's executor-metric totals. Job groups are
   * thread-local, so parallel-layer workers measure independently.
   */
  def measure[T](spark: SparkSession, pipeline: String, node: String)
                (body: => T): (T, Map[String, Long]) = {
    val group = s"graft:$pipeline:$node"
    val listener = listenerFor(spark)
    listener.clear(group)
    val sc = spark.sparkContext
    sc.setJobGroup(group, s"graft node $node", interruptOnCancel = false)
    val result =
      try body
      finally sc.clearJobGroup()
    // metrics are advisory telemetry: a listener-bus drain timeout (or any
    // snapshot failure) must never fail a node that itself succeeded
    val metrics = Try {
      org.apache.spark.sql.graftshim.ListenerShim.drain(sc)
      listener.snapshot(group)
    }.getOrElse(Map.empty[String, Long])
    (result, metrics)
  }
}
