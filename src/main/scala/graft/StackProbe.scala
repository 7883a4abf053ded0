package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway optimization-round probe: samples the MAIN thread's stack
  * every 5 ms during repeated warm Iceberg hidden-partition writes and
  * prints the most frequent graft/spark frames. Not part of the board. */
object StackProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val op = args.headOption.getOrElse("iceberg_write")
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity",
        "l_extendedprice")
    val orders = s.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    li.limit(1).count(); orders.limit(1).count()
    val rep: () => Unit = op match {
      case "iceberg_write" => () => {
        val root = java.nio.file.Files.createTempDirectory("probe_sw").toString + "/t"
        graft.sources.IcebergSource.write(li, root,
          partitionBy = Seq("month(l_shipdate)"), clusterWrite = true)
        ()
      }
      case "delta_dv" => () => {
        val root = java.nio.file.Files.createTempDirectory("probe_sw").toString + "/t"
        graft.sources.DeltaWriter.write(orders.coalesce(2), root,
          partitionBy = Seq("o_orderstatus"))
        graft.sources.DeltaDvWriter.delete(s, root, "o_totalprice > 180000")
        ()
      }
      case "iceberg_delete" => () => {
        val root = java.nio.file.Files.createTempDirectory("probe_sw").toString + "/t"
        graft.sources.IcebergSource.write(orders.repartition(2), root,
          partitionBy = Seq("o_orderstatus"))
        graft.sources.IcebergSource.delete(s, root, "o_totalprice > 180000")
        ()
      }
      case other => sys.error(s"unknown op $other")
    }
    // warm-up rep (JIT, codegen caches)
    rep()
    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // classify by the deepest "interesting" frame
        val frame =
          if (st.exists(_.getMethodName.contains("loadPermissionInfo")))
            st.filter { e =>
              val c = e.getClassName
              c.startsWith("graft.") || c.startsWith("org.apache.spark.sql.execution") ||
                c.contains("RawLocalFileSystem") || c.contains("FileSystem") ||
                c.contains("CommitProtocol") || c.contains("FileFormatWriter")
            }.take(8).map(e =>
              s"${e.getClassName.split('.').last}.${e.getMethodName}").mkString(" <- ")
          else st.find { e =>
            val c = e.getClassName
            (c.startsWith("graft.") || c.contains("FileFormatWriter") ||
              c.contains("ParquetFooterReader") || c.contains("AvroFile") ||
              c.contains("InsertIntoHadoopFsRelation") ||
              c.contains("HadoopMapReduceCommitProtocol") ||
              c.contains("AdaptiveSparkPlanExec") ||
              c.contains("QueryExecution") || c.contains("RawLocalFileSystem")) &&
              !c.contains("StackProbe")
          }.map(e => s"${e.getClassName.split('.').last}.${e.getMethodName}")
            .getOrElse(st.headOption.map(e =>
              s"${e.getClassName.split('.').last}.${e.getMethodName}").getOrElse("?"))
        counts.merge(frame, 1, (a, b) => a + b)
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rep())
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)
    import scala.jdk.CollectionConverters._
    val total = counts.values().asScala.map(_.toInt).sum.max(1)
    println(f"=== 5 warm $op reps in $wall%.2f s, $total samples ===")
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (fr, n) =>
      println(f"  ${n.toInt * 100.0 / total}%5.1f%%  $n%5d  $fr")
    }
    s.stop()
  }
}
