package graft

import org.apache.spark.sql.SparkSession

/**
 * Dump `.explain("formatted")` of board queries to files — the
 * optimization-round evidence trail (plans/r17/<query>_<tag>.txt).
 *
 *   sbt "runMain graft.PlanDump before q_iceberg_delete q_delta_dv_delete ..."
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: PlanDump <tag> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // temp fixture paths change per run — normalize for diffing
          val norm = plan.replaceAll("/tmp/[a-zA-Z0-9_]+", "/tmp/FIXTURE")
            .replaceAll("graft_[a-z_]+[0-9]+", "FIXTURE")
          java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
            norm.getBytes("UTF-8"))
          println(s"[plandump] wrote ${name}_$tag.txt")
      }
    }
    spark.stop()
  }
}
