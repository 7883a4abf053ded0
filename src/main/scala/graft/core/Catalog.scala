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

  /**
   * Compact the meta tables: every run appends a coalesce(1) file, so a
   * long-lived catalog accumulates thousands of tiny parquet files and
   * reads slow down linearly. Rewrites each existing meta table to
   * `filesPerTable` files through the atomic temp-dir + rename swap — a
   * crash mid-compaction leaves the old files intact. Returns the
   * compacted table names.
   *
   * Run this as a MAINTENANCE window operation: an append that commits
   * between the snapshot read and the directory swap lands in the old
   * directory and is lost with it — the same single-writer constraint
   * every non-transactional parquet compaction carries.
   */
  def compact(filesPerTable: Int = 1): Seq[String] = {
    val hadoopPath = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hadoopPath)) return Nil
    fs.listStatus(hadoopPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("meta_"))
      .map(_.getPath.getName)
      // never resurrect swap debris from a crashed prior compaction as a
      // table; the next successful swap of the real table cleans it up
      .filterNot(_.contains("_graft_"))
      .map { name =>
        val df = table(name).coalesce(filesPerTable)
        AtomicParquet.overwrite(df, tablePath(name), s"compact-$name")
        name
      }
  }

  /** Record one pipeline run with per-node outcomes + timings. */
  def recordRun(pipeline: String, runId: String,
                nodes: Seq[(String, Boolean, Long, String)]): Unit = {
    append("meta_runs",
      nodes.toDF("node", "success", "duration_ms", "error")
        .withColumn("pipeline", lit(pipeline))
        .withColumn("run_id", lit(runId))
        .withColumn("recorded_at", current_timestamp()))
  }

  /**
   * One row per pipeline run — the reference's `meta_pipeline_runs` grain
   * (catalog.py:183-200), where `meta_runs` keeps the per-node detail
   * (the reference's `meta_node_runs` companion is [[recordNodeRuns]]).
   */
  def recordPipelineRun(pipeline: String, runId: String, success: Boolean,
                        nNodes: Int, nFailed: Int,
                        totalDurationMs: Long): Unit =
    append("meta_pipeline_runs",
      Seq((pipeline, runId, success, nNodes.toLong, nFailed.toLong, totalDurationMs))
        .toDF("pipeline", "run_id", "success", "n_nodes", "n_failed",
          "total_duration_ms")
        .withColumn("recorded_at", current_timestamp()))

  /**
   * One row per (node, run) with write volume — the reference's
   * `meta_node_runs` grain: the per-node outcome of `meta_runs` joined
   * with the rows-written fact, queryable without the run/output join.
   */
  def recordNodeRuns(pipeline: String, runId: String,
                     nodes: Seq[(String, Boolean, Long, Option[Long], String)]): Unit =
    if (nodes.nonEmpty)
      append("meta_node_runs",
        nodes.map { case (n, ok, ms, rows, err) =>
          (n, ok, ms, rows.map(java.lang.Long.valueOf).orNull, err)
        }.toDF("node", "success", "duration_ms", "rows_written", "error")
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))

  /**
   * Executor totals per (node, run) in long format — the WHY behind a
   * slow `duration_ms`: shuffle read/write bytes, memory/disk spill,
   * input bytes, task counts and executor run time from the node's own
   * jobs ([[NodeMetrics]]). `metric` rows only appear for nodes that ran
   * Spark jobs this run.
   */
  def recordNodeMetrics(pipeline: String, runId: String,
                        nodes: Seq[(String, Map[String, Long])]): Unit = {
    val rows = nodes.flatMap { case (n, m) =>
      m.toSeq.map { case (metric, value) => (n, metric, value) }
    }
    if (rows.nonEmpty)
      append("meta_node_metrics",
        rows.toDF("node", "metric", "value")
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))
  }

  /**
   * Alert-transport failures (`meta_observability_errors`,
   * catalog.py:183-200): when an alert channel itself fails (webhook
   * transport down, file sink unwritable), the pipeline must not fail —
   * but the loss of observability has to be observable somewhere. One row
   * per failed delivery.
   */
  def recordObservabilityErrors(pipeline: String, runId: String,
                                errors: Seq[(String, String, String, String)]): Unit =
    if (errors.nonEmpty)
      append("meta_observability_errors",
        errors.toDF("channel", "target", "error_class", "message")
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))

  /** Record node lineage edges (node -> its inputs). */
  def recordLineage(pipeline: String, runId: String,
                    edges: Seq[(String, String)]): Unit =
    append("meta_lineage",
      edges.toDF("node", "input")
        .withColumn("pipeline", lit(pipeline))
        .withColumn("run_id", lit(runId))
        .withColumn("recorded_at", current_timestamp()))

  /**
   * Record column-level lineage for a node's output frame — one row per
   * (output column, source column), derived from the Catalyst analyzed
   * plan by [[Lineage.columnLineage]] (driver-side traversal, nothing
   * executes).
   */
  def recordColumnLineage(pipeline: String, runId: String, node: String,
                          df: DataFrame): Unit = {
    val rows = Lineage.columnLineage(df).toSeq
      .flatMap { case (out, srcs) => srcs.map(out -> _) }
    if (rows.nonEmpty)
      append("meta_column_lineage",
        rows.toDF("column", "source")
          .withColumn("node", lit(node))
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))
  }

  /** Record node sink outputs (path + rows from write metrics). */
  def recordOutputs(pipeline: String, runId: String,
                    outputs: Seq[(String, String, Long)]): Unit =
    if (outputs.nonEmpty)
      append("meta_outputs",
        outputs.toDF("node", "path", "rows_written")
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))

  /** Record validation outcomes per node per run (meta_metrics family). */
  def recordValidation(pipeline: String, runId: String,
                       results: Seq[(String, graft.validation.Validation.TestResult)]): Unit =
    if (results.nonEmpty)
      append("meta_metrics",
        results.map { case (node, r) =>
          (node, r.test.name, r.test.kind, r.passed, r.failedRows, r.detail)
        }.toDF("node", "test", "kind", "passed", "failed_rows", "detail")
          .withColumn("pipeline", lit(pipeline))
          .withColumn("run_id", lit(runId))
          .withColumn("recorded_at", current_timestamp()))

  /** Record node failures with exception class (meta_failures family). */
  def recordFailures(pipeline: String, runId: String,
                     failures: Seq[(String, String, String)]): Unit =
    if (failures.nonEmpty)
      append("meta_failures",
        failures.toDF("node", "error_class", "message")
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

  // ------------------------------------------------------------------
  // Derived health views (the reference's meta_daily_stats /
  // meta_pipeline_health family, catalog.py:183-200) — computed on read
  // from meta_runs/meta_outputs rather than stored, so they can never
  // drift from the facts.
  // ------------------------------------------------------------------

  /** Per-day per-pipeline run stats (meta_daily_stats equivalent). */
  def dailyStats: DataFrame =
    table("meta_runs")
      .groupBy(to_date(col("recorded_at")).as("day"), col("pipeline"))
      .agg(
        countDistinct(col("run_id")).as("n_runs"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("n_node_failures"),
        sum(col("duration_ms")).as("total_duration_ms"))

  /**
   * Resource hotspots per (pipeline, node) across recorded runs — the
   * derived view over `meta_node_metrics` that answers "which node
   * should I tune first": average and peak shuffle write and spill,
   * plus run counts. Rank by `max_spill_bytes` for the salting/
   * partition-count candidates, by `avg_shuffle_write_bytes` for the
   * join-order/broadcast candidates.
   */
  def nodeHotspots: DataFrame = {
    val m = table("meta_node_metrics")
    def metric(name: String) =
      sum(when(col("metric") === name, col("value")).otherwise(0L))
    val perRun = m.groupBy(col("pipeline"), col("node"), col("run_id"))
      .agg(
        metric("shuffle_write_bytes").as("shuffle_write_bytes"),
        (metric("memory_spill_bytes") + metric("disk_spill_bytes")).as("spill_bytes"),
        metric("input_bytes").as("input_bytes"),
        metric("executor_run_time_ms").as("executor_run_time_ms"))
    perRun.groupBy(col("pipeline"), col("node"))
      .agg(
        count(lit(1)).as("n_runs"),
        avg(col("shuffle_write_bytes")).as("avg_shuffle_write_bytes"),
        max(col("shuffle_write_bytes")).as("max_shuffle_write_bytes"),
        avg(col("spill_bytes")).as("avg_spill_bytes"),
        max(col("spill_bytes")).as("max_spill_bytes"),
        avg(col("input_bytes")).as("avg_input_bytes"),
        avg(col("executor_run_time_ms")).as("avg_executor_run_time_ms"))
  }

  /** Per-pipeline health summary (meta_pipeline_health equivalent). */
  def pipelineHealth: DataFrame = {
    val runs = table("meta_runs")
    val perRun = runs.groupBy(col("pipeline"), col("run_id"))
      .agg(min(col("success")).as("run_ok"),
        max(col("recorded_at")).as("finished_at"))
    perRun.groupBy(col("pipeline"))
      .agg(
        count(lit(1)).as("n_runs"),
        avg(col("run_ok").cast("double")).as("success_rate"),
        max(col("finished_at")).as("last_run_at"),
        max(when(col("run_ok"), col("finished_at"))).as("last_success_at"))
  }

  /**
   * Per-pipeline SLA status (meta_sla_status equivalent): age of the last
   * successful run vs an expected cadence. `status` = "ok" (fresh),
   * "late" (last success older than the SLA), "failing" (has runs but no
   * success ever). `asOf` pins the evaluation instant so the view is
   * deterministic/testable; defaults to now.
   */
  def slaStatus(slaHours: Map[String, Double],
                defaultSlaHours: Double = 24.0,
                asOf: Option[java.sql.Timestamp] = None): DataFrame = {
    val now = asOf.map(lit(_)).getOrElse(current_timestamp())
    val sla = typedLit(slaHours)
    pipelineHealth.select(
      col("pipeline"),
      col("last_success_at"),
      coalesce(element_at(sla, col("pipeline")), lit(defaultSlaHours))
        .as("sla_hours"),
      round((now.cast("double") - col("last_success_at").cast("double")) / 3600.0, 6)
        .as("hours_since_success"))
      .withColumn("status",
        when(col("last_success_at").isNull, lit("failing"))
          .when(col("hours_since_success") > col("sla_hours"), lit("late"))
          .otherwise(lit("ok")))
  }

  /**
   * Latest recorded sink path for a pipeline node — the resolution target
   * of a semantic-layer `$pipeline.node` source reference
   * (odibi/semantics/query.py:294-369 resolves through the same catalog).
   */
  def latestOutputPath(pipeline: String, node: String): Option[String] =
    try {
      table("meta_outputs")
        .filter(col("pipeline") === pipeline && col("node") === node)
        .orderBy(col("recorded_at").desc).limit(1)
        .select("path").as[String].collect().headOption
    } catch { case _: Throwable => None }

  /**
   * Average rows written by a node over its recent runs — the baseline for
   * volume-drop validation (reference get_average_volume, volume_drop test
   * wired through the catalog in pipeline validation).
   */
  def averageRowsWritten(pipeline: String, node: String, lastN: Int = 7): Option[Double] =
    try {
      val rows = table("meta_outputs")
        .filter(col("pipeline") === pipeline && col("node") === node)
        .orderBy(col("recorded_at").desc).limit(lastN)
        .agg(avg(col("rows_written"))).as[Option[Double]].collect().headOption.flatten
      rows
    } catch { case _: Throwable => None }

  /**
   * Volume-drop gate: fails when this run's rows_written fell more than
   * `threshold` (fraction) below the node's recent average. Returns the
   * drop fraction when breached.
   */
  def volumeDropCheck(pipeline: String, node: String, currentRows: Long,
                      threshold: Double = 0.5, lastN: Int = 7): Option[Double] =
    averageRowsWritten(pipeline, node, lastN).filter(_ > 0).flatMap { avgRows =>
      val drop = (avgRows - currentRows) / avgRows
      if (drop > threshold) Some(drop) else None
    }

  // ------------------------------------------------------------------
  // meta_pipelines / meta_nodes / meta_state (catalog.py:183-200; deploy
  // registration :1205-1290; pipeline hash lookup :3034-3045). Appends
  // with latest-wins reads stand in for the reference's Delta MERGE.
  // ------------------------------------------------------------------

  /** Register (upsert) the pipeline definition + per-node configs. */
  def registerPipeline(cfg: Pipeline.PipelineConfig,
                       description: String = "", tags: Seq[String] = Nil): Unit = {
    append("meta_pipelines",
      Seq((cfg.name, Catalog.pipelineHash(cfg), cfg.nodes.size.toLong,
        description, tags.mkString(",")))
        .toDF("pipeline", "version_hash", "n_nodes", "description", "tags")
        .withColumn("recorded_at", current_timestamp()))
    append("meta_nodes",
      cfg.nodes.map(n => (cfg.name, n.name, Pipeline.nodeHash(n),
        n.dependsOn.mkString(","), n.tags.mkString(","), n.enabled))
        .toDF("pipeline", "node", "config_hash", "depends_on", "tags", "enabled")
        .withColumn("recorded_at", current_timestamp()))
    // meta_patterns (catalog.py:183-200): which registered pattern each
    // node invokes — the deploy-time usage inventory of the pattern layer
    val patternRows = cfg.nodes.flatMap(n => n.transformer
      .filter(graft.patterns.PatternRegistry.names.contains)
      .map(p => (cfg.name, n.name, p)))
    if (patternRows.nonEmpty)
      append("meta_patterns",
        patternRows.toDF("pipeline", "node", "pattern")
          .withColumn("recorded_at", current_timestamp()))
  }

  /**
   * The catalog's own registry (`meta_tables`): one row per meta table —
   * stored tables with their physical paths plus the derived views.
   * Computed on read (it can never drift from what is actually present);
   * `Tools catalog <root> --tables` renders it.
   */
  def tablesRegistry: DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stored = Catalog.storedTables.map { t =>
      (t, "stored", tablePath(t),
        fs.exists(new org.apache.hadoop.fs.Path(tablePath(t))))
    }
    val derived = Catalog.derivedViews.map(t => (t, "derived", "", true))
    (stored ++ derived).toDF("table", "kind", "path", "exists")
  }

  /** Latest registered version hash for a pipeline (drift baseline). */
  def getPipelineHash(pipeline: String): Option[String] =
    try {
      table("meta_pipelines").filter(col("pipeline") === pipeline)
        .orderBy(col("recorded_at").desc).limit(1)
        .select("version_hash").as[String].collect().headOption
    } catch { case _: Throwable => None }

  /**
   * Drift check against the deployed definition (pipeline.py:487-520):
   * Some(deployedHash) when the local config differs from the catalog,
   * None when clean or never deployed.
   */
  def configDrift(cfg: Pipeline.PipelineConfig): Option[String] =
    getPipelineHash(cfg.name).filter(_ != Catalog.pipelineHash(cfg))

  /**
   * HWM / run state stored in the catalog (`meta_state`, the reference's
   * CatalogStateBackend): key-value with latest-wins semantics, so
   * incremental loads and resume share state with the rest of the catalog.
   */
  def state: graft.operators.Incremental.StateBackend =
    new graft.operators.Incremental.StateBackend {
      override def get(key: String): Option[String] =
        try {
          table("meta_state").filter(col("key") === key)
            .orderBy(col("recorded_at").desc).limit(1)
            .select("value").as[String].collect().headOption
        } catch { case _: Throwable => None }
      override def set(key: String, value: String): Unit =
        append("meta_state", Seq((key, value)).toDF("key", "value")
          .withColumn("recorded_at", current_timestamp()))
    }
}

object Catalog {

  /** Stored meta tables (physical parquet under the catalog root) —
    * mirrors the reference's 18-table list (catalog.py:183-200) minus the
    * health views, which are derived on read here. */
  val storedTables: Seq[String] = Seq(
    "meta_pipelines", "meta_nodes", "meta_runs", "meta_pipeline_runs",
    "meta_node_runs", "meta_lineage", "meta_column_lineage", "meta_outputs",
    "meta_metrics", "meta_node_metrics", "meta_failures", "meta_observability_errors",
    "meta_schemas", "meta_patterns", "meta_state",
    "meta_derived_applied_runs")

  /** Views computed on read from the stored facts (never drift). */
  val derivedViews: Seq[String] = Seq(
    "meta_daily_stats", "meta_pipeline_health", "meta_sla_status",
    "meta_tables")

  /** Stable hash of the whole pipeline config (deploy/drift baseline). */
  def pipelineHash(cfg: Pipeline.PipelineConfig): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(cfg.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /**
   * Run a pipeline with catalog recording: runs, lineage, schemas.
   * Timings come from wall-clock around each node's materialization, not
   * from extra count() actions (SURVEY §4 double-evaluation note).
   *
   * The drift gate (pipeline.py:487-520) runs first: when the local config
   * differs from the deployed `meta_pipelines` hash, the run either fails
   * (`failOnDrift`) or proceeds with the drift recorded in the run error
   * field of a `_drift_check` pseudo-node.
   */
  def runRecorded(spark: SparkSession, cfg: Pipeline.PipelineConfig,
                  catalog: Catalog, runId: String,
                  externalDatasets: Map[String, DataFrame] = Map.empty,
                  opts: Pipeline.RunOptions = Pipeline.RunOptions(),
                  failOnDrift: Boolean = false)
      : Map[String, Pipeline.NodeResult] = {
    catalog.configDrift(cfg).foreach { deployed =>
      val msg = s"DRIFT: local ${pipelineHash(cfg).take(8)} != deployed ${deployed.take(8)}"
      if (failOnDrift) throw new IllegalStateException(msg)
      catalog.recordRun(cfg.name, runId, Seq(("_drift_check", false, 0L, msg)))
    }
    // alert-channel failures buffer during the run, recorded after it —
    // the dispatcher must stay non-blocking and side-effect-safe
    val alertErrors = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String, String)]()
    val recordingOpts = opts.copy(onAlertError = (acfg, e) => {
      alertErrors.add((acfg.channel, acfg.target.getOrElse(""),
        e.getClass.getName, Option(e.getMessage).getOrElse("")))
      opts.onAlertError(acfg, e)
    })
    val results = Pipeline.run(spark, cfg, externalDatasets, recordingOpts)
    catalog.recordRun(cfg.name, runId, cfg.nodes.map { n =>
      val r = results.get(n.name)
      // skipped nodes record success=true with the reason in the error
      // field (the reference marks skips successful with metadata.reason)
      (n.name, r.exists(_.failure.isEmpty),
        r.map(_.durationMs).getOrElse(0L),
        r.flatMap(_.failure).map(_.getMessage)
          .orElse(r.flatMap(_.skipReason).map("skipped: " + _)).getOrElse(""))
    })
    // the reference's pipeline_runs / node_runs split (catalog.py:183-200)
    catalog.recordPipelineRun(cfg.name, runId,
      success = cfg.nodes.forall(n => results.get(n.name).exists(_.failure.isEmpty)),
      nNodes = cfg.nodes.size,
      nFailed = cfg.nodes.count(n => results.get(n.name).exists(_.failure.nonEmpty)),
      totalDurationMs = cfg.nodes.flatMap(n => results.get(n.name)).map(_.durationMs).sum)
    catalog.recordNodeRuns(cfg.name, runId, cfg.nodes.map { n =>
      val r = results.get(n.name)
      (n.name, r.exists(_.failure.isEmpty), r.map(_.durationMs).getOrElse(0L),
        r.flatMap(_.rowsWritten),
        r.flatMap(_.failure).map(_.getMessage)
          .orElse(r.flatMap(_.skipReason).map("skipped: " + _)).getOrElse(""))
    })
    catalog.recordNodeMetrics(cfg.name, runId, cfg.nodes.flatMap { n =>
      results.get(n.name).filter(_.metrics.nonEmpty).map(r => n.name -> r.metrics)
    })
    catalog.recordObservabilityErrors(cfg.name, runId,
      alertErrors.toArray(Array.empty[(String, String, String, String)]).toSeq)
    catalog.recordLineage(cfg.name, runId,
      cfg.nodes.flatMap(n => n.dependsOn.map(d => n.name -> d)))
    catalog.recordOutputs(cfg.name, runId, cfg.nodes.flatMap { n =>
      for {
        r <- results.get(n.name)
        rows <- r.rowsWritten
        path <- n.writePath
      } yield (n.name, path, rows)
    })
    catalog.recordFailures(cfg.name, runId, cfg.nodes.flatMap { n =>
      results.get(n.name).flatMap(_.failure)
        .map(e => (n.name, e.getClass.getName, Option(e.getMessage).getOrElse("")))
    })
    catalog.recordValidation(cfg.name, runId, cfg.nodes.flatMap { n =>
      results.get(n.name).toSeq.flatMap(_.validation.map(n.name -> _))
    })
    results.foreach { case (name, r) =>
      if (r.failure.isEmpty && !r.skipped) {
        catalog.recordSchema(cfg.name, name, r.df)
        // lineage from the pre-write plan when the node's df is a
        // lineage-truncating sink read-back
        catalog.recordColumnLineage(cfg.name, runId, name,
          r.lineageDf.getOrElse(r.df))
      }
    }
    results
  }
}
