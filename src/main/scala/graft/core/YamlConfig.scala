package graft.core

import org.yaml.snakeyaml.Yaml

import graft.sources.{Connections, Sources}
import graft.validation.Validation

import scala.jdk.CollectionConverters._

/**
 * YAML pipeline loader (reference: YAML → Pydantic ProjectConfig,
 * odibi/config.py:5696; strict models reject unknown keys :31-70).
 *
 * Shape:
 * {{{
 * name: my_pipeline
 * parallel: true
 * nodes:
 *   - name: bronze_orders
 *     read: { format: parquet, path: /data/orders }
 *     steps:
 *       - sql: SELECT * FROM df WHERE o_totalprice > 0
 *       - function: my_transformer
 *         params: { threshold: 10 }
 *     tests:
 *       - { name: pk_unique, kind: unique, columns: [o_orderkey], severity: fail }
 *     write: { format: parquet, mode: overwrite, path: /out/orders }
 *   - name: agg
 *     depends_on: [bronze_orders]
 *     steps: [ { sql: "SELECT o_custkey, count(*) n FROM df GROUP BY 1" } ]
 * }}}
 */
object YamlConfig {

  private val knownNodeKeys = Set("name", "depends_on", "input", "read",
    "incremental", "contracts", "pre_sql", "steps", "transformer", "params",
    "semantic", "tests", "validation", "write", "streaming", "post_sql",
    "cache", "retries", "tags", "enabled")

  /** Load from a file; sql_file steps resolve relative to the file's dir. */
  def loadPipelineFile(path: String): Pipeline.PipelineConfig = {
    val p = java.nio.file.Paths.get(path)
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    loadPipeline(text, baseDir = Option(p.getParent).map(_.toString))
  }

  /** Multi-pipeline project (reference ProjectConfig: `project:` name +
    * `pipelines:` list, planning.py:830-860). Pipelines share the
    * project-level blocks (connections/semantics/recipes/alerts/
    * spark_config/catalog_root); pipeline-level keys override. */
  final case class ProjectConfig(name: String,
                                 pipelines: Seq[Pipeline.PipelineConfig])

  def loadProjectFile(path: String): ProjectConfig = {
    val p = java.nio.file.Paths.get(path)
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    loadProject(text, baseDir = Option(p.getParent).map(_.toString))
  }

  def loadProject(yamlText: String,
                  baseDir: Option[String] = None): ProjectConfig = {
    val yaml = new Yaml()
    val root = anyToScala(yaml.load[Any](yamlText)).asInstanceOf[Map[String, Any]]
    val entries = root.getOrElse("pipelines",
      throw new IllegalArgumentException("project file needs a 'pipelines' list"))
      .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
    val names = entries.map(e => e.getOrElse("pipeline",
      throw new IllegalArgumentException("each pipelines entry needs 'pipeline' (name)")).toString)
    require(names.distinct.size == names.size,
      s"duplicate pipeline names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val shared = root - "project" - "pipelines"
    val pipelines = entries.zip(names).map { case (e, n) =>
      loadPipelineRoot(shared ++ (e - "pipeline") + ("name" -> n), baseDir)
    }
    ProjectConfig(root.get("project").map(_.toString).getOrElse("project"), pipelines)
  }

  def loadPipeline(yamlText: String,
                   baseDir: Option[String] = None): Pipeline.PipelineConfig = {
    val yaml = new Yaml()
    loadPipelineRoot(
      anyToScala(yaml.load[Any](yamlText)).asInstanceOf[Map[String, Any]], baseDir)
  }

  /** Exposed for [[Planner]]'s project-shape validation. */
  private[graft] def loadPipelineRootMap(root: Map[String, Any],
                                         baseDir: Option[String]): Pipeline.PipelineConfig =
    loadPipelineRoot(root, baseDir)

  private def loadPipelineRoot(rawRoot: Map[String, Any],
                               baseDir: Option[String]): Pipeline.PipelineConfig = {
    // recipe templates expand before strict parsing (reference
    // resolve_recipes: after YAML load, before model validation)
    val root = Recipes.resolve(rawRoot)
    val pipelineName = root.getOrElse("name", "pipeline").toString
    val catalogRoot = root.get("catalog_root").map(_.toString)
    // connections: named base URIs / JDBC URLs + default options
    // (reference: odibi/connections/, `connection:` key on read/write)
    val connections: Map[String, Connections.Connection] =
      root.get("connections").collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]]
      }.getOrElse(Map.empty).map { case (n, v) =>
          val cm = v.asInstanceOf[Map[String, Any]]
          strict(cm, Set("kind", "base_path", "url", "options"), s"connection $n")
          n -> Connections.Connection(
            kind = cm.get("kind").map(_.toString)
              .getOrElse(if (cm.contains("url")) "jdbc" else "file"),
            base = cm.get("base_path").orElse(cm.get("url")).map(_.toString)
              .getOrElse(throw new IllegalArgumentException(
                s"connection $n: needs base_path or url")),
            options = cm.getOrElse("options", Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]].map { case (k, x) => k -> x.toString })
        }
    def connOf(v: Any): Option[String] =
      v.asInstanceOf[Map[String, Any]].get("connection").map(_.toString)
    // project-level semantic model (reference: semantics config in project
    // YAML, odibi/semantics/metrics.py:17-265) — shared by every node with
    // a `semantic:` query
    val semanticModel = root.get("semantics").map(semanticModelCfg)
    val nodes = root.getOrElse("nodes", Nil).asInstanceOf[Seq[Any]].map { n =>
      val m = n.asInstanceOf[Map[String, Any]]
      val unknown = m.keySet -- knownNodeKeys
      require(unknown.isEmpty,
        s"node ${m.getOrElse("name", "?")}: unknown keys $unknown (strict config)")
      // validation: { tests: [...], gate: {min_pass_rate, on_fail},
      //               quarantine: {path} } — the reference's nested block
      // (config.py ValidationConfig); top-level `tests:` also accepted
      val vblock = m.get("validation").map(_.asInstanceOf[Map[String, Any]])
      val gate = vblock.flatMap(_.get("gate")).map(_.asInstanceOf[Map[String, Any]])
      Pipeline.NodeConfig(
        name = m("name").toString,
        dependsOn = seqOf(m.get("depends_on")),
        input = m.get("input").map(_.toString),
        catalogRoot = catalogRoot,
        read = m.get("read").map(r =>
          Connections.applyToRead(readCfg(r), connOf(r), connections)),
        incremental = m.get("incremental").map(incrementalCfg),
        contracts = m.get("contracts").map(contractCfg),
        preSql = seqOf(m.get("pre_sql")),
        steps = m.getOrElse("steps", Nil).asInstanceOf[Seq[Any]].map(stepCfg),
        transformer = m.get("transformer").map(_.toString),
        transformerParams = m.getOrElse("params", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]],
        semantic = m.get("semantic").map { s =>
          val model = semanticModel.getOrElse(throw new IllegalArgumentException(
            s"node ${m("name")}: semantic query declared but the project " +
              "has no top-level semantics: block"))
          s match {
            case sm: Map[_, _] =>
              val block = sm.asInstanceOf[Map[String, Any]]
              strict(block, Set("query", "incremental"), "semantic block")
              val inc = block.get("incremental").map(_.asInstanceOf[Map[String, Any]])
                .map { im =>
                  strict(im, Set("grain", "strategies", "filter"),
                    "semantic.incremental block")
                  graft.semantics.Semantics.SemanticIncremental(
                    grain = seqOf(im.get("grain")),
                    strategies = im.getOrElse("strategies", Map.empty[String, Any])
                      .asInstanceOf[Map[String, Any]]
                      .map { case (k, v) => k -> v.toString },
                    filter = im.get("filter").map(_.toString))
                }
              graft.semantics.Semantics.SemanticNode(block("query").toString,
                model, pipelineName, catalogRoot, inc)
            case other => // shorthand: semantic: "revenue BY month"
              graft.semantics.Semantics.SemanticNode(other.toString,
                model, pipelineName, catalogRoot)
          }
        },
        tests = (m.getOrElse("tests", Nil).asInstanceOf[Seq[Any]] ++
          vblock.flatMap(_.get("tests")).map(_.asInstanceOf[Seq[Any]]).getOrElse(Nil))
          .map(testCfg),
        gateMinPassRate = gate.flatMap(_.get("min_pass_rate")).map(_.toString.toDouble),
        gateOnFail = gate.flatMap(_.get("on_fail")).map(_.toString).getOrElse("abort"),
        quarantinePath = vblock.flatMap(_.get("quarantine"))
          .flatMap(_.asInstanceOf[Map[String, Any]].get("path")).map(_.toString),
        streamingWrite = m.get("streaming").map { sw =>
          // the streaming sink path never runs the batch writer, so a
          // zorder_by there would be accepted and silently ignored
          require(!m.get("write").exists(_.asInstanceOf[Map[String, Any]]
            .contains("zorder_by")),
            s"node ${m("name")}: zorder_by is batch-only; a streaming " +
              "write cannot Z-cluster (cluster in a downstream batch node)")
          streamingCfg(sw)
        },
        writePath = m.get("write").flatMap { w =>
          val raw = w.asInstanceOf[Map[String, Any]].get("path").map(_.toString)
          // a bare `connection:` with no path is NOT a sink; a path
          // resolves under the connection's base URI
          raw.map(p => Connections.applyToWrite(Some(p), Sources.WriteConfig(),
            connOf(w), connections)._1.get)
        },
        write = m.get("write").map(w =>
          Connections.applyToWrite(None, writeCfg(w), connOf(w), connections)._2)
          .getOrElse(Sources.WriteConfig()),
        postSql = seqOf(m.get("post_sql")),
        cache = m.get("cache").exists(_.toString.toBoolean),
        retries = m.get("retries").map(_.toString.toInt).getOrElse(0),
        tags = seqOf(m.get("tags")),
        enabled = m.get("enabled").forall(_.toString.toBoolean))
    }
    Pipeline.PipelineConfig(
      name = pipelineName,
      nodes = nodes,
      parallel = root.get("parallel").exists(_.toString.toBoolean),
      maxWorkers = root.get("max_workers").map(_.toString.toInt).getOrElse(4),
      sparkConf = root.getOrElse("spark_config", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString },
      baseDir = baseDir,
      // alerts: [{channel: file|console|webhook, target, on_events, max_alerts}]
      // (reference AlertConfig, config.py:162-240; `type:`/`url:` accepted
      // as aliases for channel/target)
      alerts = root.getOrElse("alerts", Nil).asInstanceOf[Seq[Any]].map { a =>
        val m = a.asInstanceOf[Map[String, Any]]
        strict(m, Set("channel", "type", "target", "path", "url",
          "on_events", "max_alerts"), "alert config")
        Alerts.AlertConfig(
          channel = m.get("channel").orElse(m.get("type"))
            .map(_.toString).getOrElse("console"),
          target = m.get("target").orElse(m.get("path")).orElse(m.get("url"))
            .map(_.toString),
          onEvents = seqOf(m.get("on_events")) match {
            case Nil => Seq("on_failure", "on_gate_block")
            case s => s
          },
          maxAlerts = m.get("max_alerts").map(_.toString.toInt))
      })
  }

  private def seqOf(v: Option[Any]): Seq[String] =
    v.map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Nil)

  /** Strict-model key check (the reference's Pydantic `extra="forbid"`). */
  private def strict(m: Map[String, Any], known: Set[String], what: String): Unit = {
    val unknown = m.keySet -- known
    require(unknown.isEmpty, s"$what: unknown keys $unknown (strict config)")
  }

  /**
   * semantics: block → SemanticModel (reference MetricDefinition /
   * DimensionDefinition, odibi/semantics/metrics.py:17-265):
   * {{{
   * semantics:
   *   metrics:
   *     - { name: revenue, expr: "sum(amount)", source: "$pipe.fact" }
   *     - { name: aov, formula: "revenue / NULLIF(order_count, 0)" }
   *   dimensions:
   *     - { name: month, column: order_date, time_grain: month }
   * }}}
   * A derived metric without an explicit source inherits the first simple
   * metric's source (components must share the source table anyway).
   */
  /** Exposed for [[Planner]]'s dry-run semantics validation. */
  private[graft] def parseSemanticModel(v: Any): graft.semantics.Semantics.SemanticModel =
    semanticModelCfg(v)

  private def semanticModelCfg(v: Any): graft.semantics.Semantics.SemanticModel = {
    import graft.semantics.Semantics
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, Set("metrics", "dimensions"), "semantics block")
    val metricMaps = m.getOrElse("metrics", Nil).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    val defaultSource = metricMaps.find(mm => !mm.contains("formula"))
      .flatMap(_.get("source")).map(_.toString)
    val metrics = metricMaps.map { mm =>
      strict(mm, Set("name", "label", "description", "expr", "source",
        "filters", "type", "components", "formula"), "metric definition")
      val name = mm("name").toString
      name -> Semantics.Metric(
        name = name,
        expr = mm.getOrElse("expr", "").toString,
        source = mm.get("source").map(_.toString).orElse(defaultSource)
          .getOrElse(throw new IllegalArgumentException(
            s"metric $name: no source and no simple metric to inherit one from")),
        filters = seqOf(mm.get("filters")),
        formula = mm.get("formula").map(_.toString))
    }.toMap
    val dimensions = m.getOrElse("dimensions", Nil).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]]).map { dm =>
        strict(dm, Set("name", "label", "description", "column", "time_grain"),
          "dimension definition")
        val name = dm("name").toString
        name -> Semantics.Dimension(name,
          dm.getOrElse("column", name).toString,
          dm.get("time_grain").map(_.toString))
      }.toMap
    Semantics.SemanticModel(metrics, dimensions)
  }

  private[graft] val readKeys = Set("format", "path", "table", "schema_ddl",
    "streaming", "options", "connection")
  private[graft] val writeKeys = Set("format", "mode", "path", "partition_by",
    "coalesce_partitions", "options", "connection", "zorder_by",
    "target_file_size_mb")
  private[graft] val incrementalKeys = Set("column", "mode", "lookback_seconds",
    "watermark_lag_seconds", "fallback_column")
  private[graft] val contractKeys = Set("schema_ddl", "schema_mode",
    "on_new_columns", "on_missing_columns")
  private[graft] val streamingKeys = Set("checkpoint", "output_mode", "trigger",
    "merge", "await")

  private def readCfg(v: Any): Sources.ReadConfig = {
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, readKeys, "read block")
    Sources.ReadConfig(
      format = m.getOrElse("format", "parquet").toString,
      path = m.get("path").map(_.toString),
      table = m.get("table").map(_.toString),
      schemaDdl = m.get("schema_ddl").map(_.toString),
      streaming = m.get("streaming").exists(_.toString.toBoolean),
      options = m.getOrElse("options", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].map { case (k, x) => k -> x.toString })
  }

  /** streaming: write block (reference: odibi/config.py:4023-4160). */
  private def streamingCfg(v: Any): Pipeline.StreamingWriteConfig = {
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, streamingKeys, "streaming block")
    val trig = m.get("trigger").map(_.asInstanceOf[Map[String, Any]])
    val merge = m.get("merge").map(_.asInstanceOf[Map[String, Any]])
    Pipeline.StreamingWriteConfig(
      checkpoint = m.getOrElse("checkpoint",
        throw new IllegalArgumentException("streaming write requires 'checkpoint'")).toString,
      outputMode = m.getOrElse("output_mode", "append").toString,
      trigger = trig.flatMap(_.get("kind")).map(_.toString).getOrElse("available_now"),
      triggerInterval = trig.flatMap(_.get("interval")).map(_.toString)
        .getOrElse("10 seconds"),
      mergeKeys = merge.map(mm => seqOf(mm.get("keys"))).getOrElse(Nil),
      mergeStrategy = merge.flatMap(_.get("strategy")).map(_.toString)
        .getOrElse("upsert"),
      mergeOptions = merge.map(_.collect {
        case (k, v) if k != "keys" && k != "strategy" => k -> v.toString
      }).getOrElse(Map.empty),
      await = m.get("await").forall(_.toString.toBoolean))
  }

  private def writeCfg(v: Any): Sources.WriteConfig = {
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, writeKeys, "write block")
    Sources.WriteConfig(
      format = m.getOrElse("format", "parquet").toString,
      mode = m.getOrElse("mode", "overwrite").toString,
      partitionBy = seqOf(m.get("partition_by")),
      coalescePartitions = m.get("coalesce_partitions").map(_.toString.toInt),
      options = m.getOrElse("options", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].map { case (k, x) => k -> x.toString },
      zorderBy = seqOf(m.get("zorder_by")),
      targetFileSizeMb = m.get("target_file_size_mb").map(_.toString.toInt))
  }

  private def contractCfg(v: Any): Sources.ContractConfig = {
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, contractKeys, "contracts block")
    Sources.ContractConfig(
      schemaDdl = m.get("schema_ddl").map(_.toString),
      schemaMode = m.getOrElse("schema_mode", "evolve").toString,
      onNewColumns = m.getOrElse("on_new_columns", "ignore").toString,
      onMissingColumns = m.getOrElse("on_missing_columns", "fill_null").toString)
  }

  private def incrementalCfg(v: Any): Pipeline.IncrementalConfig = {
    val m = v.asInstanceOf[Map[String, Any]]
    strict(m, incrementalKeys, "incremental block")
    Pipeline.IncrementalConfig(
      column = m("column").toString,
      mode = m.getOrElse("mode", "hwm").toString,
      lookbackSeconds = m.get("lookback_seconds").map(_.toString.toLong).getOrElse(86400L),
      watermarkLagSeconds = m.get("watermark_lag_seconds").map(_.toString.toLong).getOrElse(0L),
      fallbackColumn = m.get("fallback_column").map(_.toString))
  }

  private def stepCfg(v: Any): Pipeline.TransformStep = {
    val m = v.asInstanceOf[Map[String, Any]]
    val kinds = Seq("sql", "sql_file", "function", "operation").filter(m.contains)
    require(kinds.size == 1,
      s"step must have exactly one of sql|sql_file|function|operation, got $kinds: $m")
    Pipeline.TransformStep(
      sql = m.get("sql").map(_.toString),
      sqlFile = m.get("sql_file").map(_.toString),
      function = m.get("function").map(_.toString),
      operation = m.get("operation").map(_.toString),
      params = m.getOrElse("params", Map.empty[String, Any]).asInstanceOf[Map[String, Any]])
  }

  private def testCfg(v: Any): Validation.Test = {
    val m = v.asInstanceOf[Map[String, Any]]
    val severity = m.getOrElse("severity", "fail").toString match {
      case "warn" => Validation.Warn
      case "quarantine" => Validation.Quarantine
      case _ => Validation.Fail
    }
    Validation.Test(
      name = m("name").toString,
      kind = m("kind").toString,
      severity = severity,
      columns = seqOf(m.get("columns")),
      values = seqOf(m.get("values")),
      min = m.get("min").map(_.toString.toDouble),
      max = m.get("max").map(_.toString.toDouble),
      sql = m.get("sql").map(_.toString),
      pattern = m.get("pattern").map(_.toString),
      maxAgeHours = m.get("max_age_hours").map(_.toString.toInt))
  }

  /** Recursively convert snakeyaml's java.util collections to Scala.
    * Maps keep insertion order (VectorMap): derive_columns and friends rely
    * on YAML document order. */
  private def anyToScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      scala.collection.immutable.VectorMap.from(
        m.asScala.map { case (k, x) => k.toString -> anyToScala(x) })
    case l: java.util.List[_] => l.asScala.map(anyToScala).toSeq
    case other => other
  }
}
