package graft.core

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/**
 * Dry-run planner (reference: odibi/planning.py — bounded-safe YAML load
 * :417-565, shape validation :602-700, LogicalProjectPlan/:163-202 JSON
 * response). Validates a pipeline YAML into a logical plan WITHOUT a
 * SparkSession and without executing anything: every problem becomes a
 * typed [[Planner.Diagnostic]] instead of the first-error exception the
 * runtime loader throws, so an editor/CI integration can show all issues
 * at once. When no error-severity diagnostic is found, the response
 * carries the logical plan: per-node kinds, dependency edges and the
 * parallel execution layers the runtime would use.
 */
object Planner {

  /** Input bounds (planning.py PlanningLimits:34-68). */
  final case class Limits(maxBytes: Int = 1 << 20,
                          maxNodes: Int = 500,
                          maxDepth: Int = 32)

  /** severity ∈ error | warning; subject is the node (or "_project"). */
  final case class Diagnostic(code: String, severity: String,
                              subject: String, message: String)

  final case class NodePlan(name: String,
                            kind: String, // source|semantic|generator|transform
                            dependsOn: Seq[String],
                            readFormat: Option[String],
                            stepKinds: Seq[String],
                            transformer: Option[String],
                            nTests: Int,
                            writePath: Option[String],
                            streaming: Boolean)

  final case class ProjectPlan(pipeline: String,
                               nodes: Seq[NodePlan],
                               edges: Seq[(String, String)], // dep -> node
                               layers: Seq[Seq[String]])

  final case class PlanningResponse(valid: Boolean,
                                    plan: Option[ProjectPlan],
                                    diagnostics: Seq[Diagnostic],
                                    pipelinePlans: Seq[ProjectPlan] = Nil) {
    def errors: Seq[Diagnostic] = diagnostics.filter(_.severity == "error")

    def toJson: String = {
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      def opt(o: Option[String]) = o.map(q).getOrElse("null")
      val diags = diagnostics.map(d =>
        s"""{"code": ${q(d.code)}, "severity": ${q(d.severity)}, "subject": ${q(d.subject)}, "message": ${q(d.message)}}""")
      def planJsonOf(p: ProjectPlan): String = {
        val nodes = p.nodes.map(n =>
          s"""{"name": ${q(n.name)}, "kind": ${q(n.kind)}, "depends_on": [${
            n.dependsOn.map(q).mkString(", ")}], "read_format": ${opt(n.readFormat)}, "steps": [${
            n.stepKinds.map(q).mkString(", ")}], "transformer": ${opt(n.transformer)}, "n_tests": ${
            n.nTests}, "write_path": ${opt(n.writePath)}, "streaming": ${n.streaming}}""")
        val edges = p.edges.map { case (a, b) => s"[${q(a)}, ${q(b)}]" }
        val layers = p.layers.map(l => s"[${l.map(q).mkString(", ")}]")
        s"""{"pipeline": ${q(p.pipeline)}, "nodes": [${nodes.mkString(", ")}], "edges": [${
          edges.mkString(", ")}], "layers": [${layers.mkString(", ")}]}"""
      }
      val planJson = plan.map(planJsonOf).getOrElse("null")
      val pipelinesJson =
        if (pipelinePlans.isEmpty) ""
        else s""", "pipelines": [${pipelinePlans.map(planJsonOf).mkString(", ")}]"""
      s"""{"valid": $valid, "plan": $planJson$pipelinesJson, "diagnostics": [${diags.mkString(", ")}]}"""
    }
  }

  private val nodeKeys = Set("name", "depends_on", "input", "read",
    "incremental", "contracts", "pre_sql", "steps", "transformer", "params",
    "semantic", "tests", "validation", "write", "streaming", "post_sql",
    "cache", "retries", "tags", "enabled")
  private[graft] def nodeKeySet: Set[String] = nodeKeys

  private val stepKeys = Set("sql", "sql_file", "function", "operation")

  private val testKinds = Set("not_null", "accepted_values", "range",
    "regex_match", "custom_sql", "unique", "row_count", "freshness",
    "schema", "volume_drop", "distribution")
  private[graft] def testKindSet: Set[String] = testKinds

  private val writeModes = Set("overwrite", "append", "ignore", "error",
    "errorifexists")

  private val builtinOperations = Set("pivot", "drop_duplicates", "fillna",
    "drop", "rename", "sort", "sample")

  def planFile(path: String, limits: Limits = Limits()): PlanningResponse = {
    val p = java.nio.file.Paths.get(path)
    val baseDir = Option(p.getParent).map(_.toString)
    // env + .env placeholder resolution, same order the Run CLI uses
    // (minus --set, which the Plan main doesn't take)
    val text = Secrets.substitute(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"),
      Map.empty, baseDir)
    plan(text, baseDir = baseDir, limits = limits)
  }

  /**
   * Validate and plan. All structural problems are collected (not
   * first-error); the plan is built only when no error remains, by the
   * same loader the runtime uses ([[YamlConfig.loadPipeline]]) so the
   * planner can never accept a config the runtime would reject.
   */
  def plan(yamlText: String, baseDir: Option[String] = None,
           limits: Limits = Limits()): PlanningResponse = {
    val diags = scala.collection.mutable.ArrayBuffer.empty[Diagnostic]
    def err(code: String, subject: String, msg: String): Unit =
      diags += Diagnostic(code, "error", subject, msg)
    def warn(code: String, subject: String, msg: String): Unit =
      diags += Diagnostic(code, "warning", subject, msg)

    if (yamlText.getBytes("UTF-8").length > limits.maxBytes) {
      err("input_too_large", "_project",
        s"YAML exceeds ${limits.maxBytes} bytes")
      return PlanningResponse(valid = false, None, diags.toSeq)
    }

    // bounded-safe load (planning.py _BoundedSafeLoader:417): SafeConstructor
    // refuses arbitrary-object tags; depth/alias bombs are caught by the
    // depth check below
    val loaded = Try {
      val opts = new LoaderOptions()
      opts.setMaxAliasesForCollections(50)
      anyToScala(new Yaml(new SafeConstructor(opts)).load[Any](yamlText), 0, limits)
    }
    val rawRoot = loaded match {
      case Failure(e) =>
        err("yaml_invalid", "_project",
          Option(e.getMessage).getOrElse(e.toString).linesIterator.take(3).mkString(" "))
        return PlanningResponse(valid = false, None, diags.toSeq)
      case Success(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case Success(_) =>
        err("yaml_invalid", "_project", "root must be a mapping")
        return PlanningResponse(valid = false, None, diags.toSeq)
    }

    // multi-pipeline project shape (planning.py:830-860): validate each
    // pipeline against the shared blocks; diagnostics carry
    // "pipeline/node" subjects and the response aggregates the per-
    // pipeline plans
    if (rawRoot.contains("pipelines")) {
      rawRoot.getOrElse("pipelines", Nil) match {
        case entries: Seq[_] if entries.nonEmpty =>
          val shared = rawRoot - "project" - "pipelines"
          val seen = scala.collection.mutable.Set.empty[String]
          val plans = entries.flatMap {
            case em: Map[_, _] =>
              val e = em.asInstanceOf[Map[String, Any]]
              val name = e.get("pipeline").map(_.toString).getOrElse {
                err("pipeline_invalid", "_project", "pipelines entry without 'pipeline' (name)")
                "?"
              }
              if (!seen.add(name))
                err("duplicate_pipeline", name, s"pipeline '$name' declared twice")
              val sub = planRoot(shared ++ (e - "pipeline") + ("name" -> name),
                baseDir, limits)
              diags ++= sub.diagnostics.map(d =>
                d.copy(subject = if (d.subject == "_project") name
                  else s"$name/${d.subject}"))
              sub.plan
            case other =>
              err("pipeline_invalid", "_project", s"pipelines entry is not a mapping: $other")
              None
          }
          val ok = !diags.exists(_.severity == "error")
          return PlanningResponse(ok, None, diags.toSeq,
            pipelinePlans = if (ok) plans else Nil)
        case _ =>
          err("pipelines_invalid", "_project", "'pipelines' must be a non-empty list")
          return PlanningResponse(valid = false, None, diags.toSeq)
      }
    }

    val sub = planRoot(rawRoot, baseDir, limits)
    PlanningResponse(sub.valid && !diags.exists(_.severity == "error"),
      sub.plan, diags.toSeq ++ sub.diagnostics)
  }

  /** Validate one pipeline-root map (single-pipeline file, or one entry
    * of a project's `pipelines:` merged with the shared blocks). */
  private def planRoot(rawRoot: Map[String, Any], baseDir: Option[String],
                       limits: Limits): PlanningResponse = {
    val diags = scala.collection.mutable.ArrayBuffer.empty[Diagnostic]
    def err(code: String, subject: String, msg: String): Unit =
      diags += Diagnostic(code, "error", subject, msg)
    def warn(code: String, subject: String, msg: String): Unit =
      diags += Diagnostic(code, "warning", subject, msg)

    // expand recipe templates first, as the runtime loader does; a broken
    // recipe (unknown name, missing vars, bad template) is a diagnostic
    val root = Try(Recipes.resolve(rawRoot)) match {
      case Success(r) => r
      case Failure(e) =>
        err("recipe_invalid", "_project", Option(e.getMessage).getOrElse(e.toString))
        return PlanningResponse(valid = false, None, diags.toSeq)
    }

    StandardTransformers.registerAll

    // surface discovered extensions: loaded plugins as info (so a user
    // can see WHY an off-catalog transformer name resolved), failures as
    // warnings (a broken plugin never blocks planning — reference
    // plugins.py logs-and-continues the same way)
    Plugins.loadAll.foreach { p =>
      p.error match {
        case None =>
          diags += Diagnostic("plugin_loaded", "info", "_project",
            s"plugin '${p.name}' (${p.className}) registered")
        case Some(err) =>
          warn("plugin_failed", "_project",
            s"plugin '${p.name}' (${p.className}) failed to load: $err")
      }
    }

    val semanticsBlock = root.get("semantics")
    val semanticModel = semanticsBlock.flatMap(b =>
      Try(YamlConfig.parseSemanticModel(b)) match {
        case Success(m) => Some(m)
        case Failure(e) =>
          err("semantics_invalid", "_project",
            Option(e.getMessage).getOrElse(e.toString))
          None
      })

    val rawNodes: Seq[Map[String, Any]] =
      root.getOrElse("nodes", Nil) match {
        case s: Seq[_] => s.flatMap {
          case m: Map[_, _] => Some(m.asInstanceOf[Map[String, Any]])
          case other =>
            err("node_invalid", "_project", s"node entry is not a mapping: $other")
            None
        }
        case other =>
          err("nodes_invalid", "_project", s"'nodes' must be a list, got: ${other.getClass.getSimpleName}")
          Nil
      }
    if (rawNodes.size > limits.maxNodes)
      err("too_many_nodes", "_project",
        s"${rawNodes.size} nodes exceeds limit ${limits.maxNodes}")

    val names = rawNodes.flatMap(_.get("name")).map(_.toString)
    names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
      .foreach(n => err("duplicate_node", n, s"node name '$n' declared ${names.count(_ == n)} times"))
    val nameSet = names.toSet

    // connections block may be absent, null (bare key) or malformed —
    // keep those as diagnostics, never as thrown exceptions
    val connectionsBlock: Map[String, Any] = root.get("connections") match {
      case None | Some(null) => Map.empty
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case Some(other) =>
        err("connections_invalid", "_project",
          s"'connections' must be a mapping, got: ${other.getClass.getSimpleName}")
        Map.empty
    }
    val connectionNames = connectionsBlock.keySet
    val jdbcConnections = connectionsBlock.collect {
      case (n, m: Map[_, _])
          if m.asInstanceOf[Map[String, Any]].get("kind").map(_.toString)
            .getOrElse(if (m.asInstanceOf[Map[String, Any]].contains("url")) "jdbc" else "file") == "jdbc" => n
    }.toSet

    rawNodes.foreach { m =>
      val name = m.get("name").map(_.toString).getOrElse {
        err("missing_name", "_project", s"node without a name: keys ${m.keySet.mkString(", ")}")
        "?"
      }
      (m.keySet -- nodeKeys - "recipe" - "recipe_vars").foreach(k =>
        err("unknown_key", name, s"unknown node key '$k' (strict config)"))

      // nested blocks are strict models too (same key sets as the loader)
      def strictBlock(key: String, known: Set[String]): Unit =
        m.get(key).collect { case bm: Map[_, _] =>
          (bm.asInstanceOf[Map[String, Any]].keySet -- known).foreach(k =>
            err("unknown_key", name, s"unknown $key key '$k' (strict config)"))
        }
      strictBlock("read", YamlConfig.readKeys)
      strictBlock("write", YamlConfig.writeKeys)
      strictBlock("incremental", YamlConfig.incrementalKeys)
      strictBlock("contracts", YamlConfig.contractKeys)
      strictBlock("streaming", YamlConfig.streamingKeys)

      // dependency refs must be declared nodes (graph vertices)
      m.get("depends_on").toSeq.flatMap(seqOf).foreach { d =>
        if (!nameSet.contains(d))
          err("unknown_dependency", name, s"depends_on references unknown node '$d'")
      }
      // `input:` may be an externally-provided dataset (warn, don't fail)
      // or a cross-pipeline `$pipeline.node` catalog reference
      m.get("input").map(_.toString).foreach { in =>
        if (in.startsWith("$")) {
          val parts = in.stripPrefix("$").split("\\.", 2)
          if (parts.length != 2 || parts(0).isEmpty || parts(1).isEmpty)
            err("bad_reference", name,
              s"input '$in' must have the form \\$$pipeline.node")
          else if (!root.contains("catalog_root"))
            warn("reference_needs_catalog", name,
              s"input '$in' resolves through the catalog; set catalog_root " +
                "or provide the frame at run time")
        } else if (!nameSet.contains(in))
          warn("external_input", name,
            s"input '$in' is not a node; it must be provided as an external dataset at run time")
      }

      // steps: exactly one kind each, known operation names, sql_file exists
      m.getOrElse("steps", Nil) match {
        case steps: Seq[_] => steps.foreach {
          case sm: Map[_, _] =>
            val step = sm.asInstanceOf[Map[String, Any]]
            val kinds = stepKeys.filter(step.contains)
            if (kinds.size != 1)
              err("bad_step", name,
                s"step must have exactly one of ${stepKeys.mkString("|")}, got: ${kinds.mkString(", ")}")
            (step.keySet -- stepKeys - "params").foreach(k =>
              err("unknown_key", name, s"unknown step key '$k'"))
            step.get("function").map(_.toString).foreach { fn =>
              if (TransformerRegistry.get(fn).isEmpty)
                err("unknown_transformer", name, s"step function '$fn' is not registered")
            }
            step.get("operation").map(_.toString).foreach { op =>
              if (!builtinOperations.contains(op) && TransformerRegistry.get(op).isEmpty)
                err("unknown_operation", name,
                  s"operation '$op' is neither a built-in nor a registered transformer")
            }
            step.get("sql_file").map(_.toString).foreach { f =>
              val p = java.nio.file.Paths.get(f)
              val resolved = if (p.isAbsolute) p
                else java.nio.file.Paths.get(baseDir.getOrElse("."), f)
              if (!java.nio.file.Files.exists(resolved))
                err("missing_sql_file", name, s"sql_file not found: $resolved")
            }
          case other => err("bad_step", name, s"step is not a mapping: $other")
        }
        case other => err("bad_step", name, s"'steps' must be a list, got: $other")
      }

      // node-level transformer: pattern registry first, then transformers
      m.get("transformer").map(_.toString).foreach { t =>
        if (graft.patterns.PatternRegistry.get(t).isEmpty &&
            TransformerRegistry.get(t).isEmpty)
          err("unknown_transformer", name, s"transformer '$t' is neither a pattern nor registered")
      }

      // a node needs somewhere to start from (Pipeline.runNodeWithStats)
      val hasSource = m.contains("read") || m.contains("input") ||
        m.contains("semantic") || m.get("depends_on").exists(seqOf(_).nonEmpty) ||
        m.contains("transformer")
      if (!hasSource)
        err("no_source", name, "no read, input, semantic, dependency, or generator transformer")

      // semantic node: model must exist; metrics/dims must resolve
      m.get("semantic").foreach { s =>
        val query = s match {
          case sm: Map[_, _] => sm.asInstanceOf[Map[String, Any]].get("query").map(_.toString)
          case other => Some(other.toString)
        }
        (semanticModel, query) match {
          case (None, _) =>
            err("semantic_without_model", name,
              "semantic query declared but the project has no semantics: block")
          case (Some(model), Some(qq)) =>
            Try(graft.semantics.Semantics.parse(qq)) match {
              case Failure(e) => err("semantic_query_invalid", name,
                Option(e.getMessage).getOrElse(e.toString))
              case Success(pq) =>
                pq.metrics.filterNot(model.metrics.contains).foreach(mm =>
                  err("unknown_metric", name, s"unknown metric '$mm'"))
                pq.dimensions.filterNot(model.dimensions.contains).foreach(d =>
                  err("unknown_dimension", name, s"unknown dimension '$d'"))
                val srcs = pq.metrics.flatMap(model.metrics.get).map(_.source).distinct
                if (srcs.size > 1)
                  err("metric_source_mismatch", name,
                    s"metrics span multiple sources: ${srcs.mkString(", ")}")
            }
          case (Some(_), None) =>
            err("semantic_query_invalid", name, "semantic block has no 'query'")
        }
      }

      // streaming write block needs a checkpoint; trigger kind must be known
      m.get("streaming").foreach {
        case sm: Map[_, _] =>
          val block = sm.asInstanceOf[Map[String, Any]]
          if (!block.contains("checkpoint"))
            err("missing_checkpoint", name, "streaming write requires 'checkpoint'")
          block.get("trigger").collect { case t: Map[_, _] =>
            t.asInstanceOf[Map[String, Any]].get("kind").map(_.toString).foreach { k =>
              if (!Set("available_now", "once", "processing_time", "continuous")(k))
                err("unknown_trigger", name, s"unknown trigger kind '$k'")
            }
          }
        case other => err("streaming_invalid", name, s"streaming block is not a mapping: $other")
      }

      // connection references must be declared at project level; jdbc
      // connections are read-side only (the loader rejects them on writes)
      Seq("read", "write").foreach { key =>
        m.get(key).collect { case km: Map[_, _] =>
          km.asInstanceOf[Map[String, Any]].get("connection").map(_.toString)
            .foreach { cn =>
              if (!connectionNames.contains(cn))
                err("unknown_connection", name,
                  s"$key references unknown connection '$cn'" +
                    (if (connectionNames.isEmpty) " (no connections: block)"
                     else s"; available: ${connectionNames.toSeq.sorted.mkString(", ")}"))
              else if (key == "write" && jdbcConnections.contains(cn))
                err("jdbc_write_unsupported", name,
                  s"write references jdbc connection '$cn'; jdbc is read-side only")
            }
        }
      }

      // a streaming block without any write sink is silently dead at run
      // time (the streaming write match needs BOTH) — catch it here
      if (m.contains("streaming") && !m.get("write").exists {
        case wm: Map[_, _] => wm.asInstanceOf[Map[String, Any]].contains("path")
        case _ => false
      }) err("missing_write_path", name,
        "streaming block requires a write: block with a path")

      // write mode / incremental mode / gate policy enums
      m.get("write").collect { case wm: Map[_, _] =>
        val w = wm.asInstanceOf[Map[String, Any]]
        w.get("mode").map(_.toString).foreach { mode =>
          if (!writeModes.contains(mode))
            err("unknown_write_mode", name, s"unknown write mode '$mode'")
        }
      }
      m.get("incremental").collect { case im: Map[_, _] =>
        val i = im.asInstanceOf[Map[String, Any]]
        if (!i.contains("column"))
          err("incremental_invalid", name, "incremental requires 'column'")
        i.get("mode").map(_.toString).foreach { mode =>
          if (!Set("hwm", "rolling")(mode))
            err("incremental_invalid", name, s"unknown incremental mode '$mode'")
        }
      }

      // tests: known kinds (the 11-kind battery, validation/Validation.scala)
      def checkTests(ts: Any): Unit = ts match {
        case s: Seq[_] => s.foreach {
          case tm: Map[_, _] =>
            val t = tm.asInstanceOf[Map[String, Any]]
            if (!t.contains("name")) err("test_invalid", name, "test without 'name'")
            t.get("kind").map(_.toString) match {
              case Some(k) if !testKinds.contains(k) =>
                err("unknown_test_kind", name, s"unknown test kind '$k'")
              case None => err("test_invalid", name, "test without 'kind'")
              case _ =>
            }
            t.get("severity").map(_.toString).foreach { sev =>
              if (!Set("fail", "warn", "quarantine")(sev))
                err("test_invalid", name, s"unknown severity '$sev'")
            }
          case other => err("test_invalid", name, s"test is not a mapping: $other")
        }
        case other => err("test_invalid", name, s"tests must be a list, got: $other")
      }
      m.get("tests").foreach(checkTests)
      m.get("validation").collect { case vm: Map[_, _] =>
        val v = vm.asInstanceOf[Map[String, Any]]
        v.get("tests").foreach(checkTests)
        v.get("gate").collect { case gm: Map[_, _] =>
          gm.asInstanceOf[Map[String, Any]].get("on_fail").map(_.toString).foreach { p =>
            if (!Set("abort", "warn")(p))
              err("gate_invalid", name, s"unknown gate on_fail policy '$p'")
          }
        }
      }
    }

    // cycle check over declared edges (graph.py:108)
    val edgeMap = rawNodes.flatMap(m => m.get("name").map(n =>
      n.toString -> m.get("depends_on").toSeq.flatMap(seqOf).filter(nameSet))).toMap
    val graph = DependencyGraph(edgeMap)
    Try(graph.checkCycles()) match {
      case Failure(e) => err("dependency_cycle", "_project",
        Option(e.getMessage).getOrElse("dependency cycle"))
      case Success(_) =>
    }

    if (diags.exists(_.severity == "error"))
      return PlanningResponse(valid = false, None, diags.toSeq)

    // no errors: materialize the logical plan with the runtime loader, so
    // planner acceptance implies runtime acceptance
    Try(YamlConfig.loadPipelineRootMap(rawRoot, baseDir)) match {
      case Failure(e) =>
        err("config_invalid", "_project", Option(e.getMessage).getOrElse(e.toString))
        PlanningResponse(valid = false, None, diags.toSeq)
      case Success(cfg) =>
        val nodes = cfg.nodes.map { n =>
          val kind =
            if (n.semantic.isDefined) "semantic"
            else if (n.read.isDefined) "source"
            else if (n.dependsOn.isEmpty && n.input.isEmpty && n.transformer.isDefined) "generator"
            else "transform"
          val stepKinds = n.steps.map(s =>
            s.sql.map(_ => "sql").orElse(s.sqlFile.map(_ => "sql_file"))
              .orElse(s.function).orElse(s.operation).getOrElse("noop"))
          NodePlan(n.name, kind, n.dependsOn, n.read.map(_.format), stepKinds,
            n.transformer, n.tests.size, n.writePath, n.streamingWrite.isDefined)
        }
        val edges = cfg.nodes.flatMap(n => n.dependsOn.map(_ -> n.name))
        val layers = DependencyGraph(
          cfg.nodes.map(n => n.name -> n.dependsOn).toMap).executionLayers()
        PlanningResponse(valid = true,
          Some(ProjectPlan(cfg.name, nodes, edges, layers)), diags.toSeq)
    }
  }

  private def seqOf(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(_.toString)
    case other => Seq(other.toString)
  }

  /** Depth-bounded java→scala conversion (planning.py depth guard). */
  private def anyToScala(v: Any, depth: Int, limits: Limits): Any = {
    if (depth > limits.maxDepth)
      throw new IllegalArgumentException(s"nesting exceeds depth ${limits.maxDepth}")
    v match {
      case m: java.util.Map[_, _] =>
        scala.collection.immutable.VectorMap.from(
          m.asScala.map { case (k, x) => k.toString -> anyToScala(x, depth + 1, limits) })
      case l: java.util.List[_] => l.asScala.map(anyToScala(_, depth + 1, limits)).toSeq
      case other => other
    }
  }
}
