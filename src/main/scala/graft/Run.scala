package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Catalog, Pipeline, Story, Suggestions, YamlConfig}

/**
 * Execute a project/pipeline YAML end-to-end — the library's front door,
 * the equivalent of the reference CLI's `run` command (reference:
 * odibi/cli/commands/run.py). `graft.Plan` stays the no-Spark CI gate;
 * this main starts Spark, runs every pipeline in declared order, records
 * runs/lineage/schemas into the system catalog when `catalog_root` is
 * configured, writes the run story, and exits nonzero on any node failure.
 *
 * {{{
 * usage: graft.Run <config.yaml> [options]
 *   --select n1,n2   run only these nodes (upstream deps auto-included)
 *   --tag TAG        run only nodes tagged TAG
 *   --dry-run        planner validation only (no Spark); prints plan JSON
 *   --resume         skip nodes unchanged since their last green run
 *   --story DIR      write story JSON + HTML (+ runs index with a catalog)
 *   --set K=V        substitute ${K} placeholders in the YAML (repeatable)
 *   --master M       Spark master (default local[*])
 * }}}
 *
 * Exit codes: 0 all nodes green, 1 any node failed (or invalid config in
 * `--dry-run`), 2 bad usage / unreadable config.
 */
object Run {

  private final case class Args(config: String = "",
                                select: Seq[String] = Nil,
                                tag: Option[String] = None,
                                dryRun: Boolean = false,
                                resume: Boolean = false,
                                story: Option[String] = None,
                                subs: Map[String, String] = Map.empty,
                                master: Option[String] = None)

  private val usage: String =
    """usage: graft.Run <config.yaml> [--select n1,n2] [--tag TAG] [--dry-run]
      |                 [--resume] [--story DIR] [--set K=V ...] [--master M]""".stripMargin

  private def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    case "--select" :: v :: rest =>
      parse(rest, acc.copy(select = acc.select ++ v.split(",").map(_.trim).filter(_.nonEmpty)))
    case "--tag" :: v :: rest => parse(rest, acc.copy(tag = Some(v)))
    case "--dry-run" :: rest => parse(rest, acc.copy(dryRun = true))
    case "--resume" :: rest => parse(rest, acc.copy(resume = true))
    case "--story" :: v :: rest => parse(rest, acc.copy(story = Some(v)))
    case "--set" :: kv :: rest =>
      kv.split("=", 2) match {
        case scala.Array(k, v) => parse(rest, acc.copy(subs = acc.subs + (k -> v)))
        case _ => throw new IllegalArgumentException(s"--set needs K=V, got: $kv")
      }
    case "--master" :: v :: rest => parse(rest, acc.copy(master = Some(v)))
    case flag :: _ if flag.startsWith("-") =>
      throw new IllegalArgumentException(s"unknown flag: $flag")
    case path :: rest if acc.config.isEmpty => parse(rest, acc.copy(config = path))
    case extra :: _ =>
      throw new IllegalArgumentException(s"unexpected argument: $extra")
  }

  def main(argv: Array[String]): Unit = sys.exit(mainExit(argv))

  /** Testable body: returns the process exit code instead of exiting. */
  private[graft] def mainExit(argv: Array[String]): Int = {
    val args =
      try {
        val a = parse(argv.toList, Args())
        require(a.config.nonEmpty, "missing <config.yaml>")
        a
      } catch {
        case e: Exception =>
          System.err.println(s"error: ${e.getMessage}\n$usage")
          return 2
      }
    execute(args)
  }

  private def execute(args: Args): Int = {
    val path = java.nio.file.Paths.get(args.config)
    if (!java.nio.file.Files.isReadable(path)) {
      System.err.println(s"error: cannot read ${args.config}")
      return 2
    }
    val baseDir = Option(path.getParent).map(_.toString)
    // --set wins, then process env, then a .env next to the config
    // (reference load_yaml_with_env); unresolved placeholders stay put
    // so planner diagnostics can name them
    val text = graft.core.Secrets.substitute(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"),
      args.subs, baseDir)

    if (args.dryRun) {
      try {
        val response = graft.core.Planner.plan(text, baseDir)
        println(response.toJson)
        return if (response.valid) 0 else 1
      } catch {
        case e: Exception => // unparseable YAML never reaches diagnostics
          System.err.println(s"error: cannot parse ${args.config}: ${e.getMessage}")
          return 1
      }
    }

    // a project file has a `pipelines:` list; anything else is a single
    // pipeline wrapped as a one-entry project (loadProject is the authority
    // on the shape, so ask it first). Any OTHER load failure — malformed
    // YAML, bad types — is a config error: clean exit 2, not a stack trace
    val project =
      try {
        try YamlConfig.loadProject(text, baseDir)
        catch {
          case _: IllegalArgumentException =>
            val cfg = YamlConfig.loadPipeline(text, baseDir)
            YamlConfig.ProjectConfig(cfg.name, Seq(cfg))
        }
      } catch {
        case e: Exception =>
          System.err.println(s"error: cannot load ${args.config}: ${e.getMessage}")
          return 2
      }

    // reuse a live session (embedded/test use) and leave it running;
    // own — and stop — the one we start ourselves
    val existing = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val spark = existing.getOrElse {
      val s = SparkSession.builder()
        .master(args.master.getOrElse(
          sys.env.get("SPARK_GRAFT_CPUS").map(c => s"local[$c]").getOrElse("local[*]")))
        .appName(s"graft-run-${project.name}")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val runId = "run_" + java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now()) + "_" +
      (System.nanoTime() % 100000).toString

    try {
      var anyFailed = false
      // per-pipeline exec: record into the catalog when configured, keep a
      // resume state file next to it, and render the story as we go
      val exec = (s: SparkSession, p: Pipeline.PipelineConfig,
                  ds: Map[String, org.apache.spark.sql.DataFrame],
                  o: Pipeline.RunOptions) => {
        // catalog_root is carried on every node (YamlConfig sets the
        // pipeline-level key on each NodeConfig for $-ref resolution)
        val catalogRoot = p.nodes.flatMap(_.catalogRoot).headOption
        val catalog = catalogRoot.map(r => new Catalog(s, r))
        val state = catalogRoot.map(r =>
          new graft.operators.Incremental.JsonFileState(s"$r/run_state.json"))
        val opts = o.copy(resumeFromFailure = args.resume, state = state)
        if (args.resume && state.isEmpty)
          System.err.println(s"warn: --resume needs catalog_root for run state; " +
            s"pipeline ${p.name} runs from scratch")
        val t0 = System.nanoTime()
        val results = catalog match {
          case Some(c) => Catalog.runRecorded(s, p, c, runId, ds, opts)
          case None => Pipeline.run(s, p, ds, opts)
        }
        val wallMs = (System.nanoTime() - t0) / 1000000L
        results.toSeq.sortBy(_._1).foreach { case (name, r) =>
          val line = r match {
            case x if x.failure.isDefined =>
              anyFailed = true
              val hints = Suggestions.suggest(x.failure.get)
                .map(h => s"\n       hint: $h").mkString
              s"[FAIL] ${p.name}.$name: ${x.failure.get.getMessage}$hints"
            case x if x.skipped =>
              s"[skip] ${p.name}.$name (${x.skipReason.getOrElse("")})"
            case x =>
              val rows = x.rowsWritten.map(n => s", $n rows").getOrElse("")
              s"[ ok ] ${p.name}.$name (${x.durationMs} ms$rows)"
          }
          println(line)
        }
        args.story.foreach { dir =>
          Story.write(s"$dir/${p.name}_story.json", p, results, runId, wallMs)
          // summary page + one detail page per node, cross-linked
          Story.writeHtmlSite(dir, p, results, runId, wallMs)
          catalog.foreach(c =>
            Story.writeIndexHtml(s"$dir/${p.name}_runs.html", c, p.name))
        }
        results
      }
      Pipeline.runProject(spark, project,
        opts = Pipeline.RunOptions(tag = args.tag, nodes = args.select),
        exec = exec)
      println(if (anyFailed) s"$runId: FAILED" else s"$runId: success")
      if (anyFailed) 1 else 0
    } catch {
      case e: Exception =>
        System.err.println(s"error: ${e.getMessage}")
        1
    } finally if (existing.isEmpty) spark.stop()
  }
}
