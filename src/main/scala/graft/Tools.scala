package graft

import org.apache.spark.sql.SparkSession

/**
 * Inspection CLI: the reference's `list` / `graph` / `catalog` /
 * `lineage` commands (reference: odibi/cli/list_cmd.py, graph.py,
 * catalog.py, lineage.py), distilled to the four verbs users reach for
 * between runs.
 *
 * {{{
 * usage: graft.Tools <command> [args]
 *   list                                  registered transformers/patterns/recipes (no Spark)
 *   graph <config.yaml> [--set K=V]       pipeline DAG as Graphviz DOT (no Spark)
 *   catalog <root> <meta_table> [--pipeline P] [-n N]   dump a meta table as JSON lines
 *   lineage <root> [--pipeline P] [--node N]            node + column lineage edges
 * }}}
 *
 * `list` and `graph` are registry/planner-driven and never start Spark;
 * `catalog` and `lineage` read the system catalog's parquet tables with
 * a live session when one exists, else a local one. Exit 0 on success,
 * 1 on missing data (unknown table, no lineage), 2 on usage errors.
 */
object Tools {

  private val usage: String =
    """usage: graft.Tools <list | graph <yaml> | export <yaml> | catalog <root> <table> | lineage <root>>
      |  graph:   [--set K=V ...]
      |  export:  --target airflow|dagster --out FILE [--pipeline P] [--set K=V ...]
      |  catalog: [--pipeline P] [-n N]
      |  lineage: [--pipeline P] [--node N]""".stripMargin

  def main(argv: Array[String]): Unit = sys.exit(mainExit(argv))

  private[graft] def mainExit(argv: Array[String]): Int = argv.toList match {
    case "list" :: Nil => listCommand()
    case "graph" :: rest => graphCommand(rest)
    case "export" :: rest => exportCommand(rest)
    case "catalog" :: rest => catalogCommand(rest)
    case "lineage" :: rest => lineageCommand(rest)
    case _ =>
      System.err.println(usage)
      2
  }

  private def listCommand(): Int = {
    graft.core.Introspect.inventory().toSeq.sortBy(_._1).foreach {
      case (kind, names) =>
        println(s"$kind (${names.size}):")
        names.foreach(n => println(s"  $n"))
    }
    0
  }

  /** DOT digraph of the config's DAG, colored by node kind — pipe to
    * `dot -Tsvg`. Invalid configs print diagnostics on stderr, exit 1. */
  private def graphCommand(args: List[String]): Int = {
    var config: Option[String] = None
    var subs = Map.empty[String, String]
    var rest = args
    while (rest.nonEmpty) rest match {
      case "--set" :: kv :: t => kv.split("=", 2) match {
        case Array(k, v) => subs += (k -> v); rest = t
        case _ => System.err.println(s"--set needs K=V, got $kv"); return 2
      }
      case v :: t if config.isEmpty => config = Some(v); rest = t
      case other :: _ =>
        System.err.println(s"unexpected argument $other"); return 2
    }
    config match {
      case None => System.err.println(usage); 2
      case Some(path) =>
        if (!java.nio.file.Files.isReadable(java.nio.file.Paths.get(path))) {
          System.err.println(s"error: cannot read $path"); return 2
        }
        val text = subs.foldLeft(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")) {
          case (t, (k, v)) => t.replace("$" + s"{$k}", v)
        }
        val response =
          try graft.core.Planner.plan(text,
            Option(java.nio.file.Paths.get(path).getParent).map(_.toString))
          catch {
            case e: Exception =>
              System.err.println(s"error: cannot parse $path: ${e.getMessage}")
              return 1
          }
        response.plan.orElse(response.pipelinePlans.headOption) match {
          case None =>
            response.diagnostics.foreach(d =>
              System.err.println(s"${d.severity}: ${d.subject}: ${d.message}"))
            1
          case Some(_) =>
            val plans =
              if (response.pipelinePlans.nonEmpty) response.pipelinePlans
              else response.plan.toSeq
            println("digraph pipeline {")
            println("  rankdir=LR; node [shape=box, fontname=\"sans-serif\"];")
            plans.foreach { p =>
              p.nodes.foreach { n =>
                val color = n.kind match {
                  case "source" => "#e3f2fd"
                  case "semantic" => "#f3e5f5"
                  case "generator" => "#fff8e1"
                  case _ => "#e8f5e9"
                }
                val sink = n.writePath.map(_ => ", peripheries=2").getOrElse("")
                println(s"""  "${p.pipeline}.${n.name}" [label="${n.name}\\n(${n.kind})", style=filled, fillcolor="$color"$sink];""")
              }
              p.edges.foreach { case (dep, node) =>
                println(s"""  "${p.pipeline}.$dep" -> "${p.pipeline}.$node";""")
              }
            }
            println("}")
            0
        }
    }
  }

  /** Render the planned DAG as an Airflow DAG module (one pipeline) or a
    * Dagster definitions module (whole project) — reference
    * odibi/cli/export.py:1-66. No Spark; planner-validated configs only. */
  private def exportCommand(args: List[String]): Int = {
    var config: Option[String] = None
    var target: Option[String] = None
    var out: Option[String] = None
    var pipeline: Option[String] = None
    var subs = Map.empty[String, String]
    var rest = args
    while (rest.nonEmpty) rest match {
      case "--target" :: v :: t => target = Some(v); rest = t
      case "--out" :: v :: t => out = Some(v); rest = t
      case "--pipeline" :: v :: t => pipeline = Some(v); rest = t
      case "--set" :: kv :: t => kv.split("=", 2) match {
        case Array(k, v) => subs += (k -> v); rest = t
        case _ => System.err.println(s"--set needs K=V, got $kv"); return 2
      }
      case v :: t if config.isEmpty && !v.startsWith("-") => config = Some(v); rest = t
      case other :: _ =>
        System.err.println(s"unexpected argument $other"); return 2
    }
    (config, target, out) match {
      case (Some(path), Some(tgt), Some(outFile)) =>
        if (!Set("airflow", "dagster").contains(tgt)) {
          System.err.println(s"error: --target must be airflow or dagster, got $tgt")
          return 2
        }
        val p = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.isReadable(p)) {
          System.err.println(s"error: cannot read $path"); return 2
        }
        val text = subs.foldLeft(java.nio.file.Files.readString(p)) {
          case (t, (k, v)) => t.replace("$" + s"{$k}", v)
        }
        val response =
          try graft.core.Planner.plan(text, Option(p.getParent).map(_.toString))
          catch {
            case e: Exception =>
              System.err.println(s"error: cannot parse $path: ${e.getMessage}")
              return 1
          }
        val plans =
          if (response.pipelinePlans.nonEmpty) response.pipelinePlans
          else response.plan.toSeq
        if (plans.isEmpty) {
          response.diagnostics.foreach(d =>
            System.err.println(s"${d.severity}: ${d.subject}: ${d.message}"))
          return 1
        }
        // the project's display name: top-level `project:`/`name:` when
        // present, else the sole pipeline's name
        val project =
          try new org.yaml.snakeyaml.Yaml().load[Any](text) match {
            case m: java.util.Map[_, _] =>
              Option(m.get("project")).orElse(Option(m.get("name")))
                .map(_.toString).getOrElse(plans.head.pipeline)
            case _ => plans.head.pipeline
          } catch { case _: Exception => plans.head.pipeline }
        val configAbs = p.toAbsolutePath.toString
        val code =
          try tgt match {
            case "airflow" =>
              val chosen = pipeline match {
                case Some(name) => plans.find(_.pipeline == name).getOrElse {
                  System.err.println(s"error: pipeline '$name' not found; " +
                    s"have: ${plans.map(_.pipeline).mkString(", ")}")
                  return 1
                }
                case None if plans.size == 1 => plans.head
                case None =>
                  System.err.println("error: --pipeline is required for airflow " +
                    s"export of a multi-pipeline project; have: ${plans.map(_.pipeline).mkString(", ")}")
                  return 2
              }
              graft.core.Orchestration.airflowDag(project, chosen, configAbs,
                subs.toSeq.sortBy(_._1))
            case _ =>
              graft.core.Orchestration.dagsterDefs(project, plans, configAbs,
                subs.toSeq.sortBy(_._1))
          } catch {
            case e: IllegalArgumentException =>
              System.err.println(s"error: ${e.getMessage}")
              return 1
          }
        val outPath = java.nio.file.Paths.get(outFile)
        Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(outPath, code)
        println(s"exported $tgt definitions to $outFile")
        0
      case _ =>
        System.err.println(s"error: export needs <yaml> --target and --out\n$usage")
        2
    }
  }

  private def withSpark[A](f: SparkSession => A): A = {
    val live = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val spark = live.getOrElse {
      val s = SparkSession.builder().master("local[2]")
        .appName("graft-tools")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    try f(spark) finally if (live.isEmpty) spark.stop()
  }

  private def jsonLines(df: org.apache.spark.sql.DataFrame, n: Int): Unit =
    df.toJSON.take(n).foreach(println)

  private def catalogCommand(args: List[String]): Int = {
    var pos = List.empty[String]
    var pipeline: Option[String] = None
    var n = 100
    var rest = args
    while (rest.nonEmpty) rest match {
      case "--pipeline" :: v :: t => pipeline = Some(v); rest = t
      case "-n" :: v :: t => n = v.toInt; rest = t
      case v :: t => pos = pos :+ v; rest = t
    }
    pos match {
      case root :: table :: Nil => withSpark { spark =>
        try {
          var df = new graft.core.Catalog(spark, root).table(table)
          pipeline.foreach(p =>
            df = df.filter(org.apache.spark.sql.functions.col("pipeline") === p))
          jsonLines(df, n)
          0
        } catch {
          case e: Exception =>
            System.err.println(s"error: cannot read $table at $root: ${e.getMessage}")
            1
        }
      }
      case _ => System.err.println(usage); 2
    }
  }

  private def lineageCommand(args: List[String]): Int = {
    var root: Option[String] = None
    var pipeline: Option[String] = None
    var node: Option[String] = None
    var rest = args
    while (rest.nonEmpty) rest match {
      case "--pipeline" :: v :: t => pipeline = Some(v); rest = t
      case "--node" :: v :: t => node = Some(v); rest = t
      case v :: t if root.isEmpty => root = Some(v); rest = t
      case other :: _ =>
        System.err.println(s"unexpected argument $other"); return 2
    }
    root match {
      case None => System.err.println(usage); 2
      case Some(r) => withSpark { spark =>
        import org.apache.spark.sql.functions.col
        val catalog = new graft.core.Catalog(spark, r)
        try {
          def scoped(t: String) = {
            var df = catalog.table(t)
            pipeline.foreach(p => df = df.filter(col("pipeline") === p))
            node.foreach(nd => df = df.filter(col("node") === nd))
            df
          }
          val edges = scoped("meta_lineage")
            .select("pipeline", "node", "input").distinct()
            .orderBy("pipeline", "node", "input").collect()
          if (edges.isEmpty) { System.err.println("no lineage recorded"); return 1 }
          edges.foreach(e =>
            println(s"${e.getString(0)}: ${e.getString(2)} -> ${e.getString(1)}"))
          // column lineage is optional detail — present only with --node
          if (node.isDefined)
            try scoped("meta_column_lineage")
              .select("column", "source").distinct()
              .orderBy("column", "source").collect()
              .foreach(c => println(s"  ${c.getString(1)} => ${c.getString(0)}"))
            catch { case _: Exception => () }
          0
        } catch {
          case e: Exception =>
            System.err.println(s"error: ${e.getMessage}")
            1
        }
      }
    }
  }
}
