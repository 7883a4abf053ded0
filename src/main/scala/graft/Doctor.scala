package graft

import org.apache.spark.sql.SparkSession

/**
 * Environment + config + last-run diagnostics CLI (reference: the
 * `odibi doctor` command, odibi/doctor/diagnostics.py).
 *
 * {{{
 * usage: graft.Doctor [config.yaml] [options]
 *   --catalog DIR   read last-run failures from this catalog root
 *                   (defaults to the config's catalog_root when resolvable)
 *   --path P        diagnose a filesystem path (repeatable)
 *   --set K=V       substitute ${K} placeholders in the config (repeatable)
 *   --json          machine-readable report instead of text lines
 * }}}
 *
 * Exit 0 when healthy or warnings only, 1 on any error-level finding —
 * same severity aggregation as the reference's status field. Spark is
 * only started when run history needs reading; env/config checks are
 * JVM-local so a broken Spark install still gets diagnosed.
 */
object Doctor {

  private final case class Args(config: Option[String] = None,
                                catalog: Option[String] = None,
                                paths: Seq[String] = Nil,
                                subs: Map[String, String] = Map.empty,
                                json: Boolean = false)

  private def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    case "--catalog" :: v :: rest => parse(rest, acc.copy(catalog = Some(v)))
    case "--path" :: v :: rest => parse(rest, acc.copy(paths = acc.paths :+ v))
    case "--set" :: kv :: rest =>
      kv.split("=", 2) match {
        case Array(k, v) => parse(rest, acc.copy(subs = acc.subs + (k -> v)))
        case _ => throw new IllegalArgumentException(s"--set needs K=V, got: $kv")
      }
    case "--json" :: rest => parse(rest, acc.copy(json = true))
    case flag :: _ if flag.startsWith("-") =>
      throw new IllegalArgumentException(s"unknown flag: $flag")
    case path :: rest if acc.config.isEmpty =>
      parse(rest, acc.copy(config = Some(path)))
    case extra :: _ =>
      throw new IllegalArgumentException(s"unexpected argument: $extra")
  }

  def main(argv: Array[String]): Unit = sys.exit(mainExit(argv))

  private[graft] def mainExit(argv: Array[String]): Int = {
    val args =
      try parse(argv.toList, Args())
      catch {
        case e: Exception =>
          System.err.println(s"error: ${e.getMessage}\n" +
            "usage: graft.Doctor [config.yaml] [--catalog DIR] [--path P] [--set K=V] [--json]")
          return 2
      }
    val report = graft.core.Doctor.Report(run(args))
    if (args.json) println(report.toJson)
    else {
      report.checks.foreach { c =>
        val tag = c.status match {
          case "ok" => "[ ok ]"; case "warn" => "[warn]"; case _ => "[FAIL]"
        }
        println(s"$tag ${c.name}: ${c.detail}" +
          (if (c.fix.nonEmpty) s"\n       fix: ${c.fix}" else ""))
      }
      println(s"status: ${report.status}")
    }
    if (report.status == "errors") 1 else 0
  }

  private def run(args: Args): Seq[graft.core.Doctor.Check] = {
    import graft.core.Doctor._
    val live = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val env = envChecks(live)
    // placeholder substitution happens in memory so relative refs
    // (sql_file etc.) still resolve against the ORIGINAL config's dir
    val cfg = args.config.toSeq.flatMap { p =>
      if (!java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)))
        Seq(Check("config", "error", s"cannot read $p",
          "check the path and permissions"))
      else {
        val raw = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
        val text = graft.core.Secrets.substitute(raw, args.subs,
          Option(java.nio.file.Paths.get(p).getParent).map(_.toString))
        configChecksText(text, p)
      }
    }
    val paths = args.paths.map(diagnosePath)
    // catalog root: explicit flag wins, else pull it out of the config lint
    val catalogRoot = args.catalog.orElse(
      cfg.collectFirst { case c if c.name == "catalog_root" &&
        c.status == "ok" => c.detail })
    val history = catalogRoot.toSeq.flatMap { root =>
      if (!new java.io.File(root).isDirectory)
        Seq(Check("history", "warn", s"no catalog at $root yet",
          "meta_* tables appear after the first recorded run"))
      else {
        val spark = live.getOrElse {
          val s = SparkSession.builder().master("local[2]")
            .appName("graft-doctor")
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
          s.sparkContext.setLogLevel("ERROR")
          s
        }
        try historyChecks(spark, root)
        finally if (live.isEmpty) spark.stop()
      }
    }
    env ++ cfg ++ paths ++ history
  }
}
