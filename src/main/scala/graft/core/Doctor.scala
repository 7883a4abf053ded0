package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Environment / config / run-history diagnostics — "why doesn't my
 * pipeline run" answered before reading stack traces (reference:
 * odibi/doctor/diagnostics.py `doctor()` + `diagnose_path()`, and
 * odibi/diagnostics/manager.py run-history loading; re-expressed for a
 * JVM/Spark deployment: JVM + Spark versions instead of Python packages,
 * the system catalog's `meta_runs`/`meta_failures` parquet instead of
 * story JSON files).
 *
 * Every probe returns a [[Doctor.Check]]; the report's overall status is
 * `errors` > `warnings` > `healthy`, mirroring the reference's
 * aggregation. Nothing here throws — a diagnostic tool that crashes on
 * the broken environment it is diagnosing is useless.
 */
object Doctor {

  final case class Check(name: String, status: String, detail: String,
                         fix: String = "") {
    require(Set("ok", "warn", "error")(status), s"bad status $status")
  }

  final case class Report(checks: Seq[Check]) {
    def status: String =
      if (checks.exists(_.status == "error")) "errors"
      else if (checks.exists(_.status == "warn")) "warnings"
      else "healthy"
    def toJson: String = {
      def q(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val rows = checks.map(c =>
        s"""{"name": ${q(c.name)}, "status": ${q(c.status)}, "detail": ${q(c.detail)}, "fix": ${q(c.fix)}}""")
      s"""{"status": ${q(status)}, "checks": [${rows.mkString(", ")}]}"""
    }
  }

  /** JVM + Spark install checks; session-level conf checks when a live
    * session is passed (master, shuffle partitions, AQE). */
  def envChecks(spark: Option[SparkSession] = None): Seq[Check] = {
    val javaVer = System.getProperty("java.version", "unknown")
    val javaMajor = javaVer.takeWhile(_ != '.').toIntOption.getOrElse(0)
    val base = Seq(
      if (javaMajor >= 17) Check("java", "ok", s"Java $javaVer")
      else Check("java", "error", s"Java $javaVer",
        "Spark 4.x needs Java 17+"),
      Check("spark_jars", "ok",
        s"Spark ${org.apache.spark.SPARK_VERSION} on classpath"),
      Check("scala", "ok", s"Scala ${scala.util.Properties.versionNumberString}"),
      {
        val tmp = System.getProperty("java.io.tmpdir")
        if (new java.io.File(tmp).canWrite) Check("tmpdir", "ok", tmp)
        else Check("tmpdir", "error", s"$tmp not writable",
          "set java.io.tmpdir to a writable scratch directory")
      })
    val session = spark.toSeq.flatMap { s =>
      val master = s.sparkContext.master
      val parallelism = s.sparkContext.defaultParallelism
      val shuffle = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
      Seq(
        Check("spark_session", "ok", s"master=$master, cores=$parallelism"),
        // local mode with the 200-partition default: tiny partitions +
        // scheduling overhead; at cluster scale the opposite smell
        if (master.startsWith("local") && shuffle > parallelism * 8)
          Check("shuffle_partitions", "warn",
            s"$shuffle shuffle partitions for $parallelism local cores",
            "set spark.sql.shuffle.partitions near the core count for local runs")
        else if (!master.startsWith("local") && shuffle < parallelism)
          Check("shuffle_partitions", "warn",
            s"$shuffle shuffle partitions < $parallelism cores",
            "raise spark.sql.shuffle.partitions to at least the total core count")
        else Check("shuffle_partitions", "ok", shuffle.toString),
        if (s.conf.get("spark.sql.adaptive.enabled", "true") == "true")
          Check("aqe", "ok", "adaptive execution enabled")
        else Check("aqe", "warn", "adaptive execution disabled",
          "enable spark.sql.adaptive.enabled for runtime skew/coalesce fixes"))
    }
    base ++ session
  }

  /** Config lint: planner diagnostics as checks, plus file-connection
    * base paths and the catalog root probed on the filesystem. */
  def configChecks(path: String): Seq[Check] = {
    if (!java.nio.file.Files.isReadable(java.nio.file.Paths.get(path)))
      return Seq(Check("config", "error", s"cannot read $path",
        "check the path and permissions"))
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    configChecksText(text, path)
  }

  /** Same lint over already-loaded (e.g. placeholder-substituted) text.
    * `origPath` keeps the ORIGINAL file's directory as the base for
    * relative refs (sql_file etc.) — linting a temp copy under /tmp would
    * produce false missing-file errors. */
  def configChecksText(text: String, origPath: String): Seq[Check] = {
    val baseDir = Option(java.nio.file.Paths.get(origPath).getParent)
      .map(_.toString)
    val planner =
      try {
        val response = Planner.plan(text, baseDir)
        val diag = response.diagnostics.map(d => Check(
          s"config:${d.subject}",
          if (d.severity == "error") "error" else "warn",
          s"[${d.code}] ${d.message}"))
        Check("config", if (response.valid) "ok" else "error",
          if (response.valid) s"$origPath plans clean"
          else s"$origPath is invalid") +: diag
      } catch {
        case e: Exception =>
          Seq(Check("config", "error", s"failed to parse $origPath: ${e.getMessage}",
            "check YAML syntax"))
      }
    planner ++ connectionChecksText(text)
  }

  /** File-kind connections and catalog_root from the raw YAML: do the
    * base paths exist / are they writable. JDBC connections are reported
    * but not probed (no driver round-trip from a diagnostic). */
  private[graft] def connectionChecksText(text: String): Seq[Check] =
    try {
      val yaml = new org.yaml.snakeyaml.Yaml()
      val root = yaml.load[Any](text)
      val rootMap = root match {
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Any]]
        case _ => return Nil
      }
      val conns = Option(rootMap.get("connections")) match {
        case Some(m: java.util.Map[_, _]) =>
          import scala.jdk.CollectionConverters._
          m.asInstanceOf[java.util.Map[String, Any]].asScala.toSeq.flatMap {
            case (name, v: java.util.Map[_, _]) =>
              val cm = v.asInstanceOf[java.util.Map[String, Any]]
              val base = Option(cm.get("base_path")).map(_.toString)
              val url = Option(cm.get("url")).map(_.toString)
              (base, url) match {
                case (Some(b), _) if b.contains("${") => Some(Check(
                  s"connection:$name", "warn", s"$b has unresolved placeholders",
                  "pass --set K=V or resolve before running"))
                case (Some(b), _) =>
                  val f = new java.io.File(b)
                  if (f.isDirectory) Some(Check(s"connection:$name", "ok", b))
                  else Some(Check(s"connection:$name", "warn",
                    s"$b does not exist (yet)",
                    "verify base_path; sinks create it on first write"))
                case (None, Some(u)) => Some(Check(s"connection:$name", "ok",
                  s"jdbc $u (not probed)"))
                case _ => None
              }
            case _ => None
          }
        case _ => Nil
      }
      val catalogRoot = Option(rootMap.get("catalog_root")).map(_.toString)
      val cat = catalogRoot.toSeq.map { r =>
        if (r.contains("${"))
          Check("catalog_root", "warn", s"$r has unresolved placeholders",
            "pass --set K=V or resolve before running")
        else {
          val f = new java.io.File(r)
          if (f.isDirectory || Option(f.getParentFile).exists(_.canWrite))
            Check("catalog_root", "ok", r)
          else Check("catalog_root", "warn", s"$r parent not writable",
            "the run records meta_* tables here; point it somewhere writable")
        }
      }
      conns ++ cat
    } catch { case e: Exception =>
      Seq(Check("connections", "warn", s"could not inspect: ${e.getMessage}"))
    }

  /** `diagnose_path` equivalent: what IS this path (reference
    * doctor/diagnostics.py:162-233). */
  def diagnosePath(path: String): Check = {
    val f = new java.io.File(path)
    if (!f.exists)
      Check(s"path:$path", "error", "does not exist",
        "check spelling; for sinks the parent must exist and be writable")
    else if (f.isDirectory) {
      val children = Option(f.list()).map(_.length).getOrElse(0)
      val sample = Option(f.list()).getOrElse(Array.empty).sorted.take(5)
      Check(s"path:$path", "ok",
        s"directory, $children entries${
          if (sample.nonEmpty) sample.mkString(" [", ", ", "]") else ""}" +
          (if (f.canWrite) "" else " (read-only)"))
    } else {
      val fmt = path.reverse.takeWhile(_ != '.').reverse.toLowerCase match {
        case e @ ("parquet" | "csv" | "json" | "yaml" | "yml" | "avro"
                  | "xlsx" | "warc") => e
        case "gz" if path.toLowerCase.endsWith(".warc.gz") => "warc"
        case "zst" if path.toLowerCase.endsWith(".warc.zst") => "warc"
        case _ => "unknown"
      }
      Check(s"path:$path", "ok", s"file, ${f.length()} bytes, format=$fmt")
    }
  }

  /**
   * Last-run failure summary from the system catalog: the most recent
   * run's failed nodes with their recorded exception class + message and
   * a pattern-matched fix hint (reference diagnostics/manager.py loads
   * the same from story JSON history).
   */
  def historyChecks(spark: SparkSession, catalogRoot: String,
                    pipeline: Option[String] = None): Seq[Check] = {
    val catalog = new Catalog(spark, catalogRoot)
    try {
      var runs = catalog.table("meta_runs")
      pipeline.foreach(p => runs = runs.filter(col("pipeline") === p))
      if (runs.isEmpty) return Seq(Check("history", "warn",
        s"no recorded runs in $catalogRoot", "run with catalog_root configured"))
      val last = runs.orderBy(col("recorded_at").desc).select("run_id", "pipeline")
        .first()
      val (runId, pipe) = (last.getString(0), last.getString(1))
      val nodes = runs.filter(col("run_id") === runId && col("pipeline") === pipe)
        .select("node", "success", "error").collect()
      val failed = nodes.filter(r => !r.getBoolean(1))
      val head = Check("history", if (failed.isEmpty) "ok" else "error",
        s"last run $runId ($pipe): ${nodes.length} nodes, ${failed.length} failed")
      // meta_failures carries the exception class for better hints
      val classes: Map[String, String] =
        try catalog.table("meta_failures")
          .filter(col("run_id") === runId && col("pipeline") === pipe)
          .select("node", "error_class").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        catch { case _: Exception => Map.empty }
      head +: failed.toSeq.map { r =>
        val (node, err) = (r.getString(0), Option(r.getString(2)).getOrElse(""))
        Check(s"node:$node", "error", err.take(300),
          fixHint(classes.getOrElse(node, ""), err))
      }
    } catch { case e: Exception =>
      Seq(Check("history", "warn",
        s"could not read catalog at $catalogRoot: ${e.getMessage}",
        "check catalog_root; meta_* tables appear after the first recorded run"))
    }
  }

  /** Map recorded failure text to the usual first move (the full
    * rule set lives in [[Suggestions]] — shared with Run and Story). */
  private[graft] def fixHint(errorClass: String, message: String): String =
    Suggestions.suggestText(errorClass, message, max = 1).headOption.getOrElse(
      "re-run the node alone with graft.Run --select <node> for a focused stack trace")
}
