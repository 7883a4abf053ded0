package graft.core

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Live observability UI over an embedded HTTP listener (reference:
 * odibi/ui/app.py:14 — the FastAPI dashboard; its server dependencies
 * are not assumed here, so the listener is the JDK's own
 * `com.sun.net.httpserver` — zero new deps).
 *
 * Serves the SAME three views [[Dashboard]] renders statically, plus
 * live JSON endpoints, with auto-refresh: every page carries a small
 * poller that reloads when `/api/fingerprint` (the catalog's
 * file-metadata fingerprint) changes. Pages re-render lazily on the
 * first request AFTER a catalog change — an idle dashboard costs zero
 * Spark work, and a busy catalog re-renders at most once per change.
 *
 *   GET /, /index.html, /stories.html, /config.html   rendered views
 *   GET /api/health   pipeline health + SLA rows       (JSON array)
 *   GET /api/runs     latest runs (node/failure counts)
 *   GET /api/daily    daily stats
 *   GET /api/fingerprint                               (text)
 *
 * Traffic is operator-scale (a team looking at a dashboard), so
 * requests serve on the dispatch thread — no pool to size or leak.
 */
final class DashboardServer private[core] (server: HttpServer) {
  /** Bound port (useful with port=0 ephemeral binds). */
  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port/"
  def stop(): Unit = server.stop(0)
}

object DashboardServer {

  /** (file count, mtime, len) fingerprint over the catalog's meta_*
    * dirs via the Hadoop FS API — works on object stores too. */
  def catalogFingerprint(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return -1L
    var h = 1125899906842597L
    def mix(v: Long): Unit = { h = h * 31 + v }
    fs.listStatus(p).filter(_.getPath.getName.startsWith("meta_"))
      .sortBy(_.getPath.getName).foreach { d =>
        DriverPar.listFilesNoPerm(fs, d.getPath).foreach { f =>
          mix(f.getPath.getName.hashCode.toLong)
          mix(f.getModificationTime)
          mix(f.getLen)
        }
      }
    h
  }

  def start(spark: SparkSession, root: String, port: Int = 0,
            slaHours: Map[String, Double] = Map.empty,
            defaultSlaHours: Double = 24.0,
            storyDir: Option[String] = None,
            configPath: Option[String] = None,
            pollSeconds: Int = 2): DashboardServer = {
    val catalog = new Catalog(spark, root)
    val poller =
      s"""<script>(async function poll(last){try{
         |const r=await fetch('api/fingerprint');const v=await r.text();
         |if(last!==undefined&&v!==last){location.reload();return;}
         |setTimeout(()=>poll(v),${pollSeconds * 1000});
         |}catch(e){setTimeout(()=>poll(last),${pollSeconds * 5000});}})();
         |</script>""".stripMargin.replaceAll("\n", "")

    // lazy page cache keyed by the catalog fingerprint
    @volatile var cached: (Long, Map[String, String]) = (Long.MinValue, Map.empty)
    def pages(): Map[String, String] = {
      val fp = catalogFingerprint(spark, root)
      if (cached._1 != fp)
        cached = (fp, Dashboard.generate(spark, root, slaHours,
            defaultSlaHours, storyDir, configPath)
          .map { case (n, html) =>
            n -> html.replace("</body>", poller + "</body>")
          })
      cached._2
    }

    def jsonOf(df: => DataFrame): String =
      try df.limit(500).toJSON.collect().mkString("[", ",", "]")
      catch { case e: Exception =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val o = m.createObjectNode()
        o.put("error", Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        m.writeValueAsString(o)
      }

    def health: DataFrame = catalog.pipelineHealth.join(
      catalog.slaStatus(slaHours, defaultSlaHours)
        .select(col("pipeline"), col("status"), col("hours_since_success")),
      Seq("pipeline"), "left").orderBy(col("pipeline"))
    def runs: DataFrame = catalog.table("meta_runs")
      .groupBy(col("pipeline"), col("run_id"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("n_failed"),
        sum(col("duration_ms")).as("total_ms"),
        max(col("recorded_at")).as("finished_at"))
      .orderBy(col("finished_at").desc)
    def daily: DataFrame =
      catalog.dailyStats.orderBy(col("day").desc, col("pipeline"))

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val (status, cType, body): (Int, String, String) = path match {
          case "/" | "/index.html" | "/stories.html" | "/config.html" =>
            val name = if (path == "/") "index.html" else path.stripPrefix("/")
            pages().get(name) match {
              case Some(html) => (200, "text/html; charset=utf-8", html)
              case None => (404, "text/plain", s"no such view: $name")
            }
          case "/api/fingerprint" =>
            (200, "text/plain", catalogFingerprint(spark, root).toString)
          case "/api/health" => (200, "application/json", jsonOf(health))
          case "/api/runs" => (200, "application/json", jsonOf(runs))
          case "/api/daily" => (200, "application/json", jsonOf(daily))
          case other => (404, "text/plain", s"not found: $other")
        }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", cType)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        try ex.getResponseBody.write(bytes) finally ex.close()
      }
    })
    server.setExecutor(null)
    server.start()
    new DashboardServer(server)
  }
}
