package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Static observability site over the system catalog (reference:
 * odibi/ui/app.py — a FastAPI dashboard with `/` pipeline health,
 * `/stories` run-story listing and `/config` view; its web-server
 * dependencies are env-blocked here, and a static render over the same
 * data needs no server, survives the cluster that produced it, and can
 * be published to any object store / static host).
 *
 * Pages: `index.html` (per-pipeline health + SLA + recent runs + daily
 * stats), `stories.html` (links into a `graft.Run --story` directory),
 * `config.html` (the project YAML, escaped). All tables are bounded
 * driver-side collects over pre-aggregated catalog views — the derived
 * views aggregate in Spark; only the final ≤`limit` display rows land
 * on the driver.
 */
object Dashboard {

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case c => c.toString
  }

  private val css =
    """  body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
      |  h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin-top: 1.6rem; }
      |  .meta { color: #555; margin-bottom: 1rem; }
      |  nav a { margin-right: 1rem; } pre { background: #f5f5f5; padding: 1rem; overflow-x: auto; }
      |  table { border-collapse: collapse; width: 100%; }
      |  th, td { text-align: left; padding: .4rem .7rem; border-bottom: 1px solid #ddd; font-size: .9rem; }
      |  td.num { text-align: right; font-variant-numeric: tabular-nums; }
      |  .ok { color: #2e7d32; } .late { color: #ef6c00; font-weight: 600; }
      |  .failing, .failed { color: #c62828; font-weight: 600; }
      |  .bar { display: inline-block; height: .6rem; background: #90caf9; }""".stripMargin

  private def page(title: String, nav: Seq[(String, String)], body: String): String =
    s"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>${esc(title)}</title>
<style>
$css
</style></head>
<body>
  <h1>${esc(title)}</h1>
  <nav>${nav.map { case (href, label) => s"""<a href="${esc(href)}">${esc(label)}</a>""" }.mkString}</nav>
$body
</body></html>
"""

  /** Render the site's pages (filename → HTML). Deterministic for a fixed
    * catalog state modulo the SLA view's now-relative hours. */
  def generate(spark: SparkSession, root: String,
               slaHours: Map[String, Double] = Map.empty,
               defaultSlaHours: Double = 24.0,
               storyDir: Option[String] = None,
               configPath: Option[String] = None,
               limit: Int = 50,
               storyHref: Option[String] = None): Map[String, String] = {
    val catalog = new Catalog(spark, root)
    val nav = Seq("index.html" -> "dashboard") ++
      storyDir.map(_ => "stories.html" -> "stories") ++
      configPath.map(_ => "config.html" -> "config")

    val health =
      try catalog.pipelineHealth.join(
          catalog.slaStatus(slaHours, defaultSlaHours)
            .select(col("pipeline"), col("status"), col("hours_since_success")),
          Seq("pipeline"), "left")
        .orderBy(col("pipeline")).limit(limit).collect().toSeq
      catch { case _: Exception => Nil }
    val healthRows = health.map { r =>
      val rate = "%.0f%%".format(r.getAs[Double]("success_rate") * 100)
      val status = Option(r.getAs[String]("status")).getOrElse("unknown")
      val since = Option(r.getAs[java.lang.Double]("hours_since_success"))
        .map(h => "%.1f h ago".format(h.doubleValue)).getOrElse("never")
      s"""      <tr><td>${esc(r.getAs[String]("pipeline"))}</td><td class="num">${
        r.getAs[Long]("n_runs")}</td><td class="num">$rate</td><td>${
        Option(r.getAs[java.sql.Timestamp]("last_run_at")).map(_.toString.take(19)).getOrElse("&mdash;")}</td><td>$since</td><td class="${esc(status)}">${esc(status)}</td></tr>"""
    }

    // latest runs: one row per (pipeline, run) with node/failure counts
    val recent =
      try catalog.table("meta_runs")
        .groupBy(col("pipeline"), col("run_id"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(when(!col("success"), 1L).otherwise(0L)).as("n_failed"),
          sum(col("duration_ms")).as("total_ms"),
          max(col("recorded_at")).as("finished_at"))
        .orderBy(col("finished_at").desc).limit(limit).collect().toSeq
      catch { case _: Exception => Nil }
    val recentRows = recent.map { r =>
      val failed = r.getAs[Long]("n_failed")
      val cls = if (failed > 0) "failed" else "ok"
      s"""      <tr><td>${esc(r.getAs[String]("pipeline"))}</td><td><code>${
        esc(r.getAs[String]("run_id"))}</code></td><td class="num">${
        r.getAs[Long]("n_nodes")}</td><td class="num $cls">$failed</td><td class="num">${
        r.getAs[Long]("total_ms")}</td><td>${r.getAs[java.sql.Timestamp]("finished_at").toString.take(19)}</td></tr>"""
    }

    val daily =
      try catalog.dailyStats.orderBy(col("day").desc, col("pipeline"))
        .limit(limit).collect().toSeq
      catch { case _: Exception => Nil }
    val maxRuns = daily.map(_.getAs[Long]("n_runs")).maxOption.getOrElse(1L).max(1L)
    val dailyRows = daily.map { r =>
      val n = r.getAs[Long]("n_runs")
      val w = (n * 120 / maxRuns).max(2)
      s"""      <tr><td>${r.getAs[java.sql.Date]("day")}</td><td>${
        esc(r.getAs[String]("pipeline"))}</td><td class="num">$n <span class="bar" style="width:${w}px"></span></td><td class="num">${
        r.getAs[Long]("n_node_failures")}</td><td class="num">${r.getAs[Long]("total_duration_ms")}</td></tr>"""
    }

    def table(heads: Seq[String], rows: Seq[String], empty: String): String =
      if (rows.isEmpty) s"  <p class=\"meta\">$empty</p>"
      else s"""  <table>
    <thead><tr>${heads.map(h => s"<th>$h</th>").mkString}</tr></thead>
    <tbody>
${rows.mkString("\n")}
    </tbody>
  </table>"""

    val index = page("graft dashboard", nav,
      s"""  <p class="meta">system catalog: <code>${esc(root)}</code></p>
  <h2>Pipeline health</h2>
${table(Seq("pipeline", "runs", "success rate", "last run", "last success", "sla"), healthRows, "no runs recorded yet")}
  <h2>Recent runs</h2>
${table(Seq("pipeline", "run", "nodes", "failed", "total ms", "finished"), recentRows, "no runs recorded yet")}
  <h2>Daily stats</h2>
${table(Seq("day", "pipeline", "runs", "node failures", "total ms"), dailyRows, "no runs recorded yet")}""")

    val stories = storyDir.map { sd =>
      val href = storyHref.getOrElse(sd)
      val dir = java.nio.file.Paths.get(sd)
      val files =
        if (!java.nio.file.Files.isDirectory(dir)) Nil
        else {
          val s = java.nio.file.Files.list(dir)
          try {
            val b = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
            s.forEach(p => b += p)
            b.toSeq
          } finally s.close()
        }
      val storyRows = files.map(_.getFileName.toString)
        .filter(_.endsWith("_story.html")).sorted.reverse.take(limit)
        .map { f =>
          val base = f.stripSuffix("_story.html")
          val runs = files.map(_.getFileName.toString).find(_ == s"${base}_runs.html")
            .map(r => s""" <a href="${esc(s"$href/$r")}">history</a>""").getOrElse("")
          s"""      <tr><td><a href="${esc(s"$href/$f")}">${esc(base)}</a>$runs</td></tr>"""
        }
      "stories.html" -> page("graft run stories", nav,
        s"""  <p class="meta">story directory: <code>${esc(sd)}</code></p>
${table(Seq("run"), storyRows, "no *_story.html files found")}""")
    }

    val config = configPath.map { cp =>
      val content =
        try java.nio.file.Files.readString(java.nio.file.Paths.get(cp))
        catch { case e: Exception => s"cannot read $cp: ${e.getMessage}" }
      "config.html" -> page("graft project config", nav,
        s"""  <p class="meta"><code>${esc(cp)}</code></p>
  <pre>${esc(content)}</pre>""")
    }

    (Map("index.html" -> index) ++ stories ++ config)
  }

  /** Write the site under `outDir`; returns the index path. */
  def write(spark: SparkSession, root: String, outDir: String,
            slaHours: Map[String, Double] = Map.empty,
            defaultSlaHours: Double = 24.0,
            storyDir: Option[String] = None,
            configPath: Option[String] = None): String = {
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    // story links resolve relative to outDir when possible
    val relStory = storyDir.map { sd =>
      val sp = java.nio.file.Paths.get(sd).toAbsolutePath
      try out.toAbsolutePath.relativize(sp).toString
      catch { case _: IllegalArgumentException => sp.toString }
    }
    generate(spark, root, slaHours, defaultSlaHours, storyDir, configPath,
      storyHref = relStory)
      .foreach { case (name, html) =>
        java.nio.file.Files.writeString(out.resolve(name), html)
      }
    out.resolve("index.html").toString
  }
}
