package graft.core

import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}

/**
 * Run "story" generator (reference: odibi/story/generator.py — the
 * per-run audit document). Emits one JSON document per pipeline run
 * (node outcomes, lineage edges, output schemas) plus an HTML rendering
 * of the same content (generator.py:1559 `_render_index_html` family) —
 * the reference's user-facing audit artifact.
 */
object Story {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def generate(cfg: Pipeline.PipelineConfig,
               results: Map[String, Pipeline.NodeResult],
               runId: String, wallMs: Long): String = {
    val nodes = cfg.nodes.map { n =>
      val r = results.get(n.name)
      val status = r match {
        case Some(x) if x.skipped => "skipped"
        case Some(x) if x.failure.isEmpty => "success"
        case Some(_) => "failed"
        case None => "not_run"
      }
      val error = r.flatMap(_.failure)
        .map(e => q(Option(e.getMessage).getOrElse(e.toString))).getOrElse("null")
      val schema = r.filter(x => x.failure.isEmpty && !x.skipped)
        .map(x => q(x.df.schema.toDDL)).getOrElse("null")
      // rows from write-stage Observation metrics, never a count() re-run
      val rows = r.flatMap(_.rowsWritten).map(_.toString).getOrElse("null")
      val dur = r.map(_.durationMs).getOrElse(0L)
      val skipReason = r.flatMap(_.skipReason).map(q).getOrElse("null")
      // executor totals (NodeMetrics): the why behind duration_ms
      val metrics = r.map(_.metrics).filter(_.nonEmpty)
        .map(m => m.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}"))
        .getOrElse("null")
      s"""{"name": ${q(n.name)}, "status": ${q(status)}, "depends_on": [${
        n.dependsOn.map(q).mkString(", ")}], "duration_ms": $dur, "rows_written": $rows, "skip_reason": $skipReason, "error": $error, "schema": $schema, "metrics": $metrics}"""
    }
    s"""{
  "pipeline": ${q(cfg.name)},
  "run_id": ${q(runId)},
  "wall_ms": $wallMs,
  "n_nodes": ${cfg.nodes.size},
  "n_failed": ${results.values.count(_.failure.isDefined)},
  "nodes": [
    ${nodes.mkString(",\n    ")}
  ]
}"""
  }

  def write(path: String, cfg: Pipeline.PipelineConfig,
            results: Map[String, Pipeline.NodeResult],
            runId: String, wallMs: Long): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, generate(cfg, results, runId, wallMs))
  }

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /**
   * HTML rendering of the run story: summary header, per-node status table
   * (status / duration / rows / dependencies / error), validation results.
   * Deterministic for fixed inputs — no timestamps beyond the caller's
   * runId/wallMs — so it golden-file tests cleanly.
   */
  def generateHtml(cfg: Pipeline.PipelineConfig,
                   results: Map[String, Pipeline.NodeResult],
                   runId: String, wallMs: Long): String = {
    val nFailed = results.values.count(_.failure.isDefined)
    val rows = cfg.nodes.map { n =>
      val r = results.get(n.name)
      val status = r match {
        case Some(x) if x.skipped => "skipped"
        case Some(x) if x.failure.isEmpty => "success"
        case Some(_) => "failed"
        case None => "not_run"
      }
      val detail = r.flatMap(_.failure).map(e => esc(Option(e.getMessage).getOrElse(e.toString)))
        .orElse(r.flatMap(_.skipReason).map(sr => esc(s"skipped: $sr")))
        .getOrElse("")
      val rowsW = r.flatMap(_.rowsWritten).map(_.toString).getOrElse("&mdash;")
      val dur = r.map(_.durationMs).getOrElse(0L)
      val deps = if (n.dependsOn.isEmpty) "&mdash;" else esc(n.dependsOn.mkString(", "))
      val checks = r.map(_.validation).getOrElse(Nil).map { v =>
        val cls = if (v.passed) "ok" else "bad"
        s"""<span class="check $cls">${esc(v.test.name)}</span>"""
      }.mkString(" ")
      s"""      <tr class="$status"><td>${esc(n.name)}</td><td class="st">$status</td><td class="num">$dur</td><td class="num">$rowsW</td><td>$deps</td><td>$checks</td><td class="err">$detail</td></tr>"""
    }
    s"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>${esc(cfg.name)} &middot; $runId</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
  h1 { font-size: 1.3rem; } .meta { color: #555; margin-bottom: 1rem; }
  table { border-collapse: collapse; width: 100%; }
  th, td { text-align: left; padding: .4rem .7rem; border-bottom: 1px solid #ddd; font-size: .9rem; }
  td.num { text-align: right; font-variant-numeric: tabular-nums; }
  tr.success td.st { color: #2e7d32; } tr.failed td.st { color: #c62828; font-weight: 600; }
  tr.skipped td.st, tr.not_run td.st { color: #9e9e9e; }
  td.err { color: #c62828; max-width: 28rem; overflow-wrap: anywhere; }
  .check { padding: 0 .3rem; border-radius: .25rem; font-size: .8rem; }
  .check.ok { background: #e8f5e9; color: #2e7d32; } .check.bad { background: #ffebee; color: #c62828; }
</style></head>
<body>
  <h1>Pipeline run: ${esc(cfg.name)}</h1>
  <p class="meta">run <code>${esc(runId)}</code> &middot; ${cfg.nodes.size} nodes &middot; $nFailed failed &middot; $wallMs ms</p>
  <table>
    <thead><tr><th>node</th><th>status</th><th>ms</th><th>rows</th><th>depends on</th><th>checks</th><th>detail</th></tr></thead>
    <tbody>
${rows.mkString("\n")}
    </tbody>
  </table>
</body></html>
"""
  }

  def writeHtml(path: String, cfg: Pipeline.PipelineConfig,
                results: Map[String, Pipeline.NodeResult],
                runId: String, wallMs: Long): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, generateHtml(cfg, results, runId, wallMs))
  }

  private def safeName(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private val pageCss: String =
    """  body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
      |  h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin-top: 1.5rem; }
      |  .meta { color: #555; margin-bottom: 1rem; }
      |  table { border-collapse: collapse; }
      |  th, td { text-align: left; padding: .35rem .7rem; border-bottom: 1px solid #ddd; font-size: .9rem; }
      |  .st.success { color: #2e7d32; } .st.failed { color: #c62828; font-weight: 600; }
      |  .st.skipped, .st.not_run { color: #9e9e9e; }
      |  .err { color: #c62828; overflow-wrap: anywhere; white-space: pre-wrap; }
      |  .hint { color: #1565c0; background: #e3f2fd; padding: .4rem .7rem; border-radius: .25rem; }
      |  .check.ok { color: #2e7d32; } .check.bad { color: #c62828; font-weight: 600; }
      |  code { background: #f5f5f5; padding: 0 .2rem; }""".stripMargin

  /**
   * Per-node narrative page (reference: odibi/story/generator.py's
   * node sections, distilled to the load-bearing facts): status + timing
   * header, declared configuration, output schema, column lineage from
   * the analyzed plan (driver-side only — nothing executes), validation
   * outcomes, and the failure with its top stack frames.
   */
  def generateNodeHtml(cfg: Pipeline.PipelineConfig, node: Pipeline.NodeConfig,
                       result: Option[Pipeline.NodeResult],
                       runId: String): String = {
    val status = result match {
      case Some(x) if x.skipped => "skipped"
      case Some(x) if x.failure.isEmpty => "success"
      case Some(_) => "failed"
      case None => "not_run"
    }
    val dur = result.map(_.durationMs).getOrElse(0L)
    val rowsW = result.flatMap(_.rowsWritten).map(_.toString).getOrElse("&mdash;")
    def mb(v: Long): String = f"${v / 1048576.0}%.1f MB"
    val execFacts: Seq[(String, String)] = result.map(_.metrics) match {
      case Some(m) if m.nonEmpty => Seq(
        "tasks" -> m.getOrElse("tasks", 0L).toString,
        "shuffle r/w" -> s"${mb(m.getOrElse("shuffle_read_bytes", 0L))} / ${
          mb(m.getOrElse("shuffle_write_bytes", 0L))}",
        "spill (mem/disk)" -> s"${mb(m.getOrElse("memory_spill_bytes", 0L))} / ${
          mb(m.getOrElse("disk_spill_bytes", 0L))}",
        "input" -> mb(m.getOrElse("input_bytes", 0L)))
      case _ => Nil
    }

    val facts: Seq[(String, String)] = execFacts ++ Seq(
      "depends on" -> (if (node.dependsOn.isEmpty) "&mdash;"
        else node.dependsOn.map(d =>
          s"""<a href="node_${safeName(d)}.html">${esc(d)}</a>""").mkString(", ")),
      "read" -> node.read.map(rc => esc(
        s"${rc.format} ${rc.path.orElse(rc.table).getOrElse("")}".trim))
        .getOrElse("&mdash;"),
      "transformer" -> node.transformer.map(esc).getOrElse("&mdash;"),
      "steps" -> (if (node.steps.isEmpty) "&mdash;" else node.steps.size.toString),
      "semantic" -> node.semantic.map(s => esc(s.query)).getOrElse("&mdash;"),
      "write" -> node.writePath.map(p => esc(s"${node.write.format} $p"))
        .getOrElse("&mdash;"),
      "duration" -> s"$dur ms",
      "rows written" -> rowsW) ++
      result.flatMap(_.skipReason).map("skip reason" -> esc(_)).toSeq
    val factRows = facts.map { case (k, v) =>
      s"""      <tr><th>$k</th><td>$v</td></tr>"""
    }

    val live = result.filter(r => r.failure.isEmpty && !r.skipped)
    val schemaRows = live.toSeq.flatMap(_.df.schema.fields.map(f =>
      s"""      <tr><td><code>${esc(f.name)}</code></td><td>${esc(f.dataType.simpleString)}</td></tr>"""))
    // column lineage is a driver-side plan traversal; a frame whose plan
    // cannot be analyzed (unresolved after failure) just renders nothing
    val lineageRows = live.toSeq.flatMap { r =>
      val m = try Lineage.columnLineage(r.df) catch { case _: Exception => Map.empty[String, Set[String]] }
      m.toSeq.sortBy(_._1).collect { case (out, srcs) if srcs.nonEmpty =>
        s"""      <tr><td><code>${esc(out)}</code></td><td>${srcs.toSeq.sorted.map(esc).mkString(", ")}</td></tr>"""
      }
    }
    val checkRows = result.map(_.validation).getOrElse(Nil).map { v =>
      val cls = if (v.passed) "ok" else "bad"
      s"""      <tr><td class="check $cls">${esc(v.test.name)}</td><td>${esc(v.test.kind)}</td><td>${if (v.passed) "pass" else "FAIL"}</td><td>${v.failedRows}</td><td>${esc(v.detail)}</td></tr>"""
    }
    val error = result.flatMap(_.failure).map { e =>
      val frames = e.getStackTrace.take(5).map(f => esc(f.toString)).mkString("\n")
      val hints = Suggestions.suggest(e).map(h =>
        s"""  <p class="hint">hint: ${esc(h)}</p>""").mkString("\n")
      s"""  <h2>Failure</h2>
  <p class="err">${esc(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")}
$frames</p>
$hints"""
    }.getOrElse("")

    def section(title: String, header: String, rows: Seq[String]): String =
      if (rows.isEmpty) ""
      else s"""  <h2>$title</h2>
  <table>
    <thead><tr>$header</tr></thead>
    <tbody>
${rows.mkString("\n")}
    </tbody>
  </table>
"""

    s"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>${esc(node.name)} &middot; ${esc(cfg.name)} &middot; ${esc(runId)}</title>
<style>
$pageCss
</style></head>
<body>
  <h1><a href="${safeName(cfg.name)}_story.html">${esc(cfg.name)}</a> / ${esc(node.name)}</h1>
  <p class="meta">run <code>${esc(runId)}</code> &middot; <span class="st $status">$status</span></p>
  <h2>Node</h2>
  <table>
    <tbody>
${factRows.mkString("\n")}
    </tbody>
  </table>
${section("Output schema", "<th>column</th><th>type</th>", schemaRows)}${
      section("Column lineage", "<th>output column</th><th>source columns</th>", lineageRows)}${
      section("Validation", "<th>test</th><th>kind</th><th>outcome</th><th>failed rows</th><th>detail</th>", checkRows)}$error</body></html>
"""
  }

  /**
   * Full run story as a linked site: the summary page (node names linked
   * to their detail pages) plus one page per node, all under `dir`.
   * Returns the summary page path.
   */
  def writeHtmlSite(dir: String, cfg: Pipeline.PipelineConfig,
                    results: Map[String, Pipeline.NodeResult],
                    runId: String, wallMs: Long): String = {
    Files.createDirectories(Paths.get(dir))
    val index = s"$dir/${safeName(cfg.name)}_story.html"
    val linked = generateHtml(cfg, results, runId, wallMs)
    // link each node cell to its page (the summary renderer stays
    // link-free for the single-file golden; the site adds them here)
    val withLinks = cfg.nodes.foldLeft(linked) { (html, n) =>
      html.replace(s"""<td>${esc(n.name)}</td>""",
        s"""<td><a href="node_${safeName(n.name)}.html">${esc(n.name)}</a></td>""")
    }
    Files.writeString(Paths.get(index), withLinks)
    cfg.nodes.foreach { n =>
      Files.writeString(Paths.get(s"$dir/node_${safeName(n.name)}.html"),
        generateNodeHtml(cfg, n, results.get(n.name), runId))
    }
    index
  }

  /**
   * Pipeline run-history index (reference `_generate_pipeline_index`,
   * generator.py:1491-1600): recent runs from the system catalog's
   * `meta_runs`, one row per run with node outcome counts and total
   * duration. Driver-side data is bounded by `lastN` runs.
   */
  def indexHtml(catalog: Catalog, pipeline: String, lastN: Int = 50): String = {
    import org.apache.spark.sql.functions._
    val runs = catalog.table("meta_runs")
      .filter(col("pipeline") === pipeline)
      .groupBy(col("run_id"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("n_failed"),
        sum(col("duration_ms")).as("total_ms"),
        max(col("recorded_at")).as("finished_at"))
      .orderBy(col("finished_at").desc)
      .limit(lastN)
      .collect()
    val rows = runs.map { r =>
      val failed = r.getAs[Long]("n_failed")
      val cls = if (failed == 0) "success" else "failed"
      val status = if (failed == 0) "success" else s"$failed failed"
      s"""      <tr class="$cls"><td>${esc(r.getAs[String]("run_id"))}</td><td class="st">$status</td><td class="num">${r.getAs[Long]("n_nodes")}</td><td class="num">${r.getAs[Long]("total_ms")}</td><td>${esc(String.valueOf(r.getAs[java.sql.Timestamp]("finished_at")))}</td></tr>"""
    }
    s"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>${esc(pipeline)} &middot; runs</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
  h1 { font-size: 1.3rem; }
  table { border-collapse: collapse; width: 100%; }
  th, td { text-align: left; padding: .4rem .7rem; border-bottom: 1px solid #ddd; font-size: .9rem; }
  td.num { text-align: right; font-variant-numeric: tabular-nums; }
  tr.success td.st { color: #2e7d32; } tr.failed td.st { color: #c62828; font-weight: 600; }
</style></head>
<body>
  <h1>Runs: ${esc(pipeline)}</h1>
  <table>
    <thead><tr><th>run</th><th>status</th><th>nodes</th><th>total ms</th><th>finished</th></tr></thead>
    <tbody>
${rows.mkString("\n")}
    </tbody>
  </table>
</body></html>
"""
  }

  def writeIndexHtml(path: String, catalog: Catalog, pipeline: String,
                     lastN: Int = 50): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, indexHtml(catalog, pipeline, lastN))
  }
}
