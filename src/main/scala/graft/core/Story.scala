package graft.core

import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}

/**
 * Run "story" generator (reference: odibi/story/generator.py — the
 * per-run audit document). Emits one JSON document per pipeline run:
 * node outcomes, lineage edges, output schemas. Deliberately plain JSON
 * (no HTML templating): the content, not the rendering, is the contract.
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
      val error = r.flatMap(_.failure).map(e => q(e.getMessage)).getOrElse("null")
      val schema = r.filter(x => x.failure.isEmpty && !x.skipped)
        .map(x => q(x.df.schema.toDDL)).getOrElse("null")
      // rows from write-stage Observation metrics, never a count() re-run
      val rows = r.flatMap(_.rowsWritten).map(_.toString).getOrElse("null")
      val dur = r.map(_.durationMs).getOrElse(0L)
      val skipReason = r.flatMap(_.skipReason).map(q).getOrElse("null")
      s"""{"name": ${q(n.name)}, "status": ${q(status)}, "depends_on": [${
        n.dependsOn.map(q).mkString(", ")}], "duration_ms": $dur, "rows_written": $rows, "skip_reason": $skipReason, "error": $error, "schema": $schema}"""
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
}
