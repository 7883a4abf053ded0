package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.util.Try

/**
 * Declarative alert dispatch (reference: `AlertConfig`,
 * odibi/config.py:162-240; dispatch `_send_alerts`,
 * odibi/pipeline.py:1443-1490). A project YAML `alerts:` block declares
 * channels with event filters; [[dispatcher]] turns them into the
 * `RunOptions.onAlert` callback.
 *
 * Channels: `file` (JSONL append to `target`), `console` (stderr), and
 * `webhook` — the HTTP POST itself goes through a registered transport
 * (this environment has no egress; the pluggable-transport stance matches
 * ApiSource / SqlServerWriter). Event filters accept both this library's
 * event names and the reference's `on_*` aliases.
 */
object Alerts {

  /** One alert channel. `maxAlerts` is per-run throttling (the reference's
    * throttle metadata, config.py:186-187). */
  final case class AlertConfig(
      channel: String,                       // file | console | webhook
      target: Option[String] = None,         // file path | transport name
      onEvents: Seq[String] = Seq("on_failure", "on_gate_block"),
      maxAlerts: Option[Int] = None)

  /** Reference event-name aliases → this library's event names. */
  private val aliases: Map[String, Set[String]] = Map(
    "on_start" -> Set("run_start"),
    "on_success" -> Set("run_success"),
    "on_failure" -> Set("run_failure", "node_failure"),
    "on_gate_block" -> Set("gate_abort"),
    "on_quarantine" -> Set("quarantine"))

  private[graft] def matches(cfgEvents: Seq[String], event: String): Boolean =
    cfgEvents.exists(e => e == event || aliases.get(e).exists(_.contains(event)))

  // named webhook transports, registered by the embedding application
  private val transports = new ConcurrentHashMap[String, (String, String) => Unit]()

  /** Register a webhook transport under a name referenced by `target`. */
  def registerTransport(name: String, send: (String, String) => Unit): Unit = {
    transports.put(name, send)
    ()
  }

  private def payload(e: Pipeline.AlertEvent): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    s"""{"pipeline": ${q(e.pipeline)}, "node": ${q(e.node)}, "event": ${q(e.event)}, "message": ${q(e.message)}}"""
  }

  /**
   * Build an alert callback fanning out to every configured channel whose
   * event filter matches. Channel errors never propagate — an alert sink
   * outage must not fail the pipeline (the caller additionally wraps the
   * whole callback in Try) — but they are handed to `onError` so the loss
   * of observability is itself observable (the catalog records them as
   * `meta_observability_errors`; `onError` is guarded too).
   */
  def dispatcher(configs: Seq[AlertConfig],
                 onError: (AlertConfig, Throwable) => Unit = (_, _) => ())
      : Pipeline.AlertEvent => Unit = {
    val remaining = configs.map(c => new AtomicInteger(c.maxAlerts.getOrElse(Int.MaxValue)))
    event =>
      configs.zip(remaining).foreach { case (cfg, budget) =>
        if (matches(cfg.onEvents, event.event) && budget.getAndDecrement() > 0) {
          val line = payload(event)
          Try {
            cfg.channel match {
              case "file" =>
                val p = Paths.get(cfg.target.getOrElse(
                  throw new IllegalArgumentException("file alert needs target")))
                if (p.getParent != null) Files.createDirectories(p.getParent)
                Files.write(p, (line + "\n").getBytes(StandardCharsets.UTF_8),
                  StandardOpenOption.CREATE, StandardOpenOption.APPEND)
              case "console" => System.err.println(s"[alert] $line")
              case "webhook" =>
                val name = cfg.target.getOrElse(
                  throw new IllegalArgumentException("webhook alert needs target"))
                Option(transports.get(name)).getOrElse(
                  throw new IllegalStateException(s"no transport registered: $name"))
                  .apply(name, line)
              case other =>
                throw new IllegalArgumentException(s"unknown alert channel: $other")
            }
          }.failed.foreach(e => Try(onError(cfg, e)))
          ()
        }
      }
  }
}
