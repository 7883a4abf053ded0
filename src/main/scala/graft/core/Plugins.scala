package graft.core

/**
 * Third-party extension hook (reference: odibi/plugins.py:1-80 — pip
 * entry points in the `odibi.connections` group, loaded at startup with
 * log-and-continue error handling). The JVM-native analogue is
 * `java.util.ServiceLoader`: an extension jar ships an implementation of
 * this trait plus a `META-INF/services/graft.core.GraftPlugin` file
 * naming it, and every registry bootstrap discovers it — no changes to
 * graft itself, no compile-time dependency in either direction.
 *
 * A plugin's `register()` runs once per JVM and may register anything
 * the public registries accept: transformers ([[TransformerRegistry]])
 * and composite patterns ([[graft.patterns.PatternRegistry]]). Do not
 * call `StandardTransformers.registerAll` from inside a plugin — plugins
 * load FROM that bootstrap, and re-entering a lazy initializer deadlocks.
 */
trait GraftPlugin {
  /** Display name, shown in planner diagnostics and `graft.Tools list`. */
  def name: String

  /** Register this plugin's transformers / patterns / recipes. */
  def register(): Unit
}

object Plugins {

  /** One discovery outcome: a plugin that registered, or one that failed
    * (kept as data — a broken plugin must not take down the host, the
    * reference logs-and-continues the same way). */
  final case class Loaded(name: String, className: String,
                          error: Option[String] = None)

  /** Discover and register every classpath plugin, exactly once per JVM. */
  lazy val loadAll: Seq[Loaded] = {
    val out = scala.collection.mutable.Buffer.empty[Loaded]
    val it = java.util.ServiceLoader.load(classOf[GraftPlugin]).iterator()
    var more = try it.hasNext catch {
      case e: java.util.ServiceConfigurationError =>
        out += Loaded("<unloadable>", "<unknown>",
          Some(Option(e.getMessage).getOrElse(e.toString)))
        false // a broken services file poisons the whole scan — stop here
    }
    while (more) {
      // next() throws ServiceConfigurationError for an unloadable provider
      // CLASS; the iterator stays usable, so record it and keep scanning
      try {
        val p = it.next()
        try {
          p.register()
          out += Loaded(p.name, p.getClass.getName)
        } catch {
          case e: Exception =>
            out += Loaded(p.name, p.getClass.getName,
              Some(Option(e.getMessage).getOrElse(e.toString)))
        }
      } catch {
        case e: java.util.ServiceConfigurationError =>
          out += Loaded("<unloadable>", "<unknown>",
            Some(Option(e.getMessage).getOrElse(e.toString)))
      }
      more = try it.hasNext catch {
        case e: java.util.ServiceConfigurationError =>
          out += Loaded("<unloadable>", "<unknown>",
            Some(Option(e.getMessage).getOrElse(e.toString)))
          false
      }
    }
    out.toSeq
  }
}
