package graft

import org.apache.spark.sql.functions._

import graft.core.{EngineContext, GraftPlugin, Transformer, TransformerRegistry}

/** ServiceLoader-discovered test plugin (declared in
  * src/test/resources/META-INF/services/graft.core.GraftPlugin): registers
  * one transformer the standard set doesn't have, proving third-party
  * extension without touching graft code. */
class TestPlugin extends GraftPlugin {
  override def name: String = "test-plugin"
  override def register(): Unit =
    TransformerRegistry.register(new Transformer {
      override def name: String = "plugin_tag_rows"
      override def apply(ctx: EngineContext, params: Map[String, Any]) =
        ctx.df.withColumn(
          params.get("column").map(_.toString).getOrElse("tag"),
          lit(params.get("value").map(_.toString).getOrElse("plugged")))
    })
}

/** A plugin whose register() throws — discovery must record the failure
  * and keep the working plugins (reference plugins.py logs-and-continues). */
class BrokenTestPlugin extends GraftPlugin {
  override def name: String = "broken-plugin"
  override def register(): Unit =
    throw new IllegalStateException("intentional test failure")
}
