package graft

import graft.core.{EngineContext, Plugins, StandardTransformers, TransformerRegistry}

class PluginSpec extends SparkSpec {

  import spark.implicits._

  test("ServiceLoader discovers plugins; failures are data, not crashes") {
    StandardTransformers.registerAll
    val loaded = Plugins.loadAll
    assert(loaded.exists(p => p.name == "test-plugin" && p.error.isEmpty))
    val broken = loaded.find(_.name == "broken-plugin")
    assert(broken.exists(_.error.exists(_.contains("intentional test failure"))))
  }

  test("a plugin transformer is registered and runs like a standard one") {
    StandardTransformers.registerAll
    val t = TransformerRegistry.get("plugin_tag_rows")
    assert(t.isDefined, "plugin transformer missing from registry")
    val out = t.get.apply(
      EngineContext(Seq((1, "a")).toDF("id", "v")),
      Map("column" -> "src", "value" -> "ext"))
    assert(out.columns.contains("src"))
    assert(out.select("src").as[String].collect().sameElements(Array("ext")))
  }

  test("plugin transformers resolve from YAML pipelines; planner lists them") {
    val dir = java.nio.file.Files.createTempDirectory("plug").toString
    Seq((1, "x"), (2, "y")).toDF("id", "v").write.parquet(s"$dir/in")
    val yaml =
      s"""name: plugged
         |nodes:
         |  - name: src
         |    read: { format: parquet, path: $dir/in }
         |    steps:
         |      - function: plugin_tag_rows
         |        params: { column: origin, value: plugin }
         |""".stripMargin
    val resp = graft.core.Planner.plan(yaml, None)
    assert(resp.valid, resp.diagnostics.mkString("; "))
    assert(resp.diagnostics.exists(d =>
      d.code == "plugin_loaded" && d.message.contains("test-plugin")))
    assert(resp.diagnostics.exists(d =>
      d.code == "plugin_failed" && d.severity == "warning" &&
        d.message.contains("broken-plugin")))

    val results = graft.core.Pipeline.run(spark,
      graft.core.YamlConfig.loadPipeline(yaml))
    val out = results("src").df
    assert(out.select("origin").distinct().as[String].collect()
      .sameElements(Array("plugin")))

    // the inventory (graft.Tools list) shows both outcomes
    val inv = graft.core.Introspect.inventory()
    assert(inv("plugins").exists(_ == "test-plugin"))
    assert(inv("plugins").exists(_.startsWith("broken-plugin (FAILED")))
  }
}
