package graft

import graft.core.{Pipeline, Story}
import graft.sources.Sources

class StorySpec extends SparkSpec {

  test("story JSON summarizes run outcomes, lineage and schemas") {
    val cfg = Pipeline.PipelineConfig("p", Seq(
      Pipeline.NodeConfig("src", read = Some(Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet")))),
      Pipeline.NodeConfig("bad", dependsOn = Seq("src"),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT broken FROM df"))))))
    val results = Pipeline.run(spark, cfg)
    val json = Story.generate(cfg, results, "run-7", 1234)
    assert(json.contains("\"run_id\": \"run-7\""))
    assert(json.contains("\"n_failed\": 1"))
    assert(json.contains("\"name\": \"src\", \"status\": \"success\""))
    assert(json.contains("\"name\": \"bad\", \"status\": \"failed\""))
    assert(json.contains("r_regionkey")) // schema captured
    // valid JSON: parseable by the JVM's nashorn-free minimal check — just
    // balance braces and ensure no raw control chars
    assert(json.count(_ == '{') == json.count(_ == '}'))

    val path = java.nio.file.Files.createTempDirectory("story").toString + "/story.json"
    Story.write(path, cfg, results, "run-7", 1234)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
  }

  test("3-node story carries per-node timings and write-metric row counts") {
    val dir = java.nio.file.Files.createTempDirectory("story3").toString
    val cfg = Pipeline.PipelineConfig("p3", Seq(
      Pipeline.NodeConfig("src", read = Some(Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet"))),
        writePath = Some(s"$dir/src_out")),
      Pipeline.NodeConfig("filtered", dependsOn = Seq("src"),
        steps = Seq(Pipeline.TransformStep(sql = Some(
          "SELECT * FROM df WHERE r_regionkey < 3"))),
        writePath = Some(s"$dir/filtered_out")),
      Pipeline.NodeConfig("agg", dependsOn = Seq("filtered"),
        steps = Seq(Pipeline.TransformStep(sql = Some(
          "SELECT count(*) AS n FROM df"))))))
    val results = Pipeline.run(spark, cfg)
    assert(results.values.forall(_.failure.isEmpty))
    // rows written come from the write-stage Observation, not a count()
    assert(results("src").rowsWritten.contains(5L))
    assert(results("filtered").rowsWritten.contains(3L))
    assert(results("agg").rowsWritten.isEmpty) // no sink on agg

    val json = Story.generate(cfg, results, "run-8", 99)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json) // well-formed JSON
    assert(root.get("pipeline").asText() == "p3")
    val nodes = root.get("nodes")
    assert(nodes.size() == 3)
    val byName = (0 until nodes.size()).map(i => nodes.get(i))
      .map(n => n.get("name").asText() -> n).toMap
    assert(byName("src").get("rows_written").asLong() == 5L)
    assert(byName("filtered").get("rows_written").asLong() == 3L)
    assert(byName("agg").get("rows_written").isNull)
    assert(byName.values.forall(_.get("duration_ms").asLong() >= 0L))
    assert(byName("filtered").get("depends_on").get(0).asText() == "src")
  }

  test("story HTML matches the golden file") {
    // handcrafted results (fixed durations/rows) so the rendering is
    // byte-for-byte deterministic
    val cfg = Pipeline.PipelineConfig("gold", Seq(
      Pipeline.NodeConfig("bronze"),
      Pipeline.NodeConfig("silver", dependsOn = Seq("bronze")),
      Pipeline.NodeConfig("dead", dependsOn = Seq("silver"))))
    val vt = graft.validation.Validation.Test("ids_unique", "unique")
    val results = Map(
      "bronze" -> Pipeline.NodeResult("bronze", spark.emptyDataFrame, None,
        durationMs = 120L, rowsWritten = Some(500L),
        validation = Seq(graft.validation.Validation.TestResult(vt, passed = true, 0, "ok"))),
      "silver" -> Pipeline.NodeResult("silver", spark.emptyDataFrame,
        Some(new IllegalStateException("boom <&> \"quoted\"")), durationMs = 40L),
      "dead" -> Pipeline.NodeResult("dead", spark.emptyDataFrame, None,
        skipped = true, skipReason = Some("dependency_disabled")))
    val html = Story.generateHtml(cfg, results, "run-gold", 777L)

    val golden = java.nio.file.Paths.get("src/test/resources/story_golden.html")
    if (!java.nio.file.Files.exists(golden)) {
      java.nio.file.Files.createDirectories(golden.getParent)
      java.nio.file.Files.writeString(golden, html) // bootstrap once, then committed
    }
    assert(html == java.nio.file.Files.readString(golden),
      "HTML rendering drifted from src/test/resources/story_golden.html")
    // spot checks: escaping, status classes, check badges
    assert(html.contains("boom &lt;&amp;&gt; &quot;quoted&quot;"))
    assert(html.contains("""<tr class="failed">""") && html.contains("""<tr class="skipped">"""))
    assert(html.contains("""<span class="check ok">ids_unique</span>"""))

    val dir = java.nio.file.Files.createTempDirectory("storyhtml").toString
    Story.writeHtml(s"$dir/story.html", cfg, results, "run-gold", 777L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/story.html")))
  }

  test("node detail page matches the golden file; site cross-links") {
    import spark.implicits._
    // a parquet-backed frame so schema + column lineage render (lineage
    // tracks relation columns; a local Seq has none)
    val src = java.nio.file.Files.createTempDirectory("storysrc").toString
    Seq((1L, "x")).toDF("id", "name").write.mode("overwrite").parquet(s"$src/in")
    val out = spark.read.parquet(s"$src/in")
      .selectExpr("id", "upper(name) AS shout", "id * 2 AS doubled")
    val vt = graft.validation.Validation.Test("ids_unique", "unique")
    val cfg = Pipeline.PipelineConfig("gold", Seq(
      Pipeline.NodeConfig("bronze",
        read = Some(graft.sources.Sources.ReadConfig("parquet", Some("/data/in"))),
        writePath = Some("/data/out")),
      Pipeline.NodeConfig("silver", dependsOn = Seq("bronze"))))
    val results = Map(
      "bronze" -> Pipeline.NodeResult("bronze", out, None,
        durationMs = 120L, rowsWritten = Some(500L),
        validation = Seq(
          graft.validation.Validation.TestResult(vt, passed = true, 0, "ok"),
          graft.validation.Validation.TestResult(
            graft.validation.Validation.Test("no_nulls", "not_null"),
            passed = false, 3, "3 null ids"))),
      "silver" -> Pipeline.NodeResult("silver", spark.emptyDataFrame,
        Some(new IllegalStateException("boom"))))
    val html = Story.generateNodeHtml(cfg, cfg.nodes.head,
      results.get("bronze"), "run-gold")

    val golden = java.nio.file.Paths.get("src/test/resources/story_node_golden.html")
    if (!java.nio.file.Files.exists(golden)) {
      java.nio.file.Files.createDirectories(golden.getParent)
      java.nio.file.Files.writeString(golden, html) // bootstrap once, then committed
    }
    assert(html == java.nio.file.Files.readString(golden),
      "node page rendering drifted from src/test/resources/story_node_golden.html")
    // spot checks: schema, lineage, validation outcomes
    assert(html.contains("<code>shout</code>") && html.contains("name"))
    assert(html.contains("""<td class="check bad">no_nulls</td>"""))
    assert(html.contains("parquet /data/in") && html.contains("500"))

    // failed node page carries the exception and stack top
    val failedPage = Story.generateNodeHtml(cfg, cfg.nodes(1),
      results.get("silver"), "run-gold")
    assert(failedPage.contains("IllegalStateException") && failedPage.contains("boom"))
    // dependency links back to the upstream node's page
    assert(failedPage.contains("""<a href="node_bronze.html">bronze</a>"""))

    // the site writer emits summary + per-node pages, cross-linked
    val dir = java.nio.file.Files.createTempDirectory("storysite").toString
    val index = Story.writeHtmlSite(dir, cfg, results, "run-gold", 777L)
    val idx = java.nio.file.Files.readString(java.nio.file.Paths.get(index))
    assert(idx.contains("""<a href="node_bronze.html">bronze</a>"""))
    Seq("node_bronze.html", "node_silver.html").foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$f")), f)
    }
  }

  test("run-history index renders recent runs from the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("storyidx").toString
    val catalog = new graft.core.Catalog(spark, s"$dir/_system")
    val cfg = Pipeline.PipelineConfig("idx", Seq(
      Pipeline.NodeConfig("src", read = Some(Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet"))))))
    graft.core.Catalog.runRecorded(spark, cfg, catalog, "run-1")
    val badCfg = cfg.copy(nodes = Seq(Pipeline.NodeConfig("src",
      read = Some(Sources.ReadConfig("parquet", Some(s"$dir/nope"))))))
    graft.core.Catalog.runRecorded(spark, badCfg, catalog, "run-2")

    val html = Story.indexHtml(catalog, "idx")
    assert(html.contains("run-1") && html.contains("run-2"))
    assert(html.contains("""<tr class="success"><td>run-1</td>"""))
    assert(html.contains("""<tr class="failed"><td>run-2</td><td class="st">1 failed</td>"""))
    Story.writeIndexHtml(s"$dir/index.html", catalog, "idx")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/index.html")))
  }
}
