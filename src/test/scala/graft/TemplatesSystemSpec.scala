package graft

import graft.core.{Catalog, Introspect, Pipeline, Planner}

/** `graft.Tools templates` scaffolds/JSON schema and `graft.Tools system
  * rebuild-summaries` (reference: odibi/cli/templates.py, system.py). */
class TemplatesSystemSpec extends SparkSpec {

  import spark.implicits._

  private def captured(body: => Int): (Int, String) = {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8"))(body)
    (code, out.toString("UTF-8"))
  }

  test("templates list names every scaffold and registry") {
    val (code, out) = captured(Tools.mainExit(Array("templates", "list")))
    assert(code == 0)
    Introspect.nodeTemplates.keys.foreach(k => assert(out.contains(k)))
    assert(out.contains("transformers (") && out.contains("patterns ("))
  }

  test("every node template plans valid (stub deps auto-wired)") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    Introspect.nodeTemplates.foreach { case (name, text) =>
      val isFullFile = !text.linesIterator.exists(_.startsWith("- name:"))
      val doc =
        if (isFullFile) text
        else {
          // wrap the fragment: stub a parquet source per undefined dep
          val nodes = yaml.load[Any](text)
            .asInstanceOf[java.util.List[java.util.Map[String, Any]]]
          val defined = new scala.collection.mutable.HashSet[String]
          val deps = new scala.collection.mutable.LinkedHashSet[String]
          nodes.forEach { n =>
            defined += String.valueOf(n.get("name"))
            n.get("depends_on") match {
              case l: java.util.List[_] => l.forEach(d => deps += String.valueOf(d))
              case _ => ()
            }
          }
          val stubs = (deps -- defined).map(d =>
            s"  - name: $d\n    read: { format: parquet, path: /tmp/$d }\n").mkString
          val semantics =
            if (name == "semantic")
              """semantics:
                |  metrics:
                |    - { name: revenue, expr: "sum(amount)", source: $t.orders }
                |  dimensions:
                |    - { name: month, column: ts, time_grain: month }
                |""".stripMargin
            else ""
          s"name: t\n$semantics" + "nodes:\n" + stubs +
            text.linesIterator.filterNot(_.startsWith("#"))
              .map("  " + _).mkString("", "\n", "\n")
        }
      val resp = Planner.plan(doc, None)
      assert(resp.valid,
        s"template '$name' does not plan: " +
          resp.diagnostics.map(d => s"${d.subject}: ${d.message}").mkString("; "))
    }
  }

  test("templates show/transformer: known and unknown names") {
    val (c1, out1) = captured(Tools.mainExit(Array("templates", "show", "pipeline")))
    assert(c1 == 0 && out1.contains("name: my_pipeline"))
    assert(Tools.mainExit(Array("templates", "show", "nope")) == 1)
    val (c2, out2) = captured(Tools.mainExit(Array(
      "templates", "transformer", "filter_rows")))
    assert(c2 == 0 && out2.contains("function: filter_rows"))
    val (c3, out3) = captured(Tools.mainExit(Array(
      "templates", "transformer", "scd2")))
    assert(c3 == 0 && out3.contains("transformer: scd2")) // pattern-first
    assert(Tools.mainExit(Array("templates", "transformer", "zzz_nope")) == 1)
  }

  test("templates schema is valid JSON mirroring the loader's strict sets") {
    val (code, out) = captured(Tools.mainExit(Array("templates", "schema")))
    assert(code == 0)
    val root = new org.yaml.snakeyaml.Yaml().load[Any](out) // JSON is YAML
      .asInstanceOf[java.util.Map[String, Any]]
    val defs = root.get("definitions").asInstanceOf[java.util.Map[String, Any]]
    val node = defs.get("node").asInstanceOf[java.util.Map[String, Any]]
    assert(node.get("additionalProperties") == false)
    val nodeProps = node.get("properties").asInstanceOf[java.util.Map[String, Any]]
    Planner.nodeKeySet.foreach(k => assert(nodeProps.containsKey(k), s"node key $k"))
    val testDef = defs.get("test").asInstanceOf[java.util.Map[String, Any]]
    val kindEnum = testDef.get("properties").asInstanceOf[java.util.Map[String, Any]]
      .get("kind").asInstanceOf[java.util.Map[String, Any]]
      .get("enum").asInstanceOf[java.util.List[Any]]
    Planner.testKindSet.foreach(k => assert(kindEnum.contains(k), s"test kind $k"))
    val fnEnum = defs.get("step").asInstanceOf[java.util.Map[String, Any]]
      .get("properties").asInstanceOf[java.util.Map[String, Any]]
      .get("function").asInstanceOf[java.util.Map[String, Any]]
      .get("enum").asInstanceOf[java.util.List[Any]]
    assert(fnEnum.contains("filter_rows") && fnEnum.contains("weighted_mix_tokens"))
    // --out writes the file
    val dir = java.nio.file.Files.createTempDirectory("tmplschema").toString
    val (c2, _) = captured(Tools.mainExit(Array(
      "templates", "schema", "--out", s"$dir/graft.schema.json")))
    assert(c2 == 0)
    assert(java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/graft.schema.json")) > 1000)
  }

  test("system rebuild-summaries materializes exactly once per run") {
    val dir = java.nio.file.Files.createTempDirectory("sysrebuild").toString
    val root = s"$dir/_system"
    Seq((1, "x"), (2, "y")).toDF("id", "v").write.parquet(s"$dir/in")
    val cfg = Pipeline.PipelineConfig("sysp", Seq(
      Pipeline.NodeConfig("src",
        read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in"))))))
    Catalog.runRecorded(spark, cfg, new Catalog(spark, root), "run1")

    val (c1, out1) = captured(Tools.mainExit(Array(
      "system", "rebuild-summaries", root, "--default-sla", "100000")))
    assert(c1 == 0, out1)
    assert("\\[built\\]".r.findAllIn(out1).size == 4, out1)
    val health = spark.read.parquet(s"$root/meta_pipeline_health")
    assert(health.filter($"pipeline" === "sysp").count() == 1)
    val sla = spark.read.parquet(s"$root/meta_sla_status")
    assert(sla.filter($"pipeline" === "sysp" && $"status" === "ok").count() == 1)
    assert(spark.read.parquet(s"$root/meta_daily_stats").count() >= 1)
    // the hotspot view materializes too (empty when no metrics recorded
    // is fine — the table must still publish)
    assert(new java.io.File(s"$root/meta_node_hotspots").exists())

    // same latest run: the claim guard skips all three
    val (c2, out2) = captured(Tools.mainExit(Array(
      "system", "rebuild-summaries", root)))
    assert(c2 == 0)
    assert("\\[skip \\]".r.findAllIn(out2).size == 4, out2)

    // an explicit new run id rebuilds
    val (c3, out3) = captured(Tools.mainExit(Array(
      "system", "rebuild-summaries", root, "--run-id", "manual2")))
    assert(c3 == 0)
    assert("\\[built\\]".r.findAllIn(out3).size == 4, out3)

    // empty catalog: clear error
    assert(Tools.mainExit(Array(
      "system", "rebuild-summaries", s"$dir/empty")) == 1)
    assert(Tools.mainExit(Array("system", "sync", "a", "b")) == 2)
    assert(Tools.mainExit(Array("system")) == 2)
  }

  test("ui renders the static observability site from the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("uisite").toString
    val root = s"$dir/_system"
    val catalog = new Catalog(spark, root)
    // one healthy run and one with a failed node
    catalog.recordRun("etl", "r1", Seq(("a", true, 120L, ""), ("b", true, 80L, "")))
    catalog.recordRun("etl", "r2", Seq(("a", true, 110L, ""), ("b", false, 30L, "boom")))
    catalog.recordRun("mart", "r9", Seq(("m", true, 40L, "")))
    // a story dir with one rendered site page
    val storyDir = s"$dir/story"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storyDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$storyDir/etl_r2_story.html"), "<html>s</html>")
    val cfgPath = s"$dir/p.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
      "name: etl\nnodes: []\n")

    val (code, out) = captured(Tools.mainExit(Array(
      "ui", root, "--out", s"$dir/site", "--story", storyDir,
      "--config", cfgPath, "--default-sla", "100000")))
    assert(code == 0, out)
    val index = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/site/index.html"))
    assert(index.contains("etl") && index.contains("mart"))
    assert(index.contains("50%")) // etl: 1 of 2 runs green
    assert(index.contains("100%")) // mart
    assert(index.contains(""">ok<""")) // sla fresh under the huge default
    assert(index.contains("<code>r2</code>"))
    val stories = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/site/stories.html"))
    assert(stories.contains("etl_r2_story.html") && stories.contains("etl_r2</a>"))
    // links resolve relative to the site dir
    assert(stories.contains("href=\"../story/etl_r2_story.html\""))
    val cfgHtml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/site/config.html"))
    assert(cfgHtml.contains("name: etl"))
    // empty catalog renders an empty-but-valid dashboard
    val (c2, _) = captured(Tools.mainExit(Array(
      "ui", s"$dir/none", "--out", s"$dir/site2")))
    assert(c2 == 0)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$dir/site2/index.html")).contains("no runs recorded yet"))
    assert(Tools.mainExit(Array("ui", root)) == 2)
  }

  test("ui --watch re-renders when the catalog changes, then exits at max-renders") {
    val dir = java.nio.file.Files.createTempDirectory("uiwatch").toString
    val root = s"$dir/_system"
    val catalog = new Catalog(spark, root)
    catalog.recordRun("etl", "r1", Seq(("a", true, 100L, "")))
    // writer thread: after the first render lands, append a second run so
    // the watcher's catalog fingerprint changes
    val writer = new Thread(() => {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/site/index.html")) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      catalog.recordRun("etl", "r2", Seq(("a", false, 50L, "boom")))
    })
    writer.start()
    val (code, out) = captured(Tools.mainExit(Array(
      "ui", root, "--out", s"$dir/site",
      "--watch", "--interval", "0.2", "--max-renders", "2")))
    writer.join()
    assert(code == 0, out)
    assert(out.linesIterator.count(_.contains("wrote")) == 2,
      s"expected 2 renders, got: $out")
    // the re-render picked up the new run: success rate fell to 50%
    val index = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/site/index.html"))
    assert(index.contains("50%") && index.contains("<code>r2</code>"))
  }
}
