package graft

import graft.core.{Catalog, Pipeline}

class ToolsSpec extends SparkSpec {

  import spark.implicits._

  private def captured(body: => Int): (Int, String) = {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8"))(body)
    (code, out.toString("UTF-8"))
  }

  test("list prints every registry with counts") {
    val (code, out) = captured(Tools.mainExit(Array("list")))
    assert(code == 0)
    assert(out.contains("transformers (") && out.contains("patterns (")
      && out.contains("recipes ("))
    assert(out.contains("weighted_mix_tokens") && out.contains("fact"))
  }

  test("graph renders the DAG as DOT; invalid config exits 1") {
    val dir = java.nio.file.Files.createTempDirectory("tools").toString
    val cfg = s"$dir/p.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfg),
      s"""name: g
         |nodes:
         |  - name: a
         |    read: { format: parquet, path: $${IN} }
         |  - name: b
         |    depends_on: [a]
         |    write: { format: parquet, path: $dir/out }
         |""".stripMargin)
    val (code, dot) = captured(Tools.mainExit(Array(
      "graph", cfg, "--set", s"IN=$dir/in")))
    assert(code == 0)
    assert(dot.startsWith("digraph pipeline {"))
    assert(dot.contains("\"g.a\" -> \"g.b\";"))
    assert(dot.contains("peripheries=2")) // sinks doubled
    val bad = s"$dir/bad.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bad),
      "name: g\nnodes:\n  - name: a\n    transformer: nope_not_real\n")
    assert(Tools.mainExit(Array("graph", bad)) == 1)
    assert(Tools.mainExit(Array("graph")) == 2)
    assert(Tools.mainExit(Array("nonsense")) == 2)
  }

  test("catalog and lineage read a seeded system catalog") {
    val dir = java.nio.file.Files.createTempDirectory("toolscat").toString
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$dir/in")
    val cfg = Pipeline.PipelineConfig("toolp", Seq(
      Pipeline.NodeConfig("src",
        read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in")))),
      Pipeline.NodeConfig("derived", dependsOn = Seq("src"),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT id, upper(v) AS vv FROM df"))))))
    Catalog.runRecorded(spark, cfg, new Catalog(spark, s"$dir/_system"), "r1")

    val (cc, rows) = captured(Tools.mainExit(Array(
      "catalog", s"$dir/_system", "meta_runs", "--pipeline", "toolp")))
    assert(cc == 0)
    assert(rows.linesIterator.size == 2 && rows.contains("\"node\":"))

    val (lc, edges) = captured(Tools.mainExit(Array(
      "lineage", s"$dir/_system", "--node", "derived")))
    assert(lc == 0)
    assert(edges.contains("toolp: src -> derived"))
    assert(edges.contains("=> vv")) // column lineage detail with --node

    // unknown table / empty lineage are clean exit-1 failures
    assert(Tools.mainExit(Array("catalog", s"$dir/_system", "meta_nope")) == 1)
    assert(Tools.mainExit(Array("lineage", s"$dir/empty")) == 1)
  }
}
