package graft

/** The `graft.Run` front door: e2e on the shipped example, exit codes,
  * node selection, story output. Uses mainExit (same code path as main,
  * minus the sys.exit) against the suite's shared session. */
class RunCliSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("runcli").toString

  test("runs the star_schema example end-to-end with story output") {
    val out = tmp()
    val code = Run.mainExit(Array(
      "examples/star_schema/project.yaml",
      "--set", s"OUT=$out",
      "--story", s"$out/story"))
    assert(code == 0)
    // sinks landed
    Seq("bronze/customers", "gold/fact_orders", "gold/monthly_metrics")
      .foreach(p => assert(spark.read.parquet(s"$out/$p").count() > 0, s"empty $p"))
    // story json + html + catalog-backed runs index all rendered
    val story = java.nio.file.Paths.get(s"$out/story")
    Seq("star_schema_demo_story.json", "star_schema_demo_story.html",
      "star_schema_demo_runs.html").foreach { f =>
      assert(java.nio.file.Files.size(story.resolve(f)) > 0, s"missing $f")
    }
    val json = new String(java.nio.file.Files.readAllBytes(
      story.resolve("star_schema_demo_story.json")), "UTF-8")
    assert(json.contains("\"n_failed\": 0"))
    // catalog recorded the run (runRecorded path, not bare run)
    assert(spark.read.parquet(s"$out/_system/meta_runs")
      .where("pipeline = 'star_schema_demo'").count() >= 6)
    // node state recorded beside the catalog so a later --resume can skip
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/_system/run_state.json")))
  }

  test("--select runs only the requested subtree") {
    val out = tmp()
    val code = Run.mainExit(Array(
      "examples/star_schema/project.yaml",
      "--set", s"OUT=$out",
      "--select", "dim_date"))
    assert(code == 0)
    assert(spark.read.parquet(s"$out/silver/dim_date").count() > 0)
    // unrelated sinks never materialized
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/gold/fact_orders")))
  }

  test("node failure exits 1; usage errors exit 2; dry-run gates configs") {
    val dir = tmp()
    val bad = s"$dir/bad.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bad),
      "name: bad\nnodes:\n  - name: x\n    steps:\n      - sql: \"SELECT nope FROM missing\"\n")
    assert(Run.mainExit(Array(bad)) == 1)
    assert(Run.mainExit(Array(bad, "--dry-run")) == 1)
    assert(Run.mainExit(Array.empty[String]) == 2)
    assert(Run.mainExit(Array(s"$dir/nope.yaml")) == 2)
    assert(Run.mainExit(Array(bad, "--bogus")) == 2)
    // malformed YAML (unparseable, not just invalid) exits cleanly too
    val mangled = s"$dir/mangled.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(mangled),
      "just a scalar, not a mapping")
    assert(Run.mainExit(Array(mangled)) == 2)
    assert(Run.mainExit(Array(mangled, "--dry-run")) == 1)
    // valid config passes the dry-run gate without touching Spark
    assert(Run.mainExit(Array(
      "examples/star_schema/project.yaml", "--set", s"OUT=$dir",
      "--dry-run")) == 0)
  }
}
