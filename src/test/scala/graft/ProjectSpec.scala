package graft

import graft.core.{Pipeline, Planner, YamlConfig}

/** Multi-pipeline project files (reference: project + pipelines list). */
class ProjectSpec extends SparkSpec {

  private def projectYaml(out: String) =
    s"""project: demo
       |connections:
       |  testdata: { kind: file, base_path: /root/testdata/sf0.001 }
       |  lake: { kind: file, base_path: $out }
       |pipelines:
       |  - pipeline: bronze
       |    nodes:
       |      - name: regions
       |        read: { format: parquet, connection: testdata, path: region.parquet }
       |        write: { format: parquet, mode: overwrite, connection: lake, path: bronze/regions }
       |  - pipeline: silver
       |    nodes:
       |      - name: top
       |        input: "$$bronze.regions"
       |        steps:
       |          - sql: SELECT r_regionkey, r_name FROM df ORDER BY r_regionkey LIMIT 3
       |""".stripMargin

  test("project file loads shared blocks into every pipeline") {
    val project = YamlConfig.loadProject(projectYaml("/tmp/p"))
    assert(project.name == "demo")
    assert(project.pipelines.map(_.name) == Seq("bronze", "silver"))
    // the shared connections applied: read path resolved under testdata
    assert(project.pipelines.head.nodes.head.read.get.path
      .contains("/root/testdata/sf0.001/region.parquet"))
  }

  test("planner validates the project shape with per-pipeline plans") {
    val r = Planner.plan(projectYaml("/tmp/p"))
    assert(r.valid, r.diagnostics.mkString("; "))
    assert(r.pipelinePlans.map(_.pipeline) == Seq("bronze", "silver"))
    assert(r.toJson.contains("\"pipelines\": ["))

    val dup = projectYaml("/tmp/p")
      .replace("- pipeline: silver", "- pipeline: bronze")
    val rd = Planner.plan(dup)
    assert(rd.errors.map(_.code).contains("duplicate_pipeline"))

    // node-level problems carry pipeline-qualified subjects
    val broken = projectYaml("/tmp/p").replace("input: \"$bronze.regions\"",
      "transformer: nope_not_real")
    val rb = Planner.plan(broken)
    assert(rb.errors.exists(d =>
      d.code == "unknown_transformer" && d.subject == "silver/top"))
  }

  test("runProject resolves $pipeline.node across pipelines in-process") {
    val out = java.nio.file.Files.createTempDirectory("project").toString
    val project = YamlConfig.loadProject(projectYaml(out))
    val results = Pipeline.runProject(spark, project)
    val failures = results.values.flatMap(_.values).filter(_.failure.isDefined)
    assert(failures.isEmpty, failures.map(_.failure.get.toString).mkString("; "))
    assert(results("silver")("top").df.count() == 3)
    assert(spark.read.parquet(s"$out/bronze/regions").count() == 5)
  }
}
