package graft

import graft.core.{Catalog, Doctor => Doc, Pipeline, YamlConfig}

class DoctorSpec extends SparkSpec {

  import spark.implicits._

  test("env checks: healthy JVM/Spark report with session conf probes") {
    val checks = Doc.envChecks(Some(spark))
    val byName = checks.map(c => c.name -> c).toMap
    assert(byName("java").status == "ok")
    assert(byName("spark_jars").detail.contains(org.apache.spark.SPARK_VERSION))
    assert(byName.contains("spark_session"))
    assert(byName.contains("shuffle_partitions"))
    assert(Doc.Report(checks).status != "errors")
  }

  test("config lint flags a broken config and passes a clean one") {
    val dir = java.nio.file.Files.createTempDirectory("doctor").toString
    val bad = s"$dir/bad.yaml"
    // unknown transformer: the planner must produce an error diagnostic
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bad),
      "name: p\nnodes:\n  - name: x\n    transformer: definitely_not_a_thing\n")
    val checks = Doc.configChecks(bad)
    assert(checks.exists(_.status == "error"), checks.mkString("; "))

    val good = s"$dir/good.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(good),
      s"""name: p
         |connections:
         |  data: { kind: file, base_path: $dir }
         |nodes:
         |  - name: x
         |    read: { format: parquet, connection: data, path: in }
         |""".stripMargin)
    val ok = Doc.configChecks(good)
    assert(ok.forall(_.status != "error"), ok.mkString("; "))
    assert(ok.exists(c => c.name == "connection:data" && c.status == "ok"))
    assert(Doc.configChecks(s"$dir/missing.yaml").head.status == "error")
  }

  test("substituted config lint keeps relative sql_file refs resolvable") {
    val dir = java.nio.file.Files.createTempDirectory("doctorsub").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/queries"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/queries/agg.sql"), "SELECT 1 AS one")
    val cfg = s"$dir/p.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfg),
      s"""name: p
         |nodes:
         |  - name: x
         |    read: { format: parquet, path: $${IN} }
         |    steps:
         |      - sql_file: queries/agg.sql
         |""".stripMargin)
    // in-memory substitution with the original baseDir: the relative
    // sql_file must NOT produce a missing-file error
    val subbed = java.nio.file.Files.readString(java.nio.file.Paths.get(cfg))
      .replace("${IN}", s"$dir/in")
    val checks = Doc.configChecksText(subbed, cfg)
    assert(checks.forall(_.status != "error"), checks.mkString("; "))
  }

  test("diagnosePath: file, directory, missing") {
    val dir = java.nio.file.Files.createTempDirectory("doctorp").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.csv"), "a,b\n1,2\n")
    assert(Doc.diagnosePath(dir).status == "ok")
    val f = Doc.diagnosePath(s"$dir/t.csv")
    assert(f.status == "ok" && f.detail.contains("format=csv"))
    assert(Doc.diagnosePath(s"$dir/ghost").status == "error")
  }

  test("a seeded failing run is diagnosed from the catalog with a fix hint") {
    val dir = java.nio.file.Files.createTempDirectory("doctorh").toString
    Seq((1, "a"), (2, "b")).toDF("id", "cat").write.parquet(s"$dir/in")
    val cfg = Pipeline.PipelineConfig("diagme", Seq(
      Pipeline.NodeConfig("good",
        read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in")))),
      Pipeline.NodeConfig("broken",
        read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in"))),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT no_such_col FROM df"))))))
    val catalog = new Catalog(spark, s"$dir/_system")
    val results = Catalog.runRecorded(spark, cfg, catalog, "run_test_1")
    assert(results("broken").failure.isDefined) // the seed really failed

    val checks = Doc.historyChecks(spark, s"$dir/_system")
    val head = checks.head
    assert(head.name == "history" && head.status == "error")
    assert(head.detail.contains("run_test_1") && head.detail.contains("1 failed"))
    val nodeCheck = checks.find(_.name == "node:broken").get
    assert(nodeCheck.status == "error")
    // the recorded UNRESOLVED_COLUMN failure maps to the schema fix hint
    assert(nodeCheck.fix.contains("column not found"), nodeCheck.fix)

    // a later green run flips the report back to ok
    val fixed = cfg.copy(nodes = cfg.nodes.map(n =>
      if (n.name == "broken") n.copy(steps =
        Seq(Pipeline.TransformStep(sql = Some("SELECT id FROM df")))) else n))
    Catalog.runRecorded(spark, fixed, catalog, "run_test_2")
    val after = Doc.historyChecks(spark, s"$dir/_system")
    assert(after.head.status == "ok" && after.head.detail.contains("run_test_2"))

    // empty catalog root: a warning, never a crash
    assert(Doc.historyChecks(spark, s"$dir/empty").head.status == "warn")
  }

  test("fix hints pattern-match the recorded failure text") {
    assert(Doc.fixHint("", "[PATH_NOT_FOUND] Path does not exist")
      .contains("upstream"))
    assert(Doc.fixHint("java.io.FileNotFoundException", "").contains("upstream"))
    assert(Doc.fixHint("", "[UNRESOLVED_COLUMN.WITH_SUGGESTION] x")
      .contains("column"))
    assert(Doc.fixHint("", "quality gate blocked: 2 tests failed")
      .contains("meta_metrics"))
    assert(Doc.fixHint("java.lang.OutOfMemoryError", "").contains("memory"))
    assert(Doc.fixHint("", "boom").contains("--select"))
  }

  test("Doctor CLI aggregates and exits by severity") {
    assert(Doctor.mainExit(Array("--json")) == 0)
    assert(Doctor.mainExit(Array("--path", "/definitely/not/here")) == 1)
    assert(Doctor.mainExit(Array("--bogus")) == 2)
  }
}
