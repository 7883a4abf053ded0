package graft

/** The graft.Init scaffold must plan clean and run green with no edits. */
class InitSpec extends SparkSpec {

  test("scaffolded project plans clean and runs green end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("scaffold").toString + "/proj"
    assert(Init.mainExit(Array(dir, "--name", "Unit-Test Shop")) == 0)
    Seq("project.yaml", "data/sample.csv", "README.md",
        "tests/transforms_test.yaml", "graft.schema.json").foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$f")), f)
    }

    // the scaffolded declarative test suite passes as generated
    assert(Test.mainExit(Array(s"$dir/tests")) == 0)

    val plan = graft.core.Planner.planFile(s"$dir/project.yaml")
    assert(plan.valid, plan.diagnostics.mkString("; "))
    assert(plan.errors.isEmpty)
    assert(plan.plan.get.nodes.map(_.name) ==
      Seq("bronze_orders", "silver_orders", "region_daily"))

    assert(Run.mainExit(Array(s"$dir/project.yaml")) == 0)
    val silver = spark.read.parquet(s"$dir/silver/orders")
    assert(silver.columns.contains("net_amount"))
    assert(silver.count() == 6)
    val gold = spark.read.parquet(s"$dir/gold/region_daily")
    assert(gold.columns.toSet == Set("region", "order_date", "n_orders", "revenue"))
    assert(gold.count() > 0)
    // the run recorded into the scaffolded catalog root
    assert(spark.read.parquet(s"$dir/_system/meta_runs").count() >= 3)

    // never overwrites an existing project; usage errors exit 2
    assert(Init.mainExit(Array(dir)) == 2)
    assert(Init.mainExit(Array.empty[String]) == 2)
    assert(Init.mainExit(Array(dir, "--bogus")) == 2)

    // ANY clashing template file blocks the scaffold, not just project.yaml
    val partial = java.nio.file.Files.createTempDirectory("scafpart").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$partial/README.md"), "mine, hands off")
    assert(Init.mainExit(Array(partial)) == 2)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$partial/README.md")) == "mine, hands off")
  }
}
