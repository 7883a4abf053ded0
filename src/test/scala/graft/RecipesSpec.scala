package graft

import graft.core.{Pipeline, Planner, Recipes, YamlConfig}

class RecipesSpec extends SparkSpec {

  test("inline recipe expands with var substitution; node keys win") {
    val yaml =
      """name: p
        |recipes:
        |  my_dedup:
        |    description: dedup by a key
        |    required_vars: [key_column]
        |    optional_vars: { mode: overwrite }
        |    template:
        |      steps:
        |        - operation: drop_duplicates
        |          params: { subset: ["${recipe.key_column}"] }
        |      write: { format: parquet, mode: "${recipe.mode}" }
        |nodes:
        |  - name: dedup_regions
        |    recipe: my_dedup
        |    recipe_vars: { key_column: r_regionkey }
        |    read: { format: parquet, path: /root/testdata/sf0.001/region.parquet }
        |    write: { mode: append }
        |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    val node = cfg.nodes.head
    assert(node.steps.head.operation.contains("drop_duplicates"))
    assert(node.steps.head.params("subset") == Seq("r_regionkey"))
    assert(node.write.format == "parquet")
    assert(node.write.mode == "append") // node override beats template
    val r = Pipeline.run(spark, cfg)
    assert(r("dedup_regions").failure.isEmpty)
    assert(r("dedup_regions").df.count() == 5)
  }

  test("full-match placeholders preserve types; required vars enforced") {
    val yaml =
      """name: p
        |recipes:
        |  keyed:
        |    required_vars: [keys]
        |    template:
        |      steps:
        |        - operation: drop_duplicates
        |          params: { subset: "${recipe.keys}" }
        |nodes:
        |  - name: n
        |    recipe: keyed
        |    recipe_vars: { keys: [a, b] }
        |    input: ext
        |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    assert(cfg.nodes.head.steps.head.params("subset") == Seq("a", "b")) // list stays a list

    val missing = yaml.replace("recipe_vars: { keys: [a, b] }", "")
    val e = intercept[IllegalArgumentException] { YamlConfig.loadPipeline(missing) }
    assert(e.getMessage.contains("missing required vars"))
  }

  test("recipe inheritance: child wins, cycles rejected") {
    val base = Map(
      "base" -> Map(
        "optional_vars" -> Map("mode" -> "overwrite"),
        "template" -> Map(
          "write" -> Map("format" -> "parquet", "mode" -> "${recipe.mode}"))),
      "child" -> Map(
        "extends" -> "base",
        "template" -> Map(
          "write" -> Map("mode" -> "append"),
          "cache" -> true)))
    val resolved = Recipes.resolve(Map(
      "recipes" -> base,
      "nodes" -> Seq(Map("name" -> "n", "recipe" -> "child", "input" -> "x"))))
    val node = resolved("nodes").asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]
    val write = node("write").asInstanceOf[Map[String, Any]]
    assert(write("format") == "parquet" && write("mode") == "append")
    assert(node("cache") == true)

    val cyclic = Map(
      "a" -> Map("extends" -> "b", "template" -> Map("cache" -> true)),
      "b" -> Map("extends" -> "a", "template" -> Map("cache" -> true)))
    val e = intercept[IllegalArgumentException] {
      Recipes.resolve(Map("recipes" -> cyclic, "nodes" -> Nil))
    }
    assert(e.getMessage.contains("circular"))
  }

  test("built-in validated_load wires tests and quarantine declaratively") {
    val yaml =
      """name: p
        |nodes:
        |  - name: v
        |    recipe: validated_load
        |    recipe_vars: { key_column: r_regionkey, quarantine_path: /tmp/q }
        |    read: { format: parquet, path: /root/testdata/sf0.001/region.parquet }
        |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    val n = cfg.nodes.head
    assert(n.tests.map(_.name).toSet == Set("pk_not_null", "pk_unique"))
    assert(n.quarantinePath.contains("/tmp/q"))
  }

  test("planner surfaces recipe problems as diagnostics") {
    val r = Planner.plan(
      """name: p
        |nodes:
        |  - name: n
        |    recipe: no_such_recipe
        |    input: x
        |""".stripMargin)
    assert(!r.valid)
    assert(r.errors.map(_.code).contains("recipe_invalid"))

    val ok = Planner.plan(
      """name: p
        |nodes:
        |  - name: n
        |    recipe: validated_load
        |    recipe_vars: { key_column: k, quarantine_path: /tmp/q }
        |    input: x
        |""".stripMargin)
    assert(ok.valid, ok.diagnostics.mkString("; "))
    assert(ok.plan.get.nodes.head.nTests == 2)
  }
}
