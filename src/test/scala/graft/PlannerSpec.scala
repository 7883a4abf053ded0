package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Planner

/**
 * Dry-run planner (reference: odibi/planning.py). No SparkSession — the
 * planner must work in an editor/CI context with no cluster.
 */
class PlannerSpec extends AnyFunSuite {

  private val goodYaml =
    """name: demo
      |nodes:
      |  - name: bronze
      |    read: { format: parquet, path: /data/in }
      |    steps:
      |      - sql: SELECT * FROM df
      |    write: { format: parquet, mode: overwrite, path: /data/out }
      |  - name: silver
      |    depends_on: [bronze]
      |    steps:
      |      - operation: drop_duplicates
      |    tests:
      |      - { name: nn, kind: not_null, columns: [id] }
      |  - name: dates
      |    transformer: date_dimension
      |    params: { start_date: "2024-01-01", end_date: "2024-01-31" }
      |""".stripMargin

  test("valid project yields a plan with kinds, edges and layers") {
    val r = Planner.plan(goodYaml)
    assert(r.valid, r.diagnostics.mkString("; "))
    assert(r.errors.isEmpty)
    val p = r.plan.get
    assert(p.pipeline == "demo")
    assert(p.nodes.map(n => n.name -> n.kind).toMap ==
      Map("bronze" -> "source", "silver" -> "transform", "dates" -> "generator"))
    assert(p.edges == Seq("bronze" -> "silver"))
    assert(p.layers.head.toSet == Set("bronze", "dates"))
    assert(p.layers(1) == Seq("silver"))
    assert(p.nodes.find(_.name == "silver").get.nTests == 1)
    val json = r.toJson
    assert(json.contains("\"valid\": true"))
    assert(json.contains("\"kind\": \"generator\""))
  }

  test("all structural problems are collected, not first-error") {
    val bad =
      """name: broken
        |nodes:
        |  - name: a
        |    read: { format: parquet, path: /x }
        |    bogus_key: 1
        |  - name: a
        |    depends_on: [ghost]
        |    steps:
        |      - function: no_such_fn
        |      - { sql: "SELECT 1", operation: drop }
        |  - name: c
        |    depends_on: [d]
        |  - name: d
        |    depends_on: [c]
        |""".stripMargin
    val r = Planner.plan(bad)
    assert(!r.valid)
    val codes = r.errors.map(_.code).toSet
    assert(codes.contains("unknown_key"))
    assert(codes.contains("duplicate_node"))
    assert(codes.contains("unknown_dependency"))
    assert(codes.contains("unknown_transformer"))
    assert(codes.contains("bad_step"))
    assert(codes.contains("dependency_cycle"))
    assert(r.plan.isEmpty)
  }

  test("unknown transformer, operation, test kind, write mode, trigger") {
    val bad =
      """name: p
        |nodes:
        |  - name: n
        |    read: { format: parquet, path: /x }
        |    transformer: not_a_pattern
        |    steps:
        |      - operation: not_an_op
        |    tests:
        |      - { name: t, kind: not_a_kind }
        |      - { name: t2, kind: range, severity: explode }
        |    write: { mode: sideways, path: /y }
        |""".stripMargin
    val codes = Planner.plan(bad).errors.map(_.code)
    assert(codes.contains("unknown_transformer"))
    assert(codes.contains("unknown_operation"))
    assert(codes.contains("unknown_test_kind"))
    assert(codes.contains("test_invalid")) // bad severity
    assert(codes.contains("unknown_write_mode"))
  }

  test("semantic validation: missing model, unknown metric/dimension") {
    val noModel =
      """name: p
        |nodes:
        |  - name: m
        |    semantic: "revenue BY month"
        |""".stripMargin
    assert(Planner.plan(noModel).errors.map(_.code).contains("semantic_without_model"))

    val badRefs =
      """name: p
        |semantics:
        |  metrics:
        |    - { name: revenue, expr: "sum(amount)", source: fact }
        |  dimensions:
        |    - { name: month, column: order_date, time_grain: month }
        |nodes:
        |  - name: m
        |    semantic: "revenue, ghost_metric BY month, ghost_dim"
        |""".stripMargin
    val codes = Planner.plan(badRefs).errors.map(_.code)
    assert(codes.contains("unknown_metric"))
    assert(codes.contains("unknown_dimension"))

    val ok =
      """name: p
        |semantics:
        |  metrics:
        |    - { name: revenue, expr: "sum(amount)", source: fact }
        |  dimensions:
        |    - { name: month, column: order_date, time_grain: month }
        |nodes:
        |  - name: m
        |    semantic: "revenue BY month"
        |""".stripMargin
    val r = Planner.plan(ok)
    assert(r.valid, r.diagnostics.mkString("; "))
    assert(r.plan.get.nodes.head.kind == "semantic")
  }

  test("streaming requires checkpoint and write path; missing sql_file caught") {
    val bad =
      """name: p
        |nodes:
        |  - name: s
        |    read: { format: parquet, path: /x, streaming: true }
        |    streaming: { output_mode: append, trigger: { kind: warp_speed } }
        |    write: { path: /y }
        |  - name: f
        |    read: { format: parquet, path: /x }
        |    steps:
        |      - sql_file: /no/such/file.sql
        |""".stripMargin
    val codes = Planner.plan(bad).errors.map(_.code)
    assert(codes.contains("missing_checkpoint"))
    assert(codes.contains("unknown_trigger"))
    assert(codes.contains("missing_sql_file"))
  }

  test("external input is a warning, not an error") {
    val y =
      """name: p
        |nodes:
        |  - name: n
        |    input: provided_outside
        |    steps: [ { sql: "SELECT * FROM df" } ]
        |""".stripMargin
    val r = Planner.plan(y)
    assert(r.valid)
    assert(r.diagnostics.exists(d =>
      d.code == "external_input" && d.severity == "warning"))
  }

  test("bounded input: oversized yaml and deep nesting are rejected safely") {
    val r = Planner.plan("x: 1\n", limits = Planner.Limits(maxBytes = 2))
    assert(r.errors.map(_.code).contains("input_too_large"))

    val deep = (1 to 64).map(i => "  " * i + s"k$i:").mkString("a:\n", "\n", " 1")
    val r2 = Planner.plan(deep, limits = Planner.Limits(maxDepth = 16))
    assert(!r2.valid)
    assert(r2.errors.map(_.code).contains("yaml_invalid"))
  }

  test("planner acceptance implies runtime-loader acceptance") {
    val r = Planner.plan(goodYaml)
    assert(r.valid)
    // the same text must load through the runtime path without throwing
    val cfg = graft.core.YamlConfig.loadPipeline(goodYaml)
    assert(cfg.nodes.size == r.plan.get.nodes.size)
  }
}
