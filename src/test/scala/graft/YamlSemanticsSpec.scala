package graft

import org.apache.spark.sql.functions._

import graft.core.{Catalog, Pipeline, YamlConfig}

/**
 * Declarative semantic layer e2e (reference: config-driven metric
 * definitions odibi/semantics/metrics.py:17-265, catalog-resolved
 * `$pipeline.node` sources odibi/semantics/query.py:294-369): metrics and
 * dimensions declared in project YAML, a metric materialization as a
 * pipeline node, and cross-pipeline source resolution through the system
 * catalog.
 */
class YamlSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf = Seq(
    ("2024-01-05", "F", 10.0, 2.0), ("2024-01-20", "F", 20.0, 5.0),
    ("2024-02-03", "F", 40.0, 10.0), ("2024-02-28", "O", 100.0, 50.0),
    ("2024-02-29", "F", 30.0, 6.0))
    .toDF("order_date", "status", "amount", "cost")
    .withColumn("order_date", to_timestamp($"order_date"))

  test("semantic node from YAML: $pipeline.node resolved from the current run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_yaml").toString
    ordersDf.write.mode("overwrite").parquet(s"$dir/orders")
    val yaml =
      s"""
        |name: sales
        |semantics:
        |  metrics:
        |    - { name: revenue, expr: "sum(amount)", source: "$$sales.fact_orders",
        |        filters: ["status = 'F'"] }
        |    - { name: total_cost, expr: "sum(cost)", source: "$$sales.fact_orders",
        |        filters: ["status = 'F'"] }
        |    - { name: margin, formula: "(revenue - total_cost) / NULLIF(revenue, 0)" }
        |  dimensions:
        |    - { name: month, column: order_date, time_grain: month }
        |nodes:
        |  - name: fact_orders
        |    read: { format: parquet, path: $dir/orders }
        |    write: { format: parquet, mode: overwrite, path: $dir/fact }
        |  - name: monthly_margin
        |    depends_on: [fact_orders]
        |    semantic: { query: "revenue, margin BY month" }
        |    write: { format: parquet, mode: overwrite, path: $dir/monthly }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))

    val out = spark.read.parquet(s"$dir/monthly")
      .orderBy("month").collect()
    assert(out.length == 2)
    // Jan (F): revenue 30, cost 7 -> margin (30-7)/30; Feb (F): 70, 16
    assert(out(0).getAs[Double]("revenue") == 30.0)
    assert(math.abs(out(0).getAs[Double]("margin") - 23.0 / 30.0) < 1e-12)
    assert(out(1).getAs[Double]("revenue") == 70.0)
    assert(math.abs(out(1).getAs[Double]("margin") - 54.0 / 70.0) < 1e-12)
  }

  test("cross-pipeline $pipeline.node resolves through the system catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_cat").toString
    ordersDf.write.mode("overwrite").parquet(s"$dir/orders")
    val catalog = new Catalog(spark, s"$dir/_system")

    // pipeline A materializes the fact and records its sink in the catalog
    val warehouseYaml =
      s"""
        |name: warehouse_a
        |nodes:
        |  - name: fact_orders
        |    read: { format: parquet, path: $dir/orders }
        |    write: { format: parquet, mode: overwrite, path: $dir/fact_a }
        |""".stripMargin
    val resA = Catalog.runRecorded(spark, YamlConfig.loadPipeline(warehouseYaml),
      catalog, runId = "run1")
    assert(resA.values.forall(_.failure.isEmpty))
    assert(catalog.latestOutputPath("warehouse_a", "fact_orders")
      .contains(s"$dir/fact_a"))

    // pipeline B (separate run, no shared datasets) queries it by ref
    val metricsYaml =
      s"""
        |name: metrics_b
        |catalog_root: $dir/_system
        |semantics:
        |  metrics:
        |    - { name: order_count, expr: "count(*)", source: "$$warehouse_a.fact_orders" }
        |  dimensions:
        |    - { name: status, column: status }
        |nodes:
        |  - name: counts_by_status
        |    semantic: { query: "order_count BY status" }
        |    write: { format: parquet, mode: overwrite, path: $dir/counts }
        |""".stripMargin
    val resB = Pipeline.run(spark, YamlConfig.loadPipeline(metricsYaml))
    assert(resB.values.forall(_.failure.isEmpty),
      resB.values.flatMap(_.failure).map(_.toString).mkString("; "))
    val counts = spark.read.parquet(s"$dir/counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("F" -> 4L, "O" -> 1L))
  }

  test("incremental semantic node merges fresh partials into the metric table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_inc").toString
    def yamlFor(watermark: String) =
      s"""
        |name: sales_inc
        |semantics:
        |  metrics:
        |    - { name: revenue, expr: "sum(amount)", source: "$$sales_inc.fact_orders" }
        |  dimensions:
        |    - { name: month, column: order_date, time_grain: month }
        |nodes:
        |  - name: fact_orders
        |    read: { format: parquet, path: $dir/orders }
        |  - name: monthly_revenue
        |    depends_on: [fact_orders]
        |    semantic:
        |      query: "revenue BY month"
        |      incremental:
        |        grain: [month]
        |        strategies: { revenue: sum }
        |        filter: "ingested_at >= timestamp'$watermark'"
        |    write: { format: parquet, mode: overwrite, path: $dir/monthly }
        |""".stripMargin
    def row(d: String, amount: Double, ingested: String) =
      (java.sql.Timestamp.valueOf(s"$d 00:00:00"), amount,
        java.sql.Timestamp.valueOf(ingested))

    // run 1: January + February facts
    Seq(row("2024-01-05", 10.0, "2024-03-01 00:00:00"),
      row("2024-02-03", 40.0, "2024-03-01 00:00:00"))
      .toDF("order_date", "amount", "ingested_at")
      .write.mode("overwrite").parquet(s"$dir/orders")
    val r1 = Pipeline.run(spark, YamlConfig.loadPipeline(yamlFor("2024-01-01 00:00:00")))
    assert(r1.values.forall(_.failure.isEmpty),
      r1.values.flatMap(_.failure).map(_.toString).mkString("; "))
    def monthly() = spark.read.parquet(s"$dir/monthly").collect()
      .map(r => r.get(0).toString.take(7) -> r.getDouble(1)).toMap
    assert(monthly() == Map("2024-01" -> 10.0, "2024-02" -> 40.0))

    // run 2: a late-arriving February fact plus March, newer watermark —
    // only the delta re-aggregates; February SUM-merges, January persists
    // untouched from the existing table
    Seq(row("2024-01-05", 10.0, "2024-03-01 00:00:00"),
      row("2024-02-03", 40.0, "2024-03-01 00:00:00"),
      row("2024-02-25", 5.0, "2024-04-01 00:00:00"),
      row("2024-03-10", 70.0, "2024-04-01 00:00:00"))
      .toDF("order_date", "amount", "ingested_at")
      .write.mode("overwrite").parquet(s"$dir/orders")
    val r2 = Pipeline.run(spark, YamlConfig.loadPipeline(yamlFor("2024-03-15 00:00:00")))
    assert(r2.values.forall(_.failure.isEmpty),
      r2.values.flatMap(_.failure).map(_.toString).mkString("; "))
    assert(monthly() == Map(
      "2024-01" -> 10.0, "2024-02" -> 45.0, "2024-03" -> 70.0))
  }

  test("unresolvable ref and missing semantics block fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_err").toString
    val badRef =
      s"""
        |name: p
        |semantics:
        |  metrics:
        |    - { name: n, expr: "count(*)", source: "$$ghost.node" }
        |nodes:
        |  - name: m
        |    semantic: { query: "n" }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(badRef))
    val err = res("m").failure
    assert(err.exists(_.getMessage.contains("cannot resolve")))

    intercept[IllegalArgumentException] {
      YamlConfig.loadPipeline(
        "name: p\nnodes:\n  - name: m\n    semantic: { query: \"n\" }\n")
    }
  }

  test("strict config: unknown keys in semantics/semantic/alert blocks rejected") {
    def load(y: String) = YamlConfig.loadPipeline(y)
    val base =
      """name: p
        |semantics:
        |  metrics:
        |    - { name: n, expr: "count(*)", source: t }
        |""".stripMargin
    // typo in a metric definition
    intercept[IllegalArgumentException](load(
      "name: p\nsemantics:\n  metrics:\n    - { name: n, expresion: \"count(*)\", source: t }\n"))
    // typo in the node's semantic block
    intercept[IllegalArgumentException](load(
      base + "nodes:\n  - name: m\n    semantic: { query: n, incremental_: {} }\n"))
    // typo inside semantic.incremental
    intercept[IllegalArgumentException](load(
      base + "nodes:\n  - name: m\n    semantic:\n      query: n\n      incremental: { grains: [x] }\n"))
    // typo in an alert config
    intercept[IllegalArgumentException](load(
      "name: p\nalerts:\n  - { channel: console, on_event: [on_failure] }\nnodes: []\n"))
    // well-formed versions load
    load(base + "nodes:\n  - name: m\n    semantic: { query: n }\n")
    load("name: p\nalerts:\n  - { channel: console, on_events: [on_failure] }\nnodes: []\n")
  }
}
