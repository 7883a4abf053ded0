package graft

import org.apache.spark.sql.functions._
import graft.core.{DependencyGraph, EngineContext, Pipeline, Transformer, TransformerRegistry, YamlConfig}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("graph: topo sort, layers, cycle detection, pruning") {
    val g = DependencyGraph(Map(
      "c" -> Seq("a", "b"), "b" -> Seq("a"), "a" -> Nil, "d" -> Seq("c")))
    assert(g.topologicalSort() == Seq("a", "b", "c", "d"))
    assert(g.executionLayers() == Seq(Seq("a"), Seq("b"), Seq("c"), Seq("d")))

    val wide = DependencyGraph(Map("a" -> Nil, "b" -> Nil, "c" -> Seq("a", "b")))
    assert(wide.executionLayers() == Seq(Seq("a", "b"), Seq("c")))

    intercept[IllegalStateException] {
      DependencyGraph(Map("a" -> Seq("b"), "b" -> Seq("a"))).topologicalSort()
    }
    assert(g.pruneDisabled(Set("b")) == Set("b", "c", "d"))
    assert(g.withUpstream(Set("c")) == Set("a", "b", "c"))
  }

  test("yaml pipeline runs end-to-end: read, sql step, function step, validate, write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0))
      .toDF("id", "cat", "amount").write.mode("overwrite").parquet(s"$dir/in")

    TransformerRegistry.register(new Transformer {
      def name = "double_amount"
      def apply(ctx: EngineContext, params: Map[String, Any]) =
        ctx.df.withColumn("amount", col("amount") * params.getOrElse("factor", 2).toString.toDouble)
    })

    val yaml =
      s"""
         |name: t
         |nodes:
         |  - name: bronze
         |    read: { format: parquet, path: $dir/in }
         |    steps:
         |      - function: double_amount
         |        params: { factor: 2 }
         |    tests:
         |      - { name: id_unique, kind: unique, columns: [id] }
         |      - { name: amount_pos, kind: custom_sql, sql: "amount > 0" }
         |    write: { format: parquet, mode: overwrite, path: $dir/bronze }
         |  - name: agg
         |    depends_on: [bronze]
         |    steps:
         |      - sql: "SELECT cat, sum(amount) AS total FROM df GROUP BY cat"
         |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    assert(results.values.forall(_.failure.isEmpty),
      results.values.flatMap(_.failure).map(_.getMessage).mkString("; "))
    val agg = results("agg").df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agg == Map("a" -> 80.0, "b" -> 40.0))
    // write landed
    assert(spark.read.parquet(s"$dir/bronze").count() == 3)
  }

  test("node lifecycle: pre_sql, all four step kinds, post_sql") {
    val dir = java.nio.file.Files.createTempDirectory("graft_life").toString
    Seq((1, "a", 10.0), (1, "a", 10.0), (2, "b", 20.0))
      .toDF("id", "cat", "amount").write.mode("overwrite").parquet(s"$dir/in")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/step.sql"),
      "SELECT id, cat, amount * 10 AS amount FROM df".getBytes)

    TransformerRegistry.register(new Transformer {
      def name = "add_flag"
      def apply(ctx: EngineContext, params: Map[String, Any]) =
        ctx.df.withColumn("flag", lit(params.getOrElse("v", "x").toString))
    })

    val yaml =
      s"""
         |name: life
         |nodes:
         |  - name: n1
         |    read: { format: parquet, path: $dir/in }
         |    pre_sql:
         |      - "CREATE TABLE IF NOT EXISTS graft_presql_probe (k INT) USING parquet LOCATION '$dir/probe'"
         |    steps:
         |      - operation: drop_duplicates
         |      - sql_file: step.sql
         |      - sql: "SELECT * FROM df WHERE amount > 0"
         |      - function: add_flag
         |        params: { v: ok }
         |    write: { format: parquet, mode: overwrite, path: $dir/out }
         |    post_sql:
         |      - "DROP TABLE IF EXISTS graft_presql_probe"
         |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml, baseDir = Some(dir))
    val results = Pipeline.run(spark, cfg)
    assert(results("n1").failure.isEmpty,
      results("n1").failure.map(_.toString).getOrElse(""))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 2) // drop_duplicates collapsed the dup
    assert(out.filter($"amount" === 100.0 && $"flag" === "ok").count() == 1)
    // post_sql dropped the pre_sql table
    assert(!spark.catalog.tableExists("graft_presql_probe"))
  }

  test("operation steps: pivot, fillna, rename, sort, drop") {
    val df = Seq((1, "a", Some(10.0)), (2, "b", None), (3, "a", Some(30.0)))
      .toDF("id", "cat", "v")
    def op(d: org.apache.spark.sql.DataFrame, o: String, p: Map[String, Any]) =
      Pipeline.executeOperation(o, p, EngineContext(d))
    val filled = op(df, "fillna", Map("value" -> 0.0, "subset" -> Seq("v")))
    assert(filled.filter($"v" === 0.0).count() == 1)
    val renamed = op(df, "rename", Map("columns" -> Map("v" -> "value")))
    assert(renamed.columns.contains("value"))
    val sorted = op(df, "sort", Map("by" -> "id", "ascending" -> false))
    assert(sorted.head().getInt(0) == 3)
    val dropped = op(df, "drop", Map("columns" -> "cat"))
    assert(!dropped.columns.contains("cat"))
    val piv = op(filled, "pivot", Map("group_by" -> "id", "pivot_column" -> "cat",
      "value_column" -> "v", "agg_func" -> "sum"))
    assert(piv.columns.toSet == Set("id", "a", "b"))
  }

  test("orchestration: disabled pruning, tag filter, node filter with upstream deps") {
    def node(name: String, deps: Seq[String] = Nil, tags: Seq[String] = Nil,
             enabled: Boolean = true) =
      Pipeline.NodeConfig(name, dependsOn = deps, tags = tags, enabled = enabled,
        read = if (deps.isEmpty) Some(graft.sources.Sources.ReadConfig("parquet",
          Some("/root/testdata/sf0.001/region.parquet"))) else None,
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT * FROM df"))))

    // disabled node prunes its transitive dependents
    val cfg1 = Pipeline.PipelineConfig("t", Seq(
      node("a"), node("b", Seq("a"), enabled = false), node("c", Seq("b"))))
    val r1 = Pipeline.run(spark, cfg1)
    assert(r1("a").failure.isEmpty && !r1("a").skipped)
    assert(r1("b").skipped && r1("b").skipReason.contains("disabled"))
    assert(r1("c").skipped && r1("c").skipReason.contains("dependency_disabled"))

    // tag filter keeps only matching nodes
    val cfg2 = Pipeline.PipelineConfig("t", Seq(
      node("a", tags = Seq("gold")), node("z", tags = Seq("bronze"))))
    val r2 = Pipeline.run(spark, cfg2, opts = Pipeline.RunOptions(tag = Some("gold")))
    assert(r2.contains("a") && !r2.contains("z"))

    // node filter auto-includes upstream deps
    val cfg3 = Pipeline.PipelineConfig("t", Seq(
      node("a"), node("b", Seq("a")), node("z")))
    val r3 = Pipeline.run(spark, cfg3, opts = Pipeline.RunOptions(nodes = Seq("b")))
    assert(r3.contains("a") && r3.contains("b") && !r3.contains("z"))
    assert(r3("b").failure.isEmpty)
  }

  test("declarative incremental HWM: filter on read, state advanced after write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    def seed(rows: Seq[(Int, String)]): Unit =
      rows.toDF("id", "ts_s").withColumn("ts", $"ts_s".cast("timestamp"))
        .drop("ts_s").write.mode("overwrite").parquet(s"$dir/src")

    seed(Seq((1, "2026-01-01 00:00:00"), (2, "2026-01-02 00:00:00")))
    val state = new graft.operators.Incremental.JsonFileState(s"$dir/state.json")
    val node = Pipeline.NodeConfig("inc",
      read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/src"))),
      incremental = Some(Pipeline.IncrementalConfig(column = "ts")),
      writePath = Some(s"$dir/out"),
      write = graft.sources.Sources.WriteConfig(mode = "append"))
    val cfg = Pipeline.PipelineConfig("p", Seq(node))
    val opts = Pipeline.RunOptions(state = Some(state))

    // first run: smart first run = full load, HWM recorded
    val r1 = Pipeline.run(spark, cfg, opts = opts)
    assert(r1("inc").rowsWritten.contains(2L))
    assert(state.get("p/hwm/inc").exists(_.startsWith("2026-01-02")))

    // second run over a grown source: only rows past the HWM are processed
    seed(Seq((1, "2026-01-01 00:00:00"), (2, "2026-01-02 00:00:00"),
      (3, "2026-01-05 00:00:00")))
    val r2 = Pipeline.run(spark, cfg, opts = opts)
    assert(r2("inc").rowsWritten.contains(1L)) // just id=3
    assert(state.get("p/hwm/inc").exists(_.startsWith("2026-01-05")))
    assert(spark.read.parquet(s"$dir/out").count() == 3) // appended once each

    // third run, nothing new: zero rows, HWM unchanged
    val r3 = Pipeline.run(spark, cfg, opts = opts)
    assert(r3("inc").rowsWritten.contains(0L))
    assert(state.get("p/hwm/inc").exists(_.startsWith("2026-01-05")))
  }

  test("resume-from-failure restores unchanged succeeded nodes from their sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_resume").toString
    Seq((1, 10.0), (2, 20.0)).toDF("id", "v").write.mode("overwrite").parquet(s"$dir/in")
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    TransformerRegistry.register(new Transformer {
      def name = "count_runs_resume"
      def apply(ctx: EngineContext, params: Map[String, Any]) = {
        attempts.incrementAndGet(); ctx.df
      }
    })
    val good = Pipeline.NodeConfig("good",
      read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in"))),
      steps = Seq(Pipeline.TransformStep(function = Some("count_runs_resume"))),
      writePath = Some(s"$dir/good_out"))
    val bad = Pipeline.NodeConfig("bad",
      read = Some(graft.sources.Sources.ReadConfig("parquet", Some(s"$dir/in"))),
      steps = Seq(Pipeline.TransformStep(sql = Some("SELECT missing_col FROM df"))))
    val state = new graft.operators.Incremental.JsonFileState(s"$dir/state.json")
    val opts = Pipeline.RunOptions(resumeFromFailure = true, state = Some(state))

    val r1 = Pipeline.run(spark, Pipeline.PipelineConfig("p", Seq(good, bad)), opts = opts)
    assert(r1("good").failure.isEmpty && r1("bad").failure.isDefined)
    assert(attempts.get() == 1)

    // second run: good restores from sink (no re-execution), bad re-runs
    val r2 = Pipeline.run(spark, Pipeline.PipelineConfig("p", Seq(good, bad)), opts = opts)
    assert(r2("good").skipped && r2("good").skipReason.contains("resume_from_failure"))
    assert(attempts.get() == 1) // transformer not invoked again
    assert(r2("good").df.count() == 2) // restored data readable
    assert(r2("bad").failure.isDefined)

    // changed config invalidates the resume hash -> re-runs
    val goodChanged = good.copy(steps = good.steps :+
      Pipeline.TransformStep(sql = Some("SELECT * FROM df")))
    val r3 = Pipeline.run(spark, Pipeline.PipelineConfig("p", Seq(goodChanged)), opts = opts)
    assert(!r3("good").skipped && attempts.get() == 2)
  }

  test("node retries run exactly retries+1 attempts, no extra side effects") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    TransformerRegistry.register(new Transformer {
      def name = "always_fails_counting"
      def apply(ctx: EngineContext, params: Map[String, Any]) = {
        attempts.incrementAndGet(); throw new RuntimeException("boom")
      }
    })
    val cfg = Pipeline.PipelineConfig("t", Seq(
      Pipeline.NodeConfig("bad", retries = 2,
        read = Some(graft.sources.Sources.ReadConfig("parquet",
          Some("/root/testdata/sf0.001/region.parquet"))),
        steps = Seq(Pipeline.TransformStep(function = Some("always_fails_counting"))))))
    val results = Pipeline.run(spark, cfg)
    assert(results("bad").failure.isDefined)
    assert(attempts.get() == 3) // retries=2 -> exactly 3 attempts
  }

  test("pipeline halts dependents on upstream failure") {
    val cfg = Pipeline.PipelineConfig("t", Seq(
      Pipeline.NodeConfig("bad",
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT * FROM nonexistent_xyz"))),
        read = Some(graft.sources.Sources.ReadConfig("parquet",
          Some("/root/testdata/sf0.001/region.parquet")))),
      Pipeline.NodeConfig("child", dependsOn = Seq("bad"),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT * FROM df"))))))
    val results = Pipeline.run(spark, cfg)
    assert(results("bad").failure.isDefined)
    assert(results("child").failure.isDefined)
  }

  test("sql step sees sibling datasets by node name") {
    val cfg = Pipeline.PipelineConfig("t", Seq(
      Pipeline.NodeConfig("r", read = Some(graft.sources.Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet")))),
      Pipeline.NodeConfig("n", read = Some(graft.sources.Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/nation.parquet")))),
      Pipeline.NodeConfig("joined", dependsOn = Seq("r", "n"), input = Some("n"),
        steps = Seq(Pipeline.TransformStep(sql = Some(
          "SELECT n.n_name, r.r_name FROM df n JOIN r ON n.n_regionkey = r.r_regionkey"))))))
    val results = Pipeline.run(spark, cfg)
    assert(results.values.forall(_.failure.isEmpty))
    assert(results("joined").df.count() == 25)
  }

  test("alerts fire on node failure and gate abort") {
    val events = scala.collection.mutable.ListBuffer.empty[Pipeline.AlertEvent]
    val cfg = Pipeline.PipelineConfig("alerting", Seq(
      Pipeline.NodeConfig("crash",
        input = Some("src"),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT no_such_col FROM df")))),
      Pipeline.NodeConfig("gated",
        input = Some("src"),
        tests = Seq(graft.validation.Validation.Test("impossible", "row_count",
          min = Some(1e9))),
        gateMinPassRate = Some(1.0))))
    val src = spark.range(10).toDF("id")
    val res = Pipeline.run(spark, cfg, Map("src" -> src),
      Pipeline.RunOptions(onAlert = events += _))
    assert(res("crash").failure.isDefined && res("gated").failure.isDefined)
    val byNode = events.map(e => e.node -> e.event).toMap
    assert(byNode == Map("crash" -> "node_failure", "gated" -> "gate_abort",
      "_pipeline" -> "run_failure"))
    assert(events.head.event == "run_start")
    assert(events.forall(_.pipeline == "alerting"))
    assert(events.find(_.node == "gated").exists(_.message.contains("impossible")))
    assert(events.last.message == "failed: crash, gated")

    // clean run: start + success, no node events
    val ok = scala.collection.mutable.ListBuffer.empty[Pipeline.AlertEvent]
    Pipeline.run(spark,
      Pipeline.PipelineConfig("fine", Seq(Pipeline.NodeConfig("n", input = Some("src")))),
      Map("src" -> src), Pipeline.RunOptions(onAlert = ok += _))
    assert(ok.map(_.event).toSeq == Seq("run_start", "run_success"))
  }

  test("tested + quarantined + written node executes its upstream plan once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_onescan").toString
    val n = 1000
    val acc = spark.sparkContext.longAccumulator("upstream_rows")
    // the accumulator rides inside the plan: every execution of the
    // upstream scan increments it once per row
    val src = spark.range(n).toDF("id")
      .withColumn("v", col("id") % 10)
      .filter((r: org.apache.spark.sql.Row) => { acc.add(1); true })

    val cfg = Pipeline.NodeConfig("lifecycle",
      input = Some("src"),
      tests = Seq(
        graft.validation.Validation.Test("v_small", "custom_sql",
          graft.validation.Validation.Quarantine, sql = Some("v < 9")),
        graft.validation.Validation.Test("id_nn", "not_null",
          columns = Seq("id")),
        graft.validation.Validation.Test("v_range", "range",
          columns = Seq("v"), min = Some(0), max = Some(10))),
      writePath = Some(s"$dir/out"))

    val (_, rows, validation, _) =
      Pipeline.runNodeWithStats(spark, cfg, Map("src" -> src))
    // quarantine-split count + row-level test aggregate + sink write all
    // read the single persisted materialization — not three upstream scans
    assert(acc.value == n, s"upstream scanned ${acc.value} rows, expected $n (one scan)")
    assert(rows.contains(900L)) // v==9 rows quarantined
    assert(validation.exists(r => r.test.name == "lifecycle_quarantine" && r.failedRows == 100))
    assert(spark.read.parquet(s"$dir/out").count() == 900)
  }
}
