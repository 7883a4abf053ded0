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
}
