package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.{Pipeline, YamlConfig}
import graft.semantics.Semantics
import graft.sources.Sources

class CompletenessSpec extends SparkSpec {
  import spark.implicits._

  test("harmonizeSchema aligns, casts, fills missing, enforces policies") {
    val df = Seq((1, "a", 9.9)).toDF("id", "name", "extra_col")
    val target = StructType.fromDDL("id BIGINT, name STRING, added_at TIMESTAMP")
    val out = Sources.harmonizeSchema(df, target)
    assert(out.schema.map(f => f.name -> f.dataType) ==
      target.map(f => f.name -> f.dataType))
    val row = out.collect()(0)
    assert(row.getLong(0) == 1L && row.isNullAt(2))
    intercept[IllegalArgumentException] {
      Sources.harmonizeSchema(df, target, onNewColumns = "error")
    }
    intercept[IllegalArgumentException] {
      Sources.harmonizeSchema(df, target, onMissingColumns = "error")
    }
  }

  test("registerTable exposes a path as a catalog table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reg").toString
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$dir/t")
    Sources.registerTable(spark, "graft_reg_test", s"$dir/t")
    assert(spark.sql("SELECT count(*) FROM graft_reg_test").collect()(0).getLong(0) == 1)
    spark.sql("DROP TABLE graft_reg_test")
  }

  test("semantic materializer: full + incremental with additive combine") {
    import Semantics._
    val out = java.nio.file.Files.createTempDirectory("graft_mat").toString + "/metrics"
    val model = SemanticModel(
      Map("revenue" -> Metric("revenue", "sum(amount)", "sales"),
        "n" -> Metric("n", "count(*)", "sales")),
      Map("day" -> Dimension("day", "d")))

    val day1 = Seq(("2026-01-01", 10.0), ("2026-01-01", 5.0)).toDF("d", "amount")
    val m1 = materialize(spark, model, "revenue, n BY day", Map("sales" -> day1), out)
    assert(m1.collect()(0).getDouble(1) == 15.0)

    // incremental: new rows for the same day plus a new day; revenue adds,
    // n replaces (demonstrating both strategies)
    val day2 = Seq(("2026-01-01", 100.0), ("2026-01-02", 7.0)).toDF("d", "amount")
    val m2 = materializeIncremental(spark, model, "revenue, n BY day",
      Map("sales" -> day2), out, grain = Seq("day"),
      strategies = Map("revenue" -> "sum", "n" -> "replace"))
    val byDay = m2.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byDay("2026-01-01") == (115.0, 1L)) // 15 + 100; n replaced by fresh
    assert(byDay("2026-01-02") == (7.0, 1L))

    // durability: the swap leaves no temp/old residue next to the table
    val parent = new java.io.File(out).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_graft_tmp")))
    assert(!parent.listFiles().exists(_.getName.contains("_graft_old")))

    // a failing merge (schema drift in the fresh side) must PROPAGATE and
    // leave the existing table intact — not silently restart history
    val drifted = SemanticModel(
      Map("revenue" -> Metric("revenue", "sum(amount)", "sales")),
      Map("other" -> Dimension("other", "d")))
    intercept[Exception] {
      materializeIncremental(spark, drifted, "revenue BY other",
        Map("sales" -> day2), out, grain = Seq("day"),
        strategies = Map("revenue" -> "sum"))
    }
    val survived = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(survived("2026-01-01") == 115.0 && survived("2026-01-02") == 7.0)
  }

  test("parallel layer execution produces the same results as serial") {
    val yaml =
      """
        |name: par
        |parallel: true
        |max_workers: 4
        |spark_config: { "spark.sql.shuffle.partitions": "4" }
        |nodes:
        |  - name: a
        |    read: { format: parquet, path: /root/testdata/sf0.001/region.parquet }
        |  - name: b
        |    read: { format: parquet, path: /root/testdata/sf0.001/nation.parquet }
        |  - name: c
        |    read: { format: parquet, path: /root/testdata/sf0.001/customer.parquet }
        |  - name: joined
        |    depends_on: [a, b, c]
        |    input: c
        |    steps:
        |      - sql: "SELECT c.c_custkey, n.n_name, r.r_name FROM df c JOIN b n ON c.c_nationkey = n.n_nationkey JOIN a r ON n.n_regionkey = r.r_regionkey"
        |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    assert(cfg.parallel && cfg.sparkConf("spark.sql.shuffle.partitions") == "4")
    val par = Pipeline.run(spark, cfg)
    assert(par.values.forall(_.failure.isEmpty),
      par.values.flatMap(_.failure).map(_.getMessage).mkString("; "))
    val ser = Pipeline.run(spark, cfg.copy(parallel = false))
    assert(par("joined").df.count() == ser("joined").df.count())
    assert(par("joined").df.count() == 150) // sf0.001 customer rows
  }

  test("introspection inventory matches the registries; docs generate") {
    import graft.core.{Introspect, TransformerRegistry}
    val inv = Introspect.inventory()
    assert(inv("transformers").size >= 60)
    assert(inv("transformers") == TransformerRegistry.names)
    assert(inv("patterns").contains("dimension") && inv("patterns").contains("fact"))
    assert(inv("recipes").contains("validated_load"))
    val md = Introspect.operatorReference()
    // every registered name is documented — the doc cannot drift
    (inv("transformers") ++ inv("patterns") ++ inv("recipes")).foreach(n =>
      assert(md.contains(s"`$n`"), s"$n missing from generated reference"))
    val out = java.nio.file.Files.createTempDirectory("docs").toString + "/operators.md"
    Introspect.writeOperatorReference(out)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(out)) > 2000)
  }

  test("yaml schema doc renders every strict key set") {
    val md = graft.core.Introspect.yamlSchema()
    // the doc derives from the loader's own key sets — spot-check blocks
    Seq("read block", "write block", "incremental block", "contracts block",
      "streaming block", "`connection`", "`checkpoint`", "`schema_mode`",
      "not_null", "volume_drop", "`recipe_vars`").foreach(k =>
      assert(md.contains(k), s"missing $k"))
  }
}
