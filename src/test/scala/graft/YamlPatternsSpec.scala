package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.{Pipeline, YamlConfig}
import graft.sources.Sources

/**
 * Declarative warehouse patterns from pure YAML — the reference's headline
 * use case (examples/star_schema_e2e/config.yaml): dim_date, SCD1 + SCD2
 * dimensions, fact with SK lookups/orphan handling — plus schema contracts
 * and quarantine sink routing in the node lifecycle.
 */
class YamlPatternsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("star schema from pure YAML: dims + fact + gates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_star_yaml").toString
    val yaml =
      s"""
        |name: star_schema_yaml
        |nodes:
        |  - name: dim_date
        |    transformer: date_dimension
        |    params:
        |      start_date: "2024-01-01"
        |      end_date: "2025-01-01"
        |      fiscal_year_start_month: 1
        |    validation:
        |      tests:
        |        - { name: date_sk_unique, kind: unique, columns: [date_sk] }
        |        - { name: rows_367, kind: row_count, min: 367, max: 367 }
        |      gate: { min_pass_rate: 1.0, on_fail: abort }
        |    write: { format: parquet, mode: overwrite, path: $dir/dim_date }
        |  - name: dim_customer
        |    read: { format: parquet, path: $sf/customer.parquet }
        |    steps:
        |      - sql: SELECT c_custkey, c_name, c_mktsegment FROM df
        |    transformer: dimension
        |    params: { natural_key: c_custkey, surrogate_key: customer_sk, scd_type: 1 }
        |    validation:
        |      tests:
        |        - { name: sk_unique, kind: unique, columns: [customer_sk] }
        |      gate: { min_pass_rate: 1.0, on_fail: abort }
        |    write: { format: parquet, mode: overwrite, path: $dir/dim_customer }
        |  - name: dim_product
        |    read: { format: parquet, path: $sf/part.parquet }
        |    steps:
        |      - sql: SELECT p_partkey, p_name, p_retailprice FROM df
        |    transformer: dimension
        |    params:
        |      natural_key: p_partkey
        |      surrogate_key: product_sk
        |      scd_type: 2
        |      track_cols: [p_retailprice]
        |      effective_ts: "timestamp'2026-01-01 00:00:00'"
        |    write: { format: parquet, mode: overwrite, path: $dir/dim_product }
        |  - name: fact_orders
        |    depends_on: [dim_customer, dim_product]
        |    read: { format: parquet, path: $sf/orders.parquet }
        |    transformer: fact
        |    params:
        |      lookups:
        |        - dim: dim_customer
        |          fact_keys: [o_custkey]
        |          dim_keys: [c_custkey]
        |          surrogate_key: customer_sk
        |      measures: { net_price: "o_totalprice * 0.98" }
        |      orphans: unknown
        |      grain: [o_orderkey]
        |    validation:
        |      tests:
        |        - { name: sk_not_null, kind: not_null, columns: [customer_sk] }
        |      gate: { min_pass_rate: 1.0, on_fail: abort }
        |    write: { format: parquet, mode: overwrite, path: $dir/fact_orders }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))

    val dimDate = spark.read.parquet(s"$dir/dim_date")
    assert(dimDate.count() == 367) // leap 2024 + 2025-01-01

    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val fact = spark.read.parquet(s"$dir/fact_orders")
    assert(fact.count() == orders.count())
    assert(fact.columns.contains("net_price"))
    assert(fact.filter($"customer_sk" === 0).count() == 0) // referentially intact

    // SCD2 second load: 10% of products change price; the node reads its
    // own sink as the existing dimension and versions the changes
    val parts = spark.read.parquet(s"$sf/part.parquet").count()
    val dim1 = spark.read.parquet(s"$dir/dim_product")
    assert(dim1.filter($"is_current" && $"product_sk" =!= 0).count() == parts)
    val sks1 = dim1.filter($"product_sk" =!= 0)
      .select("p_partkey", "product_sk").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap

    val yaml2 =
      s"""
        |name: star_schema_yaml_load2
        |nodes:
        |  - name: dim_product
        |    read: { format: parquet, path: $sf/part.parquet }
        |    steps:
        |      - sql: >
        |          SELECT p_partkey, p_name,
        |                 CASE WHEN p_partkey % 10 = 0 THEN p_retailprice * 1.1
        |                      ELSE p_retailprice END AS p_retailprice
        |          FROM df
        |    transformer: dimension
        |    params:
        |      natural_key: p_partkey
        |      surrogate_key: product_sk
        |      scd_type: 2
        |      track_cols: [p_retailprice]
        |      effective_ts: "timestamp'2026-02-01 00:00:00'"
        |    write: { format: parquet, mode: overwrite, path: $dir/dim_product }
        |""".stripMargin
    val res2 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml2))
    assert(res2.values.forall(_.failure.isEmpty),
      res2.values.flatMap(_.failure).map(_.toString).mkString("; "))

    val dim2 = spark.read.parquet(s"$dir/dim_product")
    val nChanged = spark.read.parquet(s"$sf/part.parquet")
      .filter($"p_partkey" % 10 === 0).count()
    assert(dim2.filter($"product_sk" =!= 0).count() == parts + nChanged)
    assert(dim2.filter($"is_current" && $"product_sk" =!= 0).count() == parts)
    // every version carries a distinct SK; closed versions keep their old SK
    assert(dim2.filter($"product_sk" =!= 0).select("product_sk").distinct().count()
      == parts + nChanged)
    val closed = dim2.filter(!$"is_current").select("p_partkey", "product_sk")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
    assert(closed.nonEmpty && closed.forall { case (k, sk) => sks1(k) == sk })
  }

  test("quarantine sink: invalid rows routed, valid rows reach the sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quar").toString
    val yaml =
      s"""
        |name: quarantine_pipe
        |nodes:
        |  - name: customers
        |    read: { format: parquet, path: $sf/customer.parquet }
        |    steps:
        |      - sql: >
        |          SELECT c_custkey,
        |                 CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_name END AS c_name,
        |                 c_acctbal
        |          FROM df
        |    validation:
        |      tests:
        |        - { name: name_present, kind: not_null, severity: quarantine, columns: [c_name] }
        |        - { name: rows_sane, kind: row_count, min: 1 }
        |      quarantine: { path: $dir/quarantine }
        |    write: { format: parquet, mode: overwrite, path: $dir/customers }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))

    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    val bad = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_custkey" % 50 === 0).count()
    val sink = spark.read.parquet(s"$dir/customers")
    val quar = spark.read.parquet(s"$dir/quarantine")
    assert(bad > 0 && sink.count() == total - bad && quar.count() == bad)
    assert(quar.columns.contains("_rejection_reason") && quar.columns.contains("_rejected_at"))
    assert(quar.filter($"_rejection_reason" === "name_present").count() == bad)
    // quarantined rows never reach the sink
    assert(sink.filter($"c_name".isNull).count() == 0)
    // the node's validation results record the quarantine batch
    assert(res("customers").validation.exists(r =>
      r.test.kind == "quarantine" && r.failedRows == bad))
  }

  test("schema contracts: enforce/evolve x new/missing matrix") {
    val base = Seq((1, "a")).toDF("id", "name")
    val withExtra = Seq((1, "a", 9.9)).toDF("id", "name", "extra")
    val missing = Seq(1).toDF("id")
    val target = StructType.fromDDL("id BIGINT, name STRING")

    def c(mode: String, onNew: String = "ignore", onMissing: String = "fill_null") =
      Sources.ContractConfig(Some("id BIGINT, name STRING"), mode, onNew, onMissing)

    def shape(s: StructType) = s.fields.map(f => f.name -> f.dataType).toSeq
    // enforce: exact match casts; any drift fails
    assert(shape(Sources.applyContract(base, c("enforce")).schema) == shape(target))
    intercept[IllegalArgumentException](Sources.applyContract(withExtra, c("enforce")))
    intercept[IllegalArgumentException](Sources.applyContract(missing, c("enforce")))

    // evolve + new columns: ignore drops, fail throws, add_nullable keeps
    assert(Sources.applyContract(withExtra, c("evolve", onNew = "ignore"))
      .columns.toSeq == Seq("id", "name"))
    intercept[IllegalArgumentException](
      Sources.applyContract(withExtra, c("evolve", onNew = "fail")))
    assert(Sources.applyContract(withExtra, c("evolve", onNew = "add_nullable"))
      .columns.toSeq == Seq("id", "name", "extra"))

    // evolve + missing columns: fill_null types them, fail throws
    val filled = Sources.applyContract(missing, c("evolve"))
    assert(shape(filled.schema) == shape(target) && filled.collect()(0).isNullAt(1))
    intercept[IllegalArgumentException](
      Sources.applyContract(missing, c("evolve", onMissing = "fail")))
  }

  test("contracts in YAML: sink schema is the implicit contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft_contract").toString
    // seed the sink with the contracted shape
    Seq((1L, "x")).toDF("id", "name").write.parquet(s"$dir/t")
    // source has drifted: extra column + changed type; evolve aligns it
    val yaml =
      s"""
        |name: contract_pipe
        |nodes:
        |  - name: t
        |    read: { format: parquet, path: $dir/src }
        |    contracts: { schema_mode: evolve, on_new_columns: ignore }
        |    write: { format: parquet, mode: append, path: $dir/t }
        |""".stripMargin
    Seq((2, "y", true)).toDF("id", "name", "surprise").write.parquet(s"$dir/src")
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))
    val out = spark.read.parquet(s"$dir/t")
    assert(out.count() == 2 && out.columns.toSeq.sorted == Seq("id", "name"))
    assert(out.schema("id").dataType.typeName == "long") // cast to sink type
  }

  test("fact grain gate + sink write scan the fact input once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_grain_scan").toString
    val n = 500
    val acc = spark.sparkContext.longAccumulator("fact_rows")
    val dim = (1 to 20).map(i => (i.toLong, s"c$i")).toDF("custkey", "name")
    val src = spark.range(n).toDF("orderkey")
      .withColumn("o_custkey", col("orderkey") % 20 + 1)
      .withColumn("amount", col("orderkey") * 1.5)
      .filter((r: org.apache.spark.sql.Row) => { acc.add(1); true })
    val yaml =
      s"""
        |name: grain_scan
        |nodes:
        |  - name: dim_c
        |    input: dim
        |    transformer: dimension
        |    params: { natural_key: custkey, surrogate_key: customer_sk, scd_type: 1 }
        |  - name: fact
        |    depends_on: [dim_c]
        |    input: src
        |    transformer: fact
        |    params:
        |      lookups:
        |        - { dim: dim_c, fact_keys: [o_custkey], dim_keys: [custkey], surrogate_key: customer_sk }
        |      measures: { amount: amount }
        |      grain: [orderkey]
        |    write: { format: parquet, mode: overwrite, path: $dir/fact }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml),
      externalDatasets = Map("dim" -> dim, "src" -> src))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))
    // the grain-gate aggregation pins the fact; the sink write reuses the
    // same materialization instead of re-running the lookup join
    assert(acc.value == n, s"fact input scanned ${acc.value} rows, expected $n (one scan)")
    assert(spark.read.parquet(s"$dir/fact").count() == n)
  }
}
