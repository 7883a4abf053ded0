package graft

import org.apache.spark.sql.functions._
import graft.patterns.Patterns
import graft.validation.Validation

/**
 * End-to-end star schema build mirroring the reference's golden example
 * (examples/star_schema_e2e/config.yaml: dim_date exactly 367 rows,
 * dim_customer SCD1, dim_product SCD2, fact_orders with row-count /
 * unique / not-null gates) — on the driver testdata.
 */
class StarSchemaE2ESpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def t(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  test("star schema: dims + fact with gates, end to end") {
    // dim_date: 2024-01-01..2025-01-01 inclusive = 367 rows (leap year + 1)
    val dimDate = Patterns.dateDimension(spark, "2024-01-01", "2025-01-01").cache()
    assert(dimDate.count() == 367)

    // dim_customer: SCD1 dimension with surrogate keys + unknown member
    val dimCustomer = Patterns.dimension(
      t("customer").select("c_custkey", "c_name", "c_mktsegment"),
      Seq("c_custkey"), "customer_sk").cache()
    Validation.enforce(Validation.evaluate(dimCustomer, Seq(
      Validation.Test("sk_unique", "unique", columns = Seq("customer_sk")),
      Validation.Test("name_not_null", "not_null", columns = Seq("c_name")))))

    // dim_product: SCD2 over two snapshots of part (price change on 10%)
    val products = t("part").select("p_partkey", "p_name", "p_retailprice")
    val day1 = graft.operators.Scd.scd2Bootstrap(products, lit("2026-01-01"))
    val changed = products.withColumn("p_retailprice",
      when($"p_partkey" % 10 === 0, $"p_retailprice" * 1.1).otherwise($"p_retailprice"))
    val dimProduct = graft.operators.Scd.scd2Apply(day1, changed,
      Seq("p_partkey"), Seq("p_retailprice"), lit("2026-02-01")).cache()
    val nChanged = products.filter($"p_partkey" % 10 === 0).count()
    assert(dimProduct.count() == products.count() + nChanged)
    assert(dimProduct.filter($"is_current").count() == products.count())

    // fact_orders: resolve customer SK (current rows only for SCD2 dims),
    // orphans -> unknown member 0, grain = o_orderkey
    val fact = Patterns.fact(
      t("orders"),
      Seq(Patterns.DimLookup(dimCustomer, Seq("o_custkey"), Seq("c_custkey"),
        "customer_sk", "customer_sk")),
      measures = Seq("net_price" -> "o_totalprice * 0.98")).cache()

    assert(Patterns.grainViolations(fact, Seq("o_orderkey")).count() == 0)
    Validation.enforce(Validation.evaluate(fact, Seq(
      Validation.Test("grain_unique", "unique", columns = Seq("o_orderkey")),
      Validation.Test("sk_not_null", "not_null", columns = Seq("customer_sk")),
      Validation.Test("rows_sane", "row_count", min = Some(1000)))))

    // every fact row resolved to a real customer (testdata is referentially intact)
    assert(fact.filter($"customer_sk" === 0).count() == 0)
    // FK re-check via the validation subsystem agrees
    assert(Validation.fkOrphans(fact, Seq("customer_sk"),
      dimCustomer, Seq("customer_sk")).count() == 0)

    // quarantine path: inject bad rows, split, verify both sides
    val withBad = fact.unionByName(
      fact.limit(2).withColumn("customer_sk", lit(null).cast("long")))
    val (valid, invalid) = Validation.quarantineSplit(withBad, Seq(
      Validation.Test("sk_present", "not_null", Validation.Quarantine,
        columns = Seq("customer_sk"))))
    assert(invalid.count() == 2 && valid.count() == fact.count())
    assert(invalid.columns.contains("_rejection_reason"))
  }
}
