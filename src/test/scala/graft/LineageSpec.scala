package graft

import org.apache.spark.sql.functions._

import graft.core.Lineage

class LineageSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("projection and derivation lineage trace to scanned columns") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    val m = Lineage.columnLineage(li)
    assert(m("l_orderkey") == Set("lineitem.parquet.l_orderkey"))
    assert(m("net") == Set("lineitem.parquet.l_extendedprice",
      "lineitem.parquet.l_discount"))
  }

  test("aggregate + filter + window lineage") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("total"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("total"))))
    val m = Lineage.columnLineage(li)
    assert(m("l_returnflag") == Set("lineitem.parquet.l_returnflag"))
    assert(m("total") == Set("lineitem.parquet.l_extendedprice"))
    assert(m("rk") == Set("lineitem.parquet.l_extendedprice")) // via total
  }

  test("join lineage keeps both sides; sourceRelations lists them") {
    val o = spark.read.parquet(s"$d/orders.parquet")
    val c = spark.read.parquet(s"$d/customer.parquet")
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"),
        concat(col("c_name"), col("o_orderstatus")).as("tag"))
    val m = Lineage.columnLineage(joined)
    assert(m("o_orderkey") == Set("orders.parquet.o_orderkey"))
    assert(m("c_name") == Set("customer.parquet.c_name"))
    assert(m("tag") == Set("customer.parquet.c_name", "orders.parquet.o_orderstatus"))
    assert(Lineage.sourceRelations(joined) ==
      Set("orders.parquet", "customer.parquet"))
  }

  test("union merges positionally; explode traces to the generator input") {
    val a = spark.read.parquet(s"$d/region.parquet").select(col("r_name").as("n"))
    val b = spark.read.parquet(s"$d/nation.parquet").select(col("n_name").as("n"))
    val m = Lineage.columnLineage(a.union(b))
    assert(m("n") == Set("region.parquet.r_name", "nation.parquet.n_name"))

    val ex = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val me = Lineage.columnLineage(ex)
    assert(me("word") == Set("documents.parquet.text"))
    assert(me("doc_id") == Set("documents.parquet.doc_id"))
  }

  test("operator-built frames carry lineage end to end") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val out = graft.operators.SqlCore.deriveColumns(li,
      Seq("net" -> "l_extendedprice * (1 - l_discount)"))
      .select("l_orderkey", "net")
    val m = Lineage.columnLineage(out)
    assert(m("net") == Set("lineitem.parquet.l_extendedprice",
      "lineitem.parquet.l_discount"))
  }

  test("recorded runs land column lineage in the catalog") {
    import graft.core.{Catalog, Pipeline}
    val root = java.nio.file.Files.createTempDirectory("collineage").toString
    val cat = new Catalog(spark, root)
    val cfg = Pipeline.PipelineConfig("p", Seq(
      Pipeline.NodeConfig("n",
        read = Some(graft.sources.Sources.ReadConfig("parquet",
          Some(s"$d/region.parquet"))),
        steps = Seq(Pipeline.TransformStep(
          sql = Some("SELECT r_regionkey, upper(r_name) AS name_u FROM df"))))))
    Catalog.runRecorded(spark, cfg, cat, "run-l")
    val rows = cat.table("meta_column_lineage")
      .filter(col("node") === "n").collect()
      .map(r => r.getAs[String]("column") -> r.getAs[String]("source")).toSet
    assert(rows.contains("name_u" -> "region.parquet.r_name"))
    assert(rows.contains("r_regionkey" -> "region.parquet.r_regionkey"))
  }
}
