package graft

import org.apache.spark.sql.functions._

import graft.core.{Catalog, Discovery, PlanAudit}

class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("audit counts exchanges, joins and codegen; detects pushdown") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val a = PlanAudit.audit(li)
    assert(a.numExchanges == 0 && a.shuffleFree)
    assert(a.pushedFilters.exists(_.contains("GreaterThan")))
    assert(a.readSchemas.exists(s =>
      s.contains("l_orderkey") && !s.contains("l_extendedprice")))
    assert(a.wholeStageCodegenSpans >= 1)

    val pruning = PlanAudit.columnPruning(li)
    assert(pruning.exists { case (_, req, total) => req == 2 && total > 2 })
  }

  test("broadcast join is shuffle-free; large self-join is not") {
    val o = spark.read.parquet(s"$d/orders.parquet")
    val r = spark.read.parquet(s"$d/region.parquet")
    val bj = o.join(broadcast(r), o("o_orderkey") % 5 === r("r_regionkey"))
    val ab = PlanAudit.audit(bj)
    assert(ab.numBroadcastJoins >= 1 && ab.shuffleFree)

    val smjDisabled = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = o.join(o.select(col("o_orderkey").as("k")), col("o_orderkey") === col("k"))
      val as = PlanAudit.audit(smj)
      assert(!as.shuffleFree && as.numSortMergeJoins >= 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", smjDisabled)
  }

  test("numericProfile: mean/stddev/percentiles per column in one pass") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = Discovery.numericProfile(df, percentiles = Seq(0.5)).collect()(0)
    assert(r.getAs[String]("column") == "v")
    assert(r.getAs[Double]("mean") == 2.5)
    assert(r.getAs[Double]("p50") == 2.5)
    assert(math.abs(r.getAs[Double]("stddev") - 1.290994) < 1e-6)
    // approx path yields the same shape
    val ra = Discovery.numericProfile(df, percentiles = Seq(0.5), approx = true)
    assert(ra.columns.toSeq == Seq("column", "mean", "stddev", "p50"))
  }

  test("catalog compaction shrinks file counts, preserves rows, leaves no debris") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val cat = new Catalog(spark, root)
    (1 to 5).foreach(i => cat.recordRun("p", s"run-$i", Seq(("n", true, 1L, ""))))
    def files(t: String) = new java.io.File(s"$root/$t")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("meta_runs") == 5)
    val before = cat.table("meta_runs").count()
    val compacted = cat.compact()
    assert(compacted.contains("meta_runs"))
    assert(files("meta_runs") == 1)
    assert(cat.table("meta_runs").count() == before)
    // appends keep working after compaction
    cat.recordRun("p", "run-6", Seq(("n", true, 1L, "")))
    assert(cat.table("meta_runs").count() == before + 1)
    val debris = new java.io.File(root).list().filter(_.contains("_graft_"))
    assert(debris.isEmpty, s"leftover swap dirs: ${debris.mkString(",")}")
  }
}
