package graft

import org.apache.spark.sql.functions._

import graft.core.Discovery

class DiscoverySpec extends SparkSpec {

  import spark.implicits._

  test("profile: one row per column with nulls, distincts, min/max, cardinality") {
    val df = Seq(
      (1L, Some("a"), "x"),
      (2L, None, "x"),
      (3L, Some("c"), "x"),
      (4L, Some("d"), "y")).toDF("id", "opt", "grp")
    val p = Discovery.profile(df, exactDistinct = true).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("id", "opt", "grp"))
    val id = p("id")
    assert(id.getAs[String]("dtype") == "bigint")
    assert(id.getAs[Long]("null_count") == 0L)
    assert(id.getAs[Long]("distinct_count") == 4L)
    assert(id.getAs[String]("min_value") == "1" && id.getAs[String]("max_value") == "4")
    assert(id.getAs[String]("cardinality") == "unique")
    val opt = p("opt")
    assert(opt.getAs[Long]("null_count") == 1L)
    assert(opt.getAs[Double]("null_pct") == 0.25)
    assert(opt.getAs[String]("cardinality") == "unique") // 3 distinct of 3 non-null
    assert(p("grp").getAs[Long]("distinct_count") == 2L)
  }

  test("profile runs as ONE job / one pass regardless of column count") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Discovery.profile(df).collect() // approx-distinct default: no expand
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() <= 2, s"expected a single aggregation job (+AQE), saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("detectedPatterns classifies sampled string columns") {
    val df = Seq(
      ("2024-01-01", "a@b.com", "not-a-pattern", "123"),
      ("2024-12-31", "x@y.org", "plain words", "456"))
      .toDF("d", "mail", "free", "num")
    val pats = Discovery.detectedPatterns(df)
    assert(pats("d") == "date:YYYY-MM-DD")
    assert(pats("mail") == "email")
    assert(pats("num") == "integer")
    assert(!pats.contains("free"))
  }

  test("listDatasets surfaces folders with inferred formats; detectPartitions finds hive keys") {
    val root = java.nio.file.Files.createTempDirectory("disc").toString
    Seq((1, "a"), (2, "b")).toDF("k", "p")
      .write.partitionBy("p").parquet(s"$root/t1")
    Seq((1, "a")).toDF("k", "v").write.csv(s"$root/t2")
    val ds = Discovery.listDatasets(spark, root).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(ds("t1").getAs[String]("kind") == "folder")
    assert(ds("t2").getAs[String]("format") == "csv")
    val parts = Discovery.detectPartitions(spark, s"$root/t1")
    assert(parts.get("p").exists(_.toSet == Set("a", "b")))
    assert(Discovery.listDatasets(spark, s"$root/nope").count() == 0)
  }

  test("parquetFileStats reads footers; rangeOverlap scores the layout") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("pqstats").toString
    val df = spark.range(40000).select($"id",
      (col("id") % 97).cast("double").as("v"),
      concat(lit("k"), lpad(col("id").cast("string"), 6, "0")).as("s"))
    // clustered layout: range-partitioned + sorted on id -> disjoint ranges
    df.repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(s"$root/clustered")
    // scattered layout: round-robin -> every file spans ~the full id range
    df.repartition(8).write.parquet(s"$root/scattered")

    val stats = Discovery.parquetFileStats(spark, s"$root/clustered", Seq("id", "s"))
    assert(stats.count() == 8)
    assert(stats.agg(sum("rows")).head().getLong(0) == 40000L)
    assert(stats.columns.toSet.contains("min_id") && stats.columns.contains("max_s"))
    // string stats render as strings; id ranges are disjoint across files
    val idOverlap = Discovery.rangeOverlap(stats, "id")
    assert(idOverlap == 0.0, s"clustered overlap $idOverlap")
    val sOverlap = Discovery.rangeOverlap(stats, "s") // zero-padded: same order
    assert(sOverlap == 0.0, s"clustered string overlap $sOverlap")

    val scattered = Discovery.parquetFileStats(spark, s"$root/scattered", Seq("id"))
    val badOverlap = Discovery.rangeOverlap(scattered, "id")
    assert(badOverlap > 0.9, s"scattered overlap $badOverlap")

    intercept[IllegalArgumentException] {
      Discovery.parquetFileStats(spark, s"$root/empty_nowhere")
    }
  }
}
