package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // skewed frame: one hot key with 5000 rows, 50 cold keys with 10 each
  private lazy val skewed = spark.range(5500)
    .select(when(col("id") < 5000, lit("hot"))
      .otherwise(concat(lit("k"), (col("id") % 50).cast("string"))).as("k"),
      (col("id") % 7).cast("double").as("v"))

  test("saltedJoin matches plain join results for inner and left") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("zzz", "Z"))
      .toDF("k", "label")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "label").collect()
        .map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2)))).sorted

    val plainInner = skewed.join(dim, Seq("k"), "inner")
    val saltedInner = Skew.saltedJoin(skewed, dim, Seq("k"), "inner")
    assert(canon(saltedInner).sameElements(canon(plainInner)))

    val plainLeft = skewed.join(dim, Seq("k"), "left")
    val saltedLeft = Skew.saltedJoin(skewed, dim, Seq("k"), "left")
    assert(canon(saltedLeft).sameElements(canon(plainLeft)))
    // the join key includes the salt: the hot key's rows spread buckets
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), "full")
    }
  }

  test("saltedAggregate equals plain groupBy for sum/count/min/max/avg") {
    val out = Skew.saltedAggregate(skewed, Seq("k"), Map(
      "total" -> ("sum", "v"), "n" -> ("count", "v"),
      "lo" -> ("min", "v"), "hi" -> ("max", "v"), "mean" -> ("avg", "v")))
    val plain = skewed.groupBy("k").agg(
      sum("v").as("total"), count(col("v")).as("n"),
      min("v").as("lo"), max("v").as("hi"), avg("v").as("mean"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "total", "n", "lo", "hi", "mean").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), math.round(r.getDouble(5) * 1e9)))
        .sortBy(_._1)
    assert(canon(out).sameElements(canon(plain)))
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(skewed, Seq("k"), Map("bad" -> ("collect_list", "v")))
    }
  }

  test("z-ordered write clusters both columns into tight per-file ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    // 40k points on a 200x200 grid, row-major order (worst case for y)
    val grid = spark.range(40000).select(
      (col("id") / 200).cast("long").as("x"), (col("id") % 200).cast("long").as("y"))
    graft.sources.Sources.writeZOrdered(grid, s"$dir/z", Seq("x", "y"),
      bitsPerCol = 8, numFiles = 16)
    val perFile = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name().as("f"))
      .agg(((max("x") - min("x")) + 1).as("xr"), ((max("y") - min("y")) + 1).as("yr"))
      .collect()
    assert(perFile.length > 4)
    // files must cover far less than the full 200-wide domain on BOTH axes
    // (a plain sort by x would leave yr == 200 for every file); a couple of
    // boundary files legitimately span z-curve discontinuities
    val loose = perFile.count(r =>
      r.getAs[Long]("xr") > 100 || r.getAs[Long]("yr") > 100)
    assert(loose <= perFile.length / 4,
      perFile.map(r => (r.getAs[Long]("xr"), r.getAs[Long]("yr"))).mkString(","))
    val avgArea = perFile.map(r =>
      r.getAs[Long]("xr").toDouble * r.getAs[Long]("yr")).sum / perFile.length
    assert(avgArea < 200.0 * 200.0 / 4, s"avg bounding box area $avgArea")
    // round trip intact
    assert(spark.read.parquet(s"$dir/z").count() == 40000)
    assert(spark.read.parquet(s"$dir/z").columns.toSet == Set("x", "y"))
  }

  test("zorder_by is declarative: a YAML write clusters and keeps row stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zyaml").toString
    spark.range(10000).select(
      (col("id") / 100).cast("long").as("x"), (col("id") % 100).cast("long").as("y"))
      .write.parquet(s"$dir/in")
    val cfg = graft.core.YamlConfig.loadPipeline(
      s"""name: z
         |nodes:
         |  - name: clustered
         |    read: { format: parquet, path: $dir/in }
         |    write: { format: parquet, mode: overwrite, path: $dir/out, zorder_by: [x, y], coalesce_partitions: 8 }
         |""".stripMargin)
    val results = graft.core.Pipeline.run(spark, cfg)
    assert(results("clustered").failure.isEmpty)
    assert(results("clustered").rowsWritten.contains(10000L)) // stats survive
    val perFile = spark.read.parquet(s"$dir/out")
      .groupBy(input_file_name().as("f"))
      .agg(((max("y") - min("y")) + 1).as("yr")).collect()
    assert(perFile.length > 2)
    // row-major input sorted plainly would leave yr == 100 everywhere
    assert(perFile.count(_.getAs[Long]("yr") <= 60) >= perFile.length / 2,
      perFile.map(_.getAs[Long]("yr")).mkString(","))
    // zorder_by + partition_by is rejected, not silently mis-clustered
    intercept[IllegalArgumentException] {
      graft.sources.Sources.write(spark.range(5).toDF("x"), s"$dir/bad",
        graft.sources.Sources.WriteConfig(partitionBy = Seq("x"), zorderBy = Seq("x")))
    }
    // a string cluster column fails fast instead of collapsing every row
    // into bucket 0 (cast-to-double would null out all ranks)
    val strErr = intercept[IllegalArgumentException] {
      graft.sources.Sources.write(
        Seq(("a", 1L)).toDF("s", "v"), s"$dir/badstr",
        graft.sources.Sources.WriteConfig(zorderBy = Seq("s")))
    }
    assert(strErr.getMessage.contains("unordered type"))
    // timestamps cluster via their epoch value (no silent null ranks)
    val ts = spark.range(1000).select(
      (col("id") % 10).as("g"),
      timestamp_seconds(col("id") * 3600).as("t"))
    graft.sources.Sources.write(ts, s"$dir/ts",
      graft.sources.Sources.WriteConfig(zorderBy = Seq("t"), coalescePartitions = Some(4)))
    assert(spark.read.parquet(s"$dir/ts").count() == 1000)
    // streaming + zorder_by is a load-time error, never silently ignored
    val e = intercept[IllegalArgumentException] {
      graft.core.YamlConfig.loadPipeline(
        s"""name: s
           |nodes:
           |  - name: x
           |    read: { format: parquet, path: $dir/in, streaming: true, schema_ddl: "x LONG" }
           |    streaming: { checkpoint: $dir/cp }
           |    write: { format: parquet, path: $dir/sout, zorder_by: [x] }
           |""".stripMargin)
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("bucketed tables join without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.sources.Sources.writeBucketed(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x"),
        "graft_bkt_left", buckets = 4, bucketCols = Seq("id"), sortCols = Seq("id"))
      graft.sources.Sources.writeBucketed(
        Seq((1L, 10.0), (2L, 20.0)).toDF("id", "y"),
        "graft_bkt_right", buckets = 4, bucketCols = Seq("id"), sortCols = Seq("id"))
      val joined = spark.table("graft_bkt_left").join(spark.table("graft_bkt_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"co-located join still shuffles:\n$plan")
      assert(joined.count() == 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
      ()
    }
  }

  test("skewReport surfaces the hot key with its exact share and factor") {
    import graft.operators.Skew
    // key "hot" holds 900 of 1000 rows over 101 distinct keys
    val df = spark.range(1000).selectExpr(
      "CASE WHEN id < 900 THEN 'hot' ELSE CAST(id AS STRING) END AS k", "id")
    val rep = Skew.skewReport(df, Seq("k"), topK = 2).collect()
      .map(r => r.getAs[Long]("rank") -> r).toMap
    assert(rep(1L).getAs[String]("key") == "hot")
    assert(rep(1L).getAs[Long]("n") == 900L)
    assert(rep(1L).getAs[Double]("share") == 0.9)
    assert(rep(1L).getAs[Double]("skew_factor") == 900.0 * 101 / 1000)
    assert(rep(2L).getAs[Long]("n") == 1L) // every other key is singleton
    // the hot-key rank scan never funnels: plan uses TakeOrdered
    val plan = Skew.skewReport(df, Seq("k"), 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
