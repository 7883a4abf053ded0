package graft

import graft.sources.Sources

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(format: String, options: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$format").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5)).toDF("id", "name", "v")
    Sources.write(df, s"$dir/out", Sources.WriteConfig(format = format,
      mode = "overwrite", options = options))
    // append mode doubles the rows
    Sources.write(df, s"$dir/out", Sources.WriteConfig(format = format,
      mode = "append", options = options))
    val back = Sources.read(spark, Sources.ReadConfig(format, Some(s"$dir/out"),
      schemaDdl = Some("id BIGINT, name STRING, v DOUBLE"), options = options))
    assert(back.count() == 6, s"$format roundtrip count")
    assert(back.filter($"id" === 1 && $"v" === 1.5).count() == 2, s"$format values")
    assert(back.filter($"id" === 3 && $"name".isNull).count() == 2, s"$format nulls")
  }

  test("parquet roundtrip with modes") { roundtrip("parquet") }
  test("json roundtrip with modes") { roundtrip("json") }
  test("csv roundtrip with modes") {
    roundtrip("csv", Map("header" -> "true", "nullValue" -> "\\N"))
  }
  // avro: this environment ships avro core libs but not the spark-avro
  // datasource module, so format("avro") is unavailable; the Sources API
  // passes the format string through unchanged on clusters that have it.

  test("target_file_size_mb picks the output file count from the size estimate") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString
    // tens of MB of estimated rows spread over many input partitions
    // (stats use type defaults, so row count drives the estimate)
    val wide = spark.range(1000000).repartition(20)
      .selectExpr("id", "repeat('x', 80) AS pad")
    def files(p: String): Int =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    // huge target -> one file (the small-files fix)
    Sources.write(wide, s"$dir/one",
      Sources.WriteConfig(targetFileSizeMb = Some(1024)))
    assert(files(s"$dir/one") == 1, s"got ${files(s"$dir/one")}")
    // tiny target -> strictly more than one file (the giant-file fix)
    Sources.write(wide, s"$dir/many",
      Sources.WriteConfig(targetFileSizeMb = Some(1)))
    assert(files(s"$dir/many") > 1)
    // rows intact either way
    assert(spark.read.parquet(s"$dir/one").count() == 1000000)
    assert(spark.read.parquet(s"$dir/many").count() == 1000000)
    // explicit layout choices win: hive partitioning ignores the target
    Sources.write(wide.selectExpr("id % 2 AS k", "pad"), s"$dir/hive",
      Sources.WriteConfig(partitionBy = Seq("k"), targetFileSizeMb = Some(1024)))
    assert(new java.io.File(s"$dir/hive").listFiles.exists(_.getName.startsWith("k=")))
  }

  test("compactParquet rewrites small files atomically; expirePartitions TTLs by value") {
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft_maint").toString
    // 40 tiny files from 40 partitions
    spark.range(40000).repartition(40).write.parquet(s"$base/landing")
    val (before, after) = Sources.compactParquet(spark, s"$base/landing", 1024)
    assert(before == 40 && after == 1, s"$before -> $after")
    assert(spark.read.parquet(s"$base/landing").count() == 40000)

    // hive-partitioned sink with date values
    spark.range(100).selectExpr("id",
      "CASE WHEN id % 3 = 0 THEN '2026-01-01' WHEN id % 3 = 1 THEN '2026-02-01' ELSE '2026-03-01' END AS dt")
      .write.partitionBy("dt").parquet(s"$base/byday")
    val planned = Sources.expirePartitions(spark, s"$base/byday", "dt",
      "2026-02-15", dryRun = true)
    assert(planned == Seq("2026-01-01", "2026-02-01"))
    assert(spark.read.parquet(s"$base/byday").count() == 100) // dry run deletes nothing
    val gone = Sources.expirePartitions(spark, s"$base/byday", "dt", "2026-02-15")
    assert(gone == Seq("2026-01-01", "2026-02-01"))
    val left = spark.read.parquet(s"$base/byday")
    assert(left.count() == 33 &&
      left.selectExpr("CAST(min(dt) AS STRING)").head().getString(0) == "2026-03-01")
    // wrong column name fails fast instead of silently deleting nothing
    intercept[IllegalArgumentException] {
      Sources.expirePartitions(spark, s"$base/byday", "nope", "2026-02-15")
    }
    // compacting a hive-partitioned sink would flatten it: refuse
    intercept[IllegalArgumentException] {
      Sources.compactParquet(spark, s"$base/byday")
    }
  }

  test("partitioned write prunes directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq(("2026-01-01", 1), ("2026-01-02", 2)).toDF("dt", "v")
    Sources.write(df, s"$dir/out", Sources.WriteConfig(partitionBy = Seq("dt")))
    assert(new java.io.File(s"$dir/out/dt=2026-01-01").exists())
    val pruned = spark.read.parquet(s"$dir/out").filter($"dt" === "2026-01-01")
    assert(pruned.count() == 1)
    // partition filter reaches the scan (no full-data read)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }

  test("jdbc reader config: pushdown subquery + range partitioning") {
    // config-level assertions (no database in this environment — same
    // stub-transport stance as ApiSourceSpec)
    val opts = Sources.jdbcOptions(
      url = "jdbc:postgresql://db:5432/warehouse",
      table = "public.orders",
      filter = Some("o_orderdate >= '2026-01-01'"),
      partitioning = Some(Sources.JdbcPartitioning("o_orderkey", 0L, 6000000L, 32)),
      options = Map("fetchsize" -> "10000"))
    assert(opts("url") == "jdbc:postgresql://db:5432/warehouse")
    // the database, not Spark, evaluates the filter
    assert(opts("dbtable") ==
      "(SELECT * FROM public.orders WHERE o_orderdate >= '2026-01-01') AS pushdown_subquery")
    // 32 concurrent stride queries instead of one connection for the table
    assert(opts("partitionColumn") == "o_orderkey")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "6000000")
    assert(opts("numPartitions") == "32")
    assert(opts("fetchsize") == "10000")

    // without partitioning/filter: bare table, no stray options
    val bare = Sources.jdbcOptions("jdbc:sqlite:x", "t")
    assert(bare == Map("url" -> "jdbc:sqlite:x", "dbtable" -> "t"))

    intercept[IllegalArgumentException] {
      Sources.JdbcPartitioning("k", 0L, 100L, 0) // numPartitions must be >= 1
    }
  }

  test("chunked read equals full read at equal row count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunked").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(8).write.parquet(s"$dir/orders")

    val t0 = System.nanoTime()
    val full = spark.read.parquet(s"$dir/orders")
    val fullCount = full.count()
    val fullMs = (System.nanoTime() - t0) / 1e6

    val t1 = System.nanoTime()
    val chunks = Sources.readChunked(spark, "parquet", s"$dir/orders",
      filesPerChunk = 3).toSeq
    val chunkCount = chunks.map(_.count()).sum
    val chunkMs = (System.nanoTime() - t1) / 1e6

    assert(chunks.size == 3) // 8 files in groups of 3
    assert(chunkCount == fullCount)
    assert(chunks.forall(_.schema == full.schema))
    info(f"full read: $fullMs%.0f ms, chunked (3 chunks): $chunkMs%.0f ms")
  }
}
