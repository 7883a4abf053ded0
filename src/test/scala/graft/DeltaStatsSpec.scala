package graft

import graft.sources.{DeltaDvWriter, DeltaLog, DeltaMaintenance, DeltaStats, DeltaWriter}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Per-file column statistics + data skipping: every add action the writer
 * publishes carries footer-derived minValues/maxValues/nullCount, and the
 * read path prunes files a predicate provably cannot match — soundly
 * (never a wrong answer) and effectively (a range predicate on a
 * range-clustered table reads a fraction of the files).
 */
class DeltaStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("dstats").toString

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("append stamps min/max/nullCount per file, nested struct included") {
    val root = tmp()
    val df = Seq(
      (1, 10L, 1.5, Some("apple"), Some(java.sql.Date.valueOf("2024-01-03")), (7, "in")),
      (2, 20L, -2.5, None, Some(java.sql.Date.valueOf("2024-02-01")), (9, "out")),
      (3, 30L, 0.0, Some("pear"), None, (8, "mid")))
      .toDF("i", "l", "d", "s", "dt", "st")
    DeltaWriter.write(df.coalesce(1), root)
    val a = DeltaLog.snapshot(spark, root).files.head
    val n = mapper.readTree(a.stats.get)
    assert(n.get("numRecords").asLong == 3)
    assert(n.get("tightBounds").asBoolean)
    val mn = n.get("minValues"); val mx = n.get("maxValues"); val nc = n.get("nullCount")
    assert(mn.get("i").asInt == 1 && mx.get("i").asInt == 3)
    assert(mn.get("l").asLong == 10 && mx.get("l").asLong == 30)
    assert(mn.get("d").asDouble == -2.5 && mx.get("d").asDouble == 1.5)
    assert(mn.get("s").asText == "apple" && mx.get("s").asText == "pear")
    assert(mn.get("dt").asText == "2024-01-03" && mx.get("dt").asText == "2024-02-01")
    assert(mn.get("st").get("_1").asInt == 7 && mx.get("st").get("_1").asInt == 9)
    assert(nc.get("s").asLong == 1 && nc.get("dt").asLong == 1 && nc.get("i").asLong == 0)
  }

  test("range-clustered table: range predicate skips most files, result exact") {
    val root = tmp()
    val df = (0 until 1000).map(i => (i, s"v$i")).toDF("k", "v")
    DeltaWriter.write(df.repartitionByRange(10, $"k"), root)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.size == 10)
    val pr = DeltaStats.prune(spark, snap, col("k") >= 950)
    assert(pr.candidates == 10 && pr.kept <= 2, s"kept ${pr.kept}")
    val got = DeltaLog.read(spark, root, dataFilter = Some(col("k") >= 950))
    assert(got.count() == 50)
    assert(got.agg(min("k")).head.getInt(0) == 950)
    // equality point lookup touches one file
    assert(DeltaStats.prune(spark, snap, col("k") === 123).kept == 1)
    // conjunction and IN
    assert(DeltaStats.prune(spark, snap, col("k") >= 100 && col("k") < 200).kept == 1)
    assert(DeltaStats.prune(spark, snap, col("k").isin(5, 505)).kept == 2)
    // disjunction keeps the union
    val or = DeltaStats.prune(spark, snap, col("k") === 5 || col("k") === 995)
    assert(or.kept == 2)
  }

  test("skipping is sound: opaque predicates and un-stat'd columns keep all") {
    val root = tmp()
    DeltaWriter.write((0 until 100).map(i => (i, i % 7)).toDF("k", "m")
      .repartitionByRange(5, $"k"), root)
    val snap = DeltaLog.snapshot(spark, root)
    // arithmetic the pruner does not model: keep everything, answer exact
    assert(DeltaStats.prune(spark, snap, expr("k % 2 = 0")).kept == 5)
    assert(DeltaLog.read(spark, root, dataFilter = Some(expr("k % 2 = 0")))
      .count() == 50)
    // unknown column inside OR cannot prune the disjunction
    assert(DeltaStats.prune(spark, snap, col("k") < -1 || expr("m % 3 = 1")).kept == 5)
    // but a false-everywhere range does
    assert(DeltaStats.prune(spark, snap, col("k") < -1).kept == 0)
    assert(DeltaLog.read(spark, root, dataFilter = Some(col("k") < -1)).count() == 0)
  }

  test("null semantics: IsNull prunes null-free files, cmp prunes all-null") {
    val root = tmp()
    val withNulls = (0 until 50).map(i => (i, if (i < 25) Some(s"x$i") else None))
      .toDF("k", "s").repartitionByRange(2, $"k") // file 0: values, file 1: nulls
    DeltaWriter.write(withNulls, root)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.size == 2)
    val isNull = DeltaStats.prune(spark, snap, col("s").isNull)
    assert(isNull.kept == 1)
    val notNull = DeltaStats.prune(spark, snap, col("s").isNotNull)
    assert(notNull.kept == 1)
    // comparison never matches an all-null file
    assert(DeltaStats.prune(spark, snap, col("s") === "x3").kept == 1)
    assert(DeltaLog.read(spark, root, dataFilter = Some(col("s") === "x3")).count() == 1)
    // string prefix
    assert(DeltaStats.prune(spark, snap, col("s").startsWith("x1")).kept == 1)
  }

  test("negations: != prunes constant files; NOT pushes through") {
    val root = tmp()
    // two files: k constant 1, k in 2..10
    DeltaWriter.write(Seq.fill(5)(1).toDF("k").coalesce(1), root)
    DeltaWriter.write((2 to 10).toDF("k").coalesce(1), root)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.size == 2)
    assert(DeltaStats.prune(spark, snap, col("k") =!= 1).kept == 1)
    assert(DeltaStats.prune(spark, snap, !(col("k") >= 2)).kept == 1)
    assert(DeltaLog.read(spark, root, dataFilter = Some(col("k") =!= 1)).count() == 9)
  }

  test("partition columns skip on partitionValues through the same filter") {
    val root = tmp()
    val df = (0 until 90).map(i => (i, s"d${i % 3}")).toDF("k", "day")
    DeltaWriter.write(df, root, partitionBy = Seq("day"))
    val snap = DeltaLog.snapshot(spark, root)
    val pr = DeltaStats.prune(spark, snap, col("day") === "d1")
    assert(pr.kept < pr.candidates && pr.kept >= 1)
    val got = DeltaLog.read(spark, root, dataFilter = Some(col("day") === "d1"))
    assert(got.count() == 30)
    // combined partition + data range
    val both = DeltaStats.prune(spark, snap, col("day") === "d1" && col("k") < -5)
    assert(both.kept == 0)
  }

  test("DV delete keeps (loosened) bounds: skipping works on DV files") {
    val root = tmp()
    DeltaWriter.write((0 until 100).map(i => (i, i % 10)).toDF("k", "m")
      .repartitionByRange(4, $"k"), root)
    DeltaDvWriter.delete(spark, root, "m = 3")
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.forall(_.deletionVector.isDefined))
    snap.files.foreach { a =>
      val n = mapper.readTree(a.stats.get)
      assert(!n.get("tightBounds").asBoolean)
      assert(n.has("minValues") && n.get("minValues").has("k"),
        s"DV re-stamp dropped min/max: ${a.stats.get}")
    }
    assert(DeltaStats.prune(spark, snap, col("k") >= 75).kept == 1)
    assert(DeltaLog.read(spark, root, dataFilter = Some(col("k") >= 75))
      .count() == 25 - 2) // 75..99 minus m=3 hits 83,93
  }

  test("OPTIMIZE ZORDER pays off: multi-dim predicates skip compacted files") {
    val root = tmp()
    // deliberately interleaved layout: every file spans the full x range
    val df = (0 until 4096).map { i => (i % 64, i / 64) }.toDF("x", "y")
    DeltaWriter.write(df.repartition(8), root)
    val before = DeltaStats.prune(spark, DeltaLog.snapshot(spark, root),
      col("x") < 8 && col("y") < 8)
    assert(before.kept == 8, "random layout cannot skip")
    DeltaMaintenance.optimize(spark, root, zorderBy = Seq("x", "y"),
      targetFileBytes = 4096)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.size >= 4)
    val after = DeltaStats.prune(spark, snap, col("x") < 8 && col("y") < 8)
    assert(after.kept < after.candidates,
      s"z-ordered table must skip: kept ${after.kept}/${after.candidates}")
    assert(DeltaLog.read(spark, root,
      dataFilter = Some(col("x") < 8 && col("y") < 8)).count() == 64)
  }

  test("column-mapped table: logical predicate resolves to physical stats keys") {
    import org.apache.spark.sql.types._
    val root = tmp()
    def cmField(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      cmField("id", LongType, "col-i1", 1),
      cmField("v", StringType, "col-v1", 2)))
    val jq = (s: String) => "\"" + s + "\""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"commitInfo":{"timestamp":1000,"operation":"CREATE"}}""",
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
          mapper.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{${
          jq("delta.columnMapping.mode")}:${jq("name")},${
          jq("delta.columnMapping.maxColumnId")}:${jq("2")}},"createdTime":1}}""")
        .mkString("\n").getBytes("UTF-8"))
    DeltaWriter.write((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id"), root)
    val snap = DeltaLog.snapshot(spark, root)
    // stats keys are the PHYSICAL names
    snap.files.foreach { a =>
      val n = mapper.readTree(a.stats.get)
      assert(n.get("minValues").has("col-i1"), a.stats.get)
      assert(!n.get("minValues").has("id"))
    }
    assert(DeltaStats.prune(spark, snap, col("id") >= 75L).kept == 1)
    assert(DeltaLog.read(spark, root, dataFilter = Some(col("id") >= 75L))
      .count() == 25)
  }

  test("sub-millisecond timestamps: max rounds UP, strict ranges stay exact") {
    val root = tmp()
    val prior = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      // one row at .000900 micros — a millis-FLOORED max would wrongly
      // prune the strict filter below
      val df = Seq(java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00.000900Z"))).toDF("ts")
      DeltaWriter.write(df.coalesce(1), root)
      val a = DeltaLog.snapshot(spark, root).files.head
      val n = mapper.readTree(a.stats.get)
      assert(n.get("maxValues").has("ts"), a.stats.get)
      assert(n.get("maxValues").get("ts").asText == "2024-01-01T00:00:00.001Z",
        "max timestamp must round UP to the next millisecond: " + a.stats.get)
      val f = col("ts") > lit("2024-01-01 00:00:00.0005").cast("timestamp")
      assert(DeltaLog.read(spark, root, dataFilter = Some(f)).count() == 1,
        "sub-ms strict range was mis-pruned")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  test("non-order-preserving casts and non-BMP strings never mis-prune") {
    val root = tmp()
    DeltaWriter.write((10 until 110).toDF("k").repartitionByRange(4, $"k"), root)
    // cast(int as string) flips the order — the pruner must keep files
    val f = expr("cast(k as string) < '2'")
    val expect = spark.range(10, 110).filter("cast(id as string) < '2'").count()
    assert(DeltaLog.read(spark, root, dataFilter = Some(f)).count() == expect)
    assert(expect > 0) // '10' < '2' lexicographically: rows DO match

    // UTF-16 code-unit order disagrees with UTF-8 byte order here
    val root2 = tmp()
    DeltaWriter.write(Seq("", new String(Character.toChars(0x1F600)))
      .toDF("s").coalesce(1), root2)
    assert(DeltaLog.read(spark, root2,
      dataFilter = Some(col("s") === "")).count() == 1,
      "non-BMP bounds mis-pruned an equality match")
  }

  test("timestamps: bounds recorded and skipped on when the physical type allows") {
    val root = tmp()
    val df = (0 until 40).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-01-${i / 2 + 1}%02d 06:30:00")))
      .toDF("k", "ts")
    DeltaWriter.write(df.repartitionByRange(4, $"ts"), root)
    val snap = DeltaLog.snapshot(spark, root)
    val statted = snap.files.count { a =>
      mapper.readTree(a.stats.get).get("minValues").has("ts")
    }
    // INT96 physical timestamps carry no parquet stats — both layouts are
    // legal; skipping must degrade, never mis-prune
    val f = Some(col("ts") >= lit("2024-01-18 00:00:00").cast("timestamp"))
    val expect = df.filter($"ts" >= "2024-01-18 00:00:00").count()
    assert(DeltaLog.read(spark, root, dataFilter = f).count() == expect)
    if (statted == snap.files.size)
      assert(DeltaStats.prune(spark, snap, f.get).kept < snap.files.size)
  }

  test("StartsWith pruning compares BOTH bounds in UTF-8 byte order") {
    import graft.sources.StatsPruning
    import graft.sources.StatsPruning.Range
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("s", StringType)))
    val cond = StatsPruning.resolveCondition(spark, schema,
      col("s").startsWith("")).get
    def keeps(mn: String, mx: String): Boolean =
      StatsPruning.mayMatch(cond, _ => Some(StringType),
        (_, _) => Range(Some(mn), Some(mx), mayHaveNull = false))
    // max is a supplementary-plane char: its UTF-8 bytes (F0 90 80 80)
    // sort ABOVE the U+E000 prefix (EE 80 80) even though its UTF-16
    // lead surrogate (D800) sorts below — the file MAY hold a match
    assert(keeps("a", new String(Character.toChars(0x10000))),
      "UTF-16 upper-bound comparison unsoundly skipped the file")
    // genuinely impossible windows still skip, in byte order
    assert(!keeps("a", "b"))
    assert(!keeps("", ""))
    // and a min that IS a match's prefix keeps
    assert(keeps("abc", ""))
  }

  test("oversized binary stats in one row group: bounds omitted, not partial") {
    val root = tmp()
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = Seq("parquet.block.size", "parquet.page.size.row.check.min",
      "parquet.page.size.row.check.max").map(k => k -> Option(hc.get(k)))
    hc.set("parquet.block.size", "1024")
    hc.set("parquet.page.size.row.check.min", "2")
    hc.set("parquet.page.size.row.check.max", "2")
    val big = "c" * 8200 // > parquet-mr's 4K footer-stats cap: stats dropped
    try {
      // row group 1 flushes right after the oversized value (block size
      // 1024, mem check every 2 records) and holds {"aa", big}; the many
      // trailing "mm" rows land in later, fully-statted groups
      val rows = Seq((1, "aa"), (2, big)) ++ (3 to 200).map(i => (i, "mm"))
      DeltaWriter.write(rows.toDF("k", "s").coalesce(1), root)
    } finally saved.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.files.size == 1)
    // rows in the stats-dropped row group must never be skipped: bounds
    // reduced over only the statted chunks would claim ["mm","mm"] for a
    // file that also holds "aa" and the big value
    assert(DeltaStats.prune(spark, snap, col("s") === "aa").kept == 1,
      "file bounds excluded a row group whose stats parquet dropped")
    assert(DeltaLog.read(spark, root,
      dataFilter = Some(col("s") === "aa")).count() == 1)
    assert(DeltaLog.read(spark, root,
      dataFilter = Some(col("s") === big)).count() == 1)
    // the int column's stats are intact in every chunk and still skip
    assert(DeltaStats.prune(spark, snap, col("k") > 1000).kept == 0)
  }
}
