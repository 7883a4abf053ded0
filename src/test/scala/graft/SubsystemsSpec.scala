package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental
import graft.semantics.Semantics
import graft.sources.{Simulation, Sources}
import graft.validation.Validation

class SubsystemsSpec extends SparkSpec {
  import spark.implicits._

  test("validation: batched row tests + dataset tests") {
    val df = Seq((1, "x", 5), (2, "y", 50), (2, null, -1)).toDF("id", "s", "v")
    val results = Validation.evaluate(df, Seq(
      Validation.Test("s_not_null", "not_null", columns = Seq("s")),
      Validation.Test("v_range", "range", columns = Seq("v"), min = Some(0), max = Some(10)),
      Validation.Test("id_unique", "unique", columns = Seq("id")),
      Validation.Test("rows", "row_count", min = Some(1), max = Some(10)),
      Validation.Test("s_vals", "accepted_values", Validation.Warn,
        columns = Seq("s"), values = Seq("x", "y"))))
    val byName = results.map(r => r.test.name -> r).toMap
    assert(!byName("s_not_null").passed && byName("s_not_null").failedRows == 1)
    assert(!byName("v_range").passed && byName("v_range").failedRows == 2) // 50 and -1
    assert(!byName("id_unique").passed)
    assert(byName("rows").passed)
    assert(!byName("s_vals").passed) // null is not accepted
    intercept[Validation.ValidationError] { Validation.enforce(results) }
    // gate with min pass rate
    assert(!Validation.gate(results, minPassRate = 0.9, abortOnFail = false))

    // the remaining reference test kinds: schema, volume_drop, distribution
    val more = Validation.evaluate(df, Seq(
      Validation.Test("schema_ok", "schema", schemaDdl = Some(df.schema.toDDL)),
      Validation.Test("schema_bad", "schema", schemaDdl = Some("x INT")),
      Validation.Test("vol_ok", "volume_drop", max = Some(0.5), previousCount = Some(4)),
      Validation.Test("vol_bad", "volume_drop", max = Some(0.1), previousCount = Some(10)),
      Validation.Test("dist_ok", "distribution", columns = Seq("s"),
        values = Seq("x", "y"), min = Some(0.5)),
      Validation.Test("dist_bad", "distribution", columns = Seq("s"),
        values = Seq("x"), min = Some(0.9)))).map(r => r.test.name -> r.passed).toMap
    assert(more == Map("schema_ok" -> true, "schema_bad" -> false,
      "vol_ok" -> true, "vol_bad" -> false, "dist_ok" -> true, "dist_bad" -> false))
  }

  test("semantics: parse, sql generation, derived metrics") {
    import Semantics._
    val pq = parse("revenue, n_orders BY status, month WHERE year = 2024")
    assert(pq.metrics == Seq("revenue", "n_orders"))
    assert(pq.dimensions == Seq("status", "month"))
    assert(pq.where.contains("year = 2024"))

    val model = SemanticModel(
      Map("revenue" -> Metric("revenue", "sum(price)", "sales"),
        "n" -> Metric("n", "count(*)", "sales"),
        "aov" -> Metric("aov", "", "sales", formula = Some("revenue / nullif(n, 0)"))),
      Map("status" -> Dimension("status", "st"),
        "month" -> Dimension("month", "ts", Some("month"))))
    val sql = generateSql(model, parse("revenue BY status"))
    assert(sql == "SELECT st AS status, sum(price) AS revenue FROM sales GROUP BY 1")
    val derived = generateSql(model, parse("aov BY month"))
    assert(derived.contains("(sum(price)) / nullif((count(*)), 0) AS aov"))
    assert(derived.contains("date_trunc('month', ts) AS month"))

    val sales = Seq(("F", 10.0), ("F", 30.0), ("O", 5.0)).toDF("st", "price")
    val out = Semantics.run(spark, model, "revenue, n BY status", Map("sales" -> sales))
      .orderBy("status").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("F", 40.0, 2L), ("O", 5.0, 1L)))
  }

  test("incremental: hwm filter, state backends, new hwm") {
    val df = Seq(("2024-01-01 00:00:00", 1), ("2024-01-05 00:00:00", 2))
      .toDF("ts_s", "v").withColumn("ts", $"ts_s".cast("timestamp"))
    assert(Incremental.hwmFilter(df, "ts", None).count() == 2) // first run
    assert(Incremental.hwmFilter(df, "ts", Some("2024-01-02 00:00:00")).count() == 1)
    // watermark lag reopens the window
    assert(Incremental.hwmFilter(df, "ts", Some("2024-01-02 00:00:00"),
      watermarkLagSeconds = 5 * 86400).count() == 2)
    assert(Incremental.newHwm(df, "ts").get.startsWith("2024-01-05"))

    val tmp = java.nio.file.Files.createTempDirectory("graft_state").toString
    val js = new Incremental.JsonFileState(s"$tmp/state.json")
    assert(js.get("k").isEmpty)
    js.set("k", "2024-01-05 00:00:00"); js.set("k2", "x")
    assert(js.get("k").contains("2024-01-05 00:00:00") && js.get("k2").contains("x"))
    // values/keys with JSON metacharacters survive the round trip
    js.set("""quo"te""", """back\slash "v" """)
    assert(js.get("""quo"te""").contains("""back\slash "v" """))
    assert(js.get("k").contains("2024-01-05 00:00:00")) // older keys intact

    val ps = new Incremental.ParquetTableState(spark, s"$tmp/state_tbl")
    ps.set("hwm", "42"); ps.set("hwm", "43")
    assert(ps.get("hwm").contains("43"))
  }

  test("sources: metadata cols, content hash, write-if-changed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    df.write.mode("overwrite").parquet(s"$dir/in")
    val read = Sources.read(spark, Sources.ReadConfig("parquet", Some(s"$dir/in")))
    val meta = Sources.withMetadataCols(read, Map("_source_table" -> "t"))
    assert(meta.columns.toSet.contains("_extracted_at"))
    assert(meta.filter($"_source_file".contains("parquet")).count() == 2)

    val h1 = Sources.contentHash(df)
    assert(h1 == Sources.contentHash(Seq((2, "b"), (1, "a")).toDF("id", "v"))) // order-insensitive
    assert(h1 != Sources.contentHash(Seq((1, "a"), (2, "c")).toDF("id", "v")))

    val (wrote1, h) = Sources.writeIfChanged(df, s"$dir/out", None)
    val (wrote2, _) = Sources.writeIfChanged(df, s"$dir/out", Some(h))
    assert(wrote1 && !wrote2)
  }

  test("simulation: deterministic, distributed, random walk per entity") {
    val ts = Simulation.timeSeries(spark, Simulation.EntityConfig(3), 10,
      "2026-01-01 00:00:00", 60)
    assert(ts.count() == 30)
    assert(ts.select("entity_id").distinct().count() == 3)
    val walked = ts.withColumn("x",
      Simulation.randomWalk(ts, "entity_id", "tick", "x", seed = 7))
      .withColumn("u", Simulation.uniform(col("id"), 1))
      .withColumn("cat", Simulation.categorical(col("id"), 2,
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)))
    val again = ts.withColumn("x",
      Simulation.randomWalk(ts, "entity_id", "tick", "x", seed = 7))
    // bit-reproducible across runs
    assert(walked.select("id", "x").collect().toSeq ==
      again.select("id", "x").repartition(7).collect().sortBy(_.getLong(0)).toSeq)
    val u = walked.select(min("u"), max("u")).collect()(0)
    assert(u.getDouble(0) >= 0.0 && u.getDouble(1) < 1.0)
    assert(walked.select("cat").distinct().count() == 3)
  }
}
