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

    // token resolution: substring-overlapping metric names and metrics that
    // shadow SQL function names must not mis-substitute
    val tricky = SemanticModel(
      Map("rev" -> Metric("rev", "sum(price)", "sales"),
        "rev_net" -> Metric("rev_net", "sum(price - cost)", "sales"),
        "count" -> Metric("count", "count(*)", "sales"),
        "margin" -> Metric("margin", "", "sales",
          formula = Some("rev_net / nullif(rev, 0) + count(distinct st) - count")),
        "per_order" -> Metric("per_order", "", "sales",
          formula = Some("rev / nullif(s.rev, 0)"))),
      Map.empty)
    val mSql = generateSql(tricky, parse("margin"))
    // rev inside rev_net untouched; count( call untouched; bare count resolved
    assert(mSql.contains(
      "(sum(price - cost)) / nullif((sum(price)), 0) + count(distinct st) - (count(*)) AS margin"))
    val qSql = generateSql(tricky, parse("per_order"))
    assert(qSql.contains("(sum(price)) / nullif(s.rev, 0) AS per_order")) // s.rev qualified
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

  test("simulation stochastic generators: distribution moments within tolerance") {
    // the statistical contract of the hash-seeded RNG family — the spec'd
    // half of the q_simulation split (the closed-form half is oracle-
    // verified as q_simulation_deterministic). Sample sizes make the
    // standard errors ~10x smaller than the asserted tolerances.
    val ts = Simulation.timeSeries(spark, Simulation.EntityConfig(40), 500,
      "2026-01-01 00:00:00", 60) // 20k rows
    // random-walk increments: mean ~ drift, stddev ~ volatility
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("entity_id").orderBy("tick")
    val incs = ts.withColumn("x", Simulation.randomWalk(
        ts, "entity_id", "tick", "x", seed = 7, volatility = 2.0, drift = 0.1))
      .withColumn("prev", lag("x", 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("x") - col("prev")).as("inc"))
    val m = incs.agg(avg("inc"), stddev("inc")).collect()(0)
    assert(math.abs(m.getDouble(0) - 0.1) < 0.06,
      s"walk increment mean ${m.getDouble(0)} not ~ drift 0.1")
    assert(math.abs(m.getDouble(1) - 2.0) < 0.1,
      s"walk increment stddev ${m.getDouble(1)} not ~ volatility 2.0")
    // uniform: mean ~ 0.5, bounds [0, 1)
    val u = ts.select(Simulation.uniform(col("id"), 3).as("u"))
      .agg(avg("u"), min("u"), max("u")).collect()(0)
    assert(math.abs(u.getDouble(0) - 0.5) < 0.02 &&
      u.getDouble(1) >= 0.0 && u.getDouble(2) < 1.0)
    // normal (Irwin-Hall): mean ~ 0, stddev ~ 1
    val n = ts.select(Simulation.normal(col("id"), 5).as("n"))
      .agg(avg("n"), stddev("n")).collect()(0)
    assert(math.abs(n.getDouble(0)) < 0.03 && math.abs(n.getDouble(1) - 1.0) < 0.03)
    // categorical: observed frequencies ~ configured weights
    val freqs = ts.select(Simulation.categorical(col("id"), 2,
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)).as("cat"))
      .groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 20000.0).toMap
    assert(math.abs(freqs("a") - 0.5) < 0.02 &&
      math.abs(freqs("b") - 0.3) < 0.02 && math.abs(freqs("c") - 0.2) < 0.02,
      s"categorical frequencies off: $freqs")
    // geoPoint: uniform in bbox, means near the center
    val bbox = (40.0, -75.0, 42.0, -72.0)
    val g = ts.select(Simulation.geoPoint(col("id"), 13, bbox).as("g"))
      .select(col("g.lat").as("lat"), col("g.lon").as("lon"))
      .agg(avg("lat"), avg("lon"), min("lat"), max("lat"), min("lon"), max("lon"))
      .collect()(0)
    assert(math.abs(g.getDouble(0) - 41.0) < 0.05 && math.abs(g.getDouble(1) + 73.5) < 0.05)
    assert(g.getDouble(2) >= 40.0 && g.getDouble(3) < 42.0 &&
      g.getDouble(4) >= -75.0 && g.getDouble(5) < -72.0)
  }

  test("simulation generators: uuid, geo, derived, scheduled events, chaos, bounded walk") {
    val ts = Simulation.timeSeries(spark, Simulation.EntityConfig(4), 120,
      "2026-01-01 00:00:00", 60).cache()

    // uuid: v4 layout, deterministic, distinct per row
    val withUuid = ts.withColumn("u", Simulation.fakeUuid(col("id"), 5))
    val uuids = withUuid.select("u").collect().map(_.getString(0))
    assert(uuids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}")))
    assert(uuids.distinct.length == uuids.length)
    assert(withUuid.select("u").collect().map(_.getString(0)).sameElements(uuids))

    // geo: inside bbox, deterministic
    val bbox = (40.0, -75.0, 42.0, -72.0)
    val geo = ts.select(Simulation.geoPoint(col("id"), 3, bbox).as("g"))
      .select(col("g.lat"), col("g.lon")).collect()
    assert(geo.forall(r => r.getDouble(0) >= 40.0 && r.getDouble(0) < 42.0 &&
      r.getDouble(1) >= -75.0 && r.getDouble(1) < -72.0))

    // derived: later expressions see earlier derived columns
    val derived = Simulation.withDerived(ts.withColumn("t_c", lit(20.0)),
      Seq("t_f" -> "t_c * 1.8 + 32", "t_f2" -> "t_f * 2"))
    assert(derived.select("t_f2").head().getDouble(0) == 136.0)

    // scheduled events: windowed forced value, recurring window, permanent setpoint
    val withV = ts.withColumn("v", lit(10.0))
    val forced = Simulation.applyScheduledEvent(withV, "ts", "entity_id",
      Simulation.ScheduledEvent("forced_value", "v", 0.0,
        "2026-01-01 00:30:00", endTime = Some("2026-01-01 01:00:00"),
        entity = Some("entity_1")))
    assert(forced.filter($"v" === 0.0).count() == 30) // 30 ticks, one entity
    val recurring = Simulation.applyScheduledEvent(withV, "ts", "entity_id",
      Simulation.ScheduledEvent("forced_value", "v", 0.0, "2026-01-01 00:00:00",
        recurrenceSeconds = Some(3600), durationSeconds = Some(600),
        maxOccurrences = Some(1)))
    assert(recurring.filter($"v" === 0.0).count() == 4 * 10) // first 10 min only
    val permanent = Simulation.applyScheduledEvent(withV, "ts", "entity_id",
      Simulation.ScheduledEvent("setpoint_change", "v", 99.0, "2026-01-01 01:00:00"))
    assert(permanent.filter($"v" === 99.0).count() == 4 * 60) // second hour on

    // chaos: outliers + duplicates + downtime, all deterministic
    val base = ts.withColumn("m", lit(1.0))
    val chaotic = Simulation.chaos(base, "id", seed = 9,
      outlierRate = 0.05, outlierFactor = 3.0, outlierCols = Seq("m"),
      duplicateRate = 0.02,
      downtimes = Seq(Simulation.Downtime("2026-01-01 00:00:00",
        "2026-01-01 00:10:00", entity = Some("entity_0"))))
    val n1 = chaotic.count()
    assert(n1 == Simulation.chaos(base, "id", seed = 9,
      outlierRate = 0.05, outlierFactor = 3.0, outlierCols = Seq("m"),
      duplicateRate = 0.02,
      downtimes = Seq(Simulation.Downtime("2026-01-01 00:00:00",
        "2026-01-01 00:10:00", entity = Some("entity_0")))).count())
    assert(chaotic.filter($"m" === 3.0).count() > 0) // outliers present
    assert(n1 > 480 - 10) // duplicates offset the 10 downtime rows
    val nulled = Simulation.withNullRate(base, "m", 0.5, "id", 3)
    val nNull = nulled.filter($"m".isNull).count()
    assert(nNull > 120 && nNull < 360) // ~50%

    // per-entity generator overrides
    val overridden = ts.withColumn("temp", Simulation.overrideByEntity(
      col("entity_id"), default = lit(20.0),
      overrides = Map("entity_1" -> lit(99.0), "entity_2" -> lit(-5.0))))
    val byEntity = overridden.groupBy("entity_id").agg(min("temp"), max("temp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byEntity("entity_0") == ((20.0, 20.0)))
    assert(byEntity("entity_1") == ((99.0, 99.0)))
    assert(byEntity("entity_2") == ((-5.0, -5.0)))

    // bounded walk: clamped to [min, max], deterministic with shocks
    val walk = ts.withColumn("p", Simulation.boundedRandomWalk(ts, "entity_id",
      "tick", "p", seed = 23, start = 100.0, min = 95.0, max = 105.0,
      volatility = 5.0, shockRate = 0.1, shockMagnitude = 20.0))
    val mm = walk.select(min("p"), max("p")).collect()(0)
    assert(mm.getDouble(0) >= 95.0 && mm.getDouble(1) <= 105.0)
    ts.unpersist()
    ()
  }
}
