package graft

import org.apache.spark.sql.functions._
import graft.patterns.Patterns

class PatternsSpec extends SparkSpec {
  import spark.implicits._

  test("dateDimension generates a correct calendar (2024 leap year = 366 days)") {
    val dim = Patterns.dateDimension(spark, "2024-01-01", "2024-12-31").cache()
    assert(dim.count() == 366)
    assert(dim.filter($"date" === "2024-02-29").count() == 1)
    val jan1 = dim.filter($"date" === "2024-01-01").collect()(0)
    assert(jan1.getAs[Long]("date_sk") == 20240101L)
    assert(jan1.getAs[Boolean]("is_month_start") && jan1.getAs[Boolean]("is_year_start"))
    // fiscal year starting Oct: Dec 2024 is FY2025, Sep 2024 is FY2024
    assert(dim.filter($"date" === "2024-12-01").collect()(0).getAs[Long]("fiscal_year") == 2025L)
    assert(dim.filter($"date" === "2024-09-01").collect()(0).getAs[Long]("fiscal_year") == 2024L)
    assert(dim.filter($"is_weekend").count() == 104)
  }

  test("HLL sketches: per-group estimate, coarser-grain merge, incremental union") {
    import graft.operators.Sketches
    // day 1: users a,b,c on d1; day 2: c,d on d2 (c overlaps)
    val day1 = Seq(("d1", "a"), ("d1", "b"), ("d1", "c"), ("d1", "a")).toDF("day", "user")
    val day2 = Seq(("d2", "c"), ("d2", "d")).toDF("day", "user")

    val sk1 = Sketches.hllSketch(day1, Seq("day"), "user")
    assert(sk1.select(Sketches.hllEstimate($"distinct_sketch")).head().getLong(0) == 3L)

    // coarser grain: union both days' sketches -> 4 distinct users overall
    val both = sk1.unionByName(Sketches.hllSketch(day2, Seq("day"), "user"))
      .withColumn("all", lit("all"))
    val merged = Sketches.hllMerge(both.drop("day"), Seq("all"), "distinct_sketch")
    assert(merged.select(Sketches.hllEstimate($"distinct_sketch")).head().getLong(0) == 4L)

    // incremental aggregate table: existing sketch + fresh partial via merge
    val existing = Sketches.hllSketch(day1.withColumn("k", lit(1)), Seq("k"), "user")
    val fresh = Sketches.hllSketch(day2.withColumn("k", lit(1)), Seq("k"), "user")
    val inc = Patterns.aggregationMerge(existing, fresh, Seq("k"),
      Map("distinct_sketch" -> "hll_union"))
    assert(inc.select(Sketches.hllEstimate($"distinct_sketch")).head().getLong(0) == 4L)
    // grain present only on one side still unions cleanly (null handling)
    val freshOnly = Sketches.hllSketch(day2.withColumn("k", lit(2)), Seq("k"), "user")
    val inc2 = Patterns.aggregationMerge(existing, freshOnly, Seq("k"),
      Map("distinct_sketch" -> "hll_union"))
    assert(inc2.count() == 2)
    assert(inc2.select(Sketches.hllEstimate($"distinct_sketch")).collect()
      .map(_.getLong(0)).sorted.sameElements(Array(2L, 3L)))
  }

  test("theta sketches: exact under k, set algebra answers overlap questions") {
    import graft.operators.Sketches
    // segments with a KNOWN overlap: A = users 0..1499, B = 1000..2999.
    // lgK=12 -> nominal 4096 > |A ∪ B| = 3000, so every sketch AND every
    // set-op result stays EXACT and deterministic: estimates must equal
    // the true counts.
    val users = spark.range(3000).select(
      when($"id" < 1500, "A").otherwise("B").as("seg"), $"id".as("user"))
      .unionByName(spark.range(1000, 1500).select(lit("B").as("seg"), $"id".as("user")))
    val sk = Sketches.thetaSketch(users, Seq("seg"), "user").cache()
    val est = sk.select($"seg", Sketches.thetaEstimate($"theta_sketch").as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("A") == 1500.0 && est("B") == 2000.0, est)

    // pairwise algebra: |A∪B| = 3000, |A∩B| = 500, |A\B| = 1000
    val a = sk.filter($"seg" === "A").select($"theta_sketch".as("sa"))
    val b = sk.filter($"seg" === "B").select($"theta_sketch".as("sb"))
    val both = a.crossJoin(b).select(
      Sketches.thetaEstimate(Sketches.thetaUnion($"sa", $"sb")).as("u"),
      Sketches.thetaEstimate(Sketches.thetaIntersect($"sa", $"sb")).as("i"),
      Sketches.thetaEstimate(Sketches.thetaDiff($"sa", $"sb")).as("d")).head()
    assert(both.getDouble(0) == 3000.0, s"union ${both.getDouble(0)}")
    assert(both.getDouble(1) == 500.0, s"intersect ${both.getDouble(1)}")
    assert(both.getDouble(2) == 1000.0, s"diff ${both.getDouble(2)}")

    // grain merge equals a direct sketch of the union of rows
    val merged = Sketches.thetaMerge(
      sk.withColumn("all", lit(1)), Seq("all"), "theta_sketch")
    val mEst = merged.select(Sketches.thetaEstimate($"theta_sketch")).head().getDouble(0)
    assert(mEst == 3000.0, s"merged $mEst")

    // incremental aggregate table via the theta_union merge strategy
    val existing = Sketches.thetaSketch(
      users.filter($"seg" === "A").withColumn("k", lit(1)), Seq("k"), "user")
    val fresh = Sketches.thetaSketch(
      users.filter($"seg" === "B").withColumn("k", lit(1)), Seq("k"), "user")
    val inc = graft.patterns.Patterns.aggregationMerge(existing, fresh, Seq("k"),
      Map("theta_sketch" -> "theta_union"))
    val incEst = inc.select(Sketches.thetaEstimate($"theta_sketch")).head().getDouble(0)
    assert(incEst == 3000.0, s"incremental $incEst")

    // above nominal k the estimate stays within the published bound
    val big = spark.range(200000).select(lit("x").as("seg"), $"id".as("user"))
    val bigEst = Sketches.thetaSketch(big, Seq("seg"), "user", lgK = 12)
      .select(Sketches.thetaEstimate($"theta_sketch")).head().getDouble(0)
    assert(math.abs(bigEst - 200000.0) / 200000.0 < 0.05, s"big $bigEst")

    // string and binary value types hash consistently
    val s1 = Sketches.thetaSketch(
      Seq("u1", "u2", "u1").toDF("u"), Seq.empty, "u")
      .select(Sketches.thetaEstimate($"theta_sketch")).head().getDouble(0)
    assert(s1 == 2.0)
  }

  test("KLL quantile sketches: rank-error bound per group, grain merge, incremental union") {
    import graft.operators.Sketches
    // 20k values 0..n-1, evens on d1 / odds on d2; exact quantiles known.
    // KLL k=200 guarantees ±1.65% rank error at 99% confidence — assert a
    // conservative 2.5% of the value range (values are uniform, so rank
    // error ~= relative value error).
    val n = 20000
    val df = spark.range(n).select(
      when($"id" % 2 === 0, "d1").otherwise("d2").as("day"),
      $"id".cast("double").as("v"))
    val eps = 0.025 * n

    val byDay = Sketches.kllSketch(df, Seq("day"), "v").cache()
    val p50s = byDay.select($"day",
      Sketches.kllQuantile($"quantile_sketch", 0.5).as("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(p50s("d1") - n / 2.0) < eps, s"d1 p50 ${p50s("d1")}")
    assert(math.abs(p50s("d2") - n / 2.0) < eps, s"d2 p50 ${p50s("d2")}")

    // coarser grain: union of the two day sketches covers all n values
    val merged = Sketches.kllMerge(
      byDay.withColumn("all", lit(1)), Seq("all"), "quantile_sketch")
    val q = merged.select(
      Sketches.kllQuantile($"quantile_sketch", 0.5).as("p50"),
      Sketches.kllQuantile($"quantile_sketch", 0.95).as("p95")).head()
    assert(math.abs(q.getDouble(0) - 0.5 * n) < eps, s"merged p50 ${q.getDouble(0)}")
    assert(math.abs(q.getDouble(1) - 0.95 * n) < eps, s"merged p95 ${q.getDouble(1)}")

    // incremental aggregate table via the kll_union merge strategy
    val existing = Sketches.kllSketch(
      df.filter($"day" === "d1").withColumn("k", lit(1)), Seq("k"), "v")
    val fresh = Sketches.kllSketch(
      df.filter($"day" === "d2").withColumn("k", lit(1)), Seq("k"), "v")
    val inc = Patterns.aggregationMerge(existing, fresh, Seq("k"),
      Map("quantile_sketch" -> "kll_union"))
    val incP50 = inc.select(
      Sketches.kllQuantile($"quantile_sketch", 0.5)).head().getDouble(0)
    assert(math.abs(incP50 - 0.5 * n) < eps, s"incremental p50 $incP50")

    // empty sketch -> null quantile (not an exception)
    val empty = Sketches.kllSketch(df.filter($"v" < 0), Seq.empty, "v")
    assert(empty.select(Sketches.kllQuantile($"quantile_sketch", 0.5)).head().isNullAt(0))
  }

  test("dimension bootstrap SKs are dense and key-ordered on multi-partition input") {
    // 1000 keys spread over 8 input partitions: the bootstrap path must
    // yield exactly 1..1000 in natural-key order with no global
    // single-partition window (assignSks range-partitions + offsets).
    val src = spark.range(1000).repartition(8)
      .select(format_string("k%04d", col("id")).as("nk"), col("id").as("attr"))
    val dim = Patterns.dimension(src, Seq("nk"), "sk", unknownMember = false)
    val rows = dim.orderBy("nk").collect()
    assert(rows.length == 1000)
    assert(rows.map(_.getAs[Long]("sk")).toSeq == (1L to 1000L)) // dense + ordered
    // deterministic across re-runs
    val again = Patterns.dimension(src, Seq("nk"), "sk", unknownMember = false)
    assert(again.orderBy("nk").collect().map(_.getAs[Long]("sk")).toSeq == (1L to 1000L))
  }

  test("dimension assigns stable surrogate keys, MAX+ROW_NUMBER for new rows") {
    val first = Patterns.dimension(Seq(("b", "B"), ("a", "A")).toDF("nk", "attr"),
      Seq("nk"), "sk", unknownMember = false)
    assert(first.columns.toSeq == Seq("sk", "nk", "attr"))
    val skByNk = first.collect().map(r => r.getAs[String]("nk") -> r.getAs[Long]("sk")).toMap
    assert(skByNk == Map("a" -> 1L, "b" -> 2L))

    val second = Patterns.dimension(
      Seq(("a", "A2"), ("c", "C")).toDF("nk", "attr"), Seq("nk"), "sk",
      existing = Some(first), unknownMember = false).cache()
    val rows = second.collect().map(r =>
      r.getAs[String]("nk") -> (r.getAs[Long]("sk"), r.getAs[String]("attr"))).toMap
    assert(rows("a") == (1L, "A2")) // SCD1 refresh keeps SK
    assert(rows("b") == (2L, "B"))  // untouched
    assert(rows("c") == (3L, "C"))  // new key gets MAX+1
  }

  test("fact resolves SKs, orphans get unknown member 0") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("sk", "nk")
    val src = Seq(("a", 10.0), ("zz", 5.0)).toDF("cust_nk", "amount")
    val out = Patterns.fact(src,
      Seq(Patterns.DimLookup(dim, Seq("cust_nk"), Seq("nk"), "sk", "cust_sk")),
      measures = Seq("amount_x2" -> "amount * 2"))
    val byNk = out.collect().map(r => r.getAs[String]("cust_nk") -> r.getAs[Long]("cust_sk")).toMap
    assert(byNk == Map("a" -> 1L, "zz" -> 0L))
    assert(out.filter($"amount_x2" === 20.0).count() == 1)
  }

  test("fact filters SCD2 dims to current rows") {
    val dim = Seq((1L, "a", false), (5L, "a", true)).toDF("sk", "nk", "is_current")
    val src = Seq(("a", 1.0)).toDF("cust_nk", "amount")
    val out = Patterns.fact(src, Seq(
      Patterns.DimLookup(dim, Seq("cust_nk"), Seq("nk"), "sk", "cust_sk",
        scd2Current = Some("is_current"))))
    assert(out.collect()(0).getAs[Long]("cust_sk") == 5L)
  }

  test("fact orphan modes: quarantine splits, reject throws") {
    val dim = Seq((1L, "a")).toDF("sk", "nk")
    val src = Seq(("a", 1.0), ("zz", 2.0)).toDF("cust_nk", "amount")
    val lk = Seq(Patterns.DimLookup(dim, Seq("cust_nk"), Seq("nk"), "sk", "cust_sk"))
    val (fct, quarantined) = Patterns.factWithOrphans(src, lk, orphans = "quarantine")
    assert(fct.count() == 1 && quarantined.count() == 1)
    assert(quarantined.collect()(0).getAs[String]("cust_nk") == "zz")
    intercept[IllegalStateException] {
      Patterns.factWithOrphans(src, lk, orphans = "reject")
    }
  }

  test("bare fact pattern with grain gate: output is pinned, one upstream scan") {
    import graft.core.EngineContext
    import graft.patterns.PatternRegistry
    val dim = Seq((1L, 101L), (2L, 102L)).toDF("dk", "sk")
    val facts = Seq((1L, 10.0), (2L, 20.0), (1L, 30.0)).toDF("nk", "amount")
    val out = PatternRegistry.get("fact").get.apply(
      EngineContext(facts, datasets = Map("dim" -> dim)),
      Map(
        "lookups" -> Seq(Map("dim" -> "dim", "fact_keys" -> "nk",
          "dim_keys" -> "dk", "surrogate_key" -> "sk")),
        "grain" -> Seq("nk", "amount")),
      target = None)
    // the grain gate already materialized the fact into the persist, so a
    // bare caller's subsequent write is a cache read, not a second scan of
    // the upstream — the same single-scan lifecycle a pipeline node gets
    assert(out.storageLevel.useMemory || out.storageLevel.useDisk,
      s"fact must stay pinned after the grain gate, got ${out.storageLevel}")
    val cached = out.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
    }
    assert(cached.nonEmpty, "downstream actions must read the cached fact")
    assert(out.count() == 3)
    out.unpersist()

    // a violated grain still throws and releases the pin
    val e = intercept[IllegalStateException] {
      PatternRegistry.get("fact").get.apply(
        EngineContext(facts, datasets = Map("dim" -> dim)),
        Map(
          "lookups" -> Seq(Map("dim" -> "dim", "fact_keys" -> "nk",
            "dim_keys" -> "dk", "surrogate_key" -> "sk")),
          "grain" -> Seq("nk")),
        target = None)
    }
    assert(e.getMessage.contains("grain violated"))
  }

  test("grainViolations finds duplicate grains") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    assert(Patterns.grainViolations(df, Seq("k")).count() == 1)
  }

  test("aggregation pattern with having + incremental merge strategies") {
    val src = Seq(("a", 10), ("a", 5), ("b", 1)).toDF("g", "v")
    val agg = Patterns.aggregation(src, Seq("g"),
      Seq("total" -> "sum(v)", "n" -> "count(*)"), having = Some("total > 2"))
    val m = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 15L))

    val existing = Seq(("a", 100L, 1L), ("c", 7L, 2L)).toDF("g", "total", "n")
    val fresh = Seq(("a", 15L, 2L), ("b", 1L, 1L)).toDF("g", "total", "n")
    val merged = Patterns.aggregationMerge(existing, fresh, Seq("g"),
      Map("total" -> "sum", "n" -> "replace"))
    val mm = merged.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mm("a") == (115L, 2L)) // sum-combined, replace takes fresh
    assert(mm("b") == (1L, 1L))
    assert(mm("c") == (7L, 2L))   // untouched grain keeps old value
  }
}
