package graft

import org.apache.spark.sql.functions.{avg, col, max, min}

import graft.core.{Planner, Pipeline, Story, YamlConfig}

/** The shipped example project must plan clean and run green end-to-end. */
class ExamplesSpec extends SparkSpec {

  private def loadExample(name: String = "star_schema"): (String, String) = {
    val out = java.nio.file.Files.createTempDirectory("example").toString
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"examples/$name/project.yaml")), "UTF-8")
      .replace("${OUT}", out)
    (yaml, out)
  }

  test("manufacturing example plans clean and runs green end-to-end") {
    val (yaml, out) = loadExample("manufacturing")
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    // the reference guide's refrigeration cycle: vapor at the evaporator,
    // SUBCOOLED LIQUID at the condenser outlet, physically-plausible COP
    val cycle = spark.read.parquet(s"$out/gold/refrigeration")
    assert(cycle.count() > 0)
    val phases = cycle.select("evap_phase", "cond_out_phase").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(phases == Set(("vapor", "liquid")), phases.toString)
    val cop = cycle.agg(min(col("cop")), max(col("cop"))).head()
    assert(cop.getDouble(0) > 0.5 && cop.getDouble(1) < 20, cop.toString)
    // latent-heat-scale evaporator duty (R134a ~ 150-200 kJ/kg)
    val duty = cycle.agg(avg(col("evaporator_duty_kj_kg"))).head().getDouble(0)
    assert(duty > 100 && duty < 260, s"evaporator duty: $duty")

    // IF97 superheat is positive; psychrometric wet bulb below dry bulb;
    // latent heat at ~1 MPa is ~2000 kJ/kg and shrinks with pressure
    val boiler = spark.read.parquet(s"$out/gold/boiler")
    assert(boiler.agg(min(col("superheat_c"))).head().getDouble(0) >= 0)
    val latent = boiler.agg(avg(col("latent_kj_kg"))).head().getDouble(0)
    assert(latent > 1900 && latent < 2100, s"latent heat: $latent")
    val air = spark.read.parquet(s"$out/gold/plant_air")
    assert(air.filter(col("wet_bulb") > col("air_temp_c")).count() == 0)
    assert(spark.read.parquet(s"$out/gold/phases").count() > 0)
  }

  test("gdpr_erasure example: DV-commit erasure plans clean and runs green") {
    val (yaml, out) = loadExample("gdpr_erasure")
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    val root = s"$out/delta/customers"
    val target = graft.sources.DeltaLog.read(spark, root)
    val total = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    val erased = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .filter("c_custkey % 97 = 0").count()
    assert(erased > 0)
    assert(target.count() == total - erased)
    assert(target.filter("c_custkey % 97 = 0").count() == 0)
    // the erasure moved bitmaps, not files: the seed's data files are
    // all still the live adds, now carrying deletion vectors
    val snap = graft.sources.DeltaLog.snapshot(spark, root)
    assert(snap.version == 1L, "erasure must be ONE commit on the seed")
    assert(snap.files.exists(_.deletionVector.isDefined))
    // audit snapshot matches the post-erasure target
    assert(spark.read.parquet(s"$out/audit/post_erasure").count() ==
      total - erased)
  }

  test("cdc_upsert example: file-scoped Delta merge plans clean and runs green") {
    val (yaml, out) = loadExample("cdc_upsert")
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    val root = s"$out/delta/orders"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val total = orders.count()
    val updated = orders.filter("o_orderkey % 50 = 0").count()
    val inserted = orders.filter("o_orderkey % 500 = 0").count()
    assert(updated > 0 && inserted > 0)
    val target = graft.sources.DeltaLog.read(spark, root)
    assert(target.count() == total + inserted)
    assert(target.filter("o_orderkey >= 90000000").count() == inserted)
    // the merge was ONE commit of bitmaps + new files on the seed:
    // matched rows carry vectors, the seed's data files all survive
    val snap = graft.sources.DeltaLog.snapshot(spark, root, versionAsOf = Some(1L))
    assert(snap.files.exists(_.deletionVector.isDefined))
    val seed = graft.sources.DeltaLog.snapshot(spark, root, versionAsOf = Some(0L))
    seed.files.foreach(a => assert(
      new java.io.File(root, a.path).exists(), s"seed file ${a.path} rewritten"))
    // CDF attributes the merge faithfully: replaced rows are UPDATE
    // pre/postimage pairs, brand-new keys are inserts
    val ch = graft.sources.DeltaLog.changes(spark, root, 1L, Some(1L))
    assert(ch.filter("_change_type = 'update_preimage'").count() == updated)
    assert(ch.filter("_change_type = 'update_postimage'").count() == updated)
    assert(ch.filter("_change_type = 'insert'").count() == inserted)
    assert(spark.read.parquet(s"$out/audit/post_merge").count() == total + inserted)

    // the evolved batch widened the schema IN its merge commit (one
    // more version, o_channel appended); pre-existing rows read null
    val after = graft.sources.DeltaLog.snapshot(spark, root)
    assert(after.version == 2L, s"evolution took ${after.version - 1} commits")
    assert(after.schema.fieldNames.last == "o_channel")
    assert(target.filter("o_orderkey % 100 = 0 and o_channel is not null")
      .count() == orders.filter("o_orderkey % 100 = 0").count())
    assert(target.filter("o_orderkey % 50 = 0 and o_orderkey % 100 <> 0")
      .filter("o_channel is not null").count() == 0)
  }

  test("lakehouse_stream example: delta source -> iceberg sink runs green") {
    val (yaml, out) = loadExample("lakehouse_stream")
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter("o_totalprice > 0")
    // the Iceberg silver table drained the whole bronze snapshot once
    val silver = graft.sources.IcebergSource.read(spark, s"$out/silver/orders")
    assert(silver.count() == orders.count())
    // gold aggregates the Iceberg table
    val gold = spark.read.parquet(s"$out/gold/status")
    val expect = orders.groupBy("o_orderstatus").count().count()
    assert(gold.count() == expect)
    assert(gold.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == orders.count())
  }

  test("star_schema example plans with zero diagnostics") {
    val (yaml, _) = loadExample()
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))
    assert(plan.errors.isEmpty)
    val p = plan.plan.get
    assert(p.nodes.map(_.kind).toSet ==
      Set("source", "transform", "generator", "semantic"))
    assert(p.layers.size >= 3) // bronze -> silver -> gold -> semantic
  }

  test("star_schema example runs green end-to-end") {
    val (yaml, out) = loadExample()
    val cfg = YamlConfig.loadPipeline(yaml)
    val results = Pipeline.run(spark, cfg)
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    // every declared sink materialized
    Seq("bronze/customers", "bronze/orders", "silver/dim_customer",
      "silver/dim_date", "gold/fact_orders", "gold/monthly_metrics")
      .foreach { p =>
        assert(spark.read.parquet(s"$out/$p").count() > 0, s"empty sink $p")
      }

    // fact rows carry resolved surrogate keys; gate passed (no abort)
    val fact = spark.read.parquet(s"$out/gold/fact_orders")
    assert(fact.columns.contains("customer_sk"))
    assert(fact.count() == 1500)

    // semantic node produced per-month metrics with the derived AOV
    val metrics = spark.read.parquet(s"$out/gold/monthly_metrics")
    assert(metrics.columns.toSet == Set("month", "order_count", "revenue", "aov"))
    assert(metrics.count() > 70) // ~80 months in 1992-1998

    // the run story renders
    val html = Story.generateHtml(cfg, results, "example-run", 0L)
    assert(html.contains("fact_orders") && html.contains("success"))

    // scale shape: the fact's dim lookups broadcast (dims are small), so
    // the star join costs no shuffle of the fact side. The node's df is
    // now a lineage-truncating sink read-back — audit the COMPUTE plan
    val factR = results("fact_orders")
    val audit = graft.core.PlanAudit.audit(factR.lineageDf.getOrElse(factR.df))
    assert(audit.numBroadcastJoins >= 1,
      s"fact dim lookups should broadcast, got $audit")
    assert(audit.numSortMergeJoins == 0,
      s"no sort-merge join expected in the star lookup, got $audit")
  }

  test("training_data curation example plans clean and runs green") {
    val (yaml, out) = loadExample("training_data")
    val plan = Planner.plan(yaml)
    assert(plan.valid, plan.diagnostics.mkString("; "))

    val results = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    // the crawl drop is real WET: gzip members, conversion records, and
    // the ingested frame row-matches the source corpus
    val wetFiles = new java.io.File(s"$out/crawl/wet").listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(wetFiles.nonEmpty)
    val wet = graft.sources.WarcSource.wetDocuments(spark, s"$out/crawl/wet")
    assert(wet.count() ==
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())

    val scored = spark.read.parquet(s"$out/clean/scored")
    assert(scored.columns.contains("gopher_pass"))
    assert(scored.columns.contains("lang")) // metadata joined back on
    assert(scored.filter("NOT gopher_pass").count() == 0) // junk quarantined

    val packed = spark.read.parquet(s"$out/train/packed")
    assert(packed.columns.toSet.intersect(Set("seq_id", "seq_offset")).size == 2)
    // dedup is a subset of scored; packed matches deduped row-for-row
    val deduped = spark.read.parquet(s"$out/clean/deduped")
    assert(packed.count() == deduped.count() && deduped.count() <= scored.count())

    // the near-dup branch: one representative per LSH-pair component —
    // only docs that appear in a candidate pair may be removed
    val nearDeduped = spark.read.parquet(s"$out/clean/near_deduped")
    val pairs = spark.read.parquet(s"$out/clean/near_dup_pairs")
    assert(nearDeduped.count() <= deduped.count() && nearDeduped.count() >= 1)
    val paired = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val removedUnpaired = deduped.select("doc_id")
      .except(nearDeduped.select("doc_id"))
      .join(paired, Seq("doc_id"), "left_anti").count()
    assert(removedUnpaired == 0, s"$removedUnpaired unpaired docs removed")

    // crawl gate: the first run bootstraps the index from this corpus —
    // in-batch near-dups collapse, survivors are indexed for later batches
    val gate = spark.read.parquet(s"$out/clean/crawl_gate")
    assert(gate.count() >= 1 && gate.count() <= nearDeduped.count())
    assert(spark.read.parquet(s"$out/index/minhash/sigs").count() == gate.count())

    val stats = spark.read.parquet(s"$out/train/stats").collect()(0)
    assert(stats.getAs[Long]("n_sequences") >= 1)
    assert(stats.getAs[Long]("total_tokens") > 0)

    // dataset card: one row per language, dup ratio zero post-dedup
    val card = spark.read.parquet(s"$out/train/dataset_card")
    assert(card.columns.contains("dup_ratio") && card.count() >= 1)
    assert(card.filter("dup_ratio > 0").count() == 0)

    // quality audit branch: every doc scored with a [0,1] probability,
    // and the en-labeled reference slice scores higher on average
    val quality = spark.read.parquet(s"$out/quality/scored")
    assert(quality.count() == scored.count())
    val probs = quality.agg(min("quality_prob"), max("quality_prob")).collect()(0)
    assert(probs.getDouble(0) >= 0.0 && probs.getDouble(1) <= 1.0)
    val byLang = quality.groupBy(col("lang") === "en")
      .agg(avg("quality_prob")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} should exceed non-en ${byLang(false)}")

    // span cleanup never grows a doc; the DSIR selection keeps <= 150
    // docs, each with its score and the joined-back text
    val spanned = spark.read.parquet(s"$out/clean/span_cleaned")
    assert(spanned.count() == gate.count())
    val selected = spark.read.parquet(s"$out/clean/domain_selected")
    assert(selected.count() <= 150 && selected.count() >= 1)
    assert(selected.columns.toSet.intersect(
      Set("doc_id", "dsir_logratio", "text")).size == 3)

    // the example's declarative transformer tests run green via graft.Test
    assert(graft.Test.mainExit(Array("examples/training_data/tests")) == 0)
  }

  test("streaming example: dedup + windowed counts drain to a batch consumer") {
    import spark.implicits._
    val (yaml, out) = loadExample("streaming")
    assert(Planner.plan(yaml).valid)

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (t("2026-01-01 00:00:10"), 1L, "click"),
      (t("2026-01-01 00:00:20"), 1L, "click"), // dup event_id: dropped
      (t("2026-01-01 00:00:40"), 2L, "view"),
      (t("2026-01-01 00:01:10"), 3L, "click"),
      // late watermark-closer so append-mode windows emit
      (t("2026-01-01 00:30:00"), 99L, "heartbeat"))
      .toDF("ts", "event_id", "kind")
      .write.mode("overwrite").parquet(s"$out/in")

    val results = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    val failed = results.values.filter(_.failure.isDefined)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failure.get}").mkString("; "))

    val counts = spark.read.parquet(s"$out/out/minute_counts")
      .selectExpr("kind", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.get("click").contains(1L) || counts("click") == 1L)
    assert(counts("view") == 1L)
    val top = spark.read.parquet(s"$out/out/top_kinds")
    assert(top.count() >= 2)
  }
}
