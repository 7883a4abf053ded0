package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing}

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("packSequences lays documents end-to-end in id order") {
    val docs = Seq((1L, 1000L), (2L, 1500L), (3L, 100L), (4L, 2048L), (5L, 1L))
      .toDF("id", "toks")
    val out = Packing.packSequences(docs, "id", "toks", budget = 2048)
      .orderBy("id")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)].collect()
    // starts: 0, 1000, 2500, 2600, 4648
    assert(out === Array(
      (1L, 0L, 0L),      // starts sequence 0 at offset 0
      (2L, 0L, 1000L),   // still in sequence 0, spills into 1
      (3L, 1L, 452L),    // 2500 -> seq 1 offset 452
      (4L, 1L, 552L),    // spans into seq 2
      (5L, 2L, 552L)))   // 4648 -> seq 2 offset 552
  }

  test("packSequences fails fast on null ids instead of dropping rows") {
    val withNull = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
      .toDF("id", "toks")
    val e = intercept[Exception] {
      Packing.packSequences(withNull, "id", "toks", budget = 64).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("null id"),
      s"unexpected: ${e.getMessage}")
    // string-id fallback path enforces the same contract
    val strNull = Seq((Some("a"), 10L), (None, 20L)).toDF("id", "toks")
    intercept[Exception] {
      Packing.packSequences(strNull, "id", "toks", budget = 64).collect()
    }
  }

  test("packSequences matches a single-reducer global window (oracle shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCountWs(col("text")).cast("long").as("n"))
    val fast = Packing.packSequences(docs, "doc_id", "n", 512)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val slow = docs
      .withColumn("_start", sum($"n").over(w) - $"n")
      .select($"doc_id", $"n", floor($"_start" / 512).as("seq_id"),
        ($"_start" % 512).as("seq_offset"))
    assert(fast.count() == docs.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("packSequences nulls count as zero tokens; empty frame is fine") {
    val docs = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "toks")
    val out = Packing.packSequences(docs, "id", "toks", 8)
      .orderBy("id").select("seq_id", "seq_offset").as[(Long, Long)].collect()
    assert(out === Array((0L, 0L), (1L, 2L), (1L, 2L)))
    assert(Packing.packSequences(docs.limit(0), "id", "toks", 8).count() == 0)
  }

  test("packSequences: non-numeric order keys use the exact fallback path") {
    val docs = Seq(("a", 1000L), ("b", 1500L), ("c", 100L)).toDF("id", "toks")
    val out = Packing.packSequences(docs, "id", "toks", 2048)
      .orderBy("id").select("seq_id", "seq_offset").as[(Long, Long)].collect()
    assert(out === Array((0L, 0L), (0L, 1000L), (1L, 452L)))
  }

  test("packingStats: total sequences from one aggregate") {
    val docs = Seq((1L, 1000L), (2L, 1500L), (3L, 100L)).toDF("id", "toks")
    val r = Packing.packingStats(docs, "toks", 2048).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("total_tokens") == 2600L)
    assert(r.getAs[Long]("n_sequences") == 2L)
  }

  test("segmentDedup keeps the globally-first occurrence of each segment") {
    val docs = Seq(
      (1L, "alpha\n\nshared\n\nbeta"),
      (2L, "shared\n\ngamma"),      // 'shared' already seen in doc 1
      (3L, "alpha\n\nshared"))      // fully duplicate -> drops out
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out === Array(
      (1L, "alpha\n\nshared\n\nbeta"),
      (2L, "gamma")))
  }

  test("segmentDedup ties within one document keep the earliest position") {
    val docs = Seq((7L, "x\n\nx\n\ny")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text").as[(Long, String)].collect()
    assert(out === Array((7L, "x\n\ny")))
  }

  test("weightedMix: output matches target proportions, limiting source intact") {
    import graft.operators.Sampling
    // src a: 100 rows, b: 100, c: 50; targets 50/30/20
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 200).map(i => (i.toLong, "b")) ++
      (201 to 250).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "src")
    val out = Sampling.weightedMix(df, "src", Seq("id"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // limiting source: a (100/0.5=200 < b 333, c 250) -> scale 200
    assert(bySrc == Map("a" -> 100L, "b" -> 60L, "c" -> 40L))
    // deterministic: repartitioned input yields the identical sample
    val again = Sampling.weightedMix(df.repartition(7), "src", Seq("id"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // unknown sources drop; empty intersection yields empty output
    assert(Sampling.weightedMix(df, "src", Seq("id"), Map("zzz" -> 1.0)).count() == 0)
    // int-coded source column: cast-to-string comparison, no ClassCastException
    val intSrc = ((1 to 40).map(i => (i.toLong, 1)) ++
      (41 to 60).map(i => (i.toLong, 2))).toDF("id", "src")
    val mixed = Sampling.weightedMix(intSrc, "src", Seq("id"),
      Map("1" -> 0.5, "2" -> 0.5))
    val byIntSrc = mixed.groupBy("src").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byIntSrc == Map(1 -> 20L, 2 -> 20L)) // limiting source 2: scale 40
  }

  test("temperatureMix: alpha-sampling boosts low-resource shares, alpha=1 is identity") {
    import graft.operators.Sampling
    // big: 800 rows, small: 100 -> natural shares 8/9 vs 1/9
    val rows = (1 to 800).map(i => (i.toLong, "big")) ++
      (801 to 900).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "src")
    // alpha = 1: natural proportions -> every source is limiting, all kept
    assert(Sampling.temperatureMix(df, "src", Seq("id"), alpha = 1.0).count() == 900)
    // alpha = 0.3: small's target share rises above its natural 1/9
    val out = Sampling.temperatureMix(df, "src", Seq("id"), alpha = 0.3)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallShare = bySrc("small").toDouble / (bySrc("small") + bySrc("big"))
    assert(smallShare > 1.0 / 9.0 + 0.05, s"share $smallShare")
    // small is the limiting source (boosted target > natural) -> intact
    assert(bySrc("small") == 100L)
    // definitionally equal to weightedMix on the driver-computed proportions
    val z = math.pow(800, 0.3) + math.pow(100, 0.3)
    val byHand = Sampling.weightedMix(df, "src", Seq("id"),
      Map("big" -> math.pow(800, 0.3) / z, "small" -> math.pow(100, 0.3) / z))
    assert(out.exceptAll(byHand).isEmpty && byHand.exceptAll(out).isEmpty)
  }

  test("weightedMixByTokens: output token mass matches targets, boundary doc kept") {
    import graft.operators.Sampling
    // source a: 100 docs x 10 tokens (1000), b: 50 docs x 40 tokens (2000)
    val rows = (1 to 100).map(i => (i.toLong, "a", 10L)) ++
      (101 to 150).map(i => (i.toLong, "b", 40L))
    val df = rows.toDF("id", "src", "toks")
    val out = Sampling.weightedMixByTokens(df, "src", "toks", Seq("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    val byTok = out.groupBy("src").agg(sum($"toks").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // limiting source a: scale = 1000/0.5 = 2000 -> budgets a=1000, b=1000
    assert(byTok("a") == 1000L) // all of a
    assert(byTok("b") == 1000L) // exactly 25 of the 40-token docs
    // boundary-doc rule: a 3-doc source with budget cutting mid-doc keeps
    // the crossing doc (overshoot < one doc)
    val tiny = Seq((1L, "x", 7L), (2L, "x", 7L), (3L, "x", 7L),
      (4L, "y", 10L)).toDF("id", "src", "toks")
    val cut = Sampling.weightedMixByTokens(tiny, "src", "toks", Seq("id"),
      Map("x" -> 0.5, "y" -> 0.5))
    val xTok = cut.filter($"src" === "x").agg(sum($"toks")).head().getLong(0)
    // scale = min(21/0.5, 10/0.5) = 20 -> budget x = 10 -> keep 2 docs (14)
    assert(xTok == 14L, s"crossing doc must be kept, got $xTok tokens")
    // deterministic under repartitioning
    val again = Sampling.weightedMixByTokens(df.repartition(7), "src", "toks",
      Seq("id"), Map("a" -> 0.5, "b" -> 0.5))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // bucketed running-sum windows, never a bare per-source window
    val windows = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.size == 2 &&
      w.partitionSpec.exists(_.toString.contains("_bkt")), s"${w.partitionSpec}"))
  }

  test("weightedMix: no per-source funnel — every rank window is bucketed") {
    import graft.operators.Sampling
    // 2M-doc mix: keep 10% of a / all of b — the b side pins the scale
    val big = spark.range(2000000)
      .select($"id", when($"id" % 10 === 0, "b").otherwise("a").as("src"))
    val out = Sampling.weightedMix(big, "src", Seq("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    // sparkPlan, not executedPlan: AQE hides subtrees pre-execution
    val windows = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    // each window partitions by (source, bucket) — never source alone, so
    // no source's kept set funnels through a single reducer
    windows.foreach { w =>
      assert(w.partitionSpec.size == 2,
        s"rank window must be bucket-partitioned, got ${w.partitionSpec}")
      assert(w.partitionSpec.exists(_.toString.contains("_bkt")))
    }
    // exact proportions survive the bucketed reconstruction at 2M rows
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 200000L, "b" -> 200000L))
  }

  test("incrementalExactDedup: batch vs seen set, within-batch, fingerprint growth") {
    val corpus = Seq((1L, "already seen"), (2L, "also seen")).toDF("doc_id", "text")
    val seen = Dedup.newFingerprints(corpus, "text")
    assert(seen.count() == 2)

    val batch = Seq(
      (10L, "brand new"),
      (11L, "already  SEEN"),    // normalizes to a seen fingerprint
      (12L, "brand new"),        // within-batch dup of 10
      (13L, "another fresh one"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(batch, "doc_id", "text", seen)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(10L, 13L))

    // appending the accepted batch's fingerprints blocks a re-ingest
    val grown = seen.union(Dedup.newFingerprints(
      batch.filter($"doc_id".isin(10L, 13L)), "text")).distinct()
    val again = Dedup.incrementalExactDedup(batch, "doc_id", "text", grown)
    assert(again.count() == 0)
  }

  test("epochsMix: whole epochs exact, fractional epochs hash-deterministic") {
    import graft.operators.Sampling
    val docs = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val out = Sampling.epochsMix(docs, "id", "src",
      Map("s0" -> 3.0, "s1" -> 1.5, "s2" -> 0.0), defaultEpochs = 1.0)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("s0") == 3000L)                  // exactly 3 epochs
    assert(!bySrc.contains("s2"))                 // zero epochs drop the source
    assert(bySrc("s3") == 1000L)                  // default 1.0 untouched
    // fractional: expected 1500, hash-binomial around it
    assert(math.abs(bySrc("s1") - 1500L) < 150, s"s1 -> ${bySrc("s1")}")
    // every whole-epoch doc appears with contiguous epoch_idx 0..n-1
    val idxs = out.filter($"src" === "s0" && $"id" === 0L)
      .select("epoch_idx").collect().map(_.getInt(0)).sorted.toSeq
    assert(idxs == Seq(0, 1, 2))
    // bit-for-bit reproducible
    val again = Sampling.epochsMix(docs, "id", "src",
      Map("s0" -> 3.0, "s1" -> 1.5, "s2" -> 0.0))
    assert(again.exceptAll(out).count() == 0 && out.exceptAll(again).count() == 0)
    // plan shape: projection + generate only, no shuffle
    assert(graft.core.PlanAudit.audit(out).numExchanges == 0)
  }
}
