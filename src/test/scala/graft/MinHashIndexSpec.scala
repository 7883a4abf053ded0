package graft

import graft.operators.MinHashIndex

/** Persisted LSH index + incremental near-dup dedup. Exact duplicates
  * agree on every minhash position regardless of seeds, so exact-dup
  * assertions are deterministic; near-dup assertions use heavily
  * overlapping long texts (estimator error ±1/sqrt(64) ≈ 0.125 around a
  * true Jaccard ≈ 1, far from the 0.7 threshold). */
class MinHashIndexSpec extends SparkSpec {

  import spark.implicits._

  /** Texts with per-tag disjoint alphabets: docs with different tags share
    * almost no 5-char shingles, same-tag docs are identical. */
  private def corpusText(tag: Char): String =
    (0 until 60).map(i => s"$tag$tag${i}$tag${(i * 31) % 71}$tag").mkString(" ")

  test("dedupAgainst drops exact and near dups, keeps fresh docs") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val corpus = Seq(
      (1L, corpusText('a')), (2L, corpusText('b')), (3L, corpusText('c')))
      .toDF("id", "text")
    MinHashIndex.build(corpus, "id", "text", s"$dir/idx")
    assert(spark.read.parquet(s"$dir/idx/bands").count() == 3 * 16)
    assert(spark.read.parquet(s"$dir/idx/sigs").count() == 3)

    val batch = Seq(
      (10L, corpusText('a')),                     // exact dup of 1
      (11L, corpusText('b') + " qq ww ee"),       // near dup of 2
      (12L, corpusText('m')),
      (13L, corpusText('m')),                     // in-batch dup of 12
      (14L, corpusText('z')))
      .toDF("id", "text")
    val clean = MinHashIndex.dedupAgainst(batch, "id", "text", s"$dir/idx",
      threshold = 0.7)
    val kept = clean.select("id").as[Long].collect().toSet
    assert(!kept.contains(10L), "exact dup of indexed doc must drop")
    assert(!kept.contains(11L), "near dup of indexed doc must drop")
    assert(kept.contains(12L) || kept.contains(13L), "one in-batch copy survives")
    assert(!(kept.contains(12L) && kept.contains(13L)), "in-batch dup must collapse")
    assert(kept.contains(14L), "fresh doc must survive")
  }

  test("dedupAndUpdate appends survivors so later batches dedup against them") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx2").toString
    // first batch bootstraps the index (with in-batch dedup)
    val b0 = Seq((1L, corpusText('e')), (2L, corpusText('e'))).toDF("id", "text")
    assert(MinHashIndex.dedupAndUpdate(b0, "id", "text", s"$dir/idx").count() == 1)
    val b1 = Seq((20L, corpusText('j'))).toDF("id", "text")
    val s1 = MinHashIndex.dedupAndUpdate(b1, "id", "text", s"$dir/idx")
    assert(s1.count() == 1)
    assert(spark.read.parquet(s"$dir/idx/sigs").count() == 2)
    // the doc admitted in batch 1 now blocks its copy in batch 2
    val b2 = Seq((30L, corpusText('j')), (31L, corpusText('t'))).toDF("id", "text")
    val s2 = MinHashIndex.dedupAndUpdate(b2, "id", "text", s"$dir/idx")
    assert(s2.select("id").as[Long].collect().toSet == Set(31L))
    assert(spark.read.parquet(s"$dir/idx/sigs").count() == 3)
  }

  test("self-described schema probe equals the inference fallback") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx4").toString
    // string ids exercise the one format-variable column type
    val corpus = Seq(("d1", corpusText('a')), ("d2", corpusText('b')))
      .toDF("id", "text")
    MinHashIndex.build(corpus, "id", "text", s"$dir/idx")
    val schemaFile = java.nio.file.Paths.get(s"$dir/idx/schema.json")
    assert(java.nio.file.Files.exists(schemaFile), "build must self-describe")
    val batch = Seq(("b1", corpusText('a')), ("b2", corpusText('q')))
      .toDF("id", "text")
    val withSchema = MinHashIndex.dedupAgainst(batch, "id", "text",
      s"$dir/idx", threshold = 0.7).select("id").as[String].collect().toSet
    // a pre-schema.json index (older build) must keep working via inference
    java.nio.file.Files.delete(schemaFile)
    val fallback = MinHashIndex.dedupAgainst(batch, "id", "text",
      s"$dir/idx", threshold = 0.7).select("id").as[String].collect().toSet
    assert(withSchema == fallback && withSchema == Set("b2"))
    // append restores the self-description
    MinHashIndex.append(Seq(("d9", corpusText('z'))).toDF("id", "text"),
      "id", "text", s"$dir/idx")
    assert(java.nio.file.Files.exists(schemaFile), "append must self-describe")
  }

  test("parameter mismatch fails fast; plan has no cartesian product") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx3").toString
    val corpus = Seq((1L, corpusText('a'))).toDF("id", "text")
    MinHashIndex.build(corpus, "id", "text", s"$dir/idx")
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.dedupAgainst(corpus, "id", "text", s"$dir/idx",
        MinHashIndex.Params(numHashes = 32, bands = 16))
    }
    assert(e.getMessage.contains("incomparable"))
    intercept[IllegalArgumentException](MinHashIndex.Params(numHashes = 64, bands = 7))
    val audit = graft.core.PlanAudit.audit(
      MinHashIndex.dedupAgainst(corpus, "id", "text", s"$dir/idx"))
    assert(audit.numCartesianProducts == 0)
  }
}
