package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Similarity

/**
 * Quantifies the recall of the LSH-approximate operators against
 * brute-force ground truth at sf0.01 — turns the "rows-only" declared
 * queries into measured approximations (VERDICT r1 ask #6). Bounds are
 * set below measured values (see COVERAGE.md for the measured numbers).
 */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def recall(truth: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else truth.intersect(got).size.toDouble / truth.size

  test("lshTopK recall vs brute-force top-k on sf0.01 embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter("vec_id < 20")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5))
    val lsh = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5, dim = 64))
    val r = recall(truth, lsh)
    info(f"lshTopK recall@5, 20 queries: $r%.3f (${truth.size} truth pairs)")
    assert(r >= 0.90, f"lshTopK recall $r%.3f below bound 0.90 (multi-probe)")
    val ivf = pairs(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5))
    val ri = recall(truth, ivf)
    info(f"ivfTopK recall@5, 20 queries: $ri%.3f")
    // Lloyd-refined centroids + 3-cell spilled assignment: measured 0.96
    // (0.66 bare, 0.88 at spill=2 — sweep table in the ivfTopK scaladoc)
    assert(ri >= 0.90, f"ivfTopK recall $ri%.3f below bound 0.90")
  }

  test("hyperplaneSignature supports the full 64-bit long (bands=16, rows=4)") {
    // bits = 64 fills the long exactly — plane 63 is the sign bit, so
    // signatures may be NEGATIVE; banding must still bucket identically
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
    val sigs = emb.select(
      Similarity.hyperplaneSignature(col("embedding"), dim = 64, bits = 64).as("sig"))
    val rows = sigs.collect().map(_.getLong(0))
    assert(rows.exists(_ < 0), "with 64 planes some signature should set the sign bit")
    // a vector agrees with itself on every band regardless of sign
    val self = emb.limit(5)
      .select(col("vec_id"),
        Similarity.hyperplaneSignature(col("embedding"), 64, 64).as("s1"),
        Similarity.hyperplaneSignature(col("embedding"), 64, 64).as("s2"))
      .filter(col("s1") =!= col("s2")).count()
    assert(self == 0)
    // end-to-end: lshTopK at a 64-bit budget still meets the recall bound
    val queries = emb.filter("vec_id < 10")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5))
    val lsh = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5, dim = 64, bits = 64, bands = 16))
    val r = recall(truth, lsh)
    info(f"lshTopK bits=64 recall@5: $r%.3f")
    assert(r >= 0.85, f"64-bit lshTopK recall $r%.3f below 0.85")
  }

  test("IVF index reuse and save/load roundtrip match the direct path") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter("vec_id < 20")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = pairs(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5))
    val index = Similarity.buildIvfIndex(emb, "vec_id", "embedding")
    assert(pairs(Similarity.ivfTopKIndexed(index, queries, "qid", "qv", 5)) == direct)
    // second batch from the SAME index — no rebuild
    val q2 = emb.filter("vec_id >= 20 AND vec_id < 30")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch2 = pairs(Similarity.ivfTopKIndexed(index, q2, "qid", "qv", 5))
    assert(batch2.nonEmpty && batch2.forall { case (q, _) => q >= 20 && q < 30 })
    // persisted index serves identically after load
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    index.save(s"$dir/idx")
    val loaded = Similarity.IvfIndex.load(spark, s"$dir/idx")
    assert(loaded.idCol == "vec_id" && loaded.vecCol == "embedding")
    assert(pairs(Similarity.ivfTopKIndexed(loaded, queries, "qid", "qv", 5)) == direct)
    // nprobe stays a query-time knob: narrower probe is a subset-ish cheap path
    assert(pairs(Similarity.ivfTopKIndexed(loaded, queries, "qid", "qv", 5,
      nprobe = 4)).size == direct.size)
  }

  test("IVF-PQ: recall bound, compact cells, ADC fidelity, save/load roundtrip") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter("vec_id < 20")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5))
    // ksub=32: the training sample is the full 500-vector corpus here.
    // m=16 (dsub=4): near-uniform random vectors are PQ's worst case —
    // no correlated structure for a coarse subspace to exploit — so this
    // test uses finer subspaces; real embedding corpora sit far above
    // this floor at the same m.
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", dim = 64,
      m = 16, ksub = 32)
    // cells carry m-byte codes + a norm — never the 64-float vector
    assert(index.cells.columns.toSet == Set("_cell", "vec_id", "_codes", "_norm"))
    val code = index.cells.select("_codes").head().getAs[Array[Byte]](0)
    assert(code.length == 16)
    val pq = pairs(Similarity.ivfPqTopKIndexed(index, queries, "qid", "qv", 5,
      refineFactor = 8))
    val r = recall(truth, pq)
    info(f"ivfPqTopK recall@5 (m=16, ksub=32, refine=8): $r%.3f")
    assert(r >= 0.85, f"ivfPqTopK recall $r%.3f below bound 0.85")
    // Pure-ADC ranking (refineFactor=0) is the noise floor: quantization
    // error reorders near-ties, which uniform-random vectors are full of
    // (measured 0.53 here; the refined path above is the real contract —
    // the bound just proves ADC correlates with the exact dot, not that
    // it replaces it)
    val adcOnly = pairs(Similarity.ivfPqTopKIndexed(index, queries, "qid", "qv", 5,
      refineFactor = 0))
    val rAdc = recall(truth, adcOnly)
    info(f"ivfPqTopK pure-ADC recall@5: $rAdc%.3f")
    assert(rAdc >= 0.40, f"pure-ADC recall $rAdc%.3f below 0.40")
    // persisted index serves identically after load
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    index.save(s"$dir/idx")
    val loaded = Similarity.IvfPqIndex.load(spark, s"$dir/idx")
    assert(loaded.codebook.m == 16 && loaded.codebook.dim == 64
      && loaded.codebook.ksub == 32)
    assert(pairs(Similarity.ivfPqTopKIndexed(loaded, queries, "qid", "qv", 5,
      refineFactor = 8)) == pq)
    // append: new vectors enter through the frozen codebooks and are found
    val shifted = emb.filter("vec_id < 5")
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    Similarity.IvfPqIndex.append(spark, s"$dir/idx", shifted)
    val reloaded = Similarity.IvfPqIndex.load(spark, s"$dir/idx")
    val probeSelf = shifted.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val found = pairs(Similarity.ivfPqTopKIndexed(reloaded, probeSelf, "qid", "qv", 1))
    // each appended vector's nearest neighbor is its original twin
    assert(found == (0L until 5L).map(i => (i + 10000, i)).toSet)
  }

  test("IVF-PQ shared-sample build trains the same codebooks and seeds") {
    // r18 optimization: buildIvfPqIndex draws ONE xxhash64(id)-ordered
    // sample for both the IVF seeds and the PQ training sample (it ran
    // two TakeOrdered jobs before). The training inputs must be the
    // exact rows the standalone paths draw, so codebooks and centroids
    // are identical.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", dim = 64,
      m = 16, ksub = 32)
    val cbAlone = Similarity.trainPqCodebook(emb, "vec_id", "embedding",
      dim = 64, m = 16, ksub = 32)
    assert(idx.codebook.books.map(_.map(_.toSeq).toSeq).toSeq ==
      cbAlone.books.map(_.map(_.toSeq).toSeq).toSeq)
    val ivfAlone = Similarity.buildIvfIndex(emb, "vec_id", "embedding")
    assert(idx.centroids.toSeq == ivfAlone.centroids.toSeq)
  }

  test("LSH index save/load roundtrip matches the direct path") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter("vec_id < 20")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5, dim = 64))
    val index = Similarity.buildLshIndex(emb, "vec_id", "embedding", dim = 64)
    assert(pairs(Similarity.lshTopKIndexed(index, queries, "qid", "qv", 5)) == direct)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    index.save(s"$dir/idx")
    val loaded = Similarity.LshIndex.load(spark, s"$dir/idx")
    // the hash family travels with the index — a probe can't drift
    assert(loaded.bits == 48 && loaded.bands == 12 && loaded.seed == 42L
      && loaded.dim == 64 && loaded.idCol == "vec_id")
    assert(pairs(Similarity.lshTopKIndexed(loaded, queries, "qid", "qv", 5)) == direct)
    // probes stays a query-time knob on the same persisted index
    assert(pairs(Similarity.lshTopKIndexed(loaded, queries, "qid", "qv", 5,
      probes = 0)).nonEmpty)
  }

  test("index append: LSH equals full rebuild; IVF finds appended vectors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (first, second) = (emb.filter("vec_id < 250"), emb.filter("vec_id >= 250"))
    val queries = emb.filter("vec_id < 20")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("idxapp").toString

    // LSH banding is deterministic under the saved family, so build(half)
    // + append(half) serves BYTE-IDENTICAL results to build(full)
    Similarity.buildLshIndex(first, "vec_id", "embedding", dim = 64)
      .save(s"$dir/lsh")
    Similarity.LshIndex.append(spark, s"$dir/lsh", second)
    val served = pairs(Similarity.lshTopKIndexed(
      Similarity.LshIndex.load(spark, s"$dir/lsh"), queries, "qid", "qv", 5))
    val full = pairs(Similarity.lshTopKIndexed(
      Similarity.buildLshIndex(emb, "vec_id", "embedding", dim = 64),
      queries, "qid", "qv", 5))
    assert(served == full)

    // IVF: appended vectors assign to the EXISTING centroids and must be
    // retrievable — a query identical to an appended vector finds it
    Similarity.buildIvfIndex(first, "vec_id", "embedding").save(s"$dir/ivf")
    Similarity.IvfIndex.append(spark, s"$dir/ivf", second)
    val loaded = Similarity.IvfIndex.load(spark, s"$dir/ivf")
    assert(loaded.assignSpill == 3) // survives the roundtrip
    // offset qids: the serving path drops id == qid self-matches
    val probe = second.limit(5)
      .select((col("vec_id") + 1000000L).as("qid"), col("embedding").as("qv"))
    val hits = Similarity.ivfTopKIndexed(loaded, probe, "qid", "qv", 1)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
    assert(hits.length == 5 &&
      hits.forall(r => r.getLong(0) - 1000000L == r.getLong(1)),
      s"appended vectors not retrieved: ${hits.mkString(",")}")
  }

  test("minhashLshPairs candidate recall vs exact-Jaccard pairs on documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter("doc_id < 250")
      .select(col("doc_id").cast("long"), col("text")).cache()
    // brute-force ground truth: 5-char-shingle Jaccard >= 0.5 over all pairs
    val sh = docs.select(col("doc_id"), Dedup.charShingles(col("text"), 5).as("_sh"))
    val l = sh.select(col("doc_id").as("a"), col("_sh").as("_sha"))
    val r0 = sh.select(col("doc_id").as("b"), col("_sh").as("_shb"))
    val truth = l.crossJoin(r0).filter(col("a") < col("b"))
      .withColumn("_j", Dedup.jaccard(col("_sha"), col("_shb")))
      .filter(col("_j") >= 0.5)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.nonEmpty, "degenerate test: no true near-dup pairs in subset")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val rec = recall(truth, lsh)
    info(f"minhashLshPairs recall at J>=0.5: $rec%.3f (${truth.size} truth pairs)")
    assert(rec >= 0.80, f"minhash recall $rec%.3f below bound 0.80")
    docs.unpersist()
    ()
  }

  test("simhashPairs pigeonhole blocking has recall 1.0 (exact by construction)") {
    // within Hamming <= 3, at least one 16-bit quarter must match — so the
    // blocked+verified output must EQUAL the brute-force pair set
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter("doc_id < 300")
      .select(col("doc_id").cast("long"), col("text")).cache()
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("_sh"))
    val l = sigs.select(col("doc_id").as("a"), col("_sh").as("_sha"))
    val r0 = sigs.select(col("doc_id").as("b"), col("_sh").as("_shb"))
    val truth = l.crossJoin(r0).filter(col("a") < col("b"))
      .withColumn("_h", Dedup.hammingDistance(col("_sha"), col("_shb")))
      .filter(col("_h") <= 3)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text")
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == truth, // exact equality: recall AND precision 1.0
      s"missing=${truth.diff(got).take(3)} extra=${got.diff(truth).take(3)}")
    docs.unpersist()
    ()
  }

  test("embeddingNearDupPairs recall vs brute-force cosine threshold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter("vec_id < 800")
      .select(col("vec_id").cast("long"), col("embedding")).cache()
    val l = emb.select(col("vec_id").as("a"), col("embedding").as("_va"))
    val r0 = emb.select(col("vec_id").as("b"), col("embedding").as("_vb"))
    val truth = l.crossJoin(r0).filter(col("a") < col("b"))
      .withColumn("_c", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("_c") >= 0.25)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.nonEmpty)
    // small-corpus dispatch: stats fit the broadcast bound, so the default
    // path is the exact brute force — output must EQUAL the truth set
    val dispatched = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25)
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(dispatched == truth,
      s"brute dispatch diverged: missing=${truth.diff(dispatched).take(3)} " +
        s"extra=${dispatched.diff(truth).take(3)}")
    // banded LSH path (forced): the corpus-scale plan, bounded recall
    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25, bruteForceBytes = 0L)
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth).take(3)}")
    val rec = recall(truth, got)
    info(f"embeddingNearDupPairs banded recall at cos>=0.25: $rec%.3f (${truth.size} truth)")
    assert(rec >= 0.85, f"embedding near-dup recall $rec%.3f below bound 0.85")
    // int8 pre-verify (opt-in): must not change the banded output at the
    // default margin
    val q8 = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25, bruteForceBytes = 0L,
      quantizedPreVerify = true)
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(q8 == got,
      s"int8 pre-verify changed the pair set: missing=${got.diff(q8).take(3)}")
    emb.unpersist()
    ()
  }

  test("imageNearDupPairs recall on generated resize/recompress twins") {
    import java.awt.image.BufferedImage
    import graft.functions.Multimodal
    // 24 distinct block-pattern images; each gets a resized + JPEG-
    // recompressed twin (id + 1000). Ground truth = the 24 twin pairs.
    def pattern(seed: Int, w: Int, h: Int): BufferedImage = {
      val vals = new scala.util.Random(seed).shuffle((0 until 64).toList)
        .map(i => 12 + i * 3)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = vals((y * 8 / h) * 8 + (x * 8 / w))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def jpegOf(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    def pngOf(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val rows = (0 until 24).flatMap { i =>
      Seq((i.toLong, pngOf(pattern(i, 64, 64)), "image/png"),
        (i + 1000L, jpegOf(pattern(i, 80, 80)), "image/jpeg"))
    }
    val media = Multimodal.asMedia(
      spark.createDataFrame(rows).toDF("id", "bytes", "mime"),
      "id", "bytes", "mime")
    val feats = Multimodal.extractFeatures(media, embeddingDim = 64).cache()
    val truth = (0 until 24).map(i => (i.toLong, i + 1000L)).toSet
    val got = Multimodal.imageNearDupPairs(feats, maxHamming = 5)
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val rec = recall(truth, got)
    info(f"imageNearDupPairs recall on 24 twins: $rec%.3f")
    assert(rec >= 0.90, f"image near-dup recall $rec%.3f below bound 0.90")
    assert(got.diff(truth).isEmpty,
      s"distinct patterns falsely paired: ${got.diff(truth).take(3)}")
    feats.unpersist()
    ()
  }

  test("semanticDedup drop-set vs exhaustive cosine-threshold closure") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter("vec_id < 800")
      .select(col("vec_id").cast("long"), col("embedding")).cache()
    val allIds = emb.select("vec_id").as[Long].collect().toSet
    val l = emb.select(col("vec_id").as("a"), col("embedding").as("_va"))
    val r0 = emb.select(col("vec_id").as("b"), col("embedding").as("_vb"))
    val truthPairs = l.crossJoin(r0).filter(col("a") < col("b"))
      .withColumn("_c", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("_c") >= 0.25).select("a", "b")
    val truthDrop = allIds.diff(
      graft.operators.Components.clusterDedup(emb, "vec_id", truthPairs)
        .select("vec_id").as[Long].collect().toSet)
    assert(truthDrop.nonEmpty)
    val gotDrop = allIds.diff(
      Dedup.semanticDedup(emb, "vec_id", "embedding",
          numClusters = 8, threshold = 0.25)
        .select("vec_id").as[Long].collect().toSet)
    // pairs are exact-cosine-verified within clusters, so the got graph is
    // a subgraph of the truth graph: every doc dropped here is a true dup
    assert(gotDrop.subsetOf(truthDrop),
      s"false drops: ${gotDrop.diff(truthDrop).take(3)}")
    val rec = recall(truthDrop.map((_, 0L)), gotDrop.map((_, 0L)))
    info(f"semanticDedup drop recall at cos>=0.25: $rec%.3f (${truthDrop.size} truth drops)")
    assert(rec >= 0.80, f"semanticDedup drop recall $rec%.3f below bound 0.80")
    emb.unpersist()
    ()
  }

  test("ngramJaccardPairs recall vs brute-force at same threshold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter("doc_id < 250")
      .select(col("doc_id").cast("long"), col("text")).cache()
    val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("_sh"))
    val l = sh.select(col("doc_id").as("a"), col("_sh").as("_sha"))
    val r0 = sh.select(col("doc_id").as("b"), col("_sh").as("_shb"))
    val truth = l.crossJoin(r0).filter(col("a") < col("b"))
      .withColumn("_j", Dedup.jaccard(col("_sha"), col("_shb")))
      .filter(col("_j") >= 0.5)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select(col("a").cast("long"), col("b").cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // candidates are LSH-gated then exact-verified: precision must be 1.0
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth).take(5)}")
    val rec = recall(truth, got)
    info(f"ngramJaccardPairs recall at J>=0.5: $rec%.3f (${truth.size} truth pairs)")
    assert(rec >= 0.70, f"ngram recall $rec%.3f below bound 0.70")
    docs.unpersist()
    ()
  }
}
