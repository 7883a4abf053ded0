package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale design notes (the whole point of these ops is the 100 TB case):
 *  - exact dedup: hash-groupBy on a 64-bit content fingerprint — one
 *    shuffle keyed by the hash, no full-text comparison.
 *  - MinHash+LSH: shingle → K minhashes → B bands → self-join on
 *    (band, band-signature). The self-join is an equi-join on the band
 *    key, so Spark shuffles each band bucket to one reducer instead of
 *    computing O(N²) pairs.
 *  - pair outputs always orient (a < b) to halve the pair space.
 * No UDFs: shingling/hashing use Catalyst higher-order functions.
 */
object Dedup {

  /** Normalize text for near-dup purposes: lowercase + collapse whitespace. */
  private[operators] def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /**
   * Evaluate `e` exactly once and expose it to `f` as a lambda-bound
   * variable. The optimizer inlines multi-use projection aliases, which
   * turns an expensive signature referenced by N band expressions into N
   * recomputations per row (measured: minhash banding 330 s → 7 s at
   * sf0.01). A higher-order-function variable is evaluated once by
   * construction.
   */
  private[graft] def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /**
   * Band/hash-count sanity gate shared by the MinHash entry points
   * (mirrors MinHashIndex.Params). With bands > numHashes every band
   * would hash an EMPTY signature slice — all documents collide in every
   * bucket and dedup silently keeps a single document. Fail fast instead.
   */
  private def requireBands(numHashes: Int, bands: Int): Unit =
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must be in [1, numHashes=$numHashes] and divide numHashes evenly")

  /**
   * Exact dedup: keep one row (lowest `idCol`) per identical normalized
   * text.
   *
   * Plan shape for 100 TB: winners are computed as groupBy(fingerprint) →
   * min(id) — a map-side partial aggregate whose shuffle carries only
   * (hash, id) pairs — then a semi-join on id brings back the surviving
   * rows. Unlike a window over the full frame, the document BODIES are
   * never shuffled (AQE turns the winner join into a broadcast when the
   * winner set is small enough).
   */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = df
      .select(TextAnalysis.fingerprint(col(textCol)).as("_fp"), col(idCol))
      .groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Character shingles (n-grams) of the normalized text, as a distinct array. */
  def charShingles(text: Column, n: Int): Column = {
    val t = normText(text)
    val count = greatest(length(t) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(1), count), i => t.substr(i, lit(n))))
  }

  /** Word shingles (n-grams over tokens). */
  def wordShingles(text: Column, n: Int): Column = {
    val tokens = split(normText(text), " ")
    val count = greatest(size(tokens) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
  }

  /**
   * MinHash signature: for each of `k` hash families, min over shingles of
   * xxhash64(shingle, seed_i). Returns Array[Long] of length k.
   *
   * Built as ONE nested higher-order expression so the `shingles` child
   * appears exactly once in the tree: the naive `array((0 until k).map(i =>
   * array_min(transform(shingles, ...))))` embeds (and recomputes) the
   * shingle expression k times per row — measured 47× slower at sf0.01.
   */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /**
   * MinHash + LSH near-duplicate pairs: returns (a, b) id pairs whose
   * banded minhash signatures collide in >= 1 band. `threshold` governs
   * the band/row split via the standard (1/b)^(1/r) ~ threshold curve when
   * bands/rows not given explicitly.
   */
  /**
   * @param maxBucketSize degenerate-bucket guard: buckets holding more than
   *   this many docs are skipped before the self-join. A corpus where many
   *   documents are mutually similar (boilerplate, templates) otherwise
   *   produces quadratic candidate pairs per bucket — measured 555 s /
   *   29.6M pairs on a 50k-doc self-similar corpus vs bounded runtime with
   *   the cap. Near-dups lost this way sit in giant clusters that exact
   *   dedup or per-cluster sampling handles better than pairwise output.
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 5, numHashes: Int = 64,
                      bands: Int = 16,
                      maxBucketSize: Option[Int] = Some(500)): DataFrame = {
    requireBands(numHashes, bands)
    val rows = numHashes / bands
    val bandArray = bindOnce(
      graft.expressions.HashFunctions.minhashShingles(
        normText(col(textCol)), shingleSize, numHashes)) { s =>
      array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(concat_ws(",",
          slice(s, b * rows + 1, rows).cast("array<string>")), lit(b)).as("bucket"))
      }: _*)
    }
    val banded0 = df.select(col(idCol).as("_id"), explode(bandArray).as("_band"))
      .select(col("_id"), col("_band.band").as("_b"), col("_band.bucket").as("_v"))
    val banded = maxBucketSize match {
      case Some(cap) =>
        // window count keeps the signature computation single-pass (a
        // groupBy+join back would evaluate the minhash expression twice)
        val w = Window.partitionBy(col("_b"), col("_v"))
        banded0.withColumn("_bc", count(lit(1)).over(w))
          .filter(col("_bc") <= cap).drop("_bc")
      case None => banded0
    }
    val l = banded.withColumnRenamed("_id", "a")
    val r = banded.withColumnRenamed("_id", "b")
    l.join(r, Seq("_b", "_v")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /**
   * MinHash near-duplicate DEDUP (keep one representative per near-dup
   * cluster) — the linear-cost form for 100 TB training-data pipelines.
   *
   * Unlike [[minhashLshPairs]] (whose output is inherently quadratic on a
   * self-similar corpus: 13M pairs / 196 s on a 50k-doc stress), this
   * computes per-bucket minimum ids and keeps a document only if it is the
   * minimum of every bucket it lands in — one groupBy + one join, output
   * linear in the corpus. Single-pass label assignment (the C4/RefinedWeb-
   * style approximation): transitive chains across disjoint buckets may
   * keep an extra representative; exact connected components would need
   * iteration and is rarely worth it for dedup.
   */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 5, numHashes: Int = 64,
                   bands: Int = 16): DataFrame = {
    requireBands(numHashes, bands)
    val rows = numHashes / bands
    val bandArray = bindOnce(
      graft.expressions.HashFunctions.minhashShingles(
        normText(col(textCol)), shingleSize, numHashes)) { s =>
      array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(concat_ws(",",
          slice(s, b * rows + 1, rows).cast("array<string>")), lit(b)).as("bucket"))
      }: _*)
    }
    val banded = df.select(col(idCol).as("_id"), explode(bandArray).as("_band"))
      .select(col("_id"), col("_band.band").as("_b"), col("_band.bucket").as("_v"))
    // label = min id over every bucket the doc participates in
    val labels = banded
      .join(banded.groupBy("_b", "_v").agg(min(col("_id")).as("_rep")), Seq("_b", "_v"))
      .groupBy(col("_id")).agg(min(col("_rep")).as("_label"))
    val keepIds = labels.filter(col("_id") === col("_label"))
      .select(col("_id").as(idCol))
    df.join(keepIds, Seq(idCol), "left_semi")
  }

  /**
   * Exact-cluster variant of [[minhashDedup]]: candidate pairs from the
   * same banded LSH, closed into true clusters by
   * [[Components.connectedComponents]] before keeping one representative.
   * Removes the transitive chains the single-pass label approximation
   * can keep (A~B in bucket 1, B~C in bucket 2, but A and C never share
   * a bucket → single-pass keeps both A and C; the exact closure keeps
   * only A). Costs the iterative component rounds — pay it when the
   * corpus has long template cascades, keep the single pass otherwise.
   */
  def minhashDedupExact(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 5, numHashes: Int = 64,
                        bands: Int = 16,
                        maxBucketSize: Option[Int] = Some(500)): DataFrame =
    Components.clusterDedup(df, idCol,
      minhashLshPairs(df, idCol, textCol, shingleSize, numHashes, bands,
        maxBucketSize).select(col("a"), col("b")))

  /**
   * SimHash: 64-bit signature where bit i = sign of the sum over tokens of
   * (+1 / -1 depending on bit i of xxhash64(token)). Near-dups differ in
   * few bits (use [[hammingDistance]] to filter).
   */
  /**
   * Token-hash array for [[simhashFromHashes]]. Kept as a separate
   * projection step so the tokenization runs once per row, not once per
   * bit — the 64 bit-sum expressions then reference a stored array column.
   */
  def tokenHashes(text: Column): Column =
    transform(split(normText(text), " "), t => xxhash64(t))

  /** SimHash from a materialized token-hash array column. */
  def simhashFromHashes(hashes: Column): Column = {
    val bitSums = (0 until 64).map { i =>
      val votes = transform(hashes, h =>
        when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1)))
      val s = aggregate(votes, lit(0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitSums.reduce(_ + _)
  }

  def simhash(text: Column): Column =
    graft.expressions.HashFunctions.simhash64(split(normText(text), " "))

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs: block on the 4 16-bit quarters of the simhash
   * (a pair within Hamming distance 3 must agree on >= 1 quarter — the
   * classic pigeonhole blocking), then verify with exact Hamming distance.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigAndBlocks = bindOnce(
      graft.expressions.HashFunctions.simhash64(split(normText(col(textCol)), " "))) { sh =>
      struct(sh.as("sh"), array((0 until 4).map { qIdx =>
        struct(lit(qIdx).as("q"),
          shiftright(sh, qIdx * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*).as("blocks"))
    }
    val blocked = df.select(col(idCol).as("_id"), col(textCol))
      .select(col("_id"), sigAndBlocks.as("_s"))
      .select(col("_id"), col("_s.sh").as("_sh"), explode(col("_s.blocks")).as("_blk"))
      .select(col("_id"), col("_sh"), col("_blk.q").as("_q"), col("_blk.key").as("_k"))
    val l = blocked.select(col("_id").as("a"), col("_sh").as("_sha"), col("_q"), col("_k"))
    val r = blocked.select(col("_id").as("b"), col("_sh").as("_shb"), col("_q"), col("_k"))
    l.join(r, Seq("_q", "_k")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        hammingDistance(col("_sha"), col("_shb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * Generic Hamming near-dup pairs over a precomputed 64-bit signature
   * column (simhash, aHash, dHash, any LSB-packed sketch): split the 64
   * bits into `maxHamming + 1` contiguous bands and equi-join on
   * (band, band-key) — by pigeonhole, two signatures within Hamming
   * distance `maxHamming` must agree EXACTLY on at least one band, so
   * blocking recall is 1.0 by construction and the exact
   * `bit_count(a XOR b)` verify makes the output identical to the O(N²)
   * brute force. Scale shape matches [[simhashPairs]]: only (id, sig,
   * band-key) scalars shuffle; each band bucket is an equi-join bucket,
   * never a cartesian corpus product.
   */
  def hammingPairs(df: DataFrame, idCol: String, sigCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val bands = maxHamming + 1
    val blocked = df.select(col(idCol).as("_id"), col(sigCol).cast("long").as("_sh"))
      .select(col("_id"), col("_sh"), explode(array((0 until bands).map { b =>
        val lo = b * 64 / bands
        val width = (b + 1) * 64 / bands - lo
        val key =
          if (width == 64) col("_sh")
          else shiftright(col("_sh"), lo).bitwiseAND(lit((1L << width) - 1))
        struct(lit(b).as("q"), key.as("key"))
      }: _*)).as("_blk"))
      .select(col("_id"), col("_sh"), col("_blk.q").as("_q"), col("_blk.key").as("_k"))
    val l = blocked.select(col("_id").as("a"), col("_sh").as("_sha"), col("_q"), col("_k"))
    val r = blocked.select(col("_id").as("b"), col("_sh").as("_shb"), col("_q"), col("_k"))
    l.join(r, Seq("_q", "_k")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        hammingDistance(col("_sha"), col("_shb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /**
   * N-gram Jaccard near-dup pairs with candidate blocking: candidates are
   * generated via minhash-LSH (cheap), then exact Jaccard over word
   * shingles verifies, keeping pairs >= `threshold`. This is the
   * exact-verify pattern: LSH for recall at scale, Jaccard for precision.
   *
   * The verify runs over xxhash64-hashed shingles (8-byte longs), not the
   * shingle strings: distinct-set Jaccard is hash-invariant absent a
   * 64-bit collision (P ≈ s²/2⁶⁴ per pair — negligible), and the hashed
   * arrays shrink the verify join's shuffle and the intersect/union
   * comparisons several-fold (measured 17.3 s → ~6 s on the sf0.1
   * documents).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val candidates = minhashLshPairs(df, idCol, textCol, shingleSize = 5,
      numHashes = 64, bands = 16)
    val shingled = df.select(col(idCol),
      // native one-pass n-gram hashing (NgramHashes) — same values as
      // transform(wordShingles(...), xxhash64) without materializing
      // shingle strings or running the regex normalization per row
      array_sort(graft.expressions.HashFunctions.ngramHashes(col(textCol), n)).as("_sh"))
    val withA = candidates.join(shingled.select(col(idCol).as("a"), col("_sh").as("_sha")), "a")
    val withB = withA.join(shingled.select(col(idCol).as("b"), col("_sh").as("_shb")), "b")
    withB.withColumn("jaccard",
      graft.expressions.HashFunctions.sortedJaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Benchmark decontamination (the training-data hygiene pass): per corpus
   * document, the fraction of its distinct word n-grams that appear
   * anywhere in the benchmark set, plus a `contaminated` flag at
   * `threshold`. The benchmark's n-gram hash set is distinct-aggregated
   * and broadcast (benchmarks are tiny next to a training corpus); the
   * corpus streams through one explode + broadcast join + per-doc count —
   * no corpus × benchmark pair blowup, scales linearly in corpus n-grams.
   */
  def ngramContamination(corpus: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 8, threshold: Double = 0.1): DataFrame = {
    def ngramHashes(text: Column): Column =
      graft.expressions.HashFunctions.ngramHashes(text, n)
    // size + explode over ONE evaluation of the n-gram hashing: a plain
    // `select(size(_ngs), explode(_ngs))` gets the `_ngs` alias inlined
    // into both by CollapseProject and hashes every document twice
    // (measured 8.5 s → 4.3 s at sf0.1 for the full query)
    val exploded = corpus.select(col(idCol),
        explode(bindOnce(ngramHashes(col(textCol)))(ngs =>
          transform(ngs, x => struct(x.as("ng"), size(ngs).as("total"))))).as("_s"))
      .select(col(idCol), col("_s.total").as("_total"), col("_s.ng").as("_ng"))
    val benchNg = benchmark
      .select(explode(ngramHashes(col(benchTextCol))).as("_ng")).distinct()
    val matched = exploded.join(broadcast(benchNg), Seq("_ng"))
      .groupBy(col(idCol), col("_total"))
      .agg(count(lit(1)).as("_matched"))
    corpus.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .withColumn("contamination", round(
        coalesce(col("_matched").cast("double") / col("_total"), lit(0.0)), 6))
      .withColumn("contaminated", col("contamination") >= threshold)
      .select(col(idCol), col("contamination"), col("contaminated"))
  }

  /**
   * Embedding-cosine near-dup pairs via hyperplane-LSH blocking + exact
   * cosine verify (>= threshold).
   *
   * Multi-probe (one side of the self-join only): each band bucket is
   * additionally probed with one low bit flipped, so a pair disagreeing
   * on a single hyperplane of a band still meets in that band — the same
   * recall lift at fixed bits/bands as [[graft.functions.Similarity
   * .lshTopK]]'s query-side probing (measured 0.80 → 0.9+ at cos ≥ 0.25
   * on the test embeddings). Probing one side keeps the exploded join
   * input at (probes+1)× on that side only, not (probes+1)² pairs.
   *
   * Vectors stay OUT of the banding self-join: candidate (a, b) id pairs
   * are bucket-joined and deduped as 3-scalar rows, and only the
   * surviving distinct pairs join the vector table back for the exact
   * cosine verify. Carrying both vectors through the candidate shuffle
   * instead measured 2.3 GB shuffled / 39 s on the sf0.1 stress query
   * (low threshold + clustered vectors → 1.8 M candidates) vs ids-only
   * ~70 MB — and at a real corpus scale the candidate fan-out is the one
   * thing this plan must survive.
   *
   * Band-width tuning (recall vs candidate volume at cos >= 0.25 on the
   * sf0.01 embeddings — low thresholds NEED narrow bands, because such
   * pairs disagree on many hyperplanes):
   * {{{
   * bands x bits/band   probes   recall   candidates/band-bucket space
   *   12  x  4            2       0.985     16 buckets  <- default
   *    8  x  6            2       0.597     64 buckets
   *    8  x  6            3       0.691
   *    6  x  8            2       0.215    256 buckets
   * }}}
   * Widen bands only when raising `threshold` (near-identical pairs
   * agree on most hyperplanes, so fewer/wider bands keep recall while
   * cutting candidate volume quadratically).
   */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            bits: Int = 48, bands: Int = 12,
                            probes: Int = 2,
                            quantizedPreVerify: Boolean = false,
                            preVerifyMargin: Double = 0.05,
                            bruteForceBytes: Long = 8L << 20): DataFrame = {
    import graft.functions.Similarity
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1
    require(probes >= 0 && probes <= rowsPerBand,
      s"probes must be in [0, $rowsPerBand], got $probes")
    require(preVerifyMargin >= 0, s"preVerifyMargin must be >= 0, got $preVerifyMargin")
    // Physical-strategy dispatch by plan statistics, the same decision
    // Spark's planner makes for broadcast vs shuffle joins: when the
    // (id, vector) projection is small enough to broadcast, the exact
    // broadcast nested-loop self-join (recall 1.0, zero shuffles, one
    // codegen'd cosine per pair) beats banding — on clustered embeddings
    // the band buckets of a SMALL corpus collide so heavily that the
    // candidate multiset is several times the full O(n²/2) pair space
    // (measured at the 2k-vector test table: 5.4 s banded vs 0.5 s
    // brute). At corpus scale the stats exceed the bound and the banded
    // path below is the only plan that survives.
    val projected = df.select(col(idCol), col(vecCol))
    val statsBytes = projected.queryExecution.optimizedPlan.stats.sizeInBytes
    if (statsBytes <= BigInt(bruteForceBytes)) {
      val l = projected.select(col(idCol).as("a"), col(vecCol).as("_va"))
      val r = projected.select(col(idCol).as("b"), col(vecCol).as("_vb"))
      return l.join(broadcast(r), col("a") < col("b"))
        .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
        .filter(col("cosine") >= threshold)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
    }
    val bandArray = bindOnce(Similarity.hyperplaneSignature(col(vecCol), dim, bits)) { s =>
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(s, b * rowsPerBand).bitwiseAND(lit(mask)).as("bucket"))
      }: _*)
    }
    val banded = df.select(col(idCol).as("_id"), explode(bandArray).as("_band"))
      .select(col("_id"), col("_band.band").as("_b"), col("_band.bucket").as("_k"))
    val l = banded.select(col("_id").as("a"), col("_b"), col("_k"))
    val r0 = banded.select(col("_id").as("b"), col("_b"), col("_k"))
    val r = if (probes <= 0) r0
      else r0.select(col("b"), col("_b"),
        explode(array(col("_k") +:
          (0 until probes).map(j => col("_k").bitwiseXOR(lit(1L << j))): _*)).as("_k"))
    val pairs = l.join(r, Seq("_b", "_k")).filter(col("a") < col("b"))
      .select("a", "b").dropDuplicates("a", "b")
    val vecs = df.select(col(idCol), col(vecCol))
    // Optional int8 pre-verify: candidates first join per-vector int8
    // quantizations (4x narrower than the float vectors — cosine is
    // scale-invariant, so q_i = round(v_i / max|v| * 127) needs no stored
    // scale) and pairs whose quantized cosine falls below
    // `threshold - preVerifyMargin` are rejected before the float join.
    // Quantization error on the cosine is < ~0.01 at dim 64 (per-component
    // relative error <= 1/254), so the margin keeps recall intact. The
    // exact float verify below remains final for everything that passes.
    // Default OFF: measured NEUTRAL at the test scales (sf0.01/sf0.1,
    // dim 64 — candidate sets there are dominated by pairs that pass the
    // threshold, so there is little to reject and the extra joins cost
    // what the narrower shuffle saves). Turn on for fan-out-dominated
    // workloads: high-dim vectors with selective thresholds where most
    // candidates fail the verify and the float-vector join is the
    // bottleneck.
    val surviving =
      if (!quantizedPreVerify) pairs
      else {
        val qvec = bindOnce(
          aggregate(col(vecCol), lit(0.0f), (m, x) => greatest(m, abs(x)))) { mx =>
          transform(col(vecCol), x =>
            when(mx === 0.0f, lit(0))
              .otherwise(round(x / mx * 127.0f)).cast("byte"))
        }
        val qvecs = df.select(col(idCol), qvec.as("_q"))
        pairs
          .join(qvecs.select(col(idCol).as("a"), col("_q").as("_qa")), "a")
          .join(qvecs.select(col(idCol).as("b"), col("_q").as("_qb")), "b")
          .filter(Similarity.cosine(col("_qa"), col("_qb")) >=
            threshold - preVerifyMargin)
          .select("a", "b")
      }
    surviving
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("_va")), "a")
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("_vb")), "b")
      .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
  }

  /**
   * Incremental exact dedup for batch ingest: keep only rows of the new
   * batch that are (a) not duplicated within the batch (lowest id wins)
   * and (b) whose normalized fingerprint is absent from the already-seen
   * set. `seen` is the running fingerprint table (one `fingerprint`
   * column) a pipeline maintains across loads — append
   * [[newFingerprints]] of each accepted batch to it.
   *
   * Scale: the batch is small relative to the corpus; the anti-join on
   * the 8-byte fingerprint shuffles only (hash, id) pairs of the BATCH —
   * the seen set streams map-side (or broadcasts when small). The corpus
   * bodies are never touched.
   */
  def incrementalExactDedup(batch: DataFrame, idCol: String, textCol: String,
                            seen: DataFrame): DataFrame = {
    val withFp = batch.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
    val inBatchWinners = withFp
      .groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    withFp
      .join(inBatchWinners, Seq(idCol), "left_semi")
      .join(seen.select(col("fingerprint").as("_fp")), Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** Fingerprints of a batch, for appending to the running seen set. */
  def newFingerprints(batch: DataFrame, textCol: String): DataFrame =
    batch.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint")).distinct()

  /**
   * Segment-level exact dedup across the corpus: split every document on
   * `sepRegex` (paragraphs, sentences, lines — caller's choice), keep only
   * the globally FIRST occurrence of each distinct segment (lowest
   * (id, position)), and reassemble each document from its surviving
   * segments in original order, joined with `joinSep`. The classic
   * boilerplate-paragraph removal step in LLM corpus cleaning: a repeated
   * header/footer/licence block survives once, in the earliest document.
   * Documents whose every segment appeared earlier elsewhere drop out.
   *
   * Scale design (100 TB): winner selection is groupBy(segment) →
   * min(struct(id, idx)) — map-side combine collapses each partition's
   * duplicate segments BEFORE the shuffle, so hot boilerplate (the skew
   * case: one paragraph repeated in millions of docs) never concentrates
   * whole segment bodies on one reducer the way a row_number window keyed
   * on the segment would. Winner (id, idx) pairs then fold to a per-doc
   * keep-set, and the survivor filter + reassembly share ONE shuffle keyed
   * by the uniformly-distributed doc id.
   */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
                   sepRegex: String = "\\n{2,}",
                   joinSep: String = "\n\n"): DataFrame = {
    val segs = df.select(col(idCol),
      posexplode(split(col(textCol), sepRegex, -1)).as(Seq("_idx", "_seg")))
    val winners = segs
      .groupBy(col("_seg"))
      .agg(min(struct(col(idCol).as("id"), col("_idx").as("idx"))).as("_w"))
      .select(col("_w.id").as("_wid"), col("_w.idx").as("_widx"))
    val keepSets = winners.groupBy(col("_wid"))
      .agg(collect_list(col("_widx")).as("_keep"))
    segs.join(keepSets, segs(idCol) === keepSets("_wid"))
      .where(array_contains(col("_keep"), col("_idx")))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_idx"), col("_seg")))),
          x => x.getField("_seg")),
        joinSep).as(textCol))
  }

  /**
   * Per-document cross-corpus repeated-n-gram stats — the detection half
   * of exact-substring dedup (Lee et al. 2022, "Deduplicating Training
   * Data Makes Language Models Better", arXiv:2107.06499; the reference's
   * dedup family covers only whole-doc and segment granularity, e.g.
   * odibi/transformers/advanced.py deduplicate): for every document, how
   * many of its distinct word n-grams also occur in at least
   * `minDocs - 1` OTHER documents. High `repeated_frac` marks templated /
   * boilerplate-heavy documents that whole-doc dedup misses.
   *
   * Output: (idCol, total_ngrams, repeated_ngrams, repeated_frac).
   *
   * Scale design (100 TB): n-gram hashing is the one-pass native
   * [[graft.expressions.HashExpressions NgramHashes]] expression
   * (distinct 64-bit hashes, zero string materialization). Doc frequency
   * is a map-side-combinable groupBy on the 8-byte hash — per-doc
   * distinctness makes count(*) the doc frequency directly — and the
   * frequency join + per-doc rollup shuffle only (hash, id) scalar
   * rows. Nothing is quadratic; hot n-grams (the skew case) are handled
   * by AQE, not a window funnel.
   */
  def crossDocNgrams(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minDocs: Int = 2): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(graft.expressions.HashFunctions.ngramHashes(col(textCol), n))
        .as("_ng"))
    val freq = exploded.groupBy(col("_ng")).agg(count(lit(1)).as("_df"))
    exploded.join(freq, Seq("_ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("total_ngrams"),
        sum(when(col("_df") >= minDocs, 1L).otherwise(0L)).as("repeated_ngrams"))
      .withColumn("repeated_frac", round(
        col("repeated_ngrams").cast("double") / col("total_ngrams"), 6))
  }

  /**
   * Exact-substring span removal (Lee et al. 2022 at word-n-gram
   * granularity): find word n-grams occurring in >= `minDocs` documents,
   * merge each document's matching n-gram windows into maximal word
   * spans, and cut those spans out of the text. With `keepFirst` (the
   * paper's keep-one-occurrence rule) the globally first occurrence of
   * each repeated n-gram — lowest (id, position) — survives; with
   * `keepFirst = false` every occurrence is removed. Operates on
   * normalized text (lowercased, whitespace-collapsed — the same
   * normalization as the rest of the near-dup family); a document whose
   * every word is covered comes back empty.
   *
   * Output: `df` with `textCol` replaced by the cleaned text plus a
   * `removed_words` count.
   *
   * Scale design (100 TB): all corpus-sized shuffles carry scalar
   * (id, pos, hash) rows — texts stay partition-local until the final
   * per-doc reassembly, which shares one shuffle keyed by the
   * uniformly-distributed doc id. Span merging is a per-row Catalyst
   * `aggregate` fold over the doc's sorted hit positions (no UDF, no
   * driver loop). Doc-frequency and first-occurrence selection are
   * map-side-combinable groupBys on the 8-byte hash.
   */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 8, minDocs: Int = 2,
                          keepFirst: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val withWords = df.withColumn("_w", split(normText(col(textCol)), " "))
    // positional windows: one (pos, hash) row per word n-gram occurrence;
    // a doc shorter than n words is a single window covering the whole doc
    val pos = withWords.select(col(idCol),
        explode(transform(
          sequence(lit(0), greatest(size(col("_w")) - n, lit(0))),
          i => struct(i.as("p"),
            xxhash64(concat_ws(" ", slice(col("_w"), i + lit(1), lit(n))))
              .as("h")))).as("_s"))
      .select(col(idCol), col("_s.p").as("_p"), col("_s.h").as("_h"))
    // doc frequency from per-doc-distinct (id, hash) pairs
    val rep = pos.select(col(idCol), col("_h")).distinct()
      .groupBy(col("_h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDocs).select(col("_h"))
    val repeatedOcc = pos.join(rep, Seq("_h"))
    val hits =
      if (!keepFirst) repeatedOcc
      else {
        val first = repeatedOcc.groupBy(col("_h"))
          .agg(min(struct(col(idCol).as("i"), col("_p").as("p"))).as("_f"))
        repeatedOcc.join(first, Seq("_h"))
          .filter(!(col(idCol) === col("_f.i") && col("_p") === col("_f.p")))
          .drop("_f")
      }
    // merge each doc's sorted hit positions (each covering [p, p+n)) into
    // maximal word intervals with a per-row fold — adjacent/overlapping
    // windows coalesce, so the cut is span-accurate, not window-by-window
    val spans = hits.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("_p"))).as("_ps"))
      .withColumn("_iv", aggregate(
        col("_ps"),
        array().cast("array<struct<s:int,e:int>>"),
        (acc, p) => when(
          size(acc) > 0 && p <= element_at(acc, -1).getField("e"),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(element_at(acc, -1).getField("s").as("s"),
              greatest(element_at(acc, -1).getField("e"), p + n).as("e"))))
        ).otherwise(
          concat(acc, array(struct(p.as("s"), (p + n).as("e")))))))
      .select(col(idCol), col("_iv"))
    withWords.join(spans, Seq(idCol), "left")
      .withColumn("_kept", when(col("_iv").isNull, col("_w"))
        .otherwise(filter(col("_w"), (w, i) =>
          !exists(col("_iv"), iv =>
            i >= iv.getField("s") && i < iv.getField("e")))))
      .withColumn(textCol, concat_ws(" ", col("_kept")))
      .withColumn("removed_words", (size(col("_w")) - size(col("_kept"))).cast("long"))
      .drop("_w", "_iv", "_kept")
  }

  /**
   * Semantic-dedup candidate pairs (SemDeDup, Abbas et al. 2023,
   * arXiv:2303.09540): spherical k-means clusters the embedding space,
   * and duplicates are resolved WITHIN clusters only — a pair qualifies
   * when both embeddings land in the same cluster and their exact cosine
   * is >= `threshold`. Output: (a, b, cluster, cosine) with a < b.
   *
   * Complements [[embeddingNearDupPairs]]: hyperplane LSH blocks on
   * random projections (per-pair probabilistic recall anywhere in the
   * space), while cluster blocking concentrates the comparison budget
   * where semantic dups live and carries the cluster id out for the
   * audit view. Misses only pairs split across a cluster boundary —
   * size `numClusters` so clusters stay well below `maxClusterSize`.
   *
   * Scale design (100 TB): centroids are driver-resident and assignment
   * is the zero-shuffle native NearestCentroids expression shared with
   * the IVF index ([[graft.functions.Similarity.buildIvfIndex]]). The
   * within-cluster self-join carries (id, cluster) scalar rows only;
   * vectors join back just for surviving candidate pairs — the same
   * ids-first shape as [[embeddingNearDupPairs]]. Per-cluster pair count
   * is O(size²): `numClusters` must grow with the corpus (the paper runs
   * 50k clusters on billions of docs), and `maxClusterSize` hard-caps a
   * degenerate cluster (embedding collapse) at its lowest-id members —
   * the capped count rows are 2 scalars, the documented single-reducer
   * price also taken by [[minhashLshPairs]]'s bucket cap.
   */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                         numClusters: Int = 64, threshold: Double = 0.95,
                         lloydIters: Int = 2, refineDenom: Int = 4,
                         maxClusterSize: Option[Int] = Some(10000)): DataFrame = {
    import graft.functions.Similarity
    val idx = Similarity.buildIvfIndex(df, idCol, vecCol, numClusters,
      lloydIters, assignSpill = 1, refineDenom)
    val cells0 = idx.cells.select(col(idCol).as("_id"), col("_cell"))
    val cells = maxClusterSize match {
      case Some(cap) => cells0
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("_cell")).orderBy(col("_id"))))
        .filter(col("_rn") <= cap).drop("_rn")
      case None => cells0
    }
    val cand = cells.select(col("_id").as("a"), col("_cell"))
      .join(cells.select(col("_id").as("b"), col("_cell")), Seq("_cell"))
      .filter(col("a") < col("b"))
    val vecs = df.select(col(idCol), col(vecCol))
    cand
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("_va")), "a")
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("_vb")), "b")
      .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("_cell").as("cluster"),
        round(col("cosine"), 6).as("cosine"))
  }

  /**
   * SemDeDup as a dedup: keep one representative (min id, consistent
   * with the rest of the family; the paper keeps the low-centroid-
   * similarity member — swap the keep rule downstream if diversity
   * matters more than determinism) per connected component of
   * [[semanticDedupPairs]]. Returns the surviving rows of `df`.
   */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    numClusters: Int = 64, threshold: Double = 0.95,
                    lloydIters: Int = 2, refineDenom: Int = 4,
                    maxClusterSize: Option[Int] = Some(10000)): DataFrame =
    Components.clusterDedup(df, idCol,
      semanticDedupPairs(df, idCol, vecCol, numClusters, threshold,
        lloydIters, refineDenom, maxClusterSize).select(col("a"), col("b")))

  /**
   * Exact-duplicate audit: the family-size histogram a dedup run reports
   * BEFORE cutting — how many documents are unique, how many belong to
   * pairs, to ten-member template families, and what fraction of corpus
   * rows each bucket holds. Two map-side-combined aggregations over
   * 8-byte fingerprints; bodies never shuffle. `family_size = 1` rows
   * are the unique corpus; everything else is what [[exactDedup]] would
   * remove (keeping one per family).
   */
  def dedupReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fams = df
      .select(TextAnalysis.fingerprint(col(textCol)).as("_fp"))
      .groupBy(col("_fp")).agg(count(lit(1)).as("family_size"))
    val hist = fams.groupBy(col("family_size"))
      .agg(count(lit(1)).as("n_families"))
      .withColumn("n_rows", col("family_size") * col("n_families"))
    val total = hist.agg(sum(col("n_rows")).as("_total"))
    hist.crossJoin(broadcast(total))
      .select(col("family_size"), col("n_families"), col("n_rows"),
        // one exact-integer division: bit-identical across engines unrounded
        (col("n_rows") / col("_total")).as("row_share"))
  }
}
