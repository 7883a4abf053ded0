package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines (beyond-reference,
 * SURVEY LLM-ops family; complements the hash-threshold `q_sample_det`
 * row sample in SqlCore).
 */
object Sampling {

  /**
   * Exact n-per-stratum deterministic sample: within each stratum keep the
   * `n` rows with the smallest md5 over `keyCols` — reproducible under any
   * partitioning, no RNG state, and re-running on a grown corpus keeps a
   * stable prefix per stratum (rows only leave when displaced by smaller
   * hashes).
   *
   * Two-phase top-n: rank locally within (stratum, input-partition) first
   * and keep ≤ n, then rank the ≤ n×P survivors globally — a single
   * per-stratum window would funnel every stratum through one reducer
   * (the brute-force-ANN lesson, Similarity.bruteForceTopK).
   */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], n: Int,
                       keyCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSample needs strata columns")
    require(keyCols.nonEmpty, "stratifiedSample needs deterministic key columns")
    require(n >= 1, s"n must be >= 1, got $n")
    val strata: Seq[Column] = strataCols.map(col)
    val key = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    val keyed = df.withColumn("_skey", key)
    // phase 1: per-INPUT-PARTITION top-n per stratum with NO exchange —
    // the old Window.partitionBy(strata, spark_partition_id()) ranked the
    // same groups but hash-shuffled the ENTIRE input first to cluster by
    // a key that is by definition already partition-local. A bounded
    // in-task heap keeps the identical ≤ n-per-(partition, stratum)
    // superset while only the ≤ n×P survivors ever shuffle.
    val schema = keyed.schema
    val sIdx = strataCols.map(schema.fieldIndex)
    val kIdx = schema.fieldIndex("_skey")
    val local = keyed.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], java.util.PriorityQueue[org.apache.spark.sql.Row]]
      // max-heap on _skey: the root is the WORST survivor, evicted first
      val cmp = new java.util.Comparator[org.apache.spark.sql.Row] {
        def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int =
          b.getString(kIdx).compareTo(a.getString(kIdx))
      }
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(sIdx.map(r.get),
          new java.util.PriorityQueue[org.apache.spark.sql.Row](n + 1, cmp))
        if (h.size < n) { h.add(r); () }
        else if (r.getString(kIdx) < h.peek().getString(kIdx)) {
          h.poll(); h.add(r); ()
        }
      }
      heaps.valuesIterator.flatMap(h =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
    }(org.apache.spark.sql.Encoders.row(schema))
    // phase 2: exact global rank over the survivors (unchanged)
    val globalW = Window.partitionBy(strata: _*).orderBy(col("_skey"))
    local
      .withColumn("_rn", row_number().over(globalW))
      .filter(col("_rn") <= n)
      .drop("_skey", "_rn")
  }

  /**
   * Weighted source mixing: downsample each source so the OUTPUT matches
   * target proportions — the corpus-mixing step of every pretraining
   * recipe ("webtext 60%, code 25%, books 15%"). No source is upsampled:
   * the scale is set by the limiting source (largest weight-to-size
   * ratio), and each source keeps its exactly `k_s = floor(w_s × scale)`
   * rows with the smallest md5 over `keyCols` — reproducible under any
   * partitioning, prefix-stable as the corpus grows, and expressible in
   * ANSI SQL for the oracle. `keyCols` must uniquely identify rows:
   * duplicate keys hash identically, and which duplicate survives a cut
   * that lands inside the tie group is not deterministic.
   *
   * Scale shape (no per-source funnel): the md5 key is uniform, so its
   * 60-bit numeric prefix splits each source into `buckets` equal-width
   * ranges — a pure function of the row, no sketch, no sampling, and the
   * hex digest's lexicographic order equals (prefix, suffix) numeric
   * order, so per-bucket local ranks plus driver-side prefix offsets
   * (≤ sources × buckets longs) reconstruct the EXACT global per-source
   * rank. Buckets whose offset already exceeds the source's take are
   * dropped BEFORE the rank shuffle, so only ~k_s rows per source ever
   * shuffle — at a 10% mix ratio, 90% of the corpus never moves. Total
   * cost: two corpus scans (one map-side-combined size aggregation that
   * also yields the per-source totals, one rank pass). Sources absent
   * from `weights` are dropped (weight 0).
   *
   * @param buckets rank-bucket fan-out per source (0 → shuffle
   *                partitions); each bucket is one window reducer
   */
  def weightedMix(df: DataFrame, sourceCol: String, keyCols: Seq[String],
                  weights: Map[String, Double], buckets: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weightedMix needs positive target weights")
    require(keyCols.nonEmpty, "weightedMix needs deterministic key columns")
    val spark = df.sparkSession
    val p = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val srcStr = col(sourceCol).cast("string")
    val key = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    // equal-width range buckets over the digest's 60-bit numeric prefix
    // (uniform by construction — md5 is the sample)
    val width = (1L << 60) / p
    val base = df.filter(srcStr.isin(weights.keys.toSeq: _*))
      .withColumn("_src", srcStr)
      .withColumn("_skey", key)
      .withColumn("_bkt", least(
        floor(conv(substring(col("_skey"), 1, 15), 16, 10).cast("long") / width),
        lit((p - 1).toLong)).cast("int"))

    // ONE aggregation serves both the per-source totals (scale + takes)
    // and the per-(source, bucket) prefix offsets — ≤ sources × buckets
    // rows to the driver, map-side combined, one corpus scan
    val sizes = base.groupBy(col("_src"), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val counts: Map[String, Long] =
      sizes.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.limit(0)
    // limiting source (largest weight-to-size ratio) pins the scale;
    // exact per-source take counts k_s = floor(w_s * scale) ≤ n_s
    val scale = present.map { case (s, w) => counts(s) / w }.min
    val takes = present.map { case (s, w) =>
      s -> math.max(math.floor(w * scale).toLong, 1L) }

    val offsets = sizes.groupBy(_._1._1).toSeq.flatMap { case (s, rows) =>
      var acc = 0L
      rows.sortBy(_._1._2).map { case ((_, b), c) =>
        val row = (s, b, acc); acc += c; row }
    }
    import spark.implicits._
    val offDf = offsets.toDF("_src", "_bkt", "_off")

    val takeFor = takes.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col("_src") === s, k).otherwise(acc)
    }
    // global rank = local rank within (source, bucket) + bucket offset;
    // post-cut buckets (_off ≥ k_s) drop before the rank shuffle
    val localW = Window.partitionBy(col("_src"), col("_bkt")).orderBy(col("_skey"))
    base.join(broadcast(offDf), Seq("_src", "_bkt"))
      .filter(col("_off") < takeFor)
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") + col("_off") <= takeFor)
      .drop("_src", "_skey", "_bkt", "_off", "_lrn")
  }

  /**
   * Token-weighted source mixing: downsample each source so the OUTPUT
   * TOKEN MASS matches target proportions — what a pretraining recipe
   * actually specifies ("60% webtext BY TOKENS"), which row-weighted
   * mixing only approximates when document lengths differ across sources
   * (they always do: code files vs tweets). No source is upsampled: the
   * limiting source (largest weight-to-token ratio) pins the scale, and
   * each source keeps its smallest-md5 documents until the one whose
   * EXCLUSIVE running token total first reaches its budget `k_s =
   * floor(w_s × scale)` — that boundary document is included, so the
   * output overshoots each budget by less than one document. `keyCols`
   * must uniquely identify rows (same determinism contract as
   * [[weightedMix]]).
   *
   * Scale shape mirrors [[weightedMix]]: md5-prefix range buckets, ONE
   * map-side-combined (source, bucket) token aggregation driving both
   * the per-source totals and the driver-side prefix token offsets,
   * post-budget buckets dropped before the running-sum shuffle — only
   * ~budget tokens' worth of rows per source ever move.
   *
   * @param tokenCol per-document token count (null → 0)
   */
  /**
   * Temperature-scaled source mixing — the published multilingual recipe
   * (mT5 / XLM-R alpha-sampling, Xue et al. 2021): target proportions
   * p_s proportional to n_s^alpha, so low-resource sources are boosted
   * relative to their natural share without hand-written weights.
   * alpha = 1 reproduces the natural distribution (identity mix);
   * alpha -> 0 approaches uniform across sources. Source counts are one
   * map-side-combined aggregate (bounded by the number of sources); the
   * cut itself is [[weightedMix]], so determinism, the md5 rank order
   * and the bucket-drop scale shape are inherited unchanged.
   */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCols: Seq[String],
                     alpha: Double, buckets: Int = 0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperature alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(sourceCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMix: no rows")
    val raised = counts.map { case (src, n) => src -> math.pow(n.toDouble, alpha) }
    val z = raised.values.sum
    weightedMix(df, sourceCol, keyCols,
      raised.map { case (src, w) => src -> w / z }, buckets)
  }

  def weightedMixByTokens(df: DataFrame, sourceCol: String, tokenCol: String,
                          keyCols: Seq[String], weights: Map[String, Double],
                          buckets: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weightedMixByTokens needs positive target weights")
    require(keyCols.nonEmpty, "weightedMixByTokens needs deterministic key columns")
    val spark = df.sparkSession
    val p = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val srcStr = col(sourceCol).cast("string")
    val key = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    val width = (1L << 60) / p
    val base = df.filter(srcStr.isin(weights.keys.toSeq: _*))
      .withColumn("_src", srcStr)
      .withColumn("_tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("_skey", key)
      .withColumn("_bkt", least(
        floor(conv(substring(col("_skey"), 1, 15), 16, 10).cast("long") / width),
        lit((p - 1).toLong)).cast("int"))

    val sizes = base.groupBy(col("_src"), col("_bkt"))
      .agg(sum(col("_tok")).as("_t"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val tokens: Map[String, Long] =
      sizes.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val present = weights.filter { case (s, _) => tokens.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.limit(0)
    val scale = present.map { case (s, w) => tokens(s) / w }.min
    val budgets = present.map { case (s, w) =>
      s -> math.max(math.floor(w * scale).toLong, 1L) }

    // driver-side per-bucket token prefix offsets, same shape as the row
    // variant but summing tokens instead of counting rows
    val offsets = sizes.groupBy(_._1._1).toSeq.flatMap { case (s, rows) =>
      var acc = 0L
      rows.sortBy(_._1._2).map { case ((_, b), t) =>
        val row = (s, b, acc); acc += t; row }
    }
    import spark.implicits._
    val offDf = offsets.toDF("_src", "_bkt", "_off")
    val budgetFor = budgets.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col("_src") === s, k).otherwise(acc)
    }
    // exclusive running total = bucket offset + in-bucket inclusive sum −
    // own tokens; keep while it is still under the budget (the crossing
    // document is the last one kept)
    val w = Window.partitionBy(col("_src"), col("_bkt")).orderBy(col("_skey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("_src", "_bkt"))
      .filter(col("_off") < budgetFor)
      .withColumn("_cum", sum(col("_tok")).over(w))
      .filter(col("_off") + col("_cum") - col("_tok") < budgetFor)
      .drop("_src", "_tok", "_skey", "_bkt", "_off", "_cum")
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling", arXiv:2302.03169): score
   * every raw document by the log-likelihood ratio of its words under a
   * word-unigram model of the TARGET domain vs one of the RAW corpus,
   * add-`smoothing` estimated. The feature space is the target's
   * vocabulary plus a single out-of-vocabulary bucket (the paper hashes
   * n-grams into fixed buckets; restricting to the target vocabulary is
   * the same bounded-feature idea with an exactly reproducible —
   * therefore oracle-checkable — feature map). High `dsir_logratio` =
   * reads like the target domain. Output: (idCol, dsir_logratio).
   *
   * Scale design (100 TB): the target is domain-sized (a benchmark, a
   * curated set), so its word-count table is broadcast — the same shape
   * as [[Dedup.ngramContamination]]'s benchmark set. The raw corpus is
   * touched exactly twice, the DSIR minimum: one pass to estimate its
   * distribution over the bounded feature space (map-side-combinable
   * groupBy producing <= |vocab|+1 rows) and one pass to score
   * (broadcast lookup + per-doc sum). Driver state is three scalars and
   * the vocab-bounded ratio table; nothing corpus-sized ever sits on
   * one node.
   */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
                  target: DataFrame, targetTextCol: String,
                  smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    def words(t: Column) = split(Dedup.normText(t), " ")
    // vocab-bounded model frame, lazily localCheckpoint-ed (NOT
    // persist(): the CacheManager matches cached plans by equality, so
    // a persist would silently reuse one invocation's blocks in the
    // next — re-runs must recompute): three consumers (the totals
    // action, the OOV-tag broadcast, the ratio collect) otherwise each
    // re-scan + re-tokenize the target corpus — the model counts are the
    // lightweight proxy, the text pass is the cost (guide §3.3/§8)
    val tCounts = target.select(explode(words(col(targetTextCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_ct")).localCheckpoint(false)
    val trow = tCounts.agg(coalesce(sum(col("_ct")), lit(0L)),
      count(lit(1))).collect()(0)
    val (nT, v) = (trow.getLong(0), trow.getLong(1))
    require(nT > 0, "dsirWeights: target corpus is empty")
    val rawWords = raw.select(col(idCol), explode(words(col(textCol))).as("_w"))
    // raw-corpus distribution over vocab + OOV: the OOV rollup happens in
    // the SAME aggregation (feature key, not raw word), so the groupBy
    // output is bounded by |vocab|+1 even though raw vocabulary is not
    val tagged = rawWords.join(
      broadcast(tCounts.select(col("_w"), lit(1).as("_in"))), Seq("_w"), "left")
    val oovKey = " oov"
    val rCounts = tagged
      .groupBy(when(col("_in").isNull, lit(oovKey)).otherwise(col("_w")).as("_f"))
      .agg(count(lit(1)).as("_cr"))
    val rRows = rCounts.collect() // bounded: <= |target vocab| + 1 rows
    val nR = rRows.map(_.getLong(1)).sum
    val oovR = rRows.find(_.getString(0) == oovKey).map(_.getLong(1)).getOrElse(0L)
    val rMap = rRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val denomT = nT + smoothing * (v + 1)
    val denomR = nR + smoothing * (v + 1)
    val spark = raw.sparkSession
    import spark.implicits._
    val ratio = tCounts.collect().map { r =>
      val (w0, ct) = (r.getString(0), r.getLong(1))
      w0 -> (math.log((ct + smoothing) / denomT) -
        math.log((rMap.getOrElse(w0, 0L) + smoothing) / denomR))
    }.toSeq.toDF("_w", "_lr")
    val oovLr = math.log(smoothing / denomT) -
      math.log((oovR + smoothing) / denomR)
    rawWords.join(broadcast(ratio), Seq("_w"), "left")
      .groupBy(col(idCol))
      .agg(round(sum(coalesce(col("_lr"), lit(oovLr))), 6).as("dsir_logratio"))
  }

  /**
   * Perplexity filtering (CCNet, Wenzek et al. 2020, arXiv:1911.00359 —
   * there with a KenLM 5-gram; here an interpolated bigram, the same
   * decision signal in an exactly reproducible closed form): score every
   * raw document by its per-token cross-entropy under a language model
   * of the TARGET corpus. Low `cross_entropy` = fluent under the target
   * domain; filter or bucket on it (CCNet keeps head/middle by
   * perplexity tertile). Output: (idCol, n_tokens, cross_entropy).
   *
   * Model, over the target-vocab + OOV feature space of [[dsirWeights]]:
   * `p(w_i | w_{i-1}) = lambda * p_bi + (1 - lambda) * p_uni`, both
   * add-`smoothing` estimated from the target; the first token of each
   * document is scored by `p_uni` alone (no BOS context). `p_bi` for an
   * unseen context backs off to the uniform `1 / (v + 1)`.
   * `cross_entropy = -(1/n) * sum ln p` in nats.
   *
   * Scale design (100 TB): all three model tables — unigram (|vocab|
   * rows), bigram (<= target token count rows), context totals (|vocab|
   * rows) — are target-bounded broadcasts, the contamination-benchmark
   * shape. The raw corpus is scored in ONE pass: per-doc positional
   * words, a lag window keyed by the uniformly-distributed doc id for
   * the bigram context, broadcast lookups, one map-side-combinable
   * per-doc aggregate. Nothing corpus-sized shuffles except the
   * (id, pos, word-id) scalar rows of that single window.
   */
  def perplexityScore(raw: DataFrame, idCol: String, textCol: String,
                      target: DataFrame, targetTextCol: String,
                      smoothing: Double = 1.0,
                      lambda: Double = 0.9): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    def words(t: Column) = split(Dedup.normText(t), " ")
    val spark = raw.sparkSession
    import spark.implicits._
    val oovKey = " oov"

    val tDocs = target.select(words(col(targetTextCol)).as("_ws"))
    // model frames localCheckpoint-ed: uni feeds the totals action AND
    // the scoring broadcast, bi feeds ctx AND the bigram broadcast —
    // un-materialized,
    // each consumer re-scanned + re-tokenized the target text. The count
    // tables are vocab-/target-token-bounded scalars (the proxy); the
    // text pass is the cost. One target scan per n-gram order remains.
    val uni = tDocs.select(explode(col("_ws")).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_c1")).localCheckpoint(false)
    val trow = uni.agg(coalesce(sum(col("_c1")), lit(0L)), count(lit(1))).collect()(0)
    val (nT, v) = (trow.getLong(0), trow.getLong(1))
    require(nT > 0, "perplexityScore: target corpus is empty")
    // adjacent-pair counts within each target doc (no cross-doc bigrams)
    val bi = tDocs.select(explode(zip_with(
        slice(col("_ws"), lit(1), greatest(size(col("_ws")) - 1, lit(0))),
        slice(col("_ws"), lit(2), greatest(size(col("_ws")) - 1, lit(0))),
        (a, b) => struct(a.as("p"), b.as("c")))).as("_pair"))
      .groupBy(col("_pair.p").as("_wp"), col("_pair.c").as("_wc"))
      .agg(count(lit(1)).as("_c2")).localCheckpoint(false)
    val ctx = bi.groupBy(col("_wp")).agg(sum(col("_c2")).as("_cc"))

    val denomU = nT + smoothing * (v + 1)
    val vp1 = (v + 1).toDouble
    // one pass over raw: positional words -> feature -> lag context
    val pos = raw.select(col(idCol),
        posexplode(words(col(textCol))).as(Seq("_p", "_w")))
      .join(broadcast(uni), Seq("_w"), "left")
      .withColumn("_f", when(col("_c1").isNull, lit(oovKey)).otherwise(col("_w")))
      .withColumn("_pu", (coalesce(col("_c1"), lit(0L)) + smoothing) / denomU)
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("_p"))
    val withPrev = pos.withColumn("_fp", lag(col("_f"), 1).over(wOrd))
      .join(broadcast(ctx.select(col("_wp").as("_fp"), col("_cc"))), Seq("_fp"), "left")
      .join(broadcast(bi.select(col("_wp").as("_fp"), col("_wc").as("_f"),
        col("_c2"))), Seq("_fp", "_f"), "left")
    val pBi = (coalesce(col("_c2"), lit(0L)) + smoothing) /
      (coalesce(col("_cc"), lit(0L)) + smoothing * vp1)
    val p = when(col("_fp").isNull, col("_pu")) // first token: unigram only
      .otherwise(lit(lambda) * pBi + lit(1 - lambda) * col("_pu"))
    withPrev.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(log(p)) / count(lit(1)), 6).as("cross_entropy"))
  }

  /**
   * Interpolated Kneser-Ney TRIGRAM perplexity (the fidelity upgrade over
   * [[perplexityScore]]'s add-1 bigram, closing most of the gap to CCNet's
   * KenLM signal — Wenzek et al. 2020; Kneser & Ney 1995; Chen & Goodman
   * 1999). Scores every raw document by per-token cross-entropy (nats)
   * under a KN-smoothed trigram LM of the TARGET corpus, with a fixed
   * discount `D` so the estimate is an exactly reproducible closed form
   * of integer count tables (that is what keeps the DuckDB oracle
   * hash-green where KenLM's estimated discounts would not be).
   *
   * Model over the target-vocab + OOV feature space (raw words absent
   * from the target vocabulary map to one OOV feature):
   * {{{
   * p1(w)      = (N1+(.w) + s) / (B + s * (V + 1))          // continuation
   * p2(w | v)  = [max(N1+(.vw) - D, 0) + D * N1+(v.) * p1(w)] / N1+(.v.)
   *              (backoff to p1 when v is an unseen context)
   * p3(w | u,v)= [max(c(uvw) - D, 0) + D * N1+(uv.) * p2(w|v)] / c(uv.)
   *              (backoff to p2 when (u,v) is an unseen context)
   * }}}
   * where N1+(.w) counts distinct bigram types ending in w, B is the
   * total bigram-type count, V the vocabulary size, and the middle-order
   * counts come from trigram TYPE statistics (true Kneser-Ney continuation
   * counts). The first token of a document is scored by p1, the second by
   * p2 — no synthetic BOS context. Each order is a proper distribution
   * (the discounted mass D * Ntypes / total is exactly what the lower
   * order redistributes), and the add-`smoothing` continuation unigram
   * gives OOV strictly positive mass.
   *
   * Scale design (100 TB raw corpus): every model table is TARGET-bounded
   * — trigram counts <= target tokens, all others are type counts bounded
   * above by that — and broadcast. The raw corpus is scored in ONE pass:
   * per-doc positional words, lag(1)/lag(2) over the doc-keyed window for
   * the two context features, five broadcast lookups, one map-side-
   * combinable per-doc aggregate. Only the (id, pos, word) scalar rows of
   * that single window shuffle.
   */
  def perplexityScoreKN(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        discount: Double = 0.75,
                        smoothing: Double = 1.0): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    def words(t: Column) = split(Dedup.normText(t), " ")
    val spark = raw.sparkSession
    import spark.implicits._
    val oovKey = " oov"

    val tDocs = target.select(words(col(targetTextCol)).as("_ws"))
    // model frames localCheckpoint-ed: uni/bi/tri each feed 2-4 consumers (type
    // counts, context totals, the scoring broadcasts, the v/bTypes
    // actions) — un-materialized, EVERY consumer re-scanned + re-tokenized
    // the target text (7 text passes for a 3-order model). The count
    // tables are target-token-bounded scalar rows (the proxy); one
    // target scan per n-gram order remains.
    val uni = tDocs.select(explode(col("_ws")).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_c1")).localCheckpoint(false)
    val v = uni.count()
    require(v > 0, "perplexityScoreKN: target corpus is empty")
    def adjPairs(ws: Column): Column = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => struct(a.as("p"), b.as("c")))
    // bigram types -> continuation-unigram counts N1+(.w) and B
    val bi = tDocs.select(explode(adjPairs(col("_ws"))).as("_pair"))
      .groupBy(col("_pair.p").as("_wp"), col("_pair.c").as("_wc"))
      .agg(count(lit(1)).as("_c2")).localCheckpoint(false)
    val cont1 = bi.groupBy(col("_wc").as("_f")).agg(count(lit(1)).as("_n1"))
    val bTypes = bi.count()
    // trigram counts + context totals; middle-order continuation counts
    val tri = tDocs.select(explode(zip_with(
        adjPairs(col("_ws")),
        slice(col("_ws"), lit(3), greatest(size(col("_ws")) - 2, lit(0))),
        (pr, w) => struct(pr.getField("p").as("u"), pr.getField("c").as("v"), w.as("w"))))
        .as("_t"))
      .filter(col("_t.w").isNotNull) // zip_with pads the shorter array
      .groupBy(col("_t.u").as("_u"), col("_t.v").as("_v"), col("_t.w").as("_w3"))
      .agg(count(lit(1)).as("_c3")).localCheckpoint(false)
    val ctx3 = tri.groupBy(col("_u"), col("_v"))
      .agg(sum(col("_c3")).as("_cuv"), count(lit(1)).as("_n3"))
    val cont2 = tri.groupBy(col("_v"), col("_w3"))
      .agg(count(lit(1)).as("_n1vw")) // distinct u per (v, w)
    val ctx2 = cont2.groupBy(col("_v"))
      .agg(sum(col("_n1vw")).as("_ncv"), count(lit(1)).as("_n2v"))

    val d = discount
    val denomP1 = bTypes + smoothing * (v + 1).toDouble
    // one pass over raw: positional words -> OOV-mapped feature -> lagged
    // trigram context -> broadcast count lookups
    val pos = raw.select(col(idCol),
        posexplode(words(col(textCol))).as(Seq("_p", "_w")))
      .join(broadcast(uni), Seq("_w"), "left")
      .withColumn("_f", when(col("_c1").isNull, lit(oovKey)).otherwise(col("_w")))
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("_p"))
    val ctxd = pos
      .withColumn("_f1", lag(col("_f"), 1).over(wOrd))
      .withColumn("_f2", lag(col("_f"), 2).over(wOrd))
      .join(broadcast(cont1), Seq("_f"), "left")
      .join(broadcast(ctx2.select(col("_v").as("_f1"), col("_ncv"), col("_n2v"))),
        Seq("_f1"), "left")
      .join(broadcast(cont2.select(col("_v").as("_f1"), col("_w3").as("_f"),
        col("_n1vw"))), Seq("_f1", "_f"), "left")
      .join(broadcast(ctx3.select(col("_u").as("_f2"), col("_v").as("_f1"),
        col("_cuv"), col("_n3"))), Seq("_f2", "_f1"), "left")
      .join(broadcast(tri.select(col("_u").as("_f2"), col("_v").as("_f1"),
        col("_w3").as("_f"), col("_c3"))), Seq("_f2", "_f1", "_f"), "left")
    val p1 = (coalesce(col("_n1"), lit(0L)) + smoothing) / denomP1
    val p2 = when(col("_ncv").isNull, p1).otherwise(
      (greatest(coalesce(col("_n1vw"), lit(0L)) - d, lit(0.0)) +
        lit(d) * col("_n2v") * p1) / col("_ncv"))
    val p3 = when(col("_cuv").isNull, p2).otherwise(
      (greatest(coalesce(col("_c3"), lit(0L)) - d, lit(0.0)) +
        lit(d) * col("_n3") * p2) / col("_cuv"))
    val p = when(col("_f1").isNull, p1)
      .otherwise(when(col("_f2").isNull, p2).otherwise(p3))
    ctxd.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(log(p)) / count(lit(1)), 6).as("cross_entropy"))
  }

  /**
   * Gumbel top-k importance resampling, the selection half of DSIR:
   * sample `n` rows without replacement with P(select) ∝
   * exp(`scoreCol` / temperature) — adding independent Gumbel noise to
   * each score and taking the top `n` is exactly softmax sampling
   * without replacement (the Gumbel-max trick). The "noise" is a hashed
   * uniform over `idCol`, so the sample is deterministic, reproducible
   * under any partitioning, and re-seedable. `temperature` → 0
   * approaches plain top-n by score; large temperature approaches
   * uniform sampling.
   *
   * Scale: orderBy+limit compiles to TakeOrderedAndProject — per-
   * partition top-n then a final merge of P×n rows, never a global sort.
   */
  def importanceResample(df: DataFrame, idCol: String, scoreCol: String,
                         n: Int, temperature: Double = 1.0,
                         seed: Long = 42L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val u = (pmod(xxhash64(col(idCol).cast("string"), lit(seed)),
      lit(1000000000L)).cast("double") + 0.5) / 1.0e9
    df.withColumn("_k", col(scoreCol) / temperature - log(-log(u)))
      .orderBy(col("_k").desc).limit(n).drop("_k")
  }

  /**
   * Epoch-weighted source mixing with UPSAMPLING — the pretraining
   * recipe shape ("Wikipedia 3.5 epochs, web 0.8"): each document of
   * source s appears `floor(e_s)` or `ceil(e_s)` times, the fractional
   * extra copy chosen by a deterministic per-document md5 uniform, so
   * each source's expected row/token mass is exactly `e_s ×` its corpus
   * mass and re-runs reproduce the same corpus bit-for-bit.
   * [[weightedMix]] DOWNSAMPLES to proportions; this op realizes a
   * multi-epoch recipe. One projection + explode — no shuffle, no
   * driver state; `outCol` carries the copy index (0-based) so
   * downstream shuffling/packing can spread repeats.
   */
  def epochsMix(df: DataFrame, idCol: String, sourceCol: String,
                epochs: Map[String, Double], defaultEpochs: Double = 1.0,
                outCol: String = "epoch_idx"): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "epoch factors must be >= 0")
    val eCol = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (s, e)) =>
      when(col(sourceCol) === s, lit(e)).otherwise(acc)
    }
    // deterministic uniform in [0,1): the md5-prefix recipe (same family
    // as numeric_key / the weightedMix bucketing — engine-portable)
    val u = expr(s"conv(substring(md5(cast($idCol as string)), 1, 8), 16, 10)")
      .cast("double") / lit(4294967296.0)
    val copies = (floor(eCol) +
      when(u < eCol - floor(eCol), 1).otherwise(0)).cast("int")
    df.withColumn("_gf_copies", copies)
      .where(col("_gf_copies") > 0)
      .withColumn(outCol, explode(sequence(lit(0), col("_gf_copies") - 1)))
      .drop("_gf_copies")
  }
}
