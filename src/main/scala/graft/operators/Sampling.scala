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
    val localW = Window.partitionBy(strata :+ col("_pid"): _*).orderBy(col("_skey"))
    val globalW = Window.partitionBy(strata: _*).orderBy(col("_skey"))
    df.withColumn("_skey", key)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") <= n)
      .withColumn("_rn", row_number().over(globalW))
      .filter(col("_rn") <= n)
      .drop("_skey", "_pid", "_lrn", "_rn")
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
}
