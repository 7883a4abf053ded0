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
   * ratio), every other source keeps `weight_s × scale / n_s` of its
   * rows, and membership is a deterministic md5-uniform threshold over
   * `keyCols` — reproducible under any partitioning, prefix-stable as the
   * corpus grows, and expressible in ANSI SQL for the oracle.
   *
   * Scale shape: ONE map-side-combined count per source (driver-bounded:
   * one row per source), then a pure filter — no shuffle of the data.
   * Sources absent from `weights` are dropped (weight 0).
   */
  def weightedMix(df: DataFrame, sourceCol: String, keyCols: Seq[String],
                  weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weightedMix needs positive target weights")
    require(keyCols.nonEmpty, "weightedMix needs deterministic key columns")
    val counts = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.limit(0)
    // limiting source (largest weight-to-size ratio) pins the scale;
    // exact per-source take counts k_s = floor(w_s * scale) ≤ n_s
    val scale = present.map { case (s, w) => counts(s) / w }.min
    val takes = present.map { case (s, w) =>
      s -> math.max(math.floor(w * scale).toLong, 1L) }
    val maxTake = takes.values.max

    val key = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    val takeFor = takes.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col(sourceCol) === s, k).otherwise(acc)
    }
    // two-phase per-source rank (stratifiedSample's funnel-free shape)
    val localW = Window.partitionBy(col(sourceCol), col("_pid")).orderBy(col("_skey"))
    val globalW = Window.partitionBy(col(sourceCol)).orderBy(col("_skey"))
    df.filter(col(sourceCol).isin(present.keys.toSeq: _*))
      .withColumn("_skey", key)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") <= maxTake)
      .withColumn("_rn", row_number().over(globalW))
      .filter(col("_rn") <= takeFor)
      .drop("_skey", "_pid", "_lrn", "_rn")
  }
}
