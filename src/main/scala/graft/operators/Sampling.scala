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
}
