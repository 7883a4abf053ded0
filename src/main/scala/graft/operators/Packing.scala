package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training pipelines: lay documents end-to-end in
 * a deterministic global order and chunk the stream into fixed token-budget
 * training sequences ("concat then chunk"). Each document is assigned the
 * sequence it STARTS in (`seq_id`) and its offset within that sequence
 * (`seq_offset`); a document whose tokens run past the budget simply
 * continues into the following sequence(s), exactly like the standard
 * pretraining data layout.
 *
 * Scale design (100 TB): the layout is a global prefix sum over the
 * document order, and a naive `sum() OVER (ORDER BY id)` window is a
 * single-reducer funnel — every row flows through ONE task. Instead:
 *
 *  1. range-repartition by the order key (Spark's RangePartitioner samples
 *     with per-partition deterministic seeds, so the partitioning is
 *     stable across the two passes below);
 *  2. partition-local running totals via a window keyed on the physical
 *     partition id — P independent reducers, no funnel;
 *  3. per-partition grand totals aggregate map-side into ≤ P rows, whose
 *     driver-side prefix offsets (one Long per partition) broadcast back.
 *
 * Net cost: one range shuffle of the (id, tokens) pairs plus a P-row
 * aggregate — the document bodies never need to participate at all.
 */
object Packing {

  /**
   * Assign each document its training-sequence id and offset.
   *
   * @param df        input with at least `idCol` and `tokenCol`
   * @param idCol     deterministic global order key (unique)
   * @param tokenCol  per-document token count (non-negative; null → 0)
   * @param budget    tokens per packed training sequence
   * @return input columns plus `seq_id` and `seq_offset` (both long)
   */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession

    val ranged = df
      .withColumn("_tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .repartitionByRange(col(idCol))
      .withColumn("_pid", spark_partition_id())

    // per-partition running total: P parallel reducers, not one
    val w = Window.partitionBy("_pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("_cum", sum(col("_tok")).over(w))

    // per-partition totals -> driver-side prefix offsets (≤ P longs)
    val totals = ranged.groupBy(col("_pid")).agg(sum(col("_tok")).as("_total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val prefix = totals.map { case (pid, tot) =>
      val row = (pid, acc); acc += tot; row
    }
    import spark.implicits._
    val prefixDf = prefix.toSeq.toDF("_pid", "_prefix")

    local.join(broadcast(prefixDf), Seq("_pid"))
      .withColumn("_start", col("_cum") + col("_prefix") - col("_tok"))
      .withColumn("seq_id", floor(col("_start") / budget))
      .withColumn("seq_offset", col("_start") % budget)
      .drop("_pid", "_tok", "_cum", "_prefix", "_start")
  }

  /**
   * Packed-corpus summary: total sequences the corpus packs into and mean
   * fill. `ceil(total_tokens / budget)` sequences with everything but the
   * tail full — one aggregate, no layout pass needed.
   */
  def packingStats(df: DataFrame, tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    df.agg(
      sum(coalesce(col(tokenCol).cast("long"), lit(0L))).as("_total"),
      count(lit(1)).as("n_docs"))
      .select(
        col("n_docs"),
        col("_total").as("total_tokens"),
        ceil(col("_total") / lit(budget.toDouble)).cast("long").as("n_sequences"))
  }
}
