package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
 *  1. derive P range buckets from driver-collected id quantiles — the
 *     bucket is a PURE FUNCTION OF THE ROW'S ID, so every pass over the
 *     plan assigns identical buckets by construction (an earlier
 *     formulation used `spark_partition_id()` after repartitionByRange,
 *     but RangePartitioner re-samples per action with an rdd-id-derived
 *     seed, so two passes could disagree at boundaries — silent
 *     corruption at scale);
 *  2. partition-local running totals via a window keyed on the bucket —
 *     P independent reducers, no funnel;
 *  3. per-bucket grand totals aggregate map-side into ≤ P rows, whose
 *     driver-side prefix offsets (one Long per bucket) broadcast back.
 *
 * Net cost: one quantile sketch + one bucket-keyed shuffle of the
 * (id, tokens) pairs — pass a narrow frame; any extra columns ride the
 * shuffle.
 */
object Packing {

  /** Bucket index of `id` among sorted boundaries (count of bounds < id,
    * ties to the left so the mapping is total and deterministic). Native
    * binary search ([[graft.expressions.RangeBucket]]): O(log P) codegen'd
    * per row, vs O(P) interpreted for the HOF formulation — at thousands
    * of buckets the HOF would dominate the pass. */
  private def bucketExpr(id: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else graft.expressions.HashFunctions.rangeBucket(id.cast("double"), bounds)

  /**
   * Assign each document its training-sequence id and offset.
   *
   * @param df        input with at least `idCol` and `tokenCol`
   * @param idCol     deterministic global order key (unique, NUMERIC — the
   *                  quantile bucketing needs an ordered numeric domain)
   * @param tokenCol  per-document token count (non-negative; null → 0)
   * @param budget    tokens per packed training sequence
   * @return input columns plus `seq_id` and `seq_offset` (both long)
   */
  def packSequences(df0: DataFrame, idCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // fail fast on null ids: the distributed path's range bucket would be
    // null for them and the prefix join would SILENTLY drop the rows
    // (while the fallback path kept them) — a null id is a contract
    // violation, so both paths now raise on the first one seen
    val df = df0.filter(assert_true(col(idCol).isNotNull,
      lit(s"packSequences: null $idCol — the order key must be unique and non-null")).isNull)
    val spark = df.sparkSession

    // Non-numeric order keys (string/UUID ids) can't be quantile-bucketed;
    // fall back to the exact single-reducer global window. Correct at any
    // size but a funnel — map ids to a numeric key first for the
    // distributed path.
    if (!df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]) {
      val w = Window.orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return df
        .withColumn("_tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
        .withColumn("_start", sum(col("_tok")).over(w) - col("_tok"))
        .withColumn("seq_id", floor(col("_start") / budget))
        .withColumn("seq_offset", col("_start") % budget)
        .drop("_tok", "_start")
    }

    // P-1 interior boundaries from a quantile sketch — collected ONCE, so
    // bucket assignment is frozen on the driver before any pass runs
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val probes = (1 until p).map(_.toDouble / p).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(idCol, probes, 0.001).distinct.sorted

    val bucketed = df
      .withColumn("_tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("_bkt", bucketExpr(col(idCol), bounds))

    // per-bucket running total: P parallel reducers, not one
    val w = Window.partitionBy("_bkt").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("_cum", sum(col("_tok")).over(w))

    // per-bucket totals -> driver-side prefix offsets (≤ P longs)
    val totals = bucketed.groupBy(col("_bkt")).agg(sum(col("_tok")).as("_total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val prefix = totals.map { case (bkt, tot) =>
      val row = (bkt, acc); acc += tot; row
    }
    import spark.implicits._
    val prefixDf = prefix.toSeq.toDF("_bkt", "_prefix")

    local.join(broadcast(prefixDf), Seq("_bkt"))
      .withColumn("_start", col("_cum") + col("_prefix") - col("_tok"))
      .withColumn("seq_id", floor(col("_start") / budget))
      .withColumn("seq_offset", col("_start") % budget)
      .drop("_bkt", "_tok", "_cum", "_prefix", "_start")
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
