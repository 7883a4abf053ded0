package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation operators for the 100 TB path (beyond-reference; the
 * reference is single-node and has no skew surface).
 *
 * Spark's AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`) already
 * splits oversized SMJ partitions at runtime — prefer it. These operators
 * cover the cases AQE does not: skewed AGGREGATIONS (one hot group key
 * funnels into one reducer regardless of AQE) and joins where the skewed
 * side must stay hash-partitioned (e.g. a later stage reuses the
 * partitioning, or the build side is too big to split).
 */
object Skew {

  /**
   * Salted equi-join: the (skewed) left side gets a per-row salt in
   * [0, saltBuckets); the right side is replicated saltBuckets× with every
   * salt value; the join key becomes (keys..., salt). One hot key now
   * spreads over `saltBuckets` reducers at the cost of replicating the
   * right side — use when right is small-ish but above the broadcast
   * threshold. Supported joins: inner, left (salting the left side cannot
   * drop or duplicate its rows; right/full would).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 how: String = "inner", saltBuckets: Int = 8,
                 seed: Long = 42L): DataFrame = {
    require(Seq("inner", "left").contains(how),
      s"saltedJoin supports inner|left, got $how")
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val l = left.withColumn("_graft_salt",
      floor(rand(seed) * saltBuckets).cast("int"))
    val r = right.withColumn("_graft_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    l.join(r, keys :+ "_graft_salt", how).drop("_graft_salt")
  }

  /**
   * Two-phase aggregation for skewed group keys: partial-aggregate on
   * (keys, salt), then combine partials on keys. Equivalent results for
   * the decomposable aggregate functions sum/count/min/max/avg —
   * `aggs` maps output column -> (function, input column).
   *
   * Note Spark's hash aggregate already does map-side partial aggregation;
   * this helps when the DISTINCT group count is small but one group
   * dominates, so even the partial rows for the hot key land on one
   * reducer. The salt splits that reducer's work `saltBuckets` ways.
   */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Map[String, (String, String)],
                      saltBuckets: Int = 8, seed: Long = 42L): DataFrame = {
    val supported = Set("sum", "count", "min", "max", "avg")
    val bad = aggs.values.map(_._1).filterNot(supported)
    require(bad.isEmpty, s"non-decomposable aggregate(s): ${bad.mkString(", ")}")

    val salted = df.withColumn("_graft_salt",
      floor(rand(seed) * saltBuckets).cast("int"))

    // phase 1: partial aggregates per (keys, salt); avg carries sum+count
    val partials: Seq[Column] = aggs.toSeq.flatMap { case (out, (fn, in)) =>
      fn match {
        case "count" => Seq(count(col(in)).as(s"_p_$out"))
        case "avg" => Seq(sum(col(in)).as(s"_p_${out}_sum"),
          count(col(in)).as(s"_p_${out}_cnt"))
        case f => Seq(expr(s"$f(`$in`)").as(s"_p_$out"))
      }
    }
    val phase1 = salted.groupBy((keys :+ "_graft_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)

    // phase 2: combine partials per keys
    val finals: Seq[Column] = aggs.toSeq.map { case (out, (fn, _)) =>
      fn match {
        case "sum" | "count" => sum(col(s"_p_$out")).as(out)
        case "min" => min(col(s"_p_$out")).as(out)
        case "max" => max(col(s"_p_$out")).as(out)
        case "avg" =>
          (sum(col(s"_p_${out}_sum")) / sum(col(s"_p_${out}_cnt"))).as(out)
      }
    }
    phase1.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /**
   * Per-key skew report over candidate join/aggregation keys — the
   * measurement that tells you WHICH keys need [[saltedJoin]] /
   * [[saltedAggregate]] before a 1000-executor run discovers it the hard
   * way. For each column: the top-k hottest keys with their row share
   * and skew factor (key count over the mean count per distinct key —
   * 1.0 is perfectly uniform; a key at 50x mean will make one reducer do
   * 50x the work). One map-side-combined aggregation per column, scalar
   * rows only; top-k via TakeOrdered, no global sort.
   */
  def skewReport(df: DataFrame, columns: Seq[String],
                 topK: Int = 5): DataFrame = {
    require(columns.nonEmpty, "skewReport needs at least one column")
    import org.apache.spark.sql.expressions.Window
    val perCol = columns.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("key"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.agg(
        sum(col("n")).as("_total"), count(lit(1)).as("_distinct"))
      // orderBy+limit plans as TakeOrderedAndProject: per-partition top-k
      // merged on the driver — never a single-reducer global sort
      val top = counts.orderBy(col("n").desc, col("key").asc).limit(topK)
      top.crossJoin(broadcast(totals))
        .withColumn("rank", row_number().over( // bounded: <= topK rows
          Window.partitionBy(lit(1)).orderBy(col("n").desc, col("key").asc))
          .cast("long"))
        .select(lit(c).as("column"), col("key"), col("n"), col("rank"),
          // raw doubles: each is ONE correctly-rounded division of exact
          // integers, so the bits are engine-independent — rounding would
          // reintroduce .5-boundary divergence between decimal-string and
          // binary-value rounding
          (col("n") / col("_total")).as("share"),
          (col("n") * col("_distinct") / col("_total")).as("skew_factor"))
    }
    perCol.reduce(_ unionByName _)
  }
}
