package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Joins, set ops and reshaping (reference: odibi/transformers/relational.py).
 *
 * Scale notes: joins are declared, never hand-scheduled — Catalyst + AQE
 * pick broadcast / shuffled-hash / sort-merge at runtime. Callers can pass
 * `broadcastRight = true` for known-small dimensions (the reference has no
 * such hint; at 100 TB it matters).
 */
object Relational {

  /**
   * join (relational.py:16-250): equi-join on shared key names with
   * collision handling — right-side non-key columns that collide with left
   * names are renamed `{prefix}_{col}` (relational.py:196-206). Supported
   * how: inner, left, right, full, cross, anti, semi.
   */
  def join(left: DataFrame, right: DataFrame, on: Seq[String], how: String = "inner",
           prefix: String = "right", broadcastRight: Boolean = false): DataFrame = {
    val sparkHow = how.toLowerCase match {
      case "anti" => "left_anti"
      case "semi" => "left_semi"
      case other => other
    }
    if (sparkHow == "cross") return left.crossJoin(right)
    require(on.nonEmpty, s"join ($how) requires non-empty key list `on`")

    val collisions = right.columns.filterNot(on.contains).toSet
      .intersect(left.columns.filterNot(on.contains).toSet)
    val renamedRight = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${prefix}_$c"))
    val r = if (broadcastRight) broadcast(renamedRight) else renamedRight
    left.join(r, on, sparkHow)
  }

  /**
   * union (relational.py:260-385): UNION ALL of 2+ frames; `byName` aligns
   * columns by name (missing columns are an error, like the reference).
   */
  def union(frames: Seq[DataFrame], byName: Boolean = true): DataFrame = {
    require(frames.nonEmpty, "union needs at least one frame")
    if (byName) frames.reduce(_.unionByName(_)) else frames.reduce(_.union(_))
  }

  /**
   * pivot (relational.py:389-545). Passing explicit `values` skips the
   * distinct-scan Spark otherwise needs — at scale always pass them.
   * Output columns are named exactly the pivot values (single aggregation).
   */
  def pivot(df: DataFrame, groupBy: Seq[String], pivotCol: String, aggCol: String,
            aggFunc: String = "sum", values: Seq[String] = Nil): DataFrame = {
    val grouped = df.groupBy(groupBy.map(col): _*)
    val pivoted = if (values.nonEmpty) grouped.pivot(pivotCol, values) else grouped.pivot(pivotCol)
    val aggExpr = aggFunc.toLowerCase match {
      case "sum" => sum(col(aggCol))
      case "count" => count(col(aggCol))
      case "avg" | "mean" => avg(col(aggCol))
      case "max" => max(col(aggCol))
      case "min" => min(col(aggCol))
      case "first" => first(col(aggCol))
      case other => throw new IllegalArgumentException(s"unknown agg_func: $other")
    }
    pivoted.agg(aggExpr)
  }

  /** unpivot / melt (relational.py:546-692). */
  def unpivot(df: DataFrame, idCols: Seq[String], valueVars: Seq[String],
              varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueVars.map(col).toArray, varName, valueName)

  /**
   * aggregate (relational.py:680-770): group_by + col->fn map. The
   * reference keeps the INPUT column name as the output name
   * (`SUM(col) AS col`, relational.py:739-741) — reproduced here.
   */
  def aggregate(df: DataFrame, groupBy: Seq[String],
                aggregations: Seq[(String, String)]): DataFrame = {
    val exprs = aggregations.map { case (c, fn) =>
      val e = fn.toLowerCase match {
        case "sum" => sum(col(c))
        case "avg" | "mean" => avg(col(c))
        case "min" => min(col(c))
        case "max" => max(col(c))
        case "count" => count(col(c))
        case "count_distinct" => countDistinct(col(c))
        case "first" => first(col(c))
        case other => throw new IllegalArgumentException(s"unknown agg fn: $other")
      }
      e.as(c)
    }
    if (groupBy.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /**
   * AS-OF (point-in-time) join — beyond-reference; Spark has no built-in
   * and it's the join a feature-store / time-series training pipeline needs
   * (each left event picks the LATEST right row with rightTs <= leftTs per
   * key, optionally within `toleranceSeconds`).
   *
   * Scale shape: NOT an inequality join (which Catalyst executes as a
   * broadcast-nested-loop). The two sides are union-tagged and processed
   * with ONE window over (keys, ts): last_value(right attrs, ignoreNulls)
   * carries the most recent right row forward onto each left row. One
   * shuffle + one sort, linear output — survives 100× where a range
   * condition would go quadratic.
   *
   * Right-side attribute columns arrive as `{prefix}_{col}` (null when no
   * right row precedes the event / outside tolerance). Right rows with
   * duplicate (keys, ts) are reduced to the last one by input order of the
   * remaining sort — dedupe upstream if that matters.
   */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               toleranceSeconds: Option[Long] = None,
               prefix: String = "right"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "asOfJoin requires join keys")
    val rightAttrs = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.toSeq

    // tag and align the two sides: right rows carry their attrs + their ts,
    // left rows carry nulls for them
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_g_ts"), lit(0).as("_g_side"),
          col(rightTs).as("_g_rts")) ++
        rightAttrs.map(c => col(c).as(s"_g_$c")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"_l_$c")): _*)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_g_ts"), lit(1).as("_g_side"),
          lit(null).cast(right.schema(rightTs).dataType).as("_g_rts")) ++
        rightAttrs.map(c => lit(null).cast(right.schema(c).dataType).as(s"_g_$c")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")): _*)

    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    // event at exactly the right row's ts sees it (ASOF >= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_g_ts").asc, col("_g_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("_m_rts", last(col("_g_rts"), ignoreNulls = true).over(w))
    val withAttrs = rightAttrs.foldLeft(carried) { (d, c) =>
      d.withColumn(s"_m_$c", last(col(s"_g_$c"), ignoreNulls = true).over(w))
    }

    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col("_m_rts").isNotNull &&
          (unix_timestamp(col("_g_ts")) - unix_timestamp(col("_m_rts"))) <= tol
      case None => col("_m_rts").isNotNull
    }
    withAttrs.filter(col("_g_side") === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
          Seq(when(withinTol, col("_m_rts")).otherwise(lit(null))
            .as(s"${prefix}_$rightTs")) ++
          rightAttrs.map(c => when(withinTol, col(s"_m_$c")).otherwise(lit(null))
            .as(s"${prefix}_$c")): _*)
  }

  /**
   * Range (interval) join — beyond-reference: left point rows matched to
   * right interval rows [startCol, endCol) sharing `keys`.
   *
   * Scale shape: intervals are exploded into fixed-width bins and joined
   * on (keys, bin) — an equi-join Catalyst can shuffle/broadcast — then the
   * exact containment predicate verifies. `binSeconds` should be on the
   * order of the typical interval length: too small explodes the right
   * side, too large degrades selectivity (candidates per bin grow).
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                binSeconds: Long = 3600L, how: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(how), s"rangeJoin supports inner|left, got $how")
    val pBin = (unix_timestamp(col(pointCol)) / binSeconds).cast("long")
    val rBinned = right.withColumn("_g_bin",
      explode(sequence(
        (unix_timestamp(col(startCol)) / binSeconds).cast("long"),
        (unix_timestamp(col(endCol)) / binSeconds).cast("long"))))
    val lBinned = left.withColumn("_g_bin", pBin)
    how match {
      case "inner" =>
        lBinned.join(rBinned, keys :+ "_g_bin", "inner")
          .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
          .drop("_g_bin")
      case "left" =>
        // Single-pass left outer: the point maps to exactly ONE bin, so with
        // the containment predicate inside the join condition an unmatched
        // left row surfaces exactly once with null right attrs — no second
        // evaluation of the bin-join to compute matched keys.
        val l = lBinned.alias("_gl")
        val r = rBinned.alias("_gr")
        val cond = (keys :+ "_g_bin").map(c => l(c) === r(c)).reduce(_ && _) &&
          l(pointCol) >= r(startCol) && l(pointCol) < r(endCol)
        val rightOnly = right.columns.filterNot(keys.contains)
        l.join(r, cond, "left")
          .select(keys.map(l(_)) ++
            left.columns.filterNot(keys.contains).map(l(_)) ++
            rightOnly.map(r(_)): _*)
    }
  }
}
