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
}
