package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Merge strategies (reference: odibi/transformers/merge_transformer.py:18-30
 * — upsert / append_only / delete_match, with optional update / insert /
 * delete conditions over `source.` / `target.` and audit columns
 * merge_transformer.py:33-62).
 *
 * Snapshot algebra (no Delta jars in this environment): each strategy is a
 * pure (target, source) => merged DataFrame; on a Delta-enabled cluster the
 * identical conditions feed `DeltaTable.merge`. One shuffle on `keys`.
 */
object Merge {

  /**
   * Alias helpers: conditions may reference `target.col` / `source.col`.
   * Each side carries a presence marker so row classification after an
   * outer join does not depend on key nullability (keys NULL on both sides
   * <=>-match but would look absent under isNull tests).
   */
  private def joinFrames(target: DataFrame, source: DataFrame, keys: Seq[String]) = {
    val t = target.withColumn("_tgt_present", lit(true)).alias("target")
    val s = source.withColumn("_src_present", lit(true)).alias("source")
    val cond = keys.map(k => col(s"target.$k") <=> col(s"source.$k")).reduce(_ && _)
    (t, s, cond)
  }

  /**
   * upsert: matched target rows are replaced by source (when
   * `updateCondition` holds, else kept); unmatched source rows are inserted
   * (when `insertCondition` holds); unmatched target rows pass through.
   */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             updateCondition: Option[String] = None,
             insertCondition: Option[String] = None,
             auditCols: Map[String, Column] = Map.empty): DataFrame = {
    val outCols = target.columns.toSeq
    val (t, s, cond) = joinFrames(target, source, keys)
    val joined = t.join(s, cond, "full_outer")
    val matched = col("target._tgt_present").isNotNull && col("source._src_present").isNotNull
    val srcOnly = col("target._tgt_present").isNull
    val tgtOnly = col("source._src_present").isNull
    val updOk = updateCondition.map(expr).getOrElse(lit(true))
    val insOk = insertCondition.map(expr).getOrElse(lit(true))

    val takeSource = (matched && updOk) || (srcOnly && insOk)
    val keepTarget = tgtOnly || (matched && !updOk)
    val base = joined.filter(takeSource || keepTarget)
      .select(outCols.map { c =>
        when(takeSource, col(s"source.$c")).otherwise(col(s"target.$c")).as(c)
      }: _*)
    auditCols.foldLeft(base) { case (df, (name, c)) => df.withColumn(name, c) }
  }

  /**
   * append_only (idempotent bronze append, merge_transformer "append_once"):
   * insert source rows whose keys are absent from target; never update.
   */
  def appendOnly(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val newRows = source.join(target.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    target.unionByName(newRows.select(target.columns.map(col).toSeq: _*))
  }

  /**
   * delete_match: delete target rows whose keys match source (and satisfy
   * `deleteCondition`, evaluated over target./source. columns).
   */
  def deleteMatch(target: DataFrame, source: DataFrame, keys: Seq[String],
                  deleteCondition: Option[String] = None): DataFrame = {
    deleteCondition match {
      case None => target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      case Some(c) =>
        val outCols = target.columns.toSeq
        val (t, s, cond) = joinFrames(target, source, keys)
        val matched = col("source._src_present").isNotNull
        t.join(s, cond, "left")
          .filter(!(matched && expr(c)))
          .select(outCols.map(cn => col(s"target.$cn").as(cn)): _*)
    }
  }
}
