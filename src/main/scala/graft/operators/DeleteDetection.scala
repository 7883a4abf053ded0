package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Delete detection (reference: odibi/transformers/delete_detection.py:39-840).
 *
 * Modes (odibi/config.py:118-131):
 *  - snapshot_diff: keys present in the previous snapshot but missing from
 *    the current one (reference uses prev-Delta-version exceptAll,
 *    delete_detection.py:84-170; here the previous snapshot is passed in);
 *  - sql_compare: anti-join target keys against the live source
 *    (delete_detection.py:369-484).
 *
 * Apply is soft (flag column + deleted_at) or hard (drop rows)
 * (delete_detection.py:531-681), with a fraction threshold guard
 * (DeleteThresholdExceeded, delete_detection.py:25).
 */
object DeleteDetection {

  final case class DeleteThresholdExceeded(fraction: Double, threshold: Double)
    extends RuntimeException(
      f"detected delete fraction $fraction%.4f exceeds threshold $threshold%.4f")

  /** Keys deleted between two snapshots: in `previous` but not `current`. */
  def detectSnapshotDiff(previous: DataFrame, current: DataFrame,
                         keys: Seq[String]): DataFrame =
    previous.select(keys.map(col): _*).distinct()
      .join(current.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Keys in `target` that no longer exist in the live `source`. */
  def detectSqlCompare(target: DataFrame, source: DataFrame,
                       keys: Seq[String]): DataFrame =
    target.select(keys.map(col): _*).distinct()
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /**
   * Soft-apply: flag matched keys, stamp `deleted_at`. Guard: if the deleted
   * fraction exceeds `maxDeleteFraction`, abort (a collapsed source upstream
   * would otherwise silently delete the world — reference keeps this guard
   * for the same reason).
   */
  def applySoft(target: DataFrame, deletedKeys: DataFrame, keys: Seq[String],
                flagCol: String = "_is_deleted", deletedAtCol: String = "_deleted_at",
                deletedAt: org.apache.spark.sql.Column = current_timestamp(),
                maxDeleteFraction: Option[Double] = None): DataFrame = {
    checkThreshold(target, deletedKeys, maxDeleteFraction)
    val marked = deletedKeys.select(keys.map(col) :+ lit(true).as("_del_match"): _*)
    target.join(marked, keys, "left")
      .withColumn(flagCol, coalesce(col("_del_match"), lit(false)))
      .withColumn(deletedAtCol, when(col(flagCol), deletedAt.cast("timestamp")))
      .drop("_del_match")
  }

  /** Hard-apply: drop matched keys (guarded like [[applySoft]]). */
  def applyHard(target: DataFrame, deletedKeys: DataFrame, keys: Seq[String],
                maxDeleteFraction: Option[Double] = None): DataFrame = {
    checkThreshold(target, deletedKeys, maxDeleteFraction)
    target.join(deletedKeys.select(keys.map(col): _*), keys, "left_anti")
  }

  private[graft] def checkThreshold(target: DataFrame, deletedKeys: DataFrame,
                                    maxDeleteFraction: Option[Double]): Unit =
    maxDeleteFraction.foreach { thr =>
      val total = target.count().max(1L)
      val deleted = deletedKeys.count()
      val frac = deleted.toDouble / total
      if (frac > thr) throw DeleteThresholdExceeded(frac, thr)
    }
}
