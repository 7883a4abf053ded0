package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Exactly-once derived-table updates via a claim guard table (reference:
 * odibi/derived_updater.py — guard table `meta_derived_applied_runs`,
 * try_claim / mark_applied / mark_failed lifecycle with stale-claim
 * reclaim; invariants header: claim operations are FAIL-FAST and never
 * swallow exceptions).
 *
 * The guard lives as an append-only parquet log under the catalog root
 * (the reference uses Delta/SQL Server transactions; this stand-in keeps
 * the same protocol over plain appends). Because parquet append has no
 * compare-and-swap, claiming is OPTIMISTIC with read-back arbitration:
 *
 *  1. append a `claimed` row carrying a unique claim id;
 *  2. re-read the key's log and deterministically elect a winner — the
 *     lowest (claimed_at, claim_id) among live claims (not failed, not
 *     older than the stale threshold);
 *  3. only the winner runs the update and appends `applied`; a failure
 *     appends `failed`, which releases the claim for retry.
 *
 * An `applied` row is terminal: the (derived_table, run_id) pair never
 * re-applies on any LATER attempt — the contract that makes re-running a
 * finished orchestration idempotent, which is the derived_updater use
 * case. For truly simultaneous claimers the arbitration is best-effort:
 * a claimer whose re-read races ahead of the other's append visibility
 * can win alongside it, and a claimer that outlives the stale threshold
 * can be reclaimed while still running — a hard mutual-exclusion
 * guarantee needs the transactional store the reference uses
 * (Delta/SQL Server); swap the append layer for one to get it.
 */
final class DerivedUpdater(spark: SparkSession, root: String,
                           maxClaimAgeMinutes: Long = 60L) {
  import spark.implicits._

  private val guardPath = s"$root/meta_derived_applied_runs"

  /** Valid derived tables (derived_updater.py VALID_DERIVED_TABLES). */
  val validTables: Set[String] =
    Set("meta_daily_stats", "meta_pipeline_health", "meta_sla_status")

  final case class Claim(derivedTable: String, runId: String, claimId: String)

  private def appendRow(table: String, runId: String, claimId: String,
                        status: String): Unit =
    Seq((table, runId, claimId, status))
      .toDF("derived_table", "run_id", "claim_id", "status")
      .withColumn("recorded_at", current_timestamp())
      .coalesce(1).write.mode("append").parquet(guardPath)

  private def log(table: String, runId: String) =
    try spark.read.parquet(guardPath)
      .filter(col("derived_table") === table && col("run_id") === runId)
      .select("claim_id", "status", "recorded_at")
      .collect().toSeq
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if AtomicParquet.isMissingPath(e) => Nil
    }

  /** Has this (derived_table, run_id) already been applied? */
  def isApplied(table: String, runId: String): Boolean =
    log(table, runId).exists(_.getAs[String]("status") == "applied")

  /**
   * Try to claim the update. None when already applied or another live
   * claim wins arbitration. Failed and stale claims do not block.
   */
  def tryClaim(table: String, runId: String): Option[Claim] = {
    require(validTables.contains(table),
      s"unknown derived table '$table'; valid: ${validTables.toSeq.sorted.mkString(", ")}")
    if (isApplied(table, runId)) return None
    val claimId = java.util.UUID.randomUUID().toString
    appendRow(table, runId, claimId, "claimed")

    val rows = log(table, runId)
    if (rows.exists(_.getAs[String]("status") == "applied")) return None
    // failed = body ran and threw; released = lost arbitration and stepped
    // aside — both statuses free the key
    val dead = rows.filter(r => Set("failed", "released")(r.getAs[String]("status")))
      .map(_.getAs[String]("claim_id")).toSet
    val staleBefore = System.currentTimeMillis() - maxClaimAgeMinutes * 60000L
    val live = rows
      .filter(_.getAs[String]("status") == "claimed")
      .filterNot(r => dead.contains(r.getAs[String]("claim_id")))
      // our own claim is live by definition (we are actively here); other
      // claims expire after the stale threshold (a hung claimer must not
      // block the key forever)
      .filter(r => r.getAs[String]("claim_id") == claimId ||
        r.getAs[java.sql.Timestamp]("recorded_at").getTime >= staleBefore)
    val winner = live.minByOption(r =>
      (r.getAs[java.sql.Timestamp]("recorded_at").getTime,
        r.getAs[String]("claim_id")))
    if (winner.exists(_.getAs[String]("claim_id") == claimId))
      Some(Claim(table, runId, claimId))
    else {
      // step aside so our row never blocks the next claimer
      appendRow(table, runId, claimId, "released")
      None
    }
  }

  /** Terminal: the pair will never re-apply. Fail-fast — errors propagate. */
  def markApplied(claim: Claim): Unit =
    appendRow(claim.derivedTable, claim.runId, claim.claimId, "applied")

  /** Releases the claim so a later attempt can retry. Fail-fast. */
  def markFailed(claim: Claim): Unit =
    appendRow(claim.derivedTable, claim.runId, claim.claimId, "failed")

  /**
   * Exactly-once wrapper (derived_updater.py apply_derived_update): claim,
   * run `body`, mark applied; on failure mark failed and rethrow. Returns
   * true when the body ran here, false when skipped (already applied or
   * lost arbitration).
   */
  def applyOnce(table: String, runId: String)(body: => Unit): Boolean =
    tryClaim(table, runId) match {
      case None => false
      case Some(claim) =>
        try { body; markApplied(claim); true }
        catch { case e: Throwable => markFailed(claim); throw e }
    }
}
