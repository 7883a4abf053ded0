package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Physical-plan audit helpers — the checks this library's own specs (and
 * the scale-tuning workflow) keep doing by hand: how many exchanges does
 * a plan have, did the filters/projection reach the scan, how much runs
 * inside whole-stage codegen. Ship them so a user can pin plan shapes in
 * their own tests ("this join must stay broadcast", "this scan must
 * prune columns") instead of eyeballing `.explain` output.
 */
object PlanAudit {

  final case class Audit(numExchanges: Int,
                         numBroadcastExchanges: Int,
                         numSortMergeJoins: Int,
                         numBroadcastJoins: Int,
                         wholeStageCodegenSpans: Int,
                         pushedFilters: Seq[String],
                         readSchemas: Seq[String],
                         numCartesianProducts: Int = 0,
                         numSinglePartitionExchanges: Int = 0) {
    /** True when no data-movement exchange remains (broadcasts allowed). */
    def shuffleFree: Boolean = numExchanges - numBroadcastExchanges == 0

    /** The two shapes that kill a plan at cluster scale: a cartesian
      * product (quadratic work) and a shuffle into ONE partition (all
      * data through a single reducer). A plan passing this can still be
      * slow, but it cannot be catastrophically unscalable. */
    def scaleSafe: Boolean =
      numCartesianProducts == 0 && numSinglePartitionExchanges == 0
  }

  // walk the physical plan INCLUDING AQE subtrees (whose current plan
  // hangs off executedPlan, not children)
  private def walk(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case _ => Nil
    }
    p +: (inner ++ (p.children ++ p.subqueries).flatMap(walk))
  }

  def audit(df: DataFrame): Audit = {
    val executed = df.queryExecution.executedPlan
    val nodes = walk(executed)
    val names = nodes.map(_.nodeName)
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    Audit(
      numExchanges = names.count(_.contains("Exchange")),
      numBroadcastExchanges = names.count(_.contains("BroadcastExchange")),
      numSortMergeJoins = names.count(_.contains("SortMergeJoin")),
      numBroadcastJoins = names.count(_.contains("BroadcastHashJoin")) +
        names.count(_.contains("BroadcastNestedLoopJoin")),
      wholeStageCodegenSpans = names.count(_.startsWith("WholeStageCodegen")),
      pushedFilters = scans.flatMap(s =>
        s.metadata.get("PushedFilters").toSeq.filter(_ != "[]")),
      readSchemas = scans.map(_.requiredSchema.toDDL),
      numCartesianProducts = names.count(_.contains("CartesianProduct")),
      numSinglePartitionExchanges = nodes.count {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.outputPartitioning.numPartitions == 1
        case _ => false
      })
  }

  /** Fraction of scanned columns actually required, per scan (pruning).
    * Uses the same AQE-aware walk as [[audit]] — a plain plan collect
    * sees nothing under AdaptiveSparkPlanExec. */
  def columnPruning(df: DataFrame): Seq[(String, Int, Int)] =
    walk(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("scan"),
          s.requiredSchema.size, s.relation.dataSchema.size)
    }
}
