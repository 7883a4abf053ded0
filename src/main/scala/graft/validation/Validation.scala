package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative validation over a node's output (reference:
 * odibi/validation/engine.py:359-578; test types odibi/config.py:2953-2983;
 * severities config.py:2985-2997).
 *
 * Perf posture mirrors the reference's documented fixes
 * (docs/features/validation_performance.md): all row-level predicates are
 * evaluated in ONE pass (a single select of counting aggregates), never one
 * scan per rule; the quarantine split computes the failure mask once.
 */
object Validation {

  sealed trait Severity
  case object Warn extends Severity
  case object Fail extends Severity
  case object Quarantine extends Severity

  /** One declarative test. `kind` ∈ the reference's test-type enum
    * (config.py:2953-2983): not_null, unique, accepted_values, row_count,
    * custom_sql, range, regex_match, volume_drop, schema, distribution,
    * freshness. */
  final case class Test(name: String, kind: String, severity: Severity = Fail,
                        columns: Seq[String] = Nil,
                        values: Seq[String] = Nil,
                        min: Option[Double] = None, max: Option[Double] = None,
                        sql: Option[String] = None,
                        pattern: Option[String] = None,
                        maxAgeHours: Option[Int] = None,
                        schemaDdl: Option[String] = None,
                        previousCount: Option[Long] = None)

  final case class TestResult(test: Test, passed: Boolean, failedRows: Long, detail: String)

  final case class ValidationError(failures: Seq[TestResult])
    extends RuntimeException(
      s"validation failed: ${failures.map(r => s"${r.test.name} (${r.detail})").mkString("; ")}")

  /**
   * Row-level failure predicate for a test, or None for dataset-level tests
   * (row_count, unique, freshness — those aggregate differently).
   */
  def rowPredicate(t: Test): Option[Column] = t.kind match {
    case "not_null" =>
      Some(t.columns.map(c => col(c).isNull).reduce(_ || _))
    case "accepted_values" => // null is not an accepted value
      Some(!coalesce(col(t.columns.head).isin(t.values: _*), lit(false)))
    case "range" =>
      val c = col(t.columns.head)
      val lo = t.min.map(v => c < v).getOrElse(lit(false))
      val hi = t.max.map(v => c > v).getOrElse(lit(false))
      Some(lo || hi || c.isNull)
    case "regex_match" =>
      Some(!coalesce(col(t.columns.head).rlike(t.pattern.get), lit(false)))
    case "custom_sql" => // sql expresses the VALID condition, like the reference
      Some(!coalesce(expr(t.sql.get), lit(false)))
    case _ => None
  }

  /**
   * Evaluate all tests in (at most) two jobs: one select of conditional
   * counts for row-level tests (engine.py:438-443 batching), plus
   * dataset-level aggregates for unique/row_count/freshness.
   */
  def evaluate(df: DataFrame, tests: Seq[Test]): Seq[TestResult] = {
    val rowTests = tests.flatMap(t => rowPredicate(t).map(t -> _))
    val rowResults: Map[String, Long] =
      if (rowTests.isEmpty) Map.empty
      else {
        val aggs = rowTests.map { case (t, pred) =>
          sum(when(pred, 1L).otherwise(0L)).as(t.name)
        } :+ count(lit(1)).as("_total")
        val row = df.select(aggs: _*).collect()(0)
        rowTests.map { case (t, _) => t.name -> Option(row.getAs[Long](t.name)).getOrElse(0L) }.toMap
      }

    tests.map { t =>
      t.kind match {
        case k if rowResults.contains(t.name) =>
          val n = rowResults(t.name)
          TestResult(t, n == 0, n, s"$k: $n failing rows")
        case "unique" =>
          val dups = df.groupBy(t.columns.map(col): _*).count().filter(col("count") > 1).count()
          TestResult(t, dups == 0, dups, s"unique: $dups duplicated keys")
        case "row_count" =>
          val n = df.count()
          val ok = t.min.forall(n >= _) && t.max.forall(n <= _)
          TestResult(t, ok, if (ok) 0 else n, s"row_count: $n")
        case "freshness" =>
          val maxTs = df.agg(max(col(t.columns.head).cast("timestamp"))).collect()(0).getTimestamp(0)
          val ageH = if (maxTs == null) Double.MaxValue
            else (System.currentTimeMillis() - maxTs.getTime) / 3600000.0
          val ok = t.maxAgeHours.forall(ageH <= _)
          TestResult(t, ok, if (ok) 0 else 1, f"freshness: age $ageH%.1f h")
        case "schema" =>
          val actual = df.schema.toDDL
          val ok = t.schemaDdl.contains(actual)
          TestResult(t, ok, if (ok) 0 else 1,
            if (ok) "schema: match" else s"schema: got $actual")
        case "volume_drop" =>
          // fail when the row count dropped by more than `max` fraction
          // vs the previous run's count (gate.py row-count-vs-history)
          val n = df.count()
          val prev = t.previousCount.getOrElse(0L)
          val drop = if (prev == 0) 0.0 else (prev - n).toDouble / prev
          val ok = t.max.forall(drop <= _)
          TestResult(t, ok, if (ok) 0 else n, f"volume_drop: $drop%.3f (was $prev, now $n)")
        case "distribution" =>
          // share of rows holding `values` in the column must lie in [min, max]
          val c = col(t.columns.head)
          val row = df.agg(
            (sum(when(c.isin(t.values: _*), 1L).otherwise(0L)).cast("double") /
              count(lit(1))).as("share")).collect()(0)
          val share = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
          val ok = t.min.forall(share >= _) && t.max.forall(share <= _)
          TestResult(t, ok, if (ok) 0 else 1, f"distribution: share $share%.4f")
        case other =>
          TestResult(t, passed = false, 0, s"unknown test kind: $other")
      }
    }
  }

  /** Throw on any failed test with severity Fail. */
  def enforce(results: Seq[TestResult]): Unit = {
    val hard = results.filter(r => !r.passed && r.test.severity == Fail)
    if (hard.nonEmpty) throw ValidationError(hard)
  }

  /**
   * Quarantine split (reference: odibi/validation/quarantine.py:248-660):
   * one pass computes the array of failed quarantine-rule names per row;
   * valid = empty array, invalid rows are stamped with
   * `_rejection_reason` / `_rejected_at` (quarantine.py:403).
   */
  def quarantineSplit(df: DataFrame, tests: Seq[Test],
                      rejectedAt: Column = current_timestamp()): (DataFrame, DataFrame) = {
    val qTests = tests.filter(_.severity == Quarantine).flatMap(t => rowPredicate(t).map(t -> _))
    if (qTests.isEmpty) return (df, df.limit(0)
      .withColumn("_rejection_reason", lit(null).cast("string"))
      .withColumn("_rejected_at", lit(null).cast("timestamp")))
    val failures = qTests.map { case (t, pred) => when(pred, lit(t.name)) }
    val marked = df.withColumn("_failed", array_compact(array(failures: _*)))
    val valid = marked.filter(size(col("_failed")) === 0).drop("_failed")
    val invalid = marked.filter(size(col("_failed")) > 0)
      .withColumn("_rejection_reason", concat_ws(",", col("_failed")))
      .withColumn("_rejected_at", rejectedAt.cast("timestamp"))
      .drop("_failed")
    (valid, invalid)
  }

  /**
   * Gate (reference: odibi/validation/gate.py:31-240): pass-rate over
   * evaluated tests + row-count bounds; on_fail abort => throw.
   */
  def gate(results: Seq[TestResult], minPassRate: Double = 1.0,
           abortOnFail: Boolean = true): Boolean = {
    val rate = if (results.isEmpty) 1.0
      else results.count(_.passed).toDouble / results.size
    val ok = rate >= minPassRate
    if (!ok && abortOnFail)
      throw ValidationError(results.filterNot(_.passed))
    ok
  }

  /**
   * FK validation (reference: odibi/validation/fk.py:262-306): orphans =
   * fact keys with no match in the dimension (left anti join).
   */
  def fkOrphans(fact: DataFrame, factKeys: Seq[String],
                dim: DataFrame, dimKeys: Seq[String]): DataFrame = {
    val cond = factKeys.zip(dimKeys).map { case (f, d) => fact(f) === dim(d) }.reduce(_ && _)
    fact.join(dim.select(dimKeys.map(col): _*).distinct(), cond, "left_anti")
  }
}
