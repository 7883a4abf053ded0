package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/**
 * DataFrame test assertions (reference: odibi/testing/assertions.py —
 * assert_frame_equal / assert_schema_equal): the user-facing testing
 * surface for pipelines built on this library. Comparison is
 * set-semantic by default (row order is an execution detail), duplicates
 * count (exceptAll both ways, not a distinct diff), and numeric
 * tolerance rounds float/double columns on both sides before comparing.
 * Failures throw AssertionError with a bounded sample of the offending
 * rows — never a full collect of either side.
 */
object Assertions {

  /** Schemas must agree on column names and types, order-sensitive;
    * nullability is ignored (it is a physical detail in parquet). */
  def assertSchemaEqual(left: DataFrame, right: DataFrame): Unit = {
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    val (l, r) = (shape(left), shape(right))
    if (l != r)
      throw new AssertionError(
        s"schemas differ:\n  left:  ${l.mkString(", ")}\n  right: ${r.mkString(", ")}")
  }

  /**
   * Frames must contain the same multiset of rows. `checkOrder = true`
   * additionally zips row-by-row (only meaningful after an explicit sort).
   * `tolerance` rounds float/double columns to its decimal precision
   * before comparing (e.g. 1e-6 → 6 digits).
   */
  def assertFrameEqual(left: DataFrame, right: DataFrame,
                       checkOrder: Boolean = false,
                       checkSchema: Boolean = true,
                       tolerance: Double = 0.0,
                       sampleDiff: Int = 5): Unit = {
    if (checkSchema) assertSchemaEqual(left, right)
    val digits =
      if (tolerance <= 0.0) None
      else Some(math.max(0, math.ceil(-math.log10(tolerance)).toInt))
    def normalize(df: DataFrame): DataFrame = digits match {
      case None => df
      case Some(d) =>
        df.schema.fields.foldLeft(df) { (acc, f) =>
          f.dataType match {
            case DoubleType | FloatType =>
              acc.withColumn(f.name, round(col(f.name).cast("double"), d))
            case _ => acc
          }
        }
    }
    val l = normalize(left.toDF(left.columns: _*))
    val r = normalize(right.toDF(left.columns: _*)) // align names for except
    val (lc, rc) = (l.count(), r.count())
    if (lc != rc)
      throw new AssertionError(s"row counts differ: left=$lc right=$rc")
    val onlyLeft = l.exceptAll(r).take(sampleDiff)
    if (onlyLeft.nonEmpty)
      throw new AssertionError(
        s"rows only in left (showing ≤$sampleDiff):\n  ${onlyLeft.mkString("\n  ")}")
    val onlyRight = r.exceptAll(l).take(sampleDiff)
    if (onlyRight.nonEmpty)
      throw new AssertionError(
        s"rows only in right (showing ≤$sampleDiff):\n  ${onlyRight.mkString("\n  ")}")
    if (checkOrder) {
      import org.apache.spark.sql.Row
      def indexed(df: DataFrame) = df.rdd.zipWithIndex().map(_.swap)
      val mismatches = indexed(l).join(indexed(r))
        .filter { case (_, (a, b)) => a != b }
        .take(sampleDiff)
      if (mismatches.nonEmpty) {
        val show = mismatches.map { case (i, (a: Row, b: Row)) =>
          s"row $i: left=$a right=$b"
        }
        throw new AssertionError(
          s"row order differs (showing ≤$sampleDiff):\n  ${show.mkString("\n  ")}")
      }
    }
  }

  /** Row-count assertion with a readable failure. */
  def assertRowCount(df: DataFrame, expected: Long): Unit = {
    val n = df.count()
    if (n != expected)
      throw new AssertionError(s"expected $expected rows, got $n")
  }

  /** Column-presence assertion (subset, any order). */
  def assertHasColumns(df: DataFrame, columns: Seq[String]): Unit = {
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new AssertionError(
        s"missing columns: ${missing.mkString(", ")}; present: ${df.columns.mkString(", ")}")
  }
}
