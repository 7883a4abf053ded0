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
   * `tolerance` is an ABSOLUTE difference bound on float/double columns —
   * `|l − r| <= tolerance` passes, matching the reference
   * assert_frame_equal's abs-diff semantics (an earlier formulation
   * rounded both sides to decimal digits, which spuriously failed values
   * within tolerance straddling a rounding boundary). Non-float columns
   * always compare exactly; within equal non-float keys, duplicate rows
   * pair up in float-sorted (lexicographic) order. With MULTIPLE float
   * columns that greedy pairing is conservative: it can report a diff for
   * frames a cross pairing would match within tolerance, but it never
   * passes frames with no valid pairing — failures err toward noise,
   * not silence.
   */
  def assertFrameEqual(left: DataFrame, right: DataFrame,
                       checkOrder: Boolean = false,
                       checkSchema: Boolean = true,
                       tolerance: Double = 0.0,
                       sampleDiff: Int = 5): Unit = {
    if (checkSchema) assertSchemaEqual(left, right)
    val l = left.toDF(left.columns: _*)
    val r = right.toDF(left.columns: _*) // align names for except/join
    val floatCols = l.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }.toSeq
    val (lc, rc) = (l.count(), r.count())
    if (lc != rc)
      throw new AssertionError(s"row counts differ: left=$lc right=$rc")

    def exactDiff(a: DataFrame, b: DataFrame, what: String): Unit = {
      val onlyLeft = a.exceptAll(b).take(sampleDiff)
      if (onlyLeft.nonEmpty)
        throw new AssertionError(
          s"rows only in left$what (showing ≤$sampleDiff):\n  ${onlyLeft.mkString("\n  ")}")
      val onlyRight = b.exceptAll(a).take(sampleDiff)
      if (onlyRight.nonEmpty)
        throw new AssertionError(
          s"rows only in right$what (showing ≤$sampleDiff):\n  ${onlyRight.mkString("\n  ")}")
    }

    if (tolerance <= 0.0 || floatCols.isEmpty) exactDiff(l, r, "")
    else {
      val keyCols = l.columns.toSeq.filterNot(floatCols.contains)
      // non-float projection must agree exactly (multiset)
      if (keyCols.nonEmpty)
        exactDiff(l.select(keyCols.map(col): _*), r.select(keyCols.map(col): _*),
          " (non-float columns)")
      // pair rows within each non-float key group in float-sorted order,
      // then bound the absolute difference per float column
      import org.apache.spark.sql.expressions.Window
      def tag(df: DataFrame, suffix: String) = {
        val renamed = floatCols.foldLeft(df)((acc, c) =>
          acc.withColumnRenamed(c, c + suffix))
        renamed.withColumn("_idx" + suffix, row_number().over(
          Window.partitionBy(keyCols.map(col): _*)
            .orderBy(floatCols.map(c => col(c + suffix).asc): _*)))
      }
      val lt = tag(l, "_l")
      val rt = tag(r, "_r")
      val cond = keyCols.map(c => lt(c) <=> rt(c))
        .foldLeft(lt("_idx_l") === rt("_idx_r"))(_ && _)
      val paired = lt.join(rt, cond, "inner")
      // coalesce the abs-diff term: NULL vs value yields a NULL predicate,
      // which filter() would DROP — silently passing a real difference
      val bad = floatCols.map(c =>
          !(paired(c + "_l") <=> paired(c + "_r") ||
            coalesce(abs(paired(c + "_l") - paired(c + "_r")) <= tolerance,
              lit(false))))
        .reduce(_ || _)
      val mism = paired.filter(bad).take(sampleDiff)
      if (mism.nonEmpty)
        throw new AssertionError(
          s"float values differ beyond tolerance $tolerance (showing ≤$sampleDiff):\n  ${mism.mkString("\n  ")}")
    }

    if (checkOrder) {
      import org.apache.spark.sql.Row
      val floatIdx = l.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == DoubleType || f.dataType == FloatType => i
      }.toSet
      val tol = tolerance
      def same(a: Row, b: Row): Boolean =
        a.length == b.length && (0 until a.length).forall { i =>
          if (!floatIdx.contains(i) || tol <= 0.0) a.get(i) == b.get(i)
          else (a.isNullAt(i), b.isNullAt(i)) match {
            case (true, true) => true
            case (false, false) =>
              val (x, y) = (a.getAs[Number](i).doubleValue(), b.getAs[Number](i).doubleValue())
              x == y || (x.isNaN && y.isNaN) || math.abs(x - y) <= tol
            case _ => false
          }
        }
      def indexed(df: DataFrame) = df.rdd.zipWithIndex().map(_.swap)
      val mismatches = indexed(l).join(indexed(r))
        .filter { case (_, (a, b)) => !same(a, b) }
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
