package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/**
 * Product-quantization (PQ) expressions — the memory-scale path for
 * embedding search (Jégou et al., "Product Quantization for Nearest
 * Neighbor Search", TPAMI 2011; the IVF-PQ layout FAISS popularized).
 *
 * A `dim`-float vector compresses to `m` bytes: the vector splits into
 * `m` subvectors and each subvector is replaced by the index of its
 * nearest centroid in that subspace's `ksub`-entry codebook. At 100 TB,
 * the candidate-scoring table shrinks from `dim×4` bytes/row to `m`
 * bytes/row (32× at dim=64, m=8) — candidate scans, shuffles and cache
 * residency all scale down by that factor, and only the final re-rank
 * touches full vectors.
 *
 * Both expressions run as tight unboxed loops with codegen — the same
 * reasoning as the other native expressions here (HOF formulations are
 * interpreted per element).
 */
object PqImpls {

  private def toDoubles(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    v
  }

  /** codes(i) = argmin_j L2(subvec_i, books(i)(j)), one byte per subspace. */
  def pqEncode(vec: ArrayData, books: Array[Array[Array[Double]]],
               isFloat: Boolean): Array[Byte] = {
    val v = toDoubles(vec, isFloat)
    val m = books.length
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = books(s)
      val dsub = book(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var dist = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v(off + t) - c(t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  /** Asymmetric distance: dot(query, reconstruction(codes)) — the query
    * stays exact, the candidate is its codebook reconstruction. */
  def pqAdcDot(codes: Array[Byte], qvec: ArrayData,
               books: Array[Array[Array[Double]]], isFloat: Boolean): Double = {
    val q = toDoubles(qvec, isFloat)
    var acc = 0.0
    var off = 0
    var s = 0
    while (s < codes.length) {
      val c = books(s)(codes(s) & 0xFF)
      var t = 0
      while (t < c.length) {
        acc += q(off + t) * c(t)
        t += 1
      }
      off += c.length
      s += 1
    }
    acc
  }
}

/** `binary` PQ code column from a float/double array column, against a
  * static (driver-trained, plan-inlined) codebook. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
  extends UnaryExpression {
  require(books.nonEmpty && books.forall(b => b.nonEmpty && b.length <= 256),
    "PQ needs 1..256 centroids per subspace (codes are bytes)")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_encode needs a float/double array, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PqImpls.pqEncode(input.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqImpls.pqEncode($c, $booksRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric dot product of an exact query vector against a PQ code. */
case class PqAdcDot(left: Expression, right: Expression,
                    books: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  @transient private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_adc_dot needs a float/double query array, got $other")
  }

  override def nullSafeEval(codes: Any, qvec: Any): Any =
    PqImpls.pqAdcDot(codes.asInstanceOf[Array[Byte]],
      qvec.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.expressions.PqImpls.pqAdcDot($c, $q, $booksRef, $isFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(vec), books))

  def pqAdcDot(codes: Column, qvec: Column,
               books: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqAdcDot(ColumnShim.expression(codes),
      ColumnShim.expression(qvec), books))
}
