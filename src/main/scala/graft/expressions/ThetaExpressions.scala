package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union, UpdateSketch, UpdateSketchBuilder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Theta sketches (Datasketches KMV family) as native Catalyst
 * aggregates — the SET-ALGEBRA twin of the HLL distinct-count sketches:
 * theta sketches additionally support INTERSECTION and DIFFERENCE, so
 * "distinct users in segment A and B", "in A but not B" resolve from
 * per-segment sketches without rescanning raw data.
 *
 * The 100 TB pattern: store one ~`8·k`-byte sketch per (day, segment);
 * any cross-segment overlap question is then driver-cheap set algebra
 * over sketches. HLL cannot answer these (inclusion-exclusion on HLL
 * estimates explodes in error past two sets); theta intersections carry
 * a published error bound.
 *
 * Determinism: a theta sketch retains the k smallest hash values — a
 * pure function of the input VALUE SET (order- and partitioning-
 * independent) — so results are exactly reproducible, and exact while
 * the distinct count stays under the nominal k.
 */
/**
 * Aggregation buffer: raw values land in an UpdateSketch; merged-in
 * partial results (which arrive as compact sketches — an UpdateSketch
 * cannot absorb them) accumulate in a lazily-created Union. The result
 * is a fresh union of both parts, so repeated eval is idempotent.
 */
final class ThetaAggBuffer(val lgK: Int) {
  val update: UpdateSketch =
    new UpdateSketchBuilder().setLogNominalEntries(lgK).build()
  private var merged: Union = _

  def absorb(cs: CompactSketch): Unit = {
    if (merged == null)
      merged = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    merged.union(cs)
  }

  def result: CompactSketch = {
    if (merged == null) update.compact(true, null)
    else {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      u.union(merged.getResult)
      u.union(update.compact(true, null))
      u.getResult
    }
  }
}

case class ThetaSketchAgg(child: Expression, lgK: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaAggBuffer] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): ThetaAggBuffer = new ThetaAggBuffer(lgK)

  override def update(buf: ThetaAggBuffer, row: InternalRow): ThetaAggBuffer = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case LongType => buf.update.update(v.asInstanceOf[Long])
      case IntegerType => buf.update.update(v.asInstanceOf[Int].toLong)
      case DoubleType => buf.update.update(v.asInstanceOf[Double])
      case StringType => buf.update.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buf.update.update(v.asInstanceOf[Array[Byte]])
      case other => throw new IllegalArgumentException(
        s"theta_sketch_agg: unsupported value type $other")
    }
    buf
  }

  override def merge(buf: ThetaAggBuffer, other: ThetaAggBuffer): ThetaAggBuffer = {
    buf.absorb(other.result); buf
  }

  override def eval(buf: ThetaAggBuffer): Any = buf.result.toByteArray

  override def serialize(buf: ThetaAggBuffer): Array[Byte] =
    buf.result.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaAggBuffer = {
    val b = new ThetaAggBuffer(lgK)
    b.absorb(CompactSketch.heapify(Memory.wrap(bytes)))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c.head)
}

/** Union of serialized theta sketches (re-aggregation to coarser grain). */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null)
      buf.union(CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = c.head)
}

/** Static helpers shared by eval and generated code. */
object ThetaImpls {

  def estimate(bytes: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(bytes)).getEstimate

  def pairUnion(a: Array[Byte], b: Array[Byte], lgK: Int): Array[Byte] = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(a)))
    u.union(CompactSketch.heapify(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(CompactSketch.heapify(Memory.wrap(a)))
    i.intersect(CompactSketch.heapify(Memory.wrap(b)))
    i.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB().aNotB(
      CompactSketch.heapify(Memory.wrap(a)),
      CompactSketch.heapify(Memory.wrap(b))).toByteArray
}

/** Distinct-count estimate from a serialized theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(input: Any): Any =
    ThetaImpls.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ThetaImpls.estimate($c);")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Pairwise set ops over serialized theta sketches. */
case class ThetaPairOp(left: Expression, right: Expression, op: String,
                       lgK: Int = 12) extends BinaryExpression {
  require(Seq("union", "intersect", "diff").contains(op),
    s"theta op must be union/intersect/diff, got $op")

  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"

  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "union" => ThetaImpls.pairUnion(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], lgK)
    case "intersect" => ThetaImpls.intersect(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
    case "diff" => ThetaImpls.aNotB(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => op match {
      case "union" => s"${ev.value} = graft.expressions.ThetaImpls.pairUnion($a, $b, $lgK);"
      case "intersect" => s"${ev.value} = graft.expressions.ThetaImpls.intersect($a, $b);"
      case "diff" => s"${ev.value} = graft.expressions.ThetaImpls.aNotB($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaPairOp =
    copy(left = newLeft, right = newRight)
}

object ThetaFunctions {
  def thetaSketchAgg(v: Column, lgK: Int = 12): Column =
    ColumnShim.column(
      ThetaSketchAgg(ColumnShim.expression(v), lgK).toAggregateExpression())

  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column =
    ColumnShim.column(
      ThetaUnionAgg(ColumnShim.expression(sketch), lgK).toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ColumnShim.column(ThetaEstimate(ColumnShim.expression(sketch)))

  def thetaUnion(a: Column, b: Column, lgK: Int = 12): Column =
    ColumnShim.column(ThetaPairOp(
      ColumnShim.expression(a), ColumnShim.expression(b), "union", lgK))

  def thetaIntersect(a: Column, b: Column): Column =
    ColumnShim.column(ThetaPairOp(
      ColumnShim.expression(a), ColumnShim.expression(b), "intersect"))

  def thetaDiff(a: Column, b: Column): Column =
    ColumnShim.column(ThetaPairOp(
      ColumnShim.expression(a), ColumnShim.expression(b), "diff"))
}
