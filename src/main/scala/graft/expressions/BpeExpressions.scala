package graft.expressions

import graft.functions.Bpe.BpeModel
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native BPE encode: one pass over the document splitting on whitespace,
 * each word encoded through the model's greedy merge loop with its
 * per-executor word cache (Zipf: mostly hits). The model rides into the
 * generated code as a referenced object, so the projection stays inside
 * the surrounding WholeStageCodegen span — no UDF boxing, no Python.
 */
object BpeImpls {

  /** Whitespace-split words of `text` (same \s semantics as the engine's
    * other text ops), encoded and concatenated. */
  def encodeDoc(text: UTF8String, model: BpeModel): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    eachWord(text) { w =>
      val toks = model.encodeWord(w)
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def countDoc(text: UTF8String, model: BpeModel): Int = {
    var n = 0
    eachWord(text) { w => n += model.encodeWord(w).length }
    n
  }

  private def eachWord(text: UTF8String)(f: String => Unit): Unit = {
    val s = text.toString
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) f(s.substring(start, i))
    }
  }
}

/** Subword tokens (array<string>) of a text column under a trained
  * [[BpeModel]]. */
case class BpeTokens(child: Expression, model: BpeModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    BpeImpls.encodeDoc(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeImpls.encodeDoc($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** Token COUNT under a trained [[BpeModel]] — the hot-path variant: no
  * token array is materialized, only the integer count. */
case class BpeTokenCount(child: Expression, model: BpeModel) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeImpls.countDoc(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeImpls.countDoc($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
