package graft.expressions

import graft.functions.QualityClassifier.QcModel
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed-logit quality score: whitespace-split the document, hash each
 * token through the model's train-time [[org.apache.spark.ml.feature.HashingTF]]
 * mapping, sum weights, sigmoid. The model (weights ~2 MB at 2^18
 * features) rides into generated code as a referenced object, so scoring
 * stays inside the WholeStageCodegen span.
 */
object QcImpls {
  // the \s character class (train-time split regex), NOT
  // Character.isWhitespace — the two differ on exotic Unicode spaces and
  // the hashed features must line up exactly with training
  private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  def scoreDoc(text: UTF8String, model: QcModel): Double = {
    val s = text.toString
    val it = new Iterator[String] {
      private var i = 0
      private var nextWord: String = advance()
      private def advance(): String = {
        while (i < s.length && isRegexSpace(s.charAt(i))) i += 1
        val start = i
        while (i < s.length && !isRegexSpace(s.charAt(i))) i += 1
        if (i > start) s.substring(start, i) else null
      }
      override def hasNext: Boolean = nextWord != null
      override def next(): String = { val w = nextWord; nextWord = advance(); w }
    }
    val m = model.margin(it)
    1.0 / (1.0 + math.exp(-m))
  }
}

/** Quality probability under a trained [[QcModel]]. */
case class HashedLogitScore(child: Expression, model: QcModel)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_logit_score"

  override def nullSafeEval(input: Any): Any =
    QcImpls.scoreDoc(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val modelRef = ctx.addReferenceObj("qcModel", model, classOf[QcModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.QcImpls.scoreDoc($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLogitScore =
    copy(child = newChild)
}
