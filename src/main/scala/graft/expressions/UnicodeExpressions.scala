package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
 * expression — the standard first step of web-corpus text cleaning
 * (mixed crawl encodings leave the same word in composed and decomposed
 * forms, which defeats exact/fingerprint dedup and token counting).
 *
 * Spark ships no normalization builtin, and a Scala UDF would box every
 * row; this stays inside the WholeStageCodegen span via a static call.
 * Two fast paths keep the common case allocation-free: pure-ASCII
 * strings (the bulk of English web text — `UTF8String.isFullAscii` is a
 * vectorized byte scan) and already-normalized strings
 * (`Normalizer.isNormalized` is a quick-check pass that avoids building
 * the normalized copy) return the input UTF8String unchanged.
 */
case class NormalizeUnicode(child: Expression, form: String)
  extends UnaryExpression {

  private val formOrd: Int = form.toUpperCase match {
    case "NFC" => 0
    case "NFD" => 1
    case "NFKC" => 2
    case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"normalize_unicode form must be NFC/NFD/NFKC/NFKD, got $other")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  override def nullSafeEval(input: Any): Any =
    UnicodeImpls.normalize(input.asInstanceOf[UTF8String], formOrd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeImpls.normalize($c, $formOrd);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object UnicodeImpls {

  private val forms = Array(Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def normalize(s: UTF8String, formOrd: Int): UTF8String = {
    // ASCII is invariant under every normalization form
    if (s.isFullAscii) return s
    val form = forms(formOrd)
    val jstr = s.toString
    if (Normalizer.isNormalized(jstr, form)) s
    else UTF8String.fromString(Normalizer.normalize(jstr, form))
  }
}
