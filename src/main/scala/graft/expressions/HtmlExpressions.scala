package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML → text extraction as a single-pass native expression — the step
 * between Common Crawl `response` records and a text corpus (what WET
 * conversion records contain when they exist; real pipelines regularly
 * must extract from raw captures themselves). A trafilatura-lite
 * byte-level state machine: tags stripped, `<script>`/`<style>` bodies
 * and comments dropped, block-level tags become newlines (inline tags
 * vanish, matching rendering), common + numeric character entities
 * decode, whitespace runs collapse. One pass, no regex, no allocation
 * beyond the output buffer; UTF-8 passes through untouched because every
 * structural character is ASCII.
 */
case class HtmlToText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(input: Any): Any =
    HtmlImpls.htmlToText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlImpls.htmlToText($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

/**
 * Strip the HTTP header block from a WARC `response` payload (status
 * line + headers up to the blank line); non-HTTP payloads pass through.
 */
case class HttpBody(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "http_body"

  override def nullSafeEval(input: Any): Any =
    HtmlImpls.httpBody(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlImpls.httpBody($c);")

  override protected def withNewChildInternal(newChild: Expression): HttpBody =
    copy(child = newChild)
}

object HtmlImpls {

  /** Block-level elements whose boundaries become newlines. */
  private val blockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2", "h3",
    "h4", "h5", "h6", "tr", "table", "thead", "tbody", "td", "th",
    "blockquote", "pre", "section", "article", "header", "footer", "nav",
    "aside", "form", "hr", "title", "body", "head", "html", "main",
    "figure", "figcaption", "address")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  private def isNameChar(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  private def lowerName(src: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val c = src(i).toChar
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }

  /** Decode one entity name (without & and ;) to a codepoint, or -1. */
  private def entityCodepoint(name: String): Int = name match {
    case "amp" => '&'
    case "lt" => '<'
    case "gt" => '>'
    case "quot" => '"'
    case "apos" => '\''
    case "nbsp" => ' '
    case _ if name.length > 1 && name.charAt(0) == '#' =>
      try {
        val cp =
          if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
            Integer.parseInt(name.substring(2), 16)
          else Integer.parseInt(name.substring(1))
        if (cp > 0 && cp <= 0x10FFFF) cp else -1
      } catch { case _: NumberFormatException => -1 }
    case _ => -1
  }

  def htmlToText(s: UTF8String): UTF8String = {
    val src = s.getBytes
    val n = src.length
    // output never exceeds input: entities shrink, tags drop, separators
    // replace at least one structural byte
    val out = new Array[Byte](n)
    var w = 0
    var pendingSpace = false
    var pendingNewline = false
    var started = false

    def emitSep(): Unit = {
      if (started) {
        if (pendingNewline) { out(w) = '\n'; w += 1 }
        else if (pendingSpace) { out(w) = ' '; w += 1 }
      }
      pendingSpace = false; pendingNewline = false
    }

    def writeCodepoint(cp: Int): Unit = {
      if (cp < 0x80) { out(w) = cp.toByte; w += 1 }
      else {
        val bytes = new String(Character.toChars(cp)).getBytes("UTF-8")
        System.arraycopy(bytes, 0, out, w, bytes.length)
        w += bytes.length
      }
    }

    var i = 0
    while (i < n) {
      val b = src(i)
      if (b == '<') {
        if (i + 3 < n && src(i + 1) == '!' && src(i + 2) == '-' && src(i + 3) == '-') {
          // comment: skip to -->
          i += 4
          while (i + 2 < n &&
            !(src(i) == '-' && src(i + 1) == '-' && src(i + 2) == '>')) i += 1
          i = if (i + 2 < n) i + 3 else n
        } else {
          var j = i + 1
          var closing = false
          if (j < n && src(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && isNameChar(src(j))) j += 1
          val name = lowerName(src, nameStart, j)
          // advance to the closing '>' honoring quoted attribute values
          var k = j
          var inQ: Byte = 0
          while (k < n && (inQ != 0 || src(k) != '>')) {
            if (inQ == 0 && (src(k) == '"' || src(k) == '\'')) inQ = src(k)
            else if (inQ != 0 && src(k) == inQ) inQ = 0
            k += 1
          }
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            // raw-text element: drop everything until its close tag
            i = tagEnd
            var done = false
            while (!done && i < n) {
              if (src(i) == '<' && i + 1 < n && src(i + 1) == '/') {
                var m = i + 2
                val ns = m
                while (m < n && isNameChar(src(m))) m += 1
                if (lowerName(src, ns, m) == name) {
                  while (m < n && src(m) != '>') m += 1
                  i = if (m < n) m + 1 else n
                  done = true
                } else i += 1
              } else i += 1
            }
            if (blockTags(name)) pendingNewline = true
          } else {
            if (blockTags(name)) pendingNewline = true
            i = tagEnd
          }
        }
      } else if (isWs(b)) {
        pendingSpace = true; i += 1
      } else if (b == '&') {
        var j = i + 1
        var len = 0
        while (j < n && len < 10 && src(j) != ';' && src(j) != '&' &&
          src(j) != '<' && !isWs(src(j))) { j += 1; len += 1 }
        val cp =
          if (j < n && src(j) == ';' && len > 0)
            entityCodepoint(new String(src, i + 1, len, "ISO-8859-1"))
          else -1
        emitSep()
        if (cp >= 0) { writeCodepoint(cp); i = j + 1 }
        else { out(w) = '&'; w += 1; i += 1 }
        started = true
      } else {
        emitSep()
        out(w) = b; w += 1; started = true; i += 1
      }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }

  def httpBody(payload: Array[Byte]): Array[Byte] = {
    // an HTTP message starts with "HTTP/"; headers end at CRLFCRLF
    if (payload.length < 5 || payload(0) != 'H' || payload(1) != 'T' ||
      payload(2) != 'T' || payload(3) != 'P' || payload(4) != '/') return payload
    var i = 0
    val n = payload.length
    while (i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, n)
      i += 1
    }
    payload
  }
}
