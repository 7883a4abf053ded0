package graft

import java.io.{ByteArrayOutputStream, File}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.expressions.HtmlImpls
import graft.functions.TextAnalysis
import graft.sources.WarcSource
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String =
    HtmlImpls.htmlToText(UTF8String.fromString(html)).toString

  test("tags strip; inline tags vanish; block tags become newlines") {
    assert(x("<p>hello <b>bold</b> world</p>") == "hello bold world")
    assert(x("a<i>b</i>c") == "abc") // inline boundaries add nothing
    assert(x("<h1>Title</h1><p>Body one</p><p>Body two</p>") ==
      "Title\nBody one\nBody two")
    assert(x("line<br>break") == "line\nbreak")
    assert(x("<ul><li>a</li><li>b</li></ul>") == "a\nb")
  }

  test("script, style and comments drop entirely") {
    assert(x("<p>keep</p><script>var x = '<p>no</p>';</script><p>tail</p>") ==
      "keep\ntail")
    assert(x("<style>p { color: red }</style>text") == "text")
    assert(x("a<!-- <p>gone</p> -->b") == "ab")
    assert(x("<SCRIPT>UPPER()</SCRIPT>done") == "done") // case-insensitive
    // unterminated raw-text element swallows the rest (never leaks code)
    assert(x("pre<script>trailing junk") == "pre")
  }

  test("entities decode; malformed ampersands pass through") {
    assert(x("a &amp; b &lt;tag&gt; &quot;q&quot;") == "a & b <tag> \"q\"")
    assert(x("caf&#233; &#x41;") == "caf\u00e9 A")
    assert(x("AT&T and R&D") == "AT&T and R&D") // no ; -> literal
    assert(x("x&nbsp;y") == "x y")
    assert(x("&bogusname; z") == "&bogusname; z")
  }

  test("whitespace collapses; attributes with quoted > parse") {
    assert(x("  spaced \n\t out  ") == "spaced out")
    assert(x("""<a href="u?a>b" title='x>y'>link</a> after""") == "link after")
    assert(x("<p>  a  </p>  <p>  b  </p>") == "a\nb")
    assert(x("") == "")
    assert(x("<p></p><div></div>") == "")
    // unicode body bytes pass through untouched
    val uni = "\u00fcber gr\u00f6\u00dfer"
    assert(x(s"<p>$uni</p>") == uni)
  }

  test("httpBody strips the header block from HTTP payloads only") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>"
      .getBytes("UTF-8")
    assert(new String(HtmlImpls.httpBody(http), "UTF-8") == "<p>hi</p>")
    val raw = "<p>direct</p>".getBytes("UTF-8")
    assert(HtmlImpls.httpBody(raw) eq raw)
  }

  test("warc response captures land as (url, date, text) via htmlDocuments") {
    val dir = Files.createTempDirectory("warc_html").toString
    def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
      sb.toString.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val html = "<html><head><title>Page One</title><script>x()</script></head>" +
      "<body><p>First &amp; finest paragraph.</p></body></html>"
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")
    val recs =
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-00000000000a>",
        "WARC-Target-URI" -> "https://example.com/p1",
        "WARC-Date" -> "2026-03-02T00:00:00Z"), payload) ++
      record(Seq( // a conversion record must be filtered out
        "WARC-Type" -> "conversion",
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-00000000000b>",
        "WARC-Target-URI" -> "https://example.com/p2",
        "WARC-Date" -> "2026-03-02T00:00:01Z"), "plain".getBytes("UTF-8"))
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos); gz.write(recs); gz.close()
    Files.write(new File(dir, "seg.warc.gz").toPath, bos.toByteArray)

    val docs = WarcSource.htmlDocuments(spark, dir).collect()
    assert(docs.length == 1)
    assert(docs(0).getAs[String]("url") == "https://example.com/p1")
    assert(docs(0).getAs[String]("text") == "Page One\nFirst & finest paragraph.")

    // declarative: documents: html routes the same frame
    val decl = graft.sources.Sources.read(spark, graft.sources.Sources.ReadConfig(
      format = "warc", path = Some(dir), options = Map("documents" -> "html")))
    assert(decl.select("text").as[String].collect().toSeq ==
      Seq("Page One\nFirst & finest paragraph."))
  }

  test("column surface composes in a frame") {
    val out = Seq((1L, "<p>a</p><p>b</p>")).toDF("id", "html")
      .select($"id", TextAnalysis.htmlToText($"html").as("t"))
      .head().getString(1)
    assert(out == "a\nb")
  }
}
