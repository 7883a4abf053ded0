package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/**
 * Native XLSX source/sink (reference: excel in the format enum
 * `odibi/config.py:1094,1108`, read via driver-side pandas
 * `odibi/engine/spark_engine.py:723-742` with `sheet_pattern` /
 * `add_source_file` options). No POI or excel DataSource jar exists in
 * this environment — but XLSX is a zip of XML, so this parses it with
 * the JDK's `java.util.zip` + StAX directly, no new dependency.
 *
 * Where the reference funnels every workbook through pandas ON THE
 * DRIVER, here the driver only reads the HEADER of the first matching
 * sheet (for the schema); each (file, sheet) pair then parses on an
 * executor — a directory of workbooks scales with file count. A single
 * workbook is inherently one task: the format is a zip (not splittable)
 * and capped at ~1M rows by Excel itself, so per-file parallelism is
 * the right (and only) scale axis. Excel is a lookup-/dimension-data
 * format; 100 TB facts belong in parquet/avro.
 *
 * Cells: shared strings, inline strings, booleans, numbers, and gaps
 * (absent cells → null) are handled; numeric date FORMATTING is not
 * interpreted (no styles.xml evaluation) — date cells surface as their
 * raw serial numbers, documented limitation. Columns read as strings;
 * `inferTypes` promotes columns where every non-null value parses as
 * long/double/boolean.
 */
object ExcelSource {

  // ------------------------------------------------------------- xlsx parse

  private def secureFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** "BC" → 54 (0-based column index). */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  private def zipEntries(in: InputStream, wanted: String => Boolean): Map[String, Array[Byte]] = {
    val z = new ZipInputStream(in)
    val out = mutable.Map[String, Array[Byte]]()
    try {
      var e: ZipEntry = z.getNextEntry
      while (e != null) {
        if (wanted(e.getName)) out(e.getName) = z.readAllBytes()
        e = z.getNextEntry
      }
    } finally z.close()
    out.toMap
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = secureFactory().createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[String]()
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" => inT = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText); ()
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => out += cur.toString; cur = null
          case "t" => inT = false
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** Sheet name → zip entry path, in workbook order. */
  private def sheetTargets(entries: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels = {
      val r = secureFactory().createXMLStreamReader(
        new java.io.ByteArrayInputStream(entries("xl/_rels/workbook.xml.rels")))
      val m = mutable.Map[String, String]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          m(r.getAttributeValue(null, "Id")) = r.getAttributeValue(null, "Target")
      }
      r.close(); m.toMap
    }
    val r = secureFactory().createXMLStreamReader(
      new java.io.ByteArrayInputStream(entries("xl/workbook.xml")))
    val out = mutable.ArrayBuffer[(String, String)]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).getOrElse(
            throw new IllegalArgumentException(s"sheet '$name' has no relationship id"))
        val target = rels(rid).stripPrefix("/xl/").stripPrefix("/")
        out += name -> (if (target.startsWith("xl/")) target else s"xl/$target")
      }
    }
    r.close()
    out.toSeq
  }

  /** Parse one worksheet into rows of (colIndex → string value). */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val r = secureFactory().createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer[Map[Int, String]]()
    var row: mutable.Map[Int, String] = null
    var cellCol = -1; var cellType = ""; var text: StringBuilder = null
    var inV = false; var inIsT = false; var nextCol = 0
    // a <v>/<t> element was present for the current cell — an explicitly
    // empty string must round-trip as "" (not null), and consistently for
    // inline vs shared-string encodings, so cell recording keys on element
    // presence, not accumulated-text nonEmpty
    var sawValue = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.Map(); nextCol = 0
          case "c" =>
            // absent r= attribute means "next column" (writers may omit it)
            cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(nextCol)
            nextCol = cellCol + 1
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            text = new StringBuilder; sawValue = false
          case "v" => inV = true; sawValue = true
          case "t" if cellType == "inlineStr" => inIsT = true; sawValue = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          if (text != null) { text.append(r.getText); () }
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row.toMap; row = null
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" if row != null && text != null && sawValue =>
            val raw = text.toString
            // an empty <v/> on a numeric/shared cell carries no value —
            // only string-typed cells can legitimately hold ""
            val value = cellType match {
              case "s" if raw.trim.nonEmpty => Some(shared(raw.trim.toInt))
              case "s" => None
              case "b" => Some(if (raw.trim == "1") "true" else "false")
              case "n" if raw.isEmpty => None
              case _ => Some(raw) // n, str, inlineStr — "" allowed for strings
            }
            value.foreach(v => row(cellCol) = v)
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    rows.toSeq
  }

  /** All sheets of one workbook stream: name → (header-less row maps). */
  private def parseWorkbook(in: InputStream,
                            sheetFilter: String => Boolean): Seq[(String, Seq[Map[Int, String]])] = {
    val entries = zipEntries(in, n =>
      n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
        n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/"))
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    sheetTargets(entries).filter { case (name, _) => sheetFilter(name) }
      .map { case (name, target) =>
        name -> parseSheet(entries.getOrElse(target,
          throw new IllegalArgumentException(s"worksheet entry $target missing")), shared)
      }
  }

  // ------------------------------------------------------------------ read

  final case class ExcelOptions(sheet: Option[String] = None,
                                sheetPattern: Option[String] = None,
                                addSheetName: Boolean = false,
                                addSourceFile: Boolean = false,
                                inferTypes: Boolean = true)

  private def sheetFilterOf(o: ExcelOptions): String => Boolean = (name: String) =>
    o.sheet.forall(_ == name) &&
      o.sheetPattern.forall(p => java.util.regex.Pattern.compile(
        p, java.util.regex.Pattern.CASE_INSENSITIVE).matcher(name).find())

  private def listXlsx(fs: FileSystem, p: Path): Seq[String] = {
    val st = fs.globStatus(p) match {
      case null | Array() => Array(fs.getFileStatus(p))
      case g => g
    }
    st.toSeq.flatMap { s =>
      if (s.isFile) Seq(s)
      else fs.listStatus(s.getPath).toSeq.filter(f => f.isFile &&
        f.getPath.getName.toLowerCase.endsWith(".xlsx") &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    }.map(_.getPath.toString).sorted
  }

  /**
   * Read XLSX workbook(s) at `path` (file, directory, or glob). Row 1 of
   * the first matching sheet is the header; every matching sheet in
   * every file unions by HEADER NAME (missing columns → null). All
   * columns are strings unless `inferTypes` promotes them.
   */
  def read(spark: SparkSession, path: String,
           options: ExcelOptions = ExcelOptions()): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(hconf)
    val files = listXlsx(fs, new Path(path))
    require(files.nonEmpty, s"no xlsx files under $path")
    val filter = sheetFilterOf(options)
    // driver: header of the first matching sheet only
    val in0 = fs.open(new Path(files.head))
    val first = try parseWorkbook(in0, filter) finally in0.close()
    require(first.nonEmpty, s"no sheet matches in ${files.head} " +
      s"(sheet=${options.sheet}, pattern=${options.sheetPattern})")
    val headerMap = first.head._2.headOption.getOrElse(
      throw new IllegalArgumentException(s"first sheet of ${files.head} is empty"))
    require(headerMap.nonEmpty,
      s"header row of ${files.head} has no cells — row 1 must hold column names")
    val header = (0 to headerMap.keys.max).map(i =>
      headerMap.getOrElse(i, s"_c$i").trim)
    require(header.distinct.size == header.size,
      s"duplicate header names: ${header.mkString(", ")}")
    val extras = (if (options.addSheetName) Seq("_sheet_name") else Nil) ++
      (if (options.addSourceFile) Seq("_source_file") else Nil)
    val schema = StructType((header ++ extras).map(StructField(_, StringType)))
    val entries = hconf.iterator()
    val confSeq = new mutable.ArrayBuffer[(String, String)]()
    while (entries.hasNext) { val e = entries.next(); confSeq += e.getKey -> e.getValue }
    val confList = confSeq.toSeq
    val (sheetOpt, patOpt, addSheet, addFile) =
      (options.sheet, options.sheetPattern, options.addSheetName, options.addSourceFile)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { file =>
        val conf = new Configuration(false)
        confList.foreach { case (k, v) => conf.set(k, v) }
        val f = sheetFilterOf(ExcelOptions(sheetOpt, patOpt))
        val in = new Path(file).getFileSystem(conf).open(new Path(file))
        val sheets = try parseWorkbook(in, f) finally in.close()
        sheets.flatMap { case (sheetName, raw) =>
          raw.headOption.toSeq.flatMap { hdr =>
            // align THIS sheet's columns to the global header by name
            val local = (0 to (if (hdr.isEmpty) -1 else hdr.keys.max))
              .map(i => hdr.getOrElse(i, s"_c$i").trim)
            val pos: Map[String, Int] = local.zipWithIndex.toMap
            raw.drop(1).map { cells =>
              val core = header.map(h => pos.get(h).flatMap(cells.get).orNull)
              val extra = (if (addSheet) Seq(sheetName) else Nil) ++
                (if (addFile) Seq(file) else Nil)
              Row.fromSeq(core ++ extra)
            }
          }
        }
      }
    val df = spark.createDataFrame(rows, schema)
    if (options.inferTypes) inferColumnTypes(df, header) else df
  }

  /** Promote all-parseable string columns to long/double/boolean — one
    * pass of tri-state flags aggregated per column, then plan-time casts. */
  private def inferColumnTypes(df: DataFrame, cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) return df
    // try_cast, not cast: under ANSI mode a plain cast THROWS on the very
    // malformed values the probe exists to detect
    val flags = cols.flatMap { c =>
      Seq(min(when(col(c).isNull, true).otherwise(col(c).try_cast(LongType).isNotNull)).as(s"_l_$c"),
        min(when(col(c).isNull, true).otherwise(col(c).try_cast(DoubleType).isNotNull)).as(s"_d_$c"),
        min(when(col(c).isNull, true)
          .otherwise(lower(col(c)).isin("true", "false"))).as(s"_b_$c"),
        max(col(c).isNotNull).as(s"_n_$c"))
    }
    val r = df.agg(flags.head, flags.tail: _*).collect()(0)
    def is(p: String, c: String) = Option(r.getAs[java.lang.Boolean](s"${p}_$c")).exists(_.booleanValue)
    df.select(cols.map { c =>
      val cast =
        if (!is("_n", c)) col(c) // all-null: stay string
        else if (is("_l", c)) col(c).cast("long")
        else if (is("_d", c)) col(c).cast("double")
        else if (is("_b", c)) col(c).cast("boolean")
        else col(c)
      cast.as(c)
    } ++ df.columns.filterNot(cols.contains).map(col): _*)
  }

  // ----------------------------------------------------------------- write

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  private def writeWorkbook(out: OutputStream, header: Seq[String],
                            rows: Iterator[Seq[Any]]): Long = {
    val z = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.OutputStreamWriter(z, "UTF-8")
    w.write("""<?xml version="1.0" encoding="UTF-8"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(vals: Seq[Any]): Unit = {
      w.write("<row>")
      vals.foreach {
        case null => w.write("<c/>")
        case b: Boolean => w.write(s"""<c t="b"><v>${if (b) 1 else 0}</v></c>""")
        case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte |
                  _: java.math.BigDecimal) =>
          w.write(s"<c><v>$n</v></c>")
        case other =>
          w.write(s"""<c t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>""")
      }
      w.write("</row>")
    }
    writeRow(header)
    var n = 0L
    rows.foreach { r => writeRow(r); n += 1 }
    w.write("</sheetData></worksheet>")
    w.flush()
    z.closeEntry()
    z.finish()
    n
  }

  /**
   * Write `df` as XLSX, one workbook per partition (coalesce(1) first
   * for the single-file shape Excel consumers expect). Strings, numbers
   * and booleans keep their cell types; everything else (dates,
   * timestamps, …) is written as its string form.
   */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Long = {
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(hconf)
    val exists = fs.exists(new Path(path))
    mode match {
      case "ignore" if exists => return 0L
      case "error" | "errorifexists" if exists =>
        throw new IllegalArgumentException(s"path already exists: $path")
      case _ => ()
    }
    val header = df.columns.toSeq
    val entries = hconf.iterator()
    val confSeq = new mutable.ArrayBuffer[(String, String)]()
    while (entries.hasNext) { val e = entries.next(); confSeq += e.getKey -> e.getValue }
    val confList = confSeq.toSeq
    val token = java.lang.Long.toHexString(System.nanoTime())
    def writeTo(dir: String): Long =
      df.rdd.mapPartitionsWithIndex { (i, rows) =>
        if (rows.isEmpty && i != 0) Iterator.single(0L)
        else {
          val conf = new Configuration(false)
          confList.foreach { case (k, v) => conf.set(k, v) }
          val out = new Path(dir, f"part-$i%05d-$token.xlsx")
          val os = out.getFileSystem(conf).create(out, false)
          val n = try writeWorkbook(os, header, rows.map(_.toSeq)) finally os.close()
          Iterator.single(n)
        }
      }.sum().toLong
    if (mode == "overwrite") {
      var written = 0L
      graft.core.AtomicParquet.swap(hconf, path, token) { tmp => written = writeTo(tmp) }
      written
    } else { fs.mkdirs(new Path(path)); writeTo(path) }
  }
}
