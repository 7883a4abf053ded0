package graft

import graft.sources.{ExcelSource, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Native XLSX source/sink: roundtrip, interop with a hand-built workbook
  * (shared strings, cell gaps, multiple sheets — shapes our writer never
  * emits), sheet patterns, type inference, and declarative dispatch. */
class ExcelSpec extends SparkSpec {
  private def tmp(): String = Files.createTempDirectory("excelspec").toString

  /** A workbook as real Excel writes it: sharedStrings table, explicit
    * r= cell refs with GAPS, two sheets with different column orders. */
  private def handBuiltWorkbook(path: File): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def e(name: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    e("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""")
    e("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    e("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Orders_Q1" sheetId="1" r:id="rId1"/><sheet name="Orders_Q2" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    e("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    e("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5"><si><t>id</t></si><si><t>name</t></si><si><t>amount</t></si><si><t>alice &amp; co</t></si><si><t>bob</t></si></sst>""")
    // sheet1: header A1..C1, row 2 full, row 3 has a GAP in column B
    e("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row><row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>10.5</v></c></row><row r="3"><c r="A3"><v>2</v></c><c r="C3"><v>20</v></c></row></sheetData></worksheet>""")
    // sheet2: SAME columns, different order (amount, id, name)
    e("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>2</v></c><c r="B1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row><row r="2"><c r="A2"><v>30</v></c><c r="B2"><v>3</v></c><c r="C2" t="s"><v>4</v></c></row></sheetData></worksheet>""")
    z.finish(); z.close()
  }

  test("reads a hand-built workbook: shared strings, gaps, escaped text") {
    val dir = new File(tmp()); val f = new File(dir, "book.xlsx")
    handBuiltWorkbook(f)
    val df = ExcelSource.read(spark, f.toString,
      ExcelSource.ExcelOptions(sheet = Some("Orders_Q1")))
    assert(df.schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DoubleType))))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1 && rows(0).getString(1) == "alice & co"
      && rows(0).getDouble(2) == 10.5)
    assert(rows(1).getLong(0) == 2 && rows(1).isNullAt(1) && rows(1).getDouble(2) == 20.0)
  }

  test("sheet_pattern unions sheets aligning columns by header name") {
    val dir = new File(tmp()); val f = new File(dir, "book.xlsx")
    handBuiltWorkbook(f)
    val df = ExcelSource.read(spark, f.toString,
      ExcelSource.ExcelOptions(sheetPattern = Some("^orders_"), addSheetName = true))
    assert(df.count() == 3)
    // sheet2's row lands with its by-name alignment despite column order
    val q2 = df.filter(col("_sheet_name") === "Orders_Q2").collect()(0)
    assert(q2.getAs[Long]("id") == 3 && q2.getAs[String]("name") == "bob"
      && q2.getAs[Double]("amount") == 30.0)
  }

  test("roundtrip through our own writer preserves values and inferred types") {
    val dir = s"${tmp()}/rt"
    val df = spark.range(50).select(col("id"),
      concat(lit("name_<&>_"), col("id")).as("label"),
      (col("id") * 1.5).as("score"),
      (col("id") % 2 === 0).as("even"))
    assert(ExcelSource.write(df, dir) == 50L)
    val back = ExcelSource.read(spark, dir)
    assert(back.schema == StructType(Seq(
      StructField("id", LongType), StructField("label", StringType),
      StructField("score", DoubleType), StructField("even", BooleanType))))
    assert(back.count() == 50)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 50L).sum)
    assert(back.filter("even").count() == 25)
    assert(back.filter(col("label") === "name_<&>_7").count() == 1)
  }

  test("multi-partition write produces one workbook per partition, union reads back") {
    val dir = s"${tmp()}/parts"
    ExcelSource.write(spark.range(100).toDF("id").repartition(4), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .count(_.getPath.getName.endsWith(".xlsx")) == 4)
    val back = ExcelSource.read(spark, dir)
    assert(back.count() == 100 && back.distinct().count() == 100)
  }

  test("inference stays string on mixed columns; infer_types off keeps strings") {
    val dir = s"${tmp()}/mixed"
    val df = spark.createDataFrame(Seq((1, "abc"), (2, "42"))).toDF("id", "v")
    ExcelSource.write(df, dir)
    val inferred = ExcelSource.read(spark, dir)
    assert(inferred.schema("v").dataType == StringType)
    assert(inferred.schema("id").dataType == LongType)
    val raw = ExcelSource.read(spark, dir, ExcelSource.ExcelOptions(inferTypes = false))
    assert(raw.schema.fields.forall(_.dataType == StringType))
  }

  test("declarative Sources dispatch: format excel with options") {
    val dir = s"${tmp()}/decl"
    val df = spark.range(9).select(col("id"), (col("id") * 2).as("dbl"))
    assert(Sources.writeWithStats(df, dir,
      Sources.WriteConfig(format = "excel", coalescePartitions = Some(1))) == 9L)
    val back = Sources.read(spark, Sources.ReadConfig("excel", path = Some(dir),
      options = Map("add_source_file" -> "true")))
    assert(back.count() == 9 && back.columns.contains("_source_file"))
    assert(back.agg(sum("dbl")).head.getLong(0) == (0L until 9L).map(_ * 2).sum)
  }

  test("explicitly empty strings round-trip as \"\" consistently for inline and shared encodings") {
    // writer path: inline empty string survives as "" (not null)
    val dir = s"${tmp()}/empty"
    val df = spark.createDataFrame(Seq((1L, ""), (2L, "x"))).toDF("id", "v")
    ExcelSource.write(df, dir)
    val back = ExcelSource.read(spark, dir).orderBy("id").collect()
    assert(back(0).getString(1) == "" && back(1).getString(1) == "x")
    // reader path: a shared-string cell referencing an EMPTY shared string
    // and an inline empty string must agree ("" both times), while an
    // empty <v/> on a numeric cell stays null
    val d2 = new File(tmp()); val f = new File(d2, "empties.xlsx")
    val z = new ZipOutputStream(new FileOutputStream(f))
    def e(name: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    e("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""")
    e("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    e("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    e("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    e("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>id</t></si><si><t>a</t></si><si><t>b</t></si><si><t></t></si></sst>""")
    // row2: shared-empty in a, inline-empty in b; row3: empty <v/> numeric in a
    e("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row><row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2" t="inlineStr"><is><t></t></is></c></row><row r="3"><c r="A3"><v>2</v></c><c r="B3"><v></v></c></row></sheetData></worksheet>""")
    z.finish(); z.close()
    val rows = ExcelSource.read(spark, f.toString,
      ExcelSource.ExcelOptions(inferTypes = false)).orderBy("id").collect()
    assert(rows(0).getString(1) == "" && rows(0).getString(2) == "",
      "shared-empty and inline-empty must both read as empty string")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2),
      "an empty <v/> numeric cell and an absent cell both read as null")
  }

  test("write modes behave like the other sinks") {
    val dir = s"${tmp()}/modes"
    val a = spark.range(5).toDF("id")
    ExcelSource.write(a, dir)
    ExcelSource.write(a, dir, mode = "append")
    assert(ExcelSource.read(spark, dir).count() == 10)
    ExcelSource.write(a, dir, mode = "overwrite")
    assert(ExcelSource.read(spark, dir).count() == 5)
    assert(ExcelSource.write(a, dir, mode = "ignore") == 0L)
    intercept[IllegalArgumentException] { ExcelSource.write(a, dir, mode = "error") }
  }
}
