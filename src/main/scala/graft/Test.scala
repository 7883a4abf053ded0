package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{EngineContext, StandardTransformers, TransformerRegistry}

import scala.jdk.CollectionConverters._

/**
 * Declarative data-driven transformer tests (reference: odibi/cli/test.py
 * :1-286 — YAML fixtures with inline input frames, a transformer or SQL
 * under test, and an expected frame or CSV snapshot).
 *
 * {{{
 * usage: graft.Test <path> [--snapshot]
 * }}}
 *
 * `<path>` is a single YAML file or a directory searched recursively for
 * `*test*.yaml` / `test_*.yml` files (snapshot dirs excluded). Each file:
 *
 * {{{
 * tests:
 *   - name: keeps positive amounts
 *     transform: filter_rows            # OR  sql: SELECT ... FROM df
 *     params: { condition: "amount > 0" }
 *     inputs:
 *       df: [ { id: 1, amount: 10 }, { id: 2, amount: -3 } ]
 *     expected: [ { id: 1, amount: 10 } ]
 * }}}
 *
 * The input named `df` (else the first input) becomes the transformer's
 * current frame; every input is also visible to `sql:` tests as a view
 * under its own name. `expected` may be omitted when a snapshot exists at
 * `__snapshots__/<file-stem>/<slugified-test-name>.csv`; `--snapshot`
 * (re)writes snapshots from the actual result and reports the case as
 * passed, mirroring the reference's `--snapshot` flow (test.py:146-161).
 *
 * Comparison is set-equality, column-order- and dtype-insensitive
 * (test.py:173-191 sorts columns, sorts rows by all columns, and compares
 * with `check_dtype=False`): columns are matched by sorted name, rows by
 * canonicalized cell values (numbers via scale-normalized BigDecimal, so
 * `10`, `10.0` and a CSV-snapshot `"10"` all agree).
 *
 * Exit 0 when everything passes (or no test files exist — matching the
 * reference's warning-but-zero), 1 when any case fails or a file cannot
 * be loaded, 2 on usage errors.
 */
object Test {

  private val usage = "usage: graft.Test <path> [--snapshot]"

  def main(argv: Array[String]): Unit = sys.exit(mainExit(argv))

  private[graft] def mainExit(argv: Array[String]): Int = {
    var path: Option[String] = None
    var snapshot = false
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--snapshot" :: t => snapshot = true; rest = t
      case flag :: _ if flag.startsWith("-") =>
        System.err.println(s"error: unknown flag $flag\n$usage"); return 2
      case v :: t if path.isEmpty => path = Some(v); rest = t
      case extra :: _ =>
        System.err.println(s"error: unexpected argument $extra\n$usage"); return 2
    }
    path match {
      case None => System.err.println(usage); 2
      case Some(p) =>
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) {
          System.err.println(s"error: path not found: $p"); return 2
        }
        val files = discover(root)
        if (files.isEmpty) {
          System.err.println(s"warning: no test files found in $p"); return 0
        }
        withSpark { spark =>
          val results = files.flatMap(f => runFile(spark, f, snapshot))
          report(results)
        }
    }
  }

  /** Recursive `*test*.yaml` + `test_*.yml`, sorted; a file path is itself. */
  private[graft] def discover(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import java.nio.file.{Files, Path}
    if (Files.isRegularFile(root)) return Seq(root)
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    Files.walk(root).iterator().asScala.foreach { p =>
      val n = p.getFileName.toString
      val inSnapshots = (0 until p.getNameCount).exists(
        i => p.getName(i).toString == "__snapshots__")
      val matches = (n.endsWith(".yaml") && n.contains("test")) ||
        (n.endsWith(".yml") && n.startsWith("test_"))
      if (Files.isRegularFile(p) && matches && !inSnapshots) out += p
    }
    out.toSeq.sortBy(_.toString)
  }

  // ---- running -------------------------------------------------------

  final case class CaseResult(file: String, name: String, passed: Boolean,
                              detail: String)

  private def runFile(spark: SparkSession, file: java.nio.file.Path,
                      snapshot: Boolean): Seq[CaseResult] = {
    val fileName = file.getFileName.toString
    val cases =
      try {
        val text = java.nio.file.Files.readString(file)
        val root = anyToScala(new org.yaml.snakeyaml.Yaml().load[Any](text))
        root match {
          case m: Map[String @unchecked, Any @unchecked] =>
            m.getOrElse("tests", Seq.empty[Any]) match {
              case s: Seq[Any @unchecked] => s
              case other => throw new IllegalArgumentException(
                s"'tests' must be a list, got ${other.getClass.getSimpleName}")
            }
          case null => Seq.empty
          case other => throw new IllegalArgumentException(
            s"top level must be a map with 'tests', got ${other.getClass.getSimpleName}")
        }
      } catch {
        case e: Exception =>
          return Seq(CaseResult(fileName, "(load)", passed = false,
            s"cannot load: ${Option(e.getMessage).getOrElse(e.toString)}"))
      }
    cases.map {
      case c: Map[String @unchecked, Any @unchecked] =>
        val name = c.get("name").map(_.toString).getOrElse("Unnamed Test")
        try runCase(spark, c, name, file, snapshot)
        catch {
          case e: Exception => CaseResult(fileName, name, passed = false,
            Option(e.getMessage).getOrElse(e.toString))
        }
      case other =>
        CaseResult(fileName, "(malformed)", passed = false,
          s"test entry must be a map, got $other")
    }
  }

  private def runCase(spark: SparkSession, c: Map[String, Any], name: String,
                      file: java.nio.file.Path, snapshot: Boolean): CaseResult = {
    val fileName = file.getFileName.toString
    val transform = c.get("transform").map(_.toString)
    val sql = c.get("sql").map(_.toString)
    if (transform.isEmpty && sql.isEmpty)
      return CaseResult(fileName, name, passed = false,
        "must specify 'transform' or 'sql'")

    val inputs: Seq[(String, DataFrame)] = c.getOrElse("inputs", Map.empty) match {
      case m: Map[String @unchecked, Any @unchecked] =>
        m.toSeq.map { case (k, v) => k -> inputFrame(spark, k, v, file) }
      case other => throw new IllegalArgumentException(
        s"'inputs' must be a map of name -> rows, got $other")
    }
    val current = inputs.collectFirst { case ("df", d) => d }
      .orElse(inputs.headOption.map(_._2))
      .getOrElse(spark.emptyDataFrame)
    val ctx = EngineContext(current, datasets = inputs.toMap)

    val actual = transform match {
      case Some(t) =>
        StandardTransformers.registerAll
        TransformerRegistry.get(t) match {
          case None => return CaseResult(fileName, name, passed = false,
            s"transform '$t' not found; available: ${TransformerRegistry.names.take(8).mkString(", ")}…")
          case Some(fn) =>
            val params = c.getOrElse("params", Map.empty) match {
              case m: Map[String @unchecked, Any @unchecked] => m
              case other => throw new IllegalArgumentException(
                s"'params' must be a map, got $other")
            }
            fn(ctx, params)
        }
      case None => ctx.sql(sql.get)
    }

    val snapFile = snapshotPath(file, name)
    if (snapshot) {
      writeSnapshot(actual, snapFile)
      return CaseResult(fileName, name, passed = true,
        s"snapshot updated: ${file.getParent.relativize(snapFile)}")
    }

    val expected: Seq[Map[String, Any]] = c.get("expected") match {
      case Some(rows: Seq[Any @unchecked]) =>
        rows.map {
          case m: Map[String @unchecked, Any @unchecked] => m
          case other => throw new IllegalArgumentException(
            s"'expected' rows must be maps, got $other")
        }
      case Some(other) => throw new IllegalArgumentException(
        s"'expected' must be a list of rows, got $other")
      case None if java.nio.file.Files.exists(snapFile) => readSnapshot(snapFile)
      case None =>
        return CaseResult(fileName, name, passed = false,
          "no 'expected' and no snapshot — run with --snapshot to create one")
    }
    compare(actual, expected) match {
      case None => CaseResult(fileName, name, passed = true, "")
      case Some(diff) => CaseResult(fileName, name, passed = false, diff)
    }
  }

  // ---- inline frames -------------------------------------------------

  /** Inline row-maps (or a CSV path relative to the test file) → DataFrame.
    * Column types unify across rows: any fractional → double, else integral
    * → long, boolean stays boolean, everything else string. */
  private[graft] def inputFrame(spark: SparkSession, name: String, v: Any,
                                file: java.nio.file.Path): DataFrame = v match {
    case rows: Seq[Any @unchecked] =>
      val maps = rows.map {
        case m: Map[String @unchecked, Any @unchecked] => m
        case other => throw new IllegalArgumentException(
          s"input '$name': rows must be maps, got $other")
      }
      framed(spark, maps)
    case s: String if s.endsWith(".csv") =>
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(file.getParent.resolve(s).toString)
    case other => throw new IllegalArgumentException(
      s"input '$name': must be a list of rows or a .csv path, got $other")
  }

  private[graft] def framed(spark: SparkSession,
                            maps: Seq[Map[String, Any]]): DataFrame = {
    val columns = maps.foldLeft(Vector.empty[String]) { (acc, m) =>
      acc ++ m.keys.filterNot(acc.contains)
    }
    def typeOf(vs: Seq[Any]): DataType = {
      val present = vs.filter(_ != null)
      if (present.isEmpty) StringType
      else if (present.forall(_.isInstanceOf[Boolean])) BooleanType
      else if (present.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long]))
        LongType
      else if (present.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
        v.isInstanceOf[Double] || v.isInstanceOf[Float] ||
        v.isInstanceOf[java.math.BigDecimal])) DoubleType
      else StringType
    }
    val types = columns.map(c => typeOf(maps.map(_.getOrElse(c, null))))
    val schema = StructType(columns.zip(types).map {
      case (c, t) => StructField(c, t, nullable = true)
    })
    val data = maps.map { m =>
      Row.fromSeq(columns.zip(types).map { case (c, t) =>
        (m.getOrElse(c, null), t) match {
          case (null, _) => null
          case (v, LongType) => v.asInstanceOf[Number].longValue()
          case (v, DoubleType) => v.asInstanceOf[Number].doubleValue()
          case (v, BooleanType) => v.asInstanceOf[Boolean]
          case (v, _) => v.toString
        }
      })
    }
    spark.createDataFrame(data.asJava, schema)
  }

  // ---- comparison ----------------------------------------------------

  /** None = equal; Some(diff) otherwise. Columns by sorted name, rows as a
    * multiset of canonicalized tuples (dtype- and order-insensitive). */
  private[graft] def compare(actual: DataFrame,
                             expected: Seq[Map[String, Any]]): Option[String] = {
    val actualCols = actual.columns.sorted.toSeq
    val expectedCols = expected.foldLeft(Set.empty[String])(_ ++ _.keys).toSeq.sorted
    if (actualCols != expectedCols)
      return Some(s"columns differ: actual [${actualCols.mkString(", ")}] vs " +
        s"expected [${expectedCols.mkString(", ")}]")
    val actualRows = actual.select(actualCols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
      .map(r => actualCols.indices.map(i => canon(r.get(i))))
    val expectedRows = expected.map(m => expectedCols.map(c => canon(m.getOrElse(c, null))))
    if (actualRows.size != expectedRows.size)
      return Some(s"row count differs: actual ${actualRows.size} vs expected ${expectedRows.size}")
    val a = actualRows.sortBy(_.mkString(""))
    val e = expectedRows.sortBy(_.mkString(""))
    a.zip(e).zipWithIndex.collectFirst {
      case ((ar, er), i) if ar != er =>
        s"row $i differs (sorted order):\n  actual:   ${rowStr(actualCols, ar)}\n  expected: ${rowStr(expectedCols, er)}"
    }
  }

  private def rowStr(cols: Seq[String], vals: Seq[String]): String =
    cols.zip(vals).map { case (c, v) => s"$c=$v" }.mkString("{", ", ", "}")

  /** Canonical cell string: numbers scale-normalized so 10 == 10.0 == "10";
    * numeric-looking strings join the same class (the reference's pandas
    * CSV round-trip has the identical laxity). */
  private[graft] def canon(v: Any): String = v match {
    case null => "∅"
    case b: Boolean => if (b) "true" else "false"
    case n: java.math.BigDecimal => num(n)
    case n: Number => num(new java.math.BigDecimal(n.toString))
    case s: String =>
      s.toLowerCase match {
        case "true" => "true"
        case "false" => "false"
        case _ =>
          try num(new java.math.BigDecimal(s.trim))
          catch { case _: NumberFormatException => s }
      }
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toInstant.toString
    case other => other.toString
  }

  private def num(b: java.math.BigDecimal): String = {
    val stripped = b.stripTrailingZeros()
    // BigDecimal("0").stripTrailingZeros keeps scale quirks pre-Java-8; and
    // 1E+2 vs 100 — toPlainString normalizes both
    if (stripped.compareTo(java.math.BigDecimal.ZERO) == 0) "0"
    else stripped.toPlainString
  }

  // ---- snapshots -----------------------------------------------------

  private[graft] def slugify(s: String): String =
    s.toLowerCase.trim.replaceAll("[^\\w\\s-]", "").replaceAll("[-\\s]+", "-")

  private def snapshotPath(file: java.nio.file.Path, name: String): java.nio.file.Path = {
    val stem = file.getFileName.toString.replaceAll("\\.(yaml|yml)$", "")
    file.getParent.resolve("__snapshots__").resolve(stem)
      .resolve(s"${slugify(name)}.csv")
  }

  /** Columns sorted by name, rows sorted by all columns (test.py:148-158). */
  private def writeSnapshot(df: DataFrame, path: java.nio.file.Path): Unit = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
      .map(r => cols.indices.map(i => Option(r.get(i)).map(_.toString).orNull))
      .sortBy(_.map(v => if (v == null) "" else v).mkString(""))
    def cell(v: String) =
      if (v == null) ""
      else if (v.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    val text = (cols.map(cell) +: rows.map(_.map(cell)))
      .map(_.mkString(",")).mkString("", "\n", "\n")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, text)
  }

  private def readSnapshot(path: java.nio.file.Path): Seq[Map[String, Any]] = {
    val lines = parseCsv(java.nio.file.Files.readString(path))
    lines match {
      case header +: rows =>
        rows.map(r => header.zip(r.padTo(header.size, "")).toMap)
      case _ => Seq.empty
    }
  }

  /** Minimal RFC-4180 reader for our own snapshots (quoted cells, embedded
    * newlines). Empty unquoted cell → null (Spark's CSV writer convention). */
  private[graft] def parseCsv(text: String): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val cell = new StringBuilder
    var quoted = false
    var wasQuoted = false
    var i = 0
    def endCell(): Unit = {
      row += (if (!wasQuoted && cell.isEmpty) null else cell.toString)
      cell.clear(); wasQuoted = false
    }
    def endRow(): Unit = { endCell(); out += row.toSeq; row.clear() }
    while (i < text.length) {
      val ch = text.charAt(i)
      if (quoted) {
        if (ch == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') {
          cell += '"'; i += 1
        } else if (ch == '"') quoted = false
        else cell += ch
      } else ch match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => endCell()
        case '\n' => endRow()
        case '\r' => ()
        case c => cell += c
      }
      i += 1
    }
    if (cell.nonEmpty || row.nonEmpty || wasQuoted) endRow()
    out.toSeq
  }

  // ---- reporting -----------------------------------------------------

  private def report(results: Seq[CaseResult]): Int = {
    val w1 = (results.map(_.file.length) :+ 9).max
    val w2 = (results.map(_.name.length) :+ 9).max
    println(f"%n${"Test File".padTo(w1, ' ')}  ${"Test Case".padTo(w2, ' ')}  Status")
    println("-" * (w1 + w2 + 10))
    results.foreach { r =>
      val status = if (r.passed) "PASS" else "FAIL"
      println(s"${r.file.padTo(w1, ' ')}  ${r.name.padTo(w2, ' ')}  $status")
      if (r.detail.nonEmpty)
        r.detail.linesIterator.foreach(l => println(s"    $l"))
    }
    val passed = results.count(_.passed)
    println(s"\nSummary: $passed/${results.size} passed.")
    if (passed == results.size) 0 else 1
  }

  // ---- infra ---------------------------------------------------------

  private def withSpark[A](f: SparkSession => A): A = {
    val live = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val spark = live.getOrElse {
      val s = SparkSession.builder().master("local[2]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    try f(spark) finally if (live.isEmpty) spark.stop()
  }

  private def anyToScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> anyToScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(anyToScala).toSeq
    case other => other
  }
}
