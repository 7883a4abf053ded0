package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/**
 * Per-file column statistics: the Delta `stats` payload on add actions
 * (PROTOCOL.md "Per-file Statistics": numRecords / minValues / maxValues /
 * nullCount / tightBounds) and the read-side file skipping they enable.
 *
 * Write side: [[footerStats]] derives the full stats JSON from the parquet
 * FOOTER of a just-staged file — min/max/null-count per leaf column are
 * already in the column-chunk metadata, so stamping them costs zero extra
 * data reads (the same footer open that counts rows). Only the first
 * [[defaultIndexedCols]] eligible leaf columns are indexed, matching
 * delta-spark's `delta.dataSkippingNumIndexedCols` default, and columns
 * whose parquet stats are unusable (INT96, raw binary, NaN/∞ floats,
 * over-long strings) are omitted — skipping must be CONSERVATIVE, so an
 * omitted column simply never prunes.
 *
 * Read side: [[prune]] drops files that provably contain NO row matching a
 * predicate, using only the driver-resident add-action stats — the same
 * O(files) metadata pass every Delta planner runs. On a 100 TB table
 * clustered by OPTIMIZE ZORDER this is the mechanism that turns a range
 * predicate into reading a handful of files instead of the whole table;
 * without it ZORDER clusters bytes nobody skips. Partition columns are
 * evaluated against the file's partitionValues (exact, not bounds), so one
 * predicate subsumes equality partition-pruning AND range data-skipping.
 *
 * Reference behavior spec: the reference engine delegates skipping to
 * delta-spark's stats (reference odibi/engine/spark_engine.py reads Delta
 * through the jar); this module supplies the equivalent native mechanism.
 */
object DeltaStats {

  /** delta-spark's `delta.dataSkippingNumIndexedCols` default. */
  val defaultIndexedCols = 32

  /** Strings longer than this are not min/max-indexed (a faithful
    * truncation needs U+10FFFD tie-breaking on max; omission is the
    * conservative equivalent — the column just never prunes). */
  val maxStringStatLength = 64

  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- write

  /** Row count + full stats JSON from one parquet footer (one metadata
    * read; no data pages touched). Stats keys are the parquet column
    * names — PHYSICAL names under column mapping, which is exactly what
    * the protocol requires of the `stats` field on mapped tables. */
  def footerStats(conf: Configuration, p: Path,
                  indexedCols: Int = defaultIndexedCols): (Long, String) = {
    val in = HadoopInputFile.fromPath(p, conf)
    val r = ParquetFileReader.open(in)
    try {
      val footer = r.getFooter
      val schema = footer.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      // leaf columns at repetition level 0: array/map interiors have no
      // meaningful file-level bounds in Delta stats
      val leaves = schema.getColumns.asScala
        .filter(_.getMaxRepetitionLevel == 0).take(indexedCols).toSeq
      val blocks = footer.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val byPath: Seq[Map[Seq[String], org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]] =
        blocks.map(b => b.getColumns.asScala
          .map(c => c.getPath.toArray.toSeq -> c).toMap)

      val minV = mapper.createObjectNode()
      val maxV = mapper.createObjectNode()
      val nullC = mapper.createObjectNode()
      leaves.foreach { cd =>
        val path = cd.getPath.toSeq
        val prim = cd.getPrimitiveType
        val chunks = byPath.flatMap(_.get(path))
        if (chunks.size == blocks.size) {
          val stats = chunks.map(_.getStatistics)
          if (stats.forall(s => s != null && s.isNumNullsSet))
            putNested(nullC, path, mapper.getNodeFactory.numberNode(
              stats.map(_.getNumNulls).sum))
          // chunks with values must all carry usable bounds; all-null
          // chunks contribute nothing (their genericGetMin is undefined)
          val withValues = stats.filter(_.hasNonNullValue)
          if (withValues.nonEmpty && withValues.forall(s => !s.isEmpty)) {
            val mins = withValues.flatMap(s => jsonValue(prim, s.genericGetMin))
            val maxs = withValues.flatMap(s => jsonValue(prim, s.genericGetMax))
            if (mins.size == withValues.size && maxs.size == withValues.size) {
              putNested(minV, path, mins.reduce((a, b) => pick(prim, a, b, lt = true)))
              putNested(maxV, path, maxs.reduce((a, b) => pick(prim, a, b, lt = false)))
            }
          }
        }
      }
      val root = mapper.createObjectNode()
      root.put("numRecords", numRecords)
      root.set[JsonNode]("minValues", minV)
      root.set[JsonNode]("maxValues", maxV)
      root.set[JsonNode]("nullCount", nullC)
      root.put("tightBounds", true)
      (numRecords, mapper.writeValueAsString(root))
    } finally r.close()
  }

  private def putNested(o: ObjectNode, path: Seq[String], v: JsonNode): Unit = {
    val parent = path.dropRight(1).foldLeft(o) { (n, seg) =>
      n.get(seg) match {
        case c: ObjectNode => c
        case _ => n.putObject(seg)
      }
    }
    parent.set[JsonNode](path.last, v)
  }

  /** min/max choice on the JSON representation (same ordering the stats
    * were written under, so comparing the rendered nodes is sound). */
  private def pick(prim: PrimitiveType, a: JsonNode, b: JsonNode, lt: Boolean): JsonNode = {
    val c =
      if (a.isNumber && b.isNumber) a.decimalValue.compareTo(b.decimalValue)
      else if (a.isBoolean && b.isBoolean) java.lang.Boolean.compare(a.asBoolean, b.asBoolean)
      else a.asText.compareTo(b.asText) // strings, ISO dates/timestamps
    if ((c <= 0) == lt) a else b
  }

  private val tsUtc = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)
  private val tsNtz = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** Parquet statistics value → Delta stats JSON value; None when the
    * type has no sound JSON bound (conservative omission). */
  private def jsonValue(prim: PrimitiveType, v: Any): Option[JsonNode] = {
    val f = mapper.getNodeFactory
    val ann = prim.getLogicalTypeAnnotation
    prim.getPrimitiveTypeName match {
      case INT32 => ann match {
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some(f.textNode(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(f.numberNode(JBigDecimal.valueOf(v.asInstanceOf[Int].toLong, d.getScale)))
        case _ => Some(f.numberNode(v.asInstanceOf[Int]))
      }
      case INT64 => ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          val micros = t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => v.asInstanceOf[Long] * 1000L
            case LogicalTypeAnnotation.TimeUnit.MICROS => v.asInstanceOf[Long]
            case LogicalTypeAnnotation.TimeUnit.NANOS => v.asInstanceOf[Long] / 1000L
          }
          val inst = Instant.EPOCH.plusSeconds(Math.floorDiv(micros, 1000000L))
            .plusNanos(Math.floorMod(micros, 1000000L) * 1000L)
          Some(f.textNode(
            if (t.isAdjustedToUTC) tsUtc.format(inst)
            else tsNtz.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC))))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(f.numberNode(JBigDecimal.valueOf(v.asInstanceOf[Long], d.getScale)))
        case _ => Some(f.numberNode(v.asInstanceOf[Long]))
      }
      case FLOAT =>
        val x = v.asInstanceOf[Float]
        if (x.isNaN || x.isInfinite) None
        else Some(f.numberNode(new JBigDecimal(x.toString)))
      case DOUBLE =>
        val x = v.asInstanceOf[Double]
        if (x.isNaN || x.isInfinite) None
        else Some(f.numberNode(new JBigDecimal(x.toString)))
      case BOOLEAN => Some(f.booleanNode(v.asInstanceOf[Boolean]))
      case BINARY | FIXED_LEN_BYTE_ARRAY => ann match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          val s = v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
          if (s.length <= maxStringStatLength) Some(f.textNode(s)) else None
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          val bytes = v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
          Some(f.numberNode(new JBigDecimal(new BigInteger(bytes), d.getScale)))
        case _ => None // raw binary: Delta does not bound it
      }
      case INT96 => None // deprecated, parquet-mr records no stats
      case _ => None
    }
  }

  /** Stats JSON fragments preserved across a DV re-stamp: min/max/nullCount
    * stay VALID (non-tight) bounds after row-level deletes, so the DV
    * writer keeps them and only flips tightBounds. */
  def loosen(statsJson: String, physicalRows: Long): String = {
    val node = try mapper.readTree(statsJson) match {
      case o: ObjectNode => o
      case _ => mapper.createObjectNode()
    } catch { case _: Exception => mapper.createObjectNode() }
    node.put("numRecords", physicalRows)
    node.put("tightBounds", false)
    mapper.writeValueAsString(node)
  }

  // ----------------------------------------------------------------- read

  /** One file's parsed stats, flattened to leaf paths. */
  private final case class FileStats(numRecords: Option[Long],
                                     min: Map[Seq[String], JsonNode],
                                     max: Map[Seq[String], JsonNode],
                                     nullCount: Map[Seq[String], Long])

  private def flatten(n: JsonNode, prefix: Seq[String]): Seq[(Seq[String], JsonNode)] =
    if (n == null) Nil
    else if (n.isObject) {
      import scala.jdk.CollectionConverters._
      n.properties().asScala.toSeq.flatMap(e => flatten(e.getValue, prefix :+ e.getKey))
    } else Seq(prefix -> n)

  private def parseStats(json: String): Option[FileStats] =
    try {
      val n = mapper.readTree(json)
      Some(FileStats(
        Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong),
        flatten(n.get("minValues"), Nil).toMap,
        flatten(n.get("maxValues"), Nil).toMap,
        flatten(n.get("nullCount"), Nil).collect {
          case (p, v) if v.isNumber => p -> v.asLong }.toMap))
    } catch { case _: Exception => None }

  /** Result of a skipping pass: the surviving files plus the counts a
    * caller can assert on ("did the predicate actually prune?"). */
  final case class Pruned(files: Seq[DeltaLog.AddFile], candidates: Int, kept: Int) {
    def skipped: Int = candidates - kept
  }

  /**
   * Files that MAY contain a row matching `filter` — sound (never drops a
   * file that could match) and driver-side only. Unrecognized predicate
   * shapes, missing stats, and un-indexed columns all degrade to "keep".
   *
   * The predicate is RESOLVED through Catalyst analysis against an empty
   * frame carrying the snapshot's logical schema, so the walk below sees
   * typed `AttributeReference`/`Literal`/`Cast` trees (with Spark's own
   * implicit coercions already applied) instead of raw column nodes —
   * and an unresolvable predicate fails here exactly as it would on the
   * real scan.
   */
  def prune(spark: org.apache.spark.sql.SparkSession,
            snap: DeltaLog.Snapshot, filter: Column): Pruned = {
    val logicalSchema = StructType(snap.schema.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), logicalSchema)
    val analyzed = empty.filter(filter).queryExecution.analyzed
    val expr = analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.headOption.getOrElse(return Pruned(snap.files, snap.files.size, snap.files.size))
    // logical path -> (physical stats path, column type); top-level
    // partition columns resolve separately against partitionValues
    val fields = snap.schema.fields
    def resolve(parts: Seq[String]): Option[(Seq[String], DataType)] = {
      def walk(st: StructType, ps: Seq[String], acc: Seq[String]): Option[(Seq[String], DataType)] =
        ps match {
          case Seq() => None
          case head +: rest =>
            st.fields.find(_.name.equalsIgnoreCase(head)).flatMap { fd =>
              val phys = acc :+ DeltaLog.physicalName(fd)
              (rest, fd.dataType) match {
                case (Seq(), t) => Some(phys -> t)
                case (_, s: StructType) => walk(s, rest, phys)
                case _ => None
              }
            }
        }
      walk(StructType(fields), parts, Nil)
    }
    val partCols = snap.partitionColumns.toSet
    val physOfPart: Map[String, String] =
      fields.filter(f => partCols.contains(f.name))
        .map(f => f.name -> DeltaLog.physicalName(f)).toMap
    val typeOfPart: Map[String, DataType] =
      fields.filter(f => partCols.contains(f.name)).map(f => f.name -> f.dataType).toMap

    val kept = snap.files.filter { a =>
      val fs = a.stats.flatMap(parseStats)
      mayMatch(expr, a, fs, resolve, partCols, physOfPart, typeOfPart)
    }
    Pruned(kept, snap.files.size, kept.size)
  }

  // -- predicate evaluation: tri-state collapsed to "may the file match" --

  /** Comparable domain: numbers as BigDecimal, strings/dates/timestamps as
    * their canonical ordered representation. `lit.value` is the Catalyst
    * INTERNAL form (UTF8String, epoch-day Int, micros Long, Decimal);
    * `target` is the table column's type the stats were written under. */
  private def coerceLit(lit: Literal, target: DataType): Option[Any] = {
    if (lit.value == null) return None
    def micros(v: Long, fmt: Boolean): String = {
      val inst = Instant.EPOCH.plusSeconds(Math.floorDiv(v, 1000000L))
        .plusNanos(Math.floorMod(v, 1000000L) * 1000L)
      if (fmt) tsUtc.format(inst)
      else tsNtz.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC))
    }
    (lit.dataType, target) match {
      case (_: NumericType, _: NumericType) => lit.value match {
        case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
        case v => try Some(new JBigDecimal(v.toString)) catch { case _: Exception => None }
      }
      case (StringType, _: NumericType) =>
        try Some(new JBigDecimal(lit.value.toString)) catch { case _: Exception => None }
      case (DateType, DateType) =>
        Some(LocalDate.ofEpochDay(lit.value.asInstanceOf[Int].toLong).toString)
      case (StringType, DateType) =>
        try Some(LocalDate.parse(lit.value.toString).toString)
        catch { case _: Exception => None }
      case (TimestampType, TimestampType) =>
        Some(micros(lit.value.asInstanceOf[Long], fmt = true))
      case (TimestampNTZType, TimestampNTZType) =>
        Some(micros(lit.value.asInstanceOf[Long], fmt = false))
      case (StringType, TimestampType) =>
        // ISO-ish literal; normalized to the stats format for lexicographic compare
        try {
          val ldt = LocalDateTime.parse(lit.value.toString.replace(' ', 'T'))
          Some(tsUtc.format(ldt.toInstant(ZoneOffset.UTC)))
        } catch { case _: Exception => None }
      case (StringType, StringType) => Some(lit.value.toString)
      case (BooleanType, BooleanType) => Some(lit.value.asInstanceOf[Boolean])
      case _ => None
    }
  }

  /** Stats JSON value → the same comparable domain as [[coerceLit]]. */
  private def coerceStat(n: JsonNode, target: DataType): Option[Any] = target match {
    case _: NumericType =>
      if (n.isNumber) Some(n.decimalValue)
      else try Some(new JBigDecimal(n.asText)) catch { case _: Exception => None }
    case DateType | TimestampType | StringType => Some(n.asText)
    case BooleanType => Some(n.asBoolean)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: JBigDecimal, y: JBigDecimal) => Some(x.compareTo(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private sealed trait Bounds
  private case object Unknown extends Bounds
  private case object AllNull extends Bounds
  private final case class Range(min: Option[Any], max: Option[Any], mayHaveNull: Boolean)
    extends Bounds

  private def mayMatch(e: Expression, a: DeltaLog.AddFile, fs: Option[FileStats],
                       resolve: Seq[String] => Option[(Seq[String], DataType)],
                       partCols: Set[String], physOfPart: Map[String, String],
                       typeOfPart: Map[String, DataType]): Boolean = {

    def attrPath(x: Expression): Option[Seq[String]] = x match {
      case r: AttributeReference => Some(Seq(r.name))
      case g: GetStructField => attrPath(g.child).map(_ :+ g.extractFieldName)
      case c: Cast => attrPath(c.child)
      case u: UnresolvedAttribute => Some(u.nameParts)
      case _ => None
    }

    // literal side: any foldable subtree (analysis wraps literals in the
    // coercion Cast) evaluates driver-side to its typed value
    object Lit {
      def unapply(x: Expression): Option[Literal] = x match {
        case l: Literal => Some(l)
        case e if e.foldable && !e.exists(_.isInstanceOf[AttributeReference]) =>
          try Some(Literal(e.eval(null), e.dataType))
          catch { case _: Exception => None }
        case _ => None
      }
    }

    /** [min,max] + nullability for one column in THIS file. Partition
      * columns give exact single-point bounds from partitionValues. */
    def bounds(parts: Seq[String], t: DataType): Bounds = {
      if (parts.size == 1 && partCols.exists(_.equalsIgnoreCase(parts.head))) {
        val pc = partCols.find(_.equalsIgnoreCase(parts.head)).get
        val raw = a.partitionValues.get(physOfPart.getOrElse(pc, pc))
          .orElse(a.partitionValues.get(pc)).flatten
        return raw match {
          case None => AllNull
          case Some(s) =>
            val lit = coerceLit(Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString(s), StringType), t)
            lit match {
              case Some(v) => Range(Some(v), Some(v), mayHaveNull = false)
              case None => Unknown
            }
        }
      }
      fs match {
        case None => Unknown
        case Some(st) =>
          resolve(parts) match {
            case None => Unknown
            case Some((phys, _)) =>
              val nc = st.nullCount.get(phys)
              val allNull = (nc, st.numRecords) match {
                case (Some(n), Some(r)) if n == r && r > 0 => true
                case _ => false
              }
              if (allNull) AllNull
              else Range(
                st.min.get(phys).flatMap(coerceStat(_, t)),
                st.max.get(phys).flatMap(coerceStat(_, t)),
                mayHaveNull = nc.forall(_ > 0))
          }
      }
    }

    /** One comparison atom: op is -2 (<), -1 (<=), 0 (=), 1 (>=), 2 (>). */
    def cmpAtom(attr: Expression, litE: Expression, op: Int): Boolean = {
      val parts = attrPath(attr).getOrElse(return true)
      val lit = litE match { case l: Literal => l; case _ => return true }
      if (lit.value == null) return false // comparison with NULL matches nothing
      val t = if (parts.size == 1 && typeOfPart.keys.exists(_.equalsIgnoreCase(parts.head)))
        typeOfPart.find(_._1.equalsIgnoreCase(parts.head)).get._2
      else resolve(parts).map(_._2).getOrElse(return true)
      val v = coerceLit(lit, t).getOrElse(return true)
      bounds(parts, t) match {
        case Unknown => true
        case AllNull => false
        case Range(mn, mx, _) => op match {
          case 0 =>
            mn.flatMap(cmp(_, v)).forall(_ <= 0) && mx.flatMap(cmp(v, _)).forall(_ <= 0)
          case -2 => mn.flatMap(cmp(_, v)).forall(_ < 0)
          case -1 => mn.flatMap(cmp(_, v)).forall(_ <= 0)
          case 2 => mx.flatMap(cmp(_, v)).forall(_ > 0)
          case 1 => mx.flatMap(cmp(_, v)).forall(_ >= 0)
          case _ => true
        }
      }
    }

    def may(x: Expression): Boolean = x match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      case Not(inner) => mayNot(inner)
      case EqualTo(c, Lit(l)) => cmpAtom(c, l, 0)
      case EqualTo(Lit(l), c) => cmpAtom(c, l, 0)
      case EqualNullSafe(c, Lit(l)) =>
        if (l.value == null) may(IsNull(c)) else cmpAtom(c, l, 0)
      case EqualNullSafe(Lit(l), c) =>
        if (l.value == null) may(IsNull(c)) else cmpAtom(c, l, 0)
      case LessThan(c, Lit(l)) => cmpAtom(c, l, -2)
      case LessThan(Lit(l), c) => cmpAtom(c, l, 2)
      case LessThanOrEqual(c, Lit(l)) => cmpAtom(c, l, -1)
      case LessThanOrEqual(Lit(l), c) => cmpAtom(c, l, 1)
      case GreaterThan(c, Lit(l)) => cmpAtom(c, l, 2)
      case GreaterThan(Lit(l), c) => cmpAtom(c, l, -2)
      case GreaterThanOrEqual(c, Lit(l)) => cmpAtom(c, l, 1)
      case GreaterThanOrEqual(Lit(l), c) => cmpAtom(c, l, -1)
      case In(c, vs) =>
        val lits = vs.map(Lit.unapply)
        if (lits.exists(_.isEmpty)) true
        else lits.flatten.exists(v => cmpAtom(c, v, 0))
      case IsNull(c) =>
        attrPath(c) match {
          case None => true
          case Some(parts) =>
            val t = resolve(parts).map(_._2)
              .orElse(typeOfPart.find(_._1.equalsIgnoreCase(parts.head)).map(_._2))
              .getOrElse(return true)
            bounds(parts, t) match {
              case AllNull => true
              case Range(_, _, mayNull) => mayNull
              case Unknown => true
            }
        }
      case IsNotNull(c) =>
        attrPath(c) match {
          case None => true
          case Some(parts) =>
            val t = resolve(parts).map(_._2)
              .orElse(typeOfPart.find(_._1.equalsIgnoreCase(parts.head)).map(_._2))
              .getOrElse(return true)
            bounds(parts, t) match {
              case AllNull => false
              case _ => true
            }
        }
      case StartsWith(c, Lit(l)) =>
        val parts = attrPath(c).getOrElse(return true)
        val p = Option(l.value).map(_.toString).getOrElse(return false)
        val t = resolve(parts).map(_._2).getOrElse(return true)
        if (t != StringType) return true
        bounds(parts, t) match {
          case Unknown => true
          case AllNull => false
          case Range(mn, mx, _) =>
            val lower = mn.forall { case s: String => s.take(p.length) <= p; case _ => true }
            val upper = mx.forall { case s: String => s >= p; case _ => true }
            lower && upper
        }
      case _: Literal => x match {
        case Literal(v: Boolean, BooleanType) => v
        case Literal(null, _) => false
        case _ => true
      }
      case _ => true // unrecognized shape: cannot skip
    }

    /** may(NOT x): push negation into atoms; unknown shapes keep the file. */
    def mayNot(x: Expression): Boolean = x match {
      case And(l, r) => mayNot(l) || mayNot(r)
      case Or(l, r) => mayNot(l) && mayNot(r)
      case Not(inner) => may(inner)
      case EqualTo(c, Lit(l)) => notEqAtom(c, l)
      case EqualTo(Lit(l), c) => notEqAtom(c, l)
      case LessThan(c, Lit(l)) => cmpAtom(c, l, 1)
      case LessThan(Lit(l), c) => cmpAtom(c, l, -1)
      case LessThanOrEqual(c, Lit(l)) => cmpAtom(c, l, 2)
      case LessThanOrEqual(Lit(l), c) => cmpAtom(c, l, -2)
      case GreaterThan(c, Lit(l)) => cmpAtom(c, l, -1)
      case GreaterThan(Lit(l), c) => cmpAtom(c, l, 1)
      case GreaterThanOrEqual(c, Lit(l)) => cmpAtom(c, l, -2)
      case GreaterThanOrEqual(Lit(l), c) => cmpAtom(c, l, 2)
      case IsNull(c) => may(IsNotNull(c))
      case IsNotNull(c) => may(IsNull(c))
      case _ => true
    }

    /** c != v may match unless every non-null value equals v and the file
      * has rows (nulls never satisfy != either — three-valued logic). */
    def notEqAtom(attr: Expression, lit: Literal): Boolean = {
      val parts = attrPath(attr).getOrElse(return true)
      if (lit.value == null) return false
      val t = resolve(parts).map(_._2)
        .orElse(typeOfPart.find(_._1.equalsIgnoreCase(parts.head)).map(_._2))
        .getOrElse(return true)
      val v = coerceLit(lit, t).getOrElse(return true)
      bounds(parts, t) match {
        case Unknown => true
        case AllNull => false
        case Range(Some(mn), Some(mx), _) =>
          !(cmp(mn, v).contains(0) && cmp(mx, v).contains(0))
        case _ => true
      }
    }

    may(e)
  }
}
