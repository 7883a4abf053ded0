package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/**
 * Format-agnostic min/max file skipping: the tri-state predicate
 * evaluator shared by the Delta stats pruner ([[DeltaStats]], JSON stats
 * on add actions) and the Iceberg pruner ([[IcebergSource]], per-column
 * bound maps in manifests). Callers supply per-file column BOUNDS; this
 * module answers "may this file contain a matching row" — sound (any
 * unrecognized shape, missing bound, or type it cannot compare degrades
 * to KEEP), driver-side only, O(files × predicate atoms).
 *
 * Values compare in a canonical domain: numbers as java BigDecimal,
 * strings as themselves, dates/timestamps as their ISO-8601 rendering
 * (which orders lexicographically), booleans natively.
 */
object StatsPruning {

  /** [min,max]+nullability of one column inside one file. */
  sealed trait Bounds
  case object Unknown extends Bounds
  case object AllNull extends Bounds
  final case class Range(min: Option[Any], max: Option[Any], mayHaveNull: Boolean)
    extends Bounds

  private[sources] val tsUtc =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)
  private[sources] val tsNtz = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  private[sources] def formatMicros(v: Long, utc: Boolean): String = {
    val inst = Instant.EPOCH.plusSeconds(Math.floorDiv(v, 1000000L))
      .plusNanos(Math.floorMod(v, 1000000L) * 1000L)
    if (utc) tsUtc.format(inst)
    else tsNtz.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC))
  }

  private[sources] def instantMicros(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
      i.getNano / 1000L)

  /** Parse a stats-string timestamp (ISO-ish, any fraction length, with
    * or without the Z) back to epoch micros; None when unparseable. */
  private[sources] def parseStatMicros(s: String): Option[Long] =
    try {
      val t = s.replace(' ', 'T').stripSuffix("Z")
      Some(instantMicros(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)))
    } catch { case _: Exception => None }

  /**
   * Resolve `filter` through Catalyst analysis against an empty frame
   * carrying `schema` — the walk then sees typed AttributeReference /
   * Literal / Cast trees with Spark's implicit coercions applied, and an
   * unresolvable predicate fails here exactly as it would on the scan.
   */
  def resolveCondition(spark: SparkSession, schema: StructType,
                       filter: Column): Option[Expression] = {
    val clean = StructType(schema.fields.map(_.copy(metadata = Metadata.empty)))
    val empty = spark.createDataFrame(new java.util.ArrayList[Row](), clean)
    empty.filter(filter).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.headOption
  }

  /** Catalyst literal (INTERNAL value repr) → comparable domain, under the
    * table column's type `target` (what the bounds were recorded in). */
  def coerceLit(lit: Literal, target: DataType): Option[Any] = {
    if (lit.value == null) return None
    (lit.dataType, target) match {
      case (_: NumericType, _: NumericType) => lit.value match {
        case d: Decimal => Some(d.toJavaBigDecimal)
        case v => try Some(new JBigDecimal(v.toString)) catch { case _: Exception => None }
      }
      case (StringType, _: NumericType) =>
        try Some(new JBigDecimal(lit.value.toString)) catch { case _: Exception => None }
      case (DateType, DateType) =>
        Some(LocalDate.ofEpochDay(lit.value.asInstanceOf[Int].toLong).toString)
      case (StringType, DateType) =>
        try Some(LocalDate.parse(lit.value.toString).toString)
        catch { case _: Exception => None }
      // timestamps compare at EXACT MICROSECOND precision (Iceberg bounds
      // store micros; Delta stats strings parse back to micros) — a
      // millisecond-rendered domain would mis-prune sub-ms ranges
      case (TimestampType, TimestampType) | (TimestampNTZType, TimestampNTZType) =>
        Some(new JBigDecimal(lit.value.asInstanceOf[Long]))
      case (StringType, TimestampType) =>
        try {
          val ldt = LocalDateTime.parse(lit.value.toString.replace(' ', 'T'))
          Some(new JBigDecimal(instantMicros(ldt.toInstant(ZoneOffset.UTC))))
        } catch { case _: Exception => None }
      case (StringType, StringType) => Some(lit.value.toString)
      case (BooleanType, BooleanType) => Some(lit.value.asInstanceOf[Boolean])
      case _ => None
    }
  }

  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: JBigDecimal, y: JBigDecimal) => Some(x.compareTo(y))
    // UNSIGNED UTF-8 byte order — the order parquet/Iceberg recorded the
    // bounds under; UTF-16 code-unit compareTo disagrees for non-BMP
    // characters vs U+E000..U+FFFF and would mis-prune
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private def utf8Cmp(a: String, b: String): Int =
    byteCmp(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  private def byteCmp(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /**
   * May any row of a file with the given per-column `bounds` satisfy
   * `cond`? `typeOf` resolves an attribute path to the column's declared
   * type (None → cannot reason, keep). Negation pushes into atoms with
   * three-valued-logic-correct rewrites; anything unmodeled keeps.
   */
  def mayMatch(cond: Expression,
               typeOf: Seq[String] => Option[DataType],
               bounds: (Seq[String], DataType) => Bounds): Boolean = {

    def attrPath(x: Expression): Option[Seq[String]] = x match {
      case r: AttributeReference => Some(Seq(r.name))
      case g: GetStructField => attrPath(g.child).map(_ :+ g.extractFieldName)
      // only VALUE-PRESERVING widening casts may be stripped (the atom
      // then evaluates soundly in the column's native domain); anything
      // else — narrowing (wraps), int->string (flips the order),
      // date->timestamp (shifts domain) — makes the attribute opaque
      case c: Cast =>
        def rank(t: DataType): Int = t match {
          case ByteType => 1; case ShortType => 2; case IntegerType => 3
          case LongType => 4; case _ => -1
        }
        (c.child.dataType, c.dataType) match {
          case (a, b) if a == b => attrPath(c.child)
          case (a, b) if rank(a) > 0 && rank(b) > 0 && rank(a) < rank(b) =>
            attrPath(c.child)
          case (ByteType | ShortType | IntegerType | FloatType, DoubleType) =>
            attrPath(c.child)
          case (a, d: DecimalType) if rank(a) > 0 &&
            d.precision - d.scale >= 20 => attrPath(c.child)
          case _ => None
        }
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

    /** One comparison atom: op is -2 (<), -1 (<=), 0 (=), 1 (>=), 2 (>). */
    def cmpAtom(attr: Expression, lit: Literal, op: Int): Boolean = {
      val parts = attrPath(attr).getOrElse(return true)
      if (lit.value == null) return false // comparison with NULL matches nothing
      val t = typeOf(parts).getOrElse(return true)
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
            val t = typeOf(parts).getOrElse(return true)
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
            val t = typeOf(parts).getOrElse(return true)
            bounds(parts, t) match {
              case AllNull => false
              case _ => true
            }
        }
      case StartsWith(c, Lit(l)) =>
        val parts = attrPath(c).getOrElse(return true)
        val p = Option(l.value).map(_.toString).getOrElse(return false)
        val t = typeOf(parts).getOrElse(return true)
        if (t != StringType) return true
        bounds(parts, t) match {
          case Unknown => true
          case AllNull => false
          case Range(mn, mx, _) =>
            // both comparisons in the SAME unsigned-UTF-8-byte order the
            // bounds were recorded under; the min is truncated to the
            // prefix's UTF-8 BYTE length (byte truncation of a byte-order
            // lower bound stays a lower bound of the matching prefix)
            val pb = p.getBytes("UTF-8")
            val lower = mn.forall {
              case s: String => byteCmp(s.getBytes("UTF-8").take(pb.length), pb) <= 0
              case _ => true
            }
            val upper = mx.forall {
              case s: String => byteCmp(s.getBytes("UTF-8"), pb) >= 0
              case _ => true
            }
            lower && upper
        }
      case Literal(v: Boolean, BooleanType) => v
      case Literal(null, _) => false
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

    /** c != v may match unless every non-null value equals v and nulls
      * never satisfy != either (three-valued logic). */
    def notEqAtom(attr: Expression, lit: Literal): Boolean = {
      val parts = attrPath(attr).getOrElse(return true)
      if (lit.value == null) return false
      val t = typeOf(parts).getOrElse(return true)
      val v = coerceLit(lit, t).getOrElse(return true)
      bounds(parts, t) match {
        case Unknown => true
        case AllNull => false
        case Range(Some(mn), Some(mx), _) =>
          !(cmp(mn, v).contains(0) && cmp(mx, v).contains(0))
        case _ => true
      }
    }

    may(cond)
  }

  /**
   * The simple top-level conjunct atoms of a resolved predicate, as
   * (column, op, natural Scala value) triples — the shape
   * [[IcebergSource.projectPredicate]] turns into inclusive partition
   * predicates. Only bare `attr op literal` conjuncts qualify (no Cast
   * on the ATTRIBUTE side, no OR/NOT); the literal side may be any
   * foldable subtree (analysis wraps date/timestamp literals in a
   * coercion Cast — it folds here). Date values surface as
   * `java.time.LocalDate`, timestamps as `java.time.Instant` — what the
   * projection's transform math consumes. Anything else is simply not
   * emitted, which is sound because partition pruning with a SUBSET of
   * the conjuncts still keeps a superset of matching files.
   */
  def conjunctAtoms(cond: Expression): Seq[(String, String, Any)] = {
    object Lit {
      def unapply(x: Expression): Option[Literal] = x match {
        case l: Literal => Some(l)
        case e if e.foldable && !e.exists(_.isInstanceOf[AttributeReference]) =>
          try Some(Literal(e.eval(null), e.dataType))
          catch { case _: Exception => None }
        case _ => None
      }
    }
    def natural(l: Literal): Option[Any] = (l.value, l.dataType) match {
      case (null, _) => None
      case (u: org.apache.spark.unsafe.types.UTF8String, _) => Some(u.toString)
      case (d: Integer, DateType) => Some(LocalDate.ofEpochDay(d.longValue()))
      case (micros: java.lang.Long, TimestampType | TimestampNTZType) =>
        Some(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case (v @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte |
                 _: Boolean), _) => Some(v)
      case _ => None
    }
    def name(e: Expression): Option[String] = e match {
      case r: AttributeReference => Some(r.name)
      case _ => None
    }
    def atom(c: Expression, l: Literal, op: String): Seq[(String, String, Any)] =
      (name(c), natural(l)) match {
        case (Some(n), Some(v)) => Seq((n, op, v))
        case _ => Nil
      }
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case other => other
    }
    cond match {
      case And(a, b) => conjunctAtoms(a) ++ conjunctAtoms(b)
      case EqualTo(c, Lit(l)) if name(c).isDefined => atom(c, l, "=")
      case EqualTo(Lit(l), c) if name(c).isDefined => atom(c, l, "=")
      case LessThan(c, Lit(l)) if name(c).isDefined => atom(c, l, "<")
      case LessThan(Lit(l), c) if name(c).isDefined => atom(c, l, flip("<"))
      case LessThanOrEqual(c, Lit(l)) if name(c).isDefined => atom(c, l, "<=")
      case LessThanOrEqual(Lit(l), c) if name(c).isDefined => atom(c, l, flip("<="))
      case GreaterThan(c, Lit(l)) if name(c).isDefined => atom(c, l, ">")
      case GreaterThan(Lit(l), c) if name(c).isDefined => atom(c, l, flip(">"))
      case GreaterThanOrEqual(c, Lit(l)) if name(c).isDefined => atom(c, l, ">=")
      case GreaterThanOrEqual(Lit(l), c) if name(c).isDefined => atom(c, l, flip(">="))
      case In(c, vs) if vs.nonEmpty =>
        val nat = vs.map(Lit.unapply(_).flatMap(natural))
        (name(c), nat) match {
          case (Some(n), vals) if vals.forall(_.isDefined) =>
            Seq((n, "in", vals.flatten))
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /**
   * Disjunctive normal form of a predicate's PROJECTABLE atoms:
   * `Some(groups)` means the predicate IMPLIES "OR over groups", each
   * group an AND of [[conjunctAtoms]]-shaped triples; `None` means the
   * predicate cannot restrict anything (no projectable structure). The
   * OR shape is what `month = X OR month = Y` (or a date-range union)
   * compiles to — without it, an everyday 100 TB filter derives no
   * partition projection at all and scans the world.
   *
   * Soundness: dropping a conjunct keeps a SUPERSET (so an And may keep
   * either side when the cross-product would exceed `maxGroups`), but a
   * disjunct can never be dropped — an Or with an unprojectable side is
   * unrestrictive as a whole, and an Or whose union would exceed
   * `maxGroups` degrades to None rather than to a subset.
   */
  def dnfAtoms(cond: Expression, maxGroups: Int = 64)
      : Option[Seq[Seq[(String, String, Any)]]] = cond match {
    case And(a, b) => (dnfAtoms(a, maxGroups), dnfAtoms(b, maxGroups)) match {
      case (None, None) => None
      case (Some(x), None) => Some(x)
      case (None, Some(y)) => Some(y)
      case (Some(x), Some(y)) =>
        if (x.size.toLong * y.size.toLong <= maxGroups)
          Some(for { g <- x; h <- y } yield g ++ h)
        else Some(if (x.size <= y.size) x else y) // superset: one side only
    }
    case Or(a, b) => (dnfAtoms(a, maxGroups), dnfAtoms(b, maxGroups)) match {
      case (Some(x), Some(y)) if x.size + y.size <= maxGroups => Some(x ++ y)
      case _ => None // an unprojectable (or oversized) disjunct admits all
    }
    case leaf =>
      val atoms = conjunctAtoms(leaf)
      if (atoms.isEmpty) None else Some(Seq(atoms))
  }

  // ------------------------------------------------- footer extraction

  /** One leaf column's footer-aggregated statistics: raw parquet min/max
    * values (types per [[org.apache.parquet.column.statistics.Statistics]])
    * plus the column's parquet type and optional embedded field id. */
  final case class LeafStats(path: Seq[String],
                             prim: org.apache.parquet.schema.PrimitiveType,
                             fieldId: Option[Int],
                             min: Option[Any], max: Option[Any],
                             nullCount: Option[Long])

  /**
   * (rowCount, per-leaf stats) from ONE parquet footer — pure metadata,
   * no data pages. Only repetition-level-0 leaves (array/map interiors
   * have no meaningful file bounds); min/max omitted when any chunk with
   * values lacks usable statistics. The min/max ordering across chunks is
   * delegated to `ordering` on the RAW parquet values.
   */
  def footerLeafStats(conf: org.apache.hadoop.conf.Configuration,
                      p: org.apache.hadoop.fs.Path): (Long, Seq[LeafStats]) = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = r.getFooter
      val schema = footer.getFileMetaData.getSchema
      val leaves = schema.getColumns.asScala.filter(_.getMaxRepetitionLevel == 0).toSeq
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val byPath = blocks.map(b =>
        b.getColumns.asScala.map(c => c.getPath.toArray.toSeq -> c).toMap)
      val out = leaves.flatMap { cd =>
        val path = cd.getPath.toSeq
        val prim = cd.getPrimitiveType
        val chunks = byPath.flatMap(_.get(path))
        if (chunks.size != blocks.size) None
        else {
          val stats = chunks.map(_.getStatistics)
          val nullCount =
            if (stats.forall(s => s != null && s.isNumNullsSet))
              Some(stats.map(_.getNumNulls).sum)
            else None
          // bounds may only be emitted when EVERY chunk is accounted for:
          // either it carries usable min/max, or it is provably all-null
          // (numNulls == valueCount). A chunk whose stats parquet-mr
          // dropped (e.g. oversized binary values) would otherwise be
          // silently excluded and the file bounds would not cover its
          // rows — read-side skipping could then drop matching rows.
          val perChunk = chunks.map { c =>
            val s = c.getStatistics
            val usable = s != null && !s.isEmpty && s.hasNonNullValue
            val provablyAllNull =
              s != null && s.isNumNullsSet && s.getNumNulls == c.getValueCount
            (s, usable, provablyAllNull)
          }
          val (mn, mx) =
            if (perChunk.forall { case (_, u, an) => u || an }) {
              val withValues = perChunk.collect {
                case (s, true, _) => (s.genericGetMin, s.genericGetMax)
              }
              if (withValues.nonEmpty) {
                val minV = withValues.map(_._1).reduce((a, b) =>
                  if (rawCmp(prim, a, b) <= 0) a else b)
                val maxV = withValues.map(_._2).reduce((a, b) =>
                  if (rawCmp(prim, a, b) >= 0) a else b)
                (Some(minV), Some(maxV))
              } else (None, None)
            } else (None, None)
          val id = Option(prim.getId).map(_.intValue())
          Some(LeafStats(path, prim, id, mn, mx, nullCount))
        }
      }
      (rows, out)
    } finally r.close()
  }

  /** Ordering on RAW parquet statistics values of one column — the
    * column type's OWN comparator (unsigned lexicographic for strings,
    * total order parquet-mr recorded the stats under). */
  private def rawCmp(prim: org.apache.parquet.schema.PrimitiveType,
                     a: Any, b: Any): Int =
    prim.comparator[Any]().compare(a, b)
}
