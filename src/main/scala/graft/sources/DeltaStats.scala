package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.time.LocalDate

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
 * The tri-state evaluation itself lives in [[StatsPruning]], shared with
 * the Iceberg manifest-bounds pruner.
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
    val (numRecords, leaves) = StatsPruning.footerLeafStats(conf, p)
    val minV = mapper.createObjectNode()
    val maxV = mapper.createObjectNode()
    val nullC = mapper.createObjectNode()
    leaves.take(indexedCols).foreach { ls =>
      ls.nullCount.foreach(n =>
        putNested(nullC, ls.path, mapper.getNodeFactory.numberNode(n)))
      (ls.min.flatMap(jsonValue(ls.prim, _, isMax = false)),
        ls.max.flatMap(jsonValue(ls.prim, _, isMax = true))) match {
        case (Some(mn), Some(mx)) =>
          putNested(minV, ls.path, mn)
          putNested(maxV, ls.path, mx)
        case _ => () // unconvertible bound: omit BOTH (conservative)
      }
    }
    val root = mapper.createObjectNode()
    root.put("numRecords", numRecords)
    root.set[JsonNode]("minValues", minV)
    root.set[JsonNode]("maxValues", maxV)
    root.set[JsonNode]("nullCount", nullC)
    root.put("tightBounds", true)
    (numRecords, mapper.writeValueAsString(root))
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

  /** Parquet statistics value → Delta stats JSON value; None when the
    * type has no sound JSON bound (conservative omission). Timestamps
    * render at millisecond precision, so a MAX with sub-ms micros rounds
    * UP to the next millisecond (PROTOCOL.md: truncated maxValues must
    * still bound the data) while MIN floors. */
  private def jsonValue(prim: PrimitiveType, v: Any, isMax: Boolean): Option[JsonNode] = {
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
            case LogicalTypeAnnotation.TimeUnit.NANOS =>
              val n = v.asInstanceOf[Long]
              if (isMax) Math.floorDiv(n + 999L, 1000L) else Math.floorDiv(n, 1000L)
          }
          val ms =
            if (isMax) Math.floorDiv(micros + 999L, 1000L) * 1000L
            else Math.floorDiv(micros, 1000L) * 1000L
          Some(f.textNode(StatsPruning.formatMicros(ms, t.isAdjustedToUTC)))
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

  /** Stats JSON re-stamped for a DV-carrying add: min/max/nullCount stay
    * VALID (non-tight) bounds after row-level deletes, so the DV writer
    * keeps them and only flips tightBounds. */
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

  /** Stats JSON value → the comparable domain of [[StatsPruning]]
    * (timestamp strings parse back to epoch micros). */
  private def coerceStat(n: JsonNode, target: DataType): Option[Any] = target match {
    case _: NumericType =>
      if (n.isNumber) Some(n.decimalValue)
      else try Some(new JBigDecimal(n.asText)) catch { case _: Exception => None }
    case TimestampType | TimestampNTZType =>
      StatsPruning.parseStatMicros(n.asText).map(new JBigDecimal(_))
    case DateType | StringType => Some(n.asText)
    case BooleanType => Some(n.asBoolean)
    case _ => None
  }

  /** Result of a skipping pass: the surviving files plus the counts a
    * caller can assert on ("did the predicate actually prune?"). */
  final case class Pruned(files: Seq[DeltaLog.AddFile], candidates: Int, kept: Int) {
    def skipped: Int = candidates - kept
  }

  /**
   * Files that MAY contain a row matching `filter` — sound (never drops a
   * file that could match) and driver-side only. Unrecognized predicate
   * shapes, missing stats, and un-indexed columns all degrade to "keep".
   */
  def prune(spark: SparkSession, snap: DeltaLog.Snapshot, filter: Column): Pruned = {
    val expr = StatsPruning.resolveCondition(spark, snap.schema, filter)
      .getOrElse(return Pruned(snap.files, snap.files.size, snap.files.size))

    // logical path -> (physical stats path, column type)
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
      walk(StructType(snap.schema.fields), parts, Nil)
    }
    val partCols = snap.partitionColumns.toSet
    val physOfPart: Map[String, String] =
      snap.schema.fields.filter(f => partCols.contains(f.name))
        .map(f => f.name -> DeltaLog.physicalName(f)).toMap

    val typeOf: Seq[String] => Option[DataType] = parts => resolve(parts).map(_._2)

    def boundsFor(a: DeltaLog.AddFile, fs: Option[FileStats])
                 (parts: Seq[String], t: DataType): StatsPruning.Bounds = {
      // partition columns: exact single-point "bounds" from partitionValues
      if (parts.size == 1 && partCols.exists(_.equalsIgnoreCase(parts.head))) {
        val pc = partCols.find(_.equalsIgnoreCase(parts.head)).get
        val raw = a.partitionValues.get(physOfPart.getOrElse(pc, pc))
          .orElse(a.partitionValues.get(pc)).flatten
        return raw match {
          case None => StatsPruning.AllNull
          case Some(s) =>
            StatsPruning.coerceLit(Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType), t) match {
              case Some(v) => StatsPruning.Range(Some(v), Some(v), mayHaveNull = false)
              case None => StatsPruning.Unknown
            }
        }
      }
      fs match {
        case None => StatsPruning.Unknown
        case Some(st) =>
          resolve(parts) match {
            case None => StatsPruning.Unknown
            case Some((phys, _)) =>
              val nc = st.nullCount.get(phys)
              val allNull = (nc, st.numRecords) match {
                case (Some(n), Some(r)) if n == r && r > 0 => true
                case _ => false
              }
              if (allNull) StatsPruning.AllNull
              else StatsPruning.Range(
                st.min.get(phys).flatMap(coerceStat(_, t)),
                st.max.get(phys).flatMap(coerceStat(_, t)),
                mayHaveNull = nc.forall(_ > 0))
          }
      }
    }

    val kept = snap.files.filter { a =>
      val fs = a.stats.flatMap(parseStats)
      StatsPruning.mayMatch(expr, typeOf, boundsFor(a, fs))
    }
    Pruned(kept, snap.files.size, kept.size)
  }

  /**
   * Union min/max range per top-level `column` across `files`' recorded
   * stats, in [[Sources.zOrderFrame]]'s numeric domain (double; epoch
   * SECONDS for date/timestamp) — the Delta twin of the Iceberg
   * manifest-bounds hint: a Z-order compaction already knows each file's
   * bounds from the log, so scanning the data a second time just for
   * min/max doubles the rewrite's read I/O. A column is absent from the
   * result when ANY file lacks a usable bound (zOrderFrame then falls
   * back to its single stats scan). Bounds from DV-carrying files
   * (tightBounds=false) remain VALID, merely wide — scaling ranges only
   * affect bucket utilization, never which rows survive.
   */
  def zRanges(snap: DeltaLog.Snapshot, files: Seq[DeltaLog.AddFile],
              columns: Seq[String]): Map[String, (Double, Double)] = {
    def toD(n: JsonNode, t: DataType): Option[Double] = t match {
      case _: NumericType =>
        if (n.isNumber) Some(n.asDouble)
        else try Some(new JBigDecimal(n.asText).doubleValue())
        catch { case _: Exception => None }
      case DateType =>
        try Some(LocalDate.parse(n.asText).toEpochDay * 86400.0)
        catch { case _: Exception => None }
      case TimestampType | TimestampNTZType =>
        StatsPruning.parseStatMicros(n.asText).map(_ / 1e6)
      case _ => None
    }
    val parsed = files.map(a => a.stats.flatMap(parseStats))
    columns.flatMap { c =>
      snap.schema.fields.find(_.name == c).flatMap { fd =>
        val phys = Seq(DeltaLog.physicalName(fd))
        val bounds = parsed.map(_.flatMap(st => for {
          mn <- st.min.get(phys).flatMap(toD(_, fd.dataType))
          mx <- st.max.get(phys).flatMap(toD(_, fd.dataType))
        } yield (mn, mx)))
        if (bounds.isEmpty || bounds.exists(_.isEmpty)) None
        else {
          val bs = bounds.flatten
          Some(c -> (bs.map(_._1).min, bs.map(_._2).max))
        }
      }
    }.toMap
  }
}
