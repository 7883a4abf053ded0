package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/**
 * Native read-only Delta Lake table reader, built directly on the PUBLIC
 * Delta transaction-log protocol (delta.io PROTOCOL.md) — no delta-spark
 * jar (absent in this environment). Covers the reference's Delta read
 * surface: plain reads, `versionAsOf` / `timestampAsOf` time travel
 * (reference odibi/config.py:1355-1390, spark_engine.py:540-545) and the
 * snapshot diff that `detect_deletes` consumes. Writes stay on
 * [[VersionedTable]]; a user pointing the engine at an EXISTING
 * `_delta_log` table now gets real data back.
 *
 * Protocol subset implemented:
 *   - commit files `_delta_log/%020d.json` (newline-delimited JSON actions)
 *   - single-part checkpoints `%020d.checkpoint.parquet` and multi-part
 *     `%020d.checkpoint.%010d.%010d.parquet` (replay starts from the
 *     newest complete checkpoint at or before the target version)
 *   - actions: `metaData` (schemaString = Spark StructType JSON,
 *     partitionColumns, configuration), `protocol`, `add`, `remove`,
 *     `commitInfo` (timestamp for timestampAsOf); `txn`/`cdc`/stats are
 *     skipped — they do not affect a batch read
 *   - state reconstruction: newest metaData/protocol win; an `add` of a
 *     path supersedes earlier adds; a `remove` drops the path
 *   - partition values: `add.partitionValues` strings cast to the table
 *     schema (files of a partitioned table do not store those columns)
 *
 * Deletion vectors ARE supported on the read path (see
 * [[DeletionVectors]]): files whose `add` carries a DV are scanned with
 * `_metadata.row_index` and the deleted positions are dropped by an
 * anti-join (DV payloads decode on executors). Column mapping modes
 * `name` AND `id` are supported: per the protocol both modes store data
 * under each field's `delta.columnMapping.physicalName` (id mode adds
 * parquet field ids on top of the same physical names), so the scan uses
 * the physical schema (recursively, nested struct fields included) and
 * the result is renamed back to logical names — nested renames via a
 * positional struct cast, which is a pure rename because the types are
 * identical. `add.partitionValues` keys are physical names under mapping,
 * logical otherwise; the reader accepts either. Fails fast (never
 * silently mis-reads) on tables requiring features this reader does not
 * implement: unknown reader features at protocol v3+. Checkpoints load
 * in all three layouts — classic single-file, multi-part, and V2
 * (uuid-named json/parquet with sidecar file actions).
 *
 * Scale: log replay is driver-side metadata work — the same model every
 * Delta implementation uses (the active-file list must reach the planner
 * anyway). The DATA path is one parquet scan over the active files; for
 * partitioned tables the per-file partition values attach via a broadcast
 * file→values join on the file name, so 100 TB of data still moves through
 * a single columnar scan with pushdown intact.
 */
object DeltaLog {

  final case class AddFile(path: String, partitionValues: Map[String, Option[String]],
                           size: Long, modificationTime: Long,
                           deletionVector: Option[DeletionVectors.Descriptor] = None,
                           stats: Option[String] = None) {
    /** `stats.numRecords` when recorded. With `tightBounds=false` (a
      * DV-carrying add) this is the PHYSICAL row count of the parquet
      * file; with tight bounds it equals the physical count too (a file
      * only diverges logically once a DV exists, and the DV writer
      * re-stamps non-tight stats then) — so either way it is the footer
      * row count, usable without re-reading the footer. */
    def numRecords: Option[Long] =
      stats.flatMap { s =>
        val n = mapper.readTree(s)
        Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong())
      }
  }

  final case class Snapshot(version: Long, schema: StructType,
                            partitionColumns: Seq[String],
                            configuration: Map[String, String],
                            files: Seq[AddFile],
                            tableId: Option[String] = None,
                            transactions: Map[String, Long] = Map.empty,
                            minReaderVersion: Int = 1,
                            minWriterVersion: Int = 2,
                            readerFeatures: Set[String] = Set.empty,
                            writerFeatures: Set[String] = Set.empty)

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(root: String) = new Path(root, "_delta_log")

  /** True when `root/_delta_log` exists with at least one commit. */
  def isDeltaTable(spark: SparkSession, root: String): Boolean = {
    val f = fs(spark, root)
    f.exists(logDir(root)) && f.listStatus(logDir(root))
      .exists(s => commitVersion(s.getPath.getName).isDefined)
  }

  private def commitVersion(name: String): Option[Long] =
    if (name.length == 25 && name.endsWith(".json") && name.take(20).forall(_.isDigit))
      Some(name.take(20).toLong)
    else None

  private sealed trait CheckpointKind
  private case object Classic extends CheckpointKind
  private final case class MultiPart(part: Int, of: Int) extends CheckpointKind
  /** UUID-named V2 checkpoint (file actions may live in sidecars). */
  private final case class V2(json: Boolean) extends CheckpointKind

  // %020d.checkpoint.parquet | %020d.checkpoint.%010d.%010d.parquet |
  // %020d.checkpoint.<uuid>.parquet|json  (the v2Checkpoint naming)
  private def checkpointVersion(name: String): Option[(Long, CheckpointKind)] = {
    val single = "^(\\d{20})\\.checkpoint\\.parquet$".r
    val multi = "^(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet$".r
    val v2 = "^(\\d{20})\\.checkpoint\\.([A-Za-z0-9][A-Za-z0-9-]*)\\.(parquet|json)$".r
    name match {
      case single(v) => Some((v.toLong, Classic))
      case multi(v, part, of) => Some((v.toLong, MultiPart(part.toInt, of.toInt)))
      case v2(v, _, ext) => Some((v.toLong, V2(ext == "json")))
      case _ => None
    }
  }

  /** Committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(logDir(root))) Nil
    else f.listStatus(logDir(root)).toSeq
      .flatMap(s => commitVersion(s.getPath.getName)).sorted
  }

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** add.path is an RFC 2396 URL-encoded path, relative to the table root
    * (absolute URIs appear in shallow clones — passed through). */
  private[sources] def decodePath(raw: String): String =
    try new java.net.URI(raw).getPath match {
      case null | "" => raw
      case p => if (raw.contains("://")) raw else p
    } catch { case _: java.net.URISyntaxException => raw }

  private[sources] def absolutize(root: String, raw: String): String = {
    val decoded = decodePath(raw)
    if (raw.contains("://") || decoded.startsWith("/")) decoded
    else s"${root.stripSuffix("/")}/$decoded"
  }

  // ------------------------------------------------------ state replay

  private final class State {
    var schema: StructType = _
    var partitionColumns: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    val files = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    var commitTimestamp: Long = 0L
    var tableId: Option[String] = None
    // txn (SetTransaction) actions: the streaming sink's exactly-once
    // watermark — highest committed version per appId
    val txns = scala.collection.mutable.HashMap[String, Long]()

    def applyTxn(t: JsonNode): Unit = {
      val app = t.get("appId").asText()
      val v = t.get("version").asLong()
      txns.update(app, math.max(txns.getOrElse(app, Long.MinValue), v))
    }

    def applyMeta(m: JsonNode): Unit = {
      tableId = Option(m.get("id")).map(_.asText())
      schema = DataType.fromJson(m.get("schemaString").asText()).asInstanceOf[StructType]
      partitionColumns = Option(m.get("partitionColumns")).toSeq
        .flatMap(_.elements().asScala).map(_.asText())
      configuration = Option(m.get("configuration")).map(c =>
        c.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
      val mapping = configuration.getOrElse("delta.columnMapping.mode", "none")
      require(Set("none", "name", "id").contains(mapping),
        s"unsupported Delta column mapping mode '$mapping'")
    }

    var minReader: Int = 1
    var minWriter: Int = 2
    var readerFeats: Set[String] = Set.empty
    var writerFeats: Set[String] = Set.empty

    def applyProtocol(p: JsonNode): Unit = {
      val reader = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
      if (reader >= 3) {
        val feats = Option(p.get("readerFeatures")).toSeq
          .flatMap(_.elements().asScala).map(_.asText()).toSet
        val supported = Set("timestampNtz", "columnMapping", "deletionVectors",
          "v2Checkpoint")
        val unknown = feats -- supported
        require(unknown.isEmpty,
          s"unsupported Delta reader features: ${unknown.mkString(", ")}")
      } else require(reader <= 2,
        s"unsupported Delta minReaderVersion $reader")
      // retained on the snapshot: a feature-upgrading writer (the DV
      // delete) must MERGE the table's existing features, never clobber
      minReader = reader
      minWriter = Option(p.get("minWriterVersion")).map(_.asInt()).getOrElse(2)
      readerFeats = Option(p.get("readerFeatures")).toSeq
        .flatMap(_.elements().asScala).map(_.asText()).toSet
      writerFeats = Option(p.get("writerFeatures")).toSeq
        .flatMap(_.elements().asScala).map(_.asText()).toSet
    }

    def applyAdd(a: JsonNode): Unit = {
      val dv = Option(a.get("deletionVector")).filter(!_.isNull).map { d =>
        DeletionVectors.Descriptor(
          d.get("storageType").asText(),
          d.get("pathOrInlineDv").asText(),
          Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
          d.get("sizeInBytes").asInt(),
          d.get("cardinality").asLong())
      }
      val pv = Option(a.get("partitionValues")).map(n =>
        n.properties().asScala.map { e =>
          e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
        }.toMap).getOrElse(Map.empty[String, Option[String]])
      val path = a.get("path").asText()
      files.update(path, AddFile(path, pv,
        Option(a.get("size")).map(_.asLong()).getOrElse(0L),
        Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L), dv,
        Option(a.get("stats")).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)))
    }

    def applyRemove(r: JsonNode): Unit = { files.remove(r.get("path").asText()); () }
  }

  /** Bounded LRU of parsed commit JSON files. Delta commit files
    * (vN.json) are WRITE-ONCE — the commit claim is an atomic create and
    * nothing ever rewrites one — so a (path, mtime, length) key can never
    * serve stale content, and the one getFileStatus per hit preserves
    * log-retention semantics (a vacuumed commit misses the cache and
    * fails like an uncached read). Snapshot replay, time-travel timestamp
    * resolution, CDF ranges and the streaming source all re-parsed the
    * same immutable files once per action / micro-batch. Callers only
    * read the nodes. No cross-run reuse exists — each bench invocation
    * writes fresh fixture logs. */
  private val commitCacheMax = 64
  private val commitCache =
    new java.util.LinkedHashMap[(String, Long, Long), Seq[JsonNode]](
      commitCacheMax, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Seq[JsonNode]]): Boolean =
        size() > commitCacheMax
    }

  private[sources] def commitNodes(f: FileSystem, p: Path): Seq[JsonNode] = {
    val st = f.getFileStatus(p)
    val key = (p.toString, st.getModificationTime, st.getLen)
    commitCache.synchronized {
      val hit = commitCache.get(key)
      if (hit != null) return hit
    }
    val nodes = readText(f, p).split('\n').iterator
      .map(_.trim).filter(_.nonEmpty).map(mapper.readTree).toVector
    commitCache.synchronized { commitCache.put(key, nodes); () }
    nodes
  }

  private def applyCommit(state: State, nodes: Seq[JsonNode]): Unit =
    nodes.foreach { node =>
      if (node.has("metaData")) state.applyMeta(node.get("metaData"))
      if (node.has("protocol")) state.applyProtocol(node.get("protocol"))
      if (node.has("add")) state.applyAdd(node.get("add"))
      if (node.has("remove")) state.applyRemove(node.get("remove"))
      if (node.has("txn")) state.applyTxn(node.get("txn"))
      if (node.has("commitInfo")) {
        val ts = Option(node.get("commitInfo").get("timestamp")).map(_.asLong())
        ts.foreach(t => state.commitTimestamp = math.max(state.commitTimestamp, t))
      }
    }

  /** Newest COMPLETE checkpoint at or before `target` (all parts
    * present). Classic single-file, multi-part, and V2 (uuid-named,
    * sidecar-bearing) checkpoints all qualify; the boolean marks a
    * json-format V2 checkpoint. */
  private def latestCheckpointAtOrBefore(f: FileSystem, root: String,
                                         target: Long)
      : Option[(Long, Seq[Path], Boolean)] = {
    val byVersion = f.listStatus(logDir(root)).toSeq
      .flatMap(s => checkpointVersion(s.getPath.getName).map { case (v, kind) =>
        (v, kind, s.getPath)
      })
      .filter(_._1 <= target)
      .groupBy(_._1)
    def complete(entries: Seq[(Long, CheckpointKind, Path)])
        : Option[(Seq[Path], Boolean)] = {
      entries.collectFirst { case (_, Classic, p) => (Seq(p), false) }
        .orElse(entries.collectFirst { case (_, V2(json), p) => (Seq(p), json) })
        .orElse {
          val multi = entries.collect { case (_, MultiPart(p, of), path) => (p, of, path) }
          multi.map(_._2).distinct match {
            case Seq(of) if multi.map(_._1).sorted == (1 to of) =>
              Some((multi.sortBy(_._1).map(_._3), false))
            case _ => None // torn multi-part checkpoint: skip this version
          }
        }
    }
    byVersion.toSeq.sortBy(-_._1).iterator
      .flatMap { case (v, entries) =>
        complete(entries).map { case (paths, json) => (v, paths, json) }
      }
      .nextOption()
  }

  /** A V2 checkpoint's sidecar path: bare names live under
    * `_delta_log/_sidecars/`, absolute URIs pass through. */
  private def sidecarPath(root: String, p: String): Path =
    if (p.contains(":/") || p.startsWith("/")) new Path(p)
    else new Path(new Path(logDir(root), "_sidecars"), p)

  private def loadCheckpoint(spark: SparkSession, state: State, root: String,
                             parts: Seq[Path], jsonV2: Boolean): Unit = {
    if (jsonV2) {
      // json-format V2 checkpoint: newline-delimited actions; file
      // actions may be inlined or live in sidecar parquet files
      val f = fs(spark, root)
      val sidecars = scala.collection.mutable.ArrayBuffer.empty[Path]
      readText(f, parts.head).split('\n').iterator
        .map(_.trim).filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("metaData")) state.applyMeta(node.get("metaData"))
          if (node.has("protocol")) state.applyProtocol(node.get("protocol"))
          if (node.has("add")) state.applyAdd(node.get("add"))
          if (node.has("txn")) state.applyTxn(node.get("txn"))
          if (node.has("sidecar"))
            sidecars += sidecarPath(root, node.get("sidecar").get("path").asText())
          // remove actions in a checkpoint are vacuum tombstones, not state
        }
      loadSidecars(spark, state, sidecars.toSeq)
      return
    }
    // ONE scan + collect for every action class: the per-class
    // `select(to_json(c)).collect()` loop scanned the checkpoint parquet
    // once per class (4-5 full passes of a file that at scale holds
    // millions of add rows). Row payload is unchanged — each action row
    // is non-null in exactly one class column.
    val df = spark.read.parquet(parts.map(_.toString): _*)
    val cols = df.columns.toSet
    val classes = Seq("metaData", "protocol", "add", "txn", "sidecar")
    val projected = classes.map { c =>
      if (cols.contains(c)) to_json(col(c)).as(c)
      else lit(null).cast("string").as(c)
    }
    val sidecars = scala.collection.mutable.ArrayBuffer.empty[Path]
    df.select(projected: _*).collect().foreach { r =>
      // metaData / protocol: exactly one non-null row each in a checkpoint;
      // checkpoints hold the already-reconciled file list: adds only
      if (!r.isNullAt(0)) state.applyMeta(mapper.readTree(r.getString(0)))
      if (!r.isNullAt(1)) state.applyProtocol(mapper.readTree(r.getString(1)))
      if (!r.isNullAt(2)) state.applyAdd(mapper.readTree(r.getString(2)))
      if (!r.isNullAt(3)) state.applyTxn(mapper.readTree(r.getString(3)))
      // parquet-format V2 checkpoint: follow sidecar references
      if (!r.isNullAt(4)) sidecars +=
        sidecarPath(root, mapper.readTree(r.getString(4)).get("path").asText())
    }
    loadSidecars(spark, state, sidecars.toSeq)
  }

  /** Sidecar parquet: add (live files) + remove (tombstones, skipped).
    * All of a checkpoint's sidecars load in ONE scan — per-file reads
    * cost one driver round-trip each, O(sidecars) actions per snapshot
    * load on a large table. */
  private def loadSidecars(spark: SparkSession, state: State,
                           ps: Seq[Path]): Unit = {
    if (ps.isEmpty) return
    val df = spark.read.parquet(ps.map(_.toString): _*)
    if (df.columns.contains("add"))
      df.select(to_json(col("add"))).where(col("add").isNotNull)
        .collect().foreach(r => state.applyAdd(mapper.readTree(r.getString(0))))
  }

  /** Reconstruct table state at `versionAsOf` / `timestampAsOfMs` /
    * latest. timestampAsOf picks the newest version whose commit
    * timestamp (commitInfo.timestamp, else log-file mtime) is <= the
    * requested instant — the Delta time-travel contract. */
  def snapshot(spark: SparkSession, root: String,
               versionAsOf: Option[Long] = None,
               timestampAsOfMs: Option[Long] = None): Snapshot = {
    val f = fs(spark, root)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"$root is not a Delta table (no _delta_log commits)")
    val target = (versionAsOf, timestampAsOfMs) match {
      case (Some(v), _) =>
        require(vs.contains(v),
          s"version $v not in Delta log [${vs.head}..${vs.last}]")
        v
      case (None, Some(ts)) =>
        val eligible = vs.filter(v => commitTimeOf(spark, f, root, v) <= ts)
        require(eligible.nonEmpty,
          s"no Delta commit at or before timestamp $ts (earliest is version ${vs.head})")
        eligible.last
      case _ => vs.last
    }
    val state = new State
    val cp = latestCheckpointAtOrBefore(f, root, target)
    cp.foreach { case (_, parts, jsonV2) =>
      loadCheckpoint(spark, state, root, parts, jsonV2)
    }
    val replayFrom = cp.map(_._1 + 1).getOrElse(0L)
    // aged-out commits (log retention cleanup) are only safe to skip when
    // a checkpoint covers them; replaying a partial suffix would silently
    // drop the oldest files
    require(vs.head <= replayFrom,
      s"Delta log at $root starts at version ${vs.head} with no checkpoint " +
        s"covering versions 0..${vs.head - 1} — state cannot be reconstructed")
    val toReplay = vs.filter(v => v >= replayFrom && v <= target)
    require(toReplay == (replayFrom to target),
      s"Delta log at $root has gaps in versions $replayFrom..$target")
    toReplay.foreach { v =>
      applyCommit(state, commitNodes(f, new Path(logDir(root), f"$v%020d.json")))
    }
    require(state.schema != null,
      s"Delta log at $root yields no metaData action up to version $target")
    Snapshot(target, state.schema, state.partitionColumns,
      state.configuration, state.files.values.toSeq, state.tableId,
      state.txns.toMap, state.minReader, state.minWriter,
      state.readerFeats, state.writerFeats)
  }

  private def commitTimeOf(spark: SparkSession, f: FileSystem, root: String,
                           v: Long): Long = {
    val p = new Path(logDir(root), f"$v%020d.json")
    var ts = 0L
    commitNodes(f, p).foreach { node =>
      if (node.has("commitInfo") && node.get("commitInfo").hasNonNull("timestamp"))
        ts = math.max(ts, node.get("commitInfo").get("timestamp").asLong())
    }
    if (ts > 0) ts else f.getFileStatus(p).getModificationTime
  }

  /** `delta.columnMapping.physicalName` when present (mapping modes
    * `name`/`id` set it on EVERY field), else the logical name. */
  private[sources] def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Logical schema → the schema as written in the data files: every
    * (nested) field renamed to its physicalName, metadata dropped. */
  private[sources] def toPhysical(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      org.apache.spark.sql.types.StructField(
        physicalName(f), toPhysical(f.dataType), f.nullable)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = toPhysical(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = toPhysical(m.keyType), valueType = toPhysical(m.valueType))
    case other => other
  }

  /** Logical names kept, column-mapping metadata dropped — the cast
    * target that renames physical nested fields back to logical. */
  private[sources] def stripMeta(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      org.apache.spark.sql.types.StructField(
        f.name, stripMeta(f.dataType), f.nullable)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = stripMeta(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = stripMeta(m.keyType), valueType = stripMeta(m.valueType))
    case other => other
  }

  /**
   * Read the table at a version/timestamp. One parquet scan over the
   * active files (pushdown and pruning intact); partitioned tables attach
   * their partition values via a broadcast (file name → values) join —
   * partition columns are NOT stored in Delta data files.
   * `partitionFilter` prunes FILES driver-side before the scan touches
   * parquet (equality on partition-column values, the replaceWhere
   * scoping shape): a day/region load over a 100 TB partitioned table
   * must list one partition's files, not filter post-scan.
   */
  def read(spark: SparkSession, root: String,
           versionAsOf: Option[Long] = None,
           timestampAsOfMs: Option[Long] = None,
           partitionFilter: Map[String, String] = Map.empty,
           dataFilter: Option[Column] = None): DataFrame = {
    val snap0 = snapshot(spark, root, versionAsOf, timestampAsOfMs)
    // logical name -> physical (column-mapped tables key partitionValues
    // by physical name); shared by the prune below and the value join
    val physOf: Map[String, String] =
      snap0.schema.fields.map(f => f.name -> physicalName(f)).toMap
    val snap1 = if (partitionFilter.isEmpty) snap0 else {
      val unknown = partitionFilter.keySet -- snap0.partitionColumns.toSet
      require(unknown.isEmpty,
        s"partitionFilter keys $unknown are not partition columns " +
          s"${snap0.partitionColumns}")
      snap0.copy(files = snap0.files.filter(a => partitionFilter.forall {
        case (k, v) => a.partitionValues.get(physOf.getOrElse(k, k))
          .orElse(a.partitionValues.get(k)).flatten.contains(v)
      }))
    }
    // stats-based data skipping: drop files whose min/max/nullCount prove
    // no row can match, then RE-APPLY the predicate on the scan so
    // correctness never depends on the prune (and Spark still pushes it
    // into the parquet reader for page-level skipping)
    val snap = dataFilter match {
      case Some(f) => snap1.copy(files = DeltaStats.prune(spark, snap1, f).files)
      case None => snap1
    }
    dataFilter.foldLeft(frameOf(spark, root, snap))((df, f) => df.filter(f))
  }

  /**
   * The DataFrame of exactly `snap.files` — one parquet scan (physical
   * schema under column mapping, renamed back), DV positions dropped,
   * partition values attached via the broadcast file→values join. The
   * building block behind [[read]] and the streaming source's per-batch
   * frames.
   */
  private[sources] def frameOf(spark: SparkSession, root: String,
                               snap: Snapshot): DataFrame = {
    val physOf: Map[String, String] =
      snap.schema.fields.map(f => f.name -> physicalName(f)).toMap
    val mapped =
      snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none"
    val logicalType: Map[String, DataType] =
      snap.schema.fields.map(f => f.name -> f.dataType).toMap
    val dataFields =
      snap.schema.fields.filterNot(fd => snap.partitionColumns.contains(fd.name))
    val dataSchema =
      if (mapped) StructType(dataFields.map(f =>
        org.apache.spark.sql.types.StructField(
          physicalName(f), toPhysical(f.dataType), f.nullable)))
      else StructType(dataFields.toSeq)
    val ordered = snap.schema.fieldNames.toSeq
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], stripMeta(snap.schema).asInstanceOf[StructType])
    // physical → logical: rename top-level by alias, nested by positional
    // struct cast (identical types, so the cast is a pure rename)
    def logicalCol(c: String) =
      if (!mapped) col(c)
      else col(physOf(c)).cast(stripMeta(logicalType(c))).as(c)
    val rawScan = MetaScan.parquetScanStat(spark, dataSchema,
      snap.files.map(a => absolutize(root, a.path)))
    if (snap.partitionColumns.isEmpty)
      return applyDeletionVectors(spark, root, snap, rawScan)
        .select(ordered.map(logicalCol): _*)
    // file name (unique UUID-bearing basenames per the Delta writers) →
    // partition value strings, cast to the declared types after the join
    val base = (p: String) => p.substring(p.lastIndexOf('/') + 1)
    val names = snap.files.map(a => base(decodePath(a.path)))
    require(names.distinct.size == names.size,
      s"duplicate data-file basenames in Delta snapshot of $root — cannot " +
        "key partition values by file name")
    // partitionValues keys are physical names under column mapping;
    // accept either so loosely-written logs still read
    def pvOf(a: AddFile, c: String): Option[String] =
      a.partitionValues.get(physOf(c)).orElse(a.partitionValues.get(c)).flatten
    val pvRows = snap.files.map { a =>
      Row.fromSeq(base(decodePath(a.path)) +:
        snap.partitionColumns.map(c => pvOf(a, c).orNull))
    }
    val pvSchema = StructType(
      org.apache.spark.sql.types.StructField("_gf_file",
        org.apache.spark.sql.types.StringType) +:
        snap.partitionColumns.map(c =>
          org.apache.spark.sql.types.StructField(s"_gf_pv_$c",
            org.apache.spark.sql.types.StringType)))
    val pv = spark.createDataFrame(
      spark.sparkContext.parallelize(pvRows.toSeq, 1), pvSchema)
    // the file column MUST attach on the raw scan — input_file_name()
    // returns "" after the DV anti-join's join node
    val withFile = applyDeletionVectors(spark, root, snap,
      rawScan.withColumn("_gf_file",
        element_at(split(input_file_name(), "/"), -1)))
    val partType = snap.schema.fields.map(fd => fd.name -> fd.dataType).toMap
    val joined = withFile.join(broadcast(pv), Seq("_gf_file"))
    joined.select(ordered.map { c =>
      if (snap.partitionColumns.contains(c))
        col(s"_gf_pv_$c").cast(stripMeta(partType(c))).as(c)
      else logicalCol(c)
    }: _*)
  }

  /**
   * Drop DV-deleted row positions: one anti-join of the scan's
   * (file basename, `_metadata.row_index`) against the decoded deleted
   * positions. The driver ships only raw DV payloads (total size bounded
   * by the log's own `sizeInBytes` fields); bitmap decode happens on
   * executors. No-op for snapshots without deletion vectors.
   */
  private[sources] def applyDeletionVectors(spark: SparkSession, root: String,
                                            snap: Snapshot, scan: DataFrame): DataFrame = {
    val dvFiles = snap.files.filter(_.deletionVector.isDefined)
    if (dvFiles.isEmpty) return scan
    val deleted = deletedPositions(spark, root, dvFiles,
      "_gf_dv_file", "_gf_dv_ridx")
    // collision-free provenance columns: `scan` MUST be the raw parquet
    // scan (possibly with extra withColumns) — input_file_name() and
    // `_metadata` are undefined after a join, so callers that need their
    // own file column must add it BEFORE this anti-join, never after
    scan
      .withColumn("_gf_dv_file", element_at(split(input_file_name(), "/"), -1))
      .withColumn("_gf_dv_ridx", col("_metadata.row_index"))
      .join(deleted, Seq("_gf_dv_file", "_gf_dv_ridx"), "left_anti")
      .drop("_gf_dv_file", "_gf_dv_ridx")
  }

  /**
   * (file basename, deleted row index) rows for a snapshot's DV-carrying
   * files, BROADCAST-hinted when the log's own recorded cardinalities say
   * the decoded position set is small: the anti-join then builds one hash
   * relation instead of shuffling + sorting the ENTIRE data scan against
   * a few thousand positions (the plan was SortMergeJoin with an Exchange
   * on the 100 TB side). Beyond the cap
   * (`spark.graft.dv.broadcastMaxPositions`, default 4M positions — a
   * few hundred MB of hash relation, far cheaper than a full-table
   * shuffle but bounded so a pathological table cannot OOM the driver)
   * the frame is left unhinted and the planner falls back to the shuffle.
   */
  private[sources] def deletedPositions(spark: SparkSession, root: String,
                                        dvFiles: Seq[AddFile],
                                        fileCol: String,
                                        posCol: String): DataFrame = {
    val f = fs(spark, root)
    val base = (p: String) => p.substring(p.lastIndexOf('/') + 1)
    val payloads: Seq[(String, Array[Byte])] = dvFiles.map { a =>
      base(decodePath(a.path)) -> DeletionVectors.payload(f, root, a.deletionVector.get)
    }
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField(fileCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(posCol,
        org.apache.spark.sql.types.LongType)))
    val rows = spark.sparkContext
      .parallelize(payloads, math.max(1, math.min(payloads.size, 32)))
      .flatMap { case (file, bytes) =>
        DeletionVectors.decodePositions(bytes).iterator.map(p => Row(file, p))
      }
    val deleted = spark.createDataFrame(rows, schema)
    val cap = spark.conf.getOption("spark.graft.dv.broadcastMaxPositions")
      .map(_.toLong).getOrElse(4000000L)
    val totalCardinality = dvFiles.flatMap(_.deletionVector).map(_.cardinality).sum
    if (totalCardinality <= cap) broadcast(deleted) else deleted
  }

  // ------------------------------------------------------ change data feed

  /**
   * Change rows for the commits in `[fromVersion, toVersion]` — the Delta
   * CDF `table_changes` contract, the incremental-ETL read path off a
   * Delta table. Output = the table columns plus `_change_type`,
   * `_commit_version`, `_commit_timestamp`.
   *
   * Per commit:
   *  - `cdc` actions present (a CDF-enabled writer) → read those files;
   *    they carry `_change_type` themselves (insert/delete/
   *    update_preimage/update_postimage) and per the protocol SUPERSEDE
   *    the commit's add/remove for change purposes;
   *  - otherwise derive: `add(dataChange=true)` files read as `insert`
   *    rows, `remove(dataChange=true)` files read as `delete` rows (the
   *    removed file's bytes remain until VACUUM — the same reliance
   *    delta-spark's CDF-less fallback has). Compaction commits
   *    (`dataChange=false`) produce no changes. A DV-carrying add in a
   *    non-CDC commit fails fast rather than mis-counting its deletes.
   *
   * Schema: the table schema at `toVersion` (historic schema drift
   * within the range fails the scan rather than silently coercing).
   * Scale: one parquet scan per change class per commit, unioned — each
   * scan pushes down like any other read; no row passes the driver.
   *
   * `fromIndex`/`untilIndex` slice the BOUNDARY versions by change-item
   * index (the deterministic per-version item order of
   * [[changeItemSizes]]: cdc files in log order, else adds then removes):
   * `fromIndex` skips the first items of `fromVersion`, `untilIndex`
   * stops `toVersion` before that item — how the streaming source drains
   * one bulk CDC commit as many bounded micro-batches.
   */
  def changes(spark: SparkSession, root: String,
              fromVersion: Long, toVersion: Option[Long] = None,
              fromIndex: Long = 0L,
              untilIndex: Long = Long.MaxValue): DataFrame = {
    val f = fs(spark, root)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"$root is not a Delta table")
    val to = toVersion.getOrElse(vs.last)
    require(fromVersion >= vs.head && to <= vs.last && fromVersion <= to,
      s"change range [$fromVersion, $to] outside log [${vs.head}, ${vs.last}]")
    val snap = snapshot(spark, root, versionAsOf = Some(to))
    val mapped =
      snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none"
    val physOf: Map[String, String] =
      snap.schema.fields.map(fd => fd.name -> physicalName(fd)).toMap
    val logicalType: Map[String, DataType] =
      snap.schema.fields.map(fd => fd.name -> fd.dataType).toMap
    val dataFields =
      snap.schema.fields.filterNot(fd => snap.partitionColumns.contains(fd.name))
    def physSchema(extra: Seq[org.apache.spark.sql.types.StructField]) =
      StructType(dataFields.map(fd =>
        org.apache.spark.sql.types.StructField(
          if (mapped) physicalName(fd) else fd.name,
          if (mapped) toPhysical(fd.dataType) else stripMeta(fd.dataType),
          fd.nullable)) ++ extra)
    val ordered = snap.schema.fieldNames.toSeq

    /** Read one file group — files of ONE change class across ALL range
      * commits, ONE parquet scan — attaching partition values plus the
      * change cols. `_commit_version`/`_commit_timestamp` stamp per file
      * through a (basename → value) literal map, so a 50-commit CDF range
      * plans 1-2 scans instead of a union of one subplan per
      * (commit, class) (plan analysis alone dominated multi-commit
      * ranges). `changeType` = Some(ct) stamps a derived type; None means
      * cdc files carrying their own `_change_type` column. */
    def readGroup(files: Seq[(AddFile, Long, Long)],
                  changeType: Option[String]): Option[DataFrame] = {
      if (files.isEmpty) return None
      val ctField =
        if (changeType.isEmpty)
          Seq(org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType))
        else Nil
      val scan0 = MetaScan.parquetScanStat(spark, physSchema(ctField),
        files.map { case (a, _, _) => absolutize(root, a.path) })
      val scan = changeType match {
        case Some(ct) => scan0.withColumn("_change_type", lit(ct))
        case None => scan0
      }
      def logicalCol(c: String) =
        if (!mapped) col(c)
        else col(physOf(c)).cast(stripMeta(logicalType(c))).as(c)
      val base = (p: String) => p.substring(p.lastIndexOf('/') + 1)
      val verOf: Map[String, Long] =
        files.map { case (a, v, _) => base(decodePath(a.path)) -> v }.toMap
      val tsOf: Map[String, Long] =
        files.map { case (a, _, t) => base(decodePath(a.path)) -> t }.toMap
      val withFile = scan.withColumn("_gf_file",
        element_at(split(input_file_name(), "/"), -1))
      val framed: DataFrame =
        if (snap.partitionColumns.isEmpty)
          withFile.select(ordered.map(logicalCol) ++
            Seq(col("_change_type"), col("_gf_file")): _*)
        else {
          def pvOf(a: AddFile, c: String): Option[String] =
            a.partitionValues.get(physOf(c)).orElse(a.partitionValues.get(c)).flatten
          val pvRows = files.map { case (a, _, _) =>
            Row.fromSeq(base(decodePath(a.path)) +:
              snap.partitionColumns.map(c => pvOf(a, c).orNull))
          }
          val pvSchema = StructType(
            org.apache.spark.sql.types.StructField("_gf_file",
              org.apache.spark.sql.types.StringType) +:
              snap.partitionColumns.map(c =>
                org.apache.spark.sql.types.StructField(s"_gf_pv_$c",
                  org.apache.spark.sql.types.StringType)))
          val pv = spark.createDataFrame(
            spark.sparkContext.parallelize(pvRows.toSeq, 1), pvSchema)
          withFile.join(broadcast(pv), Seq("_gf_file"))
            .select(ordered.map { c =>
              if (snap.partitionColumns.contains(c))
                col(s"_gf_pv_$c").cast(stripMeta(logicalType(c))).as(c)
              else logicalCol(c)
            } ++ Seq(col("_change_type"), col("_gf_file")): _*)
        }
      Some(framed
        .withColumn("_commit_version",
          element_at(typedLit(verOf), col("_gf_file")))
        .withColumn("_commit_timestamp",
          timestamp_millis(element_at(typedLit(tsOf), col("_gf_file"))))
        .drop("_gf_file"))
    }

    def pvMap(n: JsonNode): Map[String, Option[String]] =
      Option(n.get("partitionValues")).map(p =>
        p.properties().asScala.map { e =>
          e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
        }.toMap).getOrElse(Map.empty)

    // ONE parse pass over every available commit up to `to`: commits
    // BEFORE the range only feed `pvByPath` — remove actions MAY omit
    // partitionValues (optional in the protocol), so a partitioned
    // delete recovers them from the file's add action
    val pvByPath = scala.collection.mutable.HashMap[String, Map[String, Option[String]]]()
    final case class Parsed(version: Long, ts: Long, cdc: Seq[AddFile],
                            adds: Seq[AddFile], removes: Seq[AddFile])
    val parsed = (vs.head to to).flatMap { v =>
      val p = new Path(logDir(root), f"$v%020d.json")
      var ts = 0L
      val cdc = scala.collection.mutable.ArrayBuffer[AddFile]()
      val adds = scala.collection.mutable.ArrayBuffer[AddFile]()
      val removes = scala.collection.mutable.ArrayBuffer[AddFile]()
      var dvAdd = false
      val inRange = v >= fromVersion
      commitNodes(f, p).foreach { node =>
        if (node.has("commitInfo") && node.get("commitInfo").hasNonNull("timestamp"))
          ts = math.max(ts, node.get("commitInfo").get("timestamp").asLong())
        if (node.has("cdc") && inRange) {
          val c = node.get("cdc")
          cdc += AddFile(c.get("path").asText(), pvMap(c), 0L, 0L)
        }
        if (node.has("add")) {
          val a = node.get("add")
          pvByPath.update(a.get("path").asText(), pvMap(a))
          val dataChange = Option(a.get("dataChange")).forall(_.asBoolean(true))
          if (dataChange && inRange) {
            if (a.hasNonNull("deletionVector")) dvAdd = true
            adds += AddFile(a.get("path").asText(), pvMap(a), 0L, 0L)
          }
        }
        if (node.has("remove") && inRange) {
          val r = node.get("remove")
          val dataChange = Option(r.get("dataChange")).forall(_.asBoolean(true))
          if (dataChange) removes += AddFile(r.get("path").asText(), pvMap(r), 0L, 0L)
        }
      }
      if (!inRange) None
      else {
        // per the CDF protocol cdc actions supersede add/remove for
        // change purposes — so a DV-carrying add is fine WHEN the commit
        // carries cdc files (the DV writer stages them); only a DV add
        // in a non-CDC commit leaves its deletes unattributable
        require(cdc.nonEmpty || !dvAdd,
          s"version $v adds a deletion vector without cdc actions — " +
            "derived CDF cannot attribute its deleted rows; enable CDF " +
            "on the writer or consume snapshots")
        if (ts == 0L) ts = f.getFileStatus(p).getModificationTime
        Some(Parsed(v, ts, cdc.toSeq, adds.toSeq, removes.toSeq))
      }
    }
    // boundary-version item slicing: items of version v occupy indices
    // [0, n) in the deterministic order (cdc, else adds then removes);
    // interior versions pass through whole
    def sliceOf[T](xs: Seq[T], offset: Long, lo: Long, hi: Long): Seq[T] = {
      val a = math.max(lo - offset, 0L)
      val b = math.min(hi - offset, xs.size.toLong)
      if (a >= b) Nil else xs.slice(a.toInt, b.toInt)
    }
    // accumulate per change class ACROSS commits — one scan per class.
    // Per-file stamping needs unique basenames within a class; a path
    // re-added after a remove (protocol-legal, no real writer does it)
    // would collide in the stamp map, so such a class falls back to
    // per-commit frames.
    val cdcAll = scala.collection.mutable.ArrayBuffer[(AddFile, Long, Long)]()
    val insAll = scala.collection.mutable.ArrayBuffer[(AddFile, Long, Long)]()
    val delAll = scala.collection.mutable.ArrayBuffer[(AddFile, Long, Long)]()
    parsed.foreach { pc =>
      val lo = if (pc.version == fromVersion) fromIndex else 0L
      val hi = if (pc.version == to) untilIndex else Long.MaxValue
      val patchedRemoves = pc.removes.map(a =>
        if (a.partitionValues.nonEmpty) a
        else a.copy(partitionValues = pvByPath.getOrElse(a.path, Map.empty)))
      if (pc.cdc.nonEmpty)
        cdcAll ++= sliceOf(pc.cdc, 0L, lo, hi).map((_, pc.version, pc.ts))
      else {
        insAll ++= sliceOf(pc.adds, 0L, lo, hi).map((_, pc.version, pc.ts))
        delAll ++= sliceOf(patchedRemoves, pc.adds.size.toLong, lo, hi)
          .map((_, pc.version, pc.ts))
      }
    }
    def grouped(all: Seq[(AddFile, Long, Long)],
                ct: Option[String]): Seq[DataFrame] = {
      // stamping (and the pv join) key on the file BASENAME — writers
      // name files with a fresh uuid, but verify rather than assume
      val names = all.map { case (a, _, _) =>
        val p = decodePath(a.path); p.substring(p.lastIndexOf('/') + 1)
      }
      if (names.distinct.size == names.size) readGroup(all, ct).toSeq
      else all.groupBy { case (_, v, _) => v }.toSeq.sortBy(_._1)
        .flatMap { case (_, fs0) => readGroup(fs0, ct) }
    }
    val frames = grouped(cdcAll.toSeq, None) ++
      grouped(insAll.toSeq, Some("insert")) ++
      grouped(delAll.toSeq, Some("delete"))
    frames match {
      case Seq() =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(
          stripMeta(snap.schema).asInstanceOf[StructType].fields ++ Seq(
            org.apache.spark.sql.types.StructField("_change_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("_commit_version",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("_commit_timestamp",
              org.apache.spark.sql.types.TimestampType))))
      case fs0 => fs0.reduce(_ union _)
    }
  }

  /**
   * Per-item file sizes of ONE version's change items, in the
   * deterministic CDF item order [[changes]] slices by: cdc files in log
   * order when the commit carries them, else adds then removes
   * (dataChange=true only; a compaction commit has zero items). Driver
   * parse of one commit json — what the streaming source's file-level
   * CDF offsets enumerate against (sizes feed maxBytesPerTrigger;
   * removes without a recorded size count 0).
   */
  def changeItemSizes(spark: SparkSession, root: String,
                      version: Long): Seq[Long] = {
    val f = fs(spark, root)
    val cdc = scala.collection.mutable.ArrayBuffer[Long]()
    val adds = scala.collection.mutable.ArrayBuffer[Long]()
    val removes = scala.collection.mutable.ArrayBuffer[Long]()
    def sizeOf(n: JsonNode): Long =
      Option(n.get("size")).filterNot(_.isNull).map(_.asLong).getOrElse(0L)
    commitNodes(f, new Path(logDir(root), f"$version%020d.json")).foreach { node =>
      if (node.has("cdc")) cdc += sizeOf(node.get("cdc"))
      if (node.has("add")) {
        val a = node.get("add")
        if (Option(a.get("dataChange")).forall(_.asBoolean(true))) adds += sizeOf(a)
      }
      if (node.has("remove")) {
        val r = node.get("remove")
        if (Option(r.get("dataChange")).forall(_.asBoolean(true))) removes += sizeOf(r)
      }
    }
    if (cdc.nonEmpty) cdc.toSeq else (adds ++ removes).toSeq
  }

  /** Keys present in the previous version but gone in the latest — the
    * `detect_deletes` snapshot_diff input, same contract as
    * [[VersionedTable.snapshotDiff]]. */
  def snapshotDiff(spark: SparkSession, root: String,
                   keys: Seq[String]): DataFrame = {
    val vs = versions(spark, root)
    require(vs.size >= 2, s"snapshotDiff needs >= 2 Delta versions, have ${vs.size}")
    val prev = read(spark, root, versionAsOf = Some(vs(vs.size - 2)))
      .select(keys.head, keys.tail: _*)
    val cur = read(spark, root, versionAsOf = Some(vs.last))
      .select(keys.head, keys.tail: _*)
    prev.exceptAll(cur)
  }
}
