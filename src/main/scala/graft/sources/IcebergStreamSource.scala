package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/**
 * Iceberg table as a STREAMING SOURCE: tail the snapshot log and emit
 * each new snapshot's appended data files. Counterpart of
 * [[DeltaStreamSource]] for the other open table format (the Iceberg
 * runtime's own streaming read has the same shape: per-snapshot appends,
 * fail on overwrites/deletes unless told to skip).
 *
 *  - default start = the CURRENT snapshot (read MOR-correct, deletes
 *    applied) as batch 0, then new snapshots; `startingSnapshotId`
 *    (an id, or "latest") tails instead.
 *  - offsets address whole snapshots (`maxFilesPerTrigger` caps
 *    SNAPSHOTS per micro-batch); a batch re-derives its file list from
 *    table metadata alone, so restarts reproduce it exactly.
 *  - tail semantics by snapshot summary operation: `append` emits the
 *    snapshot's new data files raw; `replace` (compaction, zero net row
 *    change) is skipped; `delete` fails unless ignoreDeletes/
 *    ignoreChanges; `overwrite` fails unless ignoreChanges (its added
 *    files are then emitted whole — the same at-least-once caveat the
 *    Delta source documents).
 *  - a schema change between the stream's base and a tailed snapshot
 *    fails loudly.
 */
class IcebergStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg streaming source needs .load(path) or option(\"path\", ...)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-iceberg derives its schema from the table")
    ("graft-iceberg", new IcebergStreamSource(sqlContext.sparkSession,
      pathOf(parameters), parameters).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters),
      parameters, metadataPath)
}

object IcebergStreamSource {
  private val mapper = new ObjectMapper()

  /** Stream position: snapshots up to and including `snapshotId` are
    * consumed; `snapshot=true` marks the initial-snapshot batch. */
  final case class IcebergSourceOffset(snapshotId: Long, snapshot: Boolean)
    extends OffsetV1 {
    override def json(): String =
      s"""{"snapshotId":$snapshotId,"snapshot":$snapshot}"""
  }

  private[sources] def parseOffset(json: String): IcebergSourceOffset = {
    val n = mapper.readTree(json)
    IcebergSourceOffset(n.get("snapshotId").asLong, n.get("snapshot").asBoolean)
  }
}

class IcebergStreamSource(spark: SparkSession, root: String,
                          parameters: Map[String, String],
                          metadataPath: String = "") extends Source {
  import IcebergStreamSource._

  private def opt(k1: String, k2: String): Option[String] =
    parameters.get(k1).orElse(parameters.get(k2))
  private val maxSnapshots: Option[Int] =
    opt("maxFilesPerTrigger", "max_files_per_trigger").map(_.toInt)
  private val ignoreDeletes =
    opt("ignoreDeletes", "ignore_deletes").exists(_.toBoolean)
  private val ignoreChanges =
    opt("ignoreChanges", "ignore_changes").exists(_.toBoolean)
  private val startingSnapshotId: Option[String] =
    opt("startingSnapshotId", "starting_snapshot_id")
  /** CDF mode: emit the changelog (table columns + _change_type /
    * _change_ordinal / _commit_snapshot_id / _commit_timestamp) instead
    * of the data — the initial snapshot (when no startingSnapshotId)
    * arrives as `insert` rows, tail snapshots stream through
    * [[IcebergSource.changes]]; deletes are DATA here, not errors.
    * `_change_ordinal` restarts per micro-batch (it is relative to the
    * batch's consumed range). */
  private val readChangeFeed =
    opt("readChangeFeed", "read_change_feed").exists(_.toBoolean)

  private def meta: IcebergSource.TableMeta = IcebergSource.tableMeta(spark, root)

  /** Snapshot log in commit order (the ordering changes() uses). */
  private def orderedSnaps(m: IcebergSource.TableMeta) =
    m.snapshots.sortBy(s => (s.timestampMs, s.snapshotId))

  // Left(id) = emit snapshot `id` whole as batch 0; Right(id) = tail
  // snapshots strictly after `id` (Long.MinValue = from the beginning)
  private lazy val base: Either[Long, Long] = {
    val m = meta
    val cur = m.currentSnapshotId.getOrElse(throw new IllegalArgumentException(
      s"iceberg table $root has no snapshot to stream from"))
    startingSnapshotId match {
      case None => Left(cur)
      case Some("latest") => Right(cur)
      case Some(id) =>
        // tail from (and including) the given snapshot: exclusive cursor
        // is its predecessor in the log
        val ord = orderedSnaps(m)
        val i = ord.indexWhere(_.snapshotId == id.toLong)
        require(i >= 0, s"snapshot $id not in " +
          s"[${ord.map(_.snapshotId).mkString(", ")}]")
        Right(if (i == 0) Long.MinValue else ord(i - 1).snapshotId)
    }
  }

  private val tableSchema: StructType =
    IcebergSource.stripFieldIds(meta.schema).asInstanceOf[StructType]

  override val schema: StructType =
    if (!readChangeFeed) tableSchema
    else StructType(tableSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_change_ordinal",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType)))

  private def schemaCheck(m: IcebergSource.TableMeta): Unit =
    require(IcebergSource.stripFieldIds(m.schema) == tableSchema,
      s"Iceberg source schema changed — restart the stream to pick up " +
        s"${m.schema.simpleString}")

  /** Data-file paths of a snapshot (driver metadata walk, cached). */
  private val filesOf = scala.collection.mutable.Map[Long, Seq[String]]()
  private def dataFilePaths(m: IcebergSource.TableMeta, snapshotId: Long): Seq[String] =
    filesOf.getOrElseUpdate(snapshotId, {
      val snap = m.snapshots.find(_.snapshotId == snapshotId).getOrElse(
        throw new IllegalStateException(s"snapshot $snapshotId expired mid-stream"))
      val (d, _, _) = IcebergSource.snapshotFiles(spark, root, snap, m)
      d.map(_.path)
    })

  /** Pending snapshot positions after `from`, in commit order, capped. */
  private def pendingAfter(from: Option[IcebergSourceOffset], cap: Option[Int])
      : Seq[IcebergSourceOffset] = {
    val m = meta
    val ord = orderedSnaps(m)
    val out = scala.collection.mutable.ArrayBuffer[IcebergSourceOffset]()
    def room: Boolean = cap.forall(out.size < _)
    val cursor: Option[Long] = from match {
      case Some(o) => Some(o.snapshotId)
      case None => base match {
        case Left(id) =>
          if (room) out += IcebergSourceOffset(id, snapshot = true)
          Some(id)
        case Right(Long.MinValue) => None
        case Right(id) => Some(id)
      }
    }
    val tail = cursor match {
      case None => ord
      case Some(c) =>
        val i = ord.indexWhere(_.snapshotId == c)
        // an expired cursor cannot be ordered against the remaining log
        // (foreign snapshot ids are random, not monotonic) — fail loudly
        // rather than guess and silently skip or re-emit
        require(i >= 0, s"stream cursor snapshot $c expired from $root — " +
          "restart the stream from a retained snapshot")
        ord.drop(i + 1)
    }
    tail.foreach { s => if (room) out += IcebergSourceOffset(s.snapshotId, snapshot = false) }
    out.toSeq
  }

  override def getOffset: Option[OffsetV1] = {
    val pending = pendingAfter(lastReturned, maxSnapshots)
    if (pending.nonEmpty) setPosition(pending.last)
    else if (lastReturned.isEmpty) {
      // nothing to emit yet, but the BASE must still be pinned: a
      // 'latest' start that restarts before its first batch would
      // otherwise re-resolve against a newer table and drop the gap
      base match {
        case Right(id) => setPosition(IcebergSourceOffset(id, snapshot = false))
        case Left(_) => () // a snapshot base always has a pending batch
      }
    }
    lastReturned.map(identity[OffsetV1])
  }

  private var lastReturned: Option[IcebergSourceOffset] = recoverPosition()

  private def positionFile: Option[Path] =
    if (metadataPath.isEmpty) None
    else Some(new Path(metadataPath, "graft-iceberg-position"))

  private def setPosition(o: IcebergSourceOffset): Unit = {
    // commit-ORDER comparison (foreign snapshot ids are random, not
    // monotonic): later position in the snapshot log wins; unknown ids
    // (engine-recovered offsets for snapshots since expired) accept
    val newer = lastReturned.forall { l =>
      if (l == o) false
      else if (l.snapshot != o.snapshot) l.snapshot // snapshot phase first
      else {
        val ord = orderedSnaps(meta)
        val li = ord.indexWhere(_.snapshotId == l.snapshotId)
        val oi = ord.indexWhere(_.snapshotId == o.snapshotId)
        li < 0 || oi < 0 || li < oi
      }
    }
    if (newer) {
      lastReturned = Some(o)
      positionFile.foreach { p =>
        val f = p.getFileSystem(spark.sessionState.newHadoopConf())
        val out = f.create(p, true)
        try out.write(o.json().getBytes("UTF-8")) finally out.close()
      }
    }
  }

  private def recoverPosition(): Option[IcebergSourceOffset] =
    positionFile.flatMap { p =>
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(parseOffset(text))
      }
    }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endOff = toOffset(end)
    val startOff = start.map(toOffset)
    setPosition(endOff)
    if (readChangeFeed) return cdfBatch(startOff, endOff)
    val m = meta
    val ord = orderedSnaps(m)
    def posIdx(id: Long): Int = ord.indexWhere(_.snapshotId == id)

    val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // batch 0: the whole base snapshot, MOR-correct
    if (endOff.snapshot || (startOff.isEmpty && base.isLeft)) {
      val Left(baseId) = base: @unchecked
      if (startOff.isEmpty)
        frames += IcebergSource.read(spark, root, snapshotId = Some(baseId))
      if (endOff.snapshot)
        return streamingUnion(frames.toSeq)
    }
    // tailed snapshots in (start, end]
    def idxOrFail(id: Long, what: String): Int = {
      val i = posIdx(id)
      require(i >= 0, s"$what snapshot $id expired from $root — restart " +
        "the stream from a retained snapshot")
      i
    }
    val fromIdx: Int = startOff match {
      case Some(o) if !o.snapshot => idxOrFail(o.snapshotId, "batch-start") + 1
      case Some(o) => idxOrFail(o.snapshotId, "batch-start") + 1
      case None => base match {
        case Left(id) => idxOrFail(id, "base") + 1
        case Right(Long.MinValue) => 0
        case Right(id) => idxOrFail(id, "base") + 1
      }
    }
    // an expired END offset would silently return an empty batch and
    // advance the checkpoint past never-delivered rows — fail instead
    val toIdx = idxOrFail(endOff.snapshotId, "batch-end")
    (fromIdx to toIdx).filter(_ >= 0).foreach { i =>
      val s = ord(i)
      schemaCheck(m)
      s.operation match {
        case "replace" => () // compaction: zero net row change
        case "delete" =>
          require(ignoreDeletes || ignoreChanges,
            s"snapshot ${s.snapshotId} deletes rows from the stream " +
              s"source table ($root); set ignoreDeletes to skip deletes")
        case op =>
          if (op == "overwrite")
            require(ignoreChanges,
              s"snapshot ${s.snapshotId} overwrites rows in the stream " +
                s"source table ($root); set ignoreChanges to re-emit its " +
                "files whole")
          val prevPaths: Set[String] =
            if (i == 0) Set.empty
            else dataFilePaths(m, ord(i - 1).snapshotId).toSet
          val added = dataFilePaths(m, s.snapshotId).filterNot(prevPaths)
          if (added.nonEmpty)
            frames += spark.read.schema(schema).parquet(added: _*)
      }
    }
    streamingUnion(frames.toSeq)
  }

  /** One changelog micro-batch: the base snapshot as stamped `insert`
    * rows unioned with [[IcebergSource.changes]] over the tail range. */
  private def cdfBatch(startOff: Option[IcebergSourceOffset],
                       endOff: IcebergSourceOffset): DataFrame = {
    import org.apache.spark.sql.functions._
    val m = meta
    schemaCheck(m)
    val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (startOff.isEmpty && base.isLeft) {
      val Left(baseId) = base: @unchecked
      val ts = m.snapshots.find(_.snapshotId == baseId).map(_.timestampMs).getOrElse(0L)
      frames += IcebergSource.read(spark, root, snapshotId = Some(baseId))
        .withColumn("_change_type", lit("insert"))
        .withColumn("_change_ordinal", lit(0))
        .withColumn("_commit_snapshot_id", lit(baseId))
        .withColumn("_commit_timestamp", timestamp_millis(lit(ts)))
    }
    if (!endOff.snapshot) {
      val from: Option[Long] = startOff match {
        case Some(o) => Some(o.snapshotId)
        case None => base match {
          case Left(id) => Some(id)
          case Right(Long.MinValue) => None
          case Right(id) => Some(id)
        }
      }
      // an expired cursor cannot be silently skipped (it would drop the
      // gap) — fail loudly like the non-CDF path's expired-snapshot error
      from.foreach(id => require(m.snapshots.exists(_.snapshotId == id),
        s"changelog cursor snapshot $id expired from $root — restart the " +
          "stream from a retained snapshot"))
      frames += IcebergSource.changes(spark, root,
        fromSnapshotId = from, toSnapshotId = Some(endOff.snapshotId))
    }
    streamingUnion(frames.toSeq)
  }

  private def streamingUnion(frames: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df =
      if (frames.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else frames.reduce(_.unionByName(_)).select(schema.fieldNames.map(col).toSeq: _*)
    org.apache.spark.sql.graftshim.ColumnShim.asStreamingFrame(df)
  }

  private def toOffset(o: OffsetV1): IcebergSourceOffset = o match {
    case i: IcebergSourceOffset => i
    case other => parseOffset(other.json())
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}
