package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Shared machinery behind the streaming sources' `schemaTrackingLocation`
 * option ([[DeltaStreamSource]], [[IcebergStreamSource]]): persist the
 * schema a mid-stream ADDITIVE evolution widened to (so a restart serves
 * it), decide additivity, and null-fill/reorder batch frames to the
 * stream's declared schema.
 */
private[sources] object SchemaTracking {

  /** Read a small checkpoint-sidecar file whole; None when absent. On
    * file:// the read is raw java.nio — Hadoop's ChecksumFileSystem
    * would throw on a stale `.crc` sidecar left by a pre-atomic-publish
    * writer (the raw ATOMIC_MOVE below bypasses checksum maintenance),
    * wedging every restart on the upgrade path. */
  private[sources] def readFile(f: org.apache.hadoop.fs.FileSystem,
                                p: Path): Option[String] =
    if (CommitStore.schemeOf(f) == "file") {
      val jp = java.nio.file.Paths.get(p.toUri.getPath)
      if (!java.nio.file.Files.exists(jp)) None
      else Some(new String(java.nio.file.Files.readAllBytes(jp), "UTF-8"))
    } else if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** ATOMIC small-file publish (temp sibling + rename): a crash mid-write
    * must never leave a torn/empty state file that wedges every restart.
    * On file:// the rename REPLACES atomically (java.nio ATOMIC_MOVE), so
    * there is no moment with no state file at all; HDFS-contract stores
    * refuse rename-onto-existing, so there the publish is delete+rename —
    * a crash between the two leaves the file ABSENT (recoverable: callers
    * re-resolve or re-derive), never torn. */
  private[sources] def writeFile(f: org.apache.hadoop.fs.FileSystem, p: Path,
                                 text: String): Unit = {
    if (CommitStore.schemeOf(f) == "file") {
      // raw java.nio end-to-end: Hadoop's checksummed create would leave
      // an orphaned tmp `.crc` on every publish (the raw move relocates
      // only the data file), and any STALE destination `.crc` from a
      // pre-atomic writer must go or checksummed readers throw on open
      val jp = java.nio.file.Paths.get(p.toUri.getPath)
      val jtmp = jp.resolveSibling(
        s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.createDirectories(jp.getParent)
      java.nio.file.Files.write(jtmp, text.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(jp.resolveSibling(s".${p.getName}.crc"))
      java.nio.file.Files.move(jtmp, jp,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(p.getParent, s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
      f.mkdirs(p.getParent)
      val out = f.create(tmp, true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
      f.delete(p, false)
      require(f.rename(tmp, p), s"failed to publish state file $p")
    }
  }

  /**
   * Recover a source's last checkpointed offset json from the STREAM's
   * own offset WAL (`<checkpoint>/offsets/<batchId>`) — the fallback for
   * a torn or missing position sidecar. The WAL is written atomically by
   * the engine (HDFSMetadataLog temp+rename) and is the authoritative
   * record of the offsets already handed out; recovering from it instead
   * of treating the position as fresh keeps a capped getOffset from
   * re-returning offsets BEHIND the committed cursor (which would replay
   * delivered files). None = the WAL has no entry (genuinely fresh
   * stream). Layout per OffsetSeqLog v1: line 0 "v1", line 1 batch
   * metadata, then one offset json (or "-") per source, in source order;
   * the source's index is its metadataPath directory name.
   */
  /** True when the checkpoint's LATEST offset-WAL entry for this source
    * equals `offsetJson` AND that batch is in the COMMIT log — i.e. the
    * engine is replaying an already-committed batch at restart purely to
    * re-prime V1 source state (MicroBatchExecution.populateStartOffsets
    * discards the frame). Sources use this to tolerate such a replay
    * whose content has since become unreconstructable (e.g. the end
    * snapshot expired): an UNCOMMITTED batch in that state is genuine
    * data loss and must still fail loudly. */
  def isCommittedEnd(spark: SparkSession, metadataPath: String,
                     offsetJson: String): Boolean = {
    val src = new Path(metadataPath) // <checkpoint>/sources/<i>
    val idx = src.getName.toIntOption.getOrElse(return false)
    val parent = Option(src.getParent).flatMap(p => Option(p.getParent))
      .getOrElse(return false)
    val offsets = new Path(parent, "offsets")
    val f = offsets.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(offsets)) return false
    val batches = f.listStatus(offsets).map(_.getPath)
      .filter(p => p.getName.nonEmpty && p.getName.forall(_.isDigit))
    if (batches.isEmpty) return false
    val latest = batches.maxBy(_.getName.toLong)
    val matches = readFile(f, latest).exists { text =>
      text.split('\n').drop(2).lift(idx).map(_.trim).contains(offsetJson)
    }
    matches && f.exists(new Path(parent, s"commits/${latest.getName}"))
  }

  def walOffsetJson(spark: SparkSession, metadataPath: String): Option[String] = {
    val src = new Path(metadataPath) // <checkpoint>/sources/<i>
    val idx = src.getName.toIntOption.getOrElse(return None)
    val parent = Option(src.getParent).flatMap(p => Option(p.getParent))
      .getOrElse(return None)
    val offsets = new Path(parent, "offsets")
    val f = offsets.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(offsets)) return None
    val batches = f.listStatus(offsets).map(_.getPath)
      .filter(p => p.getName.nonEmpty && p.getName.forall(_.isDigit))
    if (batches.isEmpty) return None
    val latest = batches.maxBy(_.getName.toLong)
    readFile(f, latest).flatMap { text =>
      text.split('\n').drop(2).lift(idx).map(_.trim)
        .filter(s => s.nonEmpty && s != "-")
    }
  }

  /** (version-or-snapshot-id the schema took effect at, tracked schema),
    * when the tracking file exists. Accepts the legacy "snapshotId" key. */
  def read(spark: SparkSession, p: Path): Option[(Long, StructType)] = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    readFile(f, p).map { text =>
      val n = new ObjectMapper().readTree(text)
      val v = Option(n.get("version")).orElse(Option(n.get("snapshotId")))
        .map(_.asLong).getOrElse(0L)
      (v, org.apache.spark.sql.types.DataType.fromJson(n.get("schemaJson").asText())
        .asInstanceOf[StructType])
    }
  }

  def write(spark: SparkSession, p: Path, version: Long, st: StructType): Unit = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val node = new ObjectMapper().createObjectNode()
    node.put("version", version)
    node.put("schemaJson", st.json)
    writeFile(f, p, node.toString)
  }

  /** The streaming sources' PERSISTED BASE (what batch 0 was resolved
    * against — a restart must replay against the same one): Left = a
    * snapshot version/id, Right = a tail cursor. */
  def readBase(spark: SparkSession, p: Path): Option[Either[Long, Long]] = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    readFile(f, p).map { text =>
      val n = new ObjectMapper().readTree(text)
      if (n.get("kind").asText() == "snapshot") Left(n.get("v").asLong)
      else Right(n.get("v").asLong)
    }
  }

  def writeBase(spark: SparkSession, p: Path, b: Either[Long, Long]): Unit = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val kind = if (b.isLeft) "snapshot" else "tail"
    writeFile(f, p, s"""{"kind":"$kind","v":${b.fold(identity, identity)}}""")
  }

  /** Every field of `old` present in `wide` with the same type. */
  def isAdditive(old: StructType, wide: StructType): Boolean =
    old.fields.forall(f =>
      wide.fields.exists(g => g.name == f.name && g.dataType == f.dataType))

  /** Every TOP-LEVEL field of `a` resolvable in `b` by the field id
    * stored under metadata key `idKey`, comparing fields through `view`
    * (stripped type, physical name — whatever identity the format keys
    * on; LOGICAL names free to differ: the RENAME shape). False when
    * either schema is not fully id-annotated. Shared by both streaming
    * sources' rename tracking (Delta keys on `delta.columnMapping.id`,
    * Iceberg on `parquet.field.id`). */
  def idSubset(a: StructType, b: StructType, idKey: String,
               view: org.apache.spark.sql.types.StructField => Any): Boolean = {
    def m(st: StructType): Option[Map[Long, Any]] =
      if (st.fields.nonEmpty && st.fields.forall(_.metadata.contains(idKey)))
        Some(st.fields.map(f => f.metadata.getLong(idKey) -> view(f)).toMap)
      else None
    (m(a), m(b)) match {
      case (Some(x), Some(y)) => x.forall { case (id, v) => y.get(id).contains(v) }
      case _ => false
    }
  }

  /** Every field of `a` resolvable in `b` — RECURSIVELY through struct
    * members — under the per-field identity `key`, with equal non-struct
    * types: the NARROWING shape a column drop leaves, at any depth
    * (dropping a top-level column or a struct member both make the new
    * schema a recursive subset of the served one). Fields whose key is
    * undefined fail the match — conservative for foreign schemas. */
  def idNarrows(a: StructType, b: StructType,
                key: org.apache.spark.sql.types.StructField => Option[Any])
      : Boolean = {
    def typeOk(x: org.apache.spark.sql.types.DataType,
               y: org.apache.spark.sql.types.DataType): Boolean = (x, y) match {
      case (sa: StructType, sb: StructType) => narrows(sa, sb)
      case (xa: org.apache.spark.sql.types.ArrayType,
            ya: org.apache.spark.sql.types.ArrayType) =>
        typeOk(xa.elementType, ya.elementType)
      case (xm: org.apache.spark.sql.types.MapType,
            ym: org.apache.spark.sql.types.MapType) =>
        typeOk(xm.keyType, ym.keyType) && typeOk(xm.valueType, ym.valueType)
      case (x0, y0) => x0 == y0
    }
    def narrows(sa: StructType, sb: StructType): Boolean =
      sa.fields.forall { fa =>
        key(fa).exists(ka => sb.fields.exists(fb =>
          key(fb).contains(ka) && typeOk(fa.dataType, fb.dataType)))
      }
    narrows(a, b)
  }

  /** A type view that keys struct MEMBERS by their stored field id (and
    * recurses), so two struct types that differ only in member NAMES
    * compare equal — the nested-rename shape. Members without an id
    * annotation fall back to name keys (foreign schemas), keeping the
    * comparison conservative there. */
  def idCanonical(dt: org.apache.spark.sql.types.DataType,
                  idKey: String): Any = dt match {
    case s: StructType =>
      s.fields.map { f =>
        val key: Any =
          if (f.metadata.contains(idKey)) f.metadata.getLong(idKey) else f.name
        key -> idCanonical(f.dataType, idKey)
      }.toSeq
    case a: org.apache.spark.sql.types.ArrayType =>
      ("array", idCanonical(a.elementType, idKey), a.containsNull)
    case m: org.apache.spark.sql.types.MapType =>
      ("map", idCanonical(m.keyType, idKey),
        idCanonical(m.valueType, idKey), m.valueContainsNull)
    case other => other
  }

  /** Null-fill/reorder `df` to the stream's declared `schema` — how files
    * written under an older (narrower) table schema surface after a
    * tracked widening. */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    if (df.schema == schema) df
    else df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
