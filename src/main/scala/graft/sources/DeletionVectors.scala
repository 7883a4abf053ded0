package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Delta Lake deletion-vector decoding, from the PUBLIC protocol spec
 * (delta.io PROTOCOL.md "Deletion Vectors" + the deletion-vector file
 * format RFC). A deletion vector marks rows of one data file as deleted
 * without rewriting the file; readers must drop those row positions.
 *
 * Pieces implemented here:
 *
 *  - the descriptor carried on `add.deletionVector` (storageType
 *    `u`/`i`/`p`, Z85-encoded UUID or inline payload, offset,
 *    sizeInBytes, cardinality);
 *  - Z85 (ZeroMQ base85) decoding, 4-byte-block aligned with zero
 *    padding, output truncated to `sizeInBytes` — the variant Delta's
 *    Base85Codec uses;
 *  - the on-disk DV file layout: 1-byte format version (= 1), then per
 *    stored vector at `offset`: 4-byte big-endian data size, the data,
 *    and a 4-byte big-endian CRC-32 of the data (verified here);
 *  - the serialized "RoaringBitmapArray" payload (portable format):
 *    little-endian magic 1681511377, little-endian int64 bitmap count,
 *    then each 32-bit bitmap in the standard RoaringBitmap portable
 *    serialization (decoded with the org.roaringbitmap classes Spark
 *    already ships). A 64-bit deleted row index is
 *    `(bitmapIndex << 32) | value`.
 *
 * [[DeltaLog.read]] applies these per-file position sets against the
 * parquet scan's `_metadata.row_index` with an anti-join; decoding runs
 * on executors (the driver ships only the raw DV bytes, whose total size
 * the log already bounds via `sizeInBytes`).
 */
object DeletionVectors {

  /** `add.deletionVector` descriptor (PROTOCOL.md). */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- Z85 ----------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Decode a Z85 string (length % 5 == 0) to `outLen` bytes (the input
    * encodes zero-padded 4-byte blocks). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
    require(outLen <= s.length / 5 * 4,
      s"Z85 input too short for $outLen bytes")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length / 5) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i * 5 + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(i * 4) = ((v >>> 24) & 0xFF).toByte
      out(i * 4 + 1) = ((v >>> 16) & 0xFF).toByte
      out(i * 4 + 2) = ((v >>> 8) & 0xFF).toByte
      out(i * 4 + 3) = (v & 0xFF).toByte
      i += 1
    }
    java.util.Arrays.copyOf(out, outLen)
  }

  /** Encode bytes as Z85 (zero-padded to 4-byte blocks) — used by tests
    * and kept next to the decoder so the two stay in sync. */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded = java.util.Arrays.copyOf(bytes, (bytes.length + 3) / 4 * 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length / 4) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i * 4 + j) & 0xFFL); j += 1 }
      val block = new Array[Char](5)
      var k = 4
      while (k >= 0) { block(k) = Z85Alphabet(((v % 85).toInt)); v /= 85; k -= 1 }
      sb.appendAll(block)
      i += 1
    }
    sb.toString
  }

  // ---- descriptor resolution ---------------------------------------

  /** Path of an on-disk DV ("u": `<root>/<prefix>/deletion_vector_<uuid>.bin`;
    * "p": absolute). */
  def dvFilePath(tableRoot: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"storageType u needs a 20-char Z85 uuid, got '$enc'")
      val prefix = enc.dropRight(20)
      val uuidBytes = z85Decode(enc.takeRight(20), 16)
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) new Path(tableRoot)
        else new Path(tableRoot, prefix)
      new Path(dir, s"deletion_vector_$uuid.bin")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported deletion-vector storageType '$other'")
  }

  /** The serialized RoaringBitmapArray bytes for a descriptor (inline
    * decode, or file open + seek + size/CRC framing). */
  def payload(fs: FileSystem, tableRoot: String, d: Descriptor): Array[Byte] =
    d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val p = dvFilePath(tableRoot, d)
        val in = fs.open(p)
        try {
          val version = in.readByte()
          require(version == 1,
            s"unsupported deletion-vector file format version $version in $p")
          val off = d.offset.getOrElse(1)
          in.seek(off.toLong)
          val size = in.readInt() // big-endian
          require(size == d.sizeInBytes,
            s"DV size mismatch in $p: descriptor says ${d.sizeInBytes}, file says $size")
          val data = new Array[Byte](size)
          in.readFully(data)
          val storedCrc = in.readInt() & 0xFFFFFFFFL
          val crc = new java.util.zip.CRC32()
          crc.update(data)
          require(crc.getValue == storedCrc,
            s"DV checksum mismatch in $p at offset $off")
          data
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(
          s"unsupported deletion-vector storageType '$other'")
    }

  // ---- RoaringBitmapArray ------------------------------------------

  private val MagicNumber = 1681511377

  /** Deleted 64-bit row positions from a serialized RoaringBitmapArray. */
  def decodePositions(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == MagicNumber,
      s"bad RoaringBitmapArray magic $magic (expected $MagicNumber)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(bb)
      bb.position(bb.position() + rb.serializedSizeInBytes())
      val high = i << 32
      val it = rb.getIntIterator
      while (it.hasNext) out += (high | (it.next() & 0xFFFFFFFFL))
      i += 1
    }
    out.result()
  }

  /** Serialize positions as a RoaringBitmapArray (portable format) —
    * test-side twin of [[decodePositions]]. */
  def encodePositions(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row positions must be >= 0")
    val byHigh = positions.groupBy(p => (p >>> 32).toInt)
    val maxHigh = if (byHigh.isEmpty) -1 else byHigh.keys.max
    val bitmaps = (0 to maxHigh).map { h =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      byHigh.getOrElse(h, Nil).foreach(p => rb.add((p & 0xFFFFFFFFL).toInt))
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(MagicNumber)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach(_.serialize(bb))
    bb.array()
  }
}
