package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/**
 * Multimodal (image/audio/video) column handling for training-data
 * pipelines.
 *
 * Model: media is an opaque `binary` column plus a typed metadata struct —
 * the pattern that scales to 100 TB because Spark shuffles/spills binary
 * columns without interpreting them, and all heavy decode work runs
 * per-partition with bounded batch sizes.
 *
 * The decode boundary is REAL for the formats the JDK itself ships
 * codecs for — PNG/JPEG/GIF/BMP via `javax.imageio` (true dimensions +
 * a luminance-grid embedding) and WAV/PCM via `javax.sound.sampled`
 * (true duration + an RMS-energy-profile embedding) — dispatched by
 * magic bytes, so no trial decode ever runs on non-media payloads.
 * Everything else (video containers, exotic codecs — no libraries in
 * this container) falls back to deterministic content-hash features,
 * the STUB path; swapping in a heavier decoder (JavaCV, TwelveMonkeys,
 * JNI) extends ONLY the marked dispatch function.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source_uri", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Feature row produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("sha", StringType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /**
   * Read a directory of media files into the canonical media frame via
   * Spark's built-in `binaryFile` source (distributed, filter-pushdown
   * on path/length — payloads larger than
   * `spark.sql.sources.binaryFile.maxLength` fail fast at the source).
   * `media_id` is the xxhash64 of the file path (stable across runs and
   * listing order); the mime is inferred from the extension with the
   * content-sniff fallback left to [[extractFeatures]].
   */
  def readMedia(spark: org.apache.spark.sql.SparkSession, dir: String,
                glob: String = "*"): DataFrame = {
    val mime = when(lower(col("path")).rlike("\\.(png)$"), "image/png")
      .when(lower(col("path")).rlike("\\.(jpe?g)$"), "image/jpeg")
      .when(lower(col("path")).rlike("\\.(gif)$"), "image/gif")
      .when(lower(col("path")).rlike("\\.(bmp)$"), "image/bmp")
      .when(lower(col("path")).rlike("\\.(wav)$"), "audio/wav")
      .when(lower(col("path")).rlike("\\.(mp4|m4v|mov)$"), "video/mp4")
      .when(lower(col("path")).rlike("\\.(m4a)$"), "audio/mp4")
      .when(lower(col("path")).rlike("\\.(mp3)$"), "audio/mpeg")
      .otherwise("application/octet-stream")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content"),
        struct(mime.as("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"),
          col("path").as("source_uri")).as("meta"))
  }

  /** Wrap raw (id, bytes, mime) columns into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
              mimeCol: String, sourceUriCol: Option[String] = None): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("content"),
      struct(
        col(mimeCol).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        sourceUriCol.map(col).getOrElse(lit(null)).cast("string").as("source_uri")
      ).as("meta"))

  /** Magic-byte sniff: decide the decode path WITHOUT a trial decode. */
  private def sniff(b: Array[Byte]): String =
    if (b == null || b.length < 12) "opaque"
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "image"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "image" // JPEG
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "image"
    else if (b(0) == 'B' && b(1) == 'M') "image"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "audio"
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "mp4"
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') "mp3"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0 &&
      ((b(1) >> 1) & 0x3) != 0) "mp3" // bare frame sync, valid layer bits
    else "opaque"

  // ---- container METADATA probes: video/audio containers the JDK cannot
  // decode still yield true duration/dimensions by parsing the container
  // bytes directly (ISO BMFF box walk; MPEG audio frame-header walk) ----

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, "ISO-8859-1")

  /** Children box walk over [from, until): invoke `f(type, start, end)`
    * where start points at the box header. */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      var size = be32(b, i)
      var header = 8
      if (size == 1 && i + 16 <= until) { // 64-bit largesize
        size = ((be32(b, i + 8) << 32) | be32(b, i + 12))
        header = 16
      } else if (size == 0) size = (until - i).toLong // box extends to end
      if (size < header || i + size > until) return // malformed: stop cleanly
      f(boxType(b, i), i + header, i + size.toInt)
      i += size.toInt
    }
  }

  /** ISO BMFF (MP4/MOV/M4A) probe: (hasVideo, width, height, durationMs).
    * mvhd carries timescale+duration; each video trak's tkhd carries
    * 16.16 fixed-point presentation width/height. */
  private def probeMp4(b: Array[Byte]): Option[(Boolean, Int, Int, Long)] = {
    var durMs = -1L
    var width = 0
    var height = 0
    try {
      walkBoxes(b, 0, b.length) {
        case ("moov", s, e) =>
          walkBoxes(b, s, e) {
            case ("mvhd", ms, me) =>
              val v = b(ms) & 0xFF
              val (tsOff, dOff, d64) =
                if (v == 1) (ms + 20, ms + 24, true) else (ms + 12, ms + 16, false)
              if ((if (d64) dOff + 8 else dOff + 4) <= me) {
                val timescale = be32(b, tsOff)
                val dur = if (d64) (be32(b, dOff) << 32) | be32(b, dOff + 4)
                          else be32(b, dOff)
                if (timescale > 0) durMs = dur * 1000L / timescale
              }
            case ("trak", ts, te) =>
              walkBoxes(b, ts, te) {
                case ("tkhd", ks, ke) =>
                  // width/height are the LAST 8 bytes of tkhd (16.16 fixed)
                  if (ke - 8 >= ks) {
                    val w = (be32(b, ke - 8) >> 16).toInt
                    val h = (be32(b, ke - 4) >> 16).toInt
                    if (w > 0 && h > 0) { width = w; height = h }
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (durMs >= 0) Some((width > 0, width, height, durMs)) else None
    } catch { case _: Exception => None }
  }

  private val mp3BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0) // kbps
  private val mp3BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160, 0)
  private val mp3SampleRateV1 = Array(44100, 48000, 32000, 0)
  private val mp3SampleRateV2 = Array(22050, 24000, 16000, 0)
  private val mp3SampleRateV25 = Array(11025, 12000, 8000, 0)

  /** MPEG-audio (layer III) probe: total duration by walking frame
    * headers — exact for CBR and VBR alike, no payload decode. */
  private def probeMp3(b: Array[Byte]): Option[Long] = {
    var i = 0
    // skip ID3v2 (synchsafe 28-bit size after the 10-byte header)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      i = 10 + sz
    }
    var totalMs = 0.0
    var frames = 0
    while (i + 4 <= b.length) {
      if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xE0) == 0xE0) {
        val versionBits = (b(i + 1) >> 3) & 0x3 // 3=V1, 2=V2, 0=V2.5
        val layerBits = (b(i + 1) >> 1) & 0x3   // 1=Layer III
        val brIdx = (b(i + 2) >> 4) & 0xF
        val srIdx = (b(i + 2) >> 2) & 0x3
        val padding = (b(i + 2) >> 1) & 0x1
        val sr = versionBits match {
          case 3 => mp3SampleRateV1(srIdx)
          case 2 => mp3SampleRateV2(srIdx)
          case 0 => mp3SampleRateV25(srIdx)
          case _ => 0
        }
        val br = (if (versionBits == 3) mp3BitrateV1L3 else mp3BitrateV2L3)(brIdx)
        if (layerBits == 1 && sr > 0 && br > 0) {
          val samples = if (versionBits == 3) 1152 else 576
          val frameLen = samples / 8 * br * 1000 / sr + padding
          if (frameLen <= 0) return if (frames > 0) Some(totalMs.toLong) else None
          totalMs += samples.toDouble * 1000.0 / sr
          frames += 1
          i += frameLen
        } else i += 1 // resync
      } else i += 1
    }
    if (frames > 0) Some(totalMs.toLong) else None
  }

  /** Luminance averaged over an `dim`-cell row-major grid, in [-1, 1]. */
  private def imageEmbedding(img: java.awt.image.BufferedImage,
                             dim: Int): Array[Float] = {
    val g = math.max(math.ceil(math.sqrt(dim.toDouble)).toInt, 1)
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(dim) { i =>
      val (cx, cy) = (i % g, (i / g) % g)
      val (x0, x1) = (cx * w / g, math.max((cx + 1) * w / g, cx * w / g + 1))
      val (y0, y1) = (cy * h / g, math.max((cy + 1) * h / g, cy * h / g + 1))
      var sum = 0.0; var n = 0
      var y = y0
      while (y < math.min(y1, h)) {
        var x = x0
        while (x < math.min(x1, w)) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xFF) * 0.299 + ((rgb >> 8) & 0xFF) * 0.587 +
            (rgb & 0xFF) * 0.114) / 255.0
          n += 1; x += 1
        }
        y += 1
      }
      if (n == 0) 0.0f else (sum / n * 2.0 - 1.0).toFloat
    }
  }

  /** RMS energy over `dim` equal time windows of the PCM stream, scaled
    * to [0, 1] (16-bit signed assumed — the WAV default; other depths
    * still produce a stable, monotone energy profile). */
  private def audioFeatures(bytes: Array[Byte],
                            dim: Int): Option[(Long, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durMs = if (fmt.getFrameRate > 0 && frames >= 0)
          (frames / fmt.getFrameRate * 1000.0).toLong else 0L
        val pcm = in.readAllBytes()
        val n16 = pcm.length / 2
        val emb = Array.tabulate(dim) { i =>
          val (s0, s1) = (i.toLong * n16 / dim, (i + 1).toLong * n16 / dim)
          var acc = 0.0; var k = s0
          while (k < s1) {
            val lo = pcm((2 * k).toInt) & 0xFF
            val hi = pcm((2 * k + 1).toInt).toInt // little-endian signed
            val s = (hi << 8) | lo
            acc += (s / 32768.0) * (s / 32768.0); k += 1
          }
          if (s1 == s0) 0.0f else math.sqrt(acc / (s1 - s0)).toFloat
        }
        Some((durMs, emb))
      } finally in.close()
    } catch { case _: Exception => None }

  // =============== DECODE DISPATCH (extend here) ===============
  /**
   * Per-batch decode: REAL decode for JDK-supported formats — images
   * (`javax.imageio`: true width/height + luminance-grid embedding) and
   * WAV audio (`javax.sound.sampled`: true duration + RMS energy
   * profile). Any other payload, and any corrupt payload that fails its
   * decoder, falls back to deterministic content-hash pseudo-features
   * (`kind = "opaque"`) so the distributed pipeline behaves identically
   * for every row. A heavier codec (video frames, model embeddings)
   * slots in as another `sniff` branch here.
   */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])],
                          embeddingDim: Int): Seq[Row] =
    batch.map { case (id, bytes) =>
      val raw = if (bytes == null) Array.emptyByteArray else bytes
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(raw)
      val shaHex = sha.map("%02x".format(_)).mkString
      def hashEmb = Array.tabulate(embeddingDim) { i =>
        ((sha(i % sha.length) & 0xFF) / 128.0f) - 1.0f
      }
      val (kind, w, h, durMs, emb) = sniff(raw) match {
        case "image" =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(raw))
            if (img == null) ("opaque", null, null, null, hashEmb)
            else ("image", Integer.valueOf(img.getWidth),
              Integer.valueOf(img.getHeight), null,
              imageEmbedding(img, embeddingDim))
          } catch { case _: Exception => ("opaque", null, null, null, hashEmb) }
        case "audio" =>
          audioFeatures(raw, embeddingDim) match {
            case Some((d, e)) =>
              ("audio", null, null, java.lang.Long.valueOf(d), e)
            case None => ("opaque", null, null, null, hashEmb)
          }
        case "mp4" =>
          // container metadata probe (no JDK video decoder exists):
          // true dimensions + duration from the box structure; frame
          // pixels are not decodable here so features stay content-hash
          probeMp4(raw) match {
            case Some((hasVideo, w, h, d)) if hasVideo =>
              ("video", Integer.valueOf(w), Integer.valueOf(h),
                java.lang.Long.valueOf(d), hashEmb)
            case Some((_, _, _, d)) => // audio-only container (m4a)
              ("audio", null, null, java.lang.Long.valueOf(d), hashEmb)
            case None => ("opaque", null, null, null, hashEmb)
          }
        case "mp3" =>
          probeMp3(raw) match {
            case Some(d) => ("audio", null, null, java.lang.Long.valueOf(d), hashEmb)
            case None => ("opaque", null, null, null, hashEmb)
          }
        case _ => ("opaque", null, null, null, hashEmb)
      }
      Row(id, raw.length.toLong, shaHex, kind, w, h, durMs, emb.toSeq)
    }
  // ============== END DECODE DISPATCH ==============

  /**
   * Decode + feature-extract, batched per partition. `batchSize` bounds
   * peak memory per task (the real knob when payloads are MBs each);
   * combine with `repartition(n)` upstream so partitions hold
   * (batchSize × payload) comfortably.
   */
  def extractFeatures(media: DataFrame, embeddingDim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rows: Dataset[Row] = media.select("media_id", "content")
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        decodeBatch(group.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))),
          embeddingDim)
      }
    }
  }

  /**
   * Frame-sampling plan for video payloads: expands each media row into
   * (media_id, frame_idx, offset_ms) rows at `everyMs` intervals — the
   * Spark-side shape of frame extraction; pure plan math, no decode.
   */
  def sampleFramePlan(media: DataFrame, everyMs: Long): DataFrame =
    media
      .withColumn("duration_ms", coalesce(col("meta.duration_ms"), lit(0L)))
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          (greatest(col("duration_ms") - 1, lit(0L)) / everyMs).cast("long"))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("offset_ms"))

  /**
   * Partition-size helper: rows per partition so bytes/partition ~ target.
   * Pass `rowCount` when known (e.g. from write metrics); otherwise the
   * partition count comes from the optimizer's plan-size estimate (file
   * statistics) — metadata only, NO extra scan of what is typically the
   * largest table in the pipeline.
   */
  def repartitionForPayload(media: DataFrame, avgPayloadBytes: Long,
                            targetPartitionBytes: Long = 128L << 20,
                            rowCount: Option[Long] = None): DataFrame = {
    val n = rowCount match {
      case Some(rc) =>
        val rowsPerPartition =
          math.max(targetPartitionBytes / math.max(avgPayloadBytes, 1), 1)
        math.max((rc / rowsPerPartition).toInt, 1)
      case None =>
        val sizeInBytes = media.queryExecution.optimizedPlan.stats.sizeInBytes
        math.max((sizeInBytes / BigInt(targetPartitionBytes)).toInt, 1)
    }
    media.repartition(n)
  }

  // ---------------- perceptual near-dup (images) ----------------

  /**
   * aHash (average hash): bit i = 1 when luminance cell i of the decoded
   * grid is above the grid mean. Robust to recompression and uniform
   * brightness/contrast changes (the comparison is against the image's
   * OWN mean). Input is the 64-dim luminance-grid `embedding` that
   * [[extractFeatures]] produces at `embeddingDim = 64` (an 8×8 grid) —
   * pure codegen'd column algebra, the decode already happened.
   */
  def aHash64(emb: Column): Column =
    Dedup.bindOnce(
      aggregate(emb, lit(0.0d), (a, x) => a + x) / size(emb)) { m =>
      // fold cell-vs-mean sign bits LSB-first into one long
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) =>
          when(x > m, call_function("shiftleft", lit(1L), i.cast("int")))
            .otherwise(lit(0L))),
        lit(0L), (acc, b) => acc.bitwiseOR(b))
    }

  /**
   * dHash (difference hash): bit i = 1 when cell i is brighter than its
   * right neighbour in the row-major `grid`×`grid` layout (wrapping to
   * the row's first cell in the last column, so a 64-cell grid yields a
   * full 64-bit signature). Gradient-based, so invariant to uniform
   * brightness shifts and resilient to resizing.
   */
  def dHash64(emb: Column, grid: Int = 8): Column =
    aggregate(
      zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) => {
        val idx = i.cast("int")
        val row = idx - pmod(idx, lit(grid))
        val nxt = row + pmod(idx + 1, lit(grid))
        when(x > element_at(emb, nxt + 1),
          call_function("shiftleft", lit(1L), idx)).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /**
   * Image perceptual near-dup pairs over [[extractFeatures]] output
   * (`embeddingDim = 64`): a 64-bit perceptual hash (`method` = "dhash"
   * default, or "ahash") + the pigeonhole Hamming band blocking shared
   * with SimHash ([[graft.operators.Dedup.hammingPairs]]) + exact
   * Hamming verify. Output (a, b, hamming) is IDENTICAL to the O(N²)
   * brute force at the same `maxHamming` — blocking recall is 1.0 by
   * construction. Catches the resize / recompress / re-encode near-
   * identical images that byte-exact [[mediaDedup]] misses, the second
   * standard pass over a scraped image corpus.
   *
   * Scale: only (media_id, hash, band-key) scalars shuffle — payloads
   * and embeddings never enter the self-join.
   */
  def imageNearDupPairs(features: DataFrame, idCol: String = "media_id",
                        embCol: String = "embedding", maxHamming: Int = 5,
                        method: String = "dhash"): DataFrame = {
    val sig = method match {
      case "ahash" => aHash64(col(embCol))
      case "dhash" => dHash64(col(embCol))
      case other => throw new IllegalArgumentException(
        s"unknown perceptual hash method '$other' (ahash | dhash)")
    }
    val sigs = features.select(col(idCol), sig.as("_phash"))
    Dedup.hammingPairs(sigs, idCol, "_phash", maxHamming)
  }

  /**
   * Exact media dedup: keep one row (lowest `media_id`) per identical
   * binary content. Same plan shape as the text `exactDedup` — winners
   * from a groupBy on the 64-bit content hash (xxhash64 over the raw
   * bytes, no decode needed) + a left-semi join on id, so the media
   * PAYLOADS never shuffle; only (hash, id) pairs move. The standard
   * first pass over a scraped image/audio corpus, where byte-identical
   * duplicates dominate.
   */
  def mediaDedup(media: DataFrame, idCol: String = "media_id",
                 contentCol: String = "content"): DataFrame = {
    val winners = media
      .select(xxhash64(col(contentCol)).as("_h"), col(idCol))
      .groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    media.join(winners, Seq(idCol), "left_semi")
  }
}
