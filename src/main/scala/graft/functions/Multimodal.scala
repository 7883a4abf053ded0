package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column handling for training-data
 * pipelines.
 *
 * Model: media is an opaque `binary` column plus a typed metadata struct —
 * the pattern that scales to 100 TB because Spark shuffles/spills binary
 * columns without interpreting them, and all heavy decode work runs
 * per-partition with bounded batch sizes.
 *
 * The Spark-side plumbing here (schemas, partition sizing, batched
 * per-partition processing, feature schema) is real and tested. The codec
 * boundary itself is STUBBED: this container has no image/audio libraries,
 * so `decodeBatch` derives deterministic fake features from the bytes.
 * Swapping in a real decoder (JavaCV, TwelveMonkeys, a JNI codec) changes
 * ONLY the marked function.
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
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

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

  // ================= STUB BOUNDARY =================
  /**
   * STUB: deterministic fake decoder. A real implementation decodes the
   * payload (image decode / audio PCM / video frames) and emits model
   * features; this fake derives a stable pseudo-embedding from the content
   * hash so tests exercise the full distributed pipeline deterministically.
   */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])],
                          embeddingDim: Int): Seq[Row] =
    batch.map { case (id, bytes) =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(if (bytes == null) Array.emptyByteArray else bytes)
      val shaHex = sha.map("%02x".format(_)).mkString
      val emb = Array.tabulate(embeddingDim) { i =>
        // stable in [-1,1) from hash bytes
        ((sha(i % sha.length) & 0xFF) / 128.0f) - 1.0f
      }
      Row(id, if (bytes == null) 0L else bytes.length.toLong, shaHex, emb.toSeq)
    }
  // ============== END STUB BOUNDARY ================

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
