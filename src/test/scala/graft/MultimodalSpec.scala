package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "imagebytes-one", "image/png"), (2L, "imagebytes-two", "image/jpeg"),
        (3L, "imagebytes-one", "image/png"))
      .toDF("id", "payload_s", "mime")
      .withColumn("payload", $"payload_s".cast("binary")),
    "id", "payload", "mime")

  test("asMedia produces the canonical binary + typed metadata schema") {
    assert(media.schema.map(f => f.name -> f.dataType) ==
      Multimodal.mediaSchema.map(f => f.name -> f.dataType))
    val r = media.filter($"media_id" === 1).collect()(0)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("mime") == "image/png")
  }

  test("extractFeatures runs batched per partition, deterministic, distributed") {
    val feats = Multimodal.extractFeatures(media.repartition(3), embeddingDim = 8,
      batchSize = 2)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 3)
    assert(rows(1).getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    // identical payloads -> identical features regardless of partition
    assert(rows(1).getAs[String]("sha") == rows(3).getAs[String]("sha"))
    assert(rows(1).getAs[scala.collection.Seq[Float]]("embedding").toSeq == rows(3).getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    assert(rows(1).getAs[String]("sha") != rows(2).getAs[String]("sha"))
    // embeddings usable by the similarity ops
    val withCos = feats.as("a").crossJoin(feats.as("b"))
      .select(graft.functions.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    assert(withCos.filter($"c" > 0.999).count() >= 5) // 3 self + 2 dup pairs
  }

  test("frame-sampling plan expands by duration without decoding") {
    val withDuration = media.withColumn("meta",
      struct($"meta.mime", $"meta.width", $"meta.height",
        when($"media_id" === 1, 2500L).otherwise(999L).as("duration_ms"),
        $"meta.source_uri"))
    val frames = Multimodal.sampleFramePlan(withDuration, everyMs = 1000)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 3) // 0,1000,2000 ms
    assert(byId(2L) == 1)
    val offsets = frames.filter($"media_id" === 1).orderBy("frame_idx")
      .select("offset_ms").as[Long].collect().toSeq
    assert(offsets == Seq(0L, 1000L, 2000L))
  }

  test("repartitionForPayload sizes partitions without scanning the table") {
    // known row count: 1000 rows x 32 MiB avg at 128 MiB target -> 250 parts
    val sized = Multimodal.repartitionForPayload(media, avgPayloadBytes = 32L << 20,
      rowCount = Some(1000L))
    assert(sized.rdd.getNumPartitions == 250)
    // plan-stats path: derives a positive partition count, metadata only
    val est = Multimodal.repartitionForPayload(media, avgPayloadBytes = 1L << 20)
    assert(est.rdd.getNumPartitions >= 1)
  }

  test("mediaDedup keeps lowest id per identical binary payload") {
    import spark.implicits._
    val media = Seq(
      (1L, Array[Byte](1, 2, 3), "image/png"),
      (2L, Array[Byte](9, 9), "image/png"),
      (3L, Array[Byte](1, 2, 3), "image/jpeg"), // byte-dup of 1
      (4L, Array[Byte](), "audio/wav"),
      (5L, Array[Byte](), "audio/wav"))         // empty-payload dup of 4
      .toDF("id", "bytes", "mime")
    val canonical = Multimodal.asMedia(media, "id", "bytes", "mime")
    val kept = Multimodal.mediaDedup(canonical)
      .select("media_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
    // payloads never shuffle: the only exchanges carry (hash, id) pairs
    val audit = graft.core.PlanAudit.audit(Multimodal.mediaDedup(canonical))
    assert(audit.numExchanges >= 1) // winner agg shuffles the narrow pairs
  }
}
