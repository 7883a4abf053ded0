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

  test("real JDK decode: PNG dims + luminance grid, WAV duration + RMS, opaque fallback") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    def wav(ms: Int, amp: Double): Array[Byte] = {
      val rate = 8000f
      val n = (rate * ms / 1000).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (math.sin(i * 0.3) * amp * 32767).toInt
        pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(20, 10, 0xFFFFFF), "image/png"), // white
      (2L, png(20, 10, 0x000000), "image/png"), // black
      (3L, wav(500, 0.5), "audio/wav"),
      (4L, "not media at all---".getBytes("UTF-8"), "text/plain"))
    val m = Multimodal.asMedia(rows.toDF("id", "bytes", "mime"),
      "id", "bytes", "mime")
    val out = Multimodal.extractFeatures(m, embeddingDim = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("kind") == "image")
    assert(out(1L).getAs[Int]("width") == 20 && out(1L).getAs[Int]("height") == 10)
    val (white, black) = (out(1L).getAs[scala.collection.Seq[Float]]("embedding"),
      out(2L).getAs[scala.collection.Seq[Float]]("embedding"))
    assert(white.forall(_ > 0.9f) && black.forall(_ < -0.9f),
      s"luminance grid wrong: white=$white black=$black")
    assert(out(3L).getAs[String]("kind") == "audio")
    assert(math.abs(out(3L).getAs[Long]("duration_ms") - 500L) <= 1)
    // RMS of a 0.5-amplitude sine ~ 0.35 in every window
    assert(out(3L).getAs[scala.collection.Seq[Float]]("embedding")
      .forall(v => v > 0.2f && v < 0.5f))
    assert(out(4L).getAs[String]("kind") == "opaque")
    assert(out(4L).getAs[scala.collection.Seq[Float]]("embedding").length == 4)
  }

  test("image perceptual near-dup: resize/recompress/brightness variants pair up") {
    import java.awt.image.BufferedImage
    // 8x8-block grayscale pattern: each block maps onto one luminance-grid
    // cell with a distinct value, so hash bits carry a margin that survives
    // bilinear resampling and JPEG quantization — the realistic variant set
    def pattern(seed: Int, w: Int = 64, h: Int = 64): BufferedImage = {
      val vals = new scala.util.Random(seed).shuffle((0 until 64).toList)
        .map(i => 12 + i * 3)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = vals((y * 8 / h) * 8 + (x * 8 / w))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null); g.dispose(); out
    }
    def brighten(img: BufferedImage, d: Int): BufferedImage = {
      val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until img.getWidth; y <- 0 until img.getHeight) {
        val v = math.min((img.getRGB(x, y) & 0xFF) + d, 255)
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    val base = pattern(7)
    val rows = Seq(
      (1L, encode(base, "png"), "image/png"),
      (2L, encode(resize(base, 96, 96), "png"), "image/png"),   // upscaled
      (3L, encode(base, "jpg"), "image/jpeg"),                  // recompressed
      (4L, encode(brighten(base, 25), "png"), "image/png"),     // brightness shift
      (5L, encode(pattern(99), "png"), "image/png"))            // different image
    val media = Multimodal.asMedia(rows.toDF("id", "bytes", "mime"),
      "id", "bytes", "mime")
    val feats = Multimodal.extractFeatures(media, embeddingDim = 64).cache()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = pairsOf(Multimodal.imageNearDupPairs(feats))
    assert(Set((1L, 2L), (1L, 3L), (1L, 4L)).subsetOf(pairs),
      s"variant pairs missing from $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"distinct image falsely paired: $pairs")
    // pigeonhole banding is exact: output == O(N²) brute force
    val sigs = feats.select($"media_id", Multimodal.dHash64($"embedding").as("sig"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter($"a.media_id" < $"b.media_id")
      .filter(graft.operators.Dedup.hammingDistance($"a.sig", $"b.sig") <= 5)
      .select($"a.media_id".as("a"), $"b.media_id".as("b"))
    assert(pairs == pairsOf(brute))
    // aHash variant: brightness-invariant by construction (own-mean compare)
    val ah = pairsOf(Multimodal.imageNearDupPairs(feats, method = "ahash"))
    assert(ah.contains((1L, 4L)) && !ah.exists(p => p._1 == 5L || p._2 == 5L))
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(feats, method = "phash-nope").collect()
    }
    // YAML transformer surface
    graft.core.StandardTransformers.registerAll
    val viaYaml = graft.core.TransformerRegistry.get("image_neardup_pairs").get
      .apply(graft.core.EngineContext(feats), Map("max_hamming" -> "5"))
    assert(pairsOf(viaYaml) == pairs)
    feats.unpersist()
    ()
  }

  test("readMedia: binaryFile directory scan to canonical frame, decode e2e") {
    import java.awt.image.BufferedImage
    val dir = java.nio.file.Files.createTempDirectory("mediadir")
    def writePng(name: String, w: Int, h: Int): Unit = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      javax.imageio.ImageIO.write(img, "png", dir.resolve(name).toFile); ()
    }
    writePng("a.png", 8, 6)
    writePng("b.png", 12, 4)
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "not media")
    val m = Multimodal.readMedia(spark, dir.toString)
    assert(m.schema.map(_.name) == Seq("media_id", "content", "meta"))
    assert(m.count() == 3)
    val feats = Multimodal.extractFeatures(m, embeddingDim = 4)
      .collect().map(r => r.getAs[String]("kind")).sorted
    assert(feats.toSeq == Seq("image", "image", "opaque"))
    // glob filter pushes into the source listing
    assert(Multimodal.readMedia(spark, dir.toString, glob = "*.png").count() == 2)
    val metas = m.select(col("meta.mime"), col("meta.source_uri")).collect()
    assert(metas.count(_.getString(0) == "image/png") == 2)
    assert(metas.forall(_.getString(1) != null))
    // declarative surface: `format: media` dispatches to the same reader
    val viaYaml = graft.sources.Sources.read(spark, graft.sources.Sources.ReadConfig(
      format = "media", path = Some(dir.toString),
      options = Map("glob" -> "*.png")))
    assert(viaYaml.count() == 2 &&
      viaYaml.schema.map(_.name) == Seq("media_id", "content", "meta"))
    val err = intercept[IllegalArgumentException] {
      graft.sources.Sources.read(spark, graft.sources.Sources.ReadConfig(
        format = "media", path = Some(dir.toString), streaming = true))
    }
    assert(err.getMessage.contains("no streaming source"))
  }
}
