package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Classifier-based quality filtering: the hashed-logit serve path must
 * agree with MLlib's own probability output (parity by construction via
 * HashingTF.indexOf), separate a planted two-vocabulary corpus, and
 * round-trip through save/load.
 */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val goodVocab = Vector("theorem", "proof", "lemma", "analysis",
    "derivation", "citation", "methodology", "experiment", "measurement", "result")
  private val badVocab = Vector("click", "free", "winner", "casino", "pills",
    "subscribe", "buy", "cheap", "offer", "limited")
  private val common = Vector("the", "a", "of", "and", "to", "in")

  private def doc(rnd: scala.util.Random, vocab: Vector[String]): String =
    (0 until (8 + rnd.nextInt(12))).map { _ =>
      if (rnd.nextDouble() < 0.35) common(rnd.nextInt(common.size))
      else vocab(rnd.nextInt(vocab.size))
    }.mkString(" ")

  private def corpus(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val label = i % 2
      (i, doc(rnd, if (label == 1) goodVocab else badVocab), label)
    }.toDF("id", "text", "label")
  }

  test("trained model separates planted quality classes") {
    val train = corpus(1, 400)
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 14)
    val test = corpus(2, 200)
    val scored = QualityClassifier.scoreFrame(test, model, "text")
      .select($"label", $"quality_prob").as[(Int, Double)].collect()
    val acc = scored.count { case (l, p) => (p >= 0.5) == (l == 1) }.toDouble / scored.length
    assert(acc > 0.95, s"accuracy $acc")
    val goodMean = scored.filter(_._1 == 1).map(_._2).sum / scored.count(_._1 == 1)
    val badMean = scored.filter(_._1 == 0).map(_._2).sum / scored.count(_._1 == 0)
    assert(goodMean > 0.9 && badMean < 0.1, s"means $goodMean / $badMean")
  }

  test("native serve path matches MLlib's own probability output") {
    val train = corpus(3, 300)
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 14, binary = true)
    val test = corpus(4, 120)

    // MLlib reference: rebuild the exact train-time pipeline by hand
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
    val toks = test.select($"id", $"label",
      filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0).as("tokens"))
    val feats = tf.transform(toks)
    val mlProb = feats.collect().map { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector]("features")
      var m = model.intercept
      v.foreachActive { (i, x) => m += model.weights(i) * x }
      (r.getInt(0), 1.0 / (1.0 + math.exp(-m)))
    }.toMap

    val native = QualityClassifier.scoreFrame(test, model, "text")
      .select($"id", $"quality_prob").as[(Int, Double)].collect().toMap
    mlProb.foreach { case (id, p) =>
      assert(math.abs(native(id) - p) < 1e-9, s"doc $id: native ${native(id)} vs ml $p")
    }
  }

  test("word-bigram features: serve parity with the train-time feature arrays") {
    val train = corpus(10, 300)
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 14, binary = true, wordNgrams = 2)
    assert(model.wordNgrams == 2)
    val test = corpus(11, 80)

    // reference: rebuild unigram+bigram arrays in independent Scala, hash
    // through the same HashingTF, sum weights
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(1 << 14)
    val refProb = test.select($"id", $"text").as[(Int, String)].collect().map {
      case (id, text) =>
        val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val feats = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
        val seen = scala.collection.mutable.Set[Int]()
        var m = model.intercept
        feats.foreach { t =>
          val i = tf.indexOf(t)
          if (seen.add(i)) m += model.weights(i)
        }
        id -> 1.0 / (1.0 + math.exp(-m))
    }.toMap
    val native = QualityClassifier.scoreFrame(test, model, "text")
      .select($"id", $"quality_prob").as[(Int, Double)].collect().toMap
    refProb.foreach { case (id, p) =>
      assert(math.abs(native(id) - p) < 1e-9, s"doc $id")
    }
    // bigram model still separates the planted classes
    val scored = QualityClassifier.scoreFrame(corpus(12, 200), model, "text")
      .select($"label", $"quality_prob").as[(Int, Double)].collect()
    val acc = scored.count { case (l, p) => (p >= 0.5) == (l == 1) }.toDouble / scored.length
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("count (non-binary) features also line up") {
    val train = corpus(5, 300)
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 14, binary = false)
    // a doc with repeated tokens exercises the count path
    val test = Seq((0, "theorem theorem theorem casino"),
      (1, "casino casino click click click")).toDF("id", "text")
    val scored = QualityClassifier.scoreFrame(test, model, "text")
      .select($"id", $"quality_prob").as[(Int, Double)].collect().toMap
    assert(scored(0) > 0.5 && scored(1) < 0.5)
  }

  test("save/load roundtrip and threshold filter") {
    val model = QualityClassifier.train(corpus(6, 300), "text", "label",
      numFeatures = 1 << 14)
    val dir = java.nio.file.Files.createTempDirectory("qc").toString + "/model"
    model.save(spark, dir)
    val loaded = QualityClassifier.load(spark, dir)
    assert(loaded.numFeatures == model.numFeatures)
    assert(loaded.intercept == model.intercept)
    assert(loaded.weights.toSeq == model.weights.toSeq)

    val test = corpus(7, 100)
    val kept = QualityClassifier.filterByQuality(test, loaded, "text", 0.5)
    val labels = kept.select("label").as[Int].collect()
    assert(labels.length > 30 && labels.count(_ == 1).toDouble / labels.length > 0.9)
  }

  test("YAML transformers: inline train + persisted model") {
    graft.core.StandardTransformers.registerAll
    def reg(n: String) = graft.core.TransformerRegistry.get(n).get
    val train = corpus(8, 300)
    val test = corpus(9, 60)
    val ctx = graft.core.EngineContext(test, Map("labeled" -> train))
    val scored = reg("quality_classifier_score")(ctx, Map(
      "text_col" -> "text", "train_on" -> "labeled", "label_col" -> "label",
      "num_features" -> "16384"))
    assert(scored.columns.contains("quality_prob"))

    val dir = java.nio.file.Files.createTempDirectory("qc").toString + "/m"
    QualityClassifier.train(train, "text", "label", numFeatures = 1 << 14)
      .save(spark, dir)
    val filtered = reg("quality_classifier_filter")(ctx, Map(
      "text_col" -> "text", "model_path" -> dir, "threshold" -> "0.5"))
    val labels = filtered.select("label").as[Int].collect()
    assert(labels.nonEmpty && labels.count(_ == 1).toDouble / labels.length > 0.9)
  }
}
