package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import graft.expressions.HashedLogitScore

/**
 * Classifier-based quality filtering — the curation stage the GPT-3 /
 * LLaMA / CCNet pipelines run between heuristics and dedup: train a
 * linear classifier to separate a high-quality reference corpus from raw
 * crawl, score every document, keep the high-scoring tail. The published
 * recipes use fastText (a hashed bag-of-words linear model); this is the
 * same model family, Spark-first:
 *
 *   - TRAIN: whitespace tokens → [[HashingTF]] hashed term counts →
 *     MLlib [[LogisticRegression]] (distributed treeAggregate L-BFGS —
 *     the standard scalable path; the reference corpus label is just a
 *     0/1 column).
 *   - SERVE: the fitted model collapses to `numFeatures` doubles + an
 *     intercept, broadcast into a native codegen'd expression
 *     ([[HashedLogitScore]]): one pass per document, hash each token
 *     with the SAME [[HashingTF.indexOf]] mapping used at train time
 *     (parity by construction, not by re-implementation), sum weights,
 *     sigmoid. No MLlib vector materialization on the hot path, no UDF.
 *
 * The weight table at the default 2^18 features is ~2 MB — broadcast
 * freely; serving 100 TB is a single projection.
 */
object QualityClassifier {

  /** A fitted hashed-logit quality model. Serializable: ships to
    * executors inside the scoring expression. */
  final case class QcModel(numFeatures: Int, weights: Array[Double],
                           intercept: Double, binary: Boolean,
                           wordNgrams: Int = 1)
    extends Serializable {
    require(weights.length == numFeatures,
      s"weights length ${weights.length} != numFeatures $numFeatures")
    require(wordNgrams >= 1 && wordNgrams <= 3, "wordNgrams must be 1..3")

    @transient lazy val hasher: HashingTF =
      new HashingTF().setNumFeatures(numFeatures)

    /** Raw margin of one pre-tokenized document. `tokens` yields the
      * unigram stream; word n-gram features (the fastText trick — cheap
      * local word order) are synthesized here with the same `_`-joined
      * spelling the training column builds. */
    def margin(tokens: Iterator[String]): Double = {
      var m = intercept
      val seen = if (binary) new java.util.HashSet[Integer]() else null
      def hit(t: String): Unit = {
        val i = hasher.indexOf(t)
        if (seen == null || seen.add(i)) m += weights(i)
      }
      var prev1: String = null // previous token
      var prev2: String = null // token before that
      tokens.foreach { t =>
        hit(t)
        if (wordNgrams >= 2 && prev1 != null) hit(prev1 + "_" + t)
        if (wordNgrams >= 3 && prev2 != null) hit(prev2 + "_" + prev1 + "_" + t)
        prev2 = prev1; prev1 = t
      }
      m
    }

    def save(spark: SparkSession, dir: String): Unit = {
      val nz = weights.iterator.zipWithIndex.filter(_._1 != 0.0)
        .map { case (w, i) => Row(i, w) }.toSeq
      val schema = StructType(Seq(StructField("idx", IntegerType),
        StructField("w", DoubleType)))
      spark.createDataFrame(spark.sparkContext.parallelize(nz, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/weights")
      val meta = s"""{"numFeatures":$numFeatures,"intercept":$intercept,"binary":$binary,"wordNgrams":$wordNgrams}"""
      val p = new Path(dir, "model.json")
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      val out = f.create(p, true)
      try out.write(meta.getBytes("UTF-8")) finally out.close()
    }
  }

  def load(spark: SparkSession, dir: String): QcModel = {
    val p = new Path(dir, "model.json")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = f.open(p)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(meta)
    val n = node.get("numFeatures").asInt()
    val w = new Array[Double](n)
    spark.read.parquet(s"$dir/weights").collect()
      .foreach(r => w(r.getInt(0)) = r.getDouble(1))
    QcModel(n, w, node.get("intercept").asDouble(), node.get("binary").asBoolean(),
      if (node.hasNonNull("wordNgrams")) node.get("wordNgrams").asInt() else 1)
  }

  /** Whitespace tokens with the engine's usual lowercase normalization —
    * shared by train and serve so the hashed features line up. */
  private def tokensCol(textCol: String): Column =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)

  /** Unigrams plus `_`-joined word n-grams up to `n` (the fastText
    * feature set) — feature hashing is order-free, so appending the
    * n-gram arrays matches the serve-side synthesis exactly. */
  private def featureTokensCol(textCol: String, n: Int): Column = {
    val toks = tokensCol(textCol)
    def grams(k: Int): Column = {
      // k-grams as zip_with over k equal-length shifted slices
      val sz = size(toks)
      val len = greatest(sz - (k - 1), lit(0))
      val base = slice(toks, lit(1), len)
      (2 to k).foldLeft(base) { (acc, i) =>
        zip_with(acc, slice(toks, lit(i), len),
          (a, b) => concat(a, lit("_"), b))
      }
    }
    (2 to n).foldLeft(toks)((acc, k) => concat(acc, grams(k)))
  }

  /**
   * Train on a labeled frame: `labelCol` is 1.0 for the high-quality
   * reference corpus, 0.0 for raw/background. Returns the collapsed
   * linear model. `regParam`/`elasticNetParam` are the MLlib knobs
   * (L2 default; a dash of L1 sparsifies the saved model).
   */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, binary: Boolean = true,
            regParam: Double = 1e-4, elasticNetParam: Double = 0.0,
            maxIter: Int = 50, wordNgrams: Int = 1): QcModel = {
    val withTokens = labeled.select(
      col(labelCol).cast("double").as("label"),
      featureTokensCol(textCol, wordNgrams).as("tokens"))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(binary)
    val featured = tf.transform(withTokens)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setElasticNetParam(elasticNetParam)
      .setFeaturesCol("features").setLabelCol("label")
    val fit = lr.fit(featured)
    QcModel(numFeatures, fit.coefficients.toArray, fit.intercept, binary, wordNgrams)
  }

  /** Quality probability (sigmoid of the hashed-logit margin) as a
    * column — one codegen'd pass, no vector materialization. */
  def score(model: QcModel, text: Column): Column =
    ColumnShim.column(HashedLogitScore(ColumnShim.expression(lower(text)), model))

  def scoreFrame(df: DataFrame, model: QcModel, textCol: String,
                 outCol: String = "quality_prob"): DataFrame =
    df.withColumn(outCol, score(model, col(textCol)))

  /** Keep documents scoring at or above `threshold` — the GPT-3-style
    * cut (their recipe adds a stochastic Pareto keep; compose with
    * [[graft.operators.Sampling.importanceResample]] for that). */
  def filterByQuality(df: DataFrame, model: QcModel, textCol: String,
                      threshold: Double): DataFrame =
    df.filter(score(model, col(textCol)) >= threshold)
}
