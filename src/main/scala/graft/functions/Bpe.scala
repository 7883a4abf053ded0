package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.{BpeTokens, BpeTokenCount}
import org.apache.spark.sql.graftshim.ColumnShim

/**
 * Learned byte-pair-encoding tokenizer (Sennrich et al. 2016,
 * arXiv:1508.07909 — the public BPE algorithm behind GPT-2/LLaMA-family
 * vocabularies), replacing the regex "BPE-ish" token ESTIMATE
 * ([[TextAnalysis.tokenCountBpeIsh]]) with real subword merges. Token
 * counts are the unit pretraining recipes budget in (mixing weights,
 * packing, pricing), so a learned vocabulary matters at 100 TB.
 *
 * Spark-first split of the classic algorithm:
 *
 *   - TRAIN touches the corpus exactly once: a word-frequency aggregate
 *     (map-side combined groupBy) capped to the top `maxWords` words via
 *     TakeOrderedAndProject (no global sort, bounded driver collect).
 *     The merge loop itself runs on the DRIVER over that word→count
 *     table — this is how every BPE trainer works (the algorithm is
 *     defined on the word-count dictionary, not the corpus), and the
 *     dictionary is vocabulary-bounded, not corpus-bounded.
 *   - ENCODE is one projection through a native Catalyst expression
 *     ([[graft.expressions.BpeTokens]] / [[BpeTokenCount]]): the model
 *     ships to executors once as a referenced object inside
 *     whole-stage codegen, and a per-executor word→tokens cache
 *     exploits the Zipfian word distribution (most encode calls are
 *     cache hits).
 *
 * Variant notes (documented, deterministic): pre-tokenization is
 * whitespace splitting with optional lowercasing (the normalization the
 * engine's other text ops use); initial symbols are Unicode code points;
 * no end-of-word marker (merges never cross word boundaries, so token
 * counts and within-word merges are unaffected). Ties in pair frequency
 * break lexicographically, so training is exactly reproducible.
 */
object Bpe {

  /** A trained BPE model: ordered merge rules. Serializable — ships to
    * executors inside the encode expressions. */
  final case class BpeModel(merges: Vector[(String, String)]) extends Serializable {

    /** merge pair -> rank (lower = applied earlier). */
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.iterator.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + " " + b, Int.box(i))
      }
      m
    }

    /** Per-executor word→tokens cache (Zipf: a small cache absorbs almost
      * all calls). Cleared wholesale when full — no LRU bookkeeping. */
    @transient lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

    private def rankOf(a: String, b: String): Integer = ranks.get(a + " " + b)

    /** Classic greedy BPE encode of one word: repeatedly apply the
      * lowest-rank merge present until none applies. */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      val cached = cache.get(word)
      if (cached != null) return cached
      var syms = {
        val buf = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          buf += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        buf
      }
      var done = syms.size <= 1
      while (!done) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < syms.size - 1) {
          val r = rankOf(syms(i), syms(i + 1))
          if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          // merge ALL occurrences of the best pair left-to-right
          val a = syms(bestIdx); val b = syms(bestIdx + 1); val ab = a + b
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.size)
          var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
              out += ab; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out
          if (syms.size <= 1) done = true
        }
      }
      val arr = syms.toArray
      if (cache.size > (1 << 16)) cache.clear()
      cache.put(word, arr)
      arr
    }

    /** Distinct subword vocabulary reachable from the merges (alphabet
      * symbols are open-ended — any code point is a valid token). */
    def mergedTokens: Seq[String] = merges.map { case (a, b) => a + b }.distinct

    /** Persist as the classic merges.txt format: one "a b" pair per line
      * (symbols never contain whitespace — words are whitespace-split). */
    def save(spark: SparkSession, path: String): Unit = {
      val p = new Path(path)
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      val out = f.create(p, true)
      try merges.foreach { case (a, b) => out.write((a + " " + b + "\n").getBytes("UTF-8")) }
      finally out.close()
    }
  }

  def load(spark: SparkSession, path: String): BpeModel = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val merges = text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf(' ')
      require(i > 0 && i < line.length - 1, s"malformed merges line '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }.toVector
    BpeModel(merges)
  }

  /**
   * Train on a corpus column: ONE distributed pass builds the word-count
   * dictionary (top `maxWords` by frequency — the long tail of hapax
   * words cannot win a merge anyway), then the driver runs the classic
   * merge loop over that bounded table. `numMerges` is the number of
   * merge rules (the HF `vocab_size` minus the alphabet).
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 200000, lowercase: Boolean = true,
            minPairFreq: Long = 2L): BpeModel = {
    require(numMerges >= 0 && maxWords > 0)
    val t0 = if (lowercase) lower(col(textCol)) else col(textCol)
    val counts = df
      .select(explode(split(trim(t0), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc) // + limit => TakeOrderedAndProject
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(counts.toSeq, numMerges, minPairFreq)
  }

  /** The driver-side merge loop (public for tests / pre-counted input).
    * Incremental pair-count maintenance: each merge touches only the
    * words containing the merged pair. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
                      minPairFreq: Long = 2L): BpeModel = {
    import scala.collection.mutable
    val words: Array[mutable.ArrayBuffer[String]] = wordCounts.map { case (w, _) =>
      val buf = new mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf
    }.toArray
    val freq: Array[Long] = wordCounts.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addPair(p: (String, String), wi: Int, n: Long): Unit = {
      pairCount.updateWith(p) { c => Some(c.getOrElse(0L) + n) }
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
      ()
    }
    def dropPair(p: (String, String), wi: Int, n: Long): Unit = {
      pairCount.updateWith(p) {
        case Some(c) if c - n > 0 => Some(c - n)
        case _ => None
      }
      // wi may still contain other occurrences; membership is re-checked
      // lazily when the pair is picked (stale entries are harmless)
      ()
    }
    words.indices.foreach { wi =>
      val s = words(wi)
      var i = 0
      while (i < s.size - 1) { addPair((s(i), s(i + 1)), wi, freq(wi)); i += 1 }
    }

    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      if (pairCount.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then lexicographic pair asc
        var best: (String, String) = null
        var bestC = 0L
        pairCount.foreach { case (p, c) =>
          if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        if (bestC < minPairFreq) exhausted = true
        else {
          val (a, b) = best
          val ab = a + b
          merges += ((a, b))
          made += 1
          val affected = pairWords.getOrElse(best, mutable.Set.empty).toSeq
          pairCount.remove(best)
          pairWords.remove(best)
          affected.foreach { wi =>
            val s = words(wi)
            val n = freq(wi)
            // remove this word's current pair contributions, rewrite, re-add
            var i = 0
            var contains = false
            while (i < s.size - 1 && !contains) {
              if (s(i) == a && s(i + 1) == b) contains = true
              i += 1
            }
            if (contains) {
              i = 0
              while (i < s.size - 1) {
                val p = (s(i), s(i + 1))
                if (p != best) dropPair(p, wi, n)
                i += 1
              }
              val out = new mutable.ArrayBuffer[String](s.size)
              i = 0
              while (i < s.size) {
                if (i < s.size - 1 && s(i) == a && s(i + 1) == b) { out += ab; i += 2 }
                else { out += s(i); i += 1 }
              }
              words(wi) = out
              i = 0
              while (i < out.size - 1) { addPair((out(i), out(i + 1)), wi, n); i += 1 }
            }
          }
        }
      }
    }
    BpeModel(merges.result())
  }

  // ---------------------------------------------------------- encode API

  /** Subword tokens of `text` under `model` (array<string>). */
  def bpeTokens(model: BpeModel, text: Column, lowercase: Boolean = true): Column = {
    val t = if (lowercase) lower(text) else text
    ColumnShim.column(BpeTokens(ColumnShim.expression(t), model))
  }

  /** Token count of `text` under `model` — no token array materialized. */
  def bpeTokenCount(model: BpeModel, text: Column, lowercase: Boolean = true): Column = {
    val t = if (lowercase) lower(text) else text
    ColumnShim.column(BpeTokenCount(ColumnShim.expression(t), model))
  }

  /** Frame helpers for the YAML transformers. */
  def encode(df: DataFrame, model: BpeModel, textCol: String,
             outCol: String = "bpe_tokens", lowercase: Boolean = true): DataFrame =
    df.withColumn(outCol, bpeTokens(model, col(textCol), lowercase))

  def tokenCount(df: DataFrame, model: BpeModel, textCol: String,
                 outCol: String = "bpe_token_count", lowercase: Boolean = true): DataFrame =
    df.withColumn(outCol, bpeTokenCount(model, col(textCol), lowercase))
}
