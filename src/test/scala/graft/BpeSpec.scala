package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/**
 * Learned BPE: training must reproduce the classic merge dynamics
 * (Sennrich 2016) deterministically, and the native encode expression
 * must agree with an INDEPENDENT quadratic reference implementation on
 * adversarial and random corpora — the same driver-reference discipline
 * as the other no-oracle operators.
 */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: re-derive the merge result by repeatedly
    * scanning for the lowest-rank adjacent pair (no incremental state,
    * different code path from BpeModel.encodeWord). */
  private def refEncode(model: Bpe.BpeModel, word: String): Seq[String] = {
    val rank = model.merges.zipWithIndex.toMap
    var syms: Vector[String] = word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))
    var changed = true
    while (changed && syms.size > 1) {
      val present = syms.zip(syms.tail).filter(rank.contains)
      if (present.isEmpty) changed = false
      else {
        val (a, b) = present.minBy(rank)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  private def refDoc(model: Bpe.BpeModel, text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      .flatMap(w => refEncode(model, w))

  test("training learns the classic merges on a toy corpus") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the canonical
    // Sennrich example family: 'es'/'est' dominate, then 'lo'/'low'
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Bpe.trainFromCounts(counts, numMerges = 10, minPairFreq = 2)
    // first merge must be the most frequent pair: (e,s) with 9, ties none
    assert(model.merges.head == ("e", "s"))
    assert(model.merges.take(2).contains(("es", "t"))) // 'est' next (9)
    // after enough merges the frequent words become single tokens
    assert(model.encodeWord("newest").toSeq == Seq("newest"))
    assert(model.encodeWord("low").toSeq == Seq("low"))
    // unseen word decomposes into learned subwords + leftover chars
    val est = model.encodeWord("brightest").toSeq
    assert(est.last == "est" || est.contains("est"))
  }

  test("training is deterministic with lexicographic tie-break") {
    val counts = Seq(("ab", 3L), ("cd", 3L), ("ef", 3L))
    val m1 = Bpe.trainFromCounts(counts, 3)
    val m2 = Bpe.trainFromCounts(counts, 3)
    assert(m1 == m2)
    assert(m1.merges.head == ("a", "b")) // all pairs tie at 3 -> smallest pair
    // stops when no pair reaches minPairFreq
    val m3 = Bpe.trainFromCounts(Seq(("xy", 1L)), 5, minPairFreq = 2)
    assert(m3.merges.isEmpty)
  }

  test("native expression agrees with the quadratic reference on random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    def word(): String =
      (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0 until 300).map(i =>
      (i, (0 until (1 + rnd.nextInt(12))).map(_ => word()).mkString(" ")))
    val df = docs.toDF("id", "text")
    val model = Bpe.train(df, "text", numMerges = 60, maxWords = 10000)
    assert(model.merges.nonEmpty)

    val got = Bpe.encode(df, model, "text").select($"id", $"bpe_tokens")
      .as[(Int, Seq[String])].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refDoc(model, text), s"doc $id '$text'")
    }
    // count variant == tokens length, computed without the array
    val counts = Bpe.tokenCount(df, model, "text")
      .select($"id", $"bpe_token_count").as[(Int, Int)].collect().toMap
    docs.foreach { case (id, _) => assert(counts(id) == got(id).size) }
  }

  test("edge cases: empty, whitespace-only, unicode, repeated chars") {
    val model = Bpe.trainFromCounts(
      Seq(("aaaa", 10L), ("ab", 5L), ("héllo", 4L), ("héllo👍", 2L)), 8)
    val df = Seq((0, ""), (1, "   "), (2, "aaaa aaaa"), (3, "héllo👍"),
      (4, "aaa"), (5, "AAAA")).toDF("id", "text")
    val got = Bpe.encode(df, model, "text").select($"id", $"bpe_tokens")
      .as[(Int, Seq[String])].collect().toMap
    assert(got(0).isEmpty && got(1).isEmpty)
    Seq(2, 3, 4, 5).foreach { id =>
      val text = Seq("", "   ", "aaaa aaaa", "héllo👍", "aaa", "AAAA")(id)
      assert(got(id) == refDoc(model, text), s"doc $id")
    }
    assert(got(2) == Seq("aaaa", "aaaa")) // learned whole-word token
    assert(got(5) == Seq("aaaa"))         // lowercase normalization
  }

  test("save/load roundtrip preserves the model exactly") {
    val df = Seq((0, "the quick brown fox jumps over the lazy dog the end"))
      .toDF("id", "text")
    val model = Bpe.train(df, "text", numMerges = 20, minPairFreq = 1)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges.txt"
    model.save(spark, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded == model)
  }

  test("YAML transformers: inline training and persisted model") {
    val docs = Seq((1, "seed seed seed feed feed"), (2, "seed feed deed"))
      .toDF("id", "text")
    graft.core.StandardTransformers.registerAll
    def reg(n: String) = graft.core.TransformerRegistry.get(n).get
    val ctx = graft.core.EngineContext(docs, Map("corpus" -> docs))
    val out = reg("bpe_token_count")(ctx,
      Map("text_col" -> "text", "train_on" -> "corpus", "num_merges" -> "30"))
    val counts = out.select($"id", $"bpe_token_count").as[(Int, Int)].collect().toMap
    // seed/feed fully merge; hapax "deed" stays [d, eed] (minPairFreq=2)
    assert(counts(1) == 5 && counts(2) == 4)

    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/m.txt"
    Bpe.train(docs, "text", 30).save(spark, path)
    val out2 = reg("bpe_encode")(ctx,
      Map("text_col" -> "text", "model_path" -> path))
    assert(out2.columns.contains("bpe_tokens"))
    assert(out2.count() == 2)
  }
}
