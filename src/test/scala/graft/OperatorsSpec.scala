// (GraftExtensions itself is driven end-to-end via spark-shell with
// spark.sql.extensions set — extensions only apply at session creation,
// so the shared test session cannot exercise them; see verify skill.)
package graft

import org.apache.spark.sql.functions._
import graft.operators.{Advanced, Dedup, Relational, SqlCore}
import graft.functions.{Similarity, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("join renames right-side collision columns with prefix") {
    val l = Seq((1, "L")).toDF("k", "name")
    val r = Seq((1, "R")).toDF("k", "name")
    val out = Relational.join(l, r, Seq("k"), "inner", prefix = "right")
    assert(out.columns.toSet == Set("k", "name", "right_name"))
    val row = out.collect()(0)
    assert(row.getAs[String]("name") == "L" && row.getAs[String]("right_name") == "R")
  }

  test("join supports semi and anti") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r = Seq((1, "x")).toDF("k", "w")
    assert(Relational.join(l, r, Seq("k"), "semi").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(Relational.join(l, r, Seq("k"), "anti").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("unionByName aligns shuffled column orders") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(("y", 2)).toDF("v", "k")
    val out = Relational.union(Seq(a, b), byName = true).orderBy("k").collect()
    assert(out.map(r => (r.getAs[Int]("k"), r.getAs[String]("v"))).toSeq ==
      Seq((1, "x"), (2, "y")))
  }

  test("sessionize splits on gap > threshold and drops helper columns") {
    val df = Seq(
      (1L, "2026-01-01 00:00:00"), (1L, "2026-01-01 00:10:00"),
      (1L, "2026-01-01 02:00:00"), (2L, "2026-01-01 00:00:00"))
      .toDF("user", "ts_s").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val out = Advanced.sessionize(df, "user", "ts", 1800)
    assert(out.columns.toSet == Set("user", "ts", "session_id"))
    val sessions = out.orderBy("user", "ts").collect().map(_.getAs[String]("session_id"))
    assert(sessions.toSeq == Seq("1-1", "1-1", "1-2", "2-1"))
  }

  test("deduplicate keeps first by order") {
    val df = Seq((1, 2, "old"), (1, 5, "new"), (2, 1, "x")).toDF("k", "ver", "v")
    val out = Dedup.exactDedup _ // touch
    val d = Advanced.deduplicate(df, Seq("k"), Seq($"ver".desc))
    assert(d.collect().map(r => r.getInt(0) -> r.getString(2)).toMap == Map(1 -> "new", 2 -> "x"))
  }

  test("minhash LSH finds the exact-duplicate pair and jaccard verifies") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.9)
    val row = jac.collect()
    assert(row.length == 1 && row(0).getDouble(2) == 1.0)
  }

  test("minhashDedup keeps one representative per near-dup cluster") {
    val docs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (9L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val kept = Dedup.minhashDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L)) // min id of the dup cluster + the unique doc
  }

  test("simhash of identical texts is identical; hamming 0") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 3).collect()
    assert(pairs.length == 1 && pairs(0).getAs[Int]("hamming") == 0)
  }

  test("brute-force ANN top-k ranks the identical vector first") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("id", "vec")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qv", 2)
    assert(out.orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    // two-phase plan: the full N×Q scored set is ranked within
    // (_qid, _pid) cells first — no single-stage sort over only _qid
    // receives every scored row
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_pid"), plan)                     // local phase present
    assert("Window".r.findAllIn(plan).length >= 2, plan)    // local + global rank
  }

  test("text analysis: token count, language id, fingerprint") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy"),
      (2L, "der Hund ist nicht mit der Katze und der Maus"),
      (3L, "  spaced   out   text  "))
      .toDF("id", "text")
    val out = TextAnalysis.analyze(df, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[Int]("n_tokens") == 10)
    assert(out(1).getAs[String]("lang_id") == "en")
    assert(out(2).getAs[String]("lang_id") == "de")
    // fingerprint is whitespace/case-insensitive
    val fp = TextAnalysis.fingerprint _
    val two = Seq(("A  B c", "a b C")).toDF("x", "y")
      .select(fp($"x").as("a"), fp($"y").as("b")).collect()(0)
    assert(two.getLong(0) == two.getLong(1))
  }

  test("validate_and_flag lists failed rules without dropping rows") {
    val df = Seq((1, 50), (2, 10)).toDF("id", "v")
    val out = Advanced.validateAndFlag(df, Seq("v_max" -> "v <= 40", "v_min" -> "v >= 20"), "flags")
    val flags = out.collect().map(r => r.getInt(0) -> r.getAs[String]("flags")).toMap
    assert(flags(1) == "v_max" && flags(2) == "v_min")
    assert(out.count() == 2)
  }

  test("asOfJoin: latest right row at or before each event, tolerance, no match") {
    def t(s: String) = s"$s:00"
    val trades = Seq((1L, t("2026-01-01 10:00"), "t1"), (1L, t("2026-01-01 10:05"), "t2"),
      (1L, t("2026-01-01 12:00"), "t3"), (2L, t("2026-01-01 09:00"), "t4"))
      .toDF("k", "ts_s", "trade").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val quotes = Seq((1L, t("2026-01-01 09:59"), 100.0), (1L, t("2026-01-01 10:05"), 101.0),
      (2L, t("2026-01-01 10:00"), 50.0))
      .toDF("k", "qts_s", "px").withColumn("qts", $"qts_s".cast("timestamp")).drop("qts_s")

    val out = graft.operators.Relational.asOfJoin(trades, quotes, Seq("k"), "ts", "qts")
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Double]("right_px")).map(_.toDouble)).toMap
    assert(out("t1").contains(100.0)) // 09:59 quote
    assert(out("t2").contains(101.0)) // equal-ts quote matches (>= semantics)
    assert(out("t3").contains(101.0)) // carried forward
    assert(out("t4").isEmpty)         // no quote before 09:00 for k=2

    // tolerance: t3 is 1h55m after the 10:05 quote -> outside 1h tolerance
    val tol = graft.operators.Relational.asOfJoin(trades, quotes, Seq("k"), "ts", "qts",
      toleranceSeconds = Some(3600))
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Double]("right_px"))).toMap
    assert(tol("t2").isDefined && tol("t3").isEmpty)
    // left row count always preserved
    assert(graft.operators.Relational.asOfJoin(trades, quotes, Seq("k"), "ts", "qts")
      .count() == 4)
  }

  test("rangeJoin: bin-blocked containment matches inequality semantics") {
    def ts(s: String) = s"$s:00"
    val points = Seq((1L, ts("2026-01-01 10:30"), "p1"), (1L, ts("2026-01-01 13:30"), "p2"),
      (2L, ts("2026-01-01 10:30"), "p3"))
      .toDF("k", "p_s", "name").withColumn("p", $"p_s".cast("timestamp")).drop("p_s")
    val intervals = Seq((1L, ts("2026-01-01 10:00"), ts("2026-01-01 11:00"), "w1"),
      (1L, ts("2026-01-01 10:15"), ts("2026-01-01 14:00"), "w2"),
      (2L, ts("2026-01-01 11:00"), ts("2026-01-01 12:00"), "w3"))
      .toDF("k", "s_s", "e_s", "win")
      .withColumn("s", $"s_s".cast("timestamp")).withColumn("e", $"e_s".cast("timestamp"))
      .drop("s_s", "e_s")

    val inner = graft.operators.Relational.rangeJoin(points, intervals, Seq("k"),
      "p", "s", "e", binSeconds = 1800)
      .select("name", "win").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inner == Set(("p1", "w1"), ("p1", "w2"), ("p2", "w2"))) // p3 outside w3
    val left = graft.operators.Relational.rangeJoin(points, intervals, Seq("k"),
      "p", "s", "e", binSeconds = 1800, how = "left")
    assert(left.count() == 4) // 3 matches + unmatched p3 with null win
    assert(left.filter($"win".isNull).select("name").head().getString(0) == "p3")
    // single evaluation: the exploded bin subtree appears exactly once in
    // the executed plan (the old shape re-ran the join for matched keys)
    val plan = left.queryExecution.executedPlan.toString
    assert("Generate explode".r.findAllIn(plan).length == 1, plan)
  }

  test("stratifiedSample: exact n per stratum, deterministic, partition-invariant") {
    import graft.operators.Sampling
    val df = spark.range(1000).toDF("id")
      .withColumn("cls", (col("id") % 3).cast("string"))
    val s1 = Sampling.stratifiedSample(df, Seq("cls"), 10, Seq("id"))
    val counts = s1.groupBy("cls").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("0" -> 10L, "1" -> 10L, "2" -> 10L))
    // same rows regardless of physical partitioning
    val s2 = Sampling.stratifiedSample(df.repartition(17), Seq("cls"), 10, Seq("id"))
    assert(s1.select("id").collect().map(_.getLong(0)).toSet ==
      s2.select("id").collect().map(_.getLong(0)).toSet)
    // growing the corpus keeps a stable sample unless displaced
    val s3 = Sampling.stratifiedSample(
      df.union(spark.range(1000, 1500).toDF("id")
        .withColumn("cls", (col("id") % 3).cast("string"))),
      Seq("cls"), 10, Seq("id"))
    val kept = s1.select("id").collect().map(_.getLong(0)).toSet
      .intersect(s3.select("id").collect().map(_.getLong(0)).toSet)
    assert(kept.nonEmpty) // prefix stability, not a full reshuffle
  }

  test("ngramContamination flags benchmark overlap, passes clean docs") {
    import graft.operators.Dedup
    val bench = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today").toDF("text")
    val docs = Seq(
      (1L, "intro text then the quick brown fox jumps over the lazy dog near the river bank today and more trailing words here"),
      (2L, "completely unrelated content about distributed query engines and shuffle partitioning strategies in modern systems"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(docs, "doc_id", "text", bench, "text",
      n = 8, threshold = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(1L)._2, s"doc 1 should flag: ${out(1L)}")
    assert(out(1L)._1 > 0.2)
    assert(!out(2L)._2 && out(2L)._1 == 0.0)
    assert(!out(3L)._2) // fewer tokens than n: degenerate shingle, no match
    assert(out.size == 3) // every corpus doc reported
  }

  test("scrubPii redacts emails, IPs, and long digit runs") {
    import graft.functions.TextAnalysis
    val df = Seq(
      (1L, "contact jane.doe+spam@example.co.uk or 192.168.001.42 or +1 (415) 555-0199 now"),
      (2L, "version 2.5 costs 12 dollars")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or <IP> or +<NUM> now", out(1L))
    assert(out(2L) == "version 2.5 costs 12 dollars") // short numbers untouched
  }

  test("normalizeUnicode: forms, fast paths, nulls") {
    import graft.functions.TextAnalysis
    val decomposed = "Cafe\u0301"             // e + combining acute
    val compat = "\uFB01n \u00BD \uFF21"      // fi-ligature, 1/2, fullwidth A
    val df = Seq((1L, decomposed), (2L, compat), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val nfc = TextAnalysis.normalizeUnicode(df, "text", "NFC", Some("out"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(nfc(1L) == "Caf\u00e9")             // composed
    assert(nfc(2L) == compat)                  // NFC leaves compatibility chars
    assert(nfc(3L) == "plain ascii")           // ASCII fast path: unchanged
    assert(nfc(4L) == null)
    val nfkc = TextAnalysis.normalizeUnicode(df, "text", "NFKC", Some("out"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(nfkc(1L) == "Caf\u00e9")
    assert(nfkc(2L) == "fin 1\u20442 A")       // ligature/width/fraction folded
    val nfd = TextAnalysis.normalizeUnicode(df, "text", "NFD", Some("out"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(nfd(1L) == decomposed)              // already NFD: identity
    intercept[IllegalArgumentException] {
      graft.expressions.NormalizeUnicode(null, "NFX")
    }
  }

  test("tfidfTopTerms: rare terms outrank common ones; k and ties respected") {
    import graft.functions.TextAnalysis
    val df = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared shared"),
      (3L, "shared only here")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getString(1)).toMap
    // doc 1: apple (tf=2, df=1) far above shared (df=3); banana (df=1) second
    assert(out((1L, 1L)) == "apple")
    assert(out((1L, 2L)) == "banana")
    // doc 2: shared tf=2 (score 2*(ln(4/4)+1)=2.0) edges cherry tf=1 df=1
    // (score ln(4/2)+1=1.69) — tf can beat rarity
    assert(out((2L, 1L)) == "shared" && out((2L, 2L)) == "cherry")
    // k=2 enforced
    assert(out.size == 6 && !out.contains((1L, 3L)))
    // deterministic tie-break: equal (tf, df) -> term ascending
    val tie = TextAnalysis.tfidfTopTerms(
      Seq((7L, "zeta alpha")).toDF("doc_id", "text"), "doc_id", "text", k = 2)
      .collect().sortBy(_.getLong(4)).map(_.getString(1)).toSeq
    assert(tie == Seq("alpha", "zeta"))
  }

  test("gopherFlags: rule flags and conjunction") {
    import graft.functions.TextAnalysis
    val longOk = (("the quick brown fox is at the barn and it was fine " * 6).trim)
    val df = Seq(
      (1L, longOk),                       // 72 words, stopwords, clean
      (2L, "too short"),                  // word count under min
      (3L, ("#### " * 60).trim),          // symbols, no stopwords
      (4L, (("supercalifragilistic " * 60).trim))) // mean word len too high
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(df, "text", minWords = 50)
      .select("doc_id", "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
        "stopword_ok", "gopher_pass")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)
    assert(!out(3L)._3 && !out(3L)._4)
    assert(!out(4L)._2)
  }

  test("repetitionStats: duplicate line/paragraph fractions") {
    import graft.functions.TextAnalysis
    val df = Seq(
      (1L, "a\nb\na\n\na\nb\na"),    // lines: a,b,a,a,b,a; paras: "a\nb\na" x2
      (2L, "x\ny\nz"),               // no dups
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "text")
      .select("doc_id", "dup_line_frac", "dup_para_frac", "mean_line_len")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 0.666667) // 6 lines, 2 distinct -> round(1 - 2/6, 6)
    assert(out(1L)._2 == 0.5)      // 2 paragraphs, 1 distinct
    assert(out(2L)._1 == 0.0 && out(2L)._3 == 1.0)
    assert(out(3L) == ((0.0, 0.0, 0.0)))
  }

  test("chunkText windows with overlap, short tail, and sub-window docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 9).map(i => s"w$i").mkString(" ")),  // 9 tokens → short tail
      (2L, "only three words"),                        // shorter than a window
      (3L, (1 to 8).map(i => s"t$i").mkString(" ")))   // last window exactly full
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkText(docs, "doc_id", "text",
      chunkTokens = 4, overlapTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1 (9 tokens): ceil((9-4)/2)+1 = 4 chunks at 0,2,4,6; 3-token tail
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.head._3 == "w1 w2 w3 w4" && d1(1)._3 == "w3 w4 w5 w6")
    assert(d1.last._3 == "w7 w8 w9" && d1.last._4 == 3L)
    // overlap invariant: consecutive chunks share exactly overlapTokens
    assert(d1(0)._3.split(" ").takeRight(2).toSeq == d1(1)._3.split(" ").take(2).toSeq)
    // doc 2: one chunk, all tokens
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "only three words", 3L)))
    // doc 3 (8 tokens): starts 0,2,4 → 3 chunks, last full
    val d3 = out.filter(_._1 == 3L)
    assert(d3.length == 3 && d3.last._3 == "t5 t6 t7 t8" && d3.last._4 == 4L)
    // every token position is covered by at least one chunk
    assert(d1.flatMap(_._3.split(" ")).distinct.length == 9)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkText(docs, "doc_id", "text", 4, 4)
    }
  }

  test("crossDocNgrams counts n-grams shared with other documents") {
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.crossDocNgrams(docs, "doc_id", "text", n = 2, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "total_ngrams", "repeated_ngrams", "repeated_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out === Array((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("removeRepeatedSpans cuts merged cross-doc spans, keeps first occurrence") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one two three"),
      (2L, "x y alpha beta gamma delta epsilon z w"),
      (3L, "totally unique words here")).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").select("doc_id", "text", "removed_words")
      .as[(Long, String, Long)].collect()
    // doc 1 is the global first occurrence of every repeated 3-gram: intact;
    // doc 2's three overlapping hit windows [2,5)[3,6)[4,7) merge to [2,7)
    assert(out(0) === ((1L, "alpha beta gamma delta epsilon one two three", 0L)))
    assert(out(1) === ((2L, "x y z w", 5L)))
    assert(out(2) === ((3L, "totally unique words here", 0L)))
  }

  test("removeRepeatedSpans keepFirst=false removes every occurrence") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one two three"),
      (2L, "x y alpha beta gamma delta epsilon z w")).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", n = 3,
      minDocs = 2, keepFirst = false)
      .orderBy("doc_id").select("doc_id", "text", "removed_words")
      .as[(Long, String, Long)].collect()
    assert(out(0) === ((1L, "one two three", 5L)))
    assert(out(1) === ((2L, "x y z w", 5L)))
  }

  test("dsirWeights matches a driver reference; target-like docs score higher") {
    import graft.operators.Sampling
    val target = Seq((100L, "cats and dogs"), (101L, "dogs chase cats"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "cats and dogs and cats"),   // pure target vocabulary
      (2L, "quantum flux capacitors"),  // pure OOV
      (3L, "cats with quantum dogs"))   // mixed
      .toDF("doc_id", "text")
    val got = Sampling.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver reference: add-1-smoothed unigram LLR over target vocab + OOV
    val tWords = Seq("cats", "and", "dogs", "dogs", "chase", "cats")
    val vocab = tWords.distinct
    val tc = tWords.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rawDocs = Map(
      1L -> Seq("cats", "and", "dogs", "and", "cats"),
      2L -> Seq("quantum", "flux", "capacitors"),
      3L -> Seq("cats", "with", "quantum", "dogs"))
    val allRaw = rawDocs.values.flatten.toSeq
    val rc = allRaw.groupBy(w => if (vocab.contains(w)) w else " oov")
      .view.mapValues(_.size.toDouble).toMap
    val (nT, v, nR) = (tWords.size.toDouble, vocab.size.toDouble, allRaw.size.toDouble)
    def lr(w: String): Double = {
      val f = if (vocab.contains(w)) w else " oov"
      math.log((tc.getOrElse(f, 0.0) + 1.0) / (nT + v + 1.0)) -
        math.log((rc.getOrElse(f, 0.0) + 1.0) / (nR + v + 1.0))
    }
    val want = rawDocs.view.mapValues(ws =>
      math.rint(ws.map(lr).sum * 1e6) / 1e6).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-9, s"doc $id: got $s want ${want(id)}") }
    assert(got(1L) > got(3L) && got(3L) > got(2L)) // domain ordering holds
  }

  test("perplexityScore matches a driver bigram-LM reference") {
    import graft.operators.Sampling
    val target = Seq((100L, "the cat sat"), (101L, "the cat ran"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat"),          // exactly in-domain: low cross-entropy
      (2L, "zebras paint quasars"), // pure OOV: high
      (3L, "the cat"),              // in-domain prefix
      (4L, "sat"))                  // single word: unigram-only path
      .toDF("doc_id", "text")
    val got = Sampling.perplexityScore(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver reference
    val tDocs = Seq(Seq("the", "cat", "sat"), Seq("the", "cat", "ran"))
    val uni = tDocs.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val vocab = uni.keySet
    val bi = tDocs.flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ctx = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val (nT, v) = (tDocs.flatten.size.toDouble, vocab.size.toDouble)
    def f(w: String) = if (vocab.contains(w)) w else " oov"
    def pu(w: String) = (uni.getOrElse(f(w), 0.0) + 1.0) / (nT + v + 1.0)
    def pbi(p0: String, c0: String) =
      (bi.getOrElse((f(p0), f(c0)), 0.0) + 1.0) / (ctx.getOrElse(f(p0), 0.0) + v + 1.0)
    def ce(ws: Seq[String]): Double = {
      val terms = pu(ws.head) +: ws.zip(ws.tail).map { case (p0, c0) =>
        0.9 * pbi(p0, c0) + (1.0 - 0.9) * pu(c0) }
      math.rint(-terms.map(math.log).sum / ws.size * 1e6) / 1e6
    }
    val rawDocs = Map(1L -> Seq("the", "cat", "sat"),
      2L -> Seq("zebras", "paint", "quasars"),
      3L -> Seq("the", "cat"), 4L -> Seq("sat"))
    rawDocs.foreach { case (id, ws) =>
      assert(got(id)._1 == ws.size.toLong, s"doc $id token count")
      assert(math.abs(got(id)._2 - ce(ws)) < 1e-9,
        s"doc $id: got ${got(id)._2} want ${ce(ws)}")
    }
    assert(got(1L)._2 < got(2L)._2) // in-domain text reads more fluent
  }

  test("importanceResample: deterministic Gumbel top-k, dominant scores always in") {
    import graft.operators.Sampling
    val df = (1L to 200L).map(i => (i, if (i == 7L) 1000.0 else 0.0))
      .toDF("doc_id", "score")
    val s1 = Sampling.importanceResample(df, "doc_id", "score", 20)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.importanceResample(df, "doc_id", "score", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 20)       // reproducible, exact n
    assert(s1.contains(7L))                 // +1000 logit is never displaced
    val s3 = Sampling.importanceResample(df, "doc_id", "score", 20, seed = 43L)
      .select("doc_id").as[Long].collect().toSet
    assert(s3 != s1)                        // a new seed reshuffles the ties
    intercept[IllegalArgumentException] {
      Sampling.importanceResample(df, "doc_id", "score", 0)
    }
  }

  test("removeRepeatedSpans: sub-n duplicate docs empty out after the first") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other stuff"))
      .toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").select("doc_id", "text", "removed_words")
      .as[(Long, String, Long)].collect()
    assert(out(0) === ((1L, "hello world", 0L)))
    assert(out(1) === ((2L, "", 2L)))
    assert(out(2) === ((3L, "other stuff", 0L)))
  }
}
