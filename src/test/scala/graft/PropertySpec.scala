package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.semantics.Semantics
import graft.operators.Domain

/**
 * Property-based checks (scalacheck) for the pure plan-time layers:
 * the semantic query parser/SQL generator, the unit-conversion algebra,
 * and the Magnus saturation forms. Spark-evaluated properties batch all
 * generated cases into one action.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  test("semantic parser: metrics/dims/where survive arbitrary spacing and keyword case") {
    val sp = Gen.oneOf(" ", "  ", "\t")
    val byKw = Gen.oneOf("BY", "by", "By", "bY")
    val whereKw = Gen.oneOf("WHERE", "where", "Where")
    val p = Prop.forAll(
      Gen.nonEmptyListOf(ident).map(_.distinct.take(4)).suchThat(_.nonEmpty),
      Gen.listOf(ident).map(_.distinct.take(3)),
      Gen.option(ident), sp, byKw, whereKw) { (ms, ds, w, s, by, whr) =>
      val q = new StringBuilder(ms.mkString(s", $s"))
      if (ds.nonEmpty) q.append(s"$s$by$s").append(ds.mkString(", "))
      w.foreach(c => q.append(s"$s$whr$s$c > 0"))
      val pq = Semantics.parse(q.toString)
      pq.metrics == ms && pq.dimensions == ds &&
        pq.where == w.map(c => s"$c > 0")
    }
    check(p)
  }

  test("derived-metric substitution: calls and qualified refs never rewritten") {
    val p = Prop.forAll(ident, ident) { (n1, n2) =>
      (n1 != n2) ==> {
        val model = Semantics.SemanticModel(
          metrics = Map(
            n1 -> Semantics.Metric(n1, "sum(x)", "t"),
            n2 -> Semantics.Metric(n2, "count(y)", "t"),
            "d" -> Semantics.Metric("d", "", "t",
              formula = Some(s"$n1 + $n2 + $n1($n2) + t.$n1"))),
          dimensions = Map.empty)
        val sql = Semantics.generateSql(model, Semantics.ParsedQuery(Seq("d"), Nil, None))
        // bare refs substituted (parenthesized), call + qualified preserved
        sql.contains("(sum(x))") && sql.contains("(count(y))") &&
          sql.contains(s"$n1((count(y)))") && sql.contains(s"t.$n1") &&
          sql.endsWith("AS d FROM t")
      }
    }
    check(p, n = 100)
  }

  test("unit conversion: a -> b -> a is the identity for every unit pair") {
    val units = Seq(
      Seq("m", "km", "cm", "mm", "ft", "in", "mi"),
      Seq("kg", "g", "lb", "oz", "t"),
      Seq("K", "C", "F"),
      Seq("Pa", "kPa", "bar", "psi", "atm", "barg", "psig"),
      Seq("J", "kJ", "Wh", "kWh", "BTU"),
      Seq("m3", "L", "gal"),
      Seq("s", "min", "h", "d"))
    for (family <- units; a <- family; b <- family) {
      val (f1, o1) = Domain.conversion(a, b)
      val (f2, o2) = Domain.conversion(b, a)
      val x = 123.456
      val back = (x * f1 + o1) * f2 + o2
      assert(math.abs(back - x) < 1e-6, s"$a -> $b -> $a drifted: $back")
    }
  }

  test("Magnus saturation: tsat(psat(t)) == t over the meteorological range") {
    // all generated cases in ONE Spark action
    val temps = Gen.listOfN(64, Gen.choose(-40.0, 60.0)).sample.get
    val df = temps.toDF("t_c")
    val rt = Domain.saturationProperties(
      Domain.saturationProperties(df, Some("t_c"), None),
      None, Some("psat_pa"), "rt")
    val maxErr = rt.selectExpr("max(abs(rt_tsat_c - t_c))").collect()(0).getDouble(0)
    assert(maxErr < 1e-9, s"roundtrip error $maxErr")
  }

  test("sequence packing invariants: offsets within budget, contiguous layout, partition-invariant") {
    import graft.operators.Packing
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(0L, 5000L)))
      .map(_.distinctBy(_._1))
    val cases = gen.sample.get
    val df = cases.toDF("id", "tok")
    val budget = 2048L
    val out = Packing.packSequences(df, "id", "tok", budget)
      .orderBy("id")
      .select("id", "tok", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // offsets always inside the budget; seq ids non-decreasing in id order;
    // each start equals the previous start + previous tokens (contiguous)
    assert(out.forall { case (_, _, s, o) => o >= 0 && o < budget && s >= 0 })
    val starts = out.map { case (_, _, s, o) => s * budget + o }
    val expected = out.map(_._2).scanLeft(0L)(_ + _).init
    assert(starts.toSeq == expected.toSeq, "layout is not contiguous")
    // repartitioning the input must not change the layout
    val repart = Packing.packSequences(df.repartition(13), "id", "tok", budget)
      .orderBy("id").select("id", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq == out.map { case (i, _, s, o) => (i, s, o) }.toSeq)
  }

  test("segment dedup invariants: idempotent, first doc unchanged, no segment repeats") {
    import graft.operators.Dedup
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val docs = Gen.listOfN(8, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val once = Dedup.segmentDedup(df, "doc_id", "text", " ", " ")
    val again = Dedup.segmentDedup(once, "doc_id", "text", " ", " ")
    assert(once.exceptAll(again).isEmpty && again.exceptAll(once).isEmpty,
      "segmentDedup is not idempotent")
    val out = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the lowest doc id containing any text keeps its within-doc dedup only
    val first = docs.head
    val expectFirst = first._2.split(" ").distinct.mkString(" ")
    assert(out(first._1) == expectFirst)
    // global invariant: across the output corpus no segment appears twice
    val allSegs = out.values.flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
    assert(allSegs.distinct.size == allSegs.size, "a segment survived twice")
  }

  test("removeRepeatedSpans equals a driver reference on dense random corpora") {
    import graft.operators.Dedup
    // tiny vocab + short docs: repeated n-grams everywhere, overlapping
    // hit windows, whole-doc cuts, first-occurrence ties — every boundary
    // of the interval-merge fold gets exercised
    def reference(docs: Seq[(Long, String)], n: Int, minDocs: Int,
                  keepFirst: Boolean): Map[Long, (String, Long)] = {
      val words = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").toSeq }.toMap
      val occ = docs.flatMap { case (id, _) =>
        val w = words(id)
        (0 until (math.max(w.length - n, 0) + 1))
          .map(p => (id, p, w.slice(p, p + n).mkString(" ")))
      }
      val rep = occ.groupBy(_._3)
        .filter { case (_, os) => os.map(_._1).distinct.size >= minDocs }.keySet
      val repOcc = occ.filter(o => rep(o._3))
      val firstOcc = repOcc.groupBy(_._3)
        .map { case (g, os) => g -> os.map(o => (o._1, o._2)).min }
      val hits = if (keepFirst)
        repOcc.filterNot(o => firstOcc(o._3) == ((o._1, o._2))) else repOcc
      val covered = hits.groupBy(_._1).map { case (id, hs) =>
        id -> hs.flatMap(h => h._2 until math.min(h._2 + n, words(id).length)).toSet }
      docs.map { case (id, _) =>
        val w = words(id)
        val cov = covered.getOrElse(id, Set.empty[Int])
        val kept = w.zipWithIndex.collect { case (x, i) if !cov(i) => x }
        id -> ((kept.mkString(" "), (w.length - kept.length).toLong))
      }.toMap
    }
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(1, 7).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val corpus = Gen.listOfN(12, doc)
    (1 to 5).foreach { seed =>
      val docs = corpus(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
        .get.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      Seq(true, false).foreach { kf =>
        val got = Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"),
            "doc_id", "text", n = 2, minDocs = 2, keepFirst = kf)
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        val want = reference(docs, n = 2, minDocs = 2, keepFirst = kf)
        assert(got == want,
          s"seed=$seed keepFirst=$kf\n got=$got\nwant=$want\ndocs=$docs")
      }
    }
  }

  test("urlDomain is idempotent and suffix chains end at the TLD") {
    import graft.functions.TextAnalysis
    val host = Gen.listOfN(3, ident).map(_.mkString("."))
    val scheme = Gen.oneOf("https://", "http://", "")
    val path = Gen.oneOf("", "/x/y?q=1", ":8080/z", "#frag")
    val cases = Gen.listOfN(40, Gen.zip(scheme, host, path)).sample.get
    val df = cases.map { case (s, h, p) => s"$s$h$p" }.toDF("url")
    val doms = df.select(TextAnalysis.urlDomain($"url").as("d"))
      .withColumn("d2", TextAnalysis.urlDomain($"d"))
      .withColumn("chain", TextAnalysis.domainSuffixes($"d"))
      .collect()
    doms.foreach { r =>
      assert(r.getString(0) == r.getString(1), "urlDomain not idempotent")
      val chain = r.getSeq[String](2)
      assert(chain.head == r.getString(0))
      assert(chain.last == r.getString(0).split("\\.").last)
      assert(chain.size == r.getString(0).count(_ == '.') + 1)
    }
  }

  test("native ngramHashes equals the composed wordShingles+xxhash64 formulation") {
    import org.apache.spark.sql.functions._
    import graft.expressions.HashFunctions
    // the pre-native formulation, inlined as the reference oracle
    def composed(text: org.apache.spark.sql.Column, n: Int) = {
      val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
      val tokens = split(norm, " ")
      val count = greatest(size(tokens) - (n - 1), lit(1))
      transform(
        array_distinct(transform(sequence(lit(0), count - 1),
          i => concat_ws(" ", slice(tokens, i + 1, lit(n))))),
        s => xxhash64(s))
    }
    // random texts + adversarial whitespace/unicode/case/empty shapes
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Foo", "BAR", "ümlaut", "日本語", "x", ""))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")
    val textGen = for {
      ws <- Gen.listOfN(12, word)
      ss <- Gen.listOfN(12, sep)
      lead <- sep; tail <- sep
    } yield lead + ws.zip(ss).map { case (a, b) => a + b }.mkString + tail
    val texts = Gen.listOfN(150, textGen).sample.get ++ Seq(
      "", " ", "one", "one two", "\t\n", "A  B\tC", "ÅÄÖ åäö ß", "a b a b a")
    for (n <- Seq(1, 3, 8)) {
      val got = texts.toDF("t").select(
        array_sort(HashFunctions.ngramHashes($"t", n)).as("fast"),
        array_sort(composed($"t", n)).as("ref"),
        $"t").collect()
      got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"n=$n mismatch on ${r.getString(2).take(60).replace("\n", "\\n")}"))
    }
    // real corpus: every document at sf0.001, all three n values
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(3, 8)) {
      val bad = docs.select(
        array_sort(HashFunctions.ngramHashes($"text", n)).as("fast"),
        array_sort(composed($"text", n)).as("ref"))
        .filter(not($"fast" <=> $"ref")).count()
      assert(bad == 0, s"n=$n: $bad documents diverge")
    }
  }

  test("sortedJaccard equals the array_intersect/union formulation on random sets") {
    import org.apache.spark.sql.functions._
    import graft.expressions.HashFunctions
    // random multisets incl. empties, duplicates, disjoint and identical
    val gen = Gen.listOf(Gen.chooseNum(-5L, 25L))
    val base = Gen.listOfN(120, Gen.zip(gen, gen)).sample.get
    val cases = base ++ Seq(
      (Nil, Nil), (List(1L, 1L, 2L), List(2L, 2L, 3L)),
      (List(7L), Nil), (List(1L, 2L, 3L), List(1L, 2L, 3L)))
    val df = cases.toDF("a", "b").select(
      // the operator contract: sorted, distinct inputs
      array_sort(array_distinct($"a")).as("sa"),
      array_sort(array_distinct($"b")).as("sb"))
    val got = df.select(
      HashFunctions.sortedJaccard($"sa", $"sb").as("fast"),
      graft.operators.Dedup.jaccard($"sa", $"sb").as("ref")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
      s"mismatch: fast=${r.getDouble(0)} ref=${r.getDouble(1)}"))
    // non-distinct (duplicate-run) inputs still behave as sets
    val dup = Seq((List(1L, 1L, 2L, 5L, 5L), List(1L, 2L, 2L, 9L))).toDF("a", "b")
      .select(HashFunctions.sortedJaccard(array_sort($"a"), array_sort($"b")))
      .collect()(0).getDouble(0)
    assert(math.abs(dup - 0.5) < 1e-12) // {1,2,5} vs {1,2,9}: inter 2, union 4
  }

  test("PQ expressions equal the driver reference: encode argmin, ADC reconstruction dot") {
    import org.apache.spark.sql.functions._
    import graft.expressions.PqFunctions
    val rng = new scala.util.Random(7)
    val dim = 12; val m = 3; val dsub = dim / m; val ksub = 5
    val books: Array[Array[Array[Double]]] =
      Array.fill(m, ksub, dsub)(rng.nextGaussian())
    val vecs = Seq.fill(60)(Array.fill(dim)(rng.nextGaussian().toFloat)) ++
      Seq(Array.fill(dim)(0.0f)) // degenerate all-zero vector
    def refEncode(v: Array[Float]): Array[Byte] =
      Array.tabulate(m) { s =>
        (0 until ksub).minBy { j =>
          (0 until dsub).map { t =>
            val d = v(s * dsub + t) - books(s)(j)(t); d * d
          }.sum
        }.toByte
      }
    def refAdc(codes: Array[Byte], q: Array[Float]): Double =
      (0 until m).map { s =>
        val c = books(s)(codes(s) & 0xFF)
        (0 until dsub).map(t => q(s * dsub + t).toDouble * c(t)).sum
      }.sum
    val q = Array.fill(dim)(rng.nextGaussian().toFloat)
    val rows = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
      .select($"v".cast("array<float>").as("v"))
      .withColumn("codes", PqFunctions.pqEncode($"v", books))
      .withColumn("adc", PqFunctions.pqAdcDot($"codes", typedLit(q.toSeq), books))
      .select($"v", $"codes", $"adc").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val codes = r.getAs[Array[Byte]](1)
      assert(codes.toSeq == refEncode(v).toSeq, s"encode mismatch on ${v.take(3).toSeq}")
      assert(math.abs(r.getDouble(2) - refAdc(codes, q)) < 1e-9)
    }
  }

  test("html extraction: never throws, never grows, strips every tag byte") {
    import org.apache.spark.unsafe.types.UTF8String
    // adversarial soup: unmatched <, raw &, quotes, nested-ish tags,
    // entities, unicode — the state machine must stay total and bounded
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const("<"), Gen.const(">"),
      Gen.const("&"), Gen.const("&amp;"), Gen.const("&#65;"), Gen.const(";"),
      Gen.const("<p>"), Gen.const("</p>"), Gen.const("<script>"),
      Gen.const("</script>"), Gen.const("<!--"), Gen.const("-->"),
      Gen.const("<a href=\"x>y\">"), Gen.const("'"), Gen.const("\""),
      Gen.const(" "), Gen.const("\n"), Gen.const("ü中"))
    val html = Gen.listOf(frag).map(_.mkString)
    val p = Prop.forAll(html) { h =>
      val out = graft.expressions.HtmlImpls
        .htmlToText(UTF8String.fromString(h)).toString
      val in = UTF8String.fromString(h)
      // total + bounded: output bytes never exceed input bytes
      (out.getBytes("UTF-8").length <= in.numBytes()) :| s"grew on ${h.take(60)}" &&
      // whitespace is always collapsed: no runs, no leading/trailing
      (!out.contains("  ") && !out.contains("\n\n") &&
        out == out.trim) :| s"whitespace on ${h.take(60)}"
    }
    check(p, 500)
  }
}
