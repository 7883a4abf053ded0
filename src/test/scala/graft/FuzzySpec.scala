package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.PlanAudit
import graft.operators.Fuzzy

/**
 * Fuzzy matching: the q-gram-filtered edit-distance join must EQUAL the
 * brute-force cross join (the filters are approximation-free), the native
 * Jaro-Winkler must match the published reference values (and DuckDB's
 * implementation — same algorithm, floored transposition halving), and
 * the plans must stay cartesian-free.
 */
class FuzzySpec extends SparkSpec {

  import spark.implicits._

  private def bruteForce(left: DataFrame, right: DataFrame, k: Int): Set[(Long, Long, Long)] =
    left.as("l").crossJoin(right.as("r"))
      .withColumn("d", levenshtein(col("l.s"), col("r.s")))
      .where(col("d") <= k)
      .select(col("l.id"), col("r.id"), col("d").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def fuzzy(left: DataFrame, right: DataFrame, k: Int, q: Int = 2): Set[(Long, Long, Long)] =
    Fuzzy.fuzzyJoin(
      left.select(col("id").as("lid"), col("s")), "lid", "s",
      right.select(col("id").as("rid"), col("s")), "rid", "s", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Random word corpus with edits planted at every distance 0..4. */
  private def randomStrings(seed: Int, n: Int, alphabet: String = "abcde",
                            maxLen: Int = 12): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(maxLen + 1)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("fuzzyJoin equals brute force on random corpora (k = 0..3, incl. empty/short strings)") {
    for (seed <- 1 to 3; k <- 0 to 3) {
      val l = randomStrings(seed, 120).toDF("id", "s")
      val r = randomStrings(seed + 100, 120).toDF("id", "s")
      val expected = bruteForce(l, r, k)
      val got = fuzzy(l, r, k)
      assert(got == expected,
        s"seed=$seed k=$k: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("fuzzyJoin equals brute force with q=3 grams") {
    val l = randomStrings(7, 100, "abc", 9).toDF("id", "s")
    val r = randomStrings(8, 100, "abc", 9).toDF("id", "s")
    assert(fuzzy(l, r, 2, q = 3) == bruteForce(l, r, 2))
  }

  test("fuzzyPairs: within-corpus near-duplicates, a < b, exact distances") {
    val docs = Seq(
      (1L, "connecticut"), (2L, "connecticu"), (3L, "conneticut"),
      (4L, "massachusetts"), (5L, "massachusets"), (6L, "california")
    ).toDF("id", "s")
    val pairs = Fuzzy.fuzzyPairs(docs, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = bruteForce(docs, docs, 2)
      .filter(p => p._1 < p._2)
    assert(pairs == expected)
    assert(pairs.contains((1L, 2L, 1L)) && pairs.contains((4L, 5L, 1L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("jaroWinkler matches the published reference values") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),          // DuckDB convention
      ("ab", "ba", 0.0),      // window 0: no cross-position matches
      ("abcdxxxx", "abcdyyyy", 0.6666666666666666)) // jaro <= 0.7: no boost
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .withColumn("jw", Fuzzy.jaroWinkler(col("a"), col("b")))
    val got = df.collect().map(_.getDouble(2))
    cases.map(_._3).zip(got).zipWithIndex.foreach { case ((exp, act), i) =>
      assert(math.abs(exp - act) < 1e-12, s"case $i (${cases(i)}): got $act")
    }
  }

  test("jaroSim drops the prefix boost") {
    val df = Seq(("martha", "marhta")).toDF("a", "b")
      .withColumn("j", Fuzzy.jaroSim(col("a"), col("b")))
    assert(math.abs(df.collect()(0).getDouble(2) - 0.9444444444444445) < 1e-12)
  }

  test("entityResolution clusters dirty variants under the clean record's id") {
    val people = Seq(
      (1L, "jonathan smithe", "boston"),
      (2L, "jonathon smith", "boston"),   // near-dup of 1
      (3L, "jon smith", "chicago"),       // same block, below threshold vs 1
      (4L, "elizabeth warren", "boston"),
      (5L, "elisabeth warren", "boston"), // near-dup of 4
      (6L, "maria garcia", "houston")
    ).toDF("pid", "name", "city")
    val resolved = Fuzzy.entityResolution(people, "pid",
      compareCols = Seq("name" -> 0.8, "city" -> 0.2),
      blockingExprs = Seq("substring(name, 1, 3)", "city"),
      threshold = 0.93)
    val byId = resolved.collect().map(r => r.getAs[Long]("pid") -> r.getAs[Long]("entity_id")).toMap
    assert(byId(1L) == 1L && byId(2L) == 1L, s"1/2 should merge: $byId")
    assert(byId(4L) == 4L && byId(5L) == 4L, s"4/5 should merge: $byId")
    assert(byId(3L) == 3L && byId(6L) == 6L, s"3/6 should stand alone: $byId")
  }

  test("linkagePairs: blocking caps oversized blocks deterministically") {
    // 50 records share one block key; cap 10 keeps ids 0..9 only
    val df = (0L until 50L).map(i => (i, s"name$i", "same")).toDF("pid", "name", "city")
    val pairs = Fuzzy.linkagePairs(df, "pid", Seq("city" -> 1.0),
      Seq("city"), threshold = 0.0, maxBlockSize = 10)
    val ids = pairs.select("a").union(pairs.select("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 10L).toSet)
    assert(pairs.count() == 45) // 10 choose 2
  }

  test("plans: no cartesian product, no single-partition funnel") {
    val l = randomStrings(11, 500).toDF("id", "s")
    val r = randomStrings(12, 500).toDF("id", "s")
    val join = Fuzzy.fuzzyJoin(
      l.select(col("id").as("lid"), col("s")), "lid", "s",
      r.select(col("id").as("rid"), col("s")), "rid", "s", 2)
    val a1 = PlanAudit.audit(join)
    assert(a1.numCartesianProducts == 0, "fuzzyJoin: cartesian in plan")
    assert(a1.numSinglePartitionExchanges == 0, "fuzzyJoin: reducer funnel")

    val er = Fuzzy.linkagePairs(
      l.select(col("id").as("pid"), col("s").as("name")), "pid",
      Seq("name" -> 1.0), Seq("substring(name, 1, 2)"), 0.9)
    val a2 = PlanAudit.audit(er)
    assert(a2.numCartesianProducts == 0, "linkagePairs: cartesian in plan")
    assert(a2.numSinglePartitionExchanges == 0, "linkagePairs: reducer funnel")
  }
}
