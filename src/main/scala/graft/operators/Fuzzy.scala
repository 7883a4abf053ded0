package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.HashFunctions

/**
 * Approximate string matching: edit-distance joins, fuzzy dedup pairs,
 * and record-linkage entity resolution.
 *
 * The reference exposes fuzzy matching only through driver-side pandas
 * helpers; here the same capabilities are distributed joins built on an
 * approximation-free q-gram signature scheme plus native scoring
 * expressions, so they hold up at corpus scale:
 *
 *  - [[fuzzyJoin]] / [[fuzzyPairs]] are EXACT: they return precisely the
 *    pairs within Levenshtein distance `k` (verified with Spark's
 *    built-in `levenshtein`), but never compare all pairs. Candidates
 *    come from two lossless filters (Gravano et al., VLDB 2001 — "Using
 *    q-grams in a DBMS for Approximate String Processing"):
 *      length filter:  |len(a) - len(b)| <= k
 *      prefix filter:  strings within distance k share >= 1 of the
 *                      (k*q + 1) smallest occurrence-tagged q-gram hashes
 *                      under a global total order (Ed-Join, Xiao et al.,
 *                      VLDB 2008: one edit changes at most q tagged grams,
 *                      so the multiset overlap is >= max(Na,Nb) - k*q;
 *                      set-prefix intersection follows)
 *    Each string therefore ships only k*q+1 hashes into the candidate
 *    equi-join regardless of its length — no window, no extra shuffle,
 *    the signature is computed in-row by the codegen'd
 *    [[graft.expressions.QgramOccHashes]]. Strings too short for the
 *    guarantee (gram count <= k*q, e.g. <= 3 chars at q=2,k=2) pair
 *    through a length-band equi-join instead — a bounded family, and
 *    still never a cartesian product.
 *
 *  - [[entityResolution]] is the classic blocking + scoring + clustering
 *    linkage pipeline (Fellegi-Sunter shape): user-declared blocking
 *    expressions (phonetic key, name prefix, zip, ...) bound the
 *    candidate space, a weighted native Jaro-Winkler scores each pair
 *    inside whole-stage codegen, and score >= threshold edges feed the
 *    exact distributed connected components — every member of an entity
 *    cluster gets the cluster-min id. Oversized blocks are capped
 *    deterministically (like the MinHash bucket cap): a block key shared
 *    by more than `maxBlockSize` records is boilerplate (e.g. a default
 *    value), and comparing inside it is quadratic noise.
 *
 * Nulls on the join column never match (SQL join semantics); compare
 * columns in scoring are null-coalesced to "" (similarity 0 against
 * anything, matching DuckDB's jaro_winkler_similarity convention).
 */
object Fuzzy {

  /** Per-string q-gram prep: tagged-gram array + gram count. The count
    * `_n = len + q - 1` stands in for the length filter (counts differ
    * exactly as lengths do). */
  private def prep(df: DataFrame, id: String, strCol: String, q: Int) =
    df.select(col(id), col(strCol),
      HashFunctions.qgramOccHashes(col(strCol), q).as("_grams"))
      .where(col(strCol).isNotNull)
      .withColumn("_n", size(col("_grams")))

  /**
   * All (leftId, rightId, distance) pairs with
   * `levenshtein(left.strCol, right.strCol) <= maxDist`. Exact — equal to
   * the brute-force cross join — without ever building it.
   *
   * @param q q-gram width; 2 is the classic choice (wider grams weaken
   *          the count bound per edit but sharpen selectivity)
   */
  def fuzzyJoin(left: DataFrame, leftId: String, leftCol: String,
                right: DataFrame, rightId: String, rightCol: String,
                maxDist: Int, q: Int = 2,
                distCol: String = "edit_distance"): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(leftId != rightId,
      s"left and right id columns must have distinct names, both are '$leftId' — alias one side")
    val kq = maxDist * q
    val a = prep(left, leftId, leftCol, q)
    val b = prep(right, rightId, rightCol, q)

    // prefix-filter candidates: the kq+1 smallest tagged-gram hashes per
    // string (hash order IS the global total order — no frequency table,
    // no shuffle); covers every pair where at least one side has > kq grams
    val aPref = a.select(col(leftId), col("_n").as("_na"),
      explode(slice(array_sort(col("_grams")), 1, kq + 1)).as("_h"))
    val bPref = b.select(col(rightId), col("_n").as("_nb"),
      explode(slice(array_sort(col("_grams")), 1, kq + 1)).as("_h"))
    val candPrefix = aPref.join(bPref, "_h")
      .where(abs(col("_na") - col("_nb")) <= maxDist)
      .select(col(leftId), col(rightId))

    // short x short (both gram counts <= kq): no shared-gram guarantee —
    // pair within the length band via an integer equi-join. len <= (k-1)q+1
    // chars, so each band holds only the degenerate near-empty strings.
    val aShort = a.where(col("_n") <= kq)
      .select(col(leftId), explode(sequence(col("_n") - maxDist,
        col("_n") + maxDist)).as("_nb"))
    val bShort = b.where(col("_n") <= kq)
      .select(col(rightId), col("_n").as("_nb"))
    val candShort = aShort.join(bShort, "_nb").select(col(leftId), col(rightId))

    val cand = candPrefix.union(candShort).distinct()

    // exact verify on the surviving candidates only; 3-arg levenshtein
    // early-exits past the threshold (returns -1 above it)
    cand
      .join(left.select(col(leftId), col(leftCol).as("_sa")), leftId)
      .join(right.select(col(rightId), col(rightCol).as("_sb")), rightId)
      .withColumn(distCol, levenshtein(col("_sa"), col("_sb"), maxDist))
      .where(col(distCol) >= 0)
      .select(col(leftId), col(rightId), col(distCol).cast("long").as(distCol))
  }

  /**
   * Within-corpus fuzzy-duplicate pairs: (a, b, edit_distance) with a < b
   * and distance <= maxDist. Same lossless filters as [[fuzzyJoin]].
   */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 maxDist: Int, q: Int = 2): DataFrame =
    fuzzyJoin(
      df.select(col(idCol).as("a"), col(textCol)), "a", textCol,
      df.select(col(idCol).as("b"), col(textCol)), "b", textCol,
      maxDist, q)
      .where(col("a") < col("b"))

  /** Native Jaro-Winkler similarity column (see
    * [[graft.expressions.JaroWinkler]]; matches DuckDB bit-for-bit). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.JaroWinkler(
        org.apache.spark.sql.graftshim.ColumnShim.expression(a),
        org.apache.spark.sql.graftshim.ColumnShim.expression(b)))

  /** Jaro similarity (no Winkler prefix boost). */
  def jaroSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.JaroWinkler(
        org.apache.spark.sql.graftshim.ColumnShim.expression(a),
        org.apache.spark.sql.graftshim.ColumnShim.expression(b),
        winkler = false))

  /**
   * Matched-pair scores for record linkage: candidates from the union of
   * blocking expressions, scored with weight-averaged Jaro-Winkler over
   * `compareCols`. Returns (a, b, match_score) with a < b and
   * score >= threshold.
   *
   * @param blockingExprs SQL expressions over the input columns (e.g.
   *        `soundex(name)`, `substring(lower(name), 1, 3)`, `zip`); a
   *        pair is compared when ANY expression agrees (null keys never
   *        block — a null phonetic key is absence, not agreement)
   * @param compareCols (column, weight) pairs for the score
   */
  def linkagePairs(df: DataFrame, idCol: String,
                   compareCols: Seq[(String, Double)],
                   blockingExprs: Seq[String],
                   threshold: Double,
                   maxBlockSize: Int = 1000): DataFrame = {
    require(compareCols.nonEmpty, "entity resolution needs at least one compare column")
    require(blockingExprs.nonEmpty, "entity resolution needs at least one blocking expression")
    val totalW = compareCols.map(_._2).sum
    require(totalW > 0, "compare-column weights must sum to > 0")

    val base = df.select(col(idCol) +: compareCols.map(c => col(c._1)): _*)

    // block membership, one row per (record, agreeing block key)
    val keyed = blockingExprs.zipWithIndex.map { case (e, i) =>
      base.select(col(idCol).as("_rid"),
        concat_ws("\\u0000", lit(i.toString), expr(e).cast("string")).as("_bkey"))
        .where(expr(e).isNotNull)
    }.reduce(_.union(_))

    // deterministic block cap (window keys on _bkey — fine-grained)
    val capped = keyed
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_bkey")).orderBy(col("_rid"))))
      .where(col("_rn") <= maxBlockSize)
      .select(col("_bkey"), col("_rid"))

    val pairs = capped.select(col("_bkey"), col("_rid").as("a"))
      .join(capped.select(col("_bkey"), col("_rid").as("b")), "_bkey")
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()

    // score: weighted mean of native Jaro-Winkler per compare column
    val aSide = base.select(col(idCol).as("a") +:
      compareCols.map(c => col(c._1).as(s"_a_${c._1}")): _*)
    val bSide = base.select(col(idCol).as("b") +:
      compareCols.map(c => col(c._1).as(s"_b_${c._1}")): _*)
    val score = compareCols.map { case (c, w) =>
      jaroWinkler(coalesce(col(s"_a_$c"), lit("")),
        coalesce(col(s"_b_$c"), lit(""))) * lit(w)
    }.reduce(_ + _) / lit(totalW)

    pairs.join(aSide, "a").join(bSide, "b")
      .withColumn("match_score", score)
      .where(col("match_score") >= threshold)
      .select(col("a"), col("b"), col("match_score"))
  }

  /**
   * Full entity resolution: [[linkagePairs]] edges -> exact connected
   * components -> every record labeled with its entity id (cluster-min;
   * unmatched records keep their own id). Adds `outCol` to `df`.
   */
  def entityResolution(df: DataFrame, idCol: String,
                       compareCols: Seq[(String, Double)],
                       blockingExprs: Seq[String],
                       threshold: Double,
                       maxBlockSize: Int = 1000,
                       outCol: String = "entity_id"): DataFrame = {
    val matched = linkagePairs(df, idCol, compareCols, blockingExprs,
      threshold, maxBlockSize)
    val comps = Components.connectedComponents(matched, "a", "b", idCol = "_cid")
    df.join(comps, df(idCol).cast("long") === comps("_cid"), "left")
      .withColumn(outCol, coalesce(col("component"), col(idCol).cast("long")))
      .drop("_cid", "component")
  }
}
