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
    // VALUE COLLAPSE: real corpora repeat strings massively (URLs, names,
    // templates — the sf0.1 part table has 20k rows over 64 distinct
    // names). Distance is a function of the VALUES, so the signature +
    // verify machinery runs once per distinct value pair and the id-level
    // result expands back through two hash joins — the id-pair output is
    // whatever size it is, but no levenshtein is ever computed twice.
    // Measured 18.6 s → sub-second on the duplicate-heavy bench query.
    val aVals = left.where(col(leftCol).isNotNull)
      .select(col(leftCol).as("_sa")).distinct()
      .select(col("_sa").as(leftId), col("_sa"))
    val bVals = right.where(col(rightCol).isNotNull)
      .select(col(rightCol).as("_sb")).distinct()
      .select(col("_sb").as(rightId), col("_sb"))
    val valMatches = fuzzyJoinDistinct(aVals, leftId, "_sa",
      bVals, rightId, "_sb", maxDist, q, distCol)
      .select(col(leftId).as("_sa"), col(rightId).as("_sb"), col(distCol))
    left.select(col(leftId), col(leftCol).as("_sa"))
      .join(valMatches, "_sa")
      .join(right.select(col(rightId), col(rightCol).as("_sb")), "_sb")
      .select(col(leftId), col(rightId), col(distCol))
  }

  /** The signature join proper, over frames whose string column is
    * already distinct (id = the value itself in [[fuzzyJoin]]). */
  private def fuzzyJoinDistinct(left: DataFrame, leftId: String, leftCol: String,
                                right: DataFrame, rightId: String, rightCol: String,
                                maxDist: Int, q: Int,
                                distCol: String): DataFrame = {
    val kq = maxDist * q
    // lazily localCheckpoint-ed (NOT persist(): the CacheManager
    // matches cached plans by equality, so a persist would silently
    // reuse one invocation's blocks in the next — re-runs must
    // recompute from the inputs): each side feeds THREE consumers
    // (the prefix-gram
    // explode — itself read twice, for the frequency table and the
    // candidate join —, the short-string band join, and the verify
    // join), which otherwise each re-scan the input and re-compute the
    // q-gram signatures. Post-[[fuzzyJoin]] value collapse these frames
    // are distinct-VALUE-sized, not corpus-sized (guide §3.3/§8).
    val a = prep(left, leftId, leftCol, q).localCheckpoint(false)
    val b = prep(right, rightId, rightCol, q).localCheckpoint(false)

    // Prefix-filter candidates: the kq+1 smallest tagged-gram hashes per
    // string under a GLOBAL total order. The order is rare-gram-first
    // (corpus document frequency, hash as tiebreak) — the Ed-Join
    // ordering. Any global order is CORRECT, but ordering by raw hash
    // puts frequent grams into prefixes as often as rare ones, and on a
    // small-alphabet corpus (think part names built from ~100 words) the
    // equi-join on a frequent prefix gram degenerates toward the cross
    // product — measured 31 s → ~1 s at sf0.1 from this ordering alone.
    // The frequency table is one linear aggregation, joined (not
    // collected): gram space scales with the corpus.
    val aG = a.select(col(leftId), col("_n").as("_na"), explode(col("_grams")).as("_h"))
    val bG = b.select(col(rightId), col("_n").as("_nb"), explode(col("_grams")).as("_h"))
    val freq = aG.select(col("_h")).union(bG.select(col("_h")))
      .groupBy("_h").agg(count(lit(1)).as("_df"))
    val aPref = aG.join(freq, "_h")
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(leftId)).orderBy(col("_df"), col("_h"))))
      .where(col("_rk") <= kq + 1)
    val bPref = bG.join(freq, "_h")
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(rightId)).orderBy(col("_df"), col("_h"))))
      .where(col("_rk") <= kq + 1)
    val candPrefix = aPref.select(col(leftId), col("_na"), col("_h"))
      .join(bPref.select(col(rightId), col("_nb"), col("_h")), "_h")
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

    // localCheckpoint-ed: consumed once per blocking expression plus twice for
    // the scoring sides — on the entityResolution path `df` is itself a
    // representative-collapse JOIN whose re-execution is a full input
    // re-scan per consumer; the projection is (id + compare cols) only
    val base = df.select(col(idCol) +: compareCols.map(c => col(c._1)): _*)
      .localCheckpoint(false)

    // block membership, one row per (record, agreeing block key)
    val keyed = blockingExprs.zipWithIndex.map { case (e, i) =>
      base.select(col(idCol).as("_rid"),
        concat_ws("\\u0000", lit(i.toString), expr(e).cast("string")).as("_bkey"))
        .where(expr(e).isNotNull)
    }.reduce(_.union(_))

    // deterministic block cap (window keys on _bkey — fine-grained)
    // localCheckpoint-ed: the pair generator self-joins this frame — without the
    // cache the block-cap window (a full shuffle of the key rows) runs
    // twice, once per join side
    val capped = keyed
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_bkey")).orderBy(col("_rid"))))
      .where(col("_rn") <= maxBlockSize)
      .select(col("_bkey"), col("_rid"))
      .localCheckpoint(false)

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
    require(threshold <= 1.0,
      s"threshold must be <= 1.0 (Jaro-Winkler's maximum), got $threshold")
    // VALUE COLLAPSE: records identical in EVERY compare column and EVERY
    // blocking key are interchangeable in the match graph — they share a
    // block, score 1.0 against each other (>= any valid threshold), and
    // have identical edges to everyone else. Real corpora repeat values
    // massively, which otherwise makes the scored-pair set and the
    // component graph quadratic in the duplication factor (measured
    // 52 s → ~1 s on the duplicate-heavy bench query). One window pass
    // assigns each tuple group its min record id as representative;
    // linkage + clustering run on representatives only, and the component
    // label (min reachable representative = min reachable record id, since
    // representatives ARE group minima) flows back through the group map.
    // Records whose blocking keys are ALL null are never compared, so they
    // stay uncollapsed (their own entity), exactly as before.
    val keyExprs = blockingExprs.zipWithIndex.map { case (e, i) =>
      expr(e).as(s"_gfbk$i")
    }
    val tupled = df.select(Seq(col(idCol).cast("long").as("_gfid")) ++
      compareCols.map(c => col(c._1)) ++ keyExprs: _*)
    val anyKey = blockingExprs.indices.map(i => col(s"_gfbk$i").isNotNull)
      .reduce(_ || _)
    val tupleCols = (compareCols.map(_._1) ++
      blockingExprs.indices.map(i => s"_gfbk$i")).map(col)
    // localCheckpoint-ed (two scalar longs per record): read by the
    // representative filter AND the final label flow-back — without the
    // cache the tuple-collapse window (a full shuffle of the input's
    // compare/blocking columns) runs once per consumer
    val vidMap = tupled.withColumn("_gfvid",
        when(anyKey, min(col("_gfid")).over(Window.partitionBy(tupleCols: _*)))
          .otherwise(col("_gfid")))
      .select(col("_gfid"), col("_gfvid"))
      .localCheckpoint(false)
    val reps = df.join(
      vidMap.where(col("_gfid") === col("_gfvid")).select(col("_gfid")),
      df(idCol).cast("long") === col("_gfid")).drop("_gfid")
    val matched = linkagePairs(reps, idCol, compareCols, blockingExprs,
      threshold, maxBlockSize)
    val comps = Components.connectedComponents(matched, "a", "b", idCol = "_cid")
    val entOf = vidMap.join(comps, vidMap("_gfvid") === comps("_cid"), "left")
      .select(col("_gfid"), coalesce(col("component"), col("_gfvid")).as("_gfent"))
    df.join(entOf, df(idCol).cast("long") === entOf("_gfid"), "left")
      .withColumn(outCol, coalesce(col("_gfent"), col(idCol).cast("long")))
      .drop("_gfid", "_gfent")
  }
}
