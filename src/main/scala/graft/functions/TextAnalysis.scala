package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID, quality scoring, token counting, document fingerprinting.
 * Everything is built from codegen'd Catalyst expressions (no UDFs) so the
 * whole pass stays inside WholeStageCodegen — at 100 TB these run at scan
 * speed, one pass over the text column.
 */
object TextAnalysis {

  /**
   * Unicode-normalize a text column (NFC default — the form web crawls
   * disagree on most; NFKC folds ligatures/width for tokenizer input).
   * Native expression with ASCII and already-normalized fast paths
   * ([[graft.expressions.NormalizeUnicode]]); run it before fingerprint
   * or exact dedup so composed/decomposed spellings of the same word
   * hash identically.
   */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.NormalizeUnicode(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text), form))

  /** HTML -> text extraction (tags stripped, script/style/comments
    * dropped, block tags -> newlines, entities decoded) — the native
    * single-pass state machine in [[graft.expressions.HtmlToText]]. */
  def htmlToText(html: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.HtmlToText(
        org.apache.spark.sql.graftshim.ColumnShim.expression(html)))

  /** Frame form of [[normalizeUnicode]]. */
  def normalizeUnicode(df: DataFrame, textCol: String, form: String,
                       outputCol: Option[String]): DataFrame =
    df.withColumn(outputCol.getOrElse(textCol),
      normalizeUnicode(col(textCol), form))

  /**
   * TF-IDF keyword extraction: the top-k highest-scoring terms per
   * document — the classic retrieval/topic signal, and the standard
   * "what is this page about" feature for corpus analysis and
   * domain-weighted sampling. Smooth idf (`ln((N+1)/(df+1)) + 1`), score
   * rounded to 6 decimals so ranking is reproducible across engines;
   * ties break on term order.
   *
   * Scale shape (100 TB): after tokenization only scalar (id, term,
   * count) rows move — three map-side-combinable aggregations plus one
   * term-keyed equi-join; the top-k window partitions by doc id
   * (uniformly distributed, bounded per-group by the doc's own distinct
   * terms). Hot terms never concentrate documents: the df table
   * aggregates counts, not postings.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, minTermLen: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nDocs = df.count()
    val toks = df.select(col(idCol),
        explode(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "))
          .as("term"))
      .filter(length(col("term")) >= minTermLen)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfTable, "term")
      .withColumn("score", round(col("tf") *
        (log((lit(nDocs) + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }

  /**
   * Canonicalize a URL for crawl dedup and frequency counting — the same
   * page arrives under dozens of spellings (tracking params, fragments,
   * case, default ports, trailing slashes) and URL-keyed dedup/stats are
   * wrong until they collapse. Deterministic, documented normal form:
   * fragment dropped; scheme+host lowercased; userinfo dropped; default
   * port stripped (:80 http / :443 https); empty path becomes "/" and a
   * single trailing slash is stripped elsewhere; query params lose
   * tracking keys (utm_*, fbclid, gclid, msclkid, mc_eid, igshid), drop
   * empties, and sort. Non-URLs (no scheme://) pass through unchanged.
   * Pure codegen'd builtins — no UDF.
   */
  def canonicalizeUrl(url: Column): Column = {
    val trackingRe = "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$"
    val noFrag = regexp_replace(url, "#.*", "")
    val isUrl = noFrag.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = lower(regexp_replace(
      regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1),
      "^.*@", ""))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path0 = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/"))
      .when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val kept = array_join(sort_array(filter(split(
      regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      t => length(t) > 0 && !t.rlike(trackingRe))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
    when(isUrl, canon).otherwise(url)
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /**
   * BPE-ish token estimate: words + punctuation marks counted separately
   * (a cheap, deterministic proxy for subword tokenizers).
   */
  def tokenCountBpeIsh(text: Column): Column = {
    val words = size(split(trim(text), "\\s+"))
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    (words + punct).cast("int")
  }

  /** Character-class ratios used by quality heuristics. */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    punct.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  def upperRatio(text: Column): Column = {
    val uppers = length(text) - length(regexp_replace(text, "[A-Z]", ""))
    uppers.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  def digitRatio(text: Column): Column = {
    val digits = length(text) - length(regexp_replace(text, "[0-9]", ""))
    digits.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  /** Fraction of tokens that are English stopwords (fixed small list). */
  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
      "on", "was", "with", "as", "at", "by", "be", "this")

  def stopwordRatio(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val stops = filter(tokens, t => array_contains(lit(StopWords.toArray), t))
    size(stops).cast("double") / greatest(size(tokens), lit(1)).cast("double")
  }

  /**
   * Composite quality score in [0,1]: rewards reasonable length and
   * stopword presence, penalizes punctuation/digit-heavy text. A
   * deterministic heuristic in the Gopher/C4-rule tradition.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(4.0))
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digitRatio(text) * lit(4.0))
    round((lenScore * lit(0.3) + stopScore * lit(0.3)
      + punctPenalty * lit(0.2) + digitPenalty * lit(0.2)), 6)
  }

  /**
   * Language ID via stopword-list voting: score = hits of each language's
   * top function words among the document's tokens; argmax wins, 'und' when
   * no list scores. N-gram-free but the same shape as fastText-style LID —
   * and expressible as pure Catalyst array ops.
   */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "por", "para", "con", "del"),
    "it" -> Seq("il", "la", "che", "e", "per", "una", "con", "del", "non", "sono")
  )

  def languageId(text: Column): Column = {
    val tokens = split(lower(trim(text)), "[\\s\\p{Punct}]+")
    val scores = LangStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = filter(tokens, t => array_contains(lit(words.toArray), t))
      struct(size(hits).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /**
   * Document fingerprint: 64-bit rolling-hash-style signature. Uses
   * xxhash64 over normalized text (lowercased, whitespace-collapsed) —
   * identical documents up to whitespace/case map to the same fingerprint.
   */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /**
   * Within-document repetition statistics (the Gopher/C4 quality-filter
   * family): fraction of duplicate lines and duplicate paragraphs, plus
   * the mean line length. Per-row array ops over a document's own lines —
   * linear per document, no shuffle, so it composes with any corpus-level
   * filter at 100 TB.
   */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    def nonEmpty(parts: Column): Column =
      filter(parts, x => trim(x) =!= "")
    def dupFrac(parts: Column): Column = {
      val n = size(parts)
      when(n === 0, 0.0)
        .otherwise(round(lit(1.0) - size(array_distinct(parts)).cast("double") / n, 6))
    }
    val lines = nonEmpty(split(col(textCol), "\n"))
    val paras = nonEmpty(split(col(textCol), "\n\n"))
    df.withColumn("dup_line_frac", dupFrac(lines))
      .withColumn("dup_para_frac", dupFrac(paras))
      .withColumn("mean_line_len",
        when(size(lines) === 0, 0.0).otherwise(
          round(aggregate(lines, lit(0L), (acc, x) => acc + length(x))
            .cast("double") / size(lines), 6)))
  }

  /**
   * PII scrubbing for training corpora: redact emails, IPv4 addresses and
   * long digit runs (phone/account numbers) with typed placeholders.
   * Pure regexp_replace chain (codegen'd, no UDF); patterns use only
   * portable character classes so the same expressions run under Java
   * regex and RE2-family engines.
   */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
    regexp_replace(ip, "[0-9][0-9 ()+.-]{8,}[0-9]", "<NUM>")
  }

  def scrubPii(df: DataFrame, textCol: String,
               outputCol: Option[String] = None): DataFrame =
    df.withColumn(outputCol.getOrElse(textCol), scrubPii(col(textCol)))

  /** Convenience: append the standard text-analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCountWs(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_id", languageId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /**
   * Gopher-style quality RULE FLAGS (Rae et al. 2021 §A1.1 thresholds,
   * adapted to this corpus's whitespace tokenization): per-document word
   * count bounds, mean word length bounds, symbol-to-word ratio cap
   * (# and … as in the paper), and minimum stopword hits. Emits one
   * boolean per rule plus the conjunction (`gopher_pass`) so a pipeline
   * can either hard-filter or keep the flags for analysis. One
   * projection pass, no shuffle.
   */
  def gopherFlags(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolWordRatio: Double = 0.1,
                  minStopwordHits: Int = 2): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val nWords = size(words)
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / greatest(nWords, lit(1)).cast("double")
    val symbols = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))) +
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3 +
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "…", ""))) // typographic …
    val stopHits = size(filter(words, w =>
      array_contains(lit(StopWords.toArray), w)))
    df.withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len", round(meanLen, 6))
      .withColumn("word_count_ok",
        nWords >= minWords && nWords <= maxWords)
      .withColumn("mean_word_len_ok",
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen)
      .withColumn("symbol_ratio_ok",
        symbols.cast("double") / greatest(nWords, lit(1)).cast("double")
          <= maxSymbolWordRatio)
      .withColumn("stopword_ok", stopHits >= minStopwordHits)
      .withColumn("gopher_pass",
        col("word_count_ok") && col("mean_word_len_ok") &&
          col("symbol_ratio_ok") && col("stopword_ok"))
  }

  // ---- URL / domain filtering (corpus source cleaning) ----

  /**
   * Host extraction from a URL: scheme, userinfo, port, path, query and
   * fragment stripped; lowercased; a leading `www.` dropped. Scheme-less
   * inputs ("example.com/x") work too.
   */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(trim(url)),
        "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$", 1),
      "^www\\.", "")

  /**
   * All dot-boundary suffixes of a domain: `a.b.c.com` →
   * [a.b.c.com, b.c.com, c.com, com]. Bounded by label count, so a
   * blocklist match becomes an EQUI-join/array-overlap on suffixes
   * instead of a per-entry endsWith scan — the standard trick that keeps
   * domain filtering linear when the blocklist has millions of entries.
   */
  def domainSuffixes(domain: Column): Column =
    graft.operators.Dedup.bindOnce(split(domain, "\\.")) { parts =>
      transform(sequence(lit(0), size(parts) - 1),
        i => array_join(slice(parts, i + 1, size(parts) - i), "."))
    }

  /** True when the URL's domain or any parent domain is in `blocklist`.
    * A codegen'd equals/endsWith chain over the literal list — the
    * suffix-chain HOF formulation is interpreted per row and measured
    * ~4× slower at 2M rows. Linear in blocklist size: fine to a few
    * hundred entries; beyond that use the blocklist-frame overload. */
  def blockedDomain(url: Column, blocklist: Seq[String]): Column = {
    val entries = blocklist.map(_.toLowerCase.stripPrefix("www.")).distinct
    if (entries.isEmpty) lit(false) // empty blocklist blocks nothing
    else graft.operators.Dedup.bindOnce(urlDomain(url)) { d =>
      entries.map(b => d === b || d.endsWith("." + b)).reduce(_ || _)
    }
  }

  /**
   * Drop rows whose URL matches a driver-known blocklist (exact domain or
   * any subdomain). Null/empty URLs are KEPT — a domain filter has no
   * opinion on rows without one. Pure codegen'd expression: the blocklist
   * rides along as a literal array, no join, no shuffle.
   */
  def filterUrlBlocklist(df: DataFrame, urlCol: String,
                         blocklist: Seq[String]): DataFrame =
    df.filter(coalesce(!blockedDomain(col(urlCol), blocklist), lit(true)))

  /**
   * Blocklist-frame variant for blocklists too big to broadcast as a
   * literal: explode each row's suffix chain (≤ label count entries) and
   * left-semi equi-join against the blocklist to find blocked ids, then
   * anti-join them away. Both joins are keyed equi-joins — AQE broadcasts
   * the blocklist when it fits, and nothing ever scans per-entry.
   */
  /**
   * Fixed-size token-window chunking with overlap — the document-prep
   * step for RAG indexing and pretraining context packing: emit windows
   * of `chunkTokens` whitespace tokens every `chunkTokens -
   * overlapTokens` positions, rejoined with single spaces. One
   * projection of codegen'd builtins (split → sequence → explode →
   * slice → array_join): no UDF, no shuffle — chunking 100 TB runs at
   * scan speed and the explode's row fan-out is exactly the chunk
   * count. The tail chunk may be short (never dropped); a document
   * shorter than one window yields one chunk. Token = whitespace word;
   * budget by subword estimates upstream ([[tokenCountBpeIsh]]) if the
   * consumer's tokenizer matters.
   *
   * @return (`idCol`, chunk_idx, chunk_text, n_tokens) — chunk_idx and
   *         n_tokens as long
   */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val nChunks = greatest(
      (ceil((col("_n") - chunkTokens).cast("double") / stride) + 1).cast("long"),
      lit(1L))
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .select(col(idCol), col("_toks"), col("_n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(col("_n") - col("chunk_idx") * stride, lit(chunkTokens.toLong))
          .as("n_tokens"))
  }

  /**
   * Corpus report (the "dataset card" numbers a training-data release
   * ships with): per group — or one global row — doc counts, exact-dup
   * ratio via the whitespace-normalized fingerprint, char/token mass,
   * and the token-length distribution (mean/p50/max). ONE aggregate over
   * one projection pass: every statistic is map-side combinable except
   * the exact distinct and percentile, which shuffle scalar
   * (fingerprint, token-count) values only — corpus text never moves.
   */
  def corpusReport(df: DataFrame, textCol: String,
                   groupBy: Seq[String] = Nil): DataFrame = {
    val g = groupBy.map(col)
    val rows = df.select(g ++ Seq(
      fingerprint(col(textCol)).as("_gf_fp"),
      length(col(textCol)).as("_gf_chars"),
      tokenCountWs(col(textCol)).as("_gf_toks")): _*)
    val grouped = if (groupBy.isEmpty) rows.groupBy() else rows.groupBy(g: _*)
    grouped.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("_gf_fp")).as("n_unique"),
        sum(col("_gf_chars")).as("total_chars"),
        sum(col("_gf_toks").cast("long")).as("total_tokens"),
        round(avg(col("_gf_toks")), 6).as("mean_tokens"),
        expr("round(percentile(_gf_toks, 0.5), 6)").as("p50_tokens"),
        max(col("_gf_toks")).cast("long").as("max_tokens"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_unique") / col("n_docs"), 6))
  }

  def filterUrlBlocklist(df: DataFrame, idCol: String, urlCol: String,
                         blocklist: DataFrame, domainCol: String): DataFrame = {
    val suffixed = df.select(col(idCol),
      explode(domainSuffixes(urlDomain(col(urlCol)))).as("_sfx"))
    val blockedIds = suffixed
      .join(blocklist.select(
        regexp_replace(lower(trim(col(domainCol))), "^www\\.", "").as("_sfx")),
        Seq("_sfx"), "left_semi")
      .select(idCol).distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }
}
