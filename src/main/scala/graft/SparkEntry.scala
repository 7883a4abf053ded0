package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextAnalysis}
import graft.operators.{Advanced, Dedup, Relational, Sampling, SqlCore}

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, with a DuckDB-equivalent oracle in `oracleSql` wherever the
 * semantics are ANSI-SQL-expressible (xxhash64/LSH-based ops are rows-only).
 *
 * Oracle-compat notes (DuckDB 1.0 vs Spark 4):
 *  - derived ints are cast to BIGINT on the Spark side because DuckDB's
 *    year()/row_number()/len() return int64;
 *  - double aggregates of non-integer-valued columns are round()ed — the
 *    engines may sum in different orders;
 *  - `events.ts` is nanosecond-precision parquet: Spark truncates to micros,
 *    so raw `ts` is never output — only whole-second/hour derivations;
 *  - DuckDB date_trunc('month') returns DATE, so month truncations are cast
 *    to DATE on both sides.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * events.ts loader, robust to how the driver generated the parquet:
   * TIMESTAMP(NANOS) (read as long under
   * spark.sql.legacy.parquet.nanosAsLong=true, converted here to
   * microsecond TimestampType — truncating, matching DuckDB floor(epoch)
   * in the oracles) or TIMESTAMP(MICROS) (read natively; TIMESTAMP_NTZ is
   * cast to session-zone TimestampType, identical instants in the UTC
   * sessions every entry point uses).
   */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Flagship query on sf=0.001 (TPC-H Q1 shape); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
    Relational.aggregate(
      SqlCore.filterRows(li, "l_shipdate <= timestamp'1998-09-02 00:00:00'"),
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity" -> "sum", "l_orderkey" -> "count"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sql_core (SURVEY §2.2) ----
    "q_filter_rows" -> ((s, d) =>
      SqlCore.filterRows(t(s, d, "lineitem"), "l_quantity > 30 AND l_discount < 0.05")),
    "q_derive_columns" -> ((s, d) =>
      SqlCore.deriveColumns(t(s, d, "lineitem"), Seq(
        "net_price" -> "l_extendedprice * (1 - l_discount)",
        "charge" -> "l_extendedprice * (1 - l_discount) * (1 + l_tax)"))
        .select("l_orderkey", "l_linenumber", "net_price", "charge")),
    "q_cast_columns" -> ((s, d) =>
      SqlCore.castColumns(t(s, d, "lineitem").select("l_orderkey", "l_quantity"),
        Map("l_quantity" -> "bigint"))
        .withColumn("okey_str", col("l_orderkey").cast("string"))),
    "q_clean_text" -> ((s, d) =>
      SqlCore.cleanText(t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        Seq("c_name", "c_mktsegment"), trimWs = true, textCase = "lower")),
    "q_extract_date_parts" -> ((s, d) =>
      SqlCore.castColumns(
        SqlCore.extractDateParts(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          "o_orderdate", "o_", Seq("year", "month", "day")).drop("o_orderdate"),
        Map("o_year" -> "bigint", "o_month" -> "bigint", "o_day" -> "bigint"))),
    "q_normalize_schema" -> ((s, d) =>
      SqlCore.normalizeSchema(t(s, d, "orders"),
        rename = Map("o_totalprice" -> "total_price"),
        drop = Seq("o_orderpriority"),
        selectOrder = Seq("o_orderkey", "o_custkey", "total_price", "o_orderstatus"))),
    "q_sort_limit" -> ((s, d) =>
      SqlCore.limitRows(
        SqlCore.sort(t(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber")), 100, offset = 10)),
    "q_sample_det" -> ((s, d) =>
      SqlCore.filterRows(t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        "substring(md5(cast(l_orderkey as string)), 1, 1) in ('0','1','2','3')")),
    "q_stratified_sample" -> ((s, d) =>
      operators.Sampling.stratifiedSample(
        t(s, d, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber"),
        strataCols = Seq("l_returnflag"), n = 100,
        keyCols = Seq("l_orderkey", "l_linenumber"))),
    "q_repetition" -> ((s, d) =>
      graft.functions.TextAnalysis.repetitionStats(
        t(s, d, "documents").select("doc_id", "text"), "text")
        .drop("text")),
    "q_pii_scrub" -> ((s, d) =>
      graft.functions.TextAnalysis.scrubPii(
        t(s, d, "documents").select("doc_id", "text"), "text",
        outputCol = Some("scrubbed")).drop("text")),
    "q_normalize_unicode" -> ((s, d) => {
      // the test corpus is pure ASCII, so inject decomposed/compatibility
      // forms deterministically: NFC must compose e+combining-acute but
      // leave the ligature/fraction/width compatibility chars alone
      val raw = concat(lit("Café ﬁn ½ Ａ "),
        substring(col("text"), 1, 40))
      t(s, d, "documents").select(col("doc_id"), raw.as("raw"))
        .withColumn("nfc", graft.functions.TextAnalysis.normalizeUnicode(col("raw")))
        .withColumn("changed", col("raw") =!= col("nfc"))
    }),
    "q_weighted_mix" -> ((s, d) =>
      operators.Sampling.weightedMix(
        t(s, d, "documents").select("doc_id", "source"),
        "source", Seq("doc_id"),
        Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2))),
    "q_weighted_mix_tokens" -> ((s, d) =>
      operators.Sampling.weightedMixByTokens(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          graft.functions.TextAnalysis.tokenCountWs(col("text"))
            .cast("long").as("n_tokens")),
        "source", "n_tokens", Seq("doc_id"),
        Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2))),
    "q_incremental_dedup" -> ((s, d) => {
      // docs 0-99 are the already-ingested corpus; dedup the rest against
      // their fingerprint set + within-batch
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") >= 100), "doc_id", "text",
        operators.Dedup.newFingerprints(docs.filter(col("doc_id") < 100), "text"))
    }),
    "q_bloom_dedup" -> ((s, d) => {
      // same contract as q_incremental_dedup but through the persisted
      // Bloom-filter fast path: the filter only ROUTES rows (negatives
      // skip the join, positives take the exact check), so the output is
      // deterministic and shares the plain path's oracle
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val seen = operators.Dedup.newFingerprints(docs.filter(col("doc_id") < 100), "text")
      val dir = java.nio.file.Files.createTempDirectory("graft_bloom_q").toString
      operators.BloomIndex.dedupAgainst(s, dir,
        docs.filter(col("doc_id") >= 100), "doc_id", "text", seen,
        expectedItems = 100000L)
    }),
    "q_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTopTerms(
        t(s, d, "documents").select("doc_id", "text"), "doc_id", "text", k = 5)),
    "q_gopher_flags" -> ((s, d) =>
      TextAnalysis.gopherFlags(
        t(s, d, "documents").select("doc_id", "text"), "text", minWords = 20)
        .drop("text")),
    "q_numeric_profile" -> ((s, d) =>
      graft.core.Discovery.numericProfile(
        t(s, d, "lineitem").select("l_quantity", "l_extendedprice", "l_discount"))),
    "q_profile" -> ((s, d) =>
      // exactDistinct for oracle parity; the scale default is HLL
      graft.core.Discovery.profile(
        t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
        exactDistinct = true)),
    "q_url_filter" -> ((s, d) =>
      // synthetic URL from (source, doc_id) — data has no URL column; the
      // filter drops two sources' domains incl. their subdomains
      TextAnalysis.filterUrlBlocklist(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          concat(lit("https://www."), col("source"),
            lit(".example.com/p/"), col("doc_id")).as("url")),
        "url", Seq("src1.example.com", "src7.example.com"))),
    "q_pack_sequences" -> ((s, d) =>
      operators.Packing.packSequences(
        t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048)),
    "q_segment_dedup" -> ((s, d) =>
      // word-granularity run (synthetic docs have no paragraph breaks);
      // the operator itself is separator-parameterized
      operators.Dedup.segmentDedup(
        t(s, d, "documents").select("doc_id", "text"),
        "doc_id", "text", sepRegex = " ", joinSep = " ")),
    "q_contamination" -> ((s, d) => {
      // decontamination sweep: docs 0-19 act as the "benchmark"; members
      // flag themselves at contamination 1.0
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Dedup.ngramContamination(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text", n = 8, threshold = 0.5)
    }),
    "q_distinct" -> ((s, d) =>
      SqlCore.distinctRows(t(s, d, "lineitem").select("l_returnflag", "l_linestatus"))),
    "q_fill_nulls" -> ((s, d) =>
      SqlCore.fillNulls(
        t(s, d, "customer").select(col("c_custkey"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("c_mktsegment")),
        Map("c_mktsegment" -> "SEGMENT_UNKNOWN"))),
    "q_split_part" -> ((s, d) =>
      SqlCore.splitPart(t(s, d, "customer").select("c_custkey", "c_name"),
        "c_name", "#", 2, Some("cust_num"))),
    "q_date_add" -> ((s, d) =>
      SqlCore.dateAdd(
        SqlCore.dateAdd(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          "o_orderdate", 5, "day", Some("ship_by")),
        "o_orderdate", 3, "month", Some("plus3m"))
        .withColumn("ship_by", col("ship_by").cast("timestamp"))
        .withColumn("plus3m", col("plus3m").cast("timestamp"))),
    "q_date_trunc" -> ((s, d) =>
      SqlCore.dateTrunc(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        "o_orderdate", "month", Some("month_start"))),
    "q_date_diff" -> ((s, d) =>
      SqlCore.dateDiff(
        t(s, d, "orders").select("o_orderkey", "o_orderdate")
          .withColumn("ref", expr("timestamp'1998-12-01 00:00:00'")),
        "o_orderdate", "ref", "day", "days_to_ref").drop("ref")),
    "q_case_when" -> ((s, d) =>
      SqlCore.caseWhen(t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_quantity < 10" -> "'low'", "l_quantity < 30" -> "'mid'"),
        Some("'high'"), "qty_class")),
    "q_convert_timezone" -> ((s, d) =>
      SqlCore.convertTimezone(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        "o_orderdate", "UTC", "America/New_York", Some("o_local"))),
    "q_concat_columns" -> ((s, d) =>
      SqlCore.concatColumns(t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        Seq("c_name", "c_mktsegment"), "|", "concat_key")),
    "q_select_drop_rename" -> ((s, d) =>
      SqlCore.renameColumns(
        SqlCore.dropColumns(
          SqlCore.selectColumns(t(s, d, "orders"),
            Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")),
          Seq("o_orderstatus")),
        Map("o_totalprice" -> "price"))),
    "q_add_prefix" -> ((s, d) =>
      SqlCore.addPrefix(t(s, d, "region"), "r0_")),
    "q_normalize_column_names" -> ((s, d) =>
      SqlCore.normalizeColumnNames(t(s, d, "region")
        .select(col("r_regionkey").as("Region Key"), col("r_name").as("regionName")))),
    "q_coalesce_columns" -> ((s, d) =>
      SqlCore.coalesceColumns(
        t(s, d, "customer").select(col("c_custkey"), col("c_name"),
          expr("nullif(c_mktsegment, 'AUTOMOBILE')").as("alt")),
        Seq("alt", "c_name"), "seg_or_name", dropSource = false)
        .select("c_custkey", "seg_or_name")),
    "q_replace_values" -> ((s, d) =>
      SqlCore.replaceValues(t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag"),
        Seq("l_returnflag"), Seq("A" -> "ACCEPTED", "R" -> "RETURNED"))),
    "q_trim_whitespace" -> ((s, d) =>
      SqlCore.trimWhitespace(t(s, d, "documents").select("doc_id", "text"))),
    "q_row_number" -> ((s, d) =>
      SqlCore.rowNumber(t(s, d, "orders"), "rn", Seq("o_custkey"),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc))
        .withColumn("rn", col("rn").cast("long"))
        .select("o_orderkey", "o_custkey", "rn")),

    // ---- relational (SURVEY §2.3) ----
    "q_join_inner" -> ((s, d) =>
      Relational.join(t(s, d, "orders"),
        t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "inner")
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name")),
    "q_join_left" -> ((s, d) =>
      Relational.join(t(s, d, "orders"),
        SqlCore.filterRows(t(s, d, "customer"), "c_acctbal > 9000")
          .withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left")
        .select(col("o_orderkey"), coalesce(col("c_name"), lit("NONE")).as("cust_name"))),
    "q_join_semi" -> ((s, d) =>
      Relational.join(t(s, d, "customer"),
        SqlCore.filterRows(t(s, d, "orders"), "o_totalprice > 300000")
          .withColumnRenamed("o_custkey", "c_custkey"),
        Seq("c_custkey"), "semi")),
    "q_join_anti" -> ((s, d) =>
      Relational.join(t(s, d, "customer"),
        t(s, d, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        Seq("c_custkey"), "anti")),
    "q_union_by_name" -> ((s, d) => {
      val o = t(s, d, "orders")
      Relational.union(Seq(
        o.select("o_orderkey", "o_totalprice", "o_orderstatus").filter("o_orderstatus = 'F'"),
        o.select("o_orderstatus", "o_orderkey", "o_totalprice").filter("o_totalprice > 250000")),
        byName = true)
    }),
    "q_pivot" -> ((s, d) =>
      Relational.pivot(t(s, d, "lineitem"), Seq("l_returnflag"), "l_linestatus",
        "l_quantity", "sum", values = Seq("F", "O"))),
    "q_unpivot" -> ((s, d) =>
      Relational.unpivot(
        t(s, d, "part").select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size")),
        Seq("p_partkey"), Seq("p_retailprice", "p_size"), "attr", "val")),
    "q_aggregate" -> ((s, d) =>
      Relational.aggregate(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity" -> "sum", "l_orderkey" -> "count", "l_extendedprice" -> "avg"))
        .withColumn("l_extendedprice", round(col("l_extendedprice"), 4))),

    // ---- advanced (SURVEY §2.4) ----
    "q_deduplicate" -> ((s, d) =>
      Advanced.deduplicate(t(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").asc))),
    "q_explode" -> ((s, d) =>
      Advanced.explodeListColumn(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber")
          .withColumn("seq_arr", sequence(lit(1L), col("l_linenumber").cast("long"))),
        "seq_arr", outputCol = Some("ln_seq")).drop("seq_arr")),
    "q_dict_mapping" -> ((s, d) =>
      Advanced.dictBasedMapping(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag"),
        "l_returnflag", Seq("A" -> "accepted", "N" -> "none", "R" -> "returned"),
        Some("other"), "flag_desc")),
    "q_regex_replace" -> ((s, d) =>
      Advanced.regexReplace(t(s, d, "documents").select("doc_id", "text"),
        "text", "value", "VAL", Some("text_repl")).drop("text")),
    "q_unpack_struct" -> ((s, d) =>
      Advanced.unpackStruct(
        t(s, d, "customer").select(col("c_custkey"),
          struct(col("c_name"), col("c_acctbal")).as("info")), "info")),
    "q_hash_columns" -> ((s, d) =>
      Advanced.hashColumns(
        Advanced.hashColumns(t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
          Seq("c_name"), "sha256"),
        Seq("c_mktsegment"), "md5")),
    "q_surrogate_key" -> ((s, d) =>
      Advanced.generateSurrogateKey(t(s, d, "customer").select("c_custkey", "c_nationkey"),
        Seq("c_custkey", "c_nationkey"), "sk")),
    "q_numeric_key" -> ((s, d) => // oracle: md5-prefix key per the reference
      Advanced.generateNumericKey(t(s, d, "customer").select("c_custkey", "c_name"),
        Seq("c_name"), "nk")),
    "q_parse_json" -> ((s, d) =>
      Advanced.parseJson(events(s, d).select("event_id", "props"),
        "props", "k BIGINT", Some("pj"))
        .select(col("event_id"), col("pj.k").as("k"))),
    "q_validate_and_flag" -> ((s, d) =>
      Advanced.validateAndFlag(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
        Seq("qty_max" -> "l_quantity <= 45", "disc_max" -> "l_discount <= 0.08"), "flags")),
    "q_window_calc" -> ((s, d) =>
      Advanced.windowCalculation(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        "sum(l_quantity)", Seq("l_orderkey"), Nil, "order_qty")),
    "q_sessionize" -> ((s, d) =>
      Advanced.sessionize(events(s, d).select("event_id", "user_id", "ts"),
        "user_id", "ts", 1800, tieBreak = Seq(col("event_id")))
        .select("event_id", "user_id", "session_id")),
    "q_resample" -> ((s, d) => {
      // time-series regularization: per-user hourly grid, forward-filled.
      // Same-instant duplicates pre-aggregated at second precision so the
      // fill is deterministic on both engines (DuckDB mirrors with an
      // ASOF LEFT JOIN against the same grid).
      val obs = events(s, d).filter(col("user_id") < 20)
        .groupBy(col("user_id"), date_trunc("second", col("ts")).as("ts"))
        .agg(max("value").as("value"))
      operators.TimeSeries.resample(obs, "ts", Seq("value"), 3600, Seq("user_id"))
        .select(col("user_id"), col("ts").as("grid_ts"),
          round(col("value"), 6).as("value"))
    }),
    "q_rolling_agg" -> ((s, d) =>
      // trailing 1-hour time-range mean per user over irregular events —
      // RANGE frames make same-instant rows peers, so the result is
      // partitioning-independent
      operators.TimeSeries.rollingAgg(
        events(s, d).filter(col("user_id") < 50)
          .select("event_id", "user_id", "ts", "value"),
        "ts", "avg(value)", 3600, Seq("user_id"), "rolling_avg")
        .select(col("event_id"), col("user_id"),
          round(col("rolling_avg"), 6).as("rolling_avg"))),
    "q_split_events" -> ((s, d) =>
      Advanced.splitEventsByPeriod(
        events(s, d).select(col("event_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("end_ts")),
        "start_ts", "end_ts", "hour", "dur_s")
        .select("event_id", "period_start", "period_end", "dur_s")),
    "q_flatten_struct" -> ((s, d) =>
      Advanced.flattenStruct(
        t(s, d, "customer").select(col("c_custkey"),
          struct(struct(col("c_name").as("name")).as("inner"),
            col("c_acctbal").as("bal")).as("nested")), "nested")),
    "q_apply_mapping" -> ((s, d) =>
      Advanced.applyMapping(t(s, d, "customer").select("c_custkey", "c_nationkey"),
        t(s, d, "nation"), "c_nationkey", "n_nationkey", "n_name",
        "nation_name", default = Some("UNKNOWN"))),

    // ---- dedup / text / similarity (training-data ops) ----
    "q_exact_dedup" -> ((s, d) =>
      Dedup.exactDedup(t(s, d, "documents"), "doc_id", "text")),
    "q_minhash_pairs" -> ((s, d) => // rows-only: xxhash64-based
      Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text")),
    "q_minhash_dedup" -> ((s, d) => // rows-only: xxhash64-based
      Dedup.minhashDedup(t(s, d, "documents"), "doc_id", "text")),
    "q_quality_classifier" -> ((s, d) => {
      // rows-only: L-BFGS float accumulation order is partitioning-
      // dependent, so cross-engine hashes cannot be stable; the parity
      // and separation guarantees live in QualityClassifierSpec. Labels
      // here proxy "reference corpus vs crawl" with the en/non-en split.
      val docs = t(s, d, "documents")
      val labeled = docs.withColumn("label",
        when(col("lang") === "en", 1.0).otherwise(0.0))
      val model = functions.QualityClassifier.train(labeled, "text", "label",
        numFeatures = 1 << 16, maxIter = 20)
      functions.QualityClassifier.scoreFrame(docs, model, "text")
        .select(col("doc_id"),
          (col("quality_prob") >= 0.5).as("kept"))
    }),
    "q_bpe_tokens" -> ((s, d) => {
      // rows-only: a learned BPE vocabulary is not SQL-expressible (the
      // merge loop is the model); BpeSpec asserts the native encode equals
      // an independent quadratic reference, and training is deterministic.
      // Train on the corpus itself (one word-count pass, bounded driver
      // merge loop), then count subword tokens per doc in one projection.
      val docs = t(s, d, "documents")
      val model = functions.Bpe.train(docs, "text",
        numMerges = 200, maxWords = 50000)
      functions.Bpe.tokenCount(docs, model, "text")
        .select(col("doc_id"), col("bpe_token_count"))
    }),
    "q_minhash_index_dedup" -> ((s, d) => { // rows-only: xxhash64-based
      // corpus docs < 100 are indexed once; the rest arrive as a batch and
      // dedup against the persisted index (the incremental-crawl shape)
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val idx = java.nio.file.Files.createTempDirectory("mhidx").toString + "/idx"
      operators.MinHashIndex.build(docs.filter(col("doc_id") < 100),
        "doc_id", "text", idx)
      operators.MinHashIndex.dedupAgainst(docs.filter(col("doc_id") >= 100),
        "doc_id", "text", idx, threshold = 0.8)
        .select(col("doc_id"))
    }),
    "q_simhash_pairs" -> ((s, d) => // rows-only
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text")),
    "q_ngram_jaccard_pairs" -> ((s, d) => // oracle: candidate recall 1.0 here
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5)),
    "q_embedding_neardup" -> ((s, d) => // rows-only
      Dedup.embeddingNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.25)),
    "q_crossdoc_ngrams" -> ((s, d) =>
      Dedup.crossDocNgrams(t(s, d, "documents").select("doc_id", "text"),
        "doc_id", "text", n = 8, minDocs = 2)),
    "q_remove_spans" -> ((s, d) =>
      // per-doc removed-word counts are the SQL-expressible face of the
      // span cut; the reassembled text itself is spec-verified (DedupSpec)
      Dedup.removeRepeatedSpans(t(s, d, "documents").select("doc_id", "text"),
        "doc_id", "text", n = 8, minDocs = 2)
        .select(col("doc_id"), col("removed_words"))),
    "q_semantic_dedup" -> ((s, d) => // rows-only: Lloyd means carry float
      // summation-order wobble; drop-set recall asserted in RecallSpec
      Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        numClusters = 8, threshold = 0.25).select(col("vec_id"))),
    "q_dsir_weights" -> ((s, d) => {
      // domain-match scoring: docs 0-19 act as the target domain
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Sampling.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
    }),
    "q_importance_sample" -> ((s, d) => { // rows-only: xxhash64 Gumbel keys
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val scored = operators.Sampling.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
      operators.Sampling.importanceResample(scored, "doc_id",
        "dsir_logratio", 500)
    }),
    "q_perplexity" -> ((s, d) => {
      // CCNet-style fluency scoring, upgraded to an interpolated
      // Kneser-Ney TRIGRAM LM of the target domain (fixed discount so the
      // closed form stays exactly reproducible for the oracle)
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Sampling.perplexityScoreKN(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
    }),
    "q_perplexity_bigram" -> ((s, d) => {
      // the original interpolated add-1 bigram variant, kept as its own
      // oracle-verified smoothing mode
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Sampling.perplexityScore(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
    }),
    "q_kll_quantiles" -> ((s, d) => { // rows-only: KLL compaction flips
      // random coins, so sketch bytes (and low-order estimate digits) vary
      // with partitioning; rank-error bounds are asserted in PatternsSpec
      val c = t(s, d, "customer")
      val sk = operators.Sketches.kllSketch(c, Seq("c_mktsegment"), "c_acctbal")
      sk.select(col("c_mktsegment"),
        operators.Sketches.kllQuantile(col("quantile_sketch"), 0.5).as("p50_est"),
        operators.Sketches.kllQuantile(col("quantile_sketch"), 0.95).as("p95_est"))
    }),
    "q_fuzzy_join" -> ((s, d) => {
      // approximation-free edit-distance join: part names vs a
      // deterministically corrupted subset (drop 1st char / 2-char splice /
      // reversed — distances 1, 2, and far). Oracle = the brute-force
      // levenshtein cross join; the q-gram prefix filter must lose nothing.
      val part = t(s, d, "part")
      val corrupted = part.filter(col("p_partkey") % 10 < 3)
        .select((col("p_partkey") + 1000000L).cast("long").as("c_key"),
          expr("""CASE CAST(p_partkey % 3 AS INT)
                  WHEN 0 THEN substring(p_name, 2)
                  WHEN 1 THEN concat(substring(p_name, 1, 3), 'zz', substring(p_name, 6))
                  ELSE reverse(p_name) END""").as("c_name"))
      operators.Fuzzy.fuzzyJoin(
        part.select(col("p_partkey").cast("long").as("p_partkey"), col("p_name")),
        "p_partkey", "p_name", corrupted, "c_key", "c_name", maxDist = 2)
    }),
    "q_string_similarity" -> ((s, d) => {
      // native Jaro-Winkler/Jaro vs DuckDB's implementation — the same
      // algorithm (floored transposition halving), so raw doubles hash-match
      val part = t(s, d, "part").filter(col("p_partkey") % 10 < 3)
      val dirty = expr("concat(substring(p_name, 1, 3), 'zz', substring(p_name, 6))")
      part.select(col("p_partkey").cast("long").as("p_partkey"),
        operators.Fuzzy.jaroWinkler(col("p_name"), dirty).as("jw"),
        operators.Fuzzy.jaroSim(col("p_name"), dirty).as("jaro"))
    }),
    "q_entity_resolution" -> ((s, d) => {
      // record linkage: clean part names + planted first-char-mangled
      // variants; block on chars 2-4 (aligned for the planted pair), score
      // with native Jaro-Winkler, cluster exactly. Oracle = DuckDB
      // jaro_winkler_similarity + recursive-CTE components.
      val part = t(s, d, "part")
      val clean = part.select(col("p_partkey").cast("long").as("pid"),
        col("p_name").as("name"))
      val dirty = part.filter(col("p_partkey") % 4 === 0)
        .select((col("p_partkey") + 1000000L).cast("long").as("pid"),
          concat(lit("x"), expr("substring(p_name, 2)")).as("name"))
      // blocking on chars 2-9: aligned across the planted first-char
      // mangle, and selective enough that block sizes stay bounded on
      // the ~100-word part-name palette (chars 2-4 alone made ~50 giant
      // blocks -> a quadratic candidate set; measured 52 s -> ~1 s)
      operators.Fuzzy.entityResolution(clean.union(dirty), "pid",
        Seq("name" -> 1.0), Seq("substring(name, 2, 8)"),
        threshold = 0.9, maxBlockSize = 1000000)
    }),
    "q_cluster_components" -> ((s, d) => {
      // exact connected components over a deterministic chain graph
      // (edges (i, i+1) within 7-wide doc_id blocks) — multi-hop label
      // propagation the single-pass minhashDedup approximation skips
      val ids = t(s, d, "documents").select(col("doc_id").cast("long").as("id"))
      val edges = ids.select(col("id").as("a"), (col("id") + 1).as("b"))
        .join(ids.select(col("id").as("b")), Seq("b"), "left_semi")
        .filter(col("a") % 7 =!= 6)
      operators.Components.connectedComponents(edges, "a", "b", idCol = "id")
    }),
    "q_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))),
    "q_quality_score" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))),
    "q_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("lang_id"))),
    "q_fingerprint_stats" -> ((s, d) =>
      t(s, d, "documents").agg(
        countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_unique"),
        count(lit(1)).as("n_docs"))),
    "q_corpus_report" -> ((s, d) =>
      // the dataset-card numbers per language in one aggregate pass
      TextAnalysis.corpusReport(t(s, d, "documents"), "text", Seq("lang"))),
    "q_epochs_mix" -> ((s, d) =>
      // multi-epoch upsampling recipe: src0 2.5 epochs, src1 0.25, rest 1.0
      Sampling.epochsMix(t(s, d, "documents").select("doc_id", "source"),
        "doc_id", "source", Map("src0" -> 2.5, "src1" -> 0.25))),
    "q_ann_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter("vec_id < 10").select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", 5).withColumn("rank", col("rank").cast("long"))
    }),
    "q_lsh_topk" -> ((s, d) => { // rows-only: LSH recall < 1 (measured 0.88, RecallSpec)
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb, "vec_id", "embedding",
        emb.filter("vec_id < 10").select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", 5, dim = 64).withColumn("rank", col("rank").cast("long"))
    }),
    "q_ivf_topk" -> ((s, d) => { // rows-only: IVF recall < 1 (measured 0.66, RecallSpec)
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter("vec_id < 10").select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", 5).withColumn("rank", col("rank").cast("long"))
    }),
    "q_ivfpq_topk" -> ((s, d) => { // rows-only: PQ-quantized ANN (recall 0.94, RecallSpec)
      val emb = t(s, d, "embeddings")
      Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        emb.filter("vec_id < 10").select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", 5, dim = 64, m = 16, ksub = 32, refineFactor = 8)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- warehouse heavy-lifters (SURVEY §2.5) ----
    "q_scd2" -> ((s, d) => {
      // SCD2 through the FILE-SCOPED Delta merge (DeltaMerge.scd2Apply):
      // the bootstrap lands as a multi-file Delta table, the apply
      // DV-deletes only the changed current rows and appends their
      // closed + reopened versions — unchanged rows keep their bytes.
      // The read-back must hash-match the oracle computing the same SCD2
      // result relationally from the ORIGINAL parquet.
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_scd2")
        .toString + "/dim"
      graft.sources.DeltaWriter.write(
        operators.Scd.scd2Bootstrap(c, lit("2026-01-01 00:00:00")).coalesce(2), root)
      val source = c.withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
      val res = graft.sources.DeltaMerge.scd2Apply(s, root, source,
        Seq("c_custkey"), Seq("c_acctbal"), lit("2026-02-01 00:00:00"),
        cdf = false)
      require(res.rowsDeleted > 0 && res.rowsAppended == 2 * res.rowsDeleted,
        s"scd2 merge shape off: $res")
      graft.sources.DeltaLog.read(s, root)
    }),
    "q_scd2_deletes" -> ((s, d) => {
      // SCD2 closeDeleted leg: keys ABSENT from the source close their
      // current version (soft delete — reference scd.py:440-447); the
      // rest follows the ordinary changed/unchanged split. Runs through
      // the file-scoped Delta merge like q_scd2.
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_scd2del")
        .toString + "/dim"
      graft.sources.DeltaWriter.write(
        operators.Scd.scd2Bootstrap(c, lit("2026-01-01 00:00:00")).coalesce(2), root)
      val source = c.filter("c_custkey % 7 <> 0").withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100)
          .otherwise(col("c_acctbal")))
      val res = graft.sources.DeltaMerge.scd2Apply(s, root, source,
        Seq("c_custkey"), Seq("c_acctbal"), lit("2026-02-01 00:00:00"),
        closeDeleted = true, cdf = false)
      require(res.rowsDeleted > 0 && res.rowsAppended > res.rowsDeleted,
        s"scd2 closeDeleted shape off: $res")
      graft.sources.DeltaLog.read(s, root)
    }),
    "q_merge_upsert" -> ((s, d) => {
      // upsert through the FILE-SCOPED Delta merge: matched rows become
      // DV bitmaps on their files, replacements + inserts land in new
      // files, ONE atomic commit (with CDF change files staged);
      // untouched files are not re-emitted. Oracle recomputes the merge
      // relationally from the original parquet.
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_merge")
        .toString + "/customer"
      // coalesce(2) + cdf=false keep the fixture lean on the board; the
      // CDF-for-merge leg is covered by DeltaMergeSpec and the
      // cdc_upsert example
      graft.sources.DeltaWriter.write(c.filter("c_custkey % 2 = 0").coalesce(2), root)
      val res = graft.sources.DeltaMerge.upsert(s, root,
        c.filter("c_custkey % 3 = 0").withColumn("c_acctbal", col("c_acctbal") * 2),
        Seq("c_custkey"), cdf = false)
      require(res.rowsDeleted > 0 && res.rowsAppended > res.rowsDeleted,
        s"merge degenerated: $res")
      graft.sources.DeltaLog.read(s, root)
    }),
    "q_merge_evolve" -> ((s, d) => {
      // merge SCHEMA EVOLUTION (reference autoMerge): the source gains a
      // column mid-merge; the SAME atomic commit carries the widened
      // metaData and the merged rows — untouched rows read the new
      // column as null, untouched files keep their bytes.
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_evolve")
        .toString + "/customer"
      graft.sources.DeltaWriter.write(c.filter("c_custkey % 2 = 0").coalesce(2), root)
      val src = c.filter("c_custkey % 3 = 0")
        .withColumn("c_acctbal", col("c_acctbal") * 2)
        .withColumn("c_extra", col("c_custkey") % 7)
      val res = graft.sources.DeltaMerge.upsert(s, root, src, Seq("c_custkey"),
        cdf = false, schemaPolicy = graft.sources.DeltaSchema.Evolve)
      require(res.rowsDeleted > 0 && res.rowsAppended > res.rowsDeleted,
        s"evolving merge degenerated: $res")
      val out = graft.sources.DeltaLog.read(s, root)
      require(out.columns.contains("c_extra"), "schema did not evolve")
      out
    }),
    "q_merge_append_only" -> ((s, d) => {
      val c = t(s, d, "customer")
      operators.Merge.appendOnly(c.filter("c_custkey % 2 = 0"),
        c.filter("c_custkey % 3 = 0"), Seq("c_custkey"))
    }),
    "q_merge_delete" -> ((s, d) => {
      val c = t(s, d, "customer")
      operators.Merge.deleteMatch(c.filter("c_custkey % 2 = 0"),
        c.filter("c_custkey % 3 = 0"), Seq("c_custkey"))
    }),
    "q_detect_deletes" -> ((s, d) => {
      val c = t(s, d, "customer")
      val deleted = operators.DeleteDetection.detectSnapshotDiff(
        c, c.filter("c_custkey % 7 <> 0"), Seq("c_custkey"))
      operators.DeleteDetection.applySoft(c, deleted, Seq("c_custkey"),
        deletedAt = lit("2026-02-01 00:00:00"))
    }),

    // ---- patterns (SURVEY §2.7) ----
    "q_dimension" -> ((s, d) =>
      graft.patterns.Patterns.dimension(
        t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        Seq("c_custkey"), "sk")),
    "q_fact" -> ((s, d) => {
      val dim = t(s, d, "customer").filter("c_custkey % 5 <> 0")
        .select(col("c_custkey").as("sk"), col("c_custkey").as("nk"))
      graft.patterns.Patterns.fact(t(s, d, "orders"),
        Seq(graft.patterns.Patterns.DimLookup(dim, Seq("o_custkey"), Seq("nk"), "sk", "cust_sk")),
        measures = Seq("net" -> "o_totalprice * 0.9"))
    }),
    "q_date_dimension" -> ((s, d) =>
      graft.patterns.Patterns.dateDimension(s, "2024-01-01", "2024-12-31")
        .select("date", "date_sk", "year", "quarter", "month", "day",
          "is_weekend", "fiscal_year", "fiscal_quarter")
        .withColumn("date", col("date").cast("timestamp"))),
    "q_aggregation_pattern" -> ((s, d) =>
      graft.patterns.Patterns.aggregation(t(s, d, "lineitem"), Seq("l_returnflag"),
        Seq("total_qty" -> "sum(l_quantity)", "n" -> "count(*)"),
        having = Some("total_qty > 0"))),

    // ---- validation / quarantine (SURVEY §2.8) ----
    "q_quarantine" -> ((s, d) => {
      import graft.validation.Validation
      val tests = Seq(
        Validation.Test("qty_range", "range", Validation.Quarantine,
          columns = Seq("l_quantity"), min = Some(1), max = Some(45)),
        Validation.Test("disc_max", "custom_sql", Validation.Quarantine,
          sql = Some("l_discount <= 0.08")))
      val (_, invalid) = Validation.quarantineSplit(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
        tests, rejectedAt = lit("2026-01-01 00:00:00"))
      invalid
    }),
    "q_fk_orphans" -> ((s, d) =>
      graft.validation.Validation.fkOrphans(t(s, d, "orders"), Seq("o_custkey"),
        t(s, d, "customer").filter("c_custkey % 5 <> 0"), Seq("c_custkey"))),

    // ---- semantic layer (SURVEY §2.9) ----
    "q_semantic" -> ((s, d) => {
      import graft.semantics.Semantics._
      val model = semanticModel
      run(s, model, "revenue, n_orders BY status", Map("orders" -> t(s, d, "orders")))
    }),
    "q_semantic_derived" -> ((s, d) => {
      import graft.semantics.Semantics._
      run(s, semanticModel, "avg_value BY month WHERE o_orderstatus = 'F'",
        Map("orders" -> t(s, d, "orders")))
    }),

    // ---- incremental / HWM (SURVEY §2.1 incremental read) ----
    "q_hwm_filter" -> ((s, d) =>
      operators.Incremental.hwmFilter(
        events(s, d).select("event_id", "user_id", "ts"),
        "ts", Some("2024-01-03 00:00:00"), watermarkLagSeconds = 3600)
        .select("event_id", "user_id")),

    "q_harmonize_schema" -> ((s, d) =>
      graft.sources.Sources.harmonizeSchema(
        t(s, d, "customer"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, missing_col STRING"))),

    // ---- domain ops (SURVEY §2.6) ----
    "q_unit_convert" -> ((s, d) =>
      operators.Domain.unitConvert(
        operators.Domain.unitConvert(
          t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), (col("l_discount") * 100).as("t_c")),
          "l_quantity", "kg", "lb", Some("qty_lb")),
        "t_c", "C", "F", Some("t_f")).drop("t_c")
        .withColumn("t_f", round(col("t_f"), 6))),
    "q_phases" -> ((s, d) =>
      operators.Domain.phaseSummary(events(s, d), "user_id", "event_type", "ts",
        Seq(col("ts"), col("event_id")),
        // Integer-scaled sum: bigint sums are order-independent and exact,
        // so the /100.0 at the end is bit-identical across engines (FP sums
        // + round() are not — see the oracle notes at the top of this file).
        // double-cast the divisor: Spark parses a bare 100.0 literal as
        // DECIMAL and decimal outputs break the pandas-based compare
        metrics = Seq("total_value" -> "sum(cast(floor(value * 100) as bigint)) / cast(100 as double)"))),
    "q_psychrometrics" -> ((s, d) => // derived cols rounded: exp/log libm ulps
      Seq("p_sat", "humidity_ratio", "dew_point", "enthalpy").foldLeft(
        operators.Domain.psychrometrics(
          t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").as("t_c"), (col("l_discount") * 5 + 0.3).as("rh")),
          "t_c", "rh")) { (df, c) => df.withColumn(c, round(col(c), 4)) }),
    "q_saturation" -> ((s, d) => { // saturation_properties + fluid_properties
      val base = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("t_c"), lit(101325.0).as("p_pa"))
      val sat = operators.Domain.saturationProperties(base, Some("t_c"), None)
      val rt = operators.Domain.saturationProperties(sat, None, Some("psat_pa"), "rt")
      // density via the explicit ideal-gas opt-in (the PR real-gas path has
      // its own full oracle in q_fluid_props_air)
      operators.Domain.fluidProperties(rt, "p_pa", "t_c", fluid = "Air",
          assumeIdealGas = true)
        .withColumn("psat_pa", round(col("psat_pa"), 4))
        .withColumn("rt_tsat_c", round(col("rt_tsat_c"), 4))
        .withColumn("density", round(col("density"), 6))
    }),
    "q_dedup_report" -> ((s, d) =>
      operators.Dedup.dedupReport(
        t(s, d, "documents").select("doc_id", "text"), "doc_id", "text")),
    "q_skew_report" -> ((s, d) =>
      operators.Skew.skewReport(events(s, d), Seq("event_type", "user_id"), topK = 3)),
    "q_canonical_url" -> ((s, d) => {
      // both engines synthesize the same url variants, then canonicalize
      // independently — the oracle mirrors the documented normal form
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("https://WWW.Example.com:443/Products/"),
            col("doc_id") % 7, lit("/?utm_source=news&b=2&a=1#frag")))
        .when(col("doc_id") % 4 === 1,
          lit("http://user:pw@Example.COM:80?gclid=abc&z=9"))
        .when(col("doc_id") % 4 === 2, lit("https://site.org/a/b"))
        .otherwise(concat(lit("not a url at all "), col("doc_id")))
      t(s, d, "documents").select(col("doc_id"), url.as("url"))
        .withColumn("canonical", TextAnalysis.canonicalizeUrl(col("url")))
    }),
    "q_theta_distinct" -> ((s, d) => {
      // theta sketches are EXACT (and deterministic) while the distinct
      // count stays under nominal 2^lgK, so the estimates hash-match an
      // exact COUNT(DISTINCT) oracle: per-segment counts + the cross-
      // segment union — the set-algebra shape HLL cannot oracle
      val sk = operators.Sketches.thetaSketch(
        events(s, d).select("event_type", "user_id"),
        Seq("event_type"), "user_id", lgK = 14)
      val per = sk.select(col("event_type"),
        operators.Sketches.thetaEstimate(col("theta_sketch"))
          .cast("long").as("n_users"))
      val all = operators.Sketches.thetaMerge(
        sk.withColumn("event_type", lit("ALL")), Seq("event_type"),
        "theta_sketch", lgK = 14)
        .select(col("event_type"),
          operators.Sketches.thetaEstimate(col("theta_sketch"))
            .cast("long").as("n_users"))
      per.unionByName(all)
    }),
    "q_html_text" -> ((s, d) => {
      // the corpus wrapped in a fixed HTML template drives the full
      // state machine (title block, dropped script, entities-free body);
      // the oracle reconstructs the exact expected text with string ops
      val html = concat(lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><script>var x = '<p>no</p>';</script></head><body><p>  "),
        col("text"), lit("  </p></body></html>"))
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.htmlToText(html).as("text_out"))
    }),
    "q_wet_bulb" -> ((s, d) =>
      // Stull's wet-bulb regression over valid (T, RH) ranges; rounded 4
      // places (atan/sqrt libm calls match across engines like exp/ln do)
      operators.Domain.psychrometrics(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("t_c"), (col("l_discount") * 5 + 0.3).as("rh")),
        "t_c", "rh", wetBulbCol = true)
        .select(col("l_orderkey"), col("l_linenumber"), col("t_c"), col("rh"),
          round(col("wet_bulb"), 4).as("wet_bulb"))),
    "q_if97_sat" -> ((s, d) => {
      // IAPWS-IF97 region-4 saturation line, both directions, as pure
      // Column algebra. The equation needs only +,-,*,/ and sqrt — all
      // IEEE-754 correctly rounded — so the DuckDB mirror with the same
      // association order is BIT-identical (no rounding in this oracle).
      val base = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * lit(7.0) + lit(280.0)).as("t_k"),   // 287..630 K
        (col("l_extendedprice") * lit(10.0)).as("p_pa"))         // ~9 kPa..1 MPa
      base.withColumn("psat_pa", operators.If97.psatColumn(col("t_k")))
        .withColumn("tsat_k", operators.If97.tsatColumn(col("p_pa")))
    }),
    "q_if97_props" -> ((s, d) =>
      // full IF97 property dispatch (regions 1/2/3/5 + out-of-range nulls)
      // through the native codegen'd expression; no SQL oracle — the math
      // is gated by If97Spec against the standard's own 9-sig-fig tables
      operators.Domain.steamProperties(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") * lit(40.0) + lit(273.15)).as("t_k"), // 313..2273 K
          (col("l_extendedprice") * lit(500.0)).as("p_pa")),       // ~0.5..50 MPa
        "t_k", "p_pa")),
    "q_saturated_steam" -> ((s, d) =>
      // two-phase bundle over the full pressure line; no SQL oracle (the
      // region-1/2 Gibbs sums are IF97Spec-gated against the standard's
      // tables) — deterministic per-row floats, frozen in GoldenSpec
      operators.Domain.saturatedSteam(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * lit(200.0)).as("p_pa"),   // ~0.18..20 MPa
          (col("l_discount") * lit(10.0)).as("x")),           // 0..1
        "p_pa", "Pa", qualityCol = Some("x"))),
    "q_fluid_props_air" -> ((s, d) => {
      // Peng-Robinson air over gas states (T >> Tc). The oracle re-derives
      // the FULL two-branch Cardano solve + fugacity pick + departure
      // functions in DuckDB SQL with the same constants and association
      // order; outputs rounded (acos/cos/ln/pow libm ulps)
      val f = operators.CubicEos.lookup("air").get
      val base = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + lit(250.0)).as("t_k"),       // 251..300 K
        (col("l_extendedprice") * lit(50.0)).as("p_pa"))  // ~45 kPa..5 MPa
      base.withColumn("_pr", operators.CubicEos.props(f, col("t_k"), col("p_pa")))
        .select(col("l_orderkey"), col("l_linenumber"), col("t_k"), col("p_pa"),
          round(col("_pr.z"), 6).as("z"),
          round(col("_pr.density"), 4).as("density"),
          round(col("_pr.h"), 4).as("h"),
          round(col("_pr.s"), 5).as("s"),
          col("_pr.phase").as("phase"))
    }),
    "q_fluid_props_r134a" -> ((s, d) => {
      // the SUBCRITICAL branch: T spans 281-330 K (< Tc) and P crosses the
      // R134a saturation line, so the oracle must reproduce the
      // three-real-root trig solve AND the fugacity-stable liquid/vapor
      // pick per row. No row sits within float noise of the line (p is a
      // discrete price multiple; the pick margin is >= 1e-6 relative)
      val f = operators.CubicEos.lookup("r134a").get
      val base = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + lit(280.0)).as("t_k"),       // 281..330 K
        (col("l_extendedprice") * lit(30.0)).as("p_pa"))  // ~27 kPa..3.1 MPa
      base.withColumn("_pr", operators.CubicEos.props(f, col("t_k"), col("p_pa")))
        .select(col("l_orderkey"), col("l_linenumber"), col("t_k"), col("p_pa"),
          round(col("_pr.z"), 6).as("z"),
          round(col("_pr.density"), 4).as("density"),
          round(col("_pr.h"), 4).as("h"),
          round(col("_pr.s"), 5).as("s"),
          col("_pr.phase").as("phase"))
    }),
    "q_stream_window" -> ((s, d) =>
      // tumbling-window aggregation (the window_agg step) on a batch frame:
      // withWatermark is a no-op in batch, window() buckets identically to
      // the streaming path — oracle = hour-trunc GROUP BY
      graft.streaming.Streaming.windowedAgg(events(s, d), "ts", "10 seconds",
        "1 hour", None, Seq("event_type"), Seq("n" -> "count(*)"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))),
    "q_avro_roundtrip" -> ((s, d) => {
      // the native avro path end-to-end (no spark-avro jar in this env):
      // parquet → container-file write → byte-range-split read → aggregate.
      // The oracle aggregates the ORIGINAL parquet, so a hash match
      // certifies the container encode/decode, not just this plan.
      val tmp = java.nio.file.Files.createTempDirectory("graft_avro_q").toString
      graft.sources.AvroSource.write(
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        s"$tmp/orders_avro")
      graft.sources.AvroSource.read(s, s"$tmp/orders_avro", maxSplitBytes = 256 * 1024)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_chunk_text" -> ((s, d) =>
      TextAnalysis.chunkText(t(s, d, "documents"), "doc_id", "text",
        chunkTokens = 64, overlapTokens = 16)),
    "q_warc_roundtrip" -> ((s, d) => {
      // the native WARC/WET path end-to-end: documents → one-gzip-member-
      // per-record WET files → streamed parse → aggregate. The oracle
      // aggregates the ORIGINAL parquet, so a hash match certifies the
      // record framing + payload byte fidelity, not just this plan.
      val tmp = java.nio.file.Files.createTempDirectory("graft_warc_q").toString
      val docs = t(s, d, "documents").select(
        concat(lit("https://corpus.example/"), col("doc_id")).as("target_uri"),
        col("text").as("content"))
      graft.sources.WarcSource.write(docs, s"$tmp/docs_wet")
      graft.sources.WarcSource.read(s, s"$tmp/docs_wet")
        .agg(count(lit(1)).as("n"),
          sum(length(decode(col("content"), "UTF-8"))).as("chars"),
          sum(col("content_length")).as("bytes"),
          min("target_uri").as("min_uri"), max("target_uri").as("max_uri"))
    }),
    "q_delta_timetravel" -> ((s, d) => {
      // the native Delta transaction-log reader end-to-end: build a real
      // _delta_log (v0 = two files, v1 = remove+add rewrite deleting the
      // n_regionkey=0 rows of file B), then time-travel both versions.
      // The oracle recomputes both snapshots from the ORIGINAL parquet, so
      // a hash match certifies the log replay, not just this plan.
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def q(x: String) = mapper.writeValueAsString(x)
      val nation = t(s, d, "nation")
      val tmp = java.nio.file.Files.createTempDirectory("graft_delta_q").toString
      def dataFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val staging = java.nio.file.Files.createTempDirectory("graft_delta_s").toString
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
        java.nio.file.Files.copy(part.toPath, new java.io.File(tmp, name).toPath)
        ()
      }
      def add(p: String) =
        s"""{"add":{"path":${q(p)},"partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
      def commit(v: Long, lines: Seq[String]): Unit = {
        val dir = new java.io.File(tmp, "_delta_log"); dir.mkdirs()
        java.nio.file.Files.write(new java.io.File(dir, f"$v%020d.json").toPath,
          lines.mkString("\n").getBytes("UTF-8"))
        ()
      }
      dataFile(nation.filter(col("n_nationkey") % 2 === 0), "fileA.parquet")
      dataFile(nation.filter(col("n_nationkey") % 2 =!= 0), "fileB.parquet")
      dataFile(nation.filter(col("n_nationkey") % 2 =!= 0 && col("n_regionkey") =!= 0),
        "fileB2.parquet")
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"nation","format":{"provider":"parquet","options":{}},"schemaString":${q(nation.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
        add("fileA.parquet"), add("fileB.parquet")))
      commit(1, Seq(
        """{"remove":{"path":"fileB.parquet","deletionTimestamp":2,"dataChange":true}}""",
        add("fileB2.parquet")))
      val v0 = graft.sources.DeltaLog.read(s, tmp, versionAsOf = Some(0L))
      val v1 = graft.sources.DeltaLog.read(s, tmp)
      v0.withColumn("ver", lit(0)).unionByName(v1.withColumn("ver", lit(1)))
        .select("n_nationkey", "n_name", "n_regionkey", "ver")
    }),
    "q_delta_roundtrip" -> ((s, d) => {
      // the native Delta WRITER end-to-end: two partitioned append commits
      // plus an overwrite through the commit protocol (staged parquet →
      // rename, add/remove actions, hive partition values), then
      // time-travel reads through the native log reader. The oracle
      // recomputes both snapshots from the ORIGINAL parquet, so a hash
      // match certifies the protocol round-trip, not just this plan.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_delta_w")
        .toString + "/orders"
      graft.sources.DeltaWriter.write(orders.filter(col("o_orderkey") % 3 === 0),
        root, mode = "append", partitionBy = Seq("o_orderstatus"))
      graft.sources.DeltaWriter.write(orders.filter(col("o_orderkey") % 3 === 1),
        root, mode = "append")
      graft.sources.DeltaWriter.write(orders.filter(col("o_totalprice") > 150000),
        root, mode = "overwrite", partitionBy = Seq("o_orderstatus"))
      val v1 = graft.sources.DeltaLog.read(s, root, versionAsOf = Some(1L))
        .withColumn("ver", lit(1))
      val v2 = graft.sources.DeltaLog.read(s, root).withColumn("ver", lit(2))
      v1.unionByName(v2).groupBy("ver", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_partition_prune" -> ((s, d) => {
      // identity-partitioned Iceberg commit + partition-pruned read: the
      // spec is written into metadata (field-id 1000), per-file partition
      // tuples into the manifest, bound summaries into the manifest list,
      // and the read keeps only the o_orderstatus='F' files BEFORE the
      // scan. The oracle filters the ORIGINAL parquet, so a hash match
      // certifies the pruned read returns exactly the partition's rows.
      val tmp = java.nio.file.Files.createTempDirectory("graft_icep_q").toString
      // coalesce before a partitioned commit: every task writes one file
      // per partition value, so 32 tasks x 3 statuses would mean ~100
      // tiny files — the write-side discipline any partitioned lakehouse
      // load needs
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .coalesce(4)
      graft.sources.IcebergSource.write(orders, s"$tmp/t", "append",
        partitionBy = Seq("o_orderstatus"))
      graft.sources.IcebergSource.read(s, s"$tmp/t",
          partitionFilter = Seq(graft.sources.IcebergSource
            .PartitionPredicate("o_orderstatus", "=", "F")))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_optimize" -> ((s, d) => {
      // bin-pack maintenance over the native iceberg writer on a
      // PARTITIONED layout: three small append commits into an
      // o_orderstatus-partitioned spec, optimize into a replace snapshot
      // (compaction stays within partitions), then read back — with a
      // pruned-read guard proving the tuples survived the rewrite. The
      // oracle recomputes from the ORIGINAL parquet, so a hash match
      // certifies the rewrite moved bytes, not rows.
      val tmp = java.nio.file.Files.createTempDirectory("graft_ice_o").toString
      val root = s"$tmp/orders"
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      (0 until 3).foreach { i =>
        graft.sources.IcebergSource.write(
          orders.filter(col("o_orderkey") % 3 === i).coalesce(4), root, "append",
          partitionBy = Seq("o_orderstatus"))
      }
      val res = graft.sources.IcebergMaintenance.optimize(s, root)
      require(res.snapshotId.nonEmpty && res.filesAdded < res.filesRemoved,
        s"iceberg optimize did not compact: $res")
      // historical-metadata retention: 4 commits → v1..v4; keep the
      // newest 2 and the table must stay fully readable (snapshot
      // history lives in the CURRENT metadata, not the retired files)
      val gone = graft.sources.IcebergMaintenance.cleanupMetadata(s, root,
        keepLast = 2)
      require(gone.size == 2, s"metadata GC should retire v1/v2, got $gone")
      val all = graft.sources.IcebergSource.read(s, root)
      val pruned = graft.sources.IcebergSource.read(s, root, partitionFilter =
        Seq(graft.sources.IcebergSource.PartitionPredicate("o_orderstatus", "=", "O")))
      require(pruned.inputFiles.length < all.inputFiles.length,
        "partition pruning lost after optimize")
      all.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_eq_delete" -> ((s, d) => {
      // EQUALITY-delete end-to-end (the CDC shape: delete by key with NO
      // table scan): a v2 table, one content=2 equality-delete snapshot,
      // then an append RE-INSERTING a subset of the deleted keys — which
      // must SURVIVE (equality deletes bind only to data sequences
      // strictly below their own) — then a merge-on-read optimize that
      // lifts the deletes into rewritten files. The oracle recomputes
      // the surviving set from the ORIGINAL parquet, so a hash match
      // certifies sequence-aware equality semantics through compaction.
      val c = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_eqd")
        .toString + "/customer"
      graft.sources.IcebergSource.write(c.repartition(2), root)
      val res = graft.sources.IcebergSource.deleteKeys(s, root,
        c.filter("c_custkey % 10 = 0").select("c_custkey"), Seq("c_custkey"))
      require(res.deletedRows > 0, s"equality delete wrote no keys: $res")
      graft.sources.IcebergSource.write(
        c.filter("c_custkey % 100 = 0").withColumn("c_mktsegment", lit("REBORN")),
        root, mode = "append")
      val opt = graft.sources.IcebergMaintenance.optimize(s, root,
        targetFileBytes = 512L << 20)
      require(opt.snapshotId.nonEmpty, s"MOR optimize did not run: $opt")
      graft.sources.IcebergSource.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_iceberg_delete" -> ((s, d) => {
      // position-delete DELETE + merge-on-read compaction end-to-end:
      // a partitioned v2 table, two stacked delete snapshots (content=1
      // manifests, no data file rewritten), then optimize — which must
      // apply the deletes during the rewrite (the purge) without
      // resurrecting rows. Output = the post-everything read plus a
      // time-travel read of the pre-delete snapshot; the oracle
      // recomputes both from the ORIGINAL parquet, so a hash match
      // certifies sequence-aware delete application AND the MOR rewrite.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_del")
        .toString + "/orders"
      // repartition (not coalesce): the sf0.001 source is a single
      // parquet split, and the MOR-compaction leg needs >= 2 small files
      // per partition to have real work — 2 is that minimum
      graft.sources.IcebergSource.write(orders.repartition(2), root,
        partitionBy = Seq("o_orderstatus"))
      val v0 = graft.sources.IcebergSource.snapshots(s, root).head.snapshotId
      val r1 = graft.sources.IcebergSource.delete(s, root,
        "o_totalprice > 180000")
      val r2 = graft.sources.IcebergSource.delete(s, root,
        "o_orderstatus = 'F' AND o_orderkey % 7 = 0")
      require(r1.deletedRows > 0 && r2.deletedRows > 0,
        s"iceberg deletes matched nothing: $r1 / $r2")
      val opt = graft.sources.IcebergMaintenance.optimize(s, root)
      require(opt.snapshotId.nonEmpty, s"MOR optimize did not run: $opt")
      val live = graft.sources.IcebergSource.read(s, root)
        .withColumn("state", lit("live"))
      val initial = graft.sources.IcebergSource.read(s, root,
          snapshotId = Some(v0))
        .withColumn("state", lit("initial"))
      live.unionByName(initial)
        .groupBy("state", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_roundtrip" -> ((s, d) => {
      // the native Iceberg path end-to-end: two append commits through
      // real metadata/manifest-list/manifest files, then a current read
      // and a snapshot time-travel read. The oracle recomputes both
      // snapshots from the ORIGINAL parquet, so a hash match certifies
      // the spec round-trip (avro manifests included), not just the plan.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_iceberg_q")
        .toString + "/orders"
      graft.sources.IcebergSource.write(
        orders.filter(col("o_orderkey") % 3 === 0), root, "append")
      graft.sources.IcebergSource.write(
        orders.filter(col("o_orderkey") % 3 === 1), root, "append")
      val firstSnap = graft.sources.IcebergSource.snapshots(s, root).head
      val v1 = graft.sources.IcebergSource.read(s, root,
        snapshotId = Some(firstSnap.snapshotId)).withColumn("ver", lit(1))
      val v2 = graft.sources.IcebergSource.read(s, root).withColumn("ver", lit(2))
      v1.unionByName(v2).groupBy("ver", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_changes" -> ((s, d) => {
      // the Iceberg incremental read end-to-end: two appends + an
      // overwrite, then snapshot-diff change rows per commit ordinal.
      // Oracle recomputes the same change classes from the original
      // parquet (overwrite = delete everything prior + insert the new set).
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_iceberg_c")
        .toString + "/orders"
      graft.sources.IcebergSource.write(
        orders.filter(col("o_orderkey") % 3 === 0), root, "append")
      graft.sources.IcebergSource.write(
        orders.filter(col("o_orderkey") % 3 === 1), root, "append")
      graft.sources.IcebergSource.write(
        orders.filter(col("o_totalprice") > 150000), root, "overwrite")
      graft.sources.IcebergSource.changes(s, root)
        .withColumn("ver", col("_change_ordinal"))
        .withColumn("change_type", col("_change_type"))
        .groupBy("ver", "change_type")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_delta_changes" -> ((s, d) => {
      // the change data feed end-to-end: two appends + an overwrite
      // through the native commit protocol, then DeltaLog.changes derives
      // insert/delete rows per commit (the overwrite's removes become
      // deletes of everything prior). The oracle recomputes the exact
      // same change classes from the ORIGINAL parquet.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_delta_c")
        .toString + "/orders"
      graft.sources.DeltaWriter.write(orders.filter(col("o_orderkey") % 3 === 0),
        root, mode = "append", partitionBy = Seq("o_orderstatus"))
      graft.sources.DeltaWriter.write(orders.filter(col("o_orderkey") % 3 === 1),
        root, mode = "append")
      graft.sources.DeltaWriter.write(orders.filter(col("o_totalprice") > 150000),
        root, mode = "overwrite", partitionBy = Seq("o_orderstatus"))
      graft.sources.DeltaLog.changes(s, root, 0L)
        .withColumn("ver", col("_commit_version").cast("int"))
        .withColumn("change_type", col("_change_type"))
        .groupBy("ver", "change_type")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_delta_dv_delete" -> ((s, d) => {
      // deletion-vector DELETE end-to-end: a partitioned table, then two
      // DV deletes — the second lands on already-vectored files, so the
      // bitmaps MERGE — with no data file rewritten (the commit moves
      // kilobytes of RoaringBitmaps, the 100 TB posture for sub-percent
      // deletes). Output = the DV-applying read ("live") plus the CDF
      // delete attribution per delete commit; the oracle recomputes all
      // three classes from the ORIGINAL parquet, so a hash match
      // certifies bitmap semantics, merge behavior AND cdc attribution.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_delta_dv")
        .toString + "/orders"
      // coalesce(2): 6 files total — enough for per-file vectors and
      // second-delete merges without 24-file write amplification
      graft.sources.DeltaWriter.write(orders.coalesce(2), root,
        partitionBy = Seq("o_orderstatus"))
      val r1 = graft.sources.DeltaDvWriter.delete(s, root,
        "o_totalprice > 180000")
      val r2 = graft.sources.DeltaDvWriter.delete(s, root,
        "o_orderstatus = 'F' AND o_orderkey % 7 = 0")
      require(r1.deletedRows > 0 && r2.deletedRows > 0,
        s"DV deletes matched nothing: $r1 / $r2")
      val live = graft.sources.DeltaLog.read(s, root)
        .withColumn("change_type", lit("live"))
        .select("change_type", "o_orderkey", "o_orderstatus", "o_totalprice")
      val dels = graft.sources.DeltaLog.changes(s, root, 1L)
        .filter(col("_change_type") === "delete")
        .withColumn("change_type",
          concat(lit("del_v"), col("_commit_version").cast("int")))
        .select("change_type", "o_orderkey", "o_orderstatus", "o_totalprice")
      live.unionByName(dels)
        .groupBy("change_type", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_iceberg_rename" -> ((s, d) => {
      // metadata-only column RENAME with alias-resolved reads: half the
      // rows land under the ORIGINAL name, the column renames (same
      // field id, zero files rewritten), the other half appends under
      // the NEW name — one read then serves a coherent renamed schema
      // across both file generations. The oracle recomputes from the
      // original parquet, so a hash match certifies the historical-alias
      // resolution end-to-end.
      val c = t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_ren")
        .toString + "/customer"
      graft.sources.IcebergSource.write(
        c.filter("c_custkey % 2 = 0").repartition(2), root)
      graft.sources.IcebergMaintenance.renameColumn(s, root,
        "c_acctbal", "balance")
      graft.sources.IcebergSource.write(
        c.filter("c_custkey % 2 = 1").withColumnRenamed("c_acctbal", "balance"),
        root, mode = "append")
      val df = graft.sources.IcebergSource.read(s, root)
      require(df.columns.contains("balance") && !df.columns.contains("c_acctbal"),
        s"rename did not take: ${df.columns.mkString(",")}")
      df.withColumn("gen", col("c_custkey") % 2)
        .groupBy("gen")
        .agg(count(lit(1)).as("n"), round(sum("balance"), 2).as("total_balance"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_iceberg_nested_rename" -> ((s, d) => {
      // NESTED (struct-member) metadata-only RENAME: half the rows land
      // with the member under its ORIGINAL name, `info.fin.acct` renames
      // to `balance` (same field id, zero files rewritten), the other
      // half appends under the NEW member name — one read serves a
      // coherent schema across both generations via member-level alias
      // coalescing. The oracle recomputes from the original parquet, so
      // a hash match certifies the nested alias resolution end-to-end.
      val c = t(s, d, "customer").select(col("c_custkey"),
        struct(col("c_name").as("name"),
          struct(col("c_acctbal").as("acct"),
            col("c_nationkey").as("nat")).as("fin")).as("info"))
      val root = java.nio.file.Files.createTempDirectory("graft_ice_nren")
        .toString + "/customer"
      graft.sources.IcebergSource.write(
        c.filter("c_custkey % 2 = 0").repartition(2), root)
      graft.sources.IcebergMaintenance.renameColumn(s, root,
        "info.fin.acct", "balance")
      graft.sources.IcebergSource.write(
        c.filter("c_custkey % 2 = 1").withColumn("info",
          col("info").withField("fin",
            struct(col("info.fin.acct").as("balance"), col("info.fin.nat")))),
        root, mode = "append")
      val df = graft.sources.IcebergSource.read(s, root)
      df.withColumn("gen", col("c_custkey") % 2)
        .groupBy("gen")
        .agg(count(lit(1)).as("n"),
          round(sum("info.fin.balance"), 2).as("total_balance"),
          sum("info.fin.nat").as("total_nat"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_delta_nested_rename" -> ((s, d) => {
      // the Delta counterpart: a column-mapped table renames a struct
      // member by dot path — the member keeps its mapping id and nested
      // PHYSICAL name, so files of both generations resolve it without
      // any aliasing. Oracle recomputes from the original parquet.
      val c = t(s, d, "customer").select(col("c_custkey"),
        struct(col("c_name").as("name"),
          struct(col("c_acctbal").as("acct"),
            col("c_nationkey").as("nat")).as("fin")).as("info"))
      val root = java.nio.file.Files.createTempDirectory("graft_dl_nren")
        .toString + "/customer"
      graft.sources.DeltaWriter.write(
        c.filter("c_custkey % 2 = 0").repartition(2), root,
        columnMapping = true)
      graft.sources.DeltaWriter.renameColumn(s, root, "info.fin.acct",
        "balance")
      graft.sources.DeltaWriter.write(
        c.filter("c_custkey % 2 = 1").withColumn("info",
          col("info").withField("fin",
            struct(col("info.fin.acct").as("balance"), col("info.fin.nat")))),
        root, mode = "append")
      val df = graft.sources.DeltaLog.read(s, root)
      df.withColumn("gen", col("c_custkey") % 2)
        .groupBy("gen")
        .agg(count(lit(1)).as("n"),
          round(sum("info.fin.balance"), 2).as("total_balance"),
          sum("info.fin.nat").as("total_nat"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_delta_restore" -> ((s, d) => {
      // RESTORE as a pure metadata commit: rewind past a DV delete AND a
      // schema-evolving merge — the read-back must hash-match the
      // ORIGINAL rows exactly (deletion vectors narrowed away, the
      // evolved column dropped with the restored metaData).
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_restore")
        .toString + "/customer"
      graft.sources.DeltaWriter.write(c.coalesce(2), root)                // v0
      val del = graft.sources.DeltaDvWriter.delete(s, root,
        "c_custkey % 5 = 0", cdf = false)                                 // v1
      graft.sources.DeltaMerge.upsert(s, root,
        c.filter("c_custkey % 3 = 0").withColumn("c_extra", lit(1L)),
        Seq("c_custkey"), cdf = false,
        schemaPolicy = graft.sources.DeltaSchema.Evolve)                  // v2
      require(del.deletedRows > 0, "restore fixture: DV delete matched nothing")
      val res = graft.sources.DeltaMaintenance.restore(s, root, 0L)
      require(res.restoredToVersion == 0L && res.filesAdded > 0, s"$res")
      graft.sources.DeltaLog.read(s, root)
    }),
    "q_iceberg_rollback" -> ((s, d) => {
      // rollback-to-snapshot: ONE metadata commit moving the current
      // pointer — the read-back equals the first snapshot exactly.
      val c = t(s, d, "customer")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_rb")
        .toString + "/customer"
      graft.sources.IcebergSource.write(c.filter("c_custkey % 2 = 0"), root)
      graft.sources.IcebergSource.write(c.filter("c_custkey % 2 = 1"), root)
      val snaps = graft.sources.IcebergSource.snapshots(s, root)
      require(snaps.size == 2, s"rollback fixture: ${snaps.size} snapshots")
      graft.sources.IcebergMaintenance.rollback(s, root, snaps.head.snapshotId)
      graft.sources.IcebergSource.read(s, root)
    }),
    "q_delta_skipping" -> ((s, d) => {
      // stats-based data skipping end-to-end: lineitem lands as a Delta
      // table range-clustered on l_orderkey (16 files with footer-derived
      // min/max stats in their add actions), then a range read arrives as
      // a dataFilter. The prune must drop most files BEFORE the scan
      // plans (asserted via DeltaStats.prune — this is what makes ZORDER
      // pay off at 100 TB), and the result must hash-match DuckDB
      // filtering the ORIGINAL parquet: skipping may never change rows.
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val root = java.nio.file.Files.createTempDirectory("graft_delta_skip")
        .toString + "/lineitem"
      graft.sources.DeltaWriter.write(
        li.repartitionByRange(16, col("l_orderkey")), root)
      val snap = graft.sources.DeltaLog.snapshot(s, root)
      val pred = col("l_orderkey") >= 1000L && col("l_orderkey") < 2000L
      val pr = graft.sources.DeltaStats.prune(s, snap, pred)
      require(pr.skipped > 0 && pr.kept < pr.candidates,
        s"stats skipping pruned nothing: kept ${pr.kept}/${pr.candidates}")
      graft.sources.DeltaLog.read(s, root, dataFilter = Some(pred))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("revenue"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    }),
    "q_iceberg_skipping" -> ((s, d) => {
      // Iceberg column-bound file skipping end-to-end: lineitem lands as
      // an Iceberg table range-clustered on l_orderkey (manifest entries
      // carry lower/upper_bounds per field id), a range read arrives as a
      // dataFilter, the prune must drop files at the MANIFEST level
      // (asserted via pruneReport), and the result must hash-match DuckDB
      // filtering the ORIGINAL parquet.
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_skip")
        .toString + "/lineitem"
      graft.sources.IcebergSource.write(
        li.repartitionByRange(16, col("l_orderkey")), root)
      val pred = col("l_orderkey") >= 1000L && col("l_orderkey") < 2000L
      val pr = graft.sources.IcebergSource.pruneReport(s, root, pred)
      require(pr.skipped > 0 && pr.kept < pr.candidates,
        s"iceberg bound skipping pruned nothing: kept ${pr.kept}/${pr.candidates}")
      graft.sources.IcebergSource.read(s, root, dataFilter = Some(pred))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("revenue"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    }),
    "q_iceberg_hidden_partition" -> ((s, d) => {
      // Iceberg HIDDEN PARTITIONING end-to-end: lineitem commits under a
      // month(l_shipdate) transform spec (no materialized month column —
      // the transform computes in codegen at write), then a SOURCE-column
      // date-range predicate projects onto the partition spec
      // (projectPredicate's inclusive projection), prunes partitions at
      // the metadata level, and the re-applied row filter keeps the
      // answer exact — hash-matched against DuckDB on the original rows.
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity",
          "l_extendedprice")
      val root = java.nio.file.Files.createTempDirectory("graft_ice_hidden")
        .toString + "/lineitem"
      // cluster by the TRANSFORMED partition value first (the
      // optimized-write discipline): unclustered tasks would each write
      // every month — thousands of tiny files instead of ~one per month.
      // clusterWrite hash-routes rows by month(l_shipdate) inside the
      // writer — same one-file-per-month layout as pre-range-clustering
      // the frame, without RangePartitioner's sampling pass over the input
      graft.sources.IcebergSource.write(li, root,
        partitionBy = Seq("month(l_shipdate)"), clusterWrite = true)
      val meta = graft.sources.IcebergSource.tableMeta(s, root)
      require(meta.partitionSpec.map(_.transform) == Seq("month"),
        s"expected a month transform spec, got ${meta.partitionSpec}")
      // DECLARATIVE path: the YAML-shaped read's `filter` option alone
      // derives the inclusive month-partition projection internally
      // (conjunct atoms → projectPredicate) — no programmatic
      // partitionFilter; the require proves the projection fired
      val where = "l_shipdate >= DATE'1995-01-01' AND l_shipdate < DATE'1996-01-01'"
      val derived = graft.sources.IcebergSource.derivedPartitionPredicates(
        s, root, expr(where))
      require(derived.size == 2 && derived.forall(_.name == "l_shipdate_month"),
        s"declarative projection produced $derived")
      graft.sources.Sources.read(s, graft.sources.Sources.ReadConfig(
          "iceberg", path = Some(root), options = Map("filter" -> where)))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("revenue"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    }),
    "q_delta_optimize" -> ((s, d) => {
      // OPTIMIZE over the native writer: three small append commits, a
      // bin-pack compaction (remove+add, dataChange=false), then a
      // Z-order re-cluster — the read-back after BOTH maintenance
      // commits must still hash-match the oracle recomputing from the
      // ORIGINAL parquet, certifying the rewrites moved bytes, not rows.
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val root = java.nio.file.Files.createTempDirectory("graft_delta_o")
        .toString + "/orders"
      // coalesce(8): 24 small files across the three appends still gives
      // the compactor real work without 3x96-file write amplification
      (0 until 3).foreach { i =>
        graft.sources.DeltaWriter.write(
          orders.filter(col("o_orderkey") % 3 === i).coalesce(8),
          root, mode = "append")
      }
      val res = graft.sources.DeltaMaintenance.optimize(s, root)
      require(res.version.nonEmpty && res.filesAdded < res.filesRemoved,
        s"optimize did not compact: $res")
      val rz = graft.sources.DeltaMaintenance.optimize(s, root,
        zorderBy = Seq("o_custkey", "o_totalprice"))
      require(rz.version.nonEmpty, s"zorder optimize did not run: $rz")
      graft.sources.DeltaLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),
    "q_excel_roundtrip" -> ((s, d) => {
      // the native XLSX path end-to-end (no POI in this env): parquet →
      // workbook write → executor-side StAX read (type inference on) →
      // aggregate; the oracle aggregates the ORIGINAL parquet.
      val tmp = java.nio.file.Files.createTempDirectory("graft_excel_q").toString
      graft.sources.ExcelSource.write(
        t(s, d, "customer").select("c_custkey", "c_mktsegment", "c_acctbal").coalesce(1),
        s"$tmp/customer_xlsx")
      graft.sources.ExcelSource.read(s, s"$tmp/customer_xlsx")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_jdbc_read" -> ((s, d) => {
      // the JDBC read path against a LIVE embedded database (Derby ships
      // in Spark's jar dir): parquet → staged into Derby through Spark's
      // jdbc writer → read back via readJdbc with a pushdown WHERE that
      // the DATABASE executes (subquery wrapping) plus a range-partitioned
      // parallel scan. A hash match against DuckDB certifies rows that
      // traveled through a real SQL engine, not a parquet replay.
      val url = "jdbc:derby:memory:graft_board;create=true"
      val driverOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      val cust = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      cust.write.mode("overwrite").format("jdbc")
        .option("url", url).options(driverOpt)
        .option("dbtable", "app.customer_src")
        // Spark's Derby dialect maps StringType to CLOB, which Derby
        // won't compare to VARCHAR — size strings explicitly
        .option("createTableColumnTypes",
          "c_name VARCHAR(64), c_mktsegment VARCHAR(16)")
        .save()
      graft.sources.Sources.readJdbc(s, url, "app.customer_src",
        filter = Some("\"c_acctbal\" > 1000"),
        partitioning = Some(graft.sources.Sources.JdbcPartitioning(
          "\"c_custkey\"", 1L, 1L << 20, 4)),
        options = driverOpt)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    }),
    "q_api_read" -> ((s, d) => {
      // the API source end-to-end over its deterministic in-process
      // transport: the customer table serialized as page-numbered JSON
      // responses under a {"data": [...]} wrapper, fetched page-by-page
      // (REST ingestion is inherently driver-side and page-bounded, like
      // the reference's api reader), then parsed DISTRIBUTED via
      // spark.read.json. A hash match certifies pagination + record-path
      // parsing round-trips the rows exactly.
      import graft.sources.ApiSource
      val pageSize = 200
      val pages: Vector[String] = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey").toJSON.collect().toVector
        .grouped(pageSize)
        .map(chunk => s"""{"data":[${chunk.mkString(",")}]}""").toVector
      val fetch: ApiSource.Fetch = (_, params) => {
        val p = params("page").toInt
        if (p <= pages.size) pages(p - 1) else """{"data":[]}"""
      }
      val bodies = ApiSource.fetchPages("https://example.invalid/customers",
        ApiSource.PageNumber(), fetch,
        isEmpty = _.contains("\"data\":[]"))
      ApiSource.toDataFrame(s, bodies, recordPath = Some("data"))
        .select("c_custkey", "c_name", "c_mktsegment")
    }),
    "q_multimodal_features" -> ((s, d) => {
      val media = graft.functions.Multimodal.asMedia(
        t(s, d, "documents").withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", "lang")
      graft.functions.Multimodal.extractFeatures(media, embeddingDim = 8)
        .select("media_id", "n_bytes", "sha")
    }),
    "q_streaming_append" -> ((s, d) => {
      // BASELINE.md: streaming micro-batch append of `events` — an
      // available-now file stream drained into a parquet sink, then read
      // back; the oracle checks the sink equals the source projection.
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_q").toString
      // the file-stream source needs a directory: stage the single parquet
      // file behind a symlink
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val stream = graft.streaming.Streaming.readStream(s, "parquet",
        Some(s"$tmp/in"),
        schemaDdl = Some("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING"))
      val q = graft.streaming.Streaming.writeStream(
        stream.select("event_id", "user_id", "event_type"), Some(s"$tmp/sink"),
        graft.streaming.Streaming.StreamWriteConfig(
          checkpointLocation = Some(s"$tmp/cp"),
          trigger = Some(graft.streaming.Streaming.trigger("available_now"))))
      q.awaitTermination()
      s.read.parquet(s"$tmp/sink")
    }),
    "q_delta_stream_read" -> ((s, d) => {
      // Delta as a STREAMING SOURCE (graft-delta): customer lands as a
      // two-commit Delta table, the stream drains the initial snapshot
      // plus the tailed commit under maxFilesPerTrigger into a parquet
      // sink, a third commit lands mid-stream and drains too; the sink
      // must equal the table (each file exactly once) — the oracle
      // recomputes from the ORIGINAL parquet.
      val cust = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val tmp = java.nio.file.Files.createTempDirectory("graft_dstream_q").toString
      val root = s"$tmp/customer"
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 3 === 0).coalesce(4), root)
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 3 === 1).coalesce(4), root)
      val stream = graft.sources.Sources.read(s, graft.sources.Sources.ReadConfig(
        "delta", path = Some(root), streaming = true,
        options = Map("maxFilesPerTrigger" -> "3")))
      val q = stream.writeStream.format("parquet").option("path", s"$tmp/sink")
        .option("checkpointLocation", s"$tmp/cp").start()
      q.processAllAvailable()
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 3 === 2).coalesce(4), root)
      q.processAllAvailable()
      q.stop()
      s.read.parquet(s"$tmp/sink")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_iceberg_stream_read" -> ((s, d) => {
      // Iceberg as a STREAMING SOURCE (graft-iceberg): two snapshots
      // drain as the initial batch, a third lands mid-stream and tails in
      // as its own batch; the sink must equal the table — the oracle
      // recomputes from the ORIGINAL parquet.
      val cust = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val tmp = java.nio.file.Files.createTempDirectory("graft_istream_q").toString
      val root = s"$tmp/customer"
      graft.sources.IcebergSource.write(
        cust.filter(col("c_custkey") % 3 === 0).coalesce(4), root)
      graft.sources.IcebergSource.write(
        cust.filter(col("c_custkey") % 3 === 1).coalesce(4), root)
      val stream = graft.sources.Sources.read(s, graft.sources.Sources.ReadConfig(
        "iceberg", path = Some(root), streaming = true))
      val q = stream.writeStream.format("parquet").option("path", s"$tmp/sink")
        .option("checkpointLocation", s"$tmp/cp").start()
      q.processAllAvailable()
      graft.sources.IcebergSource.write(
        cust.filter(col("c_custkey") % 3 === 2).coalesce(4), root)
      q.processAllAvailable()
      q.stop()
      s.read.parquet(s"$tmp/sink")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_delta_stream_evolve" -> ((s, d) => {
      // Mid-stream ADDITIVE schema evolution with schemaTrackingLocation:
      // the first run drains the narrow table, the widening commit fails
      // the run (recording the new schema at the tracking location), and
      // the RESTART drains the backlog under the widened schema with
      // history null-filled — the sink totals match the oracle
      // recomputing from the ORIGINAL parquet.
      val cust = t(s, d, "customer")
      val tmp = java.nio.file.Files.createTempDirectory("graft_dsevo_q").toString
      val root = s"$tmp/customer"
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_mktsegment").coalesce(4), root)
      def start() = s.readStream.format("graft-delta")
        .option("schemaTrackingLocation", s"$tmp/track").load(root)
        .writeStream.format("parquet").option("path", s"$tmp/sink")
        .option("checkpointLocation", s"$tmp/cp").start()
      val q1 = start()
      try {
        q1.processAllAvailable()
        // WIDEN mid-run: c_acctbal arrives with the second half
        graft.sources.DeltaWriter.write(
          cust.filter(col("c_custkey") % 2 === 1)
            .select("c_custkey", "c_mktsegment", "c_acctbal").coalesce(4), root,
          schemaPolicy = graft.sources.DeltaSchema.Evolve)
        q1.processAllAvailable()
        require(false, "stream should have failed on the mid-run schema change")
      } catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
      } finally q1.stop()
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      s.read.option("mergeSchema", "true").parquet(s"$tmp/sink")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum(coalesce(col("c_acctbal"), lit(0.0))), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_delta_v2_checkpoint" -> ((s, d) => {
      // V2 checkpoint round-trip: two commits, a sidecar checkpoint above
      // a lowered threshold, the pre-checkpoint commit json aged out —
      // the table must reconstruct from the uuid-named main file plus
      // _sidecars alone and match the oracle on the original rows.
      val cust = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val tmp = java.nio.file.Files.createTempDirectory("graft_v2cp_q").toString
      val root = s"$tmp/customer"
      // repartition (not coalesce: the source is one file) so the commits
      // land enough files to cross the lowered V2 threshold
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 2 === 0).repartition(4), root)
      graft.sources.DeltaWriter.write(
        cust.filter(col("c_custkey") % 2 === 1).repartition(4), root)
      val savedT = s.conf.getOption("graft.delta.checkpoint.v2.threshold")
      val savedS = s.conf.getOption("graft.delta.checkpoint.sidecar.files")
      s.conf.set("graft.delta.checkpoint.v2.threshold", "4")
      s.conf.set("graft.delta.checkpoint.sidecar.files", "3")
      try graft.sources.DeltaWriter.writeCheckpoint(s, root, 1L)
      finally {
        savedT.fold(s.conf.unset("graft.delta.checkpoint.v2.threshold"))(
          v => s.conf.set("graft.delta.checkpoint.v2.threshold", v))
        savedS.fold(s.conf.unset("graft.delta.checkpoint.sidecar.files"))(
          v => s.conf.set("graft.delta.checkpoint.sidecar.files", v))
      }
      val log = new java.io.File(root, "_delta_log")
      require(log.listFiles.exists(
        _.getName.matches("\\d{20}\\.checkpoint\\.[A-Za-z0-9-]+\\.parquet")),
        "no V2 checkpoint written")
      require(new java.io.File(log, "_sidecars").listFiles
        .count(_.getName.endsWith(".parquet")) >= 2, "no sidecar shards")
      require(new java.io.File(log, f"${0L}%020d.json").delete(), "age-out failed")
      graft.sources.DeltaLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"),
          min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
    }),
    "q_topk_values" -> ((s, d) => // per-group exact top-k by frequency
      operators.Sketches.topKValues(events(s, d), Seq("user_id"), "event_type", 2)
        .withColumn("n", col("n").cast("long"))),
    "q_asof_join" -> ((s, d) => { // point-in-time join; DuckDB ASOF JOIN oracle
      val ev = events(s, d)
      // second-truncate both sides: events carry sub-second precision that
      // Spark (µs) and DuckDB (ns) would compare differently
      val l = ev.select(col("user_id"), col("event_id"), col("value"),
        date_trunc("second", col("ts")).as("lts"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("second", col("ts")).as("rts"))
        .agg(max("value").as("purchase_value"))
      operators.Relational.asOfJoin(l, r, Seq("user_id"), "lts", "rts")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("right_rts")).as("asof_s"),
          col("right_purchase_value").as("purchase_value"))
    }),
    "q_range_join" -> ((s, d) => { // interval join via bin blocking
      val ev = events(s, d)
      val l = ev.select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("pts"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("user_id"), date_trunc("second", col("ts")).as("ws"))
        .withColumn("we", col("ws") + expr("INTERVAL 1 HOUR"))
      operators.Relational.rangeJoin(l, r, Seq("user_id"), "pts", "ws", "we")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ws")).as("win_s"))
    }),
    "q_salted_agg" -> ((s, d) => // skew-mitigated two-phase aggregate == plain GROUP BY
      operators.Skew.saltedAggregate(t(s, d, "lineitem"), Seq("l_returnflag"),
        Map("sum_qty" -> ("sum", "l_quantity"), "n" -> ("count", "l_quantity"),
          "max_qty" -> ("max", "l_quantity")))),
    "q_simulation" -> ((s, d) => { // rows-only: xxhash-seeded generators
      val Sim = graft.sources.Simulation
      val ts = Sim.timeSeries(s, Sim.EntityConfig(50), 200, "2026-01-01 00:00:00", 60)
      val base = ts
        .withColumn("x", Sim.randomWalk(
          ts, "entity_id", "tick", "x", seed = 7, volatility = 0.5, drift = 0.01))
        .withColumn("cat", Sim.categorical(col("id"), 2,
          Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)))
        .withColumn("load", Sim.dailyProfile(col("ts")))
        .withColumn("uuid", Sim.fakeUuid(col("id"), 11))
        .withColumn("geo", Sim.geoPoint(col("id"), 13, (40.0, -75.0, 42.0, -72.0)))
        .withColumn("pressure", Sim.boundedRandomWalk(ts, "entity_id", "tick",
          "pressure", seed = 23, start = 100.0, min = 50.0, max = 150.0,
          volatility = 1.0, shockRate = 0.01, shockMagnitude = 20.0))
      val derived = Sim.withDerived(base, Seq(
        "x_f" -> "x * 1.8 + 32", "load_pct" -> "round(load * 100, 2)"))
      Sim.applyScheduledEvents(derived, "ts", "entity_id", Seq(
        Sim.ScheduledEvent("forced_value", "pressure", 0.0,
          "2026-01-01 01:00:00", endTime = Some("2026-01-01 01:30:00"),
          entity = Some("entity_3"))))
        // flatten geo so the driver's rows-only harness (pandas sort) can
        // order the result — structs are unhashable there; the struct op
        // itself is exercised above and in SubsystemsSpec
        .withColumn("geo_lat", col("geo.lat"))
        .withColumn("geo_lon", col("geo.lon"))
        .drop("geo")
    }),
    "q_simulation_deterministic" -> ((s, d) => {
      // the CORRECTNESS-checkable half of the simulation surface: grid
      // generation, sinusoidal daily profile, downtime flag, derived-expr
      // columns, scheduled forced_value window — every column a closed
      // form of (entity, tick), hash-verified against DuckDB. The
      // hash/RNG generator family stays in rows-only q_simulation with
      // its moments spec (SubsystemsSpec)
      val Sim = graft.sources.Simulation
      val ts = Sim.timeSeries(s, Sim.EntityConfig(50), 200, "2026-01-01 00:00:00", 1800)
      val base = ts
        .withColumn("load", Sim.dailyProfile(col("ts")))
        .withColumn("down", Sim.downtimeFlag(col("ts"), 2, 4, daysOfWeek = Seq(5)))
        .withColumn("pressure", lit(100.0))
      val derived = Sim.withDerived(base, Seq(
        "load_pct" -> "round(load * 100, 2)",
        "load_f" -> "round(load * 1.8 + 32, 6)"))
      Sim.applyScheduledEvents(derived, "ts", "entity_id", Seq(
        Sim.ScheduledEvent("forced_value", "pressure", 0.0,
          "2026-01-01 01:00:00", endTime = Some("2026-01-01 01:30:00"),
          entity = Some("entity_3"))))
        .select("id", "entity_id", "tick", "ts", "load_pct", "load_f",
          "down", "pressure")
    })
  )

  /** Shared semantic model for the q_semantic* queries. */
  private def semanticModel: graft.semantics.Semantics.SemanticModel = {
    import graft.semantics.Semantics._
    SemanticModel(
      metrics = Map(
        "revenue" -> Metric("revenue", "round(sum(o_totalprice), 2)", "orders"),
        "n_orders" -> Metric("n_orders", "count(*)", "orders"),
        "avg_value" -> Metric("avg_value", "", "orders",
          formula = Some("round(revenue / nullif(n_orders, 0), 4)"))),
      dimensions = Map(
        "status" -> Dimension("status", "o_orderstatus"),
        "month" -> Dimension("month", "o_orderdate", timeGrain = Some("month"))))
  }

  /**
   * DuckDB mirror of [[graft.operators.CubicEos.props]] for a registry
   * fluid over the q_fluid_props states: the same Peng-Robinson constants
   * (interpolated from the SAME Scala doubles — shortest-round-trip
   * formatting parses back to the identical IEEE-754 value), the same
   * two-branch Cardano solve, fugacity-stable root pick, and departure
   * functions, in the same association order.
   */
  private def prOracleSql(fluid: String,
                          tExpr: String = "l_quantity + 250.0",
                          pExpr: String = "l_extendedprice * 50.0"): String = {
    val f = operators.CubicEos.lookup(fluid).get
    val r = operators.CubicEos.R
    val kappa = 0.37464 + 1.54226 * f.omega - 0.26992 * f.omega * f.omega
    val ac = 0.45724 * r * r * f.tc * f.tc / f.pcPa
    val b = 0.07780 * r * f.tc / f.pcPa
    val sqrt2 = math.sqrt(2.0)
    val (ca, cb, cc, cd) = f.cp0
    val t0 = 298.15; val p0 = 101325.0
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |         $tExpr AS t_k, $pExpr AS p_pa
       |  FROM lineitem),
       |s1 AS (SELECT *, 1.0 + $kappa * (1.0 - sqrt(t_k / ${f.tc})) AS sa FROM base),
       |s2 AS (SELECT *,
       |  $ac * sa * sa AS a,
       |  (${-ac * kappa}) * sa / sqrt(t_k * ${f.tc}) AS dadt,
       |  $ac * sa * sa * p_pa / (${r * r} * t_k * t_k) AS biga,
       |  $b * p_pa / ($r * t_k) AS bigb FROM s1),
       |s3 AS (SELECT *, bigb - 1.0 AS c2,
       |  biga - 3.0 * bigb * bigb - 2.0 * bigb AS c1,
       |  bigb * bigb * bigb + bigb * bigb - biga * bigb AS c0 FROM s2),
       |s4 AS (SELECT *, c1 - c2 * c2 / 3.0 AS p3,
       |  2.0 * c2 * c2 * c2 / 27.0 - c2 * c1 / 3.0 + c0 AS q3 FROM s3),
       |s5 AS (SELECT *, q3 * q3 / 4.0 + p3 * p3 * p3 / 27.0 AS disc FROM s4),
       |s6 AS (SELECT *, sqrt(greatest(disc, 0.0)) AS sd,
       |  2.0 * sqrt(greatest(p3 / (-3.0), 0.0)) AS mc,
       |  acos(least(greatest(3.0 * q3 / (2.0 * p3) * sqrt(greatest((-3.0) / p3, 0.0)), -1.0), 1.0)) AS theta
       |  FROM s5),
       |s7 AS (SELECT *,
       |  (CASE WHEN q3 / (-2.0) + sd < 0 THEN -pow(-(q3 / (-2.0) + sd), ${1.0 / 3.0}) ELSE pow(q3 / (-2.0) + sd, ${1.0 / 3.0}) END)
       |  + (CASE WHEN q3 / (-2.0) - sd < 0 THEN -pow(-(q3 / (-2.0) - sd), ${1.0 / 3.0}) ELSE pow(q3 / (-2.0) - sd, ${1.0 / 3.0}) END)
       |  - c2 / 3.0 AS zs,
       |  mc * cos(theta / 3.0) - c2 / 3.0 AS zv,
       |  mc * cos(theta / 3.0 - ${4.0 * math.Pi / 3.0}) - c2 / 3.0 AS zl FROM s6),
       |s8 AS (SELECT *,
       |  CASE WHEN NOT (disc < 0.0) THEN FALSE
       |       WHEN NOT (zl > bigb * ${1.0 + 1e-9}) THEN FALSE
       |       ELSE ((zl - 1.0) - ln(zl - bigb) - biga / (${2.0 * sqrt2} * bigb) * ln((zl + ${1.0 + sqrt2} * bigb) / (zl + ${1.0 - sqrt2} * bigb)))
       |          < ((zv - 1.0) - ln(zv - bigb) - biga / (${2.0 * sqrt2} * bigb) * ln((zv + ${1.0 + sqrt2} * bigb) / (zv + ${1.0 - sqrt2} * bigb)))
       |  END AS pickl FROM s7),
       |s8b AS (SELECT *,
       |  CASE WHEN NOT (disc < 0.0) THEN zs WHEN pickl THEN zl ELSE zv END AS z
       |  FROM s8),
       |s9 AS (SELECT *,
       |  ln((z + ${1.0 + sqrt2} * bigb) / (z + ${1.0 - sqrt2} * bigb)) AS lnterm FROM s8b),
       |s10 AS (SELECT *,
       |  $r * t_k * (z - 1.0) + (t_k * dadt - a) / ${2.0 * sqrt2 * b} * lnterm AS hdep,
       |  $r * ln(z - bigb) + dadt / ${2.0 * sqrt2 * b} * lnterm AS sdep,
       |  $ca * (t_k - $t0) + ${cb / 2.0} * (t_k * t_k - ${t0 * t0})
       |    + ${cc / 3.0} * (t_k * t_k * t_k - ${t0 * t0 * t0})
       |    + ${cd / 4.0} * (t_k * t_k * t_k * t_k - ${t0 * t0 * t0 * t0}) AS h0,
       |  $ca * ln(t_k / $t0) + $cb * (t_k - $t0)
       |    + ${cc / 2.0} * (t_k * t_k - ${t0 * t0})
       |    + ${cd / 3.0} * (t_k * t_k * t_k - ${t0 * t0 * t0})
       |    - $r * ln(p_pa / $p0) AS s0 FROM s9),
       |s11 AS (SELECT *, z * $r * t_k / p_pa - ${f.cShift} AS vt FROM s10)
       |SELECT l_orderkey, l_linenumber, t_k, p_pa,
       |       round(p_pa * vt / ($r * t_k), 6) AS z,
       |       round(${f.m} / vt, 4) AS density,
       |       round((h0 + hdep - ${f.cShift} * p_pa) / ${f.m * 1000.0}, 4) AS h,
       |       round((s0 + sdep) / ${f.m * 1000.0}, 5) AS s,
       |       CASE WHEN t_k >= ${f.tc} THEN 'supercritical'
       |            WHEN pickl THEN 'liquid'
       |            WHEN NOT (disc < 0.0) AND z < 0.3074 THEN 'liquid'
       |            ELSE 'vapor' END AS phase
       |FROM s11""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // the Spark side hashes word n-grams with xxhash64 for shuffle width,
    // but the OUTPUT (per-doc match fraction) is hash-free — the oracle
    // recomputes it from string n-grams directly (collision probability
    // at these cardinalities ~ 0, and the driver compare would catch one)
    "q_contamination" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), ng AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
        |    i -> array_to_string(w[i:i+7], ' '))) AS g FROM norm
        |), bench AS (SELECT DISTINCT unnest(g) AS ngram FROM ng WHERE doc_id < 20),
        |expl AS (SELECT doc_id, len(g) AS total, unnest(g) AS ngram FROM ng),
        |m AS (SELECT e.doc_id, e.total, count(*) AS matched
        |      FROM expl e JOIN bench USING (ngram) GROUP BY 1, 2)
        |SELECT n.doc_id,
        |  round(coalesce(CAST(m.matched AS DOUBLE) / m.total, 0.0), 6) AS contamination,
        |  coalesce(CAST(m.matched AS DOUBLE) / m.total, 0.0) >= 0.5 AS contaminated
        |FROM ng n LEFT JOIN m USING (doc_id)""".stripMargin,
    // add-1-smoothed word-unigram log-likelihood ratio, target = docs
    // 0-19; feature space = target vocab + one OOV bucket, identically
    // reconstructed here (ln = natural log both sides, round 6)
    "q_dsir_weights" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), tc AS (
        |  SELECT word, count(*) AS ct FROM (
        |    SELECT unnest(w) AS word FROM norm WHERE doc_id < 20) t GROUP BY 1
        |), tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt, CAST(count(*) AS DOUBLE) AS v FROM tc),
        |rw AS (SELECT doc_id, unnest(w) AS word FROM norm),
        |tagged AS (SELECT r.doc_id, r.word, tc.ct FROM rw r LEFT JOIN tc ON r.word = tc.word),
        |rc AS (SELECT CASE WHEN ct IS NULL THEN ' oov' ELSE word END AS f, count(*) AS cr
        |       FROM tagged GROUP BY 1),
        |rtot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr FROM rc),
        |lr AS (SELECT tc.word,
        |         ln((tc.ct + 1.0) / (tot.nt + tot.v + 1.0)) -
        |         ln((coalesce(rc.cr, 0) + 1.0) / (rtot.nr + tot.v + 1.0)) AS lr
        |       FROM tc CROSS JOIN tot CROSS JOIN rtot LEFT JOIN rc ON rc.f = tc.word),
        |oov AS (SELECT ln(1.0 / (tot.nt + tot.v + 1.0)) -
        |         ln((coalesce((SELECT cr FROM rc WHERE f = ' oov'), 0) + 1.0) / (rtot.nr + tot.v + 1.0)) AS lr
        |        FROM tot CROSS JOIN rtot)
        |SELECT g.doc_id, round(sum(coalesce(lr.lr, oov.lr)), 6) AS dsir_logratio
        |FROM tagged g LEFT JOIN lr ON g.word = lr.word CROSS JOIN oov GROUP BY 1""".stripMargin,
    // interpolated Kneser-Ney trigram LM of the target (docs 0-19), fixed
    // discount 0.75: continuation-count unigram (add-1 for OOV mass),
    // KN middle order from trigram TYPE counts, top order from trigram
    // counts; token 1 scored by p1, token 2 by p2, else p3 — the exact
    // arithmetic sequence of Sampling.perplexityScoreKN so float64
    // results hash-match (all count inputs are exact integers in double)
    "q_perplexity" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), tuni AS (
        |  SELECT word, count(*) AS c1 FROM (
        |    SELECT unnest(w) AS word FROM norm WHERE doc_id < 20) t GROUP BY 1
        |), vsz AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM tuni),
        |tbi AS (
        |  SELECT p, c, count(*) AS c2 FROM (
        |    SELECT unnest(w[1:len(w)-1]) AS p, unnest(w[2:len(w)]) AS c
        |    FROM norm WHERE doc_id < 20) t GROUP BY 1, 2
        |), cont1 AS (SELECT c AS f, CAST(count(*) AS DOUBLE) AS n1 FROM tbi GROUP BY 1),
        |btot AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM tbi),
        |ttri AS (
        |  SELECT u, v, w3, count(*) AS c3 FROM (
        |    SELECT unnest(w[1:len(w)-2]) AS u, unnest(w[2:len(w)-1]) AS v,
        |           unnest(w[3:len(w)]) AS w3
        |    FROM norm WHERE doc_id < 20 AND len(w) >= 3) t GROUP BY 1, 2, 3
        |), ctx3 AS (
        |  SELECT u, v, CAST(sum(c3) AS DOUBLE) AS cuv, CAST(count(*) AS DOUBLE) AS n3
        |  FROM ttri GROUP BY 1, 2
        |), cont2 AS (SELECT v, w3, CAST(count(*) AS DOUBLE) AS n1vw FROM ttri GROUP BY 1, 2),
        |ctx2 AS (
        |  SELECT v, CAST(sum(n1vw) AS DOUBLE) AS ncv, CAST(count(*) AS DOUBLE) AS n2v
        |  FROM cont2 GROUP BY 1
        |), pos AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS word FROM norm
        |), feat AS (
        |  SELECT s.doc_id, s.pos, CASE WHEN u.c1 IS NULL THEN ' oov' ELSE s.word END AS f
        |  FROM pos s LEFT JOIN tuni u ON s.word = u.word
        |), ctxd AS (
        |  SELECT doc_id, pos, f,
        |         lag(f, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS f1,
        |         lag(f, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS f2
        |  FROM feat
        |), probs AS (
        |  SELECT c.doc_id, c.f1, c.f2, x2.ncv, x3.cuv,
        |    (coalesce(n1.n1, 0) + 1.0) / (btot.b + (vsz.v + 1.0)) AS p1,
        |    b2.n1vw, x2.n2v, t3.c3, x3.n3
        |  FROM ctxd c CROSS JOIN btot CROSS JOIN vsz
        |    LEFT JOIN cont1 n1 ON c.f = n1.f
        |    LEFT JOIN ctx2 x2 ON c.f1 = x2.v
        |    LEFT JOIN cont2 b2 ON b2.v = c.f1 AND b2.w3 = c.f
        |    LEFT JOIN ctx3 x3 ON x3.u = c.f2 AND x3.v = c.f1
        |    LEFT JOIN ttri t3 ON t3.u = c.f2 AND t3.v = c.f1 AND t3.w3 = c.f
        |), interp AS (
        |  SELECT doc_id, f1, f2, cuv, c3, n3, p1,
        |    CASE WHEN ncv IS NULL THEN p1
        |         ELSE (greatest(coalesce(n1vw, 0) - 0.75, 0.0) + 0.75 * n2v * p1) / ncv
        |    END AS p2
        |  FROM probs
        |), scored AS (
        |  SELECT doc_id,
        |    CASE WHEN f1 IS NULL THEN p1
        |         WHEN f2 IS NULL THEN p2
        |         WHEN cuv IS NULL THEN p2
        |         ELSE (greatest(coalesce(c3, 0) - 0.75, 0.0) + 0.75 * n3 * p2) / cuv
        |    END AS p
        |  FROM interp
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(-sum(ln(p)) / count(*), 6) AS cross_entropy
        |FROM scored GROUP BY 1""".stripMargin,
    // interpolated add-1 bigram LM of the target (docs 0-19); first token
    // unigram-only, unseen context backs off to uniform. (1.0 - 0.9) is
    // spelled as an expression so both engines compute the identical
    // float64 interpolation weight
    "q_perplexity_bigram" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), tuni AS (
        |  SELECT word, count(*) AS c1 FROM (
        |    SELECT unnest(w) AS word FROM norm WHERE doc_id < 20) t GROUP BY 1
        |), tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS nt, CAST(count(*) AS DOUBLE) AS v FROM tuni),
        |tbi AS (
        |  SELECT p, c, count(*) AS c2 FROM (
        |    SELECT unnest(w[1:len(w)-1]) AS p, unnest(w[2:len(w)]) AS c
        |    FROM norm WHERE doc_id < 20) t GROUP BY 1, 2
        |), tctx AS (SELECT p, sum(c2) AS cc FROM tbi GROUP BY 1),
        |pos AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS word FROM norm
        |), feat AS (
        |  SELECT s.doc_id, s.pos,
        |         CASE WHEN u.c1 IS NULL THEN ' oov' ELSE s.word END AS f,
        |         (coalesce(u.c1, 0) + 1.0) / (tot.nt + tot.v + 1.0) AS pu
        |  FROM pos s LEFT JOIN tuni u ON s.word = u.word CROSS JOIN tot
        |), ctxd AS (
        |  SELECT doc_id, pos, f, pu,
        |         lag(f) OVER (PARTITION BY doc_id ORDER BY pos) AS fp
        |  FROM feat
        |), scored AS (
        |  SELECT c.doc_id,
        |    CASE WHEN c.fp IS NULL THEN c.pu
        |         ELSE 0.9 * ((coalesce(b.c2, 0) + 1.0) / (coalesce(x.cc, 0) + tot.v + 1.0))
        |              + (1.0 - 0.9) * c.pu
        |    END AS p
        |  FROM ctxd c CROSS JOIN tot
        |    LEFT JOIN tctx x ON c.fp = x.p
        |    LEFT JOIN tbi b ON b.p = c.fp AND b.c = c.f
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(-sum(ln(p)) / count(*), 6) AS cross_entropy
        |FROM scored GROUP BY 1""".stripMargin,
    // the Spark side hashes n-grams (xxhash64) only for shuffle width;
    // the oracle recomputes doc frequencies from string n-grams directly
    "q_crossdoc_ngrams" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), ng AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
        |    i -> array_to_string(w[i:i+7], ' '))) AS g FROM norm
        |), ex AS (SELECT doc_id, unnest(g) AS ngram FROM ng),
        |freq AS (SELECT ngram, count(*) AS df FROM ex GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS total_ngrams,
        |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS repeated_ngrams,
        |  round(CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS repeated_frac
        |FROM ex e JOIN freq f USING (ngram) GROUP BY 1""".stripMargin,
    // removed-word count per doc = |union of the doc's non-first repeated
    // n-gram windows, clamped to doc length| — computed here as a distinct
    // covered-index count, which equals the Spark side's merged-interval cut
    "q_remove_spans" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), occ AS (
        |  SELECT doc_id, len(w) AS nw,
        |         unnest(range(0, greatest(len(w) - 7, 0) + 1)) AS p,
        |         unnest(list_transform(range(0, greatest(len(w) - 7, 0) + 1),
        |                i -> array_to_string(w[i+1:i+8], ' '))) AS g
        |  FROM norm
        |), rep AS (
        |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM occ GROUP BY 1) t WHERE df >= 2
        |), ranked AS (
        |  SELECT o.doc_id, o.nw, o.p,
        |         row_number() OVER (PARTITION BY o.g ORDER BY o.doc_id, o.p) AS rn
        |  FROM occ o JOIN rep USING (g)
        |), cov AS (
        |  SELECT doc_id, count(DISTINCT idx) AS removed FROM (
        |    SELECT doc_id, nw, unnest(range(p, p + 8)) AS idx FROM ranked WHERE rn > 1) t
        |  WHERE idx < nw GROUP BY 1
        |)
        |SELECT n.doc_id, CAST(coalesce(cov.removed, 0) AS BIGINT) AS removed_words
        |FROM norm n LEFT JOIN cov USING (doc_id)""".stripMargin,
    // exact all-pairs Jaccard via an inverted-index join; valid as an
    // oracle because the Spark side's LSH candidate recall is 1.0 on the
    // test corpus (RecallSpec) and survivors carry EXACT Jaccard
    "q_ngram_jaccard_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM documents
        |), ng AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
        |    i -> array_to_string(w[i:i+2], ' '))) AS g FROM norm
        |), sizes AS (SELECT doc_id, len(g) AS sz FROM ng),
        |ex AS (SELECT doc_id, unnest(g) AS ngram FROM ng),
        |inter AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
        |          FROM ex l JOIN ex r ON l.ngram = r.ngram AND l.doc_id < r.doc_id
        |          GROUP BY 1, 2)
        |SELECT i.a, i.b, round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.5""".stripMargin,
    // exact components via transitive closure (bounded: each node reaches
    // <= 7 others on this chain graph, so the closure stays tiny)
    "q_cluster_components" ->
      """WITH RECURSIVE
        |ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
        |e AS (SELECT a.id AS a, a.id + 1 AS b FROM ids a JOIN ids b2 ON a.id + 1 = b2.id
        |      WHERE a.id % 7 <> 6),
        |sym AS (SELECT a AS s, b AS d FROM e UNION SELECT b, a FROM e),
        |reach(id, r) AS (
        |  SELECT s, s FROM sym
        |  UNION
        |  SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        |)
        |SELECT id, min(r) AS component FROM reach GROUP BY id""".stripMargin,
    // brute-force levenshtein cross join — the q-gram-filtered Spark join
    // is approximation-free, so the result sets must be identical
    "q_fuzzy_join" ->
      """WITH corrupted AS (
        |  SELECT CAST(p_partkey + 1000000 AS BIGINT) AS c_key,
        |         CASE CAST(p_partkey % 3 AS INT)
        |           WHEN 0 THEN substring(p_name, 2)
        |           WHEN 1 THEN substring(p_name, 1, 3) || 'zz' || substring(p_name, 6)
        |           ELSE reverse(p_name) END AS c_name
        |  FROM part WHERE p_partkey % 10 < 3)
        |SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, c.c_key,
        |       CAST(levenshtein(p.p_name, c.c_name) AS BIGINT) AS edit_distance
        |FROM part p CROSS JOIN corrupted c
        |WHERE levenshtein(p.p_name, c.c_name) <= 2""".stripMargin,
    "q_string_similarity" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |  jaro_winkler_similarity(p_name,
        |    substring(p_name, 1, 3) || 'zz' || substring(p_name, 6)) AS jw,
        |  jaro_similarity(p_name,
        |    substring(p_name, 1, 3) || 'zz' || substring(p_name, 6)) AS jaro
        |FROM part WHERE p_partkey % 10 < 3""".stripMargin,
    "q_entity_resolution" ->
      """WITH RECURSIVE
        |recs AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS pid, p_name AS name FROM part
        |  UNION ALL
        |  SELECT CAST(p_partkey + 1000000 AS BIGINT), 'x' || substring(p_name, 2)
        |  FROM part WHERE p_partkey % 4 = 0),
        |blocks AS (SELECT substring(name, 2, 8) AS bkey, pid FROM recs),
        |pairs AS (SELECT DISTINCT l.pid AS a, r.pid AS b
        |          FROM blocks l JOIN blocks r ON l.bkey = r.bkey AND l.pid < r.pid),
        |scored AS (SELECT p.a, p.b FROM pairs p
        |           JOIN recs ra ON ra.pid = p.a JOIN recs rb ON rb.pid = p.b
        |           WHERE jaro_winkler_similarity(ra.name, rb.name) >= 0.9),
        |sym AS (SELECT a AS s, b AS d FROM scored UNION SELECT b, a FROM scored),
        |reach(id, r) AS (
        |  SELECT s, s FROM sym
        |  UNION
        |  SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT recs.pid, recs.name, COALESCE(comp.component, recs.pid) AS entity_id
        |FROM recs LEFT JOIN comp ON recs.pid = comp.id""".stripMargin,
    "q_filter_rows" ->
      "SELECT * FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05",
    "q_numeric_key" ->
      "SELECT c_custkey, c_name, ('0x' || substring(md5(COALESCE(NULLIF(TRIM(CAST(c_name AS VARCHAR)), ''), '')), 1, 15))::BIGINT AS nk FROM customer",
    "q_derive_columns" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net_price, l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge FROM lineitem",
    "q_cast_columns" ->
      "SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS l_quantity, CAST(l_orderkey AS VARCHAR) AS okey_str FROM lineitem",
    "q_clean_text" ->
      "SELECT c_custkey, lower(trim(c_name)) AS c_name, lower(trim(c_mktsegment)) AS c_mktsegment FROM customer",
    "q_extract_date_parts" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year, CAST(month(o_orderdate) AS BIGINT) AS o_month, CAST(day(o_orderdate) AS BIGINT) AS o_day FROM orders",
    "q_normalize_schema" ->
      "SELECT o_orderkey, o_custkey, o_totalprice AS total_price, o_orderstatus FROM orders",
    "q_sort_limit" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 10",
    "q_sample_det" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')",
    "q_stratified_sample" ->
      "SELECT l_returnflag, l_orderkey, l_linenumber FROM (SELECT l_returnflag, l_orderkey, l_linenumber, row_number() OVER (PARTITION BY l_returnflag ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))) AS rn FROM lineitem) t WHERE rn <= 100",
    "q_repetition" ->
      "SELECT doc_id, CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(1.0 - len(list_distinct(lines)) / len(lines), 6) END AS dup_line_frac, CASE WHEN len(paras) = 0 THEN 0.0 ELSE round(1.0 - len(list_distinct(paras)) / len(paras), 6) END AS dup_para_frac, CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(CAST(list_sum(list_transform(lines, x -> len(x))) AS DOUBLE) / len(lines), 6) END AS mean_line_len FROM (SELECT doc_id, list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines, list_filter(string_split(text, chr(10) || chr(10)), x -> trim(x) <> '') AS paras FROM documents) t",
    "q_normalize_unicode" ->
      "SELECT doc_id, raw, nfc_normalize(raw) AS nfc, raw <> nfc_normalize(raw) AS changed FROM (SELECT doc_id, 'Café ﬁn ½ Ａ ' || substring(text, 1, 40) AS raw FROM documents) t",
    "q_pii_scrub" ->
      "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'), '[0-9][0-9 ()+.-]{8,}[0-9]', '<NUM>', 'g') AS scrubbed FROM documents",
    "q_weighted_mix" ->
      """WITH src AS (
        |  SELECT doc_id, source FROM documents WHERE source IN ('src1','src2','src3')
        |), counts AS (SELECT source, count(*) AS n FROM src GROUP BY source),
        |w AS (SELECT * FROM (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)) AS t(source, wt)),
        |sc AS (SELECT min(n / wt) AS scale FROM counts JOIN w USING (source)),
        |takes AS (SELECT source, greatest(CAST(floor(wt * scale) AS BIGINT), 1) AS k
        |          FROM w CROSS JOIN sc),
        |ranked AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM src)
        |SELECT r.doc_id, r.source FROM ranked r JOIN takes t USING (source)
        |WHERE r.rn <= t.k""".stripMargin,
    "q_weighted_mix_tokens" ->
      """WITH src AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE source IN ('src1','src2','src3')
        |), totals AS (SELECT source, sum(n_tokens) AS t FROM src GROUP BY source),
        |w AS (SELECT * FROM (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)) AS t(source, wt)),
        |sc AS (SELECT min(t / wt) AS scale FROM totals JOIN w USING (source)),
        |budgets AS (SELECT source, greatest(CAST(floor(wt * scale) AS BIGINT), 1) AS k
        |            FROM w CROSS JOIN sc),
        |ranked AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
        |                      ROWS UNBOUNDED PRECEDING) - n_tokens AS prefix
        |  FROM src)
        |SELECT r.doc_id, r.source, r.n_tokens
        |FROM ranked r JOIN budgets b USING (source)
        |WHERE r.prefix < b.k""".stripMargin,
    "q_incremental_dedup" ->
      """WITH norm AS (
        |  SELECT doc_id, text,
        |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp
        |  FROM documents
        |), seen AS (SELECT DISTINCT fp FROM norm WHERE doc_id < 100),
        |   batch AS (SELECT * FROM norm WHERE doc_id >= 100),
        |   win AS (SELECT min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT b.doc_id, b.text
        |FROM batch b
        |JOIN win w ON b.doc_id = w.doc_id
        |LEFT JOIN seen s ON b.fp = s.fp
        |WHERE s.fp IS NULL""".stripMargin,
    "q_bloom_dedup" ->
      """WITH norm AS (
        |  SELECT doc_id, text,
        |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp
        |  FROM documents
        |), seen AS (SELECT DISTINCT fp FROM norm WHERE doc_id < 100),
        |   batch AS (SELECT * FROM norm WHERE doc_id >= 100),
        |   win AS (SELECT min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT b.doc_id, b.text
        |FROM batch b
        |JOIN win w ON b.doc_id = w.doc_id
        |LEFT JOIN seen s ON b.fp = s.fp
        |WHERE s.fp IS NULL""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks WHERE length(term) >= 1 GROUP BY 1, 2
        |), dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |   nd AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * (ln((nd.n + 1.0) / (dft.df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN nd)
        |SELECT doc_id, term, tf, score, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM scored) r
        |WHERE rank <= 5""".stripMargin,
    "q_gopher_flags" ->
      s"""WITH w AS (
         |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS words
         |  FROM documents
         |), c AS (
         |  SELECT doc_id,
         |    len(words) AS n_words,
         |    CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
         |      / greatest(len(words), 1) AS mean_len,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3
         |      + (length(text) - length(replace(text, chr(8230), ''))) AS symbols,
         |    len(list_filter(words, x -> list_contains([${TextAnalysis.StopWords.map("'" + _ + "'").mkString(",")}], x))) AS stop_hits
         |  FROM w)
         |SELECT doc_id,
         |  CAST(n_words AS BIGINT) AS n_words,
         |  round(mean_len, 6) AS mean_word_len,
         |  n_words >= 20 AND n_words <= 100000 AS word_count_ok,
         |  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_word_len_ok,
         |  CAST(symbols AS DOUBLE) / greatest(n_words, 1) <= 0.1 AS symbol_ratio_ok,
         |  stop_hits >= 2 AS stopword_ok,
         |  (n_words >= 20 AND n_words <= 100000)
         |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
         |    AND (CAST(symbols AS DOUBLE) / greatest(n_words, 1) <= 0.1)
         |    AND (stop_hits >= 2) AS gopher_pass
         |FROM c""".stripMargin,
    "q_numeric_profile" ->
      (Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        s"""SELECT '$c' AS "column", round(avg($c), 6) AS mean,
           |  round(stddev_samp($c), 6) AS stddev,
           |  round(quantile_cont($c, 0.25), 6) AS p25,
           |  round(quantile_cont($c, 0.50), 6) AS p50,
           |  round(quantile_cont($c, 0.75), 6) AS p75
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")),
    "q_profile" ->
      (Seq(("c_custkey", "bigint"), ("c_name", "string"),
        ("c_mktsegment", "string"), ("c_nationkey", "int")).map { case (c, dt) =>
        s"""SELECT '$c' AS "column", '$dt' AS dtype,
           |  count(*) - count($c) AS null_count,
           |  count(DISTINCT $c) AS distinct_count,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value,
           |  round(CAST(count(*) - count($c) AS DOUBLE) / greatest(count(*), 1), 6) AS null_pct,
           |  CASE WHEN count($c) = 0 THEN 'empty'
           |       WHEN count(DISTINCT $c) >= count($c) THEN 'unique'
           |       WHEN count(DISTINCT $c) > count($c) * 0.9 THEN 'high'
           |       WHEN count(DISTINCT $c) < count($c) * 0.1 THEN 'low'
           |       ELSE 'medium' END AS cardinality
           |FROM customer""".stripMargin
      }.mkString("\nUNION ALL\n")),
    "q_url_filter" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         'https://www.' || source || '.example.com/p/' || doc_id AS url,
        |         regexp_replace(regexp_extract(lower(trim('https://www.' || source || '.example.com/p/' || doc_id)),
        |           '^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$', 1), '^www\.', '') AS dom
        |  FROM documents)
        |SELECT doc_id, source, url FROM d
        |WHERE NOT (dom = 'src1.example.com' OR dom LIKE '%.src1.example.com'
        |        OR dom = 'src7.example.com' OR dom LIKE '%.src7.example.com')""".stripMargin,
    "q_pack_sequences" ->
      """SELECT doc_id, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS seq_offset
        |FROM (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |            FROM documents))""".stripMargin,
    "q_segment_dedup" ->
      """WITH segs AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
        |         generate_subscripts(string_split(text, ' '), 1) AS idx
        |  FROM documents
        |), keep AS (
        |  SELECT doc_id, idx FROM segs
        |  QUALIFY row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) = 1
        |)
        |SELECT s.doc_id, string_agg(s.seg, ' ' ORDER BY s.idx) AS text
        |FROM segs s JOIN keep k ON s.doc_id = k.doc_id AND s.idx = k.idx
        |GROUP BY s.doc_id""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_fill_nulls" ->
      "SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SEGMENT_UNKNOWN') AS c_mktsegment FROM customer",
    "q_split_part" ->
      "SELECT c_custkey, c_name, split_part(c_name, '#', 2) AS cust_num FROM customer",
    "q_date_add" ->
      "SELECT o_orderkey, o_orderdate, CAST(CAST(o_orderdate AS DATE) + 5 AS TIMESTAMP) AS ship_by, CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m FROM orders",
    "q_date_trunc" ->
      "SELECT o_orderkey, o_orderdate, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start FROM orders",
    "q_date_diff" ->
      "SELECT o_orderkey, o_orderdate, date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_ref FROM orders",
    "q_case_when" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_class FROM lineitem",
    "q_concat_columns" ->
      "SELECT c_custkey, c_name, c_mktsegment, concat_ws('|', c_name, c_mktsegment) AS concat_key FROM customer",
    "q_select_drop_rename" ->
      "SELECT o_orderkey, o_custkey, o_totalprice AS price FROM orders",
    "q_add_prefix" ->
      "SELECT r_regionkey AS r0_r_regionkey, r_name AS r0_r_name FROM region",
    "q_normalize_column_names" ->
      "SELECT r_regionkey AS region_key, r_name AS region_name FROM region",
    "q_coalesce_columns" ->
      "SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), c_name) AS seg_or_name FROM customer",
    "q_replace_values" ->
      "SELECT l_orderkey, l_linenumber, CASE WHEN l_returnflag = 'A' THEN 'ACCEPTED' WHEN l_returnflag = 'R' THEN 'RETURNED' ELSE l_returnflag END AS l_returnflag FROM lineitem",
    "q_trim_whitespace" ->
      "SELECT doc_id, trim(text) AS text FROM documents",
    "q_row_number" ->
      "SELECT o_orderkey, o_custkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders",
    "q_join_inner" ->
      "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
    "q_join_left" ->
      "SELECT o.o_orderkey, COALESCE(c.c_name, 'NONE') AS cust_name FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000",
    "q_join_semi" ->
      "SELECT * FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)",
    "q_join_anti" ->
      "SELECT * FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "q_union_by_name" ->
      "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus = 'F' UNION ALL SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_totalprice > 250000",
    "q_pivot" ->
      "SELECT l_returnflag, sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS \"F\", sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS \"O\" FROM lineitem GROUP BY l_returnflag",
    "q_unpivot" ->
      "SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part UNION ALL SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part",
    "q_aggregate" ->
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS l_quantity, count(l_orderkey) AS l_orderkey, round(avg(l_extendedprice), 4) AS l_extendedprice FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q_deduplicate" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn FROM orders) t WHERE rn = 1",
    "q_explode" ->
      "SELECT l_orderkey, l_linenumber, unnest(generate_series(1, CAST(l_linenumber AS BIGINT))) AS ln_seq FROM lineitem",
    "q_dict_mapping" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, CASE WHEN l_returnflag = 'A' THEN 'accepted' WHEN l_returnflag = 'N' THEN 'none' WHEN l_returnflag = 'R' THEN 'returned' ELSE 'other' END AS flag_desc FROM lineitem",
    "q_regex_replace" ->
      "SELECT doc_id, regexp_replace(text, 'value', 'VAL', 'g') AS text_repl FROM documents",
    "q_unpack_struct" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "q_hash_columns" ->
      "SELECT c_custkey, sha256(c_name) AS c_name, md5(c_mktsegment) AS c_mktsegment FROM customer",
    "q_surrogate_key" ->
      "SELECT c_custkey, c_nationkey, sha256(concat_ws('|', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR))) AS sk FROM customer",
    "q_parse_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "q_validate_and_flag" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, concat_ws(',', CASE WHEN NOT COALESCE(l_quantity <= 45, false) THEN 'qty_max' END, CASE WHEN NOT COALESCE(l_discount <= 0.08, false) THEN 'disc_max' END) AS flags FROM lineitem",
    "q_window_calc" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, sum(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty FROM lineitem",
    "q_sessionize" ->
      "WITH g AS (SELECT event_id, user_id, ts, CASE WHEN lag(ts) OVER w IS NULL OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800 THEN 1 ELSE 0 END AS is_new FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT event_id, user_id, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS snum FROM g) SELECT event_id, user_id, concat_ws('-', CAST(user_id AS VARCHAR), CAST(snum AS VARCHAR)) AS session_id FROM s",
    "q_resample" ->
      "WITH obs AS (SELECT user_id, date_trunc('second', ts) AS ts, max(value) AS value FROM events WHERE user_id < 20 GROUP BY 1, 2), b AS (SELECT user_id, date_trunc('hour', min(ts)) AS gmin, max(ts) AS gmax FROM obs GROUP BY 1), grid AS (SELECT user_id, unnest(generate_series(gmin, gmax, INTERVAL 1 HOUR)) AS gts FROM b) SELECT g.user_id, g.gts AS grid_ts, round(o.value, 6) AS value FROM grid g ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND o.ts <= g.gts",
    "q_rolling_agg" ->
      "SELECT event_id, user_id, round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6) AS rolling_avg FROM events WHERE user_id < 50",
    "q_split_events" ->
      "SELECT event_id, period_start, period_start + INTERVAL 1 HOUR AS period_end, CAST(floor(epoch(least(end_ts, period_start + INTERVAL 1 HOUR))) - floor(epoch(greatest(start_ts, period_start))) AS BIGINT) AS dur_s FROM (SELECT event_id, ts AS start_ts, ts + INTERVAL 90 MINUTE AS end_ts, unnest(generate_series(date_trunc('hour', ts), date_trunc('hour', ts + INTERVAL 90 MINUTE), INTERVAL 1 HOUR)) AS period_start FROM events) t",
    "q_flatten_struct" ->
      "SELECT c_custkey, c_name AS nested_inner_name, c_acctbal AS nested_bal FROM customer",
    "q_apply_mapping" ->
      "SELECT c.c_custkey, c.c_nationkey, COALESCE(n.n_name, 'UNKNOWN') AS nation_name FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey",
    "q_exact_dedup" ->
      "SELECT doc_id, text, lang, source, n_chars FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') ORDER BY doc_id) AS rn FROM documents) t WHERE rn = 1",
    "q_token_count" ->
      "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens FROM documents",
    "q_quality_score" ->
      "SELECT doc_id, round(least(length(text) / 500.0, 1.0) * 0.3 + least((CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','was','with','as','at','by','be','this'], x))) AS DOUBLE) / CAST(greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) AS DOUBLE)) * 4.0, 1.0) * 0.3 + greatest(0.0, 1.0 - (CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)) * 4.0) * 0.2 + greatest(0.0, 1.0 - (CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)) * 4.0) * 0.2, 6) AS quality FROM documents",
    "q_fingerprint_stats" ->
      "SELECT count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS n_unique, count(*) AS n_docs FROM documents",
    "q_epochs_mix" ->
      "WITH d AS (SELECT doc_id, source, CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25 ELSE 1.0 END AS e, (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) / 4294967296.0 AS u FROM documents), c AS (SELECT doc_id, source, CAST(floor(e) + CASE WHEN u < e - floor(e) THEN 1 ELSE 0 END AS INT) AS n FROM d) SELECT doc_id, source, CAST(unnest(range(0, n)) AS INT) AS epoch_idx FROM c WHERE n > 0",
    "q_corpus_report" ->
      "SELECT lang, count(*) AS n_docs, count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS n_unique, CAST(sum(length(text)) AS BIGINT) AS total_chars, CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens, round(avg(len(string_split_regex(trim(text), '\\s+'))), 6) AS mean_tokens, round(quantile_cont(len(string_split_regex(trim(text), '\\s+')), 0.5), 6) AS p50_tokens, CAST(max(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS max_tokens, round(1.0 - count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) / CAST(count(*) AS DOUBLE), 6) AS dup_ratio FROM documents GROUP BY 1",
    "q_ann_topk" ->
      "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10), s AS (SELECT q.qid, e.vec_id, list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qv, q.qv))) AS cos FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid) SELECT qid, vec_id, rank FROM (SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s) r WHERE rank <= 5",
    "q_scd2" ->
      "WITH unchanged AS (SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current FROM customer WHERE c_custkey % 10 <> 0), closed AS (SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS valid_from, TIMESTAMP '2026-02-01 00:00:00' AS valid_to, false AS is_current FROM customer WHERE c_custkey % 10 = 0), opened AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment, TIMESTAMP '2026-02-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current FROM customer WHERE c_custkey % 10 = 0) SELECT * FROM unchanged UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM opened",
    "q_scd2_deletes" ->
      "WITH unchanged AS (SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 10 <> 0), closed AS (SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS valid_from, TIMESTAMP '2026-02-01 00:00:00' AS valid_to, false AS is_current FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 10 = 0), opened AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment, TIMESTAMP '2026-02-01 00:00:00' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 10 = 0), gone AS (SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS valid_from, TIMESTAMP '2026-02-01 00:00:00' AS valid_to, false AS is_current FROM customer WHERE c_custkey % 7 = 0) SELECT * FROM unchanged UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM opened UNION ALL SELECT * FROM gone",
    "q_merge_upsert" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2 AS c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 = 0 UNION ALL SELECT * FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0",
    "q_merge_evolve" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2 AS c_acctbal, c_mktsegment, c_custkey % 7 AS c_extra FROM customer WHERE c_custkey % 3 = 0 UNION ALL SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, CAST(NULL AS BIGINT) AS c_extra FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0",
    "q_merge_append_only" ->
      "SELECT * FROM customer WHERE c_custkey % 2 = 0 UNION ALL SELECT * FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 2 <> 0",
    "q_merge_delete" ->
      "SELECT * FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0",
    "q_detect_deletes" ->
      "SELECT *, (c_custkey % 7 = 0) AS _is_deleted, CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2026-02-01 00:00:00' END AS _deleted_at FROM customer",
    "q_dimension" ->
      "SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS sk, c_custkey, c_name, c_mktsegment FROM customer UNION ALL SELECT CAST(0 AS BIGINT), CAST(NULL AS BIGINT), 'Unknown', 'Unknown'",
    "q_fact" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, CASE WHEN o_custkey % 5 <> 0 THEN o_custkey ELSE 0 END AS cust_sk, o_totalprice * 0.9 AS net FROM orders",
    "q_date_dimension" ->
      "SELECT CAST(d AS TIMESTAMP) AS date, CAST(strftime(d, '%Y%m%d') AS BIGINT) AS date_sk, CAST(year(d) AS BIGINT) AS year, CAST(quarter(d) AS BIGINT) AS quarter, CAST(month(d) AS BIGINT) AS month, CAST(day(d) AS BIGINT) AS day, isodow(d) >= 6 AS is_weekend, CAST(CASE WHEN month(d) >= 10 THEN year(d) + 1 ELSE year(d) END AS BIGINT) AS fiscal_year, CAST(floor(((month(d) - 10 + 12) % 12) / 3) + 1 AS BIGINT) AS fiscal_quarter FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS d) t",
    "q_aggregation_pattern" ->
      "SELECT l_returnflag, sum(l_quantity) AS total_qty, count(*) AS n FROM lineitem GROUP BY l_returnflag HAVING sum(l_quantity) > 0",
    "q_quarantine" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, concat_ws(',', CASE WHEN l_quantity < 1 OR l_quantity > 45 OR l_quantity IS NULL THEN 'qty_range' END, CASE WHEN NOT COALESCE(l_discount <= 0.08, false) THEN 'disc_max' END) AS _rejection_reason, TIMESTAMP '2026-01-01 00:00:00' AS _rejected_at FROM lineitem WHERE (l_quantity < 1 OR l_quantity > 45 OR l_quantity IS NULL) OR (NOT COALESCE(l_discount <= 0.08, false))",
    "q_fk_orphans" ->
      "SELECT * FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 5 <> 0)",
    "q_semantic" ->
      "SELECT o_orderstatus AS status, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders FROM orders GROUP BY 1",
    "q_semantic_derived" ->
      "SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, round((round(sum(o_totalprice), 2)) / nullif((count(*)), 0), 4) AS avg_value FROM orders WHERE (o_orderstatus = 'F') GROUP BY 1",
    "q_hwm_filter" ->
      "SELECT event_id, user_id FROM events WHERE ts > TIMESTAMP '2024-01-02 23:00:00'",
    "q_streaming_append" ->
      "SELECT event_id, user_id, event_type FROM events",
    // the delta streaming source drained every commit exactly once iff
    // the sink aggregates like the source table
    "q_delta_stream_read" ->
      "SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    "q_iceberg_stream_read" ->
      "SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    "q_delta_stream_evolve" ->
      ("SELECT c_mktsegment, count(*) AS n, " +
        "round(sum(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal ELSE 0 END), 2) AS bal, " +
        "min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1"),
    "q_delta_v2_checkpoint" ->
      "SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    "q_convert_timezone" ->
      "SELECT o_orderkey, o_orderdate, timezone('America/New_York', timezone('UTC', o_orderdate)) AS o_local FROM orders",
    "q_lang_id" ->
      "SELECT doc_id, CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_id FROM (SELECT doc_id, list_max([{'score': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','von'], x))), 'lang': 'de'}, {'score': len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))), 'lang': 'en'}, {'score': len(list_filter(toks, x -> list_contains(['el','la','los','y','es','una','por','para','con','del'], x))), 'lang': 'es'}, {'score': len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))), 'lang': 'fr'}, {'score': len(list_filter(toks, x -> list_contains(['il','la','che','e','per','una','con','del','non','sono'], x))), 'lang': 'it'}]) AS best FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '[[:space:][:punct:]]+') AS toks FROM documents) t) s",
    "q_psychrometrics" ->
      "SELECT l_orderkey, l_linenumber, t_c, rh, round(p_sat, 4) AS p_sat, round(hr, 4) AS humidity_ratio, round(243.04 * g / (17.625 - g), 4) AS dew_point, round(1.006 * t_c + hr * (2501.0 + 1.86 * t_c), 4) AS enthalpy FROM (SELECT *, 0.621945 * (rh * p_sat) / (101325.0 - (rh * p_sat)) AS hr, ln(rh) + 17.625 * t_c / (t_c + 243.04) AS g FROM (SELECT l_orderkey, l_linenumber, l_quantity AS t_c, l_discount * 5 + 0.3 AS rh, 610.94 * exp(17.625 * l_quantity / (l_quantity + 243.04)) AS p_sat FROM lineitem) a) b",
    "q_saturation" ->
      "SELECT l_orderkey, l_linenumber, t_c, p_pa, round(psat, 4) AS psat_pa, round(243.04 * g / (17.625 - g), 4) AS rt_tsat_c, round(p_pa * 0.0289647 / (8.314462618 * (t_c + 273.15)), 6) AS density FROM (SELECT *, ln(psat / 610.94) AS g FROM (SELECT l_orderkey, l_linenumber, l_quantity AS t_c, 101325.0 AS p_pa, 610.94 * exp(17.625 * l_quantity / (l_quantity + 243.04)) AS psat FROM lineitem) a) b",
    "q_stream_window" ->
      "SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n FROM events GROUP BY 1, 2",
    // IF97 eq. 30/31 mirrored term-for-term: decimal literals parse to the
    // identical float64 in both engines, and +,-,*,/,sqrt are IEEE-754
    // correctly rounded, so this oracle is bit-exact with NO rounding.
    "q_html_text" ->
      "SELECT doc_id, 'Doc ' || doc_id || chr(10) || trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_out FROM documents",
    "q_theta_distinct" ->
      "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY 1 UNION ALL SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events",
    "q_dedup_report" ->
      """WITH f AS (
        |  SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp,
        |         count(*) AS family_size
        |  FROM documents GROUP BY 1),
        |h AS (SELECT family_size, count(*) AS n_families FROM f GROUP BY 1),
        |t AS (SELECT sum(family_size * n_families) AS total FROM h)
        |SELECT family_size, n_families,
        |       CAST(family_size * n_families AS BIGINT) AS n_rows,
        |       CAST(family_size * n_families AS DOUBLE) / t.total AS row_share
        |FROM h, t""".stripMargin,
    "q_skew_report" ->
      """WITH c1 AS (SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n FROM events GROUP BY 1),
        |t1 AS (SELECT sum(n) AS total, count(*) AS dst FROM c1),
        |r1 AS (SELECT 'event_type' AS "column", key, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        |       FROM c1),
        |c2 AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n FROM events GROUP BY 1),
        |t2 AS (SELECT sum(n) AS total, count(*) AS dst FROM c2),
        |r2 AS (SELECT 'user_id' AS "column", key, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        |       FROM c2)
        |SELECT r1."column", r1.key, r1.n, r1.rank,
        |       CAST(r1.n AS DOUBLE) / t1.total AS share,
        |       CAST(r1.n * t1.dst AS DOUBLE) / t1.total AS skew_factor
        |FROM r1, t1 WHERE r1.rank <= 3
        |UNION ALL
        |SELECT r2."column", r2.key, r2.n, r2.rank,
        |       CAST(r2.n AS DOUBLE) / t2.total AS share,
        |       CAST(r2.n * t2.dst AS DOUBLE) / t2.total AS skew_factor
        |FROM r2, t2 WHERE r2.rank <= 3""".stripMargin,
    "q_canonical_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0 THEN 'https://WWW.Example.com:443/Products/' || (doc_id % 7) || '/?utm_source=news&b=2&a=1#frag'
        |              WHEN doc_id % 4 = 1 THEN 'http://user:pw@Example.COM:80?gclid=abc&z=9'
        |              WHEN doc_id % 4 = 2 THEN 'https://site.org/a/b'
        |              ELSE 'not a url at all ' || doc_id END AS url
        |  FROM documents),
        |c AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nf FROM u),
        |p AS (SELECT *,
        |  lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_replace(regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1), '^.*@', '')) AS auth,
        |  regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
        |  regexp_extract(nf, '\?([^#]*)', 1) AS q0
        |  FROM c),
        |h AS (SELECT *,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |       ELSE auth END AS host,
        |  CASE WHEN path0 = '' THEN '/'
        |       WHEN path0 <> '/' THEN regexp_replace(path0, '/$', '')
        |       ELSE path0 END AS pth,
        |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
        |    x -> len(x) > 0 AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$'))), '&') AS kept
        |  FROM p)
        |SELECT doc_id, url,
        |       CASE WHEN regexp_matches(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
        |            THEN scheme || '://' || host || pth ||
        |                 CASE WHEN len(kept) > 0 THEN '?' || kept ELSE '' END
        |            ELSE url END AS canonical
        |FROM h""".stripMargin,
    "q_wet_bulb" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS t_c,
        |         l_discount * 5 + 0.3 AS rh,
        |         (l_discount * 5 + 0.3) * 100.0 AS p
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, t_c, rh,
        |       round(t_c * atan(0.151977 * sqrt(p + 8.313659)) + atan(t_c + p)
        |             - atan(p - 1.676331)
        |             + 0.00391838 * p * sqrt(p) * atan(0.023101 * p)
        |             - 4.686035, 4) AS wet_bulb
        |FROM base""".stripMargin,
    "q_if97_sat" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_quantity * 7.0 + 280.0 AS t_k,
        |         l_extendedprice * 10.0 AS p_pa
        |  FROM lineitem),
        |fwd AS (
        |  SELECT *, t_k + (-0.23855557567849) / (t_k - 0.65017534844798e3) AS theta
        |  FROM base),
        |abc AS (
        |  SELECT *,
        |         theta * theta + 0.11670521452767e4 * theta + (-0.72421316703206e6) AS a,
        |         (-0.17073846940092e2) * theta * theta + 0.12020824702470e5 * theta + (-0.32325550322333e7) AS b,
        |         0.14915108613530e2 * theta * theta + (-0.48232657361591e4) * theta + 0.40511340542057e6 AS c
        |  FROM fwd),
        |px AS (
        |  SELECT *, 2.0 * c / (-b + sqrt(b * b - 4.0 * a * c)) AS x FROM abc),
        |inv AS (
        |  SELECT *, sqrt(sqrt(p_pa / 1000000.0)) AS beta FROM px),
        |efg AS (
        |  SELECT *,
        |         beta * beta + (-0.17073846940092e2) * beta + 0.14915108613530e2 AS e,
        |         0.11670521452767e4 * beta * beta + 0.12020824702470e5 * beta + (-0.48232657361591e4) AS f,
        |         (-0.72421316703206e6) * beta * beta + (-0.32325550322333e7) * beta + 0.40511340542057e6 AS g
        |  FROM inv),
        |dd AS (
        |  SELECT *, 2.0 * g / (-f - sqrt(f * f - 4.0 * e * g)) AS d FROM efg),
        |ss AS (
        |  SELECT *, 0.65017534844798e3 + d AS s FROM dd)
        |SELECT l_orderkey, l_linenumber, t_k, p_pa,
        |       (x * x) * (x * x) * 1000000.0 AS psat_pa,
        |       (s - sqrt(s * s - 4.0 * ((-0.23855557567849) + 0.65017534844798e3 * d))) / 2.0 AS tsat_k
        |FROM ss""".stripMargin,
    "q_fluid_props_air" -> prOracleSql("air"),
    "q_fluid_props_r134a" -> prOracleSql("r134a",
      tExpr = "l_quantity + 280.0", pExpr = "l_extendedprice * 30.0"),
    "q_avro_roundtrip" ->
      "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders GROUP BY 1",
    "q_chunk_text" ->
      "SELECT doc_id, chunk_idx, array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk_text, CAST(least(n - chunk_idx*48, 64) AS BIGINT) AS n_tokens FROM (SELECT doc_id, toks, n, unnest(generate_series(0, k-1)) AS chunk_idx FROM (SELECT doc_id, toks, len(toks) AS n, greatest(CAST(ceil((len(toks)-64)/48.0) AS BIGINT)+1, 1) AS k FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)))",
    "q_warc_roundtrip" ->
      "SELECT count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes, min('https://corpus.example/' || doc_id) AS min_uri, max('https://corpus.example/' || doc_id) AS max_uri FROM documents",
    "q_excel_roundtrip" ->
      "SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    // rows travel parquet → Derby → Spark-jdbc; the oracle replays the
    // pushdown WHERE on the original parquet
    "q_jdbc_read" ->
      "SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer WHERE c_acctbal > 1000",
    // rows travel JSON pages → pagination loop → spark.read.json
    "q_api_read" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q_delta_timetravel" ->
      "SELECT n_nationkey, n_name, n_regionkey, 0 AS ver FROM nation UNION ALL SELECT n_nationkey, n_name, n_regionkey, 1 AS ver FROM nation WHERE (n_nationkey % 2 = 0) OR (n_regionkey <> 0)",
    "q_delta_roundtrip" ->
      "SELECT ver, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 1 AS ver, o_orderstatus, o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1) UNION ALL SELECT 2 AS ver, o_orderstatus, o_totalprice, o_orderkey FROM orders WHERE o_totalprice > 150000) GROUP BY 1, 2",
    "q_iceberg_partition_prune" ->
      "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders WHERE o_orderstatus = 'F' GROUP BY 1",
    "q_iceberg_optimize" ->
      "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders GROUP BY 1",
    "q_iceberg_roundtrip" ->
      "SELECT ver, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 1 AS ver, o_orderstatus, o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 = 0 UNION ALL SELECT 2 AS ver, o_orderstatus, o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1)) GROUP BY 1, 2",
    // position deletes: live = neither predicate matched (survives the
    // MOR compaction untouched); initial = the pre-delete snapshot
    "q_iceberg_delete" ->
      "SELECT state, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 'live' AS state, o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE NOT (o_totalprice > 180000) AND NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0) UNION ALL SELECT 'initial', o_orderkey, o_orderstatus, o_totalprice FROM orders) GROUP BY 1, 2",
    // equality deletes: keys % 10 vanish scan-free; the later append
    // re-inserts keys % 100 as REBORN rows, which SURVIVE the delete
    // (and the MOR compaction) because their data sequence is higher
    "q_iceberg_eq_delete" ->
      "SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 10 <> 0 UNION ALL SELECT c_custkey, c_acctbal, 'REBORN' FROM customer WHERE c_custkey % 100 = 0) GROUP BY 1",
    "q_iceberg_changes" ->
      "SELECT ver, change_type, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 1 AS ver, 'insert' AS change_type, o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 = 0 UNION ALL SELECT 2, 'insert', o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 = 1 UNION ALL SELECT 3, 'delete', o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1) UNION ALL SELECT 3, 'insert', o_totalprice, o_orderkey FROM orders WHERE o_totalprice > 150000) GROUP BY 1, 2",
    "q_delta_changes" ->
      "SELECT ver, change_type, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 0 AS ver, 'insert' AS change_type, o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 = 0 UNION ALL SELECT 1, 'insert', o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 = 1 UNION ALL SELECT 2, 'delete', o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1) UNION ALL SELECT 2, 'insert', o_totalprice, o_orderkey FROM orders WHERE o_totalprice > 150000) GROUP BY 1, 2",
    // DV deletes: live = neither predicate matched; del_v1 = the first
    // delete's predicate; del_v2 = the second predicate MINUS rows the
    // first delete already vectored away (the merge never re-deletes)
    "q_delta_dv_delete" ->
      "SELECT change_type, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM (SELECT 'live' AS change_type, o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE NOT (o_totalprice > 180000) AND NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0) UNION ALL SELECT 'del_v1', o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 180000 UNION ALL SELECT 'del_v2', o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0 AND NOT (o_totalprice > 180000)) GROUP BY 1, 2",
    // OPTIMIZE + ZORDER are metadata-only rewrites: the compacted +
    // re-clustered table must aggregate exactly like the source rows
    // the restore rewinds past a DV delete and a schema-evolving merge:
    // the read-back IS the original table
    "q_delta_restore" ->
      "SELECT * FROM customer",
    // the rename is metadata-only, so the renamed-table aggregate equals
    // the same aggregate over the ORIGINAL column — alias resolution is
    // exactly what makes the two file generations agree
    "q_iceberg_rename" ->
      "SELECT c_custkey % 2 AS gen, count(*) AS n, round(sum(c_acctbal), 2) AS total_balance, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    // nested renames are metadata-only too: the renamed-member aggregate
    // equals the same aggregate over the ORIGINAL flat columns — the
    // member-level alias (iceberg) / nested physical name (delta) is
    // exactly what makes the two file generations agree
    "q_iceberg_nested_rename" ->
      "SELECT c_custkey % 2 AS gen, count(*) AS n, round(sum(c_acctbal), 2) AS total_balance, CAST(sum(c_nationkey) AS BIGINT) AS total_nat, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    "q_delta_nested_rename" ->
      "SELECT c_custkey % 2 AS gen, count(*) AS n, round(sum(c_acctbal), 2) AS total_balance, CAST(sum(c_nationkey) AS BIGINT) AS total_nat, min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer GROUP BY 1",
    "q_iceberg_rollback" ->
      "SELECT * FROM customer WHERE c_custkey % 2 = 0",
    "q_delta_optimize" ->
      "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS revenue, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders GROUP BY 1",
    // data skipping is an optimization, never a semantics change: the
    // skipped read must equal a plain filtered aggregate of the source
    "q_delta_skipping" ->
      "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty, round(sum(l_extendedprice), 2) AS revenue, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 2000 GROUP BY 1",
    "q_iceberg_skipping" ->
      "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty, round(sum(l_extendedprice), 2) AS revenue, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 2000 GROUP BY 1",
    "q_iceberg_hidden_partition" ->
      "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty, round(sum(l_extendedprice), 2) AS revenue, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1",
    // the deterministic simulation columns recomputed as closed forms of
    // (entity, tick): same grid, same sinusoid constant (2*pi()/24 is the
    // identical float64 as the Scala 2*math.Pi/24), same event window.
    // DuckDB dow is 0=Sunday; Spark dayofweek is 1=Sunday, hence dow+1
    "q_simulation_deterministic" ->
      """WITH ids AS (SELECT unnest(range(0, 10000)) AS id),
        |base AS (
        |  SELECT id,
        |         'entity_' || CAST(id // 200 AS VARCHAR) AS entity_id,
        |         id % 200 AS tick,
        |         TIMESTAMP '2026-01-01 00:00:00' + to_seconds((id % 200) * 1800) AS ts
        |  FROM ids),
        |loaded AS (
        |  SELECT *, 1.0 + 0.5 * cos(CAST(extract(hour FROM ts) - 14 AS DOUBLE) * (2 * pi() / 24)) AS load
        |  FROM base)
        |SELECT id, entity_id, tick, ts,
        |       round(load * 100, 2) AS load_pct,
        |       round(load * 1.8 + 32, 6) AS load_f,
        |       (extract(hour FROM ts) BETWEEN 2 AND 3) AND ((extract(dow FROM ts) + 1) = 5) AS down,
        |       CASE WHEN entity_id = 'entity_3'
        |                 AND ts >= TIMESTAMP '2026-01-01 01:00:00'
        |                 AND ts < TIMESTAMP '2026-01-01 01:30:00'
        |            THEN 0.0 ELSE 100.0 END AS pressure
        |FROM loaded""".stripMargin,
    "q_multimodal_features" ->
      "SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, sha256(text) AS sha FROM documents",
    "q_harmonize_schema" ->
      "SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal, CAST(NULL AS VARCHAR) AS missing_col FROM customer",
    "q_unit_convert" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_quantity * 2.2046226218487757 + 0.0 AS qty_lb, round((l_discount * 100) * 1.7999999999999998 + 31.999999999999986, 6) AS t_f FROM lineitem",
    "q_topk_values" ->
      "SELECT user_id, event_type, n, rank FROM (SELECT user_id, event_type, count(*) AS n, CAST(row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) AS BIGINT) AS rank FROM events GROUP BY 1, 2) t WHERE rank <= 2",
    "q_asof_join" ->
      "WITH l AS (SELECT user_id, event_id, value, date_trunc('second', ts) AS lts FROM events), r AS (SELECT user_id, date_trunc('second', ts) AS rts, max(value) AS purchase_value FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) SELECT l.user_id, l.event_id, l.value, CAST(floor(epoch(r.rts)) AS BIGINT) AS asof_s, r.purchase_value FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts >= r.rts",
    "q_range_join" ->
      "WITH l AS (SELECT user_id, event_id, date_trunc('second', ts) AS pts FROM events), r AS (SELECT user_id, date_trunc('second', ts) AS ws, date_trunc('second', ts) + INTERVAL 1 HOUR AS we FROM events WHERE event_type = 'error') SELECT l.user_id, l.event_id, CAST(floor(epoch(r.ws)) AS BIGINT) AS win_s FROM l JOIN r ON l.user_id = r.user_id AND l.pts >= r.ws AND l.pts < r.we",
    "q_salted_agg" ->
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(l_quantity) AS n, max(l_quantity) AS max_qty FROM lineitem GROUP BY 1",
    "q_phases" ->
      "WITH p AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), q AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS phase_id FROM p) SELECT user_id, CAST(phase_id AS BIGINT) AS phase_id, event_type, count(*) AS n_rows, CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s, sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS total_value FROM q GROUP BY 1, 2, 3"
  )
}
