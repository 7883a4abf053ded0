package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: times the headline queries from BASELINE.md (scan+filter,
 * join, agg, window, pivot, dedup suite, ANN, mixing, streaming) on
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
 *
 * Each query runs `RUNS` times (default 3) and reports the BEST time:
 * single runs on a shared box swing ±30%, and the best-of-N is the stable
 * estimator of the plan's true cost (JIT + page-cache warm, no GC luck).
 * The first timed run still includes each plan's one-time analysis cost —
 * the session-level warmup below only absorbs session/codegen bring-up.
 */
object Bench {
  // BASELINE.md headline set + the training-data-pipeline ops.
  private val headline = Seq(
    "q_filter_rows", "q_join_inner", "q_aggregate", "q_row_number",
    "q_pivot", "q_deduplicate", "q_sessionize", "q_window_calc",
    "q_exact_dedup", "q_minhash_pairs", "q_simhash_pairs", "q_ann_topk",
    "q_ivf_topk", "q_token_count", "q_quality_score", "q_scd2",
    "q_merge_upsert", "q_salted_agg", "q_asof_join", "q_streaming_append",
    "q_pack_sequences", "q_segment_dedup", "q_url_filter", "q_profile",
    "q_weighted_mix", "q_contamination",
    // round-7 additions: the remaining heavy operators
    "q_weighted_mix_tokens", "q_range_join", "q_ngram_jaccard_pairs",
    "q_embedding_neardup", "q_lsh_topk", "q_stream_window",
    "q_cluster_components",
    // native source paths + chunking: track scan/IO-bound ops per round
    "q_avro_roundtrip", "q_chunk_text",
    // substring-granularity + semantic dedup (round-7 session-3 additions)
    "q_crossdoc_ngrams", "q_remove_spans", "q_semantic_dedup",
    "q_dsir_weights", "q_perplexity",
    // round-8 additions: Delta maintenance, learned BPE, quality classifier
    "q_delta_optimize", "q_bpe_tokens", "q_quality_classifier",
    // r8 additions: fuzzy matching + mergeable quantiles
    "q_fuzzy_join", "q_entity_resolution", "q_kll_quantiles",
    // r8 additions: WARC ingestion + PQ-quantized ANN + Delta CDF + Iceberg
    "q_warc_roundtrip", "q_ivfpq_topk", "q_delta_changes", "q_iceberg_roundtrip",
    // r8 additions: incremental Iceberg + time-series regularization
    "q_iceberg_changes", "q_resample", "q_rolling_agg",
    // r8 additions: dataset card + multi-epoch mixing
    "q_corpus_report", "q_epochs_mix",
    // r8 session-3 additions: IF97 EOS, unicode normalization, bloom
    // incremental dedup, TF-IDF keywords
    "q_if97_props", "q_normalize_unicode", "q_bloom_dedup", "q_tfidf",
    "q_html_text", "q_wet_bulb",
    // r8 session-3: sketch set algebra, url canonicalization, audits
    "q_theta_distinct", "q_canonical_url", "q_dedup_report", "q_skew_report")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // iterate on a subset: SPARK_GRAFT_BENCH_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: session/codegen/parquet-footer costs land here, not in q1
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val qs = SparkEntry.queries
    val results = headline.filter(n => only.forall(_.contains(n))).flatMap { name =>
      qs.get(name).map { fn =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
          val dt = (System.nanoTime() - t0) / 1e9
          if (n < 0) System.err.println(s"[bench] $name FAILED")
          dt
        }
        name -> times.min
      }
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
