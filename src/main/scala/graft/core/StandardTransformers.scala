package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, expr, lit}

import graft.operators._
import graft.functions.TextAnalysis

/**
 * Registers the full operator library under the reference's transformer
 * names (odibi/transformers/__init__.py:24-153) so YAML `function:` steps
 * reach every operator. Params arrive as YAML-decoded maps (insertion-
 * ordered) and are translated to the typed operator signatures here.
 */
object StandardTransformers {

  // ---- param helpers -------------------------------------------------
  private def str(p: Map[String, Any], k: String): String = p.get(k) match {
    case Some(v) => v.toString
    case None => throw new IllegalArgumentException(s"missing param: $k")
  }
  private def strOpt(p: Map[String, Any], k: String): Option[String] =
    p.get(k).map(_.toString)
  private def intOpt(p: Map[String, Any], k: String): Option[Int] =
    p.get(k).map(_.toString.toInt)
  private def boolOpt(p: Map[String, Any], k: String): Option[Boolean] =
    p.get(k).map(_.toString.toBoolean)
  private def seqOf(p: Map[String, Any], k: String): Seq[String] =
    p.get(k).map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Nil)
  private def mapOf(p: Map[String, Any], k: String): Seq[(String, String)] =
    p.get(k).map(_.asInstanceOf[Map[String, Any]].toSeq.map { case (a, b) => a -> b.toString })
      .getOrElse(Nil)
  private def cols(names: Seq[String]): Seq[Column] = names.map { n =>
    if (n.endsWith(" desc")) col(n.stripSuffix(" desc")).desc else col(n)
  }
  /** schema_mode / on_new_columns / on_missing_columns → policy
    * (reference SchemaMode/OnNewColumns/OnMissingColumns enums). */
  private def schemaPolicy(p: Map[String, Any]): graft.sources.DeltaSchema.Policy =
    graft.sources.DeltaSchema.Policy(
      strOpt(p, "schema_mode").getOrElse("enforce"),
      strOpt(p, "on_new_columns").getOrElse("add_nullable"),
      strOpt(p, "on_missing_columns").getOrElse("fill_null"))

  private def reg(n: String)(fn: (EngineContext, Map[String, Any]) => DataFrame): Unit =
    TransformerRegistry.register(new Transformer {
      override def name: String = n
      override def apply(ctx: EngineContext, params: Map[String, Any]): DataFrame =
        fn(ctx, params)
    })

  /** Idempotent registration of all standard transformers. */
  lazy val registerAll: Unit = {
    // ---- sql_core (28) ----
    reg("filter_rows") { (c, p) => SqlCore.filterRows(c.df, str(p, "condition")) }
    reg("derive_columns") { (c, p) => SqlCore.deriveColumns(c.df, mapOf(p, "derivations")) }
    reg("cast_columns") { (c, p) => SqlCore.castColumns(c.df, mapOf(p, "casts").toMap) }
    reg("clean_text") { (c, p) =>
      SqlCore.cleanText(c.df, seqOf(p, "columns"),
        boolOpt(p, "trim").getOrElse(true), strOpt(p, "case").getOrElse("preserve")) }
    reg("extract_date_parts") { (c, p) =>
      SqlCore.extractDateParts(c.df, str(p, "source_col"),
        strOpt(p, "prefix").getOrElse(""),
        if (seqOf(p, "parts").nonEmpty) seqOf(p, "parts") else Seq("year", "month", "day")) }
    reg("normalize_schema") { (c, p) =>
      SqlCore.normalizeSchema(c.df, mapOf(p, "rename").toMap, seqOf(p, "drop"),
        seqOf(p, "select_order")) }
    reg("sort") { (c, p) =>
      SqlCore.sort(c.df, seqOf(p, "by"),
        p.get("ascending").map(_.asInstanceOf[Seq[Any]].map(_.toString.toBoolean))
          .getOrElse(Nil)) }
    reg("limit") { (c, p) =>
      SqlCore.limitRows(c.df, str(p, "n").toInt, intOpt(p, "offset").getOrElse(0)) }
    reg("sample") { (c, p) =>
      SqlCore.sample(c.df, str(p, "fraction").toDouble,
        intOpt(p, "seed").map(_.toLong).getOrElse(42L)) }
    reg("distinct") { (c, p) => SqlCore.distinctRows(c.df, seqOf(p, "columns")) }
    reg("fill_nulls") { (c, p) => SqlCore.fillNulls(c.df, mapOf(p, "values").toMap) }
    reg("split_part") { (c, p) =>
      SqlCore.splitPart(c.df, str(p, "column"), str(p, "delimiter"),
        str(p, "index").toInt, strOpt(p, "output_col")) }
    reg("date_add") { (c, p) =>
      SqlCore.dateAdd(c.df, str(p, "column"), str(p, "amount").toInt,
        strOpt(p, "unit").getOrElse("day"), strOpt(p, "output_col")) }
    reg("date_trunc") { (c, p) =>
      SqlCore.dateTrunc(c.df, str(p, "column"), str(p, "unit"), strOpt(p, "output_col")) }
    reg("date_diff") { (c, p) =>
      SqlCore.dateDiff(c.df, str(p, "start_col"), str(p, "end_col"),
        str(p, "unit"), str(p, "output_col")) }
    reg("case_when") { (c, p) =>
      val cases = p("cases").asInstanceOf[Seq[Any]].map { x =>
        val m = x.asInstanceOf[Map[String, Any]]
        m("when").toString -> m("then").toString
      }
      SqlCore.caseWhen(c.df, cases, strOpt(p, "default"), str(p, "output_col")) }
    reg("convert_timezone") { (c, p) =>
      SqlCore.convertTimezone(c.df, str(p, "column"), str(p, "source_tz"),
        str(p, "target_tz"), strOpt(p, "output_col")) }
    reg("concat_columns") { (c, p) =>
      SqlCore.concatColumns(c.df, seqOf(p, "columns"),
        strOpt(p, "separator").getOrElse(""), str(p, "output_col")) }
    reg("select_columns") { (c, p) => SqlCore.selectColumns(c.df, seqOf(p, "columns")) }
    reg("drop_columns") { (c, p) => SqlCore.dropColumns(c.df, seqOf(p, "columns")) }
    reg("rename_columns") { (c, p) => SqlCore.renameColumns(c.df, mapOf(p, "mapping").toMap) }
    reg("add_prefix") { (c, p) =>
      SqlCore.addPrefix(c.df, str(p, "prefix"), seqOf(p, "columns"), seqOf(p, "exclude")) }
    reg("add_suffix") { (c, p) =>
      SqlCore.addSuffix(c.df, str(p, "suffix"), seqOf(p, "columns"), seqOf(p, "exclude")) }
    reg("normalize_column_names") { (c, p) =>
      SqlCore.normalizeColumnNames(c.df, strOpt(p, "style").getOrElse("snake_case"),
        boolOpt(p, "lowercase").getOrElse(true),
        boolOpt(p, "remove_special").getOrElse(true)) }
    reg("coalesce_columns") { (c, p) =>
      SqlCore.coalesceColumns(c.df, seqOf(p, "columns"), str(p, "output_col"),
        boolOpt(p, "drop_source").getOrElse(false)) }
    reg("replace_values") { (c, p) =>
      SqlCore.replaceValues(c.df, seqOf(p, "columns"), mapOf(p, "mapping")) }
    reg("trim_whitespace") { (c, p) => SqlCore.trimWhitespace(c.df, seqOf(p, "columns")) }
    reg("row_number") { (c, p) =>
      SqlCore.rowNumber(c.df, str(p, "output"), seqOf(p, "partition_by"),
        cols(seqOf(p, "order_by"))) }

    // ---- relational (5) ----
    reg("join") { (c, p) =>
      // YAML 1.1 parses a bare `on:` key as boolean true — accept both
      val onKeys = if (seqOf(p, "on").nonEmpty) seqOf(p, "on") else seqOf(p, "true")
      Relational.join(c.df, c.dataset(str(p, "right_dataset")), onKeys,
        strOpt(p, "how").getOrElse("inner"), strOpt(p, "prefix").getOrElse("right"),
        boolOpt(p, "broadcast_right").getOrElse(false)) }
    reg("union") { (c, p) =>
      Relational.union(c.df +: seqOf(p, "datasets").map(c.dataset),
        boolOpt(p, "by_name").getOrElse(true)) }
    reg("pivot") { (c, p) =>
      Relational.pivot(c.df, seqOf(p, "group_by"), str(p, "pivot_col"),
        str(p, "agg_col"), strOpt(p, "agg_func").getOrElse("sum"), seqOf(p, "values")) }
    reg("unpivot") { (c, p) =>
      Relational.unpivot(c.df, seqOf(p, "id_cols"), seqOf(p, "value_vars"),
        strOpt(p, "var_name").getOrElse("variable"),
        strOpt(p, "value_name").getOrElse("value")) }
    reg("aggregate") { (c, p) =>
      Relational.aggregate(c.df, seqOf(p, "group_by"), mapOf(p, "aggregations")) }

    // ---- advanced (17) ----
    reg("deduplicate") { (c, p) =>
      Advanced.deduplicate(c.df, seqOf(p, "keys"), cols(seqOf(p, "order_by"))) }
    reg("explode_list_column") { (c, p) =>
      Advanced.explodeListColumn(c.df, str(p, "column"),
        boolOpt(p, "outer").getOrElse(false), strOpt(p, "output_col")) }
    reg("dict_based_mapping") { (c, p) =>
      Advanced.dictBasedMapping(c.df, str(p, "column"), mapOf(p, "mapping"),
        strOpt(p, "default"), str(p, "output_column")) }
    reg("regex_replace") { (c, p) =>
      Advanced.regexReplace(c.df, str(p, "column"), str(p, "pattern"),
        str(p, "replacement"), strOpt(p, "output_col")) }
    reg("unpack_struct") { (c, p) =>
      Advanced.unpackStruct(c.df, str(p, "column"),
        boolOpt(p, "drop_source").getOrElse(true)) }
    reg("hash_columns") { (c, p) =>
      Advanced.hashColumns(c.df, seqOf(p, "columns"),
        strOpt(p, "algorithm").getOrElse("sha256")) }
    reg("generate_surrogate_key") { (c, p) =>
      Advanced.generateSurrogateKey(c.df, seqOf(p, "columns"), str(p, "output_col"),
        strOpt(p, "separator").getOrElse("|")) }
    reg("generate_numeric_key") { (c, p) =>
      Advanced.generateNumericKey(c.df, seqOf(p, "columns"), str(p, "output_col"),
        strOpt(p, "coalesce_with"), strOpt(p, "separator").getOrElse("|")) }
    reg("parse_json") { (c, p) =>
      Advanced.parseJson(c.df, str(p, "column"), str(p, "json_schema"),
        strOpt(p, "output_col")) }
    reg("validate_and_flag") { (c, p) =>
      Advanced.validateAndFlag(c.df, mapOf(p, "rules"),
        strOpt(p, "flag_col").getOrElse("_validation_flags")) }
    reg("window_calculation") { (c, p) =>
      Advanced.windowCalculation(c.df, str(p, "function"), seqOf(p, "partition_by"),
        seqOf(p, "order_by"), str(p, "target_col")) }
    reg("normalize_json") { (c, p) => Advanced.normalizeJson(c.df, str(p, "column")) }
    reg("sessionize") { (c, p) =>
      Advanced.sessionize(c.df, str(p, "user_col"), str(p, "ts_col"),
        str(p, "threshold_seconds").toLong,
        strOpt(p, "session_col").getOrElse("session_id")) }
    reg("stratified_sample") { (c, p) =>
      Sampling.stratifiedSample(c.df, seqOf(p, "strata"),
        str(p, "n").toInt, seqOf(p, "key")) }
    reg("repetition_stats") { (c, p) =>
      TextAnalysis.repetitionStats(c.df, str(p, "column")) }
    reg("scrub_pii") { (c, p) =>
      TextAnalysis.scrubPii(c.df, str(p, "column"), strOpt(p, "output_col")) }
    reg("normalize_unicode") { (c, p) =>
      TextAnalysis.normalizeUnicode(c.df, str(p, "column"),
        strOpt(p, "form").getOrElse("NFC"), strOpt(p, "output_col")) }
    reg("dedup_report") { (c, p) =>
      Dedup.dedupReport(c.df, str(p, "id_col"), str(p, "text_col")) }
    reg("skew_report") { (c, p) =>
      graft.operators.Skew.skewReport(c.df, seqOf(p, "columns"),
        intOpt(p, "top_k").getOrElse(5)) }
    reg("canonicalize_url") { (c, p) =>
      c.df.withColumn(strOpt(p, "output_col").getOrElse(str(p, "column")),
        TextAnalysis.canonicalizeUrl(
          org.apache.spark.sql.functions.col(str(p, "column")))) }
    reg("html_to_text") { (c, p) =>
      c.df.withColumn(strOpt(p, "output_col").getOrElse(str(p, "column")),
        TextAnalysis.htmlToText(org.apache.spark.sql.functions.col(str(p, "column")))) }
    reg("tfidf_top_terms") { (c, p) =>
      TextAnalysis.tfidfTopTerms(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "k").getOrElse(5), intOpt(p, "min_term_len").getOrElse(1)) }
    reg("ngram_contamination") { (c, p) =>
      Dedup.ngramContamination(c.df, str(p, "id_col"), str(p, "text_col"),
        c.dataset(str(p, "benchmark")), strOpt(p, "benchmark_text_col")
          .getOrElse(str(p, "text_col")),
        intOpt(p, "n").getOrElse(8),
        p.get("threshold").map(_.toString.toDouble).getOrElse(0.1)) }
    // streaming windowed aggregation steps (work on streaming frames in a
    // YAML node's steps:; batch frames are also accepted by the built-ins)
    reg("window_agg") { (c, p) =>
      graft.streaming.Streaming.windowedAgg(c.df, str(p, "ts_col"),
        str(p, "watermark"), str(p, "window"), strOpt(p, "slide"),
        seqOf(p, "group_by"), mapOf(p, "aggs")) }
    reg("session_window_agg") { (c, p) =>
      graft.streaming.Streaming.sessionWindowAgg(c.df, str(p, "ts_col"),
        str(p, "watermark"), str(p, "gap"), seqOf(p, "group_by"),
        mapOf(p, "aggs")) }
    reg("resample") { (c, p) =>
      graft.operators.TimeSeries.resample(c.df, str(p, "ts_col"),
        seqOf(p, "value_cols"), str(p, "step_seconds").toLong,
        seqOf(p, "group_by"), strOpt(p, "strategy").getOrElse("ffill")) }
    reg("epochs_mix") { (c, p) =>
      val epochs = p.get("epochs") match {
        case Some(m: Map[_, _]) =>
          m.map { case (k, v) => k.toString -> v.toString.toDouble }
        case _ => Map.empty[String, Double]
      }
      graft.operators.Sampling.epochsMix(c.df, str(p, "id_col"),
        str(p, "source_col"), epochs,
        strOpt(p, "default_epochs").map(_.toDouble).getOrElse(1.0),
        strOpt(p, "out_col").getOrElse("epoch_idx")) }
    reg("corpus_report") { (c, p) =>
      graft.functions.TextAnalysis.corpusReport(c.df, str(p, "text_col"),
        seqOf(p, "group_by")) }
    reg("flag_outliers") { (c, p) =>
      graft.operators.TimeSeries.flagOutliers(c.df, str(p, "ts_col"),
        str(p, "value_col"), str(p, "window_seconds").toLong,
        strOpt(p, "k").map(_.toDouble).getOrElse(3.0),
        seqOf(p, "group_by"), strOpt(p, "flag_col").getOrElse("is_outlier")) }
    reg("rolling_agg") { (c, p) =>
      graft.operators.TimeSeries.rollingAgg(c.df, str(p, "ts_col"),
        str(p, "function"), str(p, "window_seconds").toLong,
        seqOf(p, "group_by"), strOpt(p, "out_col").getOrElse("rolling")) }
    reg("stream_join") { (c, p) =>
      graft.streaming.Streaming.streamStreamJoin(
        c.df, c.dataset(str(p, "right_dataset")),
        str(p, "left_ts"), str(p, "right_ts"), str(p, "watermark"),
        str(p, "condition"), strOpt(p, "how").getOrElse("inner")) }
    reg("dedup_within_watermark") { (c, p) =>
      graft.streaming.Streaming.dedupWithinWatermark(c.df, seqOf(p, "keys"),
        str(p, "ts_col"), str(p, "watermark")) }
    reg("split_events_by_period") { (c, p) =>
      Advanced.splitEventsByPeriod(c.df, str(p, "start_col"), str(p, "end_col"),
        strOpt(p, "period").getOrElse("day"),
        strOpt(p, "duration_col").getOrElse("duration_seconds")) }
    reg("flatten_struct") { (c, p) =>
      Advanced.flattenStruct(c.df, str(p, "column"),
        strOpt(p, "separator").getOrElse("_"),
        intOpt(p, "depth").getOrElse(Int.MaxValue),
        boolOpt(p, "drop_source").getOrElse(true)) }
    reg("apply_mapping") { (c, p) =>
      Advanced.applyMapping(c.df, c.dataset(str(p, "mapping_source")),
        str(p, "source_key"), str(p, "lookup_key"), str(p, "lookup_value"),
        str(p, "output_col"), strOpt(p, "default")) }

    // ---- warehouse heavy-lifters ----
    reg("scd2") { (c, p) =>
      Scd.scd2Apply(c.dataset(str(p, "target_dataset")), c.df, seqOf(p, "keys"),
        seqOf(p, "track_cols"), lit(str(p, "effective_ts")),
        closeDeleted = boolOpt(p, "close_deleted").getOrElse(false)) }
    reg("merge") { (c, p) =>
      val target = c.dataset(str(p, "target_dataset"))
      strOpt(p, "strategy").getOrElse("upsert") match {
        case "upsert" => Merge.upsert(target, c.df, seqOf(p, "keys"),
          strOpt(p, "update_condition"), strOpt(p, "insert_condition"))
        case "append_only" => Merge.appendOnly(target, c.df, seqOf(p, "keys"))
        case "delete_match" => Merge.deleteMatch(target, c.df, seqOf(p, "keys"),
          strOpt(p, "delete_condition"))
        case other => throw new IllegalArgumentException(s"unknown strategy: $other")
      } }
    reg("merge_delta") { (c, p) =>
      // file-scoped copy-on-write MERGE against a Delta TABLE (reference
      // merge_transformer.py:232-590 Delta path): matched rows become
      // DV bitmaps, replacements/inserts land in new files, one atomic
      // commit — write amplification tracks touched files, not table
      // size. Returns the post-merge read.
      val path = str(p, "target_path")
      val keys = seqOf(p, "keys")
      val cdf = boolOpt(p, "cdf").getOrElse(true)
      // schema_mode enforce|evolve + on_new_columns/on_missing_columns —
      // the reference autoMerge/SchemaPolicy knobs (config.py:4355-4395)
      val policy = schemaPolicy(p)
      strOpt(p, "strategy").getOrElse("upsert") match {
        case "upsert" => graft.sources.DeltaMerge.upsert(c.spark, path, c.df,
          keys, strOpt(p, "update_condition"), strOpt(p, "insert_condition"),
          cdf = cdf, schemaPolicy = policy)
        case "append_only" =>
          graft.sources.DeltaMerge.appendOnly(c.spark, path, c.df, keys,
            cdf = cdf, schemaPolicy = policy)
        case "delete_match" => graft.sources.DeltaMerge.deleteMatch(c.spark,
          path, c.df, keys, strOpt(p, "delete_condition"), cdf = cdf)
        case other => throw new IllegalArgumentException(s"unknown strategy: $other")
      }
      graft.sources.DeltaLog.read(c.spark, path) }
    reg("scd2_delta") { (c, p) =>
      // SCD2 against a Delta TABLE through the file-scoped merge
      // (reference scd.py:553-736 optimized Delta path): only changed
      // current rows are touched; history keeps its bytes.
      graft.sources.DeltaMerge.scd2Apply(c.spark, str(p, "target_path"),
        c.df, seqOf(p, "keys"), seqOf(p, "track_cols"),
        lit(str(p, "effective_ts")),
        closeDeleted = boolOpt(p, "close_deleted").getOrElse(false),
        cdf = boolOpt(p, "cdf").getOrElse(true),
        schemaPolicy = schemaPolicy(p))
      graft.sources.DeltaLog.read(c.spark, str(p, "target_path")) }
    reg("detect_deletes") { (c, p) =>
      val deleted = DeleteDetection.detectSqlCompare(
        c.dataset(str(p, "target_dataset")), c.df, seqOf(p, "keys"))
      DeleteDetection.applySoft(c.dataset(str(p, "target_dataset")), deleted,
        seqOf(p, "keys")) }
    reg("detect_deletes_dv") { (c, p) =>
      // hard delete against a DELTA target as a DELETION-VECTOR commit
      // (reference delete_detection.py:657-681 posture): keys present in
      // the target but missing from the live source are marked deleted
      // via bitmaps — at 100 TB a handful of vanished keys moves
      // kilobytes, where the frame-level applyHard rewrite moves files.
      // Returns the post-delete target read. `max_delete_fraction`
      // guards a collapsed upstream exactly like the soft/hard paths.
      val path = str(p, "target_path")
      val keys = seqOf(p, "keys")
      val target = graft.sources.DeltaLog.read(c.spark, path)
      val deleted = DeleteDetection.detectSqlCompare(target, c.df, keys)
      DeleteDetection.checkThreshold(target, deleted,
        p.get("max_delete_fraction").map(_.toString.toDouble))
      graft.sources.DeltaDvWriter.deleteKeys(c.spark, path, deleted, keys)
      graft.sources.DeltaLog.read(c.spark, path) }

    reg("detect_deletes_eq") { (c, p) =>
      // hard delete against an ICEBERG target as EQUALITY-DELETE commits
      // (the Iceberg twin of detect_deletes_dv): keys present in the
      // target but missing from the live source land in a content=2
      // equality-delete file — NO table scan at all, the cheapest
      // erasure shape the spec offers. Returns the post-delete read.
      val path = str(p, "target_path")
      val keys = seqOf(p, "keys")
      val target = graft.sources.IcebergSource.read(c.spark, path)
      val deleted = DeleteDetection.detectSqlCompare(target, c.df, keys)
      DeleteDetection.checkThreshold(target, deleted,
        p.get("max_delete_fraction").map(_.toString.toDouble))
      graft.sources.IcebergSource.deleteKeys(c.spark, path, deleted, keys)
      graft.sources.IcebergSource.read(c.spark, path) }

    // ---- domain ----
    reg("unit_convert") { (c, p) =>
      Domain.unitConvert(c.df, str(p, "column"), str(p, "from"), str(p, "to"),
        strOpt(p, "output_col")) }
    reg("saturation_properties") { (c, p) =>
      Domain.saturationProperties(c.df, strOpt(p, "temp_col"),
        strOpt(p, "pressure_col"), strOpt(p, "prefix").getOrElse(""),
        strOpt(p, "method").getOrElse("magnus")) }
    reg("fluid_properties") { (c, p) =>
      Domain.fluidProperties(c.df, str(p, "pressure_col"), str(p, "temp_col"),
        p.get("molar_mass").map(_.toString.toDouble).getOrElse(0.0289647),
        strOpt(p, "prefix").getOrElse(""),
        strOpt(p, "fluid").getOrElse("Air"),
        p.get("assume_ideal_gas").exists(_.toString.toBoolean)) }
    reg("steam_properties") { (c, p) =>
      Domain.steamProperties(c.df, str(p, "temp_col"), str(p, "pressure_col"),
        strOpt(p, "temp_unit").getOrElse("K"),
        strOpt(p, "pressure_unit").getOrElse("Pa"),
        strOpt(p, "prefix").getOrElse("")) }
    reg("saturated_steam") { (c, p) =>
      Domain.saturatedSteam(c.df, str(p, "pressure_col"),
        strOpt(p, "pressure_unit").getOrElse("Pa"),
        p.get("quality").map(_.toString.toDouble).getOrElse(1.0),
        strOpt(p, "quality_col"),
        strOpt(p, "prefix").getOrElse("")) }
    reg("psychrometrics") { (c, p) =>
      Domain.psychrometrics(c.df, str(p, "temp_col"), str(p, "rh_col"),
        strOpt(p, "pressure_pa").map(_.toDouble).getOrElse(101325.0),
        boolOpt(p, "wet_bulb").getOrElse(false)) }
    reg("detect_sequential_phases") { (c, p) =>
      Domain.phaseSummary(c.df, str(p, "group_by"), str(p, "status_col"),
        str(p, "ts_col"), cols(seqOf(p, "order_by")), mapOf(p, "metrics")) }

    // ---- training-data ops ----
    reg("exact_dedup") { (c, p) =>
      Dedup.exactDedup(c.df, str(p, "id_col"), str(p, "text_col")) }
    reg("minhash_dedup_pairs") { (c, p) =>
      Dedup.minhashLshPairs(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "shingle_size").getOrElse(5), intOpt(p, "num_hashes").getOrElse(64),
        intOpt(p, "bands").getOrElse(16)) }
    reg("minhash_dedup") { (c, p) =>
      Dedup.minhashDedup(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "shingle_size").getOrElse(5), intOpt(p, "num_hashes").getOrElse(64),
        intOpt(p, "bands").getOrElse(16)) }
    reg("fuzzy_join") { (c, p) =>
      Fuzzy.fuzzyJoin(c.df, str(p, "id_col"), str(p, "string_col"),
        c.dataset(str(p, "right_dataset")), str(p, "right_id_col"),
        strOpt(p, "right_string_col").getOrElse(str(p, "string_col")),
        str(p, "max_distance").toInt, intOpt(p, "qgram").getOrElse(2)) }
    reg("fuzzy_dedup_pairs") { (c, p) =>
      Fuzzy.fuzzyPairs(c.df, str(p, "id_col"), str(p, "string_col"),
        str(p, "max_distance").toInt, intOpt(p, "qgram").getOrElse(2)) }
    reg("string_similarity") { (c, p) =>
      val f = strOpt(p, "method").getOrElse("jaro_winkler") match {
        case "jaro_winkler" => Fuzzy.jaroWinkler _
        case "jaro" => Fuzzy.jaroSim _
        case other => throw new IllegalArgumentException(
          s"string_similarity method must be jaro_winkler or jaro, got $other")
      }
      c.df.withColumn(strOpt(p, "out_col").getOrElse("similarity"),
        f(coalesce(col(str(p, "left_col")), lit("")),
          coalesce(col(str(p, "right_col")), lit("")))) }
    reg("entity_resolution") { (c, p) =>
      Fuzzy.entityResolution(c.df, str(p, "id_col"),
        mapOf(p, "compare_cols").map { case (k, v) => k -> v.toDouble },
        seqOf(p, "blocking"), str(p, "threshold").toDouble,
        intOpt(p, "max_block_size").getOrElse(1000),
        strOpt(p, "out_col").getOrElse("entity_id")) }
    reg("simhash_pairs") { (c, p) =>
      Dedup.simhashPairs(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "max_hamming").getOrElse(3)) }
    reg("gopher_flags") { (c, p) =>
      TextAnalysis.gopherFlags(c.df, str(p, "text_col"),
        intOpt(p, "min_words").getOrElse(50),
        intOpt(p, "max_words").getOrElse(100000)) }
    reg("url_filter") { (c, p) =>
      TextAnalysis.filterUrlBlocklist(c.df, str(p, "url_col"),
        seqOf(p, "blocklist")) }
    reg("weighted_mix") { (c, p) =>
      Sampling.weightedMix(c.df, str(p, "source_col"), seqOf(p, "key"),
        p.getOrElse("weights", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString.toDouble }) }
    reg("temperature_mix") { (c, p) =>
      Sampling.temperatureMix(c.df, str(p, "source_col"), seqOf(p, "key"),
        p.get("alpha").map(_.toString.toDouble).getOrElse(0.3)) }
    reg("weighted_mix_tokens") { (c, p) =>
      Sampling.weightedMixByTokens(c.df, str(p, "source_col"),
        str(p, "token_col"), seqOf(p, "key"),
        p.getOrElse("weights", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString.toDouble }) }
    reg("incremental_dedup") { (c, p) =>
      // optional bloom_path switches on the persisted membership-filter
      // fast path: bloom-negative rows skip the seen-set join entirely
      strOpt(p, "bloom_path") match {
        case Some(path) =>
          BloomIndex.dedupAgainst(c.spark, path, c.df, str(p, "id_col"),
            str(p, "text_col"), c.dataset(str(p, "seen")),
            p.get("expected_items").map(_.toString.toLong).getOrElse(10000000L),
            p.get("fpp").map(_.toString.toDouble).getOrElse(0.01))
        case None =>
          Dedup.incrementalExactDedup(c.df, str(p, "id_col"), str(p, "text_col"),
            c.dataset(str(p, "seen")))
      } }
    reg("minhash_index_dedup") { (c, p) =>
      val params = MinHashIndex.Params(
        intOpt(p, "shingle_size").getOrElse(5),
        intOpt(p, "num_hashes").getOrElse(64),
        intOpt(p, "bands").getOrElse(16))
      val threshold = p.get("threshold").map(_.toString.toDouble).getOrElse(0.8)
      if (boolOpt(p, "update").getOrElse(true))
        MinHashIndex.dedupAndUpdate(c.df, str(p, "id_col"), str(p, "text_col"),
          str(p, "index_path"), params, threshold)
      else
        MinHashIndex.dedupAgainst(c.df, str(p, "id_col"), str(p, "text_col"),
          str(p, "index_path"), params, threshold) }
    reg("segment_dedup") { (c, p) =>
      Dedup.segmentDedup(c.df, str(p, "id_col"), str(p, "text_col"),
        strOpt(p, "sep_regex").getOrElse("\\n{2,}"),
        strOpt(p, "join_sep").getOrElse("\n\n")) }
    reg("crossdoc_ngrams") { (c, p) =>
      Dedup.crossDocNgrams(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "n").getOrElse(8), intOpt(p, "min_docs").getOrElse(2)) }
    reg("remove_repeated_spans") { (c, p) =>
      Dedup.removeRepeatedSpans(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "n").getOrElse(8), intOpt(p, "min_docs").getOrElse(2),
        boolOpt(p, "keep_first").getOrElse(true)) }
    reg("semantic_dedup") { (c, p) =>
      Dedup.semanticDedup(c.df, str(p, "id_col"), str(p, "vec_col"),
        intOpt(p, "num_clusters").getOrElse(64),
        p.get("threshold").map(_.toString.toDouble).getOrElse(0.95)) }
    reg("semantic_dedup_pairs") { (c, p) =>
      Dedup.semanticDedupPairs(c.df, str(p, "id_col"), str(p, "vec_col"),
        intOpt(p, "num_clusters").getOrElse(64),
        p.get("threshold").map(_.toString.toDouble).getOrElse(0.95)) }
    reg("dsir_weights") { (c, p) =>
      Sampling.dsirWeights(c.df, str(p, "id_col"), str(p, "text_col"),
        c.dataset(str(p, "target")), strOpt(p, "target_text_col")
          .getOrElse(str(p, "text_col")),
        p.get("smoothing").map(_.toString.toDouble).getOrElse(1.0)) }
    // Learned-BPE tokenization (Sennrich 2016): either load a persisted
    // merges.txt (`model_path`) or train inline on a referenced dataset
    // (`train_on` + `num_merges`) — training is one word-count pass with
    // a bounded driver merge loop, encoding is a native expression.
    def bpeModel(c: EngineContext, p: Map[String, Any]): graft.functions.Bpe.BpeModel =
      strOpt(p, "model_path") match {
        case Some(path) => graft.functions.Bpe.load(c.df.sparkSession, path)
        case None => graft.functions.Bpe.train(
          strOpt(p, "train_on").map(c.dataset).getOrElse(c.df), str(p, "text_col"),
          numMerges = str(p, "num_merges").toInt,
          maxWords = p.get("max_words").map(_.toString.toInt).getOrElse(200000),
          lowercase = p.get("lowercase").forall(_.toString.toBoolean))
      }
    reg("bpe_encode") { (c, p) =>
      graft.functions.Bpe.encode(c.df, bpeModel(c, p), str(p, "text_col"),
        strOpt(p, "out_col").getOrElse("bpe_tokens"),
        p.get("lowercase").forall(_.toString.toBoolean)) }
    reg("bpe_token_count") { (c, p) =>
      graft.functions.Bpe.tokenCount(c.df, bpeModel(c, p), str(p, "text_col"),
        strOpt(p, "out_col").getOrElse("bpe_token_count"),
        p.get("lowercase").forall(_.toString.toBoolean)) }
    // Classifier-based quality filtering (the GPT-3/LLaMA/CCNet stage):
    // hashed-logit model trained via MLlib on a labeled frame
    // (`train_on` + `label_col`) or loaded from `model_path`; scoring is
    // a native codegen'd projection over broadcast weights.
    def qcModel(c: EngineContext, p: Map[String, Any]): graft.functions.QualityClassifier.QcModel =
      strOpt(p, "model_path") match {
        case Some(path) => graft.functions.QualityClassifier.load(c.df.sparkSession, path)
        case None => graft.functions.QualityClassifier.train(
          c.dataset(str(p, "train_on")), str(p, "text_col"), str(p, "label_col"),
          numFeatures = p.get("num_features").map(_.toString.toInt).getOrElse(1 << 18),
          binary = p.get("binary").forall(_.toString.toBoolean),
          regParam = p.get("reg_param").map(_.toString.toDouble).getOrElse(1e-4),
          maxIter = p.get("max_iter").map(_.toString.toInt).getOrElse(50),
          wordNgrams = p.get("word_ngrams").map(_.toString.toInt).getOrElse(1))
      }
    reg("quality_classifier_score") { (c, p) =>
      graft.functions.QualityClassifier.scoreFrame(c.df, qcModel(c, p),
        str(p, "text_col"), strOpt(p, "out_col").getOrElse("quality_prob")) }
    reg("quality_classifier_filter") { (c, p) =>
      graft.functions.QualityClassifier.filterByQuality(c.df, qcModel(c, p),
        str(p, "text_col"), str(p, "threshold").toDouble) }
    reg("importance_resample") { (c, p) =>
      Sampling.importanceResample(c.df, str(p, "id_col"), str(p, "score_col"),
        str(p, "n").toInt,
        p.get("temperature").map(_.toString.toDouble).getOrElse(1.0),
        p.get("seed").map(_.toString.toLong).getOrElse(42L)) }
    reg("perplexity_score") { (c, p) =>
      strOpt(p, "model").getOrElse("bigram") match {
        case "kn3" => Sampling.perplexityScoreKN(c.df, str(p, "id_col"),
          str(p, "text_col"), c.dataset(str(p, "target")),
          strOpt(p, "target_text_col").getOrElse(str(p, "text_col")),
          p.get("discount").map(_.toString.toDouble).getOrElse(0.75),
          p.get("smoothing").map(_.toString.toDouble).getOrElse(1.0))
        case "bigram" => Sampling.perplexityScore(c.df, str(p, "id_col"),
          str(p, "text_col"), c.dataset(str(p, "target")),
          strOpt(p, "target_text_col").getOrElse(str(p, "text_col")),
          p.get("smoothing").map(_.toString.toDouble).getOrElse(1.0),
          p.get("lambda").map(_.toString.toDouble).getOrElse(0.9))
        case other => throw new IllegalArgumentException(
          s"unknown perplexity model '$other' (bigram | kn3)")
      } }
    reg("pack_sequences") { (c, p) =>
      Packing.packSequences(c.df, str(p, "id_col"), str(p, "token_col"),
        p.get("budget").map(_.toString.toLong).getOrElse(2048L)) }
    reg("text_analysis") { (c, p) => TextAnalysis.analyze(c.df, str(p, "text_col")) }
    reg("chunk_text") { (c, p) =>
      TextAnalysis.chunkText(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "chunk_tokens").getOrElse(512),
        intOpt(p, "overlap_tokens").getOrElse(0)) }
    reg("as_media") { (c, p) =>
      graft.functions.Multimodal.asMedia(c.df, str(p, "id_col"), str(p, "bytes_col"),
        str(p, "mime_col"), strOpt(p, "source_uri_col")) }
    reg("extract_media_features") { (c, p) =>
      graft.functions.Multimodal.extractFeatures(c.df,
        intOpt(p, "embedding_dim").getOrElse(16), intOpt(p, "batch_size").getOrElse(64)) }
    reg("ann_topk") { (c, p) =>
      graft.functions.Similarity.bruteForceTopK(c.df, str(p, "id_col"), str(p, "vec_col"),
        c.dataset(str(p, "queries_dataset")), str(p, "query_id_col"),
        str(p, "query_vec_col"), str(p, "k").toInt) }
    reg("lsh_topk") { (c, p) =>
      graft.functions.Similarity.lshTopK(c.df, str(p, "id_col"), str(p, "vec_col"),
        c.dataset(str(p, "queries_dataset")), str(p, "query_id_col"),
        str(p, "query_vec_col"), str(p, "k").toInt, str(p, "dim").toInt) }
    reg("ivf_topk") { (c, p) =>
      graft.functions.Similarity.ivfTopK(c.df, str(p, "id_col"), str(p, "vec_col"),
        c.dataset(str(p, "queries_dataset")), str(p, "query_id_col"),
        str(p, "query_vec_col"), str(p, "k").toInt,
        intOpt(p, "num_centroids").getOrElse(64), intOpt(p, "nprobe").getOrElse(16)) }
    reg("ivfpq_topk") { (c, p) =>
      graft.functions.Similarity.ivfPqTopK(c.df, str(p, "id_col"), str(p, "vec_col"),
        c.dataset(str(p, "queries_dataset")), str(p, "query_id_col"),
        str(p, "query_vec_col"), str(p, "k").toInt, str(p, "dim").toInt,
        intOpt(p, "num_centroids").getOrElse(64), intOpt(p, "nprobe").getOrElse(16),
        intOpt(p, "m").getOrElse(8), intOpt(p, "ksub").getOrElse(256),
        intOpt(p, "refine_factor").getOrElse(4)) }
    reg("ngram_jaccard_pairs") { (c, p) =>
      Dedup.ngramJaccardPairs(c.df, str(p, "id_col"), str(p, "text_col"),
        intOpt(p, "n").getOrElse(3),
        strOpt(p, "threshold").map(_.toDouble).getOrElse(0.8)) }
    reg("image_neardup_pairs") { (c, p) =>
      graft.functions.Multimodal.imageNearDupPairs(c.df,
        strOpt(p, "id_col").getOrElse("media_id"),
        strOpt(p, "emb_col").getOrElse("embedding"),
        intOpt(p, "max_hamming").getOrElse(5),
        strOpt(p, "method").getOrElse("dhash")) }
    reg("embedding_neardup_pairs") { (c, p) =>
      Dedup.embeddingNearDupPairs(c.df, str(p, "id_col"), str(p, "vec_col"),
        str(p, "dim").toInt,
        strOpt(p, "threshold").map(_.toDouble).getOrElse(0.95)) }
    reg("hll_sketch") { (c, p) =>
      graft.operators.Sketches.hllSketch(c.df, seqOf(p, "group_by"),
        str(p, "value_col"), strOpt(p, "out_col").getOrElse("distinct_sketch")) }
    reg("hll_merge") { (c, p) =>
      graft.operators.Sketches.hllMerge(c.df, seqOf(p, "group_by"),
        strOpt(p, "sketch_col").getOrElse("distinct_sketch")) }
    reg("theta_sketch") { (c, p) =>
      graft.operators.Sketches.thetaSketch(c.df, seqOf(p, "group_by"),
        str(p, "value_col"), strOpt(p, "out_col").getOrElse("theta_sketch"),
        intOpt(p, "lg_k").getOrElse(12)) }
    reg("theta_merge") { (c, p) =>
      graft.operators.Sketches.thetaMerge(c.df, seqOf(p, "group_by"),
        strOpt(p, "sketch_col").getOrElse("theta_sketch"),
        intOpt(p, "lg_k").getOrElse(12)) }
    reg("topk_values") { (c, p) =>
      graft.operators.Sketches.topKValues(c.df, seqOf(p, "group_by"),
        str(p, "value_col"), str(p, "k").toInt) }
    reg("asof_join") { (c, p) =>
      graft.operators.Relational.asOfJoin(c.df, c.dataset(str(p, "right_dataset")),
        seqOf(p, "on"), str(p, "left_ts"), str(p, "right_ts"),
        strOpt(p, "tolerance_seconds").map(_.toLong),
        strOpt(p, "prefix").getOrElse("right")) }
    reg("range_join") { (c, p) =>
      graft.operators.Relational.rangeJoin(c.df, c.dataset(str(p, "right_dataset")),
        seqOf(p, "on"), str(p, "point_col"), str(p, "start_col"), str(p, "end_col"),
        strOpt(p, "bin_seconds").map(_.toLong).getOrElse(3600L),
        strOpt(p, "how").getOrElse("inner")) }
    reg("salted_join") { (c, p) =>
      graft.operators.Skew.saltedJoin(c.df, c.dataset(str(p, "right_dataset")),
        seqOf(p, "on"), strOpt(p, "how").getOrElse("inner"),
        intOpt(p, "salt_buckets").getOrElse(8)) }
    reg("salted_aggregate") { (c, p) =>
      graft.operators.Skew.saltedAggregate(c.df, seqOf(p, "group_by"),
        mapOf(p, "aggregations").map { case (out, v) =>
          val parts = v.split(":", 2) // "fn:column"
          out -> ((parts(0), parts.lift(1).getOrElse(out)))
        }.toMap, intOpt(p, "salt_buckets").getOrElse(8)) }

    // geocode (advanced.py:1001-1035): reference ships a constant-placeholder
    // stub; reproduced as such.
    reg("geocode") { (c, p) =>
      c.df.withColumn(strOpt(p, "lat_col").getOrElse("latitude"), lit(0.0))
        .withColumn(strOpt(p, "lon_col").getOrElse("longitude"), lit(0.0)) }

    // cross_check (validation.py:14-200): compare this df against another
    // dataset; row-count delta within threshold + optional schema match.
    // Raises on violation, passes df through unchanged.
    reg("cross_check") { (c, p) =>
      val other = c.dataset(str(p, "other_dataset"))
      val thr = strOpt(p, "row_count_tolerance").map(_.toDouble).getOrElse(0.0)
      val a = c.df.count().toDouble
      val b = other.count().toDouble
      val delta = math.abs(a - b) / math.max(b, 1.0)
      if (delta > thr) throw new IllegalStateException(
        f"cross_check: row count delta $delta%.4f exceeds tolerance $thr%.4f ($a vs $b)")
      if (boolOpt(p, "schema_match").getOrElse(false) &&
          c.df.schema.toDDL != other.schema.toDDL)
        throw new IllegalStateException("cross_check: schemas differ")
      c.df }

    // exact connected components over a pair list (a/b columns on the
    // current frame), and cluster-exact dedup against a pairs dataset
    reg("connected_components") { (c, p) =>
      graft.operators.Components.connectedComponents(c.df,
        strOpt(p, "a_col").getOrElse("a"), strOpt(p, "b_col").getOrElse("b"),
        strOpt(p, "id_col").getOrElse("id")) }
    reg("cluster_dedup") { (c, p) =>
      graft.operators.Components.clusterDedup(c.df, str(p, "id"),
        c.dataset(str(p, "pairs_dataset")),
        strOpt(p, "a_col").getOrElse("a"), strOpt(p, "b_col").getOrElse("b")) }

    // third-party extensions register LAST so a plugin can override a
    // standard transformer by name (latest registration wins in the
    // TrieMap), matching the reference's entry-point load order
    Plugins.loadAll
  }
}
