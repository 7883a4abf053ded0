package graft

import graft.core.{Pipeline, YamlConfig}

class StandardTransformersSpec extends SparkSpec {
  import spark.implicits._

  test("every transformer name in the reference registry resolves here") {
    // the reference's odibi/transformers/__init__.py registration list:
    // a user switching engines must find every name they use today
    val referenceNames = Seq(
      "add_prefix", "add_suffix", "aggregate", "apply_mapping", "case_when",
      "cast_columns", "clean_text", "coalesce_columns", "concat_columns",
      "convert_timezone", "cross_check", "date_add", "date_diff", "date_trunc",
      "deduplicate", "derive_columns", "detect_deletes",
      "detect_sequential_phases", "dict_based_mapping", "distinct",
      "drop_columns", "explode_list_column", "extract_date_parts",
      "fill_nulls", "filter_rows", "flatten_struct", "fluid_properties",
      "generate_numeric_key", "generate_surrogate_key", "geocode",
      "hash_columns", "join", "limit", "merge", "normalize_column_names",
      "normalize_json", "normalize_schema", "parse_json", "pivot",
      "psychrometrics", "regex_replace", "rename_columns", "replace_values",
      "row_number", "sample", "saturation_properties", "scd2",
      "select_columns", "sessionize", "sort", "split_events_by_period",
      "split_part", "trim_whitespace", "union", "unit_convert",
      "unpack_struct", "unpivot", "validate_and_flag", "window_calculation")
    graft.core.StandardTransformers.registerAll
    val missing = referenceNames.filter(graft.core.TransformerRegistry.get(_).isEmpty)
    assert(missing.isEmpty, s"reference names without an implementation: $missing")
  }

  test("YAML pipeline can chain standard transformers by reference names") {
    val dir = java.nio.file.Files.createTempDirectory("graft_std").toString
    Seq((1, " Widget A ", 10.0, "2026-01-03 00:00:00"),
        (2, "widget b", 25.0, "2026-01-04 00:00:00"),
        (3, "WIDGET C", 40.0, "2026-01-05 00:00:00"))
      .toDF("id", "name", "price", "sold_at_s")
      .createOrReplaceTempView("raw_src")

    val yaml =
      s"""
         |name: std
         |nodes:
         |  - name: cleaned
         |    input: src
         |    steps:
         |      - sql: "SELECT id, name, price, CAST(sold_at_s AS TIMESTAMP) AS sold_at FROM df"
         |      - function: clean_text
         |        params: { columns: [name], case: lower }
         |      - function: derive_columns
         |        params:
         |          derivations:
         |            price_cents: "CAST(price * 100 AS BIGINT)"
         |            tier: "CASE WHEN price >= 25 THEN 'high' ELSE 'low' END"
         |      - function: extract_date_parts
         |        params: { source_col: sold_at, prefix: "sold_" }
         |      - function: filter_rows
         |        params: { condition: "price_cents > 500" }
         |      - function: row_number
         |        params: { output: rn, partition_by: [tier], order_by: ["price desc"] }
         |""".stripMargin
    val src = spark.table("raw_src")
    val results = Pipeline.run(spark, YamlConfig.loadPipeline(yaml), Map("src" -> src))
    assert(results.values.forall(_.failure.isEmpty),
      results.values.flatMap(_.failure).map(_.getMessage).mkString("; "))
    val out = results("cleaned").df
    assert(out.columns.toSet == Set("id", "name", "price", "sold_at", "price_cents",
      "tier", "sold_year", "sold_month", "sold_day", "rn"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("widget a", "widget b", "widget c"))
    assert(rows.map(_.getAs[Long]("price_cents")).toSeq == Seq(1000L, 2500L, 4000L))
    // rn: high tier has 40 (rn=1), 25 (rn=2); low tier 10 (rn=1)
    assert(rows.map(r => (r.getAs[String]("tier"), r.getAs[Int]("rn"))).toSeq ==
      Seq(("low", 1), ("high", 2), ("high", 1)))
  }

  test("join/aggregate/scd2 via registry with context datasets") {
    graft.core.StandardTransformers.registerAll
    val orders = Seq((1, 100.0), (1, 50.0), (2, 10.0)).toDF("cust", "amt")
    val names = Seq((1, "alice"), (2, "bob")).toDF("cust", "cname")
    val yaml =
      """
        |name: j
        |nodes:
        |  - name: joined
        |    input: orders
        |    steps:
        |      - function: join
        |        params: { right_dataset: names, on: [cust], how: left, broadcast_right: true }
        |      - function: aggregate
        |        params:
        |          group_by: [cname]
        |          aggregations: { amt: sum }
        |""".stripMargin
    val results = Pipeline.run(spark, YamlConfig.loadPipeline(yaml),
      Map("orders" -> orders, "names" -> names))
    assert(results.values.forall(_.failure.isEmpty),
      results.values.flatMap(_.failure).map(_.getMessage).mkString("; "))
    val m = results("joined").df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("alice" -> 150.0, "bob" -> 10.0))
  }

  test("skew and ANN ops are reachable as named transformers from YAML") {
    graft.core.StandardTransformers.registerAll
    val names = graft.core.TransformerRegistry.names.toSet
    assert(Set("salted_join", "salted_aggregate", "lsh_topk", "ivf_topk",
      "ivfpq_topk", "ngram_jaccard_pairs", "embedding_neardup_pairs")
      .subsetOf(names))

    val orders = Seq((1, 100.0), (1, 50.0), (2, 10.0)).toDF("cust", "amt")
    val yaml =
      """
        |name: s
        |nodes:
        |  - name: agg
        |    input: orders
        |    steps:
        |      - function: salted_aggregate
        |        params:
        |          group_by: [cust]
        |          aggregations: { total: "sum:amt", n: "count:amt" }
        |          salt_buckets: 4
        |""".stripMargin
    val results = Pipeline.run(spark, YamlConfig.loadPipeline(yaml),
      Map("orders" -> orders))
    assert(results.values.forall(_.failure.isEmpty),
      results.values.flatMap(_.failure).map(_.getMessage).mkString("; "))
    val m = results("agg").df.collect()
      .map(r => r.getAs[Int]("cust") -> (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    assert(m == Map(1 -> ((150.0, 2L)), 2 -> ((10.0, 1L))))
  }
}
