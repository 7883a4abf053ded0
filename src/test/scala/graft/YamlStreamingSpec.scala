package graft

import org.apache.spark.sql.functions._

import graft.core.{Pipeline, YamlConfig}

/**
 * Streaming nodes from pure YAML (reference: streaming read flag
 * odibi/config.py:2676-2685, streaming write block :4023-4160): a node
 * whose `read:` has `streaming: true` becomes a readStream, its `steps`
 * apply to the streaming frame, and the `streaming:` write block picks
 * append vs foreachBatch-merge. With the default available-now trigger
 * the node drains everything present and terminates, so downstream batch
 * nodes can consume the sink like any other node output.
 */
class YamlStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming node from YAML: read -> sql step -> available-now append -> batch downstream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v").write.parquet(s"$dir/in")

    val yaml =
      s"""
        |name: streaming_yaml
        |nodes:
        |  - name: ingest
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "id BIGINT, k STRING, v DOUBLE"
        |    steps:
        |      - sql: SELECT id, k, v * 2 AS v2 FROM df
        |    streaming:
        |      checkpoint: $dir/cp
        |      output_mode: append
        |      trigger: { kind: available_now }
        |    write: { format: parquet, path: $dir/out }
        |  - name: summary
        |    depends_on: [ingest]
        |    input: ingest
        |    steps:
        |      - sql: SELECT k, sum(v2) AS total FROM df GROUP BY k
        |    write: { format: parquet, mode: overwrite, path: $dir/summary }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res("ingest").failure.isEmpty, res("ingest").failure.map(_.toString))
    assert(res("ingest").rowsWritten.contains(3L))
    assert(!res("ingest").df.isStreaming) // downstream sees the batch read-back
    assert(res("summary").failure.isEmpty)
    val totals = spark.read.parquet(s"$dir/summary").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(totals == Map("a" -> 80.0, "b" -> 40.0))
  }

  test("streaming node from YAML: merge upsert into pre-seeded snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml2").toString
    Seq((1L, "old"), (9L, "keep")).toDF("id", "v").write.parquet(s"$dir/target")
    Seq((1L, "new"), (2L, "ins")).toDF("id", "v").write.parquet(s"$dir/in")

    val yaml =
      s"""
        |name: streaming_merge_yaml
        |nodes:
        |  - name: upserter
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "id BIGINT, v STRING"
        |    streaming:
        |      checkpoint: $dir/cp
        |      merge: { keys: [id], strategy: upsert }
        |    write: { path: $dir/target }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res("upserter").failure.isEmpty, res("upserter").failure.map(_.toString))
    val out = spark.read.parquet(s"$dir/target").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "new", 2L -> "ins", 9L -> "keep"))
  }

  test("Delta streaming merge: file-scoped upserts, untouched files survive runs") {
    import graft.sources.DeltaLog
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml_dm").toString
    // 4 input files -> 4 target data files in the first micro-batch
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.parquet(s"$dir/in")
    val yaml =
      s"""
        |name: delta_stream_merge
        |nodes:
        |  - name: upserter
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "id BIGINT, v STRING"
        |    streaming:
        |      checkpoint: $dir/cp
        |      merge: { keys: [id], strategy: upsert }
        |    write: { format: delta, path: $dir/target }
        |""".stripMargin
    val res1 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res1("upserter").failure.isEmpty,
      res1("upserter").failure.map(_.toString))
    val snap1 = DeltaLog.snapshot(spark, s"$dir/target")
    assert(snap1.files.size >= 2)
    assert(DeltaLog.read(spark, s"$dir/target").count() == 100)

    // run 2 over the SAME checkpoint: only the new input file is
    // processed; the merge updates 2 keys and inserts 1
    Seq((10L, "UPD"), (20L, "UPD"), (500L, "NEW")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val res2 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res2("upserter").failure.isEmpty,
      res2("upserter").failure.map(_.toString))
    val got = DeltaLog.read(spark, s"$dir/target")
    assert(got.count() == 101)
    assert(got.filter("v = 'UPD'").count() == 2)
    assert(got.filter("id = 500 and v = 'NEW'").count() == 1)

    // the merge was FILE-SCOPED: at least one first-run file is
    // untouched and its add entry survived the commit verbatim; every
    // first-run data file is still on disk (bitmaps, not rewrites)
    val snap2 = DeltaLog.snapshot(spark, s"$dir/target")
    val byPath1 = snap1.files.map(a => a.path -> a).toMap
    val untouched = snap2.files.filter(a =>
      byPath1.contains(a.path) && a.deletionVector.isEmpty)
    assert(untouched.nonEmpty, "every first-run file was touched")
    untouched.foreach(a => assert(a == byPath1(a.path),
      s"untouched add entry changed: $a"))
    snap1.files.foreach(a => assert(
      new java.io.File(s"$dir/target", a.path).exists(),
      s"first-run file ${a.path} was rewritten"))
    // exactly-once bookkeeping: the SetTransaction cursor advanced
    assert(snap2.transactions.exists(_._1.startsWith("graft-stream-merge-")))
  }

  test("watermarked tumbling-window counts from a YAML window_agg step") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml_win").toString
    def event(s: String, k: String) = (java.sql.Timestamp.valueOf(s), k)
    val yaml =
      s"""
        |name: streaming_window_yaml
        |nodes:
        |  - name: windowed
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "ts TIMESTAMP, k STRING"
        |    steps:
        |      - function: window_agg
        |        params:
        |          ts_col: ts
        |          watermark: 10 seconds
        |          window: 1 minute
        |          group_by: [k]
        |          aggs: { n: "count(*)" }
        |    streaming:
        |      checkpoint: $dir/cp
        |      output_mode: append
        |      trigger: { kind: available_now }
        |    write: { format: parquet, path: $dir/out }
        |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)

    // drain 1: three events in the 12:00 window — append mode holds the
    // window open until the watermark passes its end
    Seq(event("2026-01-01 12:00:05", "a"), event("2026-01-01 12:00:20", "a"),
      event("2026-01-01 12:00:40", "b")).toDF("ts", "k")
      .write.mode("append").parquet(s"$dir/in")
    val res1 = Pipeline.run(spark, cfg)
    assert(res1("windowed").failure.isEmpty, res1("windowed").failure.map(_.toString))

    // drain 2: a much later event advances the watermark past 12:01 and
    // flushes the finalized 12:00 window
    Seq(event("2026-01-01 12:05:00", "c")).toDF("ts", "k")
      .write.mode("append").parquet(s"$dir/in")
    val res2 = Pipeline.run(spark, cfg)
    assert(res2("windowed").failure.isEmpty, res2("windowed").failure.map(_.toString))

    val out = spark.read.parquet(s"$dir/out")
      .select(col("window.start").cast("string"), col("k"), col("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2026-01-01 12:00:00", "a") -> 2L,
      ("2026-01-01 12:00:00", "b") -> 1L))
  }

  test("stream-stream join from a YAML stream_join step (time-bounded state)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml_ssj").toString
    def ev(s: String, id: Long) = (java.sql.Timestamp.valueOf(s), id)
    // impressions and clicks land as independent streams; a click joins
    // its impression when it follows within 2 minutes
    Seq(ev("2026-01-01 12:00:00", 1L), ev("2026-01-01 12:00:10", 2L),
      ev("2026-01-01 12:10:00", 99L)) // watermark closer
      .toDF("imp_ts", "ad_id").write.parquet(s"$dir/imps")
    Seq(ev("2026-01-01 12:01:00", 1L), // joins (60 s later)
      ev("2026-01-01 12:05:00", 2L),   // too late (290 s)
      ev("2026-01-01 12:10:00", 98L))  // watermark closer
      .toDF("click_ts", "click_ad").write.parquet(s"$dir/clicks")
    val yaml =
      s"""
        |name: ssj
        |nodes:
        |  - name: impressions
        |    read:
        |      format: parquet
        |      path: $dir/imps
        |      streaming: true
        |      schema_ddl: "imp_ts TIMESTAMP, ad_id BIGINT"
        |  - name: attributed
        |    depends_on: [impressions]
        |    read:
        |      format: parquet
        |      path: $dir/clicks
        |      streaming: true
        |      schema_ddl: "click_ts TIMESTAMP, click_ad BIGINT"
        |    steps:
        |      - function: stream_join
        |        params:
        |          right_dataset: impressions
        |          left_ts: click_ts
        |          right_ts: imp_ts
        |          watermark: 10 seconds
        |          condition: "click_ad = ad_id AND click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 2 MINUTES"
        |    streaming:
        |      checkpoint: $dir/cp
        |      output_mode: append
        |      trigger: { kind: available_now }
        |    write: { format: parquet, path: $dir/out }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res.values.forall(_.failure.isEmpty),
      res.values.flatMap(_.failure).map(_.toString).mkString("; "))
    val out = spark.read.parquet(s"$dir/out")
      .select("click_ad", "ad_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L)),
      s"only the in-window click attributes, got ${out.toSeq}")
  }

  test("tests on a streaming node are rejected up front") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml3").toString
    Seq((1L, "a")).toDF("id", "k").write.parquet(s"$dir/in")
    val yaml =
      s"""
        |name: streaming_tests_yaml
        |nodes:
        |  - name: bad
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "id BIGINT, k STRING"
        |    validation:
        |      tests:
        |        - { name: nn, kind: not_null, columns: [id] }
        |    streaming: { checkpoint: $dir/cp }
        |    write: { path: $dir/out }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res("bad").failure.exists(
      _.getMessage.contains("tests are not supported on streaming nodes")))
  }

  test("streaming corpus gate from YAML: dedup_index merge strategy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml_gate").toString
    def doc(tag: Char) =
      (0 until 60).map(i => s"$tag$tag${i}$tag${(i * 31) % 71}$tag").mkString(" ")
    // batch 1: two copies of 'a' + one 'b'
    Seq((1L, doc('a')), (2L, doc('a')), (3L, doc('b')))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    val yaml =
      s"""
        |name: streaming_gate_yaml
        |nodes:
        |  - name: gate
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "doc_id BIGINT, text STRING"
        |    streaming:
        |      checkpoint: $dir/cp
        |      merge: { keys: [doc_id, text], strategy: dedup_index, index_path: $dir/idx }
        |    write: { path: $dir/corpus }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res("gate").failure.isEmpty, res("gate").failure.map(_.toString))
    val round1 = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(round1.size == 2 && round1.contains(3L)) // in-batch dup collapsed
    // batch 2 arrives: a copy of 'b' (already indexed) + fresh 'z'
    Seq((10L, doc('b')), (11L, doc('z')))
      .toDF("doc_id", "text").write.parquet(s"$dir/in2")
    val f = new java.io.File(s"$dir/in2").listFiles.filter(_.getName.endsWith(".parquet"))
    f.foreach(x => java.nio.file.Files.copy(x.toPath,
      java.nio.file.Paths.get(s"$dir/in/${x.getName}")))
    val res2 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res2("gate").failure.isEmpty, res2("gate").failure.map(_.toString))
    val round2 = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(round2 == round1 + 11L, s"got $round2") // dup of indexed 'b' dropped
    // unknown strategy still fails fast
    val bad = yaml.replace("dedup_index", "nope_strategy")
    val resBad = Pipeline.run(spark, YamlConfig.loadPipeline(
      bad.replace(s"$dir/cp", s"$dir/cp_bad").replace(s"$dir/corpus", s"$dir/corpus_bad")))
    assert(resBad("gate").failure.isDefined)
  }

  test("streaming EXACT-dedup gate from YAML: bloom_dedup merge strategy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syaml_bloom").toString
    // batch 1: an in-batch duplicate pair + one distinct doc
    Seq((1L, "alpha document body"), (2L, "alpha document body"),
      (3L, "beta document body"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    val yaml =
      s"""
        |name: streaming_bloom_yaml
        |nodes:
        |  - name: gate
        |    read:
        |      format: parquet
        |      path: $dir/in
        |      streaming: true
        |      schema_ddl: "doc_id BIGINT, text STRING"
        |    streaming:
        |      checkpoint: $dir/cp
        |      merge: { keys: [doc_id, text], strategy: bloom_dedup,
        |               bloom_path: $dir/bloom, expected_items: "100000" }
        |    write: { path: $dir/corpus }
        |""".stripMargin
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res("gate").failure.isEmpty, res("gate").failure.map(_.toString))
    val round1 = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(round1.size == 2 && round1.contains(3L), s"got $round1")
    assert(graft.operators.BloomIndex.exists(spark, s"$dir/bloom"))
    // batch 2: replay of an absorbed body + a fresh one
    Seq((10L, "beta document body"), (11L, "gamma document body"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in2")
    val f = new java.io.File(s"$dir/in2").listFiles.filter(_.getName.endsWith(".parquet"))
    f.foreach(x => java.nio.file.Files.copy(x.toPath,
      java.nio.file.Paths.get(s"$dir/in/${x.getName}")))
    val res2 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res2("gate").failure.isEmpty, res2("gate").failure.map(_.toString))
    val round2 = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(round2 == round1 + 11L, s"got $round2")
    // filter-ahead crash shape: a fingerprint in the bloom but NOT in the
    // target must still be accepted (exact check against the target wins)
    val aheadFp = Seq("delta document body").toDF("t")
      .select(graft.functions.TextAnalysis.fingerprint(col("t")).as("fingerprint"))
    val ahead = graft.operators.BloomIndex.load(spark, s"$dir/bloom")
    ahead.mergeInPlace(graft.operators.BloomIndex.build(aheadFp, "fingerprint", 100000L, 0.01))
    graft.operators.BloomIndex.save(spark, ahead, s"$dir/bloom", 100000L, 0.01)
    Seq((20L, "delta document body")).toDF("doc_id", "text")
      .write.parquet(s"$dir/in3")
    val f3 = new java.io.File(s"$dir/in3").listFiles.filter(_.getName.endsWith(".parquet"))
    f3.foreach(x => java.nio.file.Files.copy(x.toPath,
      java.nio.file.Paths.get(s"$dir/in/${x.getName}")))
    val res3 = Pipeline.run(spark, YamlConfig.loadPipeline(yaml))
    assert(res3("gate").failure.isEmpty, res3("gate").failure.map(_.toString))
    val round3 = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(round3 == round2 + 20L, s"got $round3") // no data loss from filter-ahead
  }
}
