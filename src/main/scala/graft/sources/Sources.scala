package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Batch sources and sinks (reference: formats odibi/config.py:1084-1114;
 * spark read odibi/engine/spark_engine.py:497-760; write :904-1750).
 *
 * Everything is a thin, declarative veneer over the Spark DataSource API so
 * Catalyst keeps pushdown/pruning; the value added mirrors the reference:
 * per-format option plumbing, JDBC query pushdown, metadata columns, and
 * content-hash skip-if-unchanged.
 */
object Sources {

  final case class ReadConfig(format: String, path: Option[String] = None,
                              table: Option[String] = None,
                              schemaDdl: Option[String] = None,
                              streaming: Boolean = false, // config.py:2676-2685
                              options: Map[String, String] = Map.empty)

  /** spark.read.format(...).options(...).load/table; `streaming: true`
    * switches to readStream (file sources then require schema_ddl). */
  def read(spark: SparkSession, cfg: ReadConfig): DataFrame = {
    if (cfg.streaming) {
      // delta streams through the NATIVE tailing source (graft-delta):
      // initial snapshot + new commits, startingVersion/maxFilesPerTrigger/
      // ignoreDeletes/ignoreChanges as in delta-spark's DeltaSource
      if (cfg.format.equalsIgnoreCase("delta")) {
        val p = cfg.path.getOrElse(throw new IllegalArgumentException(
          "delta streaming read needs a path"))
        return spark.readStream.format("graft-delta")
          .options(cfg.options).load(p)
      }
      // iceberg streams through the native snapshot-tailing source
      if (cfg.format.equalsIgnoreCase("iceberg")) {
        val p = cfg.path.getOrElse(throw new IllegalArgumentException(
          "iceberg streaming read needs a path"))
        return spark.readStream.format("graft-iceberg")
          .options(cfg.options).load(p)
      }
      // the remaining native formats have no streaming DataSource — fail
      // at plan time with the workaround, not at runtime with a lookup error
      require(cfg.format != "avro" && cfg.format != "excel" && cfg.format != "media"
          && cfg.format != "warc",
        s"${cfg.format} has no streaming source in this environment; " +
          "batch-read it or stream a parquet/json landing copy " +
          "(for media: readStream.format(\"binaryFile\") + Multimodal.asMedia)")
      var r = spark.readStream.format(cfg.format).options(cfg.options)
      cfg.schemaDdl.foreach(ddl => r = r.schema(StructType.fromDDL(ddl)))
      return cfg.path.map(r.load).getOrElse(
        cfg.table.map(r.table).getOrElse(r.load()))
    }
    // avro has no DataSource jar in this env — route through the native
    // splittable reader ([[AvroSource]]); same declarative surface
    if (cfg.format == "avro")
      return AvroSource.read(spark,
        cfg.path.getOrElse(throw new IllegalArgumentException("avro read needs path")),
        avroSchemaJson = cfg.options.get("avroSchema"))
    if (cfg.format == "excel")
      return ExcelSource.read(spark,
        cfg.path.getOrElse(throw new IllegalArgumentException("excel read needs path")),
        ExcelSource.ExcelOptions(
          sheet = cfg.options.get("sheet"),
          sheetPattern = cfg.options.get("sheet_pattern"),
          addSheetName = cfg.options.get("add_sheet_name").exists(_.toBoolean),
          addSourceFile = cfg.options.get("add_source_file").exists(_.toBoolean),
          inferTypes = cfg.options.get("infer_types").forall(_.toBoolean)))
    // warc/wet routes through the native ISO 28500 reader (no WARC
    // library in this env); `record_types: conversion` narrows to WET
    // text records, `documents: true` lands the (url, date, text) frame
    // a curation pipeline starts from
    if (cfg.format == "warc") {
      val warcPath =
        cfg.path.getOrElse(throw new IllegalArgumentException("warc read needs path"))
      val types = cfg.options.get("record_types")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      val opts = WarcSource.WarcOptions(
        recordTypes = types,
        maxContentLength = cfg.options.get("max_content_length").map(_.toLong)
          .getOrElse(512L << 20))
      // `documents: html` extracts text from raw `response` captures
      // (HTTP headers stripped, HTML -> text) for crawls without WET files
      return cfg.options.get("documents").map(_.toLowerCase) match {
        case Some("html") => WarcSource.htmlDocuments(spark, warcPath)
        case Some(v) if v == "true" =>
          WarcSource.read(spark, warcPath,
            opts.copy(recordTypes = if (types.isEmpty) Set("conversion") else types))
            .select(org.apache.spark.sql.functions.col("target_uri").as("url"),
              org.apache.spark.sql.functions.col("date"),
              org.apache.spark.sql.functions.decode(
                org.apache.spark.sql.functions.col("content"), "UTF-8").as("text"))
        case _ => WarcSource.read(spark, warcPath, opts)
      }
    }
    // iceberg routes through the native metadata/manifest reader (no
    // iceberg runtime jar in this env); snapshot_id / as_of_timestamp_ms
    // are the Iceberg time-travel read options
    if (cfg.format == "iceberg") {
      val icePath =
        cfg.path.getOrElse(throw new IllegalArgumentException("iceberg read needs path"))
      // incremental changes feed: from_snapshot_id (exclusive cursor) or
      // changes: true selects the diff read instead of a snapshot
      if (cfg.options.contains("from_snapshot_id") ||
          cfg.options.get("changes").exists(_.toBoolean))
        return IcebergSource.changes(spark, icePath,
          fromSnapshotId = cfg.options.get("from_snapshot_id").map(_.toLong),
          toSnapshotId = cfg.options.get("to_snapshot_id").map(_.toLong))
      return IcebergSource.read(spark, icePath,
        snapshotId = cfg.options.get("snapshot_id").map(_.toLong),
        asOfTimestampMs = cfg.options.get("as_of_timestamp_ms").map(_.toLong),
        metadataLocation = cfg.options.get("metadata_location"),
        partitionFilter = cfg.options.get("partition_filter")
          .map(parsePartitionFilter).getOrElse(Nil),
        // filter: pushed into manifest column-bound FILE SKIPPING before
        // the scan plans, then re-applied on the scan (same contract as
        // the delta read option)
        dataFilter = cfg.options.get("filter").orElse(cfg.options.get("where"))
          .map(org.apache.spark.sql.functions.expr))
    }
    // delta routes through the native transaction-log reader (no
    // delta-spark jar in this env); versionAsOf / timestampAsOf are the
    // reference's time-travel read options (config.py:1355-1390)
    if (cfg.format == "delta") {
      def opt(k1: String, k2: String) = cfg.options.get(k1).orElse(cfg.options.get(k2))
      val deltaPath =
        cfg.path.getOrElse(throw new IllegalArgumentException("delta read needs path"))
      // CDF read: starting_version selects the change feed instead of a
      // snapshot (the incremental-ETL shape Delta consumers use)
      opt("starting_version", "startingVersion") match {
        case Some(from) =>
          return DeltaLog.changes(spark, deltaPath, from.toLong,
            toVersion = opt("ending_version", "endingVersion").map(_.toLong))
        case None => ()
      }
      // partition_filter: "region=US, day=2024-01-01" — driver-side file
      // pruning on partition values, never a post-scan filter
      val pf = cfg.options.get("partition_filter").map(_.split(',').toSeq
        .map(_.trim).filter(_.nonEmpty).map { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => k.trim -> v.trim
            case _ => throw new IllegalArgumentException(
              s"delta partition_filter clause '$kv' is not 'col=value'")
          }
        }.toMap).getOrElse(Map.empty[String, String])
      // filter: a SQL predicate pushed into STATS-BASED FILE SKIPPING
      // (min/max/nullCount per add action) before the scan plans — on a
      // clustered 100 TB table this reads a handful of files, and the
      // predicate is re-applied on the scan so the answer never depends
      // on the prune
      return DeltaLog.read(spark, deltaPath,
        versionAsOf = opt("version_as_of", "versionAsOf").map(_.toLong),
        timestampAsOfMs = opt("timestamp_as_of_ms", "timestampAsOfMs").map(_.toLong),
        partitionFilter = pf,
        dataFilter = opt("filter", "where").map(org.apache.spark.sql.functions.expr))
    }
    // a media directory scans through the built-in binaryFile source into
    // the canonical media frame (Multimodal.readMedia)
    if (cfg.format == "media")
      return graft.functions.Multimodal.readMedia(spark,
        cfg.path.getOrElse(throw new IllegalArgumentException("media read needs path")),
        cfg.options.getOrElse("glob", "*"))
    var r: DataFrameReader = spark.read.format(cfg.format).options(cfg.options)
    cfg.schemaDdl.foreach(ddl => r = r.schema(StructType.fromDDL(ddl)))
    (cfg.path, cfg.table) match {
      case (Some(p), _) => r.load(p)
      // jdbc "tables" are reader options, not catalog tables; partition
      // options (partitionColumn/lowerBound/upperBound/numPartitions) pass
      // through cfg.options to the reader unchanged
      case (_, Some(t)) if cfg.format == "jdbc" => r.option("dbtable", t).load()
      case (_, Some(t)) => r.table(t)
      case _ => throw new IllegalArgumentException("read needs path or table")
    }
  }

  /**
   * Range-partitioned JDBC scan (the standard Spark parallel-read contract):
   * `numPartitions` concurrent queries, each covering one stride of
   * `[lowerBound, upperBound)` on `column` — without it a JDBC read is one
   * executor pulling the whole table through one connection.
   */
  final case class JdbcPartitioning(column: String, lowerBound: Long,
                                    upperBound: Long, numPartitions: Int) {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    require(upperBound > lowerBound,
      s"upperBound ($upperBound) must exceed lowerBound ($lowerBound)")
  }

  /**
   * Reader options for a JDBC read — factored out of [[readJdbc]] so the
   * generated config is testable without a database in the environment.
   */
  def jdbcOptions(url: String, table: String,
                  filter: Option[String] = None,
                  partitioning: Option[JdbcPartitioning] = None,
                  options: Map[String, String] = Map.empty): Map[String, String] = {
    val dbtable = filter match {
      case Some(f) => s"(SELECT * FROM $table WHERE $f) AS pushdown_subquery"
      case None => table
    }
    val partOpts = partitioning.map(p => Map(
      "partitionColumn" -> p.column,
      "lowerBound" -> p.lowerBound.toString,
      "upperBound" -> p.upperBound.toString,
      "numPartitions" -> p.numPartitions.toString)).getOrElse(Map.empty)
    Map("url" -> url, "dbtable" -> dbtable) ++ partOpts ++ options
  }

  /**
   * JDBC read with manual predicate pushdown, like the reference
   * (spark_engine.py:562-590): a `filter` becomes a WHERE wrapped in a
   * subquery so the database — not Spark — does the filtering. Pass
   * `partitioning` for a parallel range-partitioned scan; from YAML the
   * same four reader options pass through `read.options` verbatim.
   */
  def readJdbc(spark: SparkSession, url: String, table: String,
               filter: Option[String] = None,
               partitioning: Option[JdbcPartitioning] = None,
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(jdbcOptions(url, table, filter, partitioning, options))
      .load()

  /**
   * Chunked read (reference: pandas `chunksize` option,
   * tests/benchmarks/test_phase4_benchmarks.py:45-62): an iterator of
   * DataFrames over groups of `filesPerChunk` input files, schema pinned
   * from the full listing so every chunk aligns. In Spark the executor
   * already streams partitions — this is for DRIVER-side incremental
   * consumption (checkpoint-per-chunk backfills, bounded foreach loops),
   * not a memory workaround.
   */
  def readChunked(spark: SparkSession, format: String, path: String,
                  filesPerChunk: Int = 16,
                  options: Map[String, String] = Map.empty): Iterator[DataFrame] = {
    require(filesPerChunk >= 1, s"filesPerChunk must be >= 1, got $filesPerChunk")
    val full = spark.read.format(format).options(options).load(path)
    full.inputFiles.sorted.grouped(filesPerChunk).map { group =>
      spark.read.format(format).options(options)
        .schema(full.schema).load(group: _*)
    }
  }

  /**
   * Metadata columns stamped at read (reference: odibi/config.py:403-466,
   * spark_engine.py:2747): `_extracted_at`, `_source_file`, plus caller
   * extras (e.g. `_source_table`).
   */
  def withMetadataCols(df: DataFrame,
                       extras: Map[String, String] = Map.empty): DataFrame = {
    val base = df
      .withColumn("_extracted_at", current_timestamp())
      .withColumn("_source_file", input_file_name())
    extras.foldLeft(base) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  final case class WriteConfig(format: String = "parquet", mode: String = "overwrite",
                               partitionBy: Seq[String] = Nil,
                               coalescePartitions: Option[Int] = None,
                               options: Map[String, String] = Map.empty,
                               zorderBy: Seq[String] = Nil,
                               targetFileSizeMb: Option[Int] = None)

  /**
   * Retention expiry for hive-partitioned sinks: delete partition
   * directories of `partitionCol` whose value sorts strictly below
   * `cutoff` (date/timestamp partition values in ISO format sort
   * lexicographically, so a plain string compare is the correct date
   * compare). Driver-side FS metadata only — no Spark job; bounded by
   * the partition COUNT, not data volume. Returns the deleted partition
   * values. `dryRun` lists without deleting.
   */
  def expirePartitions(spark: SparkSession, path: String, partitionCol: String,
                       cutoff: String, dryRun: Boolean = false): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no sink at $path")
    val prefix = s"$partitionCol="
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => st.getPath)
    // hive partition values are URL-encoded on disk (e.g. ':' → '%3A')
    val decoded = parts.map(p => p -> java.net.URLDecoder.decode(
      p.getName.stripPrefix(prefix), "UTF-8"))
    // lexicographic compare is only a correct value compare for
    // ISO-sortable strings; non-zero-padded numerics ("9" vs "10") sort
    // backwards and this operation DELETES DATA — compare numerically when
    // everything parses as a number, and fail fast on mixed shapes
    val allNumeric = (cutoff +: decoded.map(_._2))
      .forall(v => scala.util.Try(java.lang.Long.parseLong(v)).isSuccess)
    val sameLen = decoded.forall(_._2.length == cutoff.length)
    require(allNumeric || sameLen || decoded.isEmpty,
      s"partition values of $partitionCol mix lengths vs cutoff '$cutoff' — " +
        "lexicographic compare would delete the wrong partitions " +
        "(non-zero-padded numbers?). Re-run with ISO-formatted / zero-padded " +
        "values, and use dryRun=true to preview.")
    val below: String => Boolean =
      if (allNumeric) v => java.lang.Long.parseLong(v) < java.lang.Long.parseLong(cutoff)
      else v => v < cutoff
    val doomed = decoded.filter(pv => below(pv._2)).map(_._1).sortBy(_.getName)
    require(doomed.nonEmpty || fs.listStatus(root)
        .exists(st => st.getPath.getName.startsWith(prefix)),
      s"$path has no $prefix partition directories — check partition_col")
    if (!dryRun) doomed.foreach(p => fs.delete(p, true))
    // stale file-listing caches would resurrect deleted partitions
    if (!dryRun) spark.catalog.refreshByPath(path)
    doomed.map(_.getName.stripPrefix(prefix))
  }

  /**
   * Compact a plain-parquet directory in place: read, re-size to
   * `targetFileSizeMb` (file-backed stats, so disk-in ~ disk-out), and
   * republish through the atomic temp-dir swap — readers never observe
   * a partial rewrite. The non-Delta answer to OPTIMIZE for bronze
   * landing zones full of tiny micro-batch files. Returns (files
   * before, files after).
   */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileSizeMb: Int = 128): (Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a flat rewrite of a hive-partitioned sink would FLATTEN the layout
    // (partition dirs become data columns in unpartitioned files)
    require(!fs.listStatus(root).exists(st =>
        st.isDirectory && st.getPath.getName.contains("=")),
      s"$path is hive-partitioned — compact each partition directory " +
        "individually, or use a Delta sink and `graft.Tools delta optimize`")
    def count(): Int = graft.core.DriverPar.listFilesNoPerm(fs, root).count { s =>
      val f = s.getPath.getName
      f.endsWith(".parquet") && !f.startsWith("_") && !f.startsWith(".")
    }
    val before = count()
    val df = spark.read.parquet(path)
    write(df, path, WriteConfig(mode = "overwrite",
      targetFileSizeMb = Some(targetFileSizeMb)))
    (before, count())
  }

  /** df.write.format(...).mode(...).partitionBy(...).save(path). */
  def write(df: DataFrame, path: String, cfg: WriteConfig = WriteConfig()): Unit = {
    writeWithStats(df, path, cfg)
    ()
  }

  /**
   * Write and return the rows written, measured via an `Observation` —
   * the metric aggregates during the write scan itself, so there is no
   * second job and no count() re-execution (the reference's per-node
   * rows_written from write info, story metadata).
   *
   * Overwrite mode publishes ATOMICALLY via [[graft.core.AtomicParquet]]
   * (temp-dir + rename swap): the plan may lazily read the very path it
   * replaces — which every self-referential pattern (incremental
   * aggregation, dimension reading its own target) does — and a mid-write
   * crash never leaves the sink truncated. Append/error modes write
   * directly.
   */
  /**
   * Invalidate-and-refresh every cached plan (and file-status listing)
   * over a just-published sink path. Without this, a PERSISTED DataFrame
   * reading `path` from an earlier run in the same session keeps serving
   * the pre-overwrite snapshot: the atomic temp-dir + rename swap writes
   * through a TEMP path, so Spark's own write-path invalidation never
   * fires for the final location, and CacheManager substitutes the stale
   * InMemoryRelation into any new logically-identical scan. Surfaced by
   * TrainingSoakSpec's two-batch pipeline run (batch 2's nodes silently
   * consumed batch 1's auto-cached sinks).
   */
  /** Table-format sinks' schema-evolution policy from write options
    * (schema_mode / on_new_columns / on_missing_columns). */
  private def sinkPolicy(cfg: WriteConfig): DeltaSchema.Policy =
    DeltaSchema.Policy(
      cfg.options.getOrElse("schema_mode", "enforce"),
      cfg.options.getOrElse("on_new_columns", "add_nullable"),
      cfg.options.getOrElse("on_missing_columns", "fill_null"))

  private def refreshSink(df: DataFrame, path: String): Unit =
    try df.sparkSession.catalog.refreshByPath(path)
    catch { case _: Exception => () } // best effort: never fail a completed write

  def writeWithStats(df: DataFrame, path: String,
                     cfg: WriteConfig = WriteConfig()): Long =
    writeWithStatsSized(sizedForTarget(df, cfg), path, cfg)

  /**
   * Target-size the write: pick the output partition count from the
   * optimizer's size estimate so files land near `target_file_size_mb`
   * instead of inheriting whatever partitioning the plan ends with — the
   * declarative answer to the small-files problem (and its inverse, the
   * one-giant-file write). Downsizing uses coalesce (no shuffle);
   * upsizing repartitions. The estimate is the in-memory stats size over
   * an assumed ~3x columnar compression — files land near the target,
   * not exactly on it. Skipped when the caller already chose a layout
   * (explicit coalesce, hive partitioning, or Z-ordering).
   */
  private def sizedForTarget(df: DataFrame, cfg: WriteConfig): DataFrame =
    cfg.targetFileSizeMb match {
      case Some(mb) if cfg.coalescePartitions.isEmpty &&
          cfg.partitionBy.isEmpty && cfg.zorderBy.isEmpty =>
        require(mb > 0, s"target_file_size_mb must be positive, got $mb")
        // for file-backed plans (the dominant rewrite/compaction case) the
        // stats ARE on-disk bytes, so disk-in ~ disk-out; in-memory plans
        // carry type-default row estimates and simply land smaller files
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes.max(1)
        val target = mb.toLong * 1024 * 1024
        val n = ((est + target - 1) / target).toLong.max(1).min(200000).toInt
        val cur = df.rdd.getNumPartitions
        if (n < cur) df.coalesce(n)
        else if (n > cur) df.repartition(n)
        else df
      case _ => df
    }

  private def writeWithStatsSized(df: DataFrame, path: String,
                     cfg: WriteConfig): Long = {
    require(cfg.zorderBy.forall(c => !cfg.partitionBy.contains(c)),
      "zorder_by overlaps partition_by — a partition column is constant " +
        "per file already; z-order the non-partition dimensions")
    if (cfg.format == "delta") {
      // native Delta commit protocol (no delta-spark jar in this env):
      // data files go through the ordinary distributed parquet writer,
      // the transaction log is published by atomic rename — see DeltaWriter.
      // zorder_by stages the frame through the Z-order layout first (same
      // clustered-file-ranges contract as the parquet path; partition_by
      // exclusion is enforced above); `optimize_after: true` compacts the
      // table's small files post-commit via DeltaMaintenance (dataChange=
      // false, so readers and time travel are unaffected).
      val pinnedDelta =
        if (cfg.zorderBy.nonEmpty) // the layout takes 3 passes over the input
          Some(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        else None
      val commit = try {
        val d0 = pinnedDelta match {
          case Some(in) => zOrderFrame(in, cfg.zorderBy,
            numFiles = cfg.coalescePartitions.getOrElse(32),
            partitionCols = cfg.partitionBy)
          case None => cfg.coalescePartitions.map(df.coalesce).getOrElse(df)
        }
        // replace_where: "k=v,k2=v2" — partition-scoped overwrite
        val replaceWhere = cfg.options.get("replace_where").map(_.split(",")
          .map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"malformed replace_where entry '$kv' (want k=v)")
            kv.substring(0, i).trim -> kv.substring(i + 1).trim
          }.toMap).getOrElse(Map.empty[String, String])
        // schema_mode / on_new_columns / on_missing_columns options: the
        // append-side evolution policy (an upstream that gains a column
        // widens the table in the same commit under evolve)
        DeltaWriter.write(d0, path, cfg.mode, cfg.partitionBy,
          replaceWhere = replaceWhere, schemaPolicy = sinkPolicy(cfg),
          // optimize_write: cluster by partition values so file count
          // tracks partitions, not tasks x partitions
          clusterWrite = cfg.options.get("optimize_write")
            .exists(_.equalsIgnoreCase("true")))
      } finally pinnedDelta.foreach { p => p.unpersist(); () }
      if (cfg.options.get("optimize_after").exists(_.equalsIgnoreCase("true"))) {
        val target = cfg.options.get("target_file_bytes").map(_.toLong)
          .getOrElse(128L << 20)
        DeltaMaintenance.optimize(df.sparkSession, path, targetFileBytes = target)
      }
      refreshSink(df, path)
      return commit.rowsWritten
    }
    if (cfg.format == "iceberg") {
      require(cfg.zorderBy.isEmpty, "iceberg sink does not z-order")
      val d = cfg.coalescePartitions.map(df.coalesce).getOrElse(df)
      val mode = if (cfg.mode == "append") "append" else "overwrite"
      // partition_by commits the partition spec — identity column names
      // or HIDDEN-PARTITIONING transforms ("day(ts)", "bucket(16, id)",
      // "truncate(4, s)"); per-file partition tuples + manifest bound
      // summaries drive read pruning either way
      val rows = IcebergSource.write(d, path, mode,
        partitionBy = cfg.partitionBy, schemaPolicy = sinkPolicy(cfg),
        clusterWrite = cfg.options.get("optimize_write")
          .exists(_.equalsIgnoreCase("true")))
      // optimize_after: true bin-packs small files into a replace
      // snapshot right after the load (micro-batch sinks accrete them)
      if (cfg.options.get("optimize_after").exists(_.equalsIgnoreCase("true"))) {
        val target = cfg.targetFileSizeMb.map(_.toLong << 20).getOrElse(128L << 20)
        IcebergMaintenance.optimize(df.sparkSession, path, targetFileBytes = target)
        ()
      }
      refreshSink(df, path)
      return rows
    }
    if (cfg.format == "avro" || cfg.format == "excel" || cfg.format == "warc") {
      // native paths (no DataSource jar in this env): rows counted by the
      // write tasks themselves, so no Observation needed and no second job
      require(cfg.partitionBy.isEmpty && cfg.zorderBy.isEmpty,
        s"${cfg.format} sink supports coalesce_partitions but not partition_by/zorder_by")
      val d = cfg.coalescePartitions.map(df.coalesce).getOrElse(df)
      val rows = cfg.format match {
        case "avro" =>
          AvroSource.write(d, path, cfg.mode,
            codec = cfg.options.getOrElse("codec", "snappy"))
        case "excel" => ExcelSource.write(d, path, cfg.mode)
        case _ => WarcSource.write(d, path, cfg.mode,
          codec = cfg.options.get("codec").getOrElse(
            if (cfg.options.get("gzip").exists(!_.toBoolean)) "none" else "gzip"),
          defaultRecordType = cfg.options.getOrElse("record_type", "conversion"))
      }
      refreshSink(df, path)
      return rows
    }
    val obs = org.apache.spark.sql.Observation()
    // zorder (declarative clustering, reference liquid/ZORDER write
    // config): the layout needs THREE passes over the input — min/max
    // stats, range-partitioner sampling, the write itself — so pin the
    // input for their duration; the Observation sits ABOVE the transform
    // so only the write job (the one pass that traverses the final frame)
    // feeds rows_written, not the stats pass. coalesce_partitions doubles
    // as the clustered file count.
    val pinned =
      if (cfg.zorderBy.nonEmpty)
        Some(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None
    try {
      val d = pinned match {
        case Some(in) =>
          zOrderFrame(in, cfg.zorderBy,
            numFiles = cfg.coalescePartitions.getOrElse(32),
            partitionCols = cfg.partitionBy)
            .observe(obs, count(lit(1)).as("rows_written"))
        case None =>
          val observed = df.observe(obs, count(lit(1)).as("rows_written"))
          cfg.coalescePartitions.map(observed.coalesce).getOrElse(observed)
      }
      def writeTo(p: String): Unit = {
        var w = d.write.format(cfg.format).mode(cfg.mode).options(cfg.options)
        if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
        w.save(p)
      }
      if (cfg.mode == "overwrite")
        graft.core.AtomicParquet.swap(
          df.sparkSession.sessionState.newHadoopConf(), path,
          java.lang.Long.toHexString(System.nanoTime()))(writeTo)
      else writeTo(path)
      refreshSink(df, path)
      obs.get("rows_written").asInstanceOf[Long]
    } finally pinned.foreach { p => p.unpersist(); () }
  }

  /**
   * Bucketed table write (beyond-reference, 100 TB path): both sides of a
   * recurring join bucketed on the join keys with the same bucket count
   * join WITHOUT a shuffle (bucket metadata lives in the session catalog,
   * hence saveAsTable). `sortBy` additionally pre-sorts within buckets so
   * sort-merge joins skip the sort too.
   */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil,
                    format: String = "parquet", mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    var w = df.write.format(format).mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /**
   * Z-order clustered write WITHOUT Delta (the reference's OPTIMIZE ZORDER
   * is Delta-only and env-blocked here; this is the pure-Spark data-layout
   * equivalent): normalize each cluster column to a bounded integer rank
   * (ntile over its own order), interleave the bits into a Z-value, then
   * range-partition + sort by it before writing parquet. Files then carry
   * tight min/max ranges on ALL cluster columns, so row-group skipping
   * works for filters on any of them — the point of Z-ordering.
   */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bitsPerCol: Int = 12, numFiles: Int = 32,
                    format: String = "parquet", mode: String = "overwrite"): Unit =
    zOrderFrame(df, zCols, bitsPerCol, numFiles)
      .write.format(format).mode(mode).save(path)

  /** The Z-order layout as a frame transform: scale each cluster column
    * to `bitsPerCol` bits, interleave into a Z-value, range-partition +
    * sort by it, drop the scratch columns. Shared by [[writeZOrdered]]
    * and the declarative `zorder_by` write key. */
  /** Cluster column as an ORDERED double, or a clear error: a silent
    * cast('double') on a string column yields all-null ranks — every row
    * lands in bucket 0 and the "clustered" write collapses to one
    * unordered file. Fail fast instead; pre-transform strings (e.g. a
    * numeric prefix, a hash) if they must cluster. */
  private def zNumeric(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case DateType | TimestampType | TimestampNTZType =>
        col(c).cast("timestamp").cast("double") // epoch seconds
      case other => throw new IllegalArgumentException(
        s"zorder column '$c' has unordered type ${other.simpleString}; " +
          "cluster columns must be numeric/date/timestamp — derive a " +
          "numeric rank first (e.g. a hash or parsed prefix)")
    }
  }

  private[graft] def zOrderFrame(df: DataFrame, zCols: Seq[String],
                                 bitsPerCol: Int = 12,
                                 numFiles: Int = 32,
                                 partitionCols: Seq[String] = Nil,
                                 statsHint: Map[String, (Double, Double)] =
                                   Map.empty): DataFrame = {
    require(zCols.nonEmpty && zCols.size <= 4, "1..4 z-order columns")
    require(bitsPerCol * zCols.size <= 60, "interleaved bits must fit a long")
    val buckets = 1 << bitsPerCol
    // min/max linear scaling to [0, buckets): one distributed agg, no
    // global window (rank-based normalization would single-partition) —
    // SKIPPED entirely when the caller already knows the ranges
    // (`statsHint`, e.g. from table-format manifest bounds: scanning a
    // 100 TB table twice just for min/max doubles the compaction I/O).
    // Heavily skewed columns get uneven buckets — pre-transform (log etc.)
    // if that matters; Z-value quality degrades gracefully either way.
    val ranges: Map[String, (Double, Double)] =
      if (zCols.forall(statsHint.contains)) statsHint
      else {
        val statsCols = zCols.flatMap(c =>
          Seq(min(zNumeric(df, c)).as(s"_mn_$c"),
            max(zNumeric(df, c)).as(s"_mx_$c")))
        val stats = df.agg(statsCols.head, statsCols.tail: _*).head()
        zCols.map(c => c -> ((
          Option(stats.getAs[java.lang.Double](s"_mn_$c")).map(_.toDouble).getOrElse(0.0),
          Option(stats.getAs[java.lang.Double](s"_mx_$c")).map(_.toDouble).getOrElse(1.0)))).toMap
      }
    val ranked = zCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val (mn, mx) = ranges(c)
      val span = math.max(mx - mn, Double.MinPositiveValue)
      d.withColumn(s"_graft_z_$i",
        least(greatest(
          floor((zNumeric(df, c) - mn) / span * buckets).cast("long"),
          lit(0L)), lit((buckets - 1).toLong)))
    }
    // bit-interleave: z = sum over bits b, cols i of bit(v_i, b) << (b*k + i)
    val k = zCols.size
    val zValue = (0 until bitsPerCol).flatMap { b =>
      (0 until k).map { i =>
        shiftleft(shiftright(col(s"_graft_z_$i"), b).bitwiseAND(lit(1L)),
          b * k + i)
      }
    }.reduce(_ + _)
    // hive-partitioned tables cluster WITHIN each partition: range
    // partitioning leads with the partition columns, so same-partition
    // rows stay contiguous (each task writes few partition dirs) and the
    // z-ranges are disjoint per partition — per-partition skipping
    val rangeCols = partitionCols.map(col) :+ col("_graft_zv")
    ranked.withColumn("_graft_zv", zValue)
      .repartitionByRange(numFiles, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .drop((0 until k).map(i => s"_graft_z_$i") :+ "_graft_zv": _*)
  }

  /**
   * Content hash for skip_if_unchanged (reference: odibi/config.py:4273-4296,
   * odibi/node.py:2831-2968): an order-insensitive SHA over the selected
   * columns — computed distributed (per-row xxhash64 xor-folded via bit_xor),
   * no driver-side sort/collect.
   */
  def contentHash(df: DataFrame, columns: Seq[String] = Nil): String = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val rowHash = xxhash64(cols.map(c => col(c).cast("string")): _*)
    val agg = df.select(rowHash.as("h"))
      .agg(expr("bit_xor(h)").cast("string").as("x"),
        count(lit(1)).cast("string").as("n"))
      .collect()(0)
    s"${agg.getString(0)}:${agg.getString(1)}"
  }

  /**
   * harmonize_schema (reference: odibi/engine/base.py:243, spark impl
   * spark_engine.py:393): select/cast-align a frame to a target schema.
   * Policy mirrors SchemaMode (config.py:4355-4395): extra columns are
   * dropped (onNewColumns=ignore) or error; missing columns are filled with
   * typed nulls (onMissingColumns=fill) or error.
   */
  def harmonizeSchema(df: DataFrame, target: StructType,
                      onNewColumns: String = "ignore",
                      onMissingColumns: String = "fill"): DataFrame = {
    val have = df.columns.toSet
    val want = target.fields.map(_.name).toSet
    val extra = have -- want
    val missing = want -- have
    if (extra.nonEmpty && onNewColumns == "error")
      throw new IllegalArgumentException(s"unexpected columns: $extra")
    if (missing.nonEmpty && onMissingColumns == "error")
      throw new IllegalArgumentException(s"missing columns: $missing")
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /**
   * Declarative schema contract (reference: SchemaMode / OnNewColumns /
   * OnMissingColumns, odibi/config.py:4355-4395). `schemaMode`:
   * "enforce" (any mismatch fails) or "evolve" (per-direction policies:
   * new columns ignore|fail|add_nullable, missing columns fail|fill_null).
   */
  final case class ContractConfig(schemaDdl: Option[String] = None,
                                  schemaMode: String = "evolve",
                                  onNewColumns: String = "ignore",
                                  onMissingColumns: String = "fill_null")

  /**
   * Enforce a schema contract between read and transform. The expected
   * schema is the declared `schema_ddl`, or (when absent) `fallback` —
   * the current sink's schema, so an existing table contracts its own
   * future loads. Matching columns are always cast-aligned to the
   * expected types (plan-time casts — free under codegen).
   */
  def applyContract(df: DataFrame, contract: ContractConfig,
                    fallback: Option[StructType] = None): DataFrame = {
    val target = contract.schemaDdl.map(StructType.fromDDL).orElse(fallback)
      .getOrElse(throw new IllegalArgumentException(
        "contract needs schema_ddl or an existing sink to infer from"))
    val have = df.columns.toSet
    val want = target.fields.map(_.name).toSet
    val extra = df.columns.filterNot(want.contains).toSeq // keep source order
    val missing = want -- have
    def aligned(keepExtra: Boolean): DataFrame = {
      val core = target.fields.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq
      df.select(core ++ (if (keepExtra) extra.map(col) else Nil): _*)
    }
    contract.schemaMode match {
      case "enforce" =>
        if (extra.nonEmpty || missing.nonEmpty)
          throw new IllegalArgumentException(
            s"schema contract (enforce): new=${extra.mkString(",")} missing=${missing.mkString(",")}")
        aligned(keepExtra = false)
      case "evolve" =>
        if (extra.nonEmpty && contract.onNewColumns == "fail")
          throw new IllegalArgumentException(s"schema contract: unexpected columns $extra")
        if (missing.nonEmpty && contract.onMissingColumns == "fail")
          throw new IllegalArgumentException(s"schema contract: missing columns $missing")
        aligned(keepExtra = extra.nonEmpty && contract.onNewColumns == "add_nullable")
      case other =>
        throw new IllegalArgumentException(s"unknown schema_mode: $other (enforce|evolve)")
    }
  }

  /**
   * register_table (spark_engine.py:1463-1505): register a path-based
   * dataset as an external table in the session catalog.
   */
  def registerTable(spark: SparkSession, table: String, path: String,
                    format: String = "parquet"): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING $format LOCATION '$path'")

  /**
   * cloudFiles passthrough (config.py:1097): on Databricks this is Auto
   * Loader; elsewhere it degrades to the built-in file-stream source with
   * the same options surface.
   */
  def readCloudFiles(spark: SparkSession, path: String, format: String,
                     schemaDdl: String,
                     options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format(format).schema(StructType.fromDDL(schemaDdl))
      .options(options).load(path)

  /** Skip the write when the content hash matches the previous one. */
  def writeIfChanged(df: DataFrame, path: String, previousHash: Option[String],
                     cfg: WriteConfig = WriteConfig(),
                     hashColumns: Seq[String] = Nil): (Boolean, String) = {
    val h = contentHash(df, hashColumns)
    if (previousHash.contains(h)) (false, h)
    else { write(df, path, cfg); (true, h) }
  }

  /**
   * Parse the declarative iceberg `partition_filter` option into
   * [[IcebergSource.PartitionPredicate]]s. Grammar: semicolon-separated
   * `name op value` with op in `= != < <= > >= in`; `in` takes
   * `|`-separated members. Values parse as longs when numeric, strings
   * otherwise — matching how identity/bucket/day partition values are
   * stored. Example: `region in US|DE; day >= 19700`.
   */
  private[sources] def parsePartitionFilter(
      s: String): Seq[IcebergSource.PartitionPredicate] = {
    def value(v: String): Any =
      scala.util.Try(v.trim.toLong).getOrElse(v.trim): Any
    s.split(';').map(_.trim).filter(_.nonEmpty).map { clause =>
      val m = "^(\\S+)\\s+(=|!=|<=|>=|<|>|in)\\s+(.+)$".r
      clause match {
        case m(name, "in", vs) => IcebergSource.PartitionPredicate(
          name, "in", vs.split('|').map(value).toSeq)
        case m(name, op, v) => IcebergSource.PartitionPredicate(name, op, value(v))
        case other => throw new IllegalArgumentException(
          s"partition_filter clause '$other' is not 'name op value' " +
            "(op: = != < <= > >= in)")
      }
    }.toSeq
  }
}
