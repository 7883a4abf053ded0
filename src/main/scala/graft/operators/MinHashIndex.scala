package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash-LSH index + incremental near-dup dedup — the corpus-
 * scale companion to [[Dedup.minhashDedup]] (reference semantics:
 * odibi/transformers/dedup.py near-dup family; the incremental shape
 * follows the published GPT-3/Pile recipe of deduping each NEW crawl
 * batch against the accumulated corpus without re-signing it).
 *
 * The index at `path` is two parquet tables:
 *  - `bands/` — (id, band, bucket): the LSH blocking rows, partitioned
 *    by `band` so a batch probe reads only colliding band files;
 *  - `sigs/`  — (id, sig: array<bigint>): full minhash signatures.
 *
 * Dedup-time verify uses SIGNATURE AGREEMENT (fraction of equal minhash
 * positions — the standard unbiased Jaccard estimator), so the corpus
 * TEXT is never read back: per new batch the only corpus-sized work is
 * one equi-join against `bands` and one id-join against `sigs`. At
 * 100 TB the signatures are ~0.5 KB/doc — three orders smaller than the
 * corpus — and both joins shuffle scalar rows only.
 *
 * Exact duplicates agree on every minhash position regardless of hash
 * seeds, so `threshold = 1.0` gives deterministic exact-dup semantics;
 * lower thresholds are estimator-accurate to ±1/sqrt(numHashes).
 */
object MinHashIndex {

  /** Index layout/signature parameters — must match between build and
    * probe; persisted in `params.json` beside the tables and validated. */
  final case class Params(shingleSize: Int = 5, numHashes: Int = 64,
                          bands: Int = 16) {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    def rows: Int = numHashes / bands
    private[MinHashIndex] def json: String =
      s"""{"shingle_size": $shingleSize, "num_hashes": $numHashes, "bands": $bands}"""
  }

  /** (id, sig, bands) columns for a frame — `sig` evaluated once. */
  private def signed(df: DataFrame, idCol: String, textCol: String,
                     p: Params): DataFrame =
    df.select(col(idCol).as("id"),
      graft.expressions.HashFunctions.minhashShingles(
        Dedup.normText(col(textCol)), p.shingleSize, p.numHashes).as("sig"))

  private def bandRows(signedDf: DataFrame, p: Params): DataFrame =
    signedDf.select(col("id"), explode(
      Dedup.bindOnce(col("sig")) { s =>
        array((0 until p.bands).map { b =>
          struct(lit(b).as("band"), xxhash64(concat_ws(",",
            slice(s, b * p.rows + 1, p.rows).cast("array<string>")), lit(b))
            .as("bucket"))
        }: _*)
      }).as("_b"))
      .select(col("id"), col("_b.band").as("band"), col("_b.bucket").as("bucket"))

  private def writeParams(spark: org.apache.spark.sql.SparkSession,
                          path: String, p: Params): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/params.json"), true)
    try out.write(p.json.getBytes("UTF-8")) finally out.close()
  }

  /** Self-describe the two tables' schemas beside params.json so probes
    * read with an explicit schema instead of launching parquet
    * footer-inference jobs (2 per probe; at corpus scale the index spans
    * many files and inference is a footer sweep). Only the id column's
    * type varies between indexes — band/bucket/sig are fixed by the
    * format — but persisting the full DDL keeps the read site trivial. */
  private def writeSchemas(spark: org.apache.spark.sql.SparkSession,
                           path: String, sigs: org.apache.spark.sql.types.StructType,
                           bands: org.apache.spark.sql.types.StructType): Unit = {
    val node = jsonMapper.createObjectNode()
    node.put("sigs", sigs.toDDL)
    node.put("bands", bands.toDDL)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/schema.json"), true)
    try out.write(node.toString.getBytes("UTF-8")) finally out.close()
  }

  /** (bands, sigs) read schemas, or None for an index persisted before
    * schema.json existed (those fall back to footer inference). */
  private def readSchemas(spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[(org.apache.spark.sql.types.StructType,
                org.apache.spark.sql.types.StructType)] = {
    val fp = new org.apache.hadoop.fs.Path(s"$path/schema.json")
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(fp)) None
    else {
      val in = fs.open(fp)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val node = jsonMapper.readTree(txt)
      Some((org.apache.spark.sql.types.StructType.fromDDL(node.get("bands").asText()),
        org.apache.spark.sql.types.StructType.fromDDL(node.get("sigs").asText())))
    }
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def checkParams(spark: org.apache.spark.sql.SparkSession,
                          path: String, p: Params): Unit = {
    val fp = new org.apache.hadoop.fs.Path(s"$path/params.json")
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(fp)) {
      val in = fs.open(fp)
      val stored = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      require(stored == p.json,
        s"minhash index at $path was built with $stored; probe uses ${p.json} — " +
          "signatures are incomparable across parameter changes (rebuild the index)")
    }
  }

  /** Build (atomic overwrite) the index from a corpus. */
  def build(df: DataFrame, idCol: String, textCol: String, path: String,
            params: Params = Params()): Unit = {
    val spark = df.sparkSession
    val s = signed(df, idCol, textCol, params).persist()
    try {
      // two tables can't swap in one atomic op; bands first, sigs second —
      // a probe racing the build sees at worst a banded id whose signature
      // join drops it (miss → kept doc), never a phantom match
      val bands = bandRows(s, params)
      graft.core.AtomicParquet.swap(
        spark.sessionState.newHadoopConf(), s"$path/bands", "b")(tmp =>
        bands.write.partitionBy("band").mode("overwrite").parquet(tmp))
      graft.core.AtomicParquet.overwrite(s, s"$path/sigs")
      writeParams(spark, path, params)
      writeSchemas(spark, path, s.schema, bands.schema)
    } finally { s.unpersist(); () }
  }

  /** Append a batch's rows to the index (no dedup — see dedupAndUpdate). */
  def append(df: DataFrame, idCol: String, textCol: String, path: String,
             params: Params = Params()): Unit = {
    checkParams(df.sparkSession, path, params)
    // sig computed once, reused by both writes via a local checkpointless
    // persist — the batch is the small side by construction
    val s = signed(df, idCol, textCol, params).persist()
    try {
      val bands = bandRows(s, params)
      bands.write.partitionBy("band").mode("append").parquet(s"$path/bands")
      s.write.mode("append").parquet(s"$path/sigs")
      writeParams(df.sparkSession, path, params)
      writeSchemas(df.sparkSession, path, s.schema, bands.schema)
    } finally { s.unpersist(); () }
  }

  /**
   * Batch rows that are NOT near-duplicates (estimated Jaccard >=
   * `threshold`) of any indexed document, with the batch also deduped
   * against itself ([[Dedup.minhashDedup]] keeps one representative per
   * in-batch cluster).
   *
   * @param maxCandidatesPerDoc degenerate-bucket guard: one confirming
   *   match suffices to drop a doc, so candidates beyond this many per
   *   batch doc are ignored. A doc landing in a boilerplate bucket of
   *   millions otherwise drags the whole bucket through the verify join;
   *   the cap bounds verify work at cap × batch. Candidate rows are 2
   *   scalars — the per-doc cap window is bandwidth-, not memory-bound.
   */
  def dedupAgainst(batch: DataFrame, idCol: String, textCol: String,
                   path: String, params: Params = Params(),
                   threshold: Double = 0.8,
                   maxCandidatesPerDoc: Int = 200): DataFrame = {
    val spark = batch.sparkSession
    checkParams(spark, path, params)
    // ONE signature pass over the batch text, materialized: the signature
    // frame is the lightweight proxy (~0.5 KB/doc) every decision below
    // reads — in-batch dedup, index probe AND verify. Referencing the
    // lazily-signed frame from each consumer instead re-evaluated the
    // shingle+minhash expressions once per plan subtree (4× the dominant
    // cost; the corpus text itself is read exactly once).
    val sigs = signed(batch, idCol, textCol, params).localCheckpoint()
    val banded = bandRows(sigs, params)
    // in-batch dedup over the banded signatures — the same label
    // assignment as [[Dedup.minhashDedup]] (identical band/bucket
    // construction), minus its second text scan
    val labels = banded
      .join(banded.groupBy("band", "bucket")
        .agg(min(col("id")).as("_rep")), Seq("band", "bucket"))
      .groupBy(col("id")).agg(min(col("_rep")).as("_label"))
    val keepIds = labels.filter(col("id") === col("_label")).select(col("id"))
    val probe = banded.join(keepIds, Seq("id"), "left_semi")
    // explicit schemas (when the index self-describes) skip the two
    // footer-inference jobs an unschema'd parquet read launches per probe
    val schemas = readSchemas(spark, path)
    val idx = schemas.fold(spark.read)(s => spark.read.schema(s._1))
      .parquet(s"$path/bands")
    val candidates = probe.join(
        idx.select(col("band"), col("bucket"), col("id").as("_iid")),
        Seq("band", "bucket"))
      .select(col("id"), col("_iid")).distinct()
    val capped = candidates
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("_iid"))))
      .filter(col("_rn") <= maxCandidatesPerDoc).drop("_rn")
    val idxSigs = schemas.fold(spark.read)(s => spark.read.schema(s._2))
      .parquet(s"$path/sigs")
      .select(col("id").as("_iid"), col("sig").as("_isig"))
    val agree = aggregate(
      zip_with(col("sig"), col("_isig"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc: Column, x: Column) => acc + x)
      .cast("double") / params.numHashes
    val dupIds = capped
      .join(sigs.select(col("id"), col("sig")), Seq("id"))
      .join(idxSigs, Seq("_iid"))
      .filter(agree >= threshold)
      .select(col("id")).distinct()
    val surviveIds = keepIds.join(dupIds, Seq("id"), "left_anti")
      .withColumnRenamed("id", idCol)
    batch.join(surviveIds, Seq(idCol), "left_semi")
  }

  /** The incremental-pipeline step: dedup the batch against the index,
    * append the survivors, return them. */
  def dedupAndUpdate(batch: DataFrame, idCol: String, textCol: String,
                     path: String, params: Params = Params(),
                     threshold: Double = 0.8): DataFrame = {
    // first batch bootstraps the index: in-batch dedup, then build
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/sigs"))) {
      val first = Dedup.minhashDedup(batch, idCol, textCol,
        params.shingleSize, params.numHashes, params.bands).localCheckpoint()
      build(first, idCol, textCol, path, params)
      return first
    }
    // localCheckpoint cuts the lineage BEFORE the index mutates: the
    // returned frame must not lazily re-probe an index that now contains
    // the survivors themselves (every one would self-match and vanish)
    val survivors = dedupAgainst(batch, idCol, textCol, path, params, threshold)
      .localCheckpoint()
    // A non-empty batch whose EVERY doc matched the index is the signature
    // of a checkpoint-replayed micro-batch that crashed after the index
    // append but before its sink write — those rows are gone from the
    // target unless the caller reconciles. Surface it (cheap: survivors
    // are materialized, batch probe is limit-1).
    if (survivors.isEmpty && !batch.isEmpty) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dedupAndUpdate: all docs in a non-empty batch matched index at " +
          s"$path — if this batch is a checkpoint replay, its first " +
          s"delivery may have crashed between index append and sink " +
          s"write, and those rows were never written downstream")
    }
    append(survivors, idCol, textCol, path, params)
    survivors
  }
}
