package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.TextAnalysis

/**
 * Persisted Bloom-filter membership index for incremental exact dedup —
 * the corpus-scale fast path in front of [[Dedup.incrementalExactDedup]].
 *
 * The problem at 100 TB: deduping each new crawl batch against the
 * accumulated corpus anti-joins the batch against billions of seen
 * fingerprints, shuffling the corpus-side fingerprint table every batch
 * even though the typical batch is overwhelmingly NEW documents. A Bloom
 * filter over the seen fingerprints answers "definitely new" without any
 * join: only the small bloom-positive slice (true duplicates + the
 * configured false-positive rate) needs the exact check, and that slice
 * is small enough that the corpus side reduces via a pair of joins AQE
 * turns into broadcasts — the seen set is scanned but never shuffled.
 *
 * Sizing: ~1.2 GB of bits per 10^9 keys at 1% fpp (`-ln(p)/ln(2)^2` ≈
 * 9.6 bits/key), executor-broadcastable into the tens of billions of
 * keys; past that, shard the filter by fingerprint prefix and probe each
 * batch row against its shard. Bloom filters union by bitwise OR, so the
 * index grows incrementally — each accepted batch's fingerprints are
 * built into a batch-local filter DISTRIBUTED-side (one aggregate, no
 * driver collect of keys) and merged in.
 *
 * False positives never lose data: a bloom-positive row still passes the
 * exact fingerprint check before being dropped. The filter is only ever
 * an over-approximation of seen — a crashed run that saved the filter
 * but not the batch output re-checks against the exact seen set, and a
 * filter missing recent batches (saved output, crashed before filter
 * save) only sends more rows to the exact path.
 */
object BloomIndex {

  /** Build a filter from a fingerprint column — distributed aggregate
    * (Spark's stat.bloomFilter treeAggregate), no key collect. An empty
    * frame yields an empty filter of the SAME geometry, so it stays
    * merge-compatible (bit size is a function of (expectedItems, fpp));
    * the empty case is detected from the aggregate itself (Spark returns
    * a null buffer) rather than a separate isEmpty job. */
  def build(fps: DataFrame, colName: String, expectedItems: Long,
            fpp: Double = 0.01): BloomFilter =
    try fps.stat.bloomFilter(colName, expectedItems, fpp)
    catch {
      // Spark returns a null aggregate buffer for empty input; accept the
      // empty-filter substitution ONLY after confirming the input really is
      // empty — any other NPE must surface, or a non-empty seen set would
      // silently yield an always-negative filter and skip the exact check
      case npe: NullPointerException =>
        if (fps.isEmpty) BloomFilter.create(expectedItems, fpp) else throw npe
    }

  /** Filter membership as a native codegen'd expression (long keys). */
  def mightContain(child: Column, filter: BloomFilter): Column =
    ColumnShim.column(BloomMightContainLong(ColumnShim.expression(child), filter))

  // ---------------- persistence (Hadoop FS — object-store safe) ----------------

  def save(spark: SparkSession, filter: BloomFilter, path: String,
           expectedItems: Long, fpp: Double): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(path, s"bloom.bin.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try filter.writeTo(out) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(path, "bloom.bin")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"could not publish bloom filter at $dst")
    // geometry params beside the bits: future batch filters must be built
    // with the SAME (expectedItems, fpp) or mergeInPlace rejects them
    val pf = fs.create(new org.apache.hadoop.fs.Path(path, "params.json"), true)
    try pf.write(s"""{"expected_items": $expectedItems, "fpp": $fpp}"""
      .getBytes("UTF-8")) finally pf.close()
  }

  /** The (expectedItems, fpp) the index at `path` was created with. */
  def params(spark: SparkSession, path: String): (Long, Double) = {
    val f = new org.apache.hadoop.fs.Path(path, "params.json")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(f)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val m = """\{"expected_items": (\d+), "fpp": ([0-9.eE+-]+)\}""".r
    s match {
      case m(n, p) => (n.toLong, p.toDouble)
      case _ => throw new IllegalStateException(s"unreadable bloom params at $path: $s")
    }
  }

  def load(spark: SparkSession, path: String): BloomFilter = {
    val f = new org.apache.hadoop.fs.Path(path, "bloom.bin")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(f)
    try BloomFilter.readFrom(in) finally in.close()
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val f = new org.apache.hadoop.fs.Path(path, "bloom.bin")
    f.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(f)
  }

  // ---------------- incremental dedup ----------------

  /**
   * [[Dedup.incrementalExactDedup]] semantics (within-batch winners by
   * min id, then drop anything already in `seen`) with the Bloom fast
   * path. Plan shape, in order:
   *  1. bloom-negative rows are accepted with NO join at all;
   *  2. the bloom-positive slice semi-reduces `seen` to just the
   *     colliding fingerprints (AQE broadcasts the batch-sized probe
   *     set — `seen` is scanned once, never shuffled);
   *  3. the reduced seen subset (≤ probe size) anti-joins back.
   * Worst case (a fully-duplicate batch) degrades to exactly the plain
   * sort-merge anti join AQE would have planned anyway.
   */
  def incrementalExactDedup(batch: DataFrame, idCol: String, textCol: String,
                            seen: DataFrame, filter: BloomFilter): DataFrame = {
    val withFp = batch.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
    val inBatchWinners = withFp
      .groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val winners = withFp.join(inBatchWinners, Seq(idCol), "left_semi")
      .withColumn("_maybe", mightContain(col("_fp"), filter))
    val defNew = winners.filter(!col("_maybe"))
    val maybe = winners.filter(col("_maybe"))
    val seenSubset = seen.select(col("fingerprint").as("_fp"))
      .join(maybe.select("_fp").distinct(), Seq("_fp"), "left_semi")
    val confirmedNew = maybe.join(seenSubset, Seq("_fp"), "left_anti")
    defNew.unionByName(confirmedNew).drop("_fp", "_maybe")
  }

  /**
   * Full index lifecycle for one batch against the index at `path`:
   * probe (or bootstrap on first batch), then merge the ACCEPTED rows'
   * fingerprints into the filter and republish it. Returns the
   * surviving rows. `seen` remains the exact source of truth — the
   * filter is a pure accelerator and is rebuilt from `seen` if absent.
   */
  def dedupAgainst(spark: SparkSession, path: String,
                   batch: DataFrame, idCol: String, textCol: String,
                   seen: DataFrame, expectedItems: Long,
                   fpp: Double = 0.01): DataFrame = {
    // an existing index pins the geometry: batch filters must be built
    // with the same (expectedItems, fpp) to merge
    val (n, p) =
      if (exists(spark, path)) params(spark, path) else (expectedItems, fpp)
    // the seen fingerprints are referenced up to three times in one
    // lifecycle (bootstrap build, probe semi-join, and the plans feeding
    // them) — cache the scalar column for the duration
    val seenFp = seen.select(col("fingerprint")).cache()
    try {
      val filter =
        if (exists(spark, path)) load(spark, path)
        // bootstrap is NOT saved here — the merged filter (bootstrap +
        // accepted batch) publishes once below
        else build(seenFp, "fingerprint", n, p)
      val survivors = incrementalExactDedup(batch, idCol, textCol, seenFp, filter)
        .localCheckpoint() // materialize BEFORE mutating the shared filter
      val batchFilter = build(
        survivors.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint")),
        "fingerprint", n, p)
      filter.mergeInPlace(batchFilter)
      save(spark, filter, path, n, p)
      survivors
    } finally seenFp.unpersist(false)
  }
}

/**
 * `filter.mightContainLong(key)` as a codegen'd expression. The filter
 * rides to executors inside the serialized task binary (itself torrent-
 * broadcast), deserialized once per executor; the generated code is one
 * virtual call per row, inside the surrounding WholeStageCodegen span.
 */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
