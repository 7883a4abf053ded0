package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * File-scoped copy-on-write MERGE into a native Delta table — the
 * table-mutating counterpart of the snapshot algebra in
 * [[graft.operators.Merge]] / [[graft.operators.Scd]] (reference
 * semantics: odibi/transformers/merge_transformer.py:232-590 Delta MERGE
 * strategies, odibi/transformers/scd.py:553-736 optimized SCD2 path).
 *
 * Where the snapshot algebra rewrites the WHOLE target frame (fine for a
 * parquet sink, fatal at 100 TB), this plans the minimal physical
 * mutation and commits it atomically through
 * [[DeltaDvWriter.rowLevelCommit]]:
 *
 *  1. ONE provenance scan of the live table (`_gf_file`/`_gf_ridx`,
 *     existing DVs applied) joins the source on the merge keys — a
 *     key-column-pruned columnar scan, the same two-pass shape
 *     delta-spark's MERGE uses;
 *  2. matched target rows become deletion-vector bitmaps on their
 *     files — kilobytes, no data file rewritten;
 *  3. replacement + inserted rows land in NEW data files;
 *  4. remove+re-add(DV) + add + cdc actions publish as ONE commit, so
 *     readers see the merge atomically and CDF attributes every row.
 *
 * Untouched files are not re-emitted (the Delta log is delta-based), so
 * write amplification is proportional to TOUCHED files + appended rows,
 * never table size — the property DeltaMergeSpec soaks at 2M rows.
 *
 * Difference from the pure algebra worth knowing: `auditCols` stamp only
 * the rows this merge WRITES (matched-updates and inserts); untouched
 * rows keep their bytes, exactly like Delta MERGE's
 * updated/inserted-row expressions.
 */
object DeltaMerge {

  final case class MergeResult(version: Long, rowsDeleted: Long,
                               rowsAppended: Long, filesTouched: Int,
                               filesAdded: Int)

  private def toResult(r: DeltaDvWriter.RowCommitResult): MergeResult =
    MergeResult(r.version, r.deletedRows, r.appendedRows, r.filesTouched,
      r.filesAdded)

  private def keyCond(keys: Seq[String]): Column =
    keys.map(k => col(s"target.$k") <=> col(s"source.$k")).reduce(_ && _)

  /** The `partitionFilter` caller contract made a HARD error: every
    * source row must sit inside the filter. Target rows outside the
    * scope are never scanned, so an out-of-scope source row would miss
    * its match and silently INSERT a duplicate next to the un-updated
    * original. One aggregation over the (source-sized, never
    * table-sized) frame fails fast instead, naming the offending value.
    * Filter columns the source doesn't carry can't conflict and are
    * skipped. */
  private def requireSourceInScope(source: DataFrame,
                                   partitionFilter: Map[String, String],
                                   op: String): Unit = {
    val checkable = partitionFilter.filter { case (k, _) =>
      source.columns.contains(k) }
    if (checkable.isEmpty) return
    val offending = checkable.toSeq.map { case (k, v) =>
      col(k).isNull || col(k).cast("string") =!= lit(v)
    }.reduce(_ || _)
    val bad = source.filter(offending)
      .select(checkable.keys.toSeq.map(col): _*).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"$op: source rows fall outside partitionFilter $partitionFilter " +
          s"(e.g. ${checkable.keys.zip(bad.head.toSeq).map { case (k, x) =>
            s"$k=$x" }.mkString(", ")}) — an out-of-scope source row " +
          "would insert a duplicate instead of updating; widen the " +
          "filter or pre-filter the source")
  }

  /** Delta MERGE's cardinality contract: each target row may match at
    * most ONE source row. The DV bitmap dedupes positions, which would
    * HIDE a multi-match — but the per-pair replacement rows would still
    * append once per source match, silently duplicating data. One
    * grouped count over the (persisted) pair frame fails loudly instead,
    * matching delta-spark's multiple-source-rows MERGE error. */
  private def requireUniqueMatches(pairs: DataFrame, op: String): Unit = {
    val multi = pairs
      .groupBy(col("target._gf_file"), col("target._gf_ridx"))
      .count().filter(col("count") > 1).limit(1).collect()
    if (multi.nonEmpty)
      throw new UnsupportedOperationException(
        s"$op: multiple source rows matched the same target row " +
          s"(file ${multi.head.getString(0)}, row ${multi.head.getLong(1)}, " +
          s"${multi.head.getLong(2)} matches) — deduplicate the source on " +
          "the merge keys first (Delta MERGE cardinality contract)")
  }

  /**
   * upsert (merge_transformer strategy "upsert"): matched target rows are
   * replaced by their source row when `updateCondition` holds (else
   * kept); unmatched source rows insert when `insertCondition` holds;
   * unmatched target rows are untouched — physically as well as
   * logically. Conditions may reference `target.` / `source.` columns.
   * Source must carry every table column.
   */
  /**
   * `partitionFilter` prunes the CANDIDATE FILES driver-side before the
   * provenance scan (equality on partition-column values) — a merge
   * scoped to one day of a day-partitioned 100 TB table must scan one
   * day, not the table. Caller contract (the replaceWhere shape): every
   * source row's key must fall INSIDE the filter; target rows outside
   * it are never examined. Out-of-scope source rows are a HARD ERROR
   * (one source-sized aggregation checks it) — silently inserting a
   * duplicate next to the un-updated original is how scoped loads
   * corrupt tables.
   */
  def upsert(spark: SparkSession, root: String, source: DataFrame,
             keys: Seq[String],
             updateCondition: Option[String] = None,
             insertCondition: Option[String] = None,
             auditCols: Map[String, Column] = Map.empty,
             cdf: Boolean = true,
             txn: Option[(String, Long)] = None,
             checkpointInterval: Int = 10,
             partitionFilter: Map[String, String] = Map.empty,
             schemaPolicy: DeltaSchema.Policy = DeltaSchema.Enforce): MergeResult = {
    val snap = DeltaLog.snapshot(spark, root)
    // schema policy (the reference autoMerge/SchemaMode semantics):
    // under `evolve`, NEW source columns widen the table schema in the
    // SAME commit (nullable, appended last; old files null-fill by
    // omission) and MISSING table columns null-fill onto the source
    val aligned = DeltaSchema.align(source, snap, schemaPolicy)
    val src = aligned.source
    val outCols = aligned.schema.fieldNames.toSeq
    val oldCols = snap.schema.fieldNames.toSet
    val typeOf = aligned.schema.fields
      .map(f => f.name -> DeltaLog.stripMeta(f.dataType)).toMap
    // target-side projections of evolved columns read null — the old
    // rows don't have them yet
    def tgt(c: String): Column =
      if (oldCols(c)) col(s"target.$c").as(c)
      else lit(null).cast(typeOf(c)).as(c)
    require(keys.nonEmpty && keys.forall(oldCols.contains),
      s"merge keys $keys must be table columns ${snap.schema.fieldNames.toSeq}")
    requireSourceInScope(src, partitionFilter,
      s"MERGE upsert on (${keys.mkString(", ")})")
    val updOk = updateCondition.map(expr).getOrElse(lit(true))
    val insOk = insertCondition.map(expr).getOrElse(lit(true))
    def audited(df: DataFrame): DataFrame =
      auditCols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

    val plan = (prov: DataFrame) => {
      val pairs = prov.alias("target")
        .join(src.alias("source"), keyCond(keys), "inner")
        .filter(updOk)
        .persist(StorageLevel.MEMORY_AND_DISK)
      requireUniqueMatches(pairs, s"MERGE upsert on (${keys.mkString(", ")})")
      val preimage = pairs.select(outCols.map(tgt): _*)
      val matched = pairs.select(
        outCols.map(tgt) ++
          Seq(col("target._gf_file").as("_gf_file"),
            col("target._gf_ridx").as("_gf_ridx")): _*)
      val updated = audited(
        pairs.select(outCols.map(c => col(s"source.$c").as(c)): _*))
      // the anti-join reads only the KEY columns of the target scan —
      // Catalyst prunes the provenance plan down to them
      val inserted = audited(src.alias("source")
        .join(prov.select(keys.map(col): _*), keys, "left_anti")
        .filter(insOk)
        .select(outCols.map(c => col(s"source.$c").as(c)): _*))
      // faithful Delta MERGE change classification: a replaced row is an
      // UPDATE (preimage/postimage pair), not a delete+insert
      val cdc =
        if (!cdf) None
        else Some(
          preimage.withColumn("_change_type", lit("update_preimage"))
            .unionByName(updated.withColumn("_change_type", lit("update_postimage")))
            .unionByName(inserted.withColumn("_change_type", lit("insert"))))
      DeltaDvWriter.RowPlan(matched, Some(updated.unionByName(inserted)),
        cdc, () => { pairs.unpersist(); () })
    }
    toResult(DeltaDvWriter.rowLevelCommit(spark, root, plan, "MERGE",
      s"upsert on (${keys.mkString(", ")})", checkpointInterval, cdf,
      partitionFilter, txn, aligned.evolution))
  }

  /**
   * delete_match (merge_transformer strategy "delete_match"): DV-delete
   * target rows whose keys match source (and satisfy `deleteCondition`
   * over `target.` / `source.` columns). Pure bitmap commit — no data
   * file is written at all.
   */
  def deleteMatch(spark: SparkSession, root: String, source: DataFrame,
                  keys: Seq[String], deleteCondition: Option[String] = None,
                  cdf: Boolean = true,
                  txn: Option[(String, Long)] = None,
                  checkpointInterval: Int = 10,
                  partitionFilter: Map[String, String] = Map.empty): MergeResult = {
    val outCols = DeltaLog.snapshot(spark, root).schema.fieldNames.toSeq
    val plan = (prov: DataFrame) => {
      val matched = deleteCondition match {
        case None =>
          prov.join(source.select(keys.map(col): _*).distinct(), keys, "left_semi")
        case Some(c) =>
          // a duplicate-keyed source can match one target row repeatedly;
          // no rows append here so only the CDF delete rows would
          // duplicate — dedupe on position
          prov.alias("target").join(source.alias("source"), keyCond(keys), "inner")
            .filter(expr(c))
            .select(outCols.map(cn => col(s"target.$cn").as(cn)) ++
              Seq(col("target._gf_file").as("_gf_file"),
                col("target._gf_ridx").as("_gf_ridx")): _*)
            .dropDuplicates("_gf_file", "_gf_ridx")
      }
      DeltaDvWriter.RowPlan(matched)
    }
    toResult(DeltaDvWriter.rowLevelCommit(spark, root, plan, "MERGE",
      s"delete_match on (${keys.mkString(", ")})", checkpointInterval, cdf,
      partitionFilter, txn))
  }

  /**
   * append_only (merge_transformer "append_once" idempotent bronze
   * append): insert source rows whose keys are absent, never update.
   * The target is only READ on its key columns; the commit is pure adds.
   */
  def appendOnly(spark: SparkSession, root: String, source: DataFrame,
                 keys: Seq[String], cdf: Boolean = true,
                 txn: Option[(String, Long)] = None,
                 checkpointInterval: Int = 10,
                 schemaPolicy: DeltaSchema.Policy = DeltaSchema.Enforce): MergeResult = {
    val snap = DeltaLog.snapshot(spark, root)
    val aligned = DeltaSchema.align(source, snap, schemaPolicy)
    val outCols = aligned.schema.fieldNames.toSeq
    val oldCols = snap.schema.fieldNames.toSeq
    val plan = (prov: DataFrame) => {
      val newRows = aligned.source.join(prov.select(keys.map(col): _*).distinct(),
        keys, "left_anti").select(outCols.map(col): _*)
      // the empty matched frame carries only the PRE-evolution columns
      // (the provenance scan's schema); the commit conforms cdc rows
      DeltaDvWriter.RowPlan(prov.limit(0).select(oldCols.map(col) ++
        Seq(col("_gf_file"), col("_gf_ridx")): _*), Some(newRows))
    }
    toResult(DeltaDvWriter.rowLevelCommit(spark, root, plan, "MERGE",
      s"append_only on (${keys.mkString(", ")})", checkpointInterval, cdf,
      Map.empty, txn, aligned.evolution))
  }

  /**
   * SCD Type-2 apply against a Delta target (reference scd.py:553-736,
   * the "optimized Delta MERGE" path; semantics identical to
   * [[graft.operators.Scd.scd2Apply]]). Only CURRENT rows whose tracked
   * attributes changed are physically touched: the old version is
   * DV-deleted and re-appended closed (`validTo` = ts, is_current
   * false) alongside its new open version; brand-new keys append as
   * current; history rows and unchanged current rows keep their bytes.
   * The is_current filter pushes into the provenance scan, so at scale
   * the join reads the current slice only.
   */
  def scd2Apply(spark: SparkSession, root: String, source: DataFrame,
                keys: Seq[String], trackCols: Seq[String],
                effectiveTs: Column,
                cols: graft.operators.Scd.Scd2Cols = graft.operators.Scd.Scd2Cols(),
                closeDeleted: Boolean = false,
                cdf: Boolean = true,
                txn: Option[(String, Long)] = None,
                checkpointInterval: Int = 10,
                partitionFilter: Map[String, String] = Map.empty,
                schemaPolicy: DeltaSchema.Policy = DeltaSchema.Enforce): MergeResult = {
    val snap = DeltaLog.snapshot(spark, root)
    val bk = Seq(cols.validFrom, cols.validTo, cols.isCurrent)
    require(bk.forall(snap.schema.fieldNames.contains),
      s"target lacks SCD2 bookkeeping columns ${cols}")
    val typeOf = snap.schema.fields
      .map(f => f.name -> DeltaLog.stripMeta(f.dataType)).toMap
    // bookkeeping columns come from the SCD algebra, never the source —
    // pre-fill them so align polices only the ATTRIBUTE columns
    val withBk = bk.filterNot(source.columns.contains)
      .foldLeft(source)((df, c) => df.withColumn(c, lit(null).cast(typeOf(c))))
    val aligned = DeltaSchema.align(withBk, snap, schemaPolicy)
    val src = aligned.source.drop(bk: _*)
    val outCols = aligned.schema.fieldNames.toSeq
    val oldCols = snap.schema.fieldNames.toSet
    val attrCols = outCols.filterNot(bk.contains)
    val newTypeOf = aligned.schema.fields
      .map(f => f.name -> DeltaLog.stripMeta(f.dataType)).toMap
    // target-side projections of evolved columns read null
    def tgt(c: String): Column =
      if (oldCols(c)) col(s"target.$c").as(c)
      else lit(null).cast(newTypeOf(c)).as(c)
    def bare(c: String): Column =
      if (oldCols(c)) col(c) else lit(null).cast(newTypeOf(c)).as(c)
    require(keys.forall(c => src.columns.contains(c) && oldCols(c)),
      s"merge keys $keys must be source and table columns")
    requireSourceInScope(src, partitionFilter,
      s"SCD2 merge on (${keys.mkString(", ")})")
    val ts = effectiveTs.cast("timestamp")

    val plan = (prov: DataFrame) => {
      val current = prov.filter(col(cols.isCurrent))
      val changed = trackCols.map(c => !(col(s"target.$c") <=> col(s"source.$c")))
        .reduceOption(_ || _).getOrElse(lit(false))
      val pairs = current.alias("target")
        .join(src.alias("source"), keyCond(keys), "inner")
        .filter(changed)
        .persist(StorageLevel.MEMORY_AND_DISK)
      requireUniqueMatches(pairs, s"SCD2 merge on (${keys.mkString(", ")})")
      val matchedChanged = pairs.select(
        outCols.map(tgt) ++
          Seq(col("target._gf_file").as("_gf_file"),
            col("target._gf_ridx").as("_gf_ridx")): _*)

      val closedChanged = pairs.select(
        attrCols.map(tgt) ++ Seq(
          col(s"target.${cols.validFrom}").as(cols.validFrom),
          ts.as(cols.validTo), lit(false).as(cols.isCurrent)): _*)
      val openedChanged = pairs.select(
        attrCols.map(c => col(s"source.$c").as(c)) ++ Seq(
          ts.as(cols.validFrom),
          lit(null).cast("timestamp").as(cols.validTo),
          lit(true).as(cols.isCurrent)): _*)
      val openedNew = src.alias("source")
        .join(current.select(keys.map(col): _*), keys, "left_anti")
        .select(attrCols.map(c => col(s"source.$c").as(c)) ++ Seq(
          ts.as(cols.validFrom),
          lit(null).cast("timestamp").as(cols.validTo),
          lit(true).as(cols.isCurrent)): _*)

      def ordered(df: DataFrame) = df.select(outCols.map(col): _*)
      val preChanged = pairs.select(outCols.map(tgt): _*)
      val (matched, append0, pre0, post0) =
        if (!closeDeleted) (matchedChanged,
          closedChanged.unionByName(openedChanged).unionByName(openedNew),
          preChanged, closedChanged)
        else {
          val gone = current.join(src.select(keys.map(col): _*).distinct(),
            keys, "left_anti")
          val closedGone = gone.select(
            attrCols.map(bare) ++ Seq(col(cols.validFrom),
              ts.as(cols.validTo), lit(false).as(cols.isCurrent)): _*)
          (matchedChanged.unionByName(gone.select(outCols.map(bare) ++
            Seq(col("_gf_file"), col("_gf_ridx")): _*)),
            closedChanged.unionByName(openedChanged).unionByName(openedNew)
              .unionByName(closedGone),
            preChanged.unionByName(gone.select(outCols.map(bare): _*)),
            closedChanged.unionByName(closedGone))
        }
      // faithful change classification: the old current row UPDATES to
      // its closed version; the reopened + brand-new versions INSERT
      val cdc =
        if (!cdf) None
        else Some(
          ordered(pre0).withColumn("_change_type", lit("update_preimage"))
            .unionByName(ordered(post0)
              .withColumn("_change_type", lit("update_postimage")))
            .unionByName(ordered(openedChanged.unionByName(openedNew))
              .withColumn("_change_type", lit("insert"))))
      DeltaDvWriter.RowPlan(matched, Some(ordered(append0)), cdc,
        () => { pairs.unpersist(); () })
    }
    toResult(DeltaDvWriter.rowLevelCommit(spark, root, plan, "MERGE",
      s"scd2 on (${keys.mkString(", ")}) tracking (${trackCols.mkString(", ")})",
      checkpointInterval, cdf, partitionFilter, txn, aligned.evolution))
  }
}
