package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Cross-workspace catalog replication (reference: odibi/catalog_sync.py
 * CatalogSyncer:736-1000 — sync the `meta_*` system tables from a source
 * catalog to a secondary destination for dashboards / cross-region
 * reads; the Delta→Delta branch `_sync_to_delta`:930-1000 is the shape
 * rebuilt here over the parquet catalog, with the same incremental
 * filter on the time column and per-table last-sync state kept in the
 * TARGET; SQL Server targets go through the SqlServerWriter API
 * instead). Per-table failures are data in the result, never aborts —
 * the reference warns-and-continues the same way.
 *
 * Scale note: meta tables are driver-bounded (one small append per
 * run), so the coalesce(1) appends and max(recorded_at) scalar reads
 * here stay trivial at any corpus size — catalog volume grows with RUN
 * COUNT, not data size.
 */
object CatalogSync {

  /** The reference's DEFAULT_SYNC_TABLES, mapped to this catalog's family. */
  val DefaultTables: Seq[String] = Seq(
    "meta_runs", "meta_outputs", "meta_metrics", "meta_failures",
    "meta_lineage", "meta_column_lineage", "meta_schemas",
    "meta_pipelines", "meta_nodes")

  final case class TableResult(table: String, rows: Long, mode: String,
                               error: Option[String] = None) {
    def success: Boolean = error.isEmpty
  }

  private def stateKey(table: String) = s"catalog_sync.$table"

  /**
   * Sync `tables` from the catalog at `sourceRoot` into `targetRoot`.
   *
   * `incremental` (default): append only source rows with `recorded_at`
   * strictly after the per-table watermark stored in the target's
   * `meta_state`, then advance the watermark — the reference's
   * `_apply_incremental_filter` + `_update_sync_state` contract,
   * including its strictly-greater edge (rows landing at exactly the
   * watermark instant after a sync wait for... nothing; they are lost —
   * run a `full` sync to reconcile, as the reference doc advises).
   * `full`: atomic overwrite of the target table with the source.
   */
  def sync(spark: SparkSession, sourceRoot: String, targetRoot: String,
           tables: Seq[String] = DefaultTables,
           mode: String = "incremental"): Seq[TableResult] = {
    require(Set("incremental", "full")(mode), s"mode must be incremental|full, got $mode")
    val source = new Catalog(spark, sourceRoot)
    val target = new Catalog(spark, targetRoot)
    val state = target.state
    val fs = new org.apache.hadoop.fs.Path(sourceRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    tables.map { t =>
      try {
        // a fresh catalog has only the tables its runs produced; absence
        // is a skip (rows 0, mode "absent"), never a failure
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$sourceRoot/$t")))
          TableResult(t, 0, "absent")
        else syncTable(spark, source, state, t, targetRoot, mode)
      } catch {
        case e: Exception =>
          TableResult(t, 0, mode,
            Some(Option(e.getMessage).getOrElse(e.toString)))
      }
    }
  }

  private def syncTable(spark: SparkSession, source: Catalog,
                        state: graft.operators.Incremental.StateBackend,
                        t: String, targetRoot: String,
                        mode: String): TableResult = {
    val src = source.table(t)
    require(src.columns.contains("recorded_at"),
      s"$t has no recorded_at column — not a syncable meta table")
    mode match {
      case "full" =>
        val n = src.count()
        AtomicParquet.overwrite(src.coalesce(1), s"$targetRoot/$t", s"sync-$t")
        state.set(stateKey(t), maxRecordedAt(spark, src).getOrElse(""))
        TableResult(t, n, mode)
      case _ =>
        val since = state.get(stateKey(t)).filter(_.nonEmpty)
        val fresh = since match {
          case Some(ts) => src.filter(col("recorded_at") > lit(ts).cast("timestamp"))
          case None => src
        }
        val n = fresh.count()
        if (n > 0) {
          fresh.coalesce(1).write.mode("append").parquet(s"$targetRoot/$t")
          maxRecordedAt(spark, fresh).foreach(m => state.set(stateKey(t), m))
        }
        TableResult(t, n, mode)
    }
  }

  /** Max recorded_at as an ISO timestamp string (micros preserved). */
  private def maxRecordedAt(spark: SparkSession,
                            df: org.apache.spark.sql.DataFrame): Option[String] = {
    import spark.implicits._
    df.agg(date_format(max(col("recorded_at")), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[Option[String]].collect().headOption.flatten
  }
}
