package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/**
 * Incremental / high-water-mark loading (reference: odibi/config.py:2458-2590
 * filter generation odibi/node.py:1019-1112; state backends
 * odibi/state/__init__.py:109-250).
 *
 * Two strategies, matching the reference:
 *  - rolling window: col >= now - lookback (stateless, reprocesses a window);
 *  - stateful HWM: col > hwm - watermark_lag, with `fallbackColumn` COALESCE
 *    and smart first-run (full load when no HWM exists).
 *
 * The predicate is a plain Catalyst filter, so it reaches the source: parquet
 * row-group skipping / Delta data skipping / JDBC pushdown all apply — at
 * 100 TB the HWM filter is what keeps a nightly load from re-reading history.
 */
object Incremental {

  /** Stateful HWM filter (node.py:1033-1041 smart first run = no filter). */
  def hwmFilter(df: DataFrame, hwmCol: String, hwm: Option[String],
                watermarkLagSeconds: Long = 0L,
                fallbackColumn: Option[String] = None): DataFrame =
    hwm match {
      case None => df // first run: full load
      case Some(v) =>
        val c = fallbackColumn
          .map(f => coalesce(col(hwmCol), col(f)))
          .getOrElse(col(hwmCol))
        val bound =
          if (watermarkLagSeconds == 0) lit(v).cast("timestamp")
          else lit(v).cast("timestamp") - expr(s"INTERVAL $watermarkLagSeconds SECONDS")
        df.filter(c > bound)
    }

  /** Rolling-window filter: col >= now - lookback (config.py:2458-2520). */
  def rollingWindowFilter(df: DataFrame, tsCol: String, lookbackSeconds: Long,
                          now: Column = current_timestamp()): DataFrame =
    df.filter(col(tsCol) >= now.cast("timestamp") -
      expr(s"INTERVAL $lookbackSeconds SECONDS"))

  /** Compute the new HWM (max of the column) from a loaded batch. */
  def newHwm(df: DataFrame, hwmCol: String): Option[String] = {
    val row = df.agg(max(col(hwmCol)).cast("string")).collect()(0)
    Option(row.getString(0))
  }

  /**
   * Key -> value state store (reference StateBackend.get_hwm/set_hwm).
   * Local JSON-file impl mirrors LocalJSONStateBackend
   * (state/__init__.py:153); on a cluster the same trait is backed by a
   * Delta `meta_state` table MERGE (state/__init__.py:502).
   */
  trait StateBackend {
    def get(key: String): Option[String]
    def set(key: String, value: String): Unit
  }

  final class JsonFileState(path: String) extends StateBackend {
    // jackson (on the Spark classpath) for real escaping; writes go through
    // a temp file + atomic move so a crash never leaves a torn state file,
    // and set() is synchronized against same-JVM read-modify-write races.
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private def load(): Map[String, String] = {
      val p = Paths.get(path)
      if (!Files.exists(p)) Map.empty
      else {
        val root = mapper.readTree(Files.readAllBytes(p))
        root.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }
    }
    override def get(key: String): Option[String] = synchronized { load().get(key) }
    override def set(key: String, value: String): Unit = synchronized {
      val node = mapper.createObjectNode()
      (load() + (key -> value)).foreach { case (k, v) => node.put(k, v) }
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      Files.write(tmp, mapper.writeValueAsBytes(node),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Parquet-table state backend (cluster-portable without Delta). */
  final class ParquetTableState(spark: SparkSession, path: String) extends StateBackend {
    import spark.implicits._
    private def load(): Map[String, String] =
      try spark.read.parquet(path).as[(String, String)].collect().toMap
      catch { case _: Throwable => Map.empty }
    override def get(key: String): Option[String] = load().get(key)
    override def set(key: String, value: String): Unit = {
      val all = load() + (key -> value)
      all.toSeq.toDF("key", "value").coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
  }
}
