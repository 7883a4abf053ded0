package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned parquet table — the time-travel SEMANTICS of the reference's
 * Delta reads (`versionAsOf` / `timestampAsOf`, odibi/config.py:1355-1390)
 * without Delta jars (env-blocked here; on a Delta cluster this module is
 * superseded by the real thing).
 *
 * Layout: `root/v=N/` holds snapshot N's parquet; `root/_manifest/N.json`
 * is the commit record (version, commit millis). A version is visible only
 * after its manifest file exists, and manifest files are written via
 * temp + atomic rename AFTER the data lands — a crashed write leaves an
 * invisible orphan dir, never a torn table. Readers list the tiny manifest
 * dir (metadata-only), then read exactly one snapshot dir.
 */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed versions, ascending (empty when the table doesn't exist). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/_manifest")
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted.toSeq
  }

  private def commitTime(spark: SparkSession, root: String, v: Long): Long = {
    val f = fs(spark, root)
    val bytes = new Array[Byte](256)
    val in = f.open(new Path(s"$root/_manifest/$v.json"))
    val n = try in.read(bytes) finally in.close()
    val txt = new String(bytes, 0, math.max(n, 0), "UTF-8")
    "\"commit_ms\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(0L)
  }

  /** Write the next snapshot; returns its version number. */
  def write(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val next = versions(spark, root).lastOption.map(_ + 1).getOrElse(0L)
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    // manifest AFTER data: temp + rename makes the version visible atomically
    val manifestDir = new Path(s"$root/_manifest")
    f.mkdirs(manifestDir)
    val tmp = new Path(s"$root/_manifest/.$next.json.tmp")
    val out = f.create(tmp, true)
    try out.write(
      s"""{"version": $next, "commit_ms": ${System.currentTimeMillis()}}"""
        .getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(s"$root/_manifest/$next.json")))
      throw new java.io.IOException(s"commit rename failed for version $next")
    next
  }

  /** Read latest, a specific `versionAsOf`, or the latest committed at or
    * before `timestampAsOfMs` (reference Delta read options). */
  def read(spark: SparkSession, root: String,
           versionAsOf: Option[Long] = None,
           timestampAsOfMs: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"versioned table $root does not exist")
    val v = (versionAsOf, timestampAsOfMs) match {
      case (Some(x), _) =>
        require(vs.contains(x), s"version $x not in ${vs.mkString(",")}")
        x
      case (None, Some(ts)) =>
        val eligible = vs.filter(commitTime(spark, root, _) <= ts)
        require(eligible.nonEmpty, s"no version committed at or before $ts")
        eligible.last
      case _ => vs.last
    }
    spark.read.parquet(s"$root/v=$v")
  }

  /** Previous-vs-current key diff — the input `detect_deletes` snapshot_diff
    * wants from Delta time travel (delete_detection.py:84-170). */
  def snapshotDiff(spark: SparkSession, root: String,
                   keys: Seq[String]): DataFrame = {
    val vs = versions(spark, root)
    require(vs.size >= 2, s"snapshotDiff needs >= 2 versions, have ${vs.size}")
    val prev = read(spark, root, versionAsOf = Some(vs(vs.size - 2)))
      .select(keys.head, keys.tail: _*)
    val cur = read(spark, root, versionAsOf = Some(vs.last))
      .select(keys.head, keys.tail: _*)
    prev.exceptAll(cur) // keys present before, gone now = deleted
  }
}
