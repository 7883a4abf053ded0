package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/**
 * Parquet scan over files whose (path, size) the TABLE METADATA already
 * records. `spark.read.parquet(paths: _*)` re-examines every path at
 * plan time — a glob check plus a `getFileStatus`, then a
 * `LocatedFileStatus` wrap that materializes ownership/permissions
 * (~3-6 ms per file on a local filesystem without native Hadoop IO; one
 * object-store round-trip per file at scale) — to learn lengths the
 * Delta log / Iceberg manifests already state exactly. Production
 * table-format readers plan from the manifest stats and never re-stat
 * data files; this is that scan path: a [[FileIndex]] is built directly
 * from the known statuses and handed to the same parquet
 * `HadoopFsRelation` a `spark.read` resolves to, so pushdown, column
 * pruning, `_metadata` columns and `input_file_name()` behave
 * identically (measured: 10 scans of an 83-file table 3.8 s -> 1.4 s).
 *
 * `size` MUST be the file's exact byte length — split arithmetic and
 * footer location depend on it; both formats' writers record it from
 * the staged files' own statuses and both specs require it. Any
 * non-positive size falls back to the `spark.read` path for the whole
 * scan (exact previous behavior, including its error on a vanished
 * file). `mtime` feeds only `_metadata.file_modification_time` (no graft
 * operator reads it): Delta passes the log's `modificationTime`, Iceberg
 * the adding snapshot's commit timestamp (the filesystem mtime is not
 * table state there).
 */
private[sources] object MetaScan {
  final case class KnownFile(path: String, size: Long, mtime: Long = 0L)

  private final class KnownFilesIndex(spark: SparkSession,
                                      files: Array[FileStatus])
      extends FileIndex {
    override def rootPaths: Seq[Path] = files.map(_.getPath).toSeq
    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, files))
    override def inputFiles: Array[String] = files.map(_.getPath.toString)
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.getLen).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  def parquetScan(spark: SparkSession, schema: StructType,
                  files: Seq[KnownFile]): DataFrame = {
    if (files.isEmpty || files.exists(_.size <= 0L))
      return spark.read.schema(schema).parquet(files.map(_.path): _*)
    // qualify against the files' filesystem so input_file_name() renders
    // the same scheme-carrying form a listed scan produces
    val fs = new Path(files.head.path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = files.map { f =>
      new FileStatus(f.size, false, 1, 128L << 20, f.mtime,
        fs.makeQualified(new Path(f.path)))
    }.toArray
    scanOf(spark, schema, statuses)
  }

  /**
   * Like [[parquetScan]] but sizes come from one cheap `getFileStatus`
   * per file (parallel, permissions left lazy — ~50 µs vs the ~3-6 ms a
   * `LocatedFileStatus` permission load costs) instead of the metadata.
   * The Delta read paths use this: unlike Iceberg's spec-required
   * `file_size_in_bytes`, this codebase deliberately tolerates
   * loosely-written foreign _delta_log entries (wrong/placeholder `size`
   * fields — the time-travel board fixture commits `size: 1`), and a
   * trusted wrong length silently truncates the scan to zero row groups.
   * A vanished file fails here exactly like the listing used to.
   */
  def parquetScanStat(spark: SparkSession, schema: StructType,
                      paths: Seq[String]): DataFrame = {
    if (paths.isEmpty)
      return spark.read.schema(schema).parquet()
    val fs = new Path(paths.head)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = graft.core.DriverPar.map(paths)(p =>
      fs.getFileStatus(new Path(p))).toArray
    scanOf(spark, schema, statuses)
  }

  /** What `DataSource.resolveRelation` does to a user-specified schema:
    * force everything nullable. Without it a file missing a (nested)
    * alias field fails the vectorized reader's required-column check
    * instead of reading null — `spark.read.schema(...)` never surfaced
    * declared non-nullability either. */
  private def nullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = nullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = nullable(m.keyType),
        valueType = nullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def scanOf(spark: SparkSession, schema: StructType,
                     statuses: Array[FileStatus]): DataFrame = {
    val rel = HadoopFsRelation(new KnownFilesIndex(spark, statuses),
      StructType(Nil), nullable(schema).asInstanceOf[StructType], None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
