package graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Throwaway optimization-round probe: plan-time cost of spark.read over
  * explicit file paths (Spark re-stats and permission-loads every file)
  * vs a FileIndex built from metadata-known statuses. Not on the board. */
object IndexProbe {
  final class KnownFilesIndex(files: Seq[FileStatus]) extends FileIndex {
    override def rootPaths: Seq[Path] = files.map(_.getPath)
    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, files.toArray))
    override def inputFiles: Array[String] = files.map(_.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.getLen).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("iceberg")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (mode == "delta") {
      // repeat-read cost of the CURRENT DeltaLog.read scan path on a
      // small (4-file, partitioned) table — the board fixtures' shape
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      orders.limit(1).count()
      val droot = java.nio.file.Files.createTempDirectory("probe_dl").toString + "/t"
      graft.sources.DeltaWriter.write(orders.coalesce(2), droot,
        partitionBy = Seq("o_orderstatus"))
      def readOnce(): Long = graft.sources.DeltaLog.read(s, droot)
        .agg(count(lit(1))).collect()(0).getLong(0)
      println(s"delta warm rows=${readOnce()}")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val a = (1 to 20).map(_ => readOnce()).last
        println(f"rep $i: 20x DeltaLog.read ${(System.nanoTime() - t0) / 1e9}%.2f s (rows $a)")
      }
      s.stop(); return
    }
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity",
        "l_extendedprice")
    li.limit(1).count()
    val root = java.nio.file.Files.createTempDirectory("probe_ix").toString + "/t"
    graft.sources.IcebergSource.write(li, root,
      partitionBy = Seq("month(l_shipdate)"), clusterWrite = true)
    val conf = s.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val paths = graft.core.DriverPar.listFilesNoPerm(fs, new Path(root, "data"))
      .filter(_.getPath.getName.endsWith(".parquet"))
    println(s"files: ${paths.size}")
    val schema = li.schema
    def viaRead(): Long =
      s.read.schema(schema).parquet(paths.map(_.getPath.toString): _*)
        .agg(count(lit(1))).collect()(0).getLong(0)
    def viaIndex(): Long = {
      // statuses fabricated purely from (path, size, mtime) — what the
      // table metadata knows without any filesystem round-trip
      val sts = paths.map(p =>
        new FileStatus(p.getLen, false, 1, 128L << 20, p.getModificationTime,
          p.getPath))
      val rel = HadoopFsRelation(new KnownFilesIndex(sts), StructType(Nil),
        schema, None, new ParquetFileFormat, Map.empty[String, String])(s)
      s.baseRelationToDataFrame(rel).agg(count(lit(1))).collect()(0).getLong(0)
    }
    println(s"read=${viaRead()} index=${viaIndex()} (warmup)")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); val a = (1 to 10).map(_ => viaRead()).last
      val t1 = System.nanoTime(); val b = (1 to 10).map(_ => viaIndex()).last
      val t2 = System.nanoTime()
      println(f"rep $i: 10x viaRead ${(t1 - t0) / 1e9}%.2f s  " +
        f"10x viaIndex ${(t2 - t1) / 1e9}%.2f s  (rows $a / $b)")
    }
    s.stop()
  }
}
