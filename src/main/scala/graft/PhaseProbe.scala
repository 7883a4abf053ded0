package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway optimization-round probe: per-phase wall times of the heavy
  * lakehouse fixture queries. Not part of the board. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("iceberg_delete")
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
    s.read.parquet(s"$d/lineitem.parquet").limit(1).count()
    def t(name: String): org.apache.spark.sql.DataFrame =
      s.read.parquet(s"$d/$name.parquet")
    var last = System.nanoTime()
    def mark(label: String): Unit = {
      val now = System.nanoTime()
      println(f"  phase ${(now - last) / 1e6}%8.1f ms  $label")
      last = now
    }
    (1 to 2).foreach { rep =>
      println(s"=== $which rep $rep ===")
      last = System.nanoTime()
      which match {
        case "iceberg_delete" =>
          val orders = t("orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          val root = java.nio.file.Files.createTempDirectory("probe_ice_del")
            .toString + "/orders"
          mark("setup")
          graft.sources.IcebergSource.write(orders.repartition(2), root,
            partitionBy = Seq("o_orderstatus"))
          mark("write")
          val v0 = graft.sources.IcebergSource.snapshots(s, root).head.snapshotId
          mark("snapshots")
          val r1 = graft.sources.IcebergSource.delete(s, root,
            "o_totalprice > 180000")
          mark("delete1")
          val r2 = graft.sources.IcebergSource.delete(s, root,
            "o_orderstatus = 'F' AND o_orderkey % 7 = 0")
          mark("delete2")
          val opt = graft.sources.IcebergMaintenance.optimize(s, root)
          mark("optimize")
          val live = graft.sources.IcebergSource.read(s, root)
            .withColumn("state", lit("live"))
          val initial = graft.sources.IcebergSource.read(s, root,
              snapshotId = Some(v0))
            .withColumn("state", lit("initial"))
          mark("read-plan")
          val n = live.unionByName(initial)
            .groupBy("state", "o_orderstatus")
            .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"),
              min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
            .count()
          mark(s"count rows=$n")
        case "delta_dv_delete" =>
          val orders = t("orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          val root = java.nio.file.Files.createTempDirectory("probe_delta_dv")
            .toString + "/orders"
          mark("setup")
          graft.sources.DeltaWriter.write(orders.coalesce(2), root,
            partitionBy = Seq("o_orderstatus"))
          mark("write")
          val r1 = graft.sources.DeltaDvWriter.delete(s, root,
            "o_totalprice > 180000")
          mark("delete1")
          val r2 = graft.sources.DeltaDvWriter.delete(s, root,
            "o_orderstatus = 'F' AND o_orderkey % 7 = 0")
          mark("delete2")
          val live = graft.sources.DeltaLog.read(s, root)
            .withColumn("change_type", lit("live"))
            .select("change_type", "o_orderkey", "o_orderstatus", "o_totalprice")
          val dels = graft.sources.DeltaLog.changes(s, root, 1L)
            .filter(col("_change_type") === "delete")
            .withColumn("change_type",
              concat(lit("del_v"), col("_commit_version").cast("int")))
            .select("change_type", "o_orderkey", "o_orderstatus", "o_totalprice")
          mark("read-plan")
          val n = live.unionByName(dels)
            .groupBy("change_type", "o_orderstatus")
            .agg(count(lit(1)).as("n"))
            .count()
          mark(s"count rows=$n")
        case "iceberg_hidden" =>
          val li = t("lineitem")
            .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity",
              "l_extendedprice")
          val root = java.nio.file.Files.createTempDirectory("probe_ice_hidden")
            .toString + "/lineitem"
          mark("setup")
          graft.sources.IcebergSource.write(li, root,
            partitionBy = Seq("month(l_shipdate)"), clusterWrite = true)
          mark("write")
          val meta = graft.sources.IcebergSource.tableMeta(s, root)
          mark("tableMeta")
          val where = "l_shipdate >= DATE'1995-01-01' AND l_shipdate < DATE'1996-01-01'"
          val derived = graft.sources.IcebergSource.derivedPartitionPredicates(
            s, root, expr(where))
          mark("derived")
          val n = graft.sources.Sources.read(s, graft.sources.Sources.ReadConfig(
              "iceberg", path = Some(root), options = Map("filter" -> where)))
            .groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"))
            .count()
          mark(s"count rows=$n")
        case "iceberg_optimize" =>
          val tmp = java.nio.file.Files.createTempDirectory("probe_ice_o").toString
          val root = s"$tmp/orders"
          val orders = t("orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          mark("setup")
          (0 until 3).foreach { i =>
            graft.sources.IcebergSource.write(
              orders.filter(col("o_orderkey") % 3 === i).coalesce(4), root, "append",
              partitionBy = Seq("o_orderstatus"))
            mark(s"write$i")
          }
          val res = graft.sources.IcebergMaintenance.optimize(s, root)
          mark("optimize")
          val gone = graft.sources.IcebergMaintenance.cleanupMetadata(s, root,
            keepLast = 2)
          mark("cleanupMetadata")
          val all = graft.sources.IcebergSource.read(s, root)
          val pruned = graft.sources.IcebergSource.read(s, root, partitionFilter =
            Seq(graft.sources.IcebergSource.PartitionPredicate("o_orderstatus", "=", "O")))
          require(pruned.inputFiles.length < all.inputFiles.length)
          mark("inputFiles-guard")
          val n = all.groupBy("o_orderstatus").agg(count(lit(1))).count()
          mark(s"count rows=$n")
        case "delta_restore" =>
          val c = t("customer")
          val root = java.nio.file.Files.createTempDirectory("probe_restore")
            .toString + "/customer"
          mark("setup")
          graft.sources.DeltaWriter.write(c.coalesce(2), root)
          mark("write")
          val del = graft.sources.DeltaDvWriter.delete(s, root,
            "c_custkey % 5 = 0", cdf = false)
          mark("dv-delete")
          graft.sources.DeltaMerge.upsert(s, root,
            c.filter("c_custkey % 3 = 0").withColumn("c_extra", lit(1L)),
            Seq("c_custkey"), cdf = false,
            schemaPolicy = graft.sources.DeltaSchema.Evolve)
          mark("merge")
          val res = graft.sources.DeltaMaintenance.restore(s, root, 0L)
          mark("restore")
          val n = graft.sources.DeltaLog.read(s, root).count()
          mark(s"count rows=$n")
        case other => sys.error(s"unknown probe: $other")
      }
    }
    s.stop()
  }
}
