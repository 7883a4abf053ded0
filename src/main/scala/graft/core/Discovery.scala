package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dataset discovery + column profiling (reference: odibi/discovery/ —
 * DatasetRef / Column models in types.py, partition + format inference in
 * utils.py; profiling fields null_count/null_pct/cardinality/
 * distinct_count/sample_values/detected_pattern).
 *
 * Scale stance: `profile` is ONE aggregation pass over the frame — every
 * per-column statistic (non-null count, distinct, min, max) is an
 * aggregate in a single `agg(...)`, so the input is scanned once no
 * matter how many columns are profiled. Distinct counts default to
 * HyperLogLog (`approx_count_distinct`) — the only formulation that holds
 * at 100 TB; `exactDistinct = true` swaps in exact `count(DISTINCT)` for
 * oracle-grade comparisons at test scale.
 */
object Discovery {

  /**
   * Per-column profile: one output row per profiled column with
   * null_count, null_pct, distinct_count, min/max (value-typed min/max
   * cast to string for a uniform schema), and a cardinality class:
   * unique (distinct == non-null), high (> 90% of non-null), low (< 10%),
   * else medium — the reference's Column.cardinality buckets.
   */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exactDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val perCol = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        lit(dtypes(c)).as("dtype"),
        (col("__total") - col(s"__nn_$c")).as("null_count"),
        col(s"__nn_$c").as("non_null_count"),
        col(s"__d_$c").cast("long").as("distinct_count"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }: _*)
    row.select(explode(perCol).as("p")).select(col("p.*"))
      .withColumn("null_pct",
        round(col("null_count") / greatest(col("null_count") + col("non_null_count"), lit(1L)), 6))
      .withColumn("cardinality",
        when(col("non_null_count") === 0, lit("empty"))
          .when(col("distinct_count") >= col("non_null_count"), lit("unique"))
          .when(col("distinct_count") > col("non_null_count") * 0.9, lit("high"))
          .when(col("distinct_count") < col("non_null_count") * 0.1, lit("low"))
          .otherwise(lit("medium")))
      .drop("non_null_count")
  }

  /**
   * Numeric distribution profile: mean, stddev, and exact interpolated
   * percentiles per numeric column — still ONE aggregation pass (every
   * statistic is an aggregate in a single `agg`). Exact `percentile` is
   * sort-based per column; for 100 TB profiling swap `approx = true`
   * (percentile_approx sketches, mergeable, bounded memory).
   */
  def numericProfile(df: DataFrame, columns: Seq[String] = Nil,
                     percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
                     approx: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val cols = (if (columns.nonEmpty) columns else df.columns.toSeq)
      .filter(c => df.schema(c).dataType.isInstanceOf[NumericType])
    require(cols.nonEmpty, "no numeric columns to profile")
    val pctArray = percentiles.mkString("array(", ", ", ")")
    val fn = if (approx) "percentile_approx" else "percentile"
    val aggs = cols.flatMap { c =>
      Seq(
        avg(col(c)).as(s"__avg_$c"),
        stddev_samp(col(c)).as(s"__sd_$c"),
        expr(s"$fn(`$c`, $pctArray)").as(s"__p_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = array(cols.map { c =>
      struct(
        (lit(c).as("column") +:
          round(col(s"__avg_$c"), 6).as("mean") +:
          round(col(s"__sd_$c"), 6).as("stddev") +:
          percentiles.zipWithIndex.map { case (p, i) =>
            // label keeps fractional precision: 0.999 -> p99_9 (a plain
            // toInt would collide 0.99 with 0.999)
            val pct = BigDecimal(p * 100)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .underlying.stripTrailingZeros
              .toPlainString.replace(".", "_")
            round(element_at(col(s"__p_$c"), i + 1), 6).as(s"p$pct")
          }): _*)
    }: _*)
    row.select(explode(perCol).as("p")).select(col("p.*"))
  }

  private val patterns: Seq[(String, scala.util.matching.Regex)] = Seq(
    "date:YYYY-MM-DD" -> "^\\d{4}-\\d{2}-\\d{2}$".r,
    "timestamp:ISO" -> "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}(:\\d{2})?(\\.\\d+)?$".r,
    "uuid" -> "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r,
    "email" -> "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$".r,
    "url" -> "^[a-z][a-z0-9+.-]*://\\S+$".r,
    "ipv4" -> "^(\\d{1,3}\\.){3}\\d{1,3}$".r,
    "integer" -> "^-?\\d+$".r,
    "decimal" -> "^-?\\d+\\.\\d+$".r)

  /**
   * Value-pattern detection over a BOUNDED sample (reference
   * Column.detected_pattern): takes `sampleN` rows once, then classifies
   * each string column driver-side — a pattern wins when every non-null
   * sampled value matches. Returns column -> pattern.
   */
  def detectedPatterns(df: DataFrame, columns: Seq[String] = Nil,
                       sampleN: Int = 100): Map[String, String] = {
    val strCols = (if (columns.nonEmpty) columns else df.columns.toSeq)
      .filter(c => df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    if (strCols.isEmpty) return Map.empty
    val rows = df.select(strCols.map(col): _*).limit(sampleN).collect()
    strCols.zipWithIndex.flatMap { case (c, i) =>
      val vals = rows.map(_.get(i)).collect { case s: String => s }
      if (vals.isEmpty) None
      else patterns.collectFirst {
        case (name, re) if vals.forall(v => re.findFirstIn(v).isDefined) => c -> name
      }
    }.toMap
  }

  /**
   * List datasets under a filesystem root (reference DatasetRef +
   * utils.infer_format_from_path): one row per child — directories count
   * as folder datasets with their format inferred from contained data
   * files; plain data files list individually. Driver-side FS metadata
   * only — nothing reads data.
   */
  def listDatasets(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val hadoopPath = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def formatOf(name: String): Option[String] = {
      val lower = name.toLowerCase
      Seq("parquet", "csv", "json", "orc", "avro").find(f => lower.endsWith(s".$f"))
        .orElse(if (lower.endsWith(".xlsx")) Some("excel") else None)
    }
    val children =
      if (!fs.exists(hadoopPath)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(hadoopPath)
    children.toSeq.map { st =>
      val name = st.getPath.getName
      if (st.isDirectory) {
        val files = fs.listStatus(st.getPath).filterNot(_.getPath.getName.startsWith("_"))
        val fmt = files.flatMap(f => formatOf(f.getPath.getName)).headOption
        (name, "folder", fmt.getOrElse(""), files.map(_.getLen).sum,
          new java.sql.Timestamp(st.getModificationTime), st.getPath.toString)
      } else
        (name, "file", formatOf(name).getOrElse(""), st.getLen,
          new java.sql.Timestamp(st.getModificationTime), st.getPath.toString)
    }.toDF("name", "kind", "format", "size_bytes", "modified_at", "path")
  }

  /**
   * Hive-style partition detection from file paths (reference
   * utils.detect_partitions): collects `key=value` path segments into
   * partition columns with their observed value counts.
   */
  def detectPartitions(spark: SparkSession, root: String,
                       maxFiles: Int = 10000): Map[String, Seq[String]] = {
    val hadoopPath = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hadoopPath)) return Map.empty
    val seen = scala.collection.mutable.Map.empty[String, scala.collection.mutable.LinkedHashSet[String]]
    DriverPar.listFilesNoPerm(fs, hadoopPath, maxFiles = maxFiles).foreach { f =>
      f.getPath.toString.split("/").foreach { seg =>
        val eq = seg.indexOf('=')
        if (eq > 0 && eq < seg.length - 1 && !seg.startsWith("_")) {
          val (k, v) = (seg.substring(0, eq), seg.substring(eq + 1))
          seen.getOrElseUpdate(k, scala.collection.mutable.LinkedHashSet.empty) += v
        }
      }
    }
    seen.map { case (k, vs) => k -> vs.toSeq }.toMap
  }

  /**
   * Per-FILE parquet statistics straight from the footers — row counts,
   * sizes, row groups, and min/max for the requested columns — the
   * data-skipping audit: after a Z-order or sort-based layout, tight
   * non-overlapping per-file ranges are WHY scans prune, and this is the
   * direct measurement ("is my clustering actually working?").
   *
   * Footer reads are distributed one task per file (a footer is a few KB
   * regardless of file size — no data pages are touched). Min/max render
   * as strings; numeric ordering is preserved within each file by the
   * footer itself (min of row-group mins, max of maxes).
   */
  def parquetFileStats(spark: SparkSession, root: String,
                       columns: Seq[String] = Nil): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    require(fs.exists(rootPath), s"no parquet files under $root")
    val files = DriverPar.listFilesNoPerm(fs, rootPath).collect {
      case f if f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".") => f.getPath.toString
    }
    require(files.nonEmpty, s"no parquet files under $root")
    // Configuration is not serializable: ship the entries, rebuild per task
    val entries = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val cit = conf.iterator()
      while (cit.hasNext) { val e = cit.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }
    val cols = columns.toArray
    val rows = spark.sparkContext.parallelize(files.toSeq, files.size).map { file =>
      val c = new org.apache.hadoop.conf.Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), c)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val footer = r.getFooter
        val blocks = footer.getBlocks
        import scala.jdk.CollectionConverters._
        val perCol = cols.map { name =>
          var lo: Comparable[Any] = null
          var hi: Comparable[Any] = null
          var loS: String = null
          var hiS: String = null
          blocks.asScala.foreach { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == name).foreach { cc =>
              val st = cc.getStatistics
              if (st != null && !st.isEmpty) {
                def render(v: Any): (Comparable[Any], String) = v match {
                  case bin: org.apache.parquet.io.api.Binary =>
                    val str = bin.toStringUsingUTF8
                    (str.asInstanceOf[Comparable[Any]], str)
                  case other =>
                    (other.asInstanceOf[Comparable[Any]], String.valueOf(other))
                }
                val (mn, mnS) = render(st.genericGetMin)
                val (mx, mxS) = render(st.genericGetMax)
                if (lo == null || mn.compareTo(lo) < 0) { lo = mn; loS = mnS }
                if (hi == null || mx.compareTo(hi) > 0) { hi = mx; hiS = mxS }
              }
            }
          }
          (loS, hiS)
        }
        (file, r.getRecordCount, blocks.size(),
          blocks.asScala.map(_.getCompressedSize).sum,
          perCol.map(_._1).toSeq, perCol.map(_._2).toSeq)
      } finally r.close()
    }
    import spark.implicits._
    var df = rows.toDF("file", "rows", "row_groups", "compressed_bytes", "_mins", "_maxes")
    cols.zipWithIndex.foreach { case (name, i) =>
      df = df.withColumn(s"min_$name", col("_mins").getItem(i))
             .withColumn(s"max_$name", col("_maxes").getItem(i))
    }
    df.drop("_mins", "_maxes")
  }

  /**
   * Fraction of file PAIRS whose [min, max] ranges overlap on `column`
   * (numeric compare when both ends parse as doubles, else lexicographic)
   * — 0.0 is a perfectly clustered layout (every file prunable by a
   * point predicate), 1.0 means every file overlaps every other (no
   * skipping possible). Driver-side over the collected ranges: an audit
   * over file COUNTS, which stay bounded (capped at 10k files).
   */
  def rangeOverlap(stats: DataFrame, column: String): Double = {
    val rows = stats.select(col(s"min_$column"), col(s"max_$column"))
      .na.drop().limit(10000).collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (rows.length < 2) return 0.0
    val numeric = rows.forall { case (a, b) =>
      scala.util.Try(a.toDouble).isSuccess && scala.util.Try(b.toDouble).isSuccess
    }
    def le(a: String, b: String): Boolean =
      if (numeric) a.toDouble <= b.toDouble else a <= b
    var overlapping = 0L
    var pairs = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val ((lo1, hi1), (lo2, hi2)) = (rows(i), rows(j))
        if (le(lo1, hi2) && le(lo2, hi1)) overlapping += 1
        pairs += 1
        j += 1
      }
      i += 1
    }
    overlapping.toDouble / pairs
  }
}
