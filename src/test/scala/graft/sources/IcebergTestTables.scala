package graft.sources

import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Hand-builds a spec-conformant format-version-2 Iceberg table with a
 * TRANSFORM partition spec — `day(ts)` + `bucket[4](id)` — the shape the
 * repo's own writer (identity specs only) cannot produce, so maintenance
 * over transform-partitioned tables can be exercised against a real
 * on-disk layout. Lives in the test tree inside `graft.sources` to reach
 * the package-private avro/metadata helpers.
 */
object IcebergTestTables {

  import IcebergSource._

  /** schema: id int, ts date, payload string; partition tuple
    * (ts_day = epochDay int, id_bucket = murmur3 bucket int). Splits each
    * partition's rows across `filesPerPartition` small parquet files so
    * bin-pack maintenance has real work. */
  def writeDayBucketTable(spark: SparkSession, root: String,
                          rows: Seq[(Int, java.sql.Date, String)],
                          buckets: Int = 4,
                          filesPerPartition: Int = 3): Unit = {
    import spark.implicits._
    val f = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val conf = spark.sessionState.newHadoopConf()
    val commitUuid = java.util.UUID.randomUUID().toString
    val partFields = Seq(StructField("ts_day", IntegerType),
      StructField("id_bucket", IntegerType))
    val entrySchema = entrySchemaFor(partFields)
    val partSchema = entrySchema.getField("data_file").schema()
      .getField("partition").schema()

    def tupleOf(r: (Int, java.sql.Date, String)): (Int, Int) =
      (r._2.toLocalDate.toEpochDay.toInt, bucketOf(r._1, buckets))

    // one or more small parquet files per partition tuple
    val byTuple = rows.groupBy(tupleOf)
    var fileNo = 0
    val fileEntries = byTuple.toSeq.sortBy(_._1).flatMap { case ((day, bkt), rs) =>
      val chunks = rs.grouped(math.max(1, math.ceil(
        rs.size.toDouble / filesPerPartition).toInt)).toSeq
      chunks.map { chunk =>
        fileNo += 1
        val stage = new Path(root, s".stage_$fileNo")
        chunk.toDF("id", "ts", "payload").coalesce(1)
          .write.mode("errorifexists").parquet(stage.toString)
        val part = f.listStatus(stage).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        val dest = new Path(root, f"data/$commitUuid/f$fileNo%03d.parquet")
        f.mkdirs(dest.getParent)
        require(f.rename(part, dest), s"stage move failed for $dest")
        f.delete(stage, true)
        (dest, day, bkt, chunk.size.toLong, f.getFileStatus(dest).getLen)
      }
    }

    val snapshotId = System.currentTimeMillis()
    val entries: Seq[GenericRecord] = fileEntries.map {
      case (path, day, bkt, n, size) =>
        val dataFile = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        dataFile.put("content", 0)
        dataFile.put("file_path", path.toString)
        dataFile.put("file_format", "PARQUET")
        val pr = new GenericData.Record(partSchema)
        pr.put(0, Integer.valueOf(day))
        pr.put(1, Integer.valueOf(bkt))
        dataFile.put("partition", pr)
        dataFile.put("record_count", n)
        dataFile.put("file_size_in_bytes", size)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", 1L)
        e.put("file_sequence_number", 1L)
        e.put("data_file", dataFile)
        e
    }
    val manifestPath = new Path(metaDir(root), s"manifest-$commitUuid.avro")
    f.mkdirs(metaDir(root))
    val manifestLen = writeAvro(conf, manifestPath, entrySchema, entries)

    // manifest list with per-field bound summaries (manifest-level pruning)
    val ml = {
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", manifestPath.toString)
      r.put("manifest_length", manifestLen)
      r.put("partition_spec_id", 0)
      r.put("content", 0)
      r.put("sequence_number", 1L)
      r.put("min_sequence_number", 1L)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", fileEntries.size)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows.size.toLong)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      val arrSchema = manifestFileSchema.getField("partitions").schema()
        .getTypes.asScala.find(_.getType == org.apache.avro.Schema.Type.ARRAY).get
      val itemSchema = arrSchema.getElementType
      val arr = new java.util.ArrayList[GenericRecord]()
      Seq(fileEntries.map(_._2), fileEntries.map(_._3)).foreach { vals =>
        val s = new GenericData.Record(itemSchema)
        s.put("contains_null", false)
        s.put("lower_bound", java.nio.ByteBuffer.wrap(encodeBound(vals.min)))
        s.put("upper_bound", java.nio.ByteBuffer.wrap(encodeBound(vals.max)))
        arr.add(s)
      }
      r.put("partitions", arr)
      r
    }
    val mlPath = new Path(metaDir(root), s"snap-$snapshotId-$commitUuid.avro")
    writeAvro(conf, mlPath, manifestFileSchema, Seq(ml))

    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("ts", DateType), StructField("payload", StringType)))
    val (schemaJson0, lastColumnId) = toIcebergSchemaJson(schema)
    val schemaJson = schemaJson0.replaceFirst("\\{\"type\":\"struct\"",
      "{\"type\":\"struct\",\"schema-id\":0")
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"${java.util.UUID.randomUUID()}",
         |"location":"$root","last-sequence-number":1,
         |"last-updated-ms":$snapshotId,"last-column-id":$lastColumnId,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |{"name":"ts_day","transform":"day","source-id":2,"field-id":1000},
         |{"name":"id_bucket","transform":"bucket[$buckets]","source-id":1,"field-id":1001}
         |]}],"default-spec-id":0,"last-partition-id":1001,
         |"sort-orders":[{"order-id":0,"fields":[]}],"default-sort-order-id":0,
         |"snapshots":[{"snapshot-id":$snapshotId,"timestamp-ms":$snapshotId,
         |"sequence-number":1,"summary":{"operation":"append"},
         |"manifest-list":"${mlPath.toString}","schema-id":0}],
         |"current-snapshot-id":$snapshotId,
         |"snapshot-log":[{"snapshot-id":$snapshotId,"timestamp-ms":$snapshotId}]}"""
        .stripMargin.replaceAll("\n", "")
    require(tryPublishMeta(f, root, 1L, metadataJson.getBytes("UTF-8"), commitUuid),
      s"fixture table at $root already has metadata v1")
    writeHint(f, root, 1L)
  }
}
