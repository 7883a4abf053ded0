package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Shared machinery behind the streaming sources' `schemaTrackingLocation`
 * option ([[DeltaStreamSource]], [[IcebergStreamSource]]): persist the
 * schema a mid-stream ADDITIVE evolution widened to (so a restart serves
 * it), decide additivity, and null-fill/reorder batch frames to the
 * stream's declared schema.
 */
private[sources] object SchemaTracking {

  /** (version-or-snapshot-id the schema took effect at, tracked schema),
    * when the tracking file exists. */
  def read(spark: SparkSession, p: Path): Option[(Long, StructType)] = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val n = new ObjectMapper().readTree(text)
      Some((n.get("version").asLong,
        org.apache.spark.sql.types.DataType.fromJson(n.get("schemaJson").asText())
          .asInstanceOf[StructType]))
    }
  }

  def write(spark: SparkSession, p: Path, version: Long, st: StructType): Unit = {
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val node = new ObjectMapper().createObjectNode()
    node.put("version", version)
    node.put("schemaJson", st.json)
    val out = f.create(p, true)
    try out.write(node.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Every field of `old` present in `wide` with the same type. */
  def isAdditive(old: StructType, wide: StructType): Boolean =
    old.fields.forall(f =>
      wide.fields.exists(g => g.name == f.name && g.dataType == f.dataType))

  /** Null-fill/reorder `df` to the stream's declared `schema` — how files
    * written under an older (narrower) table schema surface after a
    * tracked widening. */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    if (df.schema == schema) df
    else df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
