package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-evolution policy for table-mutating writes — the reference's
 * `SchemaMode` / `OnNewColumns` / `OnMissingColumns` config
 * (reference odibi/config.py:4355-4395) and the Delta autoMerge toggle
 * its MERGE flips (reference odibi/transformers/merge_transformer.py:506-530,
 * `spark.databricks.delta.schema.autoMerge.enabled`), re-expressed on the
 * native log protocol: when the policy admits new columns, the SAME
 * commit that lands the merged rows carries the widened `metaData`
 * action, so readers see data + schema change atomically. Old files are
 * never touched — a column absent from a parquet file reads back null,
 * which IS the null-fill (delta.io PROTOCOL.md: schema evolution is a
 * metadata operation).
 *
 * Policies:
 *   - `mode`: `enforce` (default — source must carry every table column,
 *     extra source columns are dropped by the write's projection) or
 *     `evolve`
 *   - `onNew` (evolve only): `add_nullable` (widen the table schema),
 *     `ignore` (drop the new columns), `fail`
 *   - `onMissing` (evolve only): `fill_null` (missing table columns
 *     null-fill), `fail`
 *
 * Column-mapped tables widen with fresh `delta.columnMapping.id`s
 * (nested fields included — the spec requires an id per field) and
 * UUID physical names, and bump `delta.columnMapping.maxColumnId` in the
 * same metaData action — what delta-spark's schema evolution emits.
 */
object DeltaSchema {

  final case class Policy(mode: String = "enforce",
                          onNew: String = "add_nullable",
                          onMissing: String = "fill_null") {
    require(Set("enforce", "evolve")(mode), s"unknown schema mode '$mode'")
    require(Set("ignore", "fail", "add_nullable")(onNew),
      s"unknown on_new_columns '$onNew'")
    require(Set("fail", "fill_null")(onMissing),
      s"unknown on_missing_columns '$onMissing'")
  }
  val Enforce: Policy = Policy()
  val Evolve: Policy = Policy(mode = "evolve")

  /** What one evolving write commits: the widened logical schema, the
    * updated table configuration, and the schema it was planned against
    * (a concurrent schema change aborts rather than clobbers). */
  final case class Evolution(baselineJson: String, schema: StructType,
                             configuration: Map[String, String])

  /** Source aligned to the (possibly widened) table schema: `schema` is
    * what the write's projection should target; `evolution` is Some when
    * the commit must carry a new metaData action. */
  final case class Aligned(source: DataFrame, schema: StructType,
                           evolution: Option[Evolution])

  /**
   * Align `source` against the table snapshot under `policy`. Missing
   * table columns are null-filled onto the source (or fail); new source
   * columns widen the schema as nullable fields appended after the
   * table's columns (or are ignored / fail). Type changes on EXISTING
   * columns are not evolution — the write's own schema check rejects
   * them downstream.
   */
  def align(source: DataFrame, snap: DeltaLog.Snapshot,
            policy: Policy): Aligned = {
    val tableCols = snap.schema.fieldNames.toSeq
    // CASE-INSENSITIVE matching, like Spark's own resolution (default
    // spark.sql.caseSensitive=false): a source column differing only in
    // case IS the table column — treating it as missing would null-fill
    // over it (withColumn resolves case-insensitively and would REPLACE
    // the data) and then re-add it as a bogus "new" column
    def eqName(a: String, b: String): Boolean = a.equalsIgnoreCase(b)
    val source0 = source
    // rename case-drifted source columns to the table's exact spelling
    val renames = source.columns.flatMap { c =>
      tableCols.find(t => eqName(t, c) && t != c).map(c -> _)
    }.toMap
    val sourceAligned = renames.foldLeft(source0) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    val missing = tableCols.filterNot(t => sourceAligned.columns.exists(eqName(t, _)))
    val newCols = sourceAligned.columns.toSeq
      .filterNot(c => tableCols.exists(eqName(c, _)))
    val source1 = sourceAligned
    if (policy.mode == "enforce") {
      require(missing.isEmpty,
        s"source is missing table columns ${missing.mkString(", ")} " +
          "(schema mode 'enforce'; use mode=evolve with " +
          "on_missing_columns=fill_null to null-fill)")
      return Aligned(source1, snap.schema, None)
    }
    require(missing.isEmpty || policy.onMissing != "fail",
      s"source is missing table columns ${missing.mkString(", ")} " +
        "(on_missing_columns=fail)")
    require(newCols.isEmpty || policy.onNew != "fail",
      s"source carries new columns ${newCols.mkString(", ")} " +
        "(on_new_columns=fail)")
    val byName = snap.schema.fields.map(f => f.name -> f).toMap
    val filled = missing.foldLeft(source1) { (df, c) =>
      df.withColumn(c, lit(null).cast(DeltaLog.stripMeta(byName(c).dataType)))
    }
    if (newCols.isEmpty || policy.onNew == "ignore")
      return Aligned(filled, snap.schema, None)

    // widen: new columns append AFTER the table's, nullable; mapped
    // tables get fresh ids + physical names on every (nested) field
    val mapped =
      snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none"
    val srcField = source1.schema.fields.map(f => f.name -> f).toMap
    var nextId = if (!mapped) 0L else nextMappingId(snap)
    val newFields = newCols.map { c =>
      val f = srcField(c)
      if (!mapped) StructField(c, f.dataType, nullable = true)
      else {
        val (withMeta, last) =
          withMappingIds(StructField(c, f.dataType, nullable = true), nextId)
        nextId = last
        withMeta
      }
    }
    val newSchema = StructType(snap.schema.fields ++ newFields)
    val newConf =
      if (!mapped) snap.configuration
      else snap.configuration +
        ("delta.columnMapping.maxColumnId" -> nextId.toString)
    Aligned(filled, newSchema,
      Some(Evolution(snap.schema.json, newSchema, newConf)))
  }

  /** First mapping id ABOVE everything the table has used (config
    * maxColumnId or any id in the schema metadata). */
  private[sources] def nextMappingId(snap: DeltaLog.Snapshot): Long = math.max(
    snap.configuration.get("delta.columnMapping.maxColumnId")
      .map(_.toLong).getOrElse(0L),
    maxMappingId(snap.schema))

  /** Assign fresh column-mapping metadata (id + UUID physical name) to
    * `f` and every nested struct field, with ids continuing above
    * `after`; returns the rewritten field and the last id used. */
  private[sources] def withMappingIds(f: StructField,
                                      after: Long): (StructField, Long) = {
    var nextId = after
    def ids(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { fd =>
        nextId += 1
        // capture the field's OWN id before recursing — the recursive
        // call advances nextId past the subtree, and reading it late
        // would collide the field with its last descendant
        val myId = nextId
        StructField(fd.name, ids(fd.dataType), nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName",
              s"col-${java.util.UUID.randomUUID()}")
            .putLong("delta.columnMapping.id", myId).build())
      })
      case a: ArrayType => a.copy(elementType = ids(a.elementType))
      case m: MapType =>
        m.copy(keyType = ids(m.keyType), valueType = ids(m.valueType))
      case other => other
    }
    nextId += 1
    val meta = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName",
        s"col-${java.util.UUID.randomUUID()}")
      .putLong("delta.columnMapping.id", nextId).build()
    val rebuilt = StructField(f.name, ids(f.dataType), f.nullable, meta)
    (rebuilt, nextId)
  }

  /**
   * Schema + configuration for OVERWRITING a column-mapped table with
   * `df`'s schema: same-named fields with unchanged (stripped) types
   * keep their mapping metadata (delta-spark's overwriteSchema
   * behavior — readers of old checkpoints keyed on ids stay coherent);
   * changed or new fields take fresh ids above maxColumnId, which the
   * returned configuration bumps.
   */
  def overwriteMapped(df: StructType,
                      snap: DeltaLog.Snapshot): (StructType, Map[String, String]) = {
    val byName = snap.schema.fields.map(f => f.name -> f).toMap
    var nextId = nextMappingId(snap)
    val fields = df.fields.map { f =>
      byName.get(f.name) match {
        case Some(old) if DeltaLog.stripMeta(old.dataType) == f.dataType => old
        case _ =>
          val (withMeta, last) = withMappingIds(f, nextId)
          nextId = last
          withMeta
      }
    }
    (StructType(fields),
      snap.configuration + ("delta.columnMapping.maxColumnId" -> nextId.toString))
  }

  /** Schema + configuration for CREATING a column-mapped (`name` mode)
    * table from scratch: every (nested) field takes a fresh mapping id
    * and UUID physical name — the precondition for metadata-only
    * renameColumn/dropColumn later. */
  def createMapped(df: StructType): (StructType, Map[String, String]) = {
    var nextId = 0L
    val fields = df.fields.map { f =>
      val (withMeta, last) = withMappingIds(f, nextId)
      nextId = last
      withMeta
    }
    (StructType(fields), Map(
      "delta.columnMapping.mode" -> "name",
      "delta.columnMapping.maxColumnId" -> nextId.toString))
  }

  private def maxMappingId(dt: DataType): Long = dt match {
    case s: StructType => (0L +: s.fields.toSeq.map { f =>
      val own =
        if (f.metadata.contains("delta.columnMapping.id"))
          f.metadata.getLong("delta.columnMapping.id")
        else 0L
      math.max(own, maxMappingId(f.dataType))
    }).max
    case a: ArrayType => maxMappingId(a.elementType)
    case m: MapType => math.max(maxMappingId(m.keyType), maxMappingId(m.valueType))
    case _ => 0L
  }
}
