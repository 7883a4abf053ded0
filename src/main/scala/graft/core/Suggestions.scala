package graft.core

/**
 * Pattern-based error → actionable-suggestion engine (reference:
 * odibi/utils/error_suggestions.py:1-749 — get_suggestions(error, ctx)
 * consulted by every component at failure time). The rules here are
 * Spark-first: they cover the failures a Spark pipeline actually
 * produces (Catalyst error classes, shuffle/broadcast sizing, streaming
 * checkpoints, parquet type gotchas) plus graft's own load-time errors,
 * and they consult the LIVE registries for nearest-name matching rather
 * than a frozen list.
 *
 * Consumers: `graft.Run` ([FAIL] hint lines), `core.Doctor` (recorded-
 * failure hints), `core.Story` (node failure pages).
 */
object Suggestions {

  /** Levenshtein distance — bounded inputs (registry/column names). */
  private[graft] def editDistance(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Closest registry names to `name` (distance ≤ 1/3 of its length, or
    * containment), best first, at most 3. */
  private[graft] def nearestTransformers(name: String): Seq[String] = {
    StandardTransformers.registerAll
    val all = (TransformerRegistry.names ++ graft.patterns.PatternRegistry.names).distinct
    val scored = all.map(n => n -> editDistance(name.toLowerCase, n.toLowerCase))
    val near = scored.filter { case (n, dst) =>
      dst <= math.max(1, name.length / 3) ||
        n.toLowerCase.contains(name.toLowerCase) ||
        name.toLowerCase.contains(n.toLowerCase)
    }
    near.sortBy(_._2).map(_._1).take(3)
  }

  private type Rule = (String, String) => Option[String]

  // (errorClass, UPPERCASED message) => hint. Ordered most-specific first.
  private val rules: Seq[Rule] = Seq(
    // graft load/registry errors --------------------------------------
    (_, m) => if (m.contains("UNKNOWN TRANSFORMER")) {
      val name = "unknown transformer:?\\s*'?([a-z0-9_]+)'?".r
        .findFirstMatchIn(m.toLowerCase).map(_.group(1)).getOrElse("")
      val near = if (name.isEmpty) Nil else nearestTransformers(name)
      Some("transformer is not registered" +
        (if (near.nonEmpty) s" — did you mean: ${near.mkString(", ")}?" else "") +
        " (`graft.Tools list` shows every name; plugins load via ServiceLoader)")
    } else None,
    (_, m) => if (m.contains("MISSING PARAM")) Some(
      "the step is missing a required param — `graft.Tools templates " +
        "transformer <name>` shows the invocation shape; parameter " +
        "reference: docs/operators.md") else None,
    (_, m) => if (m.contains("${")) Some(
      "an unresolved ${VAR} placeholder reached execution — `graft.Tools " +
        "secrets validate <yaml>` lists the gaps; set the variable in the " +
        "environment or a .env beside the config, or pass --set VAR=value")
      else None,
    // environment / format gotchas ------------------------------------
    (_, m) => if (m.contains("TIMESTAMP(NANOS")) Some(
      "parquet TIMESTAMP(NANOS) columns need " +
        "spark.sql.legacy.parquet.nanosAsLong=true (spark_config block or " +
        "SparkSession builder); the column then reads as BIGINT nanos")
      else None,
    (_, m) => if (m.contains("NOT AN AVRO CONTAINER")) Some(
      "the file is not an avro object-container file — check the read " +
        "path/format, or pass avro_schema for headerless data") else None,
    // NOTE: `m` arrives uppercased — match patterns in caps
    (_, m) => if (m.contains("EXPECTED WARC VERSION LINE")) Some(
      "the file does not start with a WARC record — check the path (warc " +
        "reads accept .warc, .warc.gz, .warc.zst) and that the file is not " +
        "a bare HTTP capture or a truncated segment") else None,
    (_, m) => if (m.contains("NO _DELTA_LOG COMMITS")) Some(
      "the path is not a Delta table — point `format: delta` at the TABLE " +
        "ROOT (the directory containing _delta_log), or read the files " +
        "directly with format: parquet") else None,
    (_, m) => if (m.contains("NO ICEBERG METADATA FILES")) Some(
      "the path is not an Iceberg table — point `format: iceberg` at the " +
        "table root (containing metadata/*.metadata.json), or pass " +
        "metadata_location for catalog-managed tables") else None,
    (_, m) => if (m.contains("NOT IN DELTA LOG") ||
        (m.contains("SNAPSHOT") && m.contains("NOT IN ["))) Some(
      "the requested version/snapshot is outside the table history — " +
        "`graft.Tools delta history <root>` / `graft.Tools iceberg history " +
        "<root>` lists what exists") else None,
    (_, m) => if (m.contains("CANNOT MERGE BLOOM FILTERS")) Some(
      "the bloom index at bloom_path was created with different " +
        "(expected_items, fpp) — filter bit geometry must match to merge; " +
        "keep the original parameters (see params.json beside bloom.bin) " +
        "or delete the index to rebuild with the new ones") else None,
    (_, m) => if (m.contains("SATURATION_PROPERTIES METHOD")) Some(
      "saturation_properties accepts method: magnus (fast approximation) " +
        "or method: if97 (IAPWS-IF97 exact); steam_properties gives the " +
        "full IF97 property set") else None,
    // catalyst analysis errors ----------------------------------------
    (c, m) => if (m.contains("PATH_NOT_FOUND") || c.contains("FileNotFound"))
      Some("input path missing: run the upstream pipeline first, check the " +
        "connection base path, or fix the read path (`graft.Tools lineage` " +
        "shows who should have produced it)") else None,
    (_, m) => if (m.contains("UNRESOLVED_COLUMN") || m.contains("CANNOT_RESOLVE"))
      Some("column not found: check step SQL/exprs against the upstream " +
        "schema — `graft.Plan` shows declared schemas, and " +
        "normalize_column_names fixes case/space drift from raw sources")
      else None,
    (_, m) => if (m.contains("PARSE_SYNTAX_ERROR")) Some(
      "SQL syntax error in a step: dry-run with `graft.Plan` to lint every " +
        "step without starting Spark") else None,
    (_, m) => if (m.contains("CANNOT_MERGE_SCHEMAS") ||
        m.contains("FOUND DUPLICATE COLUMN")) Some(
      "incompatible schemas across files/inputs: pin a contracts " +
        "schema_ddl on the reader, or harmonize_schema/normalize_schema " +
        "before the union") else None,
    (_, m) => if (m.contains("MALFORMED") && m.contains("CSV")) Some(
      "malformed CSV rows under FAILFAST: set read options mode=PERMISSIVE " +
        "with a schema_ddl contract, and quarantine the rejects via a " +
        "validation block") else None,
    // scale / execution errors ----------------------------------------
    (c, m) => if (c.contains("OutOfMemory") || m.contains("OUTOFMEMORY") ||
        m.contains("SPILL")) Some(
      "memory pressure: raise spark.sql.shuffle.partitions so partitions " +
        "fit, lower spark.sql.files.maxPartitionBytes, and for one hot key " +
        "use the salted_agg/salted-join operators") else None,
    (_, m) => if (m.contains("CARTESIAN")) Some(
      "implicit cartesian product: the join has no usable equi-condition — " +
        "add join keys, or mark a deliberate cross join explicitly") else None,
    (_, m) => if (m.contains("BROADCAST") &&
        (m.contains("TIMEOUT") || m.contains("LARGER THAN") || m.contains("OOM")))
      Some("broadcast side too large/slow: raise " +
        "spark.sql.broadcastTimeout, or disable the auto-broadcast with " +
        "spark.sql.autoBroadcastJoinThreshold=-1 and let it shuffle") else None,
    (_, m) => if (m.contains("TASK NOT SERIALIZABLE")) Some(
      "a closure captured a non-serializable object (SparkSession, " +
        "connection, logger): move the capture inside the lambda or mark " +
        "it @transient lazy") else None,
    // streaming ---------------------------------------------------------
    (_, m) => if (m.contains("CHECKPOINT") &&
        (m.contains("INCOMPATIBLE") || m.contains("DELETED") ||
          m.contains("MISMATCH"))) Some(
      "the streaming checkpoint no longer matches the query: point " +
        "`streaming.checkpoint` at a FRESH directory after changing the " +
        "query shape (state schema is not migratable)") else None,
    // jdbc --------------------------------------------------------------
    (_, m) => if (m.contains("NO SUITABLE DRIVER") || m.contains("JDBC")) Some(
      "JDBC connectivity: set the `driver` read option to the driver " +
        "class, verify the url, and keep credentials in ${VAR} " +
        "placeholders resolved from the environment") else None,
    // validation gates ---------------------------------------------------
    (_, m) => if (m.contains("GATE") || m.contains("QUALITY")) Some(
      "a validation gate blocked the node: inspect meta_metrics " +
        "(`graft.Tools catalog <root> meta_metrics`) for the failing tests")
      else None)

  /** Actionable hints for a recorded (class, message) failure — most
    * specific first, deduped, at most `max`. */
  def suggestText(errorClass: String, message: String, max: Int = 3): Seq[String] = {
    val m = Option(message).getOrElse("").toUpperCase
    rules.flatMap(r => r(Option(errorClass).getOrElse(""), m))
      .distinct.take(max)
  }

  /** Hints for a live exception (walks one cause level). */
  def suggest(e: Throwable, max: Int = 3): Seq[String] = {
    val own = suggestText(e.getClass.getName,
      Option(e.getMessage).getOrElse(e.toString), max)
    val fromCause = Option(e.getCause).toSeq.flatMap(c =>
      suggestText(c.getClass.getName, Option(c.getMessage).getOrElse(""), max))
    (own ++ fromCause).distinct.take(max)
  }
}
