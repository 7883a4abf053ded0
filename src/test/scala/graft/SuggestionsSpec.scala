package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Suggestions

/** Error → actionable-hint engine (no Spark needed). */
class SuggestionsSpec extends AnyFunSuite {

  test("unknown transformer suggests nearest registry names") {
    val hints = Suggestions.suggest(
      new IllegalArgumentException("unknown transformer: filtr_rows"))
    assert(hints.nonEmpty)
    assert(hints.head.contains("filter_rows"), hints.head)
  }

  test("each rule family fires on its signature text") {
    def first(cls: String, msg: String): String =
      Suggestions.suggestText(cls, msg).headOption.getOrElse("")
    assert(first("", "missing param: condition").contains("templates transformer"))
    assert(first("", "cannot read /data/${LAKE}/in").contains("secrets validate"))
    assert(first("", "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,true))")
      .contains("nanosAsLong"))
    assert(first("org.apache.spark.sql.AnalysisException",
      "[PATH_NOT_FOUND] Path does not exist").contains("upstream"))
    assert(first("", "[UNRESOLVED_COLUMN.WITH_SUGGESTION] cannot resolve x")
      .contains("normalize_column_names"))
    assert(first("", "[CANNOT_MERGE_SCHEMAS] Failed merging").contains("schema_ddl"))
    assert(first("java.lang.OutOfMemoryError", "Java heap space")
      .contains("shuffle.partitions"))
    assert(first("", "Detected implicit cartesian product").contains("join keys"))
    assert(first("", "Could not execute broadcast in 300 secs. Timeout")
      .contains("autoBroadcastJoinThreshold"))
    assert(first("", "Task not serializable").contains("closure"))
    assert(first("", "checkpoint state schema mismatch detected").contains("FRESH"))
    assert(first("", "quality gate failed: pass rate 0.4").contains("meta_metrics"))
    assert(first("", "expected WARC version line, got 'HTTP/1.1 200'")
      .contains(".warc.zst"))
    assert(first("", "/x is not a Delta table (no _delta_log commits)")
      .contains("TABLE ROOT"))
    assert(first("", "/x has no iceberg metadata files")
      .contains("metadata_location"))
    assert(first("", "version 9 not in Delta log [0..3]")
      .contains("delta history"))
    assert(first("", "snapshot 42 not in [1, 2]").contains("iceberg history"))
    assert(first("", "Cannot merge bloom filters with different bit size")
      .contains("params.json"))
    assert(first("", "saturation_properties method must be magnus or if97, got x")
      .contains("IAPWS-IF97"))
    // unmatched text yields no hints (Doctor falls back to --select advice)
    assert(Suggestions.suggestText("", "some novel failure").isEmpty)
  }

  test("cause chain is consulted and hints dedupe") {
    val e = new RuntimeException("wrapper",
      new java.io.FileNotFoundException("File /x/y does not exist"))
    assert(Suggestions.suggest(e).exists(_.contains("upstream")))
    assert(Suggestions.suggest(e).size == Suggestions.suggest(e).distinct.size)
  }

  test("edit distance & nearest names behave") {
    assert(Suggestions.editDistance("filter_rows", "filtr_rows") == 1)
    assert(Suggestions.nearestTransformers("derive_colums").contains("derive_columns"))
    assert(Suggestions.nearestTransformers("zzzz_qqqq_vvvv").isEmpty)
  }
}
