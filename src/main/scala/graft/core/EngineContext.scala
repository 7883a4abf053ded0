package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicLong

/**
 * Execution context threaded through every transformer.
 *
 * Mirrors the reference's EngineContext (odibi/context.py:32-130): the
 * current DataFrame, a registry of every other named dataset produced by
 * upstream nodes, and a SQL executor that exposes the current frame as a
 * temp view named `df`.
 *
 * Spark-first design note: the context never materializes anything — `df`
 * is a lazy Catalyst logical plan, and `sql()` splices that plan into a new
 * one via a uniquely-named temp view, so chained SQL steps still collapse
 * into one optimized physical plan at action time.
 */
final case class EngineContext(
    df: DataFrame,
    datasets: Map[String, DataFrame] = Map.empty,
    extraViews: Map[String, DataFrame] = Map.empty
) {
  def spark: SparkSession = df.sparkSession

  def withDf(next: DataFrame): EngineContext = copy(df = next)

  /** Fetch an upstream dataset by node name (reference: context.get). */
  def dataset(name: String): DataFrame =
    datasets.getOrElse(
      name,
      throw new IllegalArgumentException(
        s"Dataset '$name' not found in context. Available: ${datasets.keys.toSeq.sorted.mkString(", ")}"))

  /**
   * Run SQL with the current frame visible as view `df` plus all context
   * datasets under their node names (reference: odibi/context.py:23-29 uses
   * a unique thread-safe view name; we do the same and rewrite `df`).
   */
  def sql(query: String): DataFrame = {
    val unique = s"graft_df_${EngineContext.viewCounter.incrementAndGet()}"
    df.createOrReplaceTempView(unique)
    // dataset keys may be dotted cross-pipeline refs ("pipe.node"); temp
    // view names must be single-part, so sanitize like runSideSql does.
    // Register sanitized (dotted) keys FIRST so that on a collision with
    // a literal node name ("bronze.regions" vs a node named
    // "bronze_regions") the literal name deterministically wins.
    def viewName(name: String) = name.replaceAll("[^A-Za-z0-9_]", "_")
    val (mangled, plain) = datasets.partition { case (n, _) => viewName(n) != n }
    mangled.foreach { case (name, d) => d.createOrReplaceTempView(viewName(name)) }
    plain.foreach { case (name, d) => d.createOrReplaceTempView(name) }
    extraViews.foreach { case (name, d) => d.createOrReplaceTempView(viewName(name)) }
    // Replace references to the conventional view name `df` (word-bounded).
    val rewritten = query.replaceAll("(?i)(?<![A-Za-z0-9_.])df(?![A-Za-z0-9_])", unique)
    try spark.sql(rewritten)
    finally spark.catalog.dropTempView(unique)
  }
}

object EngineContext {
  private val viewCounter = new AtomicLong(0L)
}

/**
 * A transformer is a pure EngineContext => DataFrame. All 59 reference
 * transformers (odibi/transformers/__init__.py:24-153) are rebuilt as these.
 */
trait Transformer {
  def name: String
  def apply(ctx: EngineContext, params: Map[String, Any]): DataFrame
}

/**
 * Registry of named transformers (reference: odibi/registry.py:11-96).
 * Typed Scala callers use the operator objects directly; the registry
 * exists for config-driven pipelines.
 */
object TransformerRegistry {
  private val registry = scala.collection.concurrent.TrieMap.empty[String, Transformer]

  def register(t: Transformer): Unit = registry.put(t.name, t)
  def get(name: String): Option[Transformer] = registry.get(name)
  def names: Seq[String] = registry.keys.toSeq.sorted
}
