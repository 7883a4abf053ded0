package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sources
import graft.validation.Validation

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/**
 * Declarative pipeline: nodes with a read → transform → validate → write
 * lifecycle, executed over the dependency DAG serially or in parallel
 * topological layers (reference: odibi/node.py:230-330 lifecycle;
 * odibi/pipeline.py:340-560 execution; auto-cache pipeline.py:1843-1908).
 *
 * Performance stance (SURVEY §4): ONE lazy Catalyst plan per node,
 * materialized at write; no per-transformer counts (the reference's
 * df.count() logging re-executes plans — deliberately not reproduced).
 */
object Pipeline {

  final case class TransformStep(sql: Option[String] = None,
                                 function: Option[String] = None,
                                 params: Map[String, Any] = Map.empty)

  final case class NodeConfig(
      name: String,
      dependsOn: Seq[String] = Nil,
      input: Option[String] = None,               // dataset to start from
      read: Option[Sources.ReadConfig] = None,
      steps: Seq[TransformStep] = Nil,
      tests: Seq[Validation.Test] = Nil,
      writePath: Option[String] = None,
      write: Sources.WriteConfig = Sources.WriteConfig(),
      cache: Boolean = false,
      retries: Int = 0)

  final case class NodeResult(name: String, df: DataFrame, failure: Option[Throwable])

  final case class PipelineConfig(name: String, nodes: Seq[NodeConfig],
                                  parallel: Boolean = false, maxWorkers: Int = 4,
                                  autoCacheThreshold: Int = 3,
                                  sparkConf: Map[String, String] = Map.empty)

  /** Execute one node against the shared context. */
  def runNode(spark: SparkSession, cfg: NodeConfig,
              datasets: Map[String, DataFrame]): DataFrame = {
    StandardTransformers.registerAll // idempotent

    val base: DataFrame = cfg.read.map(r => Sources.read(spark, r))
      .orElse(cfg.input.map(datasets(_)))
      .getOrElse(cfg.dependsOn.headOption.map(datasets(_))
        .getOrElse(throw new IllegalArgumentException(
          s"node ${cfg.name}: no read, input, or dependency to start from")))

    val transformed = cfg.steps.foldLeft(base) { (df, step) =>
      val ctx = EngineContext(df, datasets)
      (step.sql, step.function) match {
        case (Some(q), _) => ctx.sql(q)
        case (_, Some(fn)) =>
          TransformerRegistry.get(fn)
            .getOrElse(throw new IllegalArgumentException(s"unknown transformer: $fn"))
            .apply(ctx, step.params)
        case _ => df
      }
    }

    if (cfg.tests.nonEmpty)
      Validation.enforce(Validation.evaluate(transformed, cfg.tests))

    cfg.writePath.foreach(p => Sources.write(transformed, p, cfg.write))
    transformed
  }

  /**
   * Run the whole pipeline. Returns node name -> result. Nodes with ≥
   * autoCacheThreshold dependents (or cache=true) are persisted before
   * fan-out so the shared plan is computed once.
   */
  def run(spark: SparkSession, cfg: PipelineConfig,
          externalDatasets: Map[String, DataFrame] = Map.empty): Map[String, NodeResult] = {
    // performance.spark_config passthrough (reference config.py:5192-5250)
    cfg.sparkConf.foreach { case (k, v) => spark.conf.set(k, v) }
    val byName = cfg.nodes.map(n => n.name -> n).toMap
    val graph = DependencyGraph(cfg.nodes.map(n => n.name -> n.dependsOn).toMap)
    val layers = graph.executionLayers()
    val dependentCount = cfg.nodes.map(n =>
      n.name -> graph.dependentsOf(n.name).size).toMap

    val datasets = new ConcurrentHashMap[String, DataFrame]()
    externalDatasets.foreach { case (k, v) => datasets.put(k, v) }
    val results = new ConcurrentHashMap[String, NodeResult]()

    def execOne(name: String): Unit = {
      val node = byName(name)
      val attempt = (0 to node.retries).view.map { _ =>
        Try(runNode(spark, node, datasets.asScala.toMap))
      }.collectFirst { case s @ Success(_) => s }
        .getOrElse(Try(runNode(spark, node, datasets.asScala.toMap)))
      attempt match {
        case Success(df0) =>
          val df =
            if (node.cache || dependentCount(name) >= cfg.autoCacheThreshold) df0.persist()
            else df0
          df.createOrReplaceTempView(name.replaceAll("[^A-Za-z0-9_]", "_"))
          datasets.put(name, df)
          results.put(name, NodeResult(name, df, None))
        case Failure(e) =>
          results.put(name, NodeResult(name, spark.emptyDataFrame, Some(e)))
      }
    }

    layers.foreach { layer =>
      val runnable = layer.filter(byName.contains) // deps may be external datasets
      val failedUpstream = runnable.filter(n =>
        byName(n).dependsOn.exists(d => Option(results.get(d)).exists(_.failure.isDefined)))
      val toRun = runnable.filterNot(failedUpstream.contains)
      failedUpstream.foreach(n => results.put(n,
        NodeResult(n, spark.emptyDataFrame,
          Some(new IllegalStateException(s"upstream failure for $n")))))
      if (cfg.parallel && toRun.size > 1) {
        val pool = Executors.newFixedThreadPool(math.min(cfg.maxWorkers, toRun.size))
        try {
          toRun.foreach(n => pool.submit(new Runnable { def run(): Unit = execOne(n) }))
          pool.shutdown()
          pool.awaitTermination(1, TimeUnit.HOURS)
        } finally if (!pool.isShutdown) pool.shutdownNow()
      } else toRun.foreach(execOne)
    }
    results.asScala.toMap
  }
}
