package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Pipeline, Story, YamlConfig}

/**
 * Capstone e2e for the round-2 lifecycle surface: one YAML pipeline using
 * declarative incremental HWM, operation steps, tags, and validation —
 * run twice through `Catalog.runRecorded` with resume enabled, with the
 * SAME state backend carrying both HWM keys and resume keys. Guards the
 * interactions the unit specs cover only in isolation.
 */
class LifecycleE2ESpec extends SparkSpec {
  import spark.implicits._

  test("incremental + resume + catalog + story compose over one state backend") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e2").toString
    def seed(n: Int): Unit =
      (1 to n).map(i => (i.toLong, f"2026-01-$i%02d 00:00:00", i * 10.0))
        .toDF("id", "ts_s", "amount")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .write.mode("overwrite").parquet(s"$dir/src")

    seed(3)
    val yaml =
      s"""
         |name: e2e
         |nodes:
         |  - name: bronze
         |    tags: [bronze]
         |    read: { format: parquet, path: $dir/src }
         |    incremental: { column: ts }
         |    steps:
         |      - operation: sort
         |        params: { by: id }
         |    tests:
         |      - { name: id_nn, kind: not_null, columns: [id] }
         |    write: { format: parquet, mode: append, path: $dir/bronze }
         |  - name: gold
         |    tags: [gold]
         |    depends_on: [bronze]
         |    steps:
         |      - sql: "SELECT count(*) AS n, sum(amount) AS total FROM df"
         |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    val cat = new Catalog(spark, s"$dir/_system")
    cat.registerPipeline(cfg)
    val state = cat.state // catalog-backed: HWM + resume share meta_state
    val opts = Pipeline.RunOptions(resumeFromFailure = true, state = Some(state))

    // run 1: full load of 3 rows
    val r1 = Catalog.runRecorded(spark, cfg, cat, "run-1", opts = opts)
    assert(r1.values.forall(_.failure.isEmpty))
    assert(r1("bronze").rowsWritten.contains(3L))
    assert(state.get("e2e/hwm/bronze").exists(_.startsWith("2026-01-03")))
    assert(r1("gold").df.head().getLong(0) == 3L)

    // run 2 on a grown source: HWM admits only the 2 new rows; gold
    // re-runs because its upstream ran (resume must NOT restore it)
    seed(5)
    val r2 = Catalog.runRecorded(spark, cfg, cat, "run-2", opts = opts)
    assert(r2("bronze").rowsWritten.contains(2L))
    assert(!r2("gold").skipped && r2("gold").failure.isEmpty)
    assert(state.get("e2e/hwm/bronze").exists(_.startsWith("2026-01-05")))
    assert(spark.read.parquet(s"$dir/bronze").count() == 5)

    // catalog facts: 2 runs recorded, outputs carry write metrics,
    // validation landed in meta_metrics, health view sees both runs
    assert(cat.table("meta_runs").select("run_id").distinct().count() == 2)
    val out2 = cat.table("meta_outputs").filter("run_id = 'run-2'").collect()
    assert(out2.length == 1 && out2(0).getAs[Long]("rows_written") == 2L)
    assert(cat.table("meta_metrics").filter("passed").count() == 2) // 1 test x 2 runs
    assert(cat.pipelineHealth.head().getAs[Double]("success_rate") == 1.0)
    assert(cat.configDrift(cfg).isEmpty)

    // story for run 2 carries the incremental row delta
    val story = Story.generate(cfg, r2, "run-2", 1)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nodes = mapper.readTree(story).get("nodes")
    val bronze = (0 until nodes.size()).map(nodes.get)
      .find(_.get("name").asText() == "bronze").get
    assert(bronze.get("rows_written").asLong() == 2L)
    assert(bronze.get("status").asText() == "success")

    // tag filter still composes: gold-only run pulls nothing extra
    val r3 = Pipeline.run(spark, cfg, opts = Pipeline.RunOptions(tag = Some("bronze"),
      state = Some(state)))
    assert(r3.contains("bronze") && !r3.contains("gold"))
    assert(r3("bronze").rowsWritten.contains(0L)) // empty delta
  }
}
