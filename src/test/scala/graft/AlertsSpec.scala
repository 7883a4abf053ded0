package graft

import graft.core.{Alerts, Pipeline, YamlConfig}

/**
 * Declarative alert dispatch (reference AlertConfig config.py:162-240 +
 * _send_alerts pipeline.py:1443-1490): channels declared in the project
 * YAML, event filters with on_* aliases, per-run throttling, pluggable
 * webhook transport.
 */
class AlertsSpec extends SparkSpec {
  import spark.implicits._

  test("yaml alerts: file channel captures failure + quarantine events") {
    val dir = java.nio.file.Files.createTempDirectory("graft_alerts").toString
    val yaml =
      s"""
        |name: alerting_yaml
        |alerts:
        |  - channel: file
        |    target: $dir/alerts.jsonl
        |    on_events: [on_failure, on_quarantine]
        |nodes:
        |  - name: quarantining
        |    input: src
        |    validation:
        |      tests:
        |        - { name: v_small, kind: custom_sql, sql: "v < 8", severity: quarantine }
        |      quarantine: { path: $dir/q }
        |    write: { format: parquet, mode: overwrite, path: $dir/ok }
        |  - name: crash
        |    input: src
        |    steps: [ { sql: "SELECT nope FROM df" } ]
        |""".stripMargin
    val src = spark.range(10).toDF("v")
    val res = Pipeline.run(spark, YamlConfig.loadPipeline(yaml), Map("src" -> src))
    assert(res("quarantining").failure.isEmpty)
    assert(res("crash").failure.isDefined)

    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/alerts.jsonl"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val events = (0 until lines.size()).map(i => mapper.readTree(lines.get(i)))
      .map(n => n.get("node").asText() -> n.get("event").asText())
    // on_failure matches node_failure + run_failure; on_quarantine the split
    assert(events.toSet == Set(
      "quarantining" -> "quarantine",
      "crash" -> "node_failure",
      "_pipeline" -> "run_failure"))
    // run_start/run_success filtered out by on_events
    assert(!events.exists(_._2 == "run_start"))
  }

  test("webhook transport is pluggable; throttling caps per-run alerts") {
    val sent = scala.collection.mutable.ListBuffer.empty[String]
    Alerts.registerTransport("test_hook", (_, payload) => sent += payload)
    val dispatch = Alerts.dispatcher(Seq(
      Alerts.AlertConfig("webhook", Some("test_hook"),
        onEvents = Seq("on_failure"), maxAlerts = Some(2))))
    (1 to 5).foreach(i =>
      dispatch(Pipeline.AlertEvent("p", s"n$i", "node_failure", "boom")))
    assert(sent.size == 2) // throttled after maxAlerts
    assert(sent.head.contains("\"node\": \"n1\""))

    // unregistered transport / unknown channel never throw out of dispatch
    val silent = Alerts.dispatcher(Seq(
      Alerts.AlertConfig("webhook", Some("ghost"), onEvents = Seq("on_failure")),
      Alerts.AlertConfig("carrier_pigeon", None, onEvents = Seq("on_failure"))))
    silent(Pipeline.AlertEvent("p", "n", "node_failure", "boom")) // no exception
  }

  test("event alias matching covers the reference's on_* names") {
    assert(Alerts.matches(Seq("on_start"), "run_start"))
    assert(Alerts.matches(Seq("on_success"), "run_success"))
    assert(Alerts.matches(Seq("on_failure"), "node_failure"))
    assert(Alerts.matches(Seq("on_failure"), "run_failure"))
    assert(Alerts.matches(Seq("on_gate_block"), "gate_abort"))
    assert(Alerts.matches(Seq("on_quarantine"), "quarantine"))
    assert(Alerts.matches(Seq("gate_abort"), "gate_abort")) // native names too
    assert(!Alerts.matches(Seq("on_failure"), "run_success"))
  }
}
