package graft

import graft.core.{Pipeline, Story}
import graft.sources.Sources

class StorySpec extends SparkSpec {

  test("story JSON summarizes run outcomes, lineage and schemas") {
    val cfg = Pipeline.PipelineConfig("p", Seq(
      Pipeline.NodeConfig("src", read = Some(Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet")))),
      Pipeline.NodeConfig("bad", dependsOn = Seq("src"),
        steps = Seq(Pipeline.TransformStep(sql = Some("SELECT broken FROM df"))))))
    val results = Pipeline.run(spark, cfg)
    val json = Story.generate(cfg, results, "run-7", 1234)
    assert(json.contains("\"run_id\": \"run-7\""))
    assert(json.contains("\"n_failed\": 1"))
    assert(json.contains("\"name\": \"src\", \"status\": \"success\""))
    assert(json.contains("\"name\": \"bad\", \"status\": \"failed\""))
    assert(json.contains("r_regionkey")) // schema captured
    // valid JSON: parseable by the JVM's nashorn-free minimal check — just
    // balance braces and ensure no raw control chars
    assert(json.count(_ == '{') == json.count(_ == '}'))

    val path = java.nio.file.Files.createTempDirectory("story").toString + "/story.json"
    Story.write(path, cfg, results, "run-7", 1234)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
  }
}
