package graft

import graft.core.{Pipeline, Planner, YamlConfig}

class ConnectionsSpec extends SparkSpec {

  test("file connection: relative read/write paths resolve under the base URI") {
    val out = java.nio.file.Files.createTempDirectory("conn").toString
    val yaml =
      s"""name: p
         |connections:
         |  testdata: { kind: file, base_path: /root/testdata/sf0.001 }
         |  lake: { kind: file, base_path: $out }
         |nodes:
         |  - name: regions
         |    read: { format: parquet, connection: testdata, path: region.parquet }
         |    write: { format: parquet, mode: overwrite, connection: lake, path: silver/regions }
         |""".stripMargin
    val cfg = YamlConfig.loadPipeline(yaml)
    assert(cfg.nodes.head.read.get.path.contains("/root/testdata/sf0.001/region.parquet"))
    assert(cfg.nodes.head.writePath.contains(s"$out/silver/regions"))
    val r = Pipeline.run(spark, cfg)
    assert(r("regions").failure.isEmpty)
    assert(spark.read.parquet(s"$out/silver/regions").count() == 5)
  }

  test("connection default options merge with node options winning") {
    val yaml =
      """name: p
        |connections:
        |  csvin: { kind: file, base_path: /data, options: { header: "true", sep: "," } }
        |nodes:
        |  - name: n
        |    read: { format: csv, connection: csvin, path: f.csv, options: { sep: "|" } }
        |""".stripMargin
    val read = YamlConfig.loadPipeline(yaml).nodes.head.read.get
    assert(read.options("header") == "true")
    assert(read.options("sep") == "|") // node wins
    assert(read.path.contains("/data/f.csv"))
  }

  test("jdbc connection: url + credentials land in reader options") {
    val yaml =
      """name: p
        |connections:
        |  wh:
        |    kind: jdbc
        |    url: jdbc:postgresql://host:5432/db
        |    options: { user: u, driver: org.postgresql.Driver }
        |nodes:
        |  - name: n
        |    read: { connection: wh, table: public.orders }
        |""".stripMargin
    val read = YamlConfig.loadPipeline(yaml).nodes.head.read.get
    assert(read.format == "jdbc")
    assert(read.options("url") == "jdbc:postgresql://host:5432/db")
    assert(read.options("user") == "u")
    assert(read.table.contains("public.orders"))
  }

  test("unknown connection: loader throws, planner diagnoses") {
    val yaml =
      """name: p
        |nodes:
        |  - name: n
        |    read: { format: parquet, connection: nope, path: x }
        |""".stripMargin
    val e = intercept[IllegalArgumentException] { YamlConfig.loadPipeline(yaml) }
    assert(e.getMessage.contains("unknown connection"))
    val plan = Planner.plan(yaml)
    assert(plan.errors.map(_.code).contains("unknown_connection"))
  }

  test("jdbc connection on a write block is rejected at load and plan time") {
    val yaml =
      """name: p
        |connections:
        |  wh: { kind: jdbc, url: jdbc:postgresql://h/db }
        |nodes:
        |  - name: n
        |    input: ext
        |    write: { connection: wh, path: t }
        |""".stripMargin
    val e = intercept[IllegalArgumentException] { YamlConfig.loadPipeline(yaml) }
    assert(e.getMessage.contains("jdbc connections are not supported on write"))
    assert(Planner.plan(yaml).errors.map(_.code).contains("jdbc_write_unsupported"))
  }

  test("malformed connections block is a planner diagnostic, not a crash") {
    val bare = Planner.plan("name: p\nconnections:\nnodes: []\n")
    assert(bare.valid, bare.diagnostics.mkString("; ")) // bare key = empty
    val wrong = Planner.plan("name: p\nconnections: [a]\nnodes: []\n")
    assert(wrong.errors.map(_.code).contains("connections_invalid"))
  }

  test("streaming node without a write sink is a planner error") {
    val yaml =
      """name: p
        |nodes:
        |  - name: s
        |    read: { format: parquet, path: /x, streaming: true }
        |    streaming: { checkpoint: /tmp/cp }
        |""".stripMargin
    assert(Planner.plan(yaml).errors.map(_.code).contains("missing_write_path"))
  }

  test("absolute paths pass through a file connection untouched") {
    val yaml =
      """name: p
        |connections:
        |  lake: { kind: file, base_path: /data }
        |nodes:
        |  - name: n
        |    read: { format: parquet, connection: lake, path: /abs/elsewhere.parquet }
        |""".stripMargin
    assert(YamlConfig.loadPipeline(yaml).nodes.head.read.get.path
      .contains("/abs/elsewhere.parquet"))
  }
}
