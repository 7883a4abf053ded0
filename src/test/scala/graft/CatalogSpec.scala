package graft

import graft.core.{Catalog, Pipeline}
import graft.sources.Sources

class CatalogSpec extends SparkSpec {

  test("recorded run lands meta_runs, meta_lineage, meta_schemas; drift detected") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val cat = new Catalog(spark, root)
    val cfg = Pipeline.PipelineConfig("p1", Seq(
      Pipeline.NodeConfig("r", read = Some(Sources.ReadConfig("parquet",
        Some("/root/testdata/sf0.001/region.parquet")))),
      Pipeline.NodeConfig("agg", dependsOn = Seq("r"),
        steps = Seq(Pipeline.TransformStep(sql = Some(
          "SELECT r_regionkey, count(*) AS n FROM df GROUP BY 1"))))))

    val results = Catalog.runRecorded(spark, cfg, cat, "run-1")
    assert(results.values.forall(_.failure.isEmpty))

    val runs = cat.table("meta_runs")
    assert(runs.count() == 2)
    assert(runs.filter("success").count() == 2)
    val lineage = cat.table("meta_lineage").collect()
      .map(r => (r.getAs[String]("node"), r.getAs[String]("input")))
    assert(lineage.toSeq == Seq(("agg", "r")))

    // same schema -> no drift; different schema -> drift
    assert(!cat.schemaDrifted("agg", results("agg").df))
    assert(cat.schemaDrifted("agg", results("r").df))
  }
}
