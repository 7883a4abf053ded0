package graft

import graft.core.{Catalog, CatalogSync}

class CatalogSyncSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("catsync").toString

  test("incremental sync copies once, then only the delta; absent tables skip") {
    val src = tmp(); val tgt = tmp()
    val cat = new Catalog(spark, src)
    cat.recordRun("p", "r1", Seq(("a", true, 10L, ""), ("b", true, 5L, "")))
    cat.recordOutputs("p", "r1", Seq(("b", s"$src/out", 100L)))

    val first = CatalogSync.sync(spark, src, tgt,
      tables = Seq("meta_runs", "meta_outputs", "meta_failures"))
    assert(first.forall(_.success), first.mkString("; "))
    assert(first.find(_.table == "meta_runs").get.rows == 2)
    assert(first.find(_.table == "meta_outputs").get.rows == 1)
    // no failures recorded yet -> absent, skipped, still success
    assert(first.find(_.table == "meta_failures").get.mode == "absent")
    assert(new Catalog(spark, tgt).table("meta_runs").count() == 2)

    // nothing new -> zero-row sync, target unchanged
    val idle = CatalogSync.sync(spark, src, tgt, tables = Seq("meta_runs"))
    assert(idle.head.rows == 0)
    assert(new Catalog(spark, tgt).table("meta_runs").count() == 2)

    // a second run syncs ONLY its own rows
    Thread.sleep(5)
    cat.recordRun("p", "r2", Seq(("a", false, 20L, "boom")))
    val delta = CatalogSync.sync(spark, src, tgt, tables = Seq("meta_runs"))
    assert(delta.head.rows == 1)
    val synced = new Catalog(spark, tgt).table("meta_runs")
    assert(synced.count() == 3)
    assert(synced.where("run_id = 'r2'").count() == 1)
  }

  test("full sync overwrites the target; bad mode and non-meta tables fail cleanly") {
    val src = tmp(); val tgt = tmp()
    val cat = new Catalog(spark, src)
    cat.recordRun("p", "r1", Seq(("a", true, 1L, "")))
    // target starts with stale junk that full sync must replace
    new Catalog(spark, tgt).recordRun("stale", "r0", Seq(("z", true, 1L, "")))

    val res = CatalogSync.sync(spark, src, tgt,
      tables = Seq("meta_runs"), mode = "full")
    assert(res.head.success && res.head.rows == 1)
    val after = new Catalog(spark, tgt).table("meta_runs")
    assert(after.count() == 1)
    assert(after.where("pipeline = 'stale'").count() == 0)

    intercept[IllegalArgumentException] {
      CatalogSync.sync(spark, src, tgt, mode = "sideways")
    }
    // a directory without recorded_at is a per-table failure, not a crash
    import spark.implicits._
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$src/meta_bogus")
    val bogus = CatalogSync.sync(spark, src, tgt, tables = Seq("meta_bogus"))
    assert(!bogus.head.success)
    assert(bogus.head.error.exists(_.contains("recorded_at")))
  }

  test("sync CLI verb reports per-table outcomes") {
    val src = tmp(); val tgt = tmp()
    new Catalog(spark, src).recordRun("p", "r1", Seq(("a", true, 1L, "")))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8"))(
      Tools.mainExit(Array("sync", src, tgt, "--tables", "meta_runs,meta_outputs")))
    val text = out.toString("UTF-8")
    assert(code == 0, text)
    assert(text.contains("[ ok ] meta_runs"))
    assert(text.contains("synced 2/2 tables"))
    assert(Tools.mainExit(Array("sync", src)) == 2)
    assert(Tools.mainExit(Array("sync", src, tgt, "--mode", "nope")) == 2)
  }
}
