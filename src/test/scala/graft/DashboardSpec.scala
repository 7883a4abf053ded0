package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.core.{Catalog, DashboardServer}

/**
 * Live dashboard over the embedded HTTP listener: rendered views with
 * the auto-refresh poller injected, JSON endpoints reflecting catalog
 * changes WITHOUT a restart, and the fingerprint the pages poll.
 */
class DashboardSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()
  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("live dashboard serves views + JSON and reflects new runs") {
    val root = Files.createTempDirectory("dash_live").toString + "/_system"
    val cat = new Catalog(spark, root)
    cat.recordRun("ingest", "run_1", Seq(("bronze", true, 900L, "")))
    cat.recordPipelineRun("ingest", "run_1", success = true, 1, 0, 900L)

    val server = DashboardServer.start(spark, root)
    try {
      assert(server.port > 0)

      // the rendered view carries the auto-refresh poller
      val (st, html) = get(server.url + "index.html")
      assert(st == 200 && html.contains("<table>"))
      assert(html.contains("api/fingerprint"), "auto-refresh poller missing")
      assert(get(server.url)._2 == html, "/ must serve index.html")

      // health JSON has the recorded pipeline
      val (hs, health) = get(server.url + "api/health")
      assert(hs == 200 && health.contains("\"pipeline\":\"ingest\""), health)

      val (_, fp1) = get(server.url + "api/fingerprint")

      // a NEW run lands in the JSON and moves the fingerprint — no restart
      cat.recordRun("ingest", "run_2", Seq(("bronze", false, 50L, "boom")))
      val (_, runs) = get(server.url + "api/runs")
      assert(runs.contains("\"run_id\":\"run_2\""), runs)
      assert(runs.contains("\"n_failed\":1"), runs)
      val (_, fp2) = get(server.url + "api/fingerprint")
      assert(fp1 != fp2, "fingerprint must move when the catalog changes")

      // the rendered page re-renders lazily on the next request
      val (_, html2) = get(server.url + "index.html")
      assert(html2.contains("run_2"), "page did not re-render after change")

      // unknown paths 404; unknown views 404
      assert(get(server.url + "nope.html")._1 == 404)
      assert(get(server.url + "api/nope")._1 == 404)
    } finally server.stop()
  }

  test("empty catalog serves without errors") {
    val root = Files.createTempDirectory("dash_empty").toString + "/_none"
    val server = DashboardServer.start(spark, root)
    try {
      assert(get(server.url + "index.html")._1 == 200)
      val (st, body) = get(server.url + "api/health")
      assert(st == 200, body) // error JSON or empty array, never a crash
    } finally server.stop()
  }
}
