package graft

import graft.sources.ApiSource

class ApiSourceSpec extends SparkSpec {

  private def pageData(page: Int): String =
    if (page > 3) "[]"
    else s"""{"data": [{"id": ${page * 10}, "name": "row${page}a"}, {"id": ${page * 10 + 1}, "name": "row${page}b"}]}"""

  test("page-number pagination drains all pages and parses record path") {
    var calls = 0
    val fetch: ApiSource.Fetch = (_, params) => {
      calls += 1
      pageData(params("page").toInt)
    }
    val df = ApiSource.read(spark, "http://stub/api", ApiSource.PageNumber(), fetch,
      recordPath = Some("data"))
    assert(calls == 4) // 3 full pages + 1 empty
    assert(df.count() == 6)
    assert(df.columns.toSet == Set("id", "name"))
    assert(df.filter("id = 21").count() == 1)
  }

  test("retry with backoff recovers from transient failures") {
    var attempts = 0
    val flaky: ApiSource.Fetch = (_, params) => {
      attempts += 1
      if (attempts <= 2) throw new RuntimeException("503")
      pageData(params("page").toInt)
    }
    val pages = ApiSource.fetchPages("u", ApiSource.PageNumber(), flaky,
      retry = ApiSource.RetryConfig(maxRetries = 3, backoffMs = 1))
    assert(pages.size == 3)
    assert(attempts == 6) // 2 failures + 4 calls (3 pages + empty)
  }

  test("retry gives up after maxRetries") {
    val dead: ApiSource.Fetch = (_, _) => throw new RuntimeException("500")
    intercept[RuntimeException] {
      ApiSource.fetchPages("u", ApiSource.PageNumber(), dead,
        retry = ApiSource.RetryConfig(maxRetries = 2, backoffMs = 1))
    }
  }

  test("cursor pagination follows next cursor until exhausted") {
    val bodies = Map(
      "" -> """{"items": [1], "next": "c2"}""",
      "c2" -> """{"items": [2], "next": "c3"}""",
      "c3" -> """{"items": [3]}""")
    val fetch: ApiSource.Fetch = (_, params) => bodies(params.getOrElse("cursor", ""))
    val pages = ApiSource.fetchPages("u",
      ApiSource.Cursor(nextCursor = b =>
        "\"next\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))),
      fetch)
    assert(pages.size == 3)
  }

  test("link-header pagination follows rel=next URLs with page-size param") {
    val urls = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    val fetch: ApiSource.FetchResponse = (url, params) => {
      urls += ((url, params))
      url match {
        case "http://stub/api" => ApiSource.ApiResponse(
          """[{"id": 1}]""",
          Map("Link" -> """<http://stub/api?page=2>; rel="next", <http://stub/api?page=9>; rel="last""""))
        case "http://stub/api?page=2" => ApiSource.ApiResponse(
          """[{"id": 2}]""",
          Map("link" -> """<http://stub/api?page=1>; rel="prev", <http://stub/api?page=3>; rel="next""""))
        case "http://stub/api?page=3" => ApiSource.ApiResponse(
          """[{"id": 3}]""",
          Map("Link" -> """<http://stub/api?page=2>; rel="prev"""")) // no next
        case other => fail(s"unexpected url $other")
      }
    }
    val df = ApiSource.readWithHeaders(spark, "http://stub/api",
      ApiSource.LinkHeader(limit = 1), fetch)
    assert(df.count() == 3)
    assert(urls.head._2 == Map("per_page" -> "1")) // first call carries limit
    assert(urls.drop(1).forall(_._2.isEmpty))      // next links are verbatim
    // body-only transport must be rejected for link-header mode
    intercept[IllegalArgumentException] {
      ApiSource.fetchPages("u", ApiSource.LinkHeader(), (_, _) => "[]")
    }
  }

  test("cursorFromPath extracts dotted-path cursors, recordPath drills nested wrappers") {
    val next = ApiSource.cursorFromPath("meta.paging.next_cursor")
    assert(next("""{"meta": {"paging": {"next_cursor": "abc"}}, "data": []}""").contains("abc"))
    assert(next("""{"meta": {"paging": {}}}""").isEmpty)
    assert(next("""{"meta": {"paging": {"next_cursor": null}}}""").isEmpty)
    val df = ApiSource.toDataFrame(spark,
      Seq("""{"meta": {"results": [{"id": 1}, {"id": 2}]}}"""),
      recordPath = Some("meta.results"))
    assert(df.count() == 2 && df.columns.sameElements(Array("id")))
  }

  test("rate limit enforces minimum interval") {
    val t0 = System.currentTimeMillis()
    val fetch: ApiSource.Fetch = (_, params) => pageData(params("page").toInt)
    ApiSource.fetchPages("u", ApiSource.PageNumber(), fetch,
      rateLimit = ApiSource.RateLimit(minIntervalMs = 30))
    assert(System.currentTimeMillis() - t0 >= 90) // 4 calls, 3 waits
  }
}
