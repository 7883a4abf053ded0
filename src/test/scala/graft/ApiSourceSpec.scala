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

  test("rate limit enforces minimum interval") {
    val t0 = System.currentTimeMillis()
    val fetch: ApiSource.Fetch = (_, params) => pageData(params("page").toInt)
    ApiSource.fetchPages("u", ApiSource.PageNumber(), fetch,
      rateLimit = ApiSource.RateLimit(minIntervalMs = 30))
    assert(System.currentTimeMillis() - t0 >= 90) // 4 calls, 3 waits
  }
}
