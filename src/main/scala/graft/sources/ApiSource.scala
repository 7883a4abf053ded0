package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * REST API source (reference: odibi/config.py:1121-1354 —
 * ApiPaginationConfig / ApiRetryConfig / ApiRateLimitConfig /
 * ApiResponseConfig; fetcher odibi/connections/api_fetcher.py).
 *
 * Architecture: APIs are a driver-side ingestion boundary (there is no
 * Spark primitive for paginated HTTP). Pages are fetched sequentially on
 * the driver with retry/backoff + rate limiting, accumulated as JSON
 * strings, and parallelized into a DataFrame via
 * `spark.read.json(Dataset[String])` — schema inference included. The
 * `fetch` function is injected so transports (java.net.http, proxies,
 * test stubs) are swappable; this environment has no egress, so tests use
 * a stub transport.
 */
object ApiSource {

  /** Pagination modes (config.py:1121-1220; all four reference types). */
  sealed trait Pagination
  /** page=1,2,3... until an empty page or maxPages. */
  final case class PageNumber(param: String = "page", start: Int = 1) extends Pagination
  /** offset += pageSize until short page. */
  final case class Offset(param: String = "offset", pageSize: Int = 100) extends Pagination
  /** follow a cursor extracted from the previous response. */
  final case class Cursor(param: String = "cursor",
                          nextCursor: String => Option[String]) extends Pagination
  /** follow RFC 5988 `Link: <url>; rel="next"` headers (GitHub style). */
  final case class LinkHeader(limitParam: String = "per_page",
                              limit: Int = 100) extends Pagination

  final case class RetryConfig(maxRetries: Int = 3, backoffMs: Long = 200,
                               backoffMultiplier: Double = 2.0)
  final case class RateLimit(minIntervalMs: Long = 0)

  /** One page fetch: url with query params -> raw response body. */
  type Fetch = (String, Map[String, String]) => String

  /** Body + response headers — required by [[LinkHeader]] pagination. */
  final case class ApiResponse(body: String, headers: Map[String, String] = Map.empty)
  type FetchResponse = (String, Map[String, String]) => ApiResponse

  /** Extract the rel="next" target from an RFC 5988 Link header value. */
  private[graft] def parseNextLink(linkHeader: String): Option[String] =
    linkHeader.split(",").collectFirst {
      case part if part.contains("rel=\"next\"") =>
        "<([^>]+)>".r.findFirstMatchIn(part).map(_.group(1))
    }.flatten

  /**
   * Dotted-path JSON extractor for cursor pagination (the reference's
   * `cursor_path: meta.next_cursor`) — jackson-based, arbitrary depth.
   */
  def cursorFromPath(path: String): String => Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    body => {
      val node = path.split('.').foldLeft(
        Option(mapper.readTree(body))) { (n, seg) => n.flatMap(x => Option(x.get(seg))) }
      node.filterNot(n => n.isNull || n.isMissingNode).map(_.asText()).filter(_.nonEmpty)
    }
  }

  /**
   * Fetch all pages; returns the raw page bodies. Retries each page with
   * exponential backoff; enforces a minimum interval between calls.
   * Body-only transport; [[LinkHeader]] needs [[fetchPagesWithHeaders]].
   */
  def fetchPages(url: String, pagination: Pagination, fetch: Fetch,
                 baseParams: Map[String, String] = Map.empty,
                 maxPages: Int = 1000,
                 retry: RetryConfig = RetryConfig(),
                 rateLimit: RateLimit = RateLimit(),
                 isEmpty: String => Boolean = _.trim.matches("\\[\\s*\\]|\\{\\s*\\}|")): Seq[String] = {
    require(!pagination.isInstanceOf[LinkHeader],
      "LinkHeader pagination needs response headers: use fetchPagesWithHeaders")
    fetchPagesWithHeaders(url, pagination,
      (u, p) => ApiResponse(fetch(u, p)), baseParams, maxPages, retry, rateLimit, isEmpty)
  }

  /** Header-aware variant supporting all four pagination modes. */
  def fetchPagesWithHeaders(url: String, pagination: Pagination, fetch: FetchResponse,
                            baseParams: Map[String, String] = Map.empty,
                            maxPages: Int = 1000,
                            retry: RetryConfig = RetryConfig(),
                            rateLimit: RateLimit = RateLimit(),
                            isEmpty: String => Boolean = _.trim.matches("\\[\\s*\\]|\\{\\s*\\}|")): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var lastCall = 0L

    def callOnce(callUrl: String, params: Map[String, String]): ApiResponse = {
      var attempt = 0
      var backoff = retry.backoffMs
      while (true) {
        val wait = rateLimit.minIntervalMs - (System.currentTimeMillis() - lastCall)
        if (wait > 0) Thread.sleep(wait)
        try {
          val resp = fetch(callUrl, baseParams ++ params)
          lastCall = System.currentTimeMillis()
          return resp
        } catch {
          case e: Throwable =>
            lastCall = System.currentTimeMillis()
            attempt += 1
            if (attempt > retry.maxRetries) throw e
            Thread.sleep(backoff)
            backoff = (backoff * retry.backoffMultiplier).toLong
        }
      }
      throw new IllegalStateException("unreachable")
    }

    pagination match {
      case PageNumber(param, start) =>
        var page = start
        var done = false
        while (!done && pages.size < maxPages) {
          val body = callOnce(url, Map(param -> page.toString)).body
          if (isEmpty(body)) done = true
          else { pages += body; page += 1 }
        }
      case Offset(param, pageSize) =>
        var offset = 0
        var done = false
        while (!done && pages.size < maxPages) {
          val body = callOnce(url,
            Map(param -> offset.toString, "limit" -> pageSize.toString)).body
          if (isEmpty(body)) done = true
          else {
            pages += body
            // short page => last page (approximate: count JSON objects)
            val n = body.count(_ == '{')
            if (n < pageSize) done = true else offset += pageSize
          }
        }
      case Cursor(param, nextCursor) =>
        var cursor: Option[String] = Some("")
        while (cursor.isDefined && pages.size < maxPages) {
          val params = cursor.filter(_.nonEmpty).map(c => Map(param -> c)).getOrElse(Map.empty)
          val body = callOnce(url, params).body
          if (isEmpty(body)) cursor = None
          else { pages += body; cursor = nextCursor(body) }
        }
      case LinkHeader(limitParam, limit) =>
        // first request carries the page-size param; subsequent requests hit
        // the rel="next" URL verbatim (it embeds its own query string)
        var next: Option[String] = Some(url)
        var first = true
        while (next.isDefined && pages.size < maxPages) {
          val params = if (first) Map(limitParam -> limit.toString) else Map.empty[String, String]
          val resp = callOnce(next.get, params)
          if (!isEmpty(resp.body)) pages += resp.body
          next = resp.headers.collectFirst {
            case (k, v) if k.equalsIgnoreCase("link") => v
          }.flatMap(parseNextLink)
          first = false
        }
    }
    pages.toSeq
  }

  /**
   * Pages -> DataFrame. `recordPath` drills into a wrapper object (the
   * reference's response record-path), e.g. Some("data") for
   * {"data": [...]} or a dotted path Some("meta.results") for nested
   * wrappers (struct traversal is native Catalyst column resolution).
   * Parsing happens distributed via spark.read.json.
   */
  def toDataFrame(spark: SparkSession, pages: Seq[String],
                  recordPath: Option[String] = None): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(pages)
    val raw = spark.read.json(ds)
    recordPath match {
      case Some(path) =>
        val exploded = raw.select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col(path)).as("_rec"))
        exploded.select("_rec.*")
      case None =>
        if (pages.exists(_.trim.startsWith("[")))
          raw // json array pages already expand to rows
        else raw
    }
  }

  /** Full pipeline: fetch + parallelize + parse. */
  def read(spark: SparkSession, url: String, pagination: Pagination, fetch: Fetch,
           recordPath: Option[String] = None,
           baseParams: Map[String, String] = Map.empty,
           retry: RetryConfig = RetryConfig(),
           rateLimit: RateLimit = RateLimit()): DataFrame =
    toDataFrame(spark,
      fetchPages(url, pagination, fetch, baseParams, retry = retry, rateLimit = rateLimit),
      recordPath)

  /** Full pipeline over a header-aware transport (required for LinkHeader). */
  def readWithHeaders(spark: SparkSession, url: String, pagination: Pagination,
                      fetch: FetchResponse, recordPath: Option[String] = None,
                      baseParams: Map[String, String] = Map.empty,
                      retry: RetryConfig = RetryConfig(),
                      rateLimit: RateLimit = RateLimit()): DataFrame =
    toDataFrame(spark,
      fetchPagesWithHeaders(url, pagination, fetch, baseParams,
        retry = retry, rateLimit = rateLimit),
      recordPath)
}
