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

  /** Pagination modes (config.py:1121-1220). */
  sealed trait Pagination
  /** page=1,2,3... until an empty page or maxPages. */
  final case class PageNumber(param: String = "page", start: Int = 1) extends Pagination
  /** offset += pageSize until short page. */
  final case class Offset(param: String = "offset", pageSize: Int = 100) extends Pagination
  /** follow a cursor extracted from the previous response. */
  final case class Cursor(param: String = "cursor",
                          nextCursor: String => Option[String]) extends Pagination

  final case class RetryConfig(maxRetries: Int = 3, backoffMs: Long = 200,
                               backoffMultiplier: Double = 2.0)
  final case class RateLimit(minIntervalMs: Long = 0)

  /** One page fetch: url with query params -> raw response body. */
  type Fetch = (String, Map[String, String]) => String

  /**
   * Fetch all pages; returns the raw page bodies. Retries each page with
   * exponential backoff; enforces a minimum interval between calls.
   */
  def fetchPages(url: String, pagination: Pagination, fetch: Fetch,
                 baseParams: Map[String, String] = Map.empty,
                 maxPages: Int = 1000,
                 retry: RetryConfig = RetryConfig(),
                 rateLimit: RateLimit = RateLimit(),
                 isEmpty: String => Boolean = _.trim.matches("\\[\\s*\\]|\\{\\s*\\}|")): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var lastCall = 0L

    def callOnce(params: Map[String, String]): String = {
      var attempt = 0
      var backoff = retry.backoffMs
      while (true) {
        val wait = rateLimit.minIntervalMs - (System.currentTimeMillis() - lastCall)
        if (wait > 0) Thread.sleep(wait)
        try {
          val body = fetch(url, baseParams ++ params)
          lastCall = System.currentTimeMillis()
          return body
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
          val body = callOnce(Map(param -> page.toString))
          if (isEmpty(body)) done = true
          else { pages += body; page += 1 }
        }
      case Offset(param, pageSize) =>
        var offset = 0
        var done = false
        while (!done && pages.size < maxPages) {
          val body = callOnce(Map(param -> offset.toString, "limit" -> pageSize.toString))
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
          val body = callOnce(params)
          if (isEmpty(body)) cursor = None
          else { pages += body; cursor = nextCursor(body) }
        }
    }
    pages.toSeq
  }

  /**
   * Pages -> DataFrame. `recordPath` drills into a wrapper object (the
   * reference's response record-path), e.g. Some("data") for
   * {"data": [...]}. Parsing happens distributed via spark.read.json.
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
}
