package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** The concrete HTTP page fetcher for [[PacedExtractor]] — the runnable
  * analog of the reference's aiohttp client (finnoio/jobhouse
  * src/extract/hh_api.py:74-127: session with `Authorization: Bearer`,
  * paged GET with `page`/`per_page` params, 429 → back off and retry the
  * same page, `items` + `pages` response contract) on `java.net.http`,
  * which ships with the JDK — no new dependency.
  *
  * Division of labor is unchanged from the injected-function seam this
  * class plugs into: pacing, backoff bounds, 401-refresh retries, page
  * cursoring and atomic landing all live in [[PacedExtractor.run]] /
  * [[PacedExtractor.runIncremental]]; this class ONLY translates one
  * page number into one HTTP round-trip and maps the status line onto
  * the [[PacedExtractor.Response]] ADT:
  *
  *   - 200 → [[PacedExtractor.Fetched]]: each element of the body's
  *     `items` array becomes one staging JSONL line in the bronze
  *     contract (`posting_id`, `raw_content` = the item re-serialized
  *     verbatim, `source`, `extracted_at`) — the reference's
  *     RawJobPosting mapping (hh_api.py:161-171); `hasMore` =
  *     `page + 1 < pages` (hh_api.py:141-148 fans out `range(pages)`).
  *   - 429 → [[PacedExtractor.Backoff]] (hh_api.py:113-116).
  *   - 401 → [[PacedExtractor.Unauthorized]] — run() invalidates the
  *     [[PacedExtractor.TokenProvider]] and retries; the NEXT call here
  *     picks up the refreshed credential via `tokens.current()`.
  *   - anything else → loud failure with the body head (hh_api.py:131
  *     raises on unexpected errors rather than skipping a page).
  *
  * The timestamp source is injectable so specs land deterministic
  * `extracted_at` values; production uses the real clock.
  */
final class HttpFetcher(
    baseUrl: String,
    source: String,
    params: Map[String, String] = Map.empty,
    perPage: Int = 100,
    idField: String = "id",
    tokens: Option[PacedExtractor.TokenProvider] = None,
    requestTimeout: Duration = Duration.ofSeconds(30),
    nowIso: () => String = () => java.time.Instant.now().toString,
    client: HttpClient =
      HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()) {

  private val mapper = new ObjectMapper()

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")

  private def url(page: Int, extra: Map[String, String]): String = {
    val all = params ++ extra ++
      Map("page" -> page.toString, "per_page" -> perPage.toString)
    val qs = all.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val sep = if (baseUrl.contains("?")) "&" else "?"
    s"$baseUrl$sep$qs"
  }

  /** The `fetch` argument for [[PacedExtractor.run]]. */
  def fetch(page: Int): PacedExtractor.Response = fetchPage(page, Map.empty)

  /** The `fetch` argument for [[PacedExtractor.runIncremental]]: the
    * watermark rides as the API's `date_from` param (the incremental
    * bound the reference's daily pull re-queries from).
    */
  def fetchIncremental(since: Option[String], page: Int): PacedExtractor.Response =
    fetchPage(page, since.map("date_from" -> _).toMap)

  /** Stage-1 fetch for [[PacedExtractor.runListDetail]]: the same paged
    * GET, but each returned line is just the item's raw id — the detail
    * stage re-fetches the full document per id (the reference's
    * fetch_postings collects the vacancy-ID set before any detail GET,
    * hh_api.py:205-209).
    */
  def fetchIds(page: Int): PacedExtractor.Response =
    fetchPage(page, Map.empty, idsOnly = true)

  /** Stage-2 fetch for [[PacedExtractor.runListDetail]]: GET
    * `{basePath}/{id}` (the reference's `_fetch_single_vacancy`,
    * hh_api.py:177-203 — no PAGING params, same auth header and
    * 429/401 mapping), the whole response document as ONE staging line
    * in the bronze contract. The constructor `params` (API keys,
    * locale — per-request config, not paging) ride every detail GET
    * too, and a baseUrl that already carries a query string keeps it
    * AFTER the appended id path segment (r17 review — the naive
    * `$baseUrl/$id` dropped params and spliced the id into the query).
    * The body is re-serialized through the JSON parser, so a non-JSON
    * 200 fails loudly instead of landing garbage.
    */
  def fetchDetail(id: String): PacedExtractor.Response = {
    val (basePath, baseQs) = baseUrl.indexOf('?') match {
      case -1 => (baseUrl, None)
      case i => (baseUrl.substring(0, i), Some(baseUrl.substring(i + 1)))
    }
    val qs = (params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" } ++ baseQs).mkString("&")
    val detailUrl = s"$basePath/${enc(id)}" + (if (qs.isEmpty) "" else s"?$qs")
    val b = HttpRequest.newBuilder(URI.create(detailUrl))
      .timeout(requestTimeout).GET()
    tokens.foreach(t => b.header("Authorization", s"Bearer ${t.current()}"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 429 => PacedExtractor.Backoff
      case 401 => PacedExtractor.Unauthorized
      case 200 =>
        val o = mapper.createObjectNode()
        o.put("posting_id", id)
        o.put("raw_content", mapper.writeValueAsString(mapper.readTree(resp.body())))
        o.put("source", source)
        o.put("extracted_at", nowIso())
        PacedExtractor.Fetched(Seq(mapper.writeValueAsString(o)), hasMore = false)
      case other =>
        throw new IllegalStateException(
          s"HTTP $other from $detailUrl: ${resp.body().take(500)}")
    }
  }

  private def fetchPage(page: Int, extra: Map[String, String],
      idsOnly: Boolean = false): PacedExtractor.Response = {
    val b = HttpRequest.newBuilder(URI.create(url(page, extra)))
      .timeout(requestTimeout).GET()
    tokens.foreach(t => b.header("Authorization", s"Bearer ${t.current()}"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 429 => PacedExtractor.Backoff
      case 401 => PacedExtractor.Unauthorized
      case 200 =>
        val root = mapper.readTree(resp.body())
        val itemsNode = root.get("items")
        val items =
          if (itemsNode != null && itemsNode.isArray)
            (0 until itemsNode.size()).map(itemsNode.get)
          else Seq.empty
        val pages =
          if (root.hasNonNull("pages")) root.get("pages").asInt() else page + 1
        val at = nowIso()
        val lines = items.map { item =>
          // a missing id is a response-shape surprise: raise like any
          // other (the class contract, mirroring hh_api.py:131's strict
          // parse) - a silently-empty posting_id would corrupt bronze
          // partition identity downstream
          val id = Option(item.get(idField)).filterNot(_.isNull).map(_.asText())
            .getOrElse(throw new IllegalStateException(
              s"item missing id field '$idField' on $baseUrl page $page: " +
                mapper.writeValueAsString(item).take(200)))
          if (idsOnly) id
          else {
            val o = mapper.createObjectNode()
            o.put("posting_id", id)
            o.put("raw_content", mapper.writeValueAsString(item))
            o.put("source", source)
            o.put("extracted_at", at)
            mapper.writeValueAsString(o)
          }
        }
        PacedExtractor.Fetched(lines, hasMore = page + 1 < pages)
      case other =>
        throw new IllegalStateException(
          s"HTTP $other from $baseUrl page $page: ${resp.body().take(500)}")
    }
  }
}
