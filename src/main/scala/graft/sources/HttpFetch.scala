package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** HTTP ingest + snapshot keying (SURVEY.md §2.1 S1/S2): GET a URL,
  * capture the `Last-Modified` header (RFC 1123), reformat it as the
  * RFC 3339 snapshot timestamp that keys the whole versioned store —
  * `fetch.go:22,33-48,180-187`.
  *
  * Driver-side by nature (one archive per snapshot); the distributed
  * engine takes over after extraction.
  */
object HttpFetch {

  final case class Fetched(body: Array[Byte], lastModified: Option[String])

  /** RFC 1123 `Last-Modified` → compact RFC 3339 UTC (path-safe: no
    * colons, so the same key works on local/HDFS paths and object
    * stores alike).
    */
  def snapshotTs(lastModified: String): String =
    ZonedDateTime.parse(lastModified, DateTimeFormatter.RFC_1123_DATE_TIME)
      .withZoneSameInstant(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))

  /** GET with response-header capture. Non-2xx → error, like the
    * reference's wrapped status failures.
    */
  def get(url: String): Fetched = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"GET $url: status ${resp.statusCode()}")
    Fetched(resp.body(), resp.headers().firstValue("Last-Modified")
      .map[Option[String]](Some(_)).orElse(None))
  }
}
