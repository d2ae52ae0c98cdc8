package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500) record reader — the container format web-scale
  * training corpora arrive in (Common Crawl ships WARC/1.0, one gzip
  * member per record). Pure-JVM byte parser in the house style of
  * `ZipIngest`/`Multimodal`: fixed grammar, bounds-checked reads, and
  * MALFORMED RECORDS QUARANTINE with a reason + forward RESYNC to the
  * next record magic instead of failing the whole file — a
  * half-damaged crawl segment should still yield its intact records.
  *
  * Grammar (public spec): `WARC/1.0\r\n` + header lines (`Name: value`,
  * CRLF-terminated) + CRLF + Content-Length payload bytes + CRLF CRLF.
  * For `response` records the payload is an HTTP/1.x message; `http*`
  * fields split its status line and headers from the body.
  *
  * Scale shape: one ARCHIVE is inherently a sequential scan (records
  * are length-delimited, gzip members are chained) — the distributable
  * unit is the FILE, exactly how crawls ship (thousands of ~1 GB
  * segment files). `toDataFrame` maps Spark's `binaryFile` source over
  * the segment set: one task per segment, no shuffle; downstream text
  * extraction starts from the returned frame. Driver memory never
  * holds more than one segment per task.
  */
object WarcIngest {

  final case class WarcRecord(
      offset: Long,            // byte offset of the record's magic
      warcType: String,
      targetUri: String,       // "" when absent (warcinfo, request…)
      warcDate: String,
      contentType: String,
      httpStatus: Int,         // -1 when payload is not HTTP
      httpContentType: String, // "" when not HTTP / absent
      body: Array[Byte])       // HTTP body for responses, else payload

  private val Magic = "WARC/1.0".getBytes(StandardCharsets.US_ASCII)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Inflate EVERY gzip member of a multi-member stream (Common Crawl
    * writes one member per record; `GZIPInputStream` handles member
    * chaining natively when given the whole stream).
    */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte],
      from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse a header block [from, to) of CRLF-terminated `Name: value`
    * lines into a case-insensitive-keyed map; malformed line → Left.
    */
  private def parseHeaders(bytes: Array[Byte], from: Int,
      to: Int): Either[String, Map[String, String]] = {
    val text = new String(bytes, from, to - from, StandardCharsets.US_ASCII)
    val out = Map.newBuilder[String, String]
    for (line <- text.split("\r\n") if line.nonEmpty) {
      val i = line.indexOf(':')
      if (i <= 0) return Left(s"malformed header line '${line.take(40)}'")
      out += (line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim)
    }
    Right(out.result())
  }

  /** Split an HTTP/1.x payload into (status, content-type, body).
    * Payloads that do not start with `HTTP/` come back unsplit.
    */
  private def splitHttp(payload: Array[Byte])
      : (Int, String, Array[Byte]) = {
    val probe = new String(payload, 0, math.min(5, payload.length),
      StandardCharsets.US_ASCII)
    if (probe != "HTTP/") return (-1, "", payload)
    val sep = indexOf(payload, "\r\n\r\n".getBytes(StandardCharsets.US_ASCII), 0)
    if (sep < 0) return (-1, "", payload)
    val head = new String(payload, 0, sep, StandardCharsets.US_ASCII)
    val lines = head.split("\r\n")
    val status = lines.head.split(" ") match {
      case parts if parts.length >= 2 && parts(1).forall(_.isDigit) =>
        parts(1).toInt
      case _ => -1
    }
    val ct = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  /** Parse one decompressed WARC stream. Returns intact records and
    * (offset, reason) quarantines; a structurally broken record resyncs
    * by scanning forward to the next `WARC/1.0` magic, so damage is
    * contained to the record that carries it.
    */
  def records(raw: Array[Byte])
      : (Seq[WarcRecord], Seq[(Long, String)]) = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    val recs = Vector.newBuilder[WarcRecord]
    val quarantined = Vector.newBuilder[(Long, String)]
    var pos = indexOf(bytes, Magic, 0)
    if (pos < 0 && bytes.nonEmpty)
      quarantined += (0L -> "no WARC/1.0 magic in stream")
    while (pos >= 0) {
      val next = parseRecord(bytes, pos) match {
        case Right((rec, end)) => recs += rec; end
        case Left(reason) =>
          quarantined += (pos.toLong -> reason)
          pos + Magic.length // resync: scan past this magic
      }
      pos = indexOf(bytes, Magic, next)
    }
    (recs.result(), quarantined.result())
  }

  /** One record at `pos` (which points at the magic) → (record, end
    * offset just past the trailing CRLF CRLF).
    */
  private def parseRecord(bytes: Array[Byte], pos: Int)
      : Either[String, (WarcRecord, Int)] = {
    val headStart = pos + Magic.length + 2 // past magic CRLF
    if (headStart > bytes.length) return Left("truncated after magic")
    val headEnd = indexOf(bytes,
      "\r\n\r\n".getBytes(StandardCharsets.US_ASCII), pos)
    if (headEnd < 0) return Left("record header block unterminated")
    parseHeaders(bytes, headStart, headEnd + 2).flatMap { h =>
      h.get("content-length").map(_.trim) match {
        case None => Left("missing Content-Length")
        case Some(cl) if !cl.forall(_.isDigit) =>
          Left(s"non-numeric Content-Length '${cl.take(20)}'")
        case Some(cl) =>
          val len = cl.toLong
          val bodyStart = headEnd + 4
          if (len > Int.MaxValue || bodyStart + len > bytes.length)
            Left(s"payload overruns stream (len $len)")
          else {
            val payload = java.util.Arrays.copyOfRange(
              bytes, bodyStart, bodyStart + len.toInt)
            val (status, httpCt, body) =
              if (h.getOrElse("warc-type", "") == "response")
                splitHttp(payload)
              else (-1, "", payload)
            Right((WarcRecord(
              pos.toLong,
              h.getOrElse("warc-type", ""),
              h.getOrElse("warc-target-uri", ""),
              h.getOrElse("warc-date", ""),
              h.getOrElse("content-type", ""),
              status, httpCt, body),
              bodyStart + len.toInt + 4)) // past CRLF CRLF
          }
      }
    }
  }

  /** Distribute over a directory of segment files: Spark's `binaryFile`
    * source (one task per file), each task parsing its segment with
    * `records`. Quarantines surface as rows with `warc_type = "_quarantine"`
    * and the reason in `target_uri`, keeping the result a single frame
    * a pipeline can split with one filter.
    */
  private def flattenSegments(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val (recs, quar) = records(content)
        recs.map(r => (path, r.offset, r.warcType, r.targetUri, r.warcDate,
          r.contentType, r.httpStatus, r.httpContentType, r.body)) ++
          quar.map { case (off, reason) =>
            (path, off, "_quarantine", reason, "", "", -1, "",
              Array.empty[Byte])
          }
      }
      .toDF("path", "offset", "warc_type", "target_uri", "warc_date",
        "content_type", "http_status", "http_content_type", "body")
  }

  def toDataFrame(spark: SparkSession, pathGlob: String): DataFrame =
    flattenSegments(spark.read.format("binaryFile").load(pathGlob))

  /** The PRODUCTION ingest shape: watch a landing directory for new
    * crawl segments and parse each exactly once — Structured
    * Streaming's file source gives at-most-once per segment via its
    * processed-files log, so re-delivered or slowly-copied segments
    * never double-ingest (the batch idempotence gate O2, applied to a
    * stream). Same output frame as `toDataFrame`; zero streaming state
    * beyond the source's file log.
    */
  def streamDataFrame(spark: SparkSession, pathGlob: String): DataFrame = {
    // The streaming file source demands an explicit schema even for a
    // fixed-schema format; this is binaryFile's published one.
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    flattenSegments(
      spark.readStream.format("binaryFile").schema(schema).load(pathGlob))
  }
}
