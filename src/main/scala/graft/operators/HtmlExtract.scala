package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}
import graft.sources.WarcIngest

/** HTML → clean-text extraction — the missing link between `WarcIngest`'s
  * HTTP payloads and every downstream text/dedup/curation operator (the
  * reference's whole job is fetch→convert→extract, `fetch.go:26-161`;
  * this closes the extract leg for the web format a crawl corpus
  * actually arrives in).
  *
  * The extraction spec is a FIXED, deterministic regexp chain kept inside
  * the RE2 ∩ java.util.regex common syntax (inline `(?s)` flag,
  * non-greedy `.*?`, bracket classes; NO backreferences — RE2 has none),
  * so the DuckDB oracle executes the IDENTICAL chain and the driver
  * hash-compares full extracted text:
  *   1. strip `<script…>…</script>`, `<style…>…</style>`, `<!-- … -->`
  *   2. strip remaining tags `<[^>]*>` (each → one space, so text from
  *      adjacent blocks never word-joins)
  *   3. decode the HTML 4 core entities (`&lt; &gt; &quot; &#39; &nbsp;`,
  *      and `&amp;` LAST so escaped ampersands round-trip)
  *   4. collapse whitespace runs, trim.
  * Malformed markup degrades instead of failing: an unclosed script/style
  * swallows to end-of-document (the browser behavior), an unclosed tag is
  * stripped to its `>`-less tail by the whitespace pass, and a bare `<`
  * with no closing `>` survives as text — no exception path exists.
  *
  * Scale shape: every operator here is an embarrassingly parallel scan —
  * regexp projections inside whole-stage codegen, explode for block
  * segmentation, no shuffle anywhere. At 100 TB this is a pure map over
  * input splits, exactly like the rest of `TextAnalysis`.
  *
  * FIXTURE: the corpus has no HTML column, so each operator wraps
  * `documents.text` in a deterministic page template (title/style/script/
  * nav/h1/p/share/comment/footer — the boilerplate shapes a real page
  * carries). The template is rendered from ONE shared token list by three
  * renderers — Scala (WARC fixture bytes), Spark `Column`, DuckDB SQL —
  * so the engines can never drift; `HtmlWarcSpec` pins Scala==Spark and
  * the driver's oracle pins Spark==DuckDB.
  */
object HtmlExtract {

  // ------------------------------------------------------------ template

  private sealed trait Tok
  private case class L(s: String) extends Tok   // literal HTML
  private case object Id extends Tok            // doc_id as decimal string
  private case object Esc extends Tok           // HTML-escaped text

  /** One page: head with style, a script, a nav block, heading, the
    * document body paragraph, a share block, a crawler comment, a footer.
    * Single-line (no newlines) so whitespace assertions stay readable.
    */
  private val WrapTokens: Seq[Tok] = Seq(
    L("<html><head><title>Doc "), Id,
    L("</title><style type=\"text/css\">p{margin:0;}</style></head>" +
      "<body><script type=\"text/javascript\">var docId="), Id,
    L(";track(\"pv\");</script>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/docs\">Docs</a>" +
      " <a href=\"/about\">About</a></div>" +
      "<h1>Document "), Id,
    L("</h1><p>"), Esc,
    L("</p><div class=\"share\"><a href=\"/share\">Share</a>" +
      " <a href=\"/print\">Print</a></div>" +
      "<!-- seg:"), Id,
    L(" --><div class=\"footer\"><a href=\"/terms\">Terms</a>" +
      " <a href=\"/privacy\">Privacy</a>" +
      " <a href=\"https://ads.tracker.io/px\">Ads</a>" +
      " <a href=\"mailto:info@example.nz\">Contact</a></div></body></html>"))

  /** Escape order & < > (ampersand FIRST); decode reverses with &amp;
    * LAST — the pair round-trips any input text exactly.
    */
  private val escapePairs = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")

  /** Scala renderer — the byte-exact page the WARC fixture serves. */
  private[graft] def wrapScala(docId: Long, text: String): String = {
    val esc = escapePairs.foldLeft(text) { case (s, (f, t)) => s.replace(f, t) }
    WrapTokens.map {
      case L(s) => s
      case Id   => docId.toString
      case Esc  => esc
    }.mkString
  }

  /** Spark renderer — same page as a codegen'd concat projection. */
  private[graft] def wrapCol(docId: Column, text: Column): Column = {
    val esc = escapePairs.foldLeft(text) { case (c, (f, t)) =>
      regexp_replace(c, f, t) // literal-safe: no metachars in & < >
    }
    concat(WrapTokens.map {
      case L(s) => lit(s)
      case Id   => docId.cast("string")
      case Esc  => esc
    }: _*)
  }

  private def sqlQ(s: String): String = s.replace("'", "''")

  /** DuckDB renderer — same page in oracle SQL. */
  private[graft] def wrapSql(idExpr: String, textExpr: String): String = {
    val esc = escapePairs.foldLeft(textExpr) { case (e, (f, t)) =>
      s"replace($e, '${sqlQ(f)}', '${sqlQ(t)}')"
    }
    WrapTokens.map {
      case L(s) => s"'${sqlQ(s)}'"
      case Id   => s"CAST($idExpr AS VARCHAR)"
      case Esc  => esc
    }.mkString("concat(", ", ", ")")
  }

  // ----------------------------------------------------- extraction chain

  /** Strip patterns, applied in order, each match → one space. */
  /** `\z` (end of TEXT, identical in Java and RE2 — `$` is not: Java's
    * matches before a trailing newline) makes an unclosed script/style/
    * comment swallow to end-of-document, the browser behavior.
    */
  private val StripPats = Seq(
    "(?s)<script[^>]*>.*?(</script>|\\z)",
    "(?s)<style[^>]*>.*?(</style>|\\z)",
    "(?s)<!--.*?(-->|\\z)",
    "<[^>]*>")

  /** Entity decode, `&amp;` last (see scaladoc). All patterns are
    * metachar-free, so regexp_replace is a literal replace.
    */
  private val EntityPairs = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private val ChainPairs: Seq[(String, String)] =
    StripPats.map(_ -> " ") ++ EntityPairs :+ ("\\s+" -> " ")

  /** The full chain as one Spark projection (whole-stage codegen). */
  private[graft] def cleanHtmlCol(html: Column): Column =
    trim(ChainPairs.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    })

  /** The identical chain in DuckDB SQL ('g' flag = Java's default-global). */
  private[graft] def cleanHtmlSql(e: String): String = {
    val folded = ChainPairs.foldLeft(e) { case (s, (p, r)) =>
      s"regexp_replace($s, '${sqlQ(p)}', '${sqlQ(r)}', 'g')"
    }
    s"trim($folded)"
  }

  // ------------------------------------------------- text_html_extract

  private val LinkPat  = "<a "
  private val BlockPat = "(?s)<(?:p|h1|div)[^>]*>.*?</(?:p|h1|div)>"

  /** Frame-in/frame-out form over any `(doc_id, html)` frame — a pure
    * stateless projection, streaming-safe like `redactColumns`.
    */
  def extractColumns(df: DataFrame): DataFrame =
    extractWith(df, cleanHtmlCol(col("html")))

  private def extractWith(df: DataFrame, clean: Column): DataFrame = {
    df.select(
      col("doc_id"),
      length(col("html")).cast("long").as("n_chars_html"),
      size(expr(s"regexp_extract_all(html, '$LinkPat', 0)"))
        .cast("long").as("n_links"),
      size(expr("regexp_extract_all(html, '<script', 0)"))
        .cast("long").as("n_scripts"),
      size(regexp_extract_all(col("html"), lit(BlockPat), lit(0)))
        .cast("long").as("n_blocks"),
      clean.as("text_clean"),
      size(split(clean, " ")).cast("long").as("n_words"))
  }

  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    extractColumns(
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          wrapCol(col("doc_id"), col("text")).as("html")))

  /** The serving-path variant: clean text via the single-pass codegen'd
    * `HtmlClean` expression instead of the eleven-stage regexp chain —
    * one read and one write per byte versus eleven intermediate string
    * copies per page (see `HtmlClean`'s scaladoc, incl. the two
    * documented edge divergences). Rows-only; its `_check` twin runs
    * THIS computation against the DuckDB CHAIN oracle, so driver-green
    * proves expression == chain across the corpus.
    */
  def htmlExtractFast(spark: SparkSession, dir: String): DataFrame =
    extractWith(
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          wrapCol(col("doc_id"), col("text")).as("html")),
      org.apache.spark.sql.graft.HtmlClean(col("html")))

  val htmlExtractSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, ${wrapSql("doc_id", "text")} AS html FROM documents
       |)
       |SELECT doc_id,
       |       CAST(length(html) AS BIGINT) AS n_chars_html,
       |       CAST(len(regexp_extract_all(html, '$LinkPat')) AS BIGINT) AS n_links,
       |       CAST(len(regexp_extract_all(html, '<script')) AS BIGINT) AS n_scripts,
       |       CAST(len(regexp_extract_all(html, '${sqlQ(BlockPat)}')) AS BIGINT) AS n_blocks,
       |       ${cleanHtmlSql("html")} AS text_clean,
       |       CAST(len(string_split(${cleanHtmlSql("html")}, ' ')) AS BIGINT) AS n_words
       |FROM h""".stripMargin

  // --------------------------------------------- text_html_boilerplate

  /** Block segmentation + link-density boilerplate scoring (the
    * Boilerpipe/jusText signal, reduced to its deterministic core): split
    * the page into block-level elements (`p`/`h1`/`div`; non-nested —
    * RE2 has no recursion, and real extractors flatten anyway), score
    * each block by links-per-word, and flag link-dominated blocks
    * (density ≥ 0.5) as boilerplate. Downstream, `text_clean` of
    * non-boilerplate blocks is the article text; the nav/share/footer
    * chrome is exactly what this drops.
    *
    * One explode per page — output is bounded by block count, no shuffle.
    */
  def htmlBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val html = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        wrapCol(col("doc_id"), col("text")).as("html"))
    val blocks = html.select(
      col("doc_id"),
      explode(regexp_extract_all(col("html"), lit(BlockPat), lit(0)))
        .as("block"))
    val clean = cleanHtmlCol(col("block"))
    blocks.select(
      col("doc_id"),
      clean.as("block_text"),
      size(expr(s"regexp_extract_all(block, '$LinkPat', 0)"))
        .cast("long").as("n_links"),
      size(split(clean, " ")).cast("long").as("n_words"))
      .withColumn("link_density",
        round(col("n_links").cast("double") / col("n_words"), 6))
      .withColumn("is_boilerplate", col("link_density") >= 0.5)
  }

  val htmlBoilerplateSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, ${wrapSql("doc_id", "text")} AS html FROM documents
       |), b AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(html, '${sqlQ(BlockPat)}')) AS block
       |  FROM h
       |), m AS (
       |  SELECT doc_id,
       |         ${cleanHtmlSql("block")} AS block_text,
       |         CAST(len(regexp_extract_all(block, '$LinkPat')) AS BIGINT) AS n_links,
       |         CAST(len(string_split(${cleanHtmlSql("block")}, ' ')) AS BIGINT) AS n_words
       |  FROM b)
       |SELECT doc_id, block_text, n_links, n_words,
       |       round(CAST(n_links AS DOUBLE) / n_words, 6) AS link_density,
       |       round(CAST(n_links AS DOUBLE) / n_words, 6) >= 0.5 AS is_boilerplate
       |FROM m""".stripMargin

  // -------------------------------------------------- docs_from_warc

  /** Synthesize the WARC fixture once per scale dir: each executor task
    * writes its partition's documents as one gzip-member-per-record
    * `.warc.gz` segment (the Common Crawl layout) via temp-file + rename,
    * and a `_SUCCESS` marker makes re-runs (Bench's best-of-3) a no-op —
    * the O2 idempotence shape. Fixture synthesis only; the OPERATOR is
    * everything after the landing dir.
    */
  private def synthDir(dir: String): String = {
    // key includes a template probe so a template edit can never serve
    // stale pre-edit segments through the _SUCCESS idempotence gate
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "\u0000" + wrapScala(0L, "probe")).getBytes(UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_warc_fixture_$key"
  }

  private[graft] def warcRecord(docId: Long, text: String): Array[Byte] = {
    val html = wrapScala(docId, text).getBytes(UTF_8)
    val httpHead =
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        .getBytes(UTF_8)
    val payloadLen = httpHead.length + html.length
    val warcHead =
      (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: https://docs.example.nz/doc/$docId\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: $payloadLen\r\n\r\n").getBytes(UTF_8)
    warcHead ++ httpHead ++ html ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private[graft] def synthWarcSegments(spark: SparkSession,
      dir: String): String = {
    val out = synthDir(dir)
    val marker = new java.io.File(out, "_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(out).mkdirs()
      import spark.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.get().partitionId()
            val tmp = new java.io.File(out, s".part-$pid.tmp")
            val dst = new java.io.File(out, f"part-$pid%05d.warc.gz")
            val fos = new java.io.FileOutputStream(tmp)
            // close-shield: gz.close() releases the Deflater's native
            // buffers (finish() alone leaks them until finalization) but
            // must not close the shared file stream between members
            val shield = new java.io.FilterOutputStream(fos) {
              override def write(b: Array[Byte], off: Int, len: Int): Unit =
                out.write(b, off, len)
              override def close(): Unit = flush()
            }
            try it.foreach { case (id, text) =>
              // one gzip member per record (Common Crawl convention)
              val gz = new java.util.zip.GZIPOutputStream(shield)
              gz.write(warcRecord(id, text))
              gz.close()
            } finally fos.close()
            // atomic publish; a silent rename failure would let _SUCCESS
            // gate a missing segment, so fail the task instead
            if (!tmp.renameTo(dst))
              throw new java.io.IOException(s"rename failed: $tmp -> $dst")
            ()
          }
        }
      marker.createNewFile()
    }
    out
  }

  /** End-to-end web ingest: WARC segments → record parse → HTTP split →
    * HTML extraction → per-doc text identity. FULLY oracled: the fixture
    * pages are the shared template, so DuckDB recomputes the expected
    * clean text (and its md5) straight from `documents` — a hash match
    * proves the gzip-member chain, the WARC grammar, the HTTP split, the
    * UTF-8 body decode, and the extraction chain all round-tripped
    * byte-exactly. The operator side is `binaryFile` scan (one task per
    * segment) → flatMap parse → codegen'd projection; no shuffle.
    */
  /** WARC record frame → per-doc extraction frame. A stateless
    * projection, so it composes UNCHANGED onto `WarcIngest.toDataFrame`
    * (batch) and `WarcIngest.streamDataFrame` (the production
    * landing-dir stream) — batch/stream parity pinned by
    * `StreamingFileSpec`.
    */
  def fromWarcRecords(records: DataFrame): DataFrame = {
    val clean = cleanHtmlCol(col("html"))
    records
      .where(col("warc_type") === "response" && col("http_status") === 200)
      // charset-aware decode (BOM → Content-Type header → <meta charset>
      // sniff → UTF-8-validate-else-windows-1252), replacing the
      // UTF-8-only cast that served windows-1252/latin-1 crawl pages as
      // mojibake — the metadata-driven typed-decode bar the reference's
      // own ingest sets (AccessExporter reads column types before row
      // bytes; fetch.go:118 trusts the transport's declared encoding).
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("http_status"),
        org.apache.spark.sql.graft.HttpTextDecode(
          col("body"), col("http_content_type")).as("dec"))
      .select(
        col("doc_id"),
        col("http_status"),
        col("dec.text").as("html"),
        col("dec.charset").as("charset"))
      .select(
        col("doc_id"),
        col("http_status"),
        col("charset"),
        size(expr(s"regexp_extract_all(html, '$LinkPat', 0)"))
          .cast("long").as("n_links"),
        size(split(clean, " ")).cast("long").as("n_words"),
        md5(clean).as("text_md5"))
  }

  def docsFromWarc(spark: SparkSession, dir: String): DataFrame =
    fromWarcRecords(
      WarcIngest.toDataFrame(spark, synthWarcSegments(spark, dir)))

  val docsFromWarcSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, ${wrapSql("doc_id", "text")} AS html FROM documents
       |)
       |SELECT doc_id,
       |       CAST(200 AS INTEGER) AS http_status,
       |       -- the fixture's HTTP header declares charset=utf-8, so the
       |       -- sniff's tier-2 answer is pinned here; non-UTF-8 tiers are
       |       -- golden-byte-tested in HtmlWarcSpec
       |       'utf-8' AS charset,
       |       CAST(len(regexp_extract_all(html, '$LinkPat')) AS BIGINT) AS n_links,
       |       CAST(len(string_split(${cleanHtmlSql("html")}, ' ')) AS BIGINT) AS n_words,
       |       md5(${cleanHtmlSql("html")}) AS text_md5
       |FROM h""".stripMargin

  // -------------------------------------------------- text_html_links

  /** Outlink extraction — the web-graph edge builder (the input the
    * `Graph` family consumes for page/domain-rank at crawl scale): pull
    * every `<a href>`, resolve root-relative hrefs against the page
    * origin, pass absolute http(s) through, drop non-web schemes
    * (`mailto:` here), and tag each target with its registered domain
    * via `Domains.withDomain` — the operator-composition story (extract
    * → domain → graph) the modules were shaped for. One explode per
    * page, bounded by links/page; no shuffle.
    */
  private val HrefPat = "<a href=\"([^\"]*)\""
  private val Origin  = "https://docs.example.nz" // the WARC fixture origin

  def htmlLinks(spark: SparkSession, dir: String): DataFrame = {
    val pages = Tables(spark, dir, "documents")
      .select(col("doc_id"), wrapCol(col("doc_id"), col("text")).as("html"))
    val hrefs = pages.select(col("doc_id"),
      explode(regexp_extract_all(col("html"), lit(HrefPat), lit(1)))
        .as("href"))
    val resolved = hrefs
      .withColumn("url",
        when(col("href").startsWith("http://") ||
             col("href").startsWith("https://"), col("href"))
          .when(col("href").startsWith("/"), concat(lit(Origin), col("href")))
          .otherwise(lit(null)))
      .where(col("url").isNotNull)
    Domains.withDomain(resolved)
      .select(col("doc_id"), col("href"), col("url").as("link_url"),
        col("registered_domain").as("link_domain"),
        (col("registered_domain") =!= "example.nz").as("is_external"))
  }

  val htmlLinksSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, ${wrapSql("doc_id", "text")} AS html FROM documents
       |), l AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
       |  FROM h
       |), r AS (
       |  SELECT doc_id, href,
       |         CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
       |              WHEN href LIKE '/%' THEN concat('$Origin', href)
       |              ELSE NULL END AS url
       |  FROM l
       |), d AS (
       |  SELECT doc_id, href, url,
       |         ${Domains.domainSelectSql}
       |  FROM r WHERE url IS NOT NULL)
       |SELECT doc_id, href, url AS link_url,
       |       registered_domain AS link_domain,
       |       registered_domain <> 'example.nz' AS is_external
       |FROM d""".stripMargin

  // ------------------------------------------------ graph_domain_links

  /** Domain-level link graph — the edge list crawl-scale PageRank and
    * spam analysis actually run on (page-level graphs are quadrillions
    * of edges; the domain rollup is the tractable unit). Pages take
    * their synthetic per-doc URL (the `Domains` host table, so eight
    * distinct source hosts), relative hrefs resolve against EACH page's
    * own origin, and both endpoints reduce to registered domains before
    * ONE (src, dst)-keyed aggregation — map-side partials, result
    * bounded by |domains|², never by |links|.
    */
  /** The per-link frame the domain rollups share: (doc_id, src_domain,
    * dst_domain) for every resolved outlink of every page passing
    * `docCond` — the corpus-sized extraction stage, factored so the
    * incremental rank twin can run it over a BATCH predicate only.
    */
  private def resolvedDomainLinks(spark: SparkSession, dir: String,
      docCond: Column): DataFrame = {
    val pages = Domains.withDomain(
        Tables(spark, dir, "documents").where(docCond)
          .select(col("doc_id"), col("text"), Domains.fixtureUrlCol.as("url")))
      .select(col("doc_id"),
        col("registered_domain").as("src_domain"),
        regexp_extract(col("url"), "^([a-z]+://[^/]+)", 1).as("origin"),
        wrapCol(col("doc_id"), col("text")).as("html"))
    val links = pages.select(col("doc_id"), col("src_domain"), col("origin"),
      explode(regexp_extract_all(col("html"), lit(HrefPat), lit(1)))
        .as("href"))
    val resolved = links
      .withColumn("url",
        when(col("href").startsWith("http://") ||
             col("href").startsWith("https://"), col("href"))
          .when(col("href").startsWith("/"), concat(col("origin"), col("href")))
          .otherwise(lit(null)))
      .where(col("url").isNotNull)
    Domains.withDomain(resolved)
      .select(col("doc_id"), col("src_domain"),
        col("registered_domain").as("dst_domain"))
  }

  /** The SERVED domain edge table: outlink extraction + the (src, dst)
    * rollup run ONCE per corpus version and persist (content-addressed,
    * write-once) — a crawl pipeline extracts outlinks once, and every
    * graph op over the domain graph (rank, HITS, components,
    * reciprocity) reads the derived table instead of re-walking the
    * page corpus. Reciprocity's self-join alone re-executed the
    * extraction subtree 2-3× per run before this (no exchange reuse
    * across differing join keys); at sf1 the family's cost was
    * extraction × consumers (BENCH_NOTES r12).
    */
  def domainLinks(spark: SparkSession, dir: String): DataFrame = {
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/documents.parquet", "graft_dlinks")
    if (!store.hasTableSnapshot("domain_links", ts))
      store.writeTableSnapshot(
        resolvedDomainLinks(spark, dir, lit(true))
          .groupBy(col("src_domain"), col("dst_domain"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_pages")),
        "domain_links", ts)
    store.readTableSnapshot(spark, "domain_links", ts)
      .select(col("src_domain"), col("dst_domain"), col("n_links"),
        col("n_pages"))
  }

  val domainLinksSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, text, ${Domains.fixtureUrlSqlExpr} AS url FROM documents
       |), s AS (
       |  SELECT doc_id, text, url,
       |         ${Domains.domainSelectSql}
       |  FROM u
       |), p AS (
       |  SELECT doc_id, registered_domain AS src_domain,
       |         regexp_extract(url, '^([a-z]+://[^/]+)', 1) AS origin,
       |         ${wrapSql("doc_id", "text")} AS html
       |  FROM s
       |), l AS (
       |  SELECT doc_id, src_domain, origin,
       |         unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
       |  FROM p
       |), r AS (
       |  SELECT doc_id, src_domain,
       |         CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
       |              WHEN href LIKE '/%' THEN concat(origin, href)
       |              ELSE NULL END AS url
       |  FROM l
       |), d AS (
       |  SELECT doc_id, src_domain, url,
       |         ${Domains.domainSelectSql}
       |  FROM r WHERE url IS NOT NULL)
       |SELECT src_domain, registered_domain AS dst_domain,
       |       count(*) AS n_links,
       |       count(DISTINCT doc_id) AS n_pages
       |FROM d GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- graph_domain_rank

  /** Domain PageRank — the crawl chain's terminal composition: WARC →
    * extract → outlinks → domain edges → `Graph.pagerankInt` (the
    * integer-exact power-method core, unchanged — it takes ANY (src,
    * dst) frame, string keys included). Rank arithmetic is BIGINT floor
    * division in micro-units, so the DuckDB twin (the shared unrolled
    * CTE chain over the same edge list) agrees BIT-FOR-BIT — the same
    * guarantee `graph_pagerank` carries, now over crawl-derived edges.
    * At 100 TB the domain graph is millions of nodes — exactly the
    * scale the cached-degree/checkpointed core was measured at.
    */
  private val DrIters = 5

  def domainRank(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerankInt(
        domainLinks(spark, dir)
          .select(col("src_domain").as("src"), col("dst_domain").as("dst")),
        DrIters)
      .orderBy(col("r").desc, col("node").asc)
      .select(col("node").as("domain"), col("r").as("rank_micros"))

  /** The SERVED domain rank: `domainRank` computed once per corpus
    * version and landed as a content-addressed snapshot, read back by
    * every consumer that COMPOSES over the rank (`frontierRank`, the
    * pipeline report, the streaming frontier) — the offline-index /
    * online-serve split the ANN family uses, applied to the crawl
    * chain's most expensive shared stage (WARC extract → outlinks →
    * 5 PageRank iterations, ~3 s at sf0.1, re-derived per composed op
    * before r14). The registered `graph_domain_rank` op keeps
    * COMPUTING the rank — it is the query whose oracle proves the
    * bit-equality contract; this serves the proven artifact.
    */
  private[graft] def servedDomainRank(spark: SparkSession,
      dir: String): DataFrame = {
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/documents.parquet", s"graft_drserve_i$DrIters")
    if (!store.hasTableSnapshot("dr_rank", ts))
      store.writeTableSnapshot(domainRank(spark, dir), "dr_rank", ts)
    store.readTableSnapshot(spark, "dr_rank", ts)
      .select(col("domain"), col("rank_micros"))
  }

  val domainRankSql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT src_domain AS src, dst_domain AS dst
       |  FROM ($domainLinksSql)
       |),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |params AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node, ${Graph.Scale} // n AS r
       |       FROM nodes CROSS JOIN params),
       |${Graph.pagerankIterSql(DrIters)}
       |SELECT node AS domain, CAST(r AS BIGINT) AS rank_micros
       |FROM r$DrIters
       |ORDER BY r DESC, node""".stripMargin

  // -------------------------------------- graph_domain_rank_incremental

  /** Incremental domain PageRank — the corpus-growth twin of
    * `graph_domain_rank` (r11 verdict #5), the way crawl-graph rank
    * actually runs per batch at 100 TB: the page corpus is NEVER
    * re-walked. History is represented only by its persisted artifacts
    * — the distinct domain edge set (`dr_edges`) plus the last served
    * rank (`dr_rank`), both content-addressed to the corpus version —
    * and a new batch pays (a) outlink extraction over the BATCH pages
    * only, the corpus-sized stage, and (b) the power-method core over
    * the merged DOMAIN edge set, which is |domains|²-bounded (millions
    * of edges at web scale, KBs here) regardless of how many pages
    * history holds.
    *
    * Why the rank recomputes over the merged edge set rather than
    * warm-starting from `dr_rank`: PageRank is global — one new edge
    * can move every node's score — and the engine's rank contract is
    * BIT-EQUALITY with the unrolled-CTE oracle (integer micro-units,
    * fixed iterations from the uniform start). The stored rank is the
    * serving artifact between batches, exactly like a production
    * frontier serves yesterday's rank while today's recompute runs.
    *
    * Exactness: distinct(history edges) ∪ distinct(batch edges) =
    * distinct(all edges), and `pagerankInt` is deterministic on the
    * edge SET — so the oracle is `domainRankSql` VERBATIM (the full
    * recompute), the same twin-proof `componentsIncremental` carries.
    * History/batch split is 90/10 by doc_id (mod 10), the realistic
    * batch-to-corpus ratio, so the probe can show batch cost tracking
    * batch size, not history.
    */
  private val DrBatchMod = 10

  def domainRankIncremental(spark: SparkSession, dir: String): DataFrame = {
    val isBatch = col("doc_id") % DrBatchMod === DrBatchMod - 1
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/documents.parquet", s"graft_drstore_i$DrIters")
    if (!store.hasTableSnapshot("dr_rank", ts)) {
      val histE = resolvedDomainLinks(spark, dir, !isBatch)
        .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
        .distinct()
      store.writeTableSnapshot(histE, "dr_edges", ts)
      // the between-batches serving artifact (see scaladoc); written
      // LAST so it doubles as the index-complete marker
      store.writeTableSnapshot(Graph.pagerankInt(histE, DrIters),
        "dr_rank", ts)
    }
    val histE = store.readTableSnapshot(spark, "dr_edges", ts)
      .select(col("src"), col("dst"))
    val batchE = resolvedDomainLinks(spark, dir, isBatch)
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
    Graph.pagerankInt(histE.union(batchE), DrIters)
      .orderBy(col("r").desc, col("node").asc)
      .select(col("node").as("domain"), col("r").as("rank_micros"))
  }

  /** Oracle = the full recompute, verbatim — the bit-equality proof. */
  val domainRankIncrementalSql: String = domainRankSql

  // ------------------------------------------------- graph_domain_ppr

  /** Related-domain discovery — personalized PageRank over the DIRECTED
    * crawl link graph (citation semantics kept), teleporting to the
    * `.nz` registry seed set: the crawl-expansion question "starting
    * from the home registry, which domains does the link economy pull
    * in". Rides `Graph.pprInt` (string keys, the `domainRank`
    * precedent) over the SERVED domain edge table; seeds are derived
    * from the node set itself so the op has no extra fixture
    * dependency.
    */
  private val DomainPprIters = 4

  def domainPpr(spark: SparkSession, dir: String): DataFrame = {
    val e = domainLinks(spark, dir)
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
    val seeds = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().where(col("node").endsWith(".nz"))
    Graph.pprInt(e, seeds, DomainPprIters)
      .orderBy(col("r").desc, col("node").asc)
      .select(col("node").as("domain"), col("r").as("ppr_micros"))
  }

  val domainPprSql: String =
    s"""WITH el AS ($domainLinksSql),
       |e AS (SELECT DISTINCT src_domain AS src, dst_domain AS dst FROM el),
       |v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |seeds AS (SELECT node FROM v WHERE node LIKE '%.nz'),
       |nodes AS (SELECT v.node, s.node IS NOT NULL AS is_seed
       |          FROM v LEFT JOIN seeds s ON s.node = v.node),
       |sparams AS (SELECT count(*) AS ns FROM nodes WHERE is_seed),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node,
       |              CASE WHEN is_seed THEN ${Graph.Scale} // ns
       |                   ELSE 0 END AS r
       |       FROM nodes CROSS JOIN sparams),
       |${Graph.pprIterSql(DomainPprIters)}
       |SELECT node AS domain, CAST(r AS BIGINT) AS ppr_micros
       |FROM r$DomainPprIters
       |ORDER BY r DESC, node""".stripMargin

  // ------------------------------------------------ crawl_frontier_rank

  /** Frontier prioritization — the crawl family's terminal composition,
    * built ENTIRELY from this engine's own oracled operators: robots
    * admission gates the candidate set (`crawl_url_allowed`), domain
    * PageRank supplies the value signal (`graph_domain_rank`), the
    * robots crawl-delay supplies the cost signal (`crawl_robots_rules`),
    * and URL depth demotes deep pages — score = rank_micros div
    * (delay × (1 + depth)), BIGINT floor arithmetic end to end so both
    * engines agree bit-for-bit. `fetch_order` ranks within each domain
    * (politeness serializes per-domain anyway, so the global order is
    * irrelevant — and the window partitions by domain, staying sharded
    * at any corpus; a mega-domain's frontier would bucket like
    * `crawl_fetch_plan`'s LPT). Both dimension joins broadcast
    * (|domains| rows); the page side never shuffles before the
    * domain-partitioned window.
    */
  /** Stateless scoring stage over any admitted (doc_id,
    * registered_domain, path) frame plus the two broadcast dimension
    * frames — shared verbatim by the batch op and the streaming twin
    * (`CorpusStream.frontierStream`): a real frontier scores pages ON
    * ARRIVAL and lets the fetch scheduler's priority queue do the
    * ordering.
    */
  private[graft] def frontierScore(admitted: DataFrame, rank: DataFrame,
      delays: DataFrame): DataFrame =
    admitted
      .join(broadcast(rank), col("registered_domain") === col("domain"))
      .join(broadcast(delays),
        col("registered_domain") === col("d_domain"), "left")
      .withColumn("delay_sec", coalesce(col("crawl_delay"), lit(1L)))
      .withColumn("depth",
        expr("CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)"))
      .withColumn("score_micros",
        expr("rank_micros div (delay_sec * (1 + depth))"))
      .select(col("doc_id"), col("registered_domain"), col("depth"),
        col("score_micros"))

  def frontierRank(spark: SparkSession, dir: String): DataFrame = {
    // One corpus pass (r18): urlAllowed re-scanned documents for the
    // robots domain spine, and crawlDelays scanned a third time for the
    // same spine. The page frame is materialized once (slim metadata);
    // spine + rules + delays all derive from it.
    val pages = Domains.withDomain(
        Tables(spark, dir, "documents")
          .select(col("doc_id"), col("source"), Domains.fixtureUrlCol.as("url")))
      .select(col("doc_id"), col("registered_domain"),
        regexp_replace(col("url"), "^[a-z]+://[^/]+", "").as("path"))
      .localCheckpoint()
    val rules = Domains.robotsRulesFrom(
      pages.select(col("registered_domain")).distinct()).localCheckpoint()
    frontierRankFrom(spark, dir,
      Domains.admissionCols(pages, Domains.ruleArraysFrom(rules))
        .where(col("allowed"))
        .select(col("doc_id"), col("registered_domain"), col("path")),
      Domains.crawlDelaysFrom(rules))
  }

  /** [[frontierRank]] over a caller-supplied admitted frame — lets a
    * composition that ALREADY materialized the robots admission
    * (`crawlPipelineReport`'s stage 4) feed it here instead of
    * re-deriving `urlAllowed` from scratch (r17: the report ran the
    * robots pass twice).
    */
  private[graft] def frontierRankFrom(spark: SparkSession, dir: String,
      admitted: DataFrame): DataFrame =
    frontierRankFrom(spark, dir, admitted, Domains.crawlDelays(spark, dir))

  /** [[frontierRankFrom]] with a caller-supplied crawl-delay frame too —
    * a composition that already parsed the robots rules (the report
    * shares ONE rule frame between admission and delays) feeds its
    * delays here instead of re-deriving them from a fresh corpus scan.
    */
  private[graft] def frontierRankFrom(spark: SparkSession, dir: String,
      admitted: DataFrame, delays: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    frontierScore(admitted, servedDomainRank(spark, dir), delays)
      .withColumn("fetch_order", row_number().over(
        Window.partitionBy(col("registered_domain"))
          .orderBy(col("score_micros").desc, col("doc_id").asc)).cast("int"))
      .select(col("doc_id"), col("registered_domain").as("domain"),
        col("depth"), col("score_micros"), col("fetch_order"))
  }

  lazy val frontierRankSql: String =
    s"""WITH adm AS (
       |  SELECT doc_id, registered_domain, path
       |  FROM (${Domains.urlAllowedSql}) WHERE allowed
       |), rnk AS (
       |  SELECT * FROM ($domainRankSql)
       |), dl AS (
       |  SELECT registered_domain,
       |         max(TRY_CAST(path_prefix AS BIGINT)) AS crawl_delay
       |  FROM (${Domains.robotsRulesSql})
       |  WHERE directive = 'Crawl-delay' GROUP BY 1
       |), scored AS (
       |  SELECT a.doc_id, a.registered_domain AS domain,
       |         CAST(length(a.path) - length(replace(a.path, '/', ''))
       |              AS BIGINT) AS depth,
       |         r.rank_micros //
       |           (COALESCE(dl.crawl_delay, 1) *
       |            (1 + CAST(length(a.path) - length(replace(a.path, '/', ''))
       |                      AS BIGINT))) AS score_micros
       |  FROM adm a
       |  JOIN rnk r ON r.domain = a.registered_domain
       |  LEFT JOIN dl ON dl.registered_domain = a.registered_domain
       |)
       |SELECT doc_id, domain, depth, CAST(score_micros AS BIGINT)
       |         AS score_micros,
       |       CAST(row_number() OVER (PARTITION BY domain
       |              ORDER BY score_micros DESC, doc_id ASC) AS INT)
       |         AS fetch_order
       |FROM scored""".stripMargin

  // ------------------------------------------------- graph_domain_hits

  /** Domain HITS — hubs (link directories, aggregators) vs authorities
    * (heavily-cited domains) over the same crawl-derived edge list as
    * `graph_domain_rank`, via `Graph.hitsInt` (integer micro-units,
    * max-normalized — bit-for-bit vs the shared unrolled CTE chain).
    * PageRank and HITS disagree exactly where a crawl's structure is
    * interesting: a domain that links out to every good authority ranks
    * as a top hub here while staying invisible to in-link-only rank.
    */
  private val DhIters = 3

  def domainHits(spark: SparkSession, dir: String): DataFrame =
    Graph.hitsInt(
        domainLinks(spark, dir)
          .select(col("src_domain").as("src"), col("dst_domain").as("dst")),
        DhIters)
      .select(col("node").as("domain"), col("hub_micros"), col("auth_micros"))

  val domainHitsSql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT src_domain AS src, dst_domain AS dst
       |  FROM ($domainLinksSql)
       |),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, ${Graph.HScale} AS h FROM nodes),
       |${Graph.hitsIterSql(DhIters)}
       |SELECT n.node AS domain, h.h AS hub_micros, a.a AS auth_micros
       |FROM nodes n
       |JOIN h$DhIters h ON h.node = n.node
       |JOIN a$DhIters a ON a.node = n.node""".stripMargin

  // -------------------------------------------- graph_domain_reciprocity

  /** Directed reciprocity of the domain link graph: of the distinct
    * non-self edges u→v, what fraction have the reverse v→u — the
    * one-number "is this link economy mutual or broadcast?" diagnostic
    * (link-exchange rings score near 1, pure ad-sink topologies near 0).
    * Self-loops (every domain's internal navigation) are excluded or
    * the score inflates meaninglessly. One self-semi-join on the
    * |domains|²-bounded edge frame; output is a single row.
    */
  def domainReciprocity(spark: SparkSession, dir: String): DataFrame = {
    val e = domainLinks(spark, dir)
      .select(col("src_domain").as("u"), col("dst_domain").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val n = e.agg(count(lit(1)).as("n_edges"))
    val r = e.as("a")
      .join(e.as("b"),
        col("a.u") === col("b.v") && col("a.v") === col("b.u"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
    broadcast(n).crossJoin(broadcast(r))
      .select(col("n_edges"), col("n_reciprocal"),
        round(col("n_reciprocal").cast("double") / col("n_edges"), 6)
          .as("reciprocity"))
  }

  val domainReciprocitySql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT src_domain AS u, dst_domain AS v
       |  FROM ($domainLinksSql)
       |  WHERE src_domain <> dst_domain)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       |       (SELECT CAST(count(*) AS BIGINT) FROM e a
       |        WHERE EXISTS (SELECT 1 FROM e b
       |                      WHERE b.u = a.v AND b.v = a.u))
       |         AS n_reciprocal,
       |       round(CAST((SELECT count(*) FROM e a
       |                   WHERE EXISTS (SELECT 1 FROM e b
       |                                 WHERE b.u = a.v AND b.v = a.u))
       |                  AS DOUBLE) /
       |             (SELECT count(*) FROM e), 6) AS reciprocity""".stripMargin

  /** Weakly-connected components of the domain link graph — "how many
    * disjoint web neighborhoods does the crawl actually contain", the
    * question frontier scheduling and per-neighborhood quota decisions
    * start from. Composes `graph_domain_links` edges (self-loops are
    * harmless: the core drops u = v) through the shared
    * `Graph.connectedComponents` star-contraction core, which is
    * key-type-agnostic (min/least on STRING keys here — labels are the
    * lexicographically smallest member domain). Runs on the REDUCED
    * domain graph, so at 100 TB the loop's frames are |domains|-sized
    * regardless of corpus size. The oracle states the same fixpoint as
    * recursive reachability, the `dedup_clusters` pattern.
    */
  def domainComponents(spark: SparkSession, dir: String): DataFrame =
    Graph.connectedComponents(
      domainLinks(spark, dir)
        .select(col("src_domain").as("u"), col("dst_domain").as("v")))
      .select(col("id").as("domain"), col("label").as("component"))

  val domainComponentsSql: String =
    s"""WITH RECURSIVE dl AS (
       |${domainLinksSql}
       |), edges AS (
       |  SELECT src_domain AS u, dst_domain AS v FROM dl
       |  UNION ALL
       |  SELECT dst_domain, src_domain FROM dl
       |), walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |)
       |SELECT u AS domain, min(x) AS component FROM walk GROUP BY u""".stripMargin

  /** STRONGLY connected components of the directed domain graph — the
    * web's bowtie decomposition (Broder et al. 2000): the giant SCC is
    * where recrawl budget compounds (every member is reachable from
    * every other, so freshness propagates), IN/OUT/tendrils are where
    * it doesn't. `graph_domain_components` answers "one neighborhood or
    * many" on the UNDIRECTED shadow; this answers the directed
    * question. Composes the served `graph_domain_links` edges through
    * `Graph.stronglyConnectedComponents` (trim-then-color, label = min
    * member domain); the oracle states the mutual-reachability fixpoint
    * directly — two recursive walks joined both ways.
    */
  def domainScc(spark: SparkSession, dir: String): DataFrame =
    Graph.stronglyConnectedComponents(
      domainLinks(spark, dir)
        .select(col("src_domain").as("u"), col("dst_domain").as("v")))
      .select(col("id").as("domain"), col("label").as("scc_label"))

  val domainSccSql: String =
    s"""WITH RECURSIVE dl AS (
       |${domainLinksSql}
       |), e AS (
       |  SELECT src_domain AS u, dst_domain AS v FROM dl
       |), nodes AS (
       |  SELECT DISTINCT u AS id FROM
       |    (SELECT u FROM e UNION ALL SELECT v AS u FROM e)
       |), walk(u, x) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN e ON e.u = w.x
       |)
       |SELECT n.id AS domain, min(f.x) AS scc_label
       |FROM nodes n
       |JOIN walk f ON f.u = n.id
       |JOIN walk b ON b.u = f.x AND b.x = n.id
       |GROUP BY n.id""".stripMargin

  /** Bowtie classification of the domain graph (Broder et al. 2000,
    * "Graph structure in the Web"): every domain is `scc` (member of
    * the giant strongly connected component — largest SCC, ties by
    * smallest label), `in` (reaches the giant but is not in it — the
    * pages that FEED the core and deserve discovery crawl budget),
    * `out` (reachable from the giant — where core freshness
    * propagates for free), or `other` (tendrils, tubes, disconnected —
    * the long tail a crawl scheduler deprioritizes). Composes the SCC
    * labels with two frontier-BFS reachability passes from the giant's
    * member set (forward for OUT, reversed edges for IN); every frame
    * is |domains|-sized. The 1-row giant-label frame rides a broadcast
    * cross join (the scalar-frame house pattern), never a collect.
    */
  def domainBowtie(spark: SparkSession, dir: String): DataFrame =
    Graph.bowtieClasses(
      domainLinks(spark, dir)
        .select(col("src_domain").as("u"), col("dst_domain").as("v")))
      .select(col("id").as("domain"), col("label").as("scc_label"),
        col("bowtie_class"))

  val domainBowtieSql: String =
    s"""WITH RECURSIVE dl AS (
       |${domainLinksSql}
       |), e AS (
       |  SELECT src_domain AS u, dst_domain AS v FROM dl
       |), nodes AS (
       |  SELECT DISTINCT u AS id FROM
       |    (SELECT u FROM e UNION ALL SELECT v AS u FROM e)
       |), walk(u, x) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN e ON e.u = w.x
       |), scc AS (
       |  SELECT n.id AS domain, min(f.x) AS lbl
       |  FROM nodes n
       |  JOIN walk f ON f.u = n.id
       |  JOIN walk b ON b.u = f.x AND b.x = n.id
       |  GROUP BY n.id
       |), giant AS (
       |  SELECT lbl FROM (SELECT lbl, count(*) AS n FROM scc GROUP BY 1)
       |  ORDER BY n DESC, lbl ASC LIMIT 1
       |), members AS (
       |  SELECT domain FROM scc WHERE lbl = (SELECT lbl FROM giant)
       |), fwd AS (
       |  SELECT DISTINCT w.x AS domain FROM walk w
       |  WHERE w.u IN (SELECT domain FROM members)
       |), bwd AS (
       |  SELECT DISTINCT w.u AS domain FROM walk w
       |  WHERE w.x IN (SELECT domain FROM members)
       |)
       |SELECT s.domain, s.lbl AS scc_label,
       |       CASE WHEN s.lbl = (SELECT lbl FROM giant) THEN 'scc'
       |            WHEN s.domain IN (SELECT domain FROM bwd) THEN 'in'
       |            WHEN s.domain IN (SELECT domain FROM fwd) THEN 'out'
       |            ELSE 'other' END AS bowtie_class
       |FROM scc s""".stripMargin

  // ------------------------------------------- crawl_pipeline_report

  /** Crawl-pipeline yield report — the crawl-side twin of
    * `curate_pipeline_report` (r12 verdict #4): the whole crawl family
    * composed END-TO-END over one corpus, with per-stage document and
    * domain mass. Every stage is an operator the registry already
    * oracles individually; the composition proves they agree on one
    * corpus (shared URL fixture, shared doc_id key):
    *
    *   0 warc_records     — every WARC response record (`docsFromWarc`)
    *   1 extracted        — HTTP 200 with nonempty extracted text
    *   2 text_dedup       — exact-content survivors (min doc_id per
    *                        `text_md5`, the WARC record's own hash)
    *   3 canonical_url    — canonical-URL survivors (min doc_id per
    *                        `curate_url_canonical` key: the crawl-dedup
    *                        gate that catches refetch variants)
    *   4 robots_admitted  — RFC 9309 admission (`crawl_url_allowed`)
    *   5 frontier_ranked  — pages whose domain holds a link-graph rank
    *                        (`crawl_frontier_rank`; unranked domains
    *                        leave the frontier)
    *   6 first_wave       — the first politeness window per domain
    *                        (fetch_order ≤ $FirstWaveFetches)
    *
    * Gates are CUMULATIVE (a doc's `reached` stage is its first failing
    * gate), so the funnel is monotone by construction — pinned by
    * HtmlWarcSpec. Scale shape: each stage frame is a doc_id projection
    * of an operator whose own scale story is documented at its
    * definition; the report joins each gate ONCE as a membership flag,
    * explodes ≤ 7 stage rows per doc, and reduces in a single
    * count/distinct shuffle (map-side partial); the 7-row stage frame
    * computes its fractions against stage 0 on the driver-side window,
    * never reshuffling the corpus.
    */
  private val FirstWaveFetches = 5

  def crawlPipelineReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus pass synthesizes BOTH url columns (r18; r17 left three
    // passes — d0's fixture url, urlCanonical's raw url, urlAllowed's
    // fixture url + path — scanning documents separately because the
    // synthesized columns differ). The materialized frame is slim
    // metadata (ids, domain, path, raw url — never text), the guide §8
    // "decide with small rows" proxy; every URL-synthesis stage below,
    // plus the robots domain spine, derives from it.
    val docs = Domains.withDomain(
        Tables(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            Domains.fixtureUrlCol.as("url"), Domains.rawUrlCol.as("url_raw")))
      .select(col("doc_id"), col("registered_domain"),
        regexp_replace(col("url"), "^[a-z]+://[^/]+", "").as("path"),
        col("url_raw"))
      .localCheckpoint()
    val d0 = docs.select(col("doc_id"), col("registered_domain"))
    val warc = docsFromWarc(spark, dir)
      .select(col("doc_id"), col("http_status"), col("n_words"),
        col("text_md5")).localCheckpoint()
    val s1 = warc.where(col("http_status") === 200 && col("n_words") > 0)
      .select("doc_id")
    val s2 = warc.groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val s3 = Domains.urlCanonicalCols(docs.select(col("doc_id"), col("url_raw")))
      .groupBy(col("url_canonical"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    // one robots-rule parse for stage 4's admission AND the frontier's
    // crawl-delays (r17 shared the admitted frame but re-derived the
    // rule frame — with its own corpus scan for the domain spine — in
    // both ruleArrays and crawlDelays); the spine now reduces the
    // checkpointed docs frame and the KB-sized rule frame feeds both.
    val rules = Domains.robotsRulesFrom(
      docs.select(col("registered_domain")).distinct()).localCheckpoint()
    val admitted = Domains.admissionCols(
        docs.select(col("doc_id"), col("registered_domain"), col("path")),
        Domains.ruleArraysFrom(rules))
      .where(col("allowed"))
      .select(col("doc_id"), col("registered_domain"), col("path"))
      .localCheckpoint()
    val s4 = admitted.select("doc_id")
    val fr = frontierRankFrom(spark, dir, admitted,
        Domains.crawlDelaysFrom(rules))
      .select(col("doc_id"), col("fetch_order")).localCheckpoint()
    val s5 = fr.select("doc_id")
    val s6 = fr.where(col("fetch_order") <= FirstWaveFetches)
      .select("doc_id")
    val names = Seq("warc_records", "extracted", "text_dedup",
      "canonical_url", "robots_admitted", "frontier_ranked", "first_wave")
    // Funnel as ONE pass (r13 verdict #5): the r13 form chained
    // left-semi joins per stage and aggregated each cumulative frame
    // separately, so stage k's gate plan re-executed 7−k times. Here
    // every gate joins ONCE as a membership flag (distinct'd — set
    // semantics whatever a future stage emits), `reached` = the first
    // failing gate (gates are cumulative, so the funnel stays monotone
    // by construction), and each doc explodes to one row per stage it
    // survives (≤ 7) feeding a single count/distinct-domain shuffle.
    // A 7-row spine keeps empty tail stages present at zero.
    val gates = Seq(s1, s2, s3, s4, s5, s6)
    val flagged = gates.zipWithIndex.foldLeft(d0) { case (acc, (s, i)) =>
      acc.join(s.distinct().withColumn(s"f${i + 1}", lit(1)),
        Seq("doc_id"), "left")
    }
    var firstGap = when(col("f1").isNull, lit(0))
    for (i <- 2 to gates.length) firstGap =
      firstGap.when(col(s"f$i").isNull, lit(i - 1))
    val reached = firstGap.otherwise(lit(gates.length))
    val counted = flagged
      .select(col("registered_domain"),
        explode(sequence(lit(0), reached)).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("registered_domain")).as("n_domains"))
    val spine = spark.range(names.length)
      .select(col("id").cast("int").as("stage"))
    val stages = spine.join(counted, Seq("stage"), "left")
      .select(col("stage"),
        element_at(typedLit(names), col("stage") + 1).as("stage_name"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_domains"), lit(0L)).as("n_domains"))
    val w = Window.partitionBy()
    val rawDocs = max(when(col("stage") === 0, col("n_docs"))).over(w)
    stages.select(col("stage"), col("stage_name"), col("n_docs"),
      col("n_domains"),
      round(col("n_docs").cast("double") / rawDocs.cast("double"), 6)
        .as("docs_frac"))
  }

  lazy val crawlPipelineReportSql: String = {
    val stageNames = Seq("warc_records", "extracted", "text_dedup",
      "canonical_url", "robots_admitted", "frontier_ranked", "first_wave")
    val stageSelects = (0 to 6).map { k =>
      val joins = (1 to k).map(i => s"JOIN s$i USING (doc_id)").mkString(" ")
      s"""  SELECT $k AS stage, '${stageNames(k)}' AS stage_name,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT registered_domain) AS BIGINT)
         |           AS n_domains
         |  FROM d0 $joins""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH d0 AS (
       |  SELECT doc_id, registered_domain FROM (
       |    SELECT doc_id, url,
       |           ${Domains.domainSelectSql}
       |    FROM (SELECT doc_id, source, ${Domains.fixtureUrlSqlExpr} AS url
       |          FROM documents))
       |), warc AS (
       |$docsFromWarcSql
       |), s1 AS (
       |  SELECT DISTINCT doc_id FROM warc
       |  WHERE http_status = 200 AND n_words > 0
       |), s2 AS (
       |  SELECT DISTINCT min(doc_id) AS doc_id FROM warc GROUP BY text_md5
       |), s3 AS (
       |  SELECT DISTINCT min(doc_id) AS doc_id
       |  FROM (${Domains.urlCanonicalSql}) GROUP BY url_canonical
       |), s4 AS (
       |  SELECT DISTINCT doc_id FROM (${Domains.urlAllowedSql}) WHERE allowed
       |), fr AS (
       |  SELECT doc_id, fetch_order FROM ($frontierRankSql)
       |), s5 AS (
       |  SELECT DISTINCT doc_id FROM fr
       |), s6 AS (
       |  SELECT DISTINCT doc_id FROM fr WHERE fetch_order <= $FirstWaveFetches
       |), stages AS (
       |$stageSelects
       |)
       |SELECT stage, stage_name, n_docs, n_domains,
       |       round(CAST(n_docs AS DOUBLE) /
       |             (SELECT CAST(n_docs AS DOUBLE) FROM stages
       |              WHERE stage = 0), 6) AS docs_frac
       |FROM stages""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("crawl_pipeline_report", crawlPipelineReport _,
      Some(crawlPipelineReportSql)),
    Op("graph_domain_components", domainComponents _,
      Some(domainComponentsSql)),
    Op("graph_domain_scc", domainScc _, Some(domainSccSql)),
    Op("graph_domain_bowtie", domainBowtie _, Some(domainBowtieSql)),
    Op("graph_domain_hits", domainHits _, Some(domainHitsSql)),
    Op("graph_domain_reciprocity", domainReciprocity _,
      Some(domainReciprocitySql)),
    Op("text_html_extract", htmlExtract _, Some(htmlExtractSql)),
    Op("text_html_boilerplate", htmlBoilerplate _, Some(htmlBoilerplateSql)),
    Op("docs_from_warc", docsFromWarc _, Some(docsFromWarcSql)),
    Op("text_html_links", htmlLinks _, Some(htmlLinksSql)),
    Op("graph_domain_links", domainLinks _, Some(domainLinksSql)),
    Op("graph_domain_rank", domainRank _, Some(domainRankSql)),
    Op("graph_domain_rank_incremental", domainRankIncremental _,
      Some(domainRankIncrementalSql)),
    Op("crawl_frontier_rank", frontierRank _, Some(frontierRankSql)),
    Op("graph_domain_ppr", domainPpr _, Some(domainPprSql)),
    // fast Spark output vs the slow chain's DuckDB oracle, carried on
    // the primary row directly (r11 verdict #6)
    Op("text_html_extract_fast", htmlExtractFast _, Some(htmlExtractSql)),
  )
}
