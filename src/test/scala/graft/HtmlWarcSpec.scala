package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

/** HTML → clean-text extraction + the WARC end-to-end chain
  * (VERDICT r10 #1): golden extraction cases, malformed-markup
  * degradation, renderer parity (Scala fixture bytes == Spark Column),
  * block/boilerplate classification, and the full
  * segments → WarcIngest → extract roundtrip at sf0.001.
  */
class HtmlWarcSpec extends SparkSpec {

  /** Run the Spark extraction chain on one literal HTML string. */
  private def clean(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("html")
      .select(HtmlExtract.cleanHtmlCol(col("html")).as("t"))
      .collect()(0).getString(0)
  }

  // ------------------------------------------------------ golden cases

  test("extraction strips script/style/comment bodies, not just tags") {
    val html = "<html><script src=\"x.js\">var a = '<p>not text</p>';" +
      "</script><style>body{color:red}</style><p>Real text.</p>" +
      "<!-- hidden <b>note</b> --></html>"
    assert(clean(html) == "Real text.")
  }

  test("entity decode round-trips, &amp; decoded last") {
    assert(clean("<p>a &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")
      == "a <tag> &amp; \"q\" 's' x y")
    // escaped-then-extracted text equals the original (wrap round-trip)
    val original = "5 < 6 & 7 > 2"
    import spark.implicits._
    val got = Seq((1L, original)).toDF("doc_id", "text")
      .select(HtmlExtract.cleanHtmlCol(
        HtmlExtract.wrapCol(col("doc_id"), col("text"))).as("t"))
      .collect()(0).getString(0)
    assert(got.contains(original))
  }

  test("adjacent blocks never word-join; whitespace collapses") {
    assert(clean("<div>alpha</div><div>beta</div>") == "alpha beta")
    assert(clean("<p>a\r\n  b\t c</p>") == "a b c")
  }

  test("malformed markup degrades, never throws") {
    // unclosed script swallows to end of document (browser behavior)
    assert(clean("<p>keep</p><script>var x=1; rest is gone") == "keep")
    // unclosed tag at EOF: '<' with no '>' survives as text
    assert(clean("text then <broken") == "text then <broken")
    // stray '>' is plain text
    assert(clean("a > b") == "a > b")
    // attribute '>' inside quotes is NOT handled (documented regexp
    // limitation): tag is cut at the first '>', remainder is text
    assert(clean("<a href=\"x>y\">z</a>") == "y\">z")
  }

  // ------------------------------------------- single-pass expression

  /** Run the codegen'd single-pass cleaner on one literal string. */
  private def cleanFast(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("html")
      .select(org.apache.spark.sql.graft.HtmlClean(col("html")).as("t"))
      .collect()(0).getString(0)
  }

  test("HtmlClean == regexp chain on goldens, malformed markup, corpus") {
    val goldens = Seq(
      "<html><script src=\"x.js\">var a='<p>x</p>';</script>" +
        "<style>b{c:d}</style><p>Real.</p><!-- n --></html>",
      "<p>a &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>",
      "<div>alpha</div><div>beta</div>",
      "<p>a\r\n  b\t c</p>",
      "<p>keep</p><script>var x=1; rest is gone",
      "text then <broken",
      "a > b",
      "<a href=\"x>y\">z</a>",
      "", "   ", "&", "&amp", "<scriptx>no</script>k",
      "<script no close tag at all",
      "&amp;amp; &amp;lt;")
    goldens.foreach(h => assert(cleanFast(h) == clean(h), s"diverged on '$h'"))
    // whole-corpus equality (the _check twin pins this against DuckDB;
    // this pins Spark-vs-Spark directly)
    import spark.implicits._
    val both = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        HtmlExtract.cleanHtmlCol(
          HtmlExtract.wrapCol(col("doc_id"), col("text"))).as("chain"),
        org.apache.spark.sql.graft.HtmlClean(
          HtmlExtract.wrapCol(col("doc_id"), col("text"))).as("fast"))
      .where(col("chain") =!= col("fast")).count()
    assert(both == 0L)
  }

  test("HtmlClean documented divergences: nested openers go browser-style") {
    // commented-out unclosed script: the staged chain strips script
    // bodies over raw bytes FIRST and swallows to EOF; the single pass
    // honors the outer comment (browser behavior)
    val h1 = "<!--<script>-->text<!--x-->"
    assert(clean(h1) == "")
    assert(cleanFast(h1) == "text")
    // style body containing an unclosed <script>
    val h2 = "<style>a<script>b</style>c"
    assert(clean(h2) == "")
    assert(cleanFast(h2) == "c")
  }

  // -------------------------------------------------- renderer parity

  test("Scala wrap renderer == Spark wrap renderer on the corpus") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
    val sparkSide = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        HtmlExtract.wrapCol(col("doc_id"), col("text")).as("html"))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(HtmlExtract.wrapScala(id, text) == sparkSide(id),
        s"renderer drift for doc $id")
    }
  }

  // ------------------------------------------------------- boilerplate

  test("link-dominated chrome flagged; article text kept") {
    val rows = HtmlExtract.htmlBoilerplate(spark, sfDir)
      .where(col("doc_id") === 0).collect()
    assert(rows.length == 5) // nav, h1, p, share, footer
    val byText = rows.map(r => r.getString(1) -> r.getBoolean(5)).toMap
    assert(byText("Home Docs About"))          // nav: 3 links / 3 words
    assert(byText("Share Print"))              // share chrome
    assert(byText("Terms Privacy Ads Contact")) // footer chrome
    val article = rows.filter(!_.getBoolean(5))
    assert(article.length == 2) // h1 + body paragraph
    assert(article.exists(_.getString(1).startsWith("Document ")))
  }

  // ------------------------------------------------- WARC end-to-end

  test("docs_from_warc round-trips every document through real WARC bytes") {
    import spark.implicits._
    val got = HtmlExtract.docsFromWarc(spark, sfDir)
      .select(col("doc_id"), col("text_md5"), col("http_status")).as[(Long, String, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(HtmlExtract.cleanHtmlCol(
          HtmlExtract.wrapCol(col("doc_id"), col("text")))).as("m"))
      .as[(Long, String)].collect().toMap
    assert(got.size == expected.size && got.nonEmpty)
    expected.foreach { case (id, m) =>
      assert(got(id) == ((m, 200)), s"roundtrip mismatch for doc $id")
    }
  }

  test("HttpTextDecode: BOM > header > meta > UTF-8-validate > 1252 fallback") {
    import spark.implicits._
    def d(body: Array[Byte], ct: String): (String, String) = {
      val r = Seq((body, ct)).toDF("body", "ct")
        .select(org.apache.spark.sql.graft.HttpTextDecode(
          col("body"), col("ct")).as("d"))
        .select(col("d.text"), col("d.charset")).head()
      (r.getString(0), r.getString(1))
    }
    val eAcute1252 = Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    // tier 2: the header names the encoding
    assert(d(eAcute1252, "text/html; charset=windows-1252") ==
      (("café", "windows-1252")))
    assert(d(eAcute1252, "text/html; charset=ISO-8859-1") ==
      (("café", "iso-8859-1")), "header charset is case-normalized")
    // tier 3: no header param, <meta charset> declares it
    val meta = ("<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>caf").getBytes("US-ASCII") ++ Array(0xE9.toByte)
    val (t3, c3) = d(meta, "text/html")
    assert(c3 == "iso-8859-1" && t3.endsWith("café"))
    // tier 3 http-equiv form, unquoted value
    val equiv = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=windows-1252\">x").getBytes("US-ASCII") ++ Array(0x93.toByte)
    val (t3b, c3b) = d(equiv, "text/html")
    assert(c3b == "windows-1252" && t3b.endsWith("“"))
    // tier 4a: undeclared valid UTF-8 stays UTF-8
    assert(d("café 中文".getBytes("UTF-8"), "text/html") ==
      (("café 中文", "utf-8")))
    // tier 4b: undeclared malformed UTF-8 falls back to 1252 (0x93 = “)
    val (t4, c4) = d("say ".getBytes("US-ASCII") ++ Array(0x93.toByte), "")
    assert(c4 == "windows-1252" && t4 == "say “")
    // tier 1: a BOM outranks a lying header and is stripped
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "café".getBytes("UTF-8")
    assert(d(bom, "text/html; charset=windows-1252") == (("café", "utf-8")))
    val utf16 = Array(0xFF.toByte, 0xFE.toByte) ++
      "hi".getBytes("UTF-16LE")
    assert(d(utf16, "text/html") == (("hi", "utf-16le")))
    // declared-but-unknown charset falls through to the content sniff
    assert(d("plain ascii".getBytes("US-ASCII"),
      "text/html; charset=bogus-enc-99") == (("plain ascii", "utf-8")))
  }

  test("HttpTextDecode tier 3: prescan is <meta>-scoped and HTML-gated") {
    import spark.implicits._
    def d(body: Array[Byte], ct: String): (String, String) = {
      val r = Seq((body, ct)).toDF("body", "ct")
        .select(org.apache.spark.sql.graft.HttpTextDecode(
          col("body"), col("ct")).as("d"))
        .select(col("d.text"), col("d.charset")).head()
      (r.getString(0), r.getString(1))
    }
    // body PROSE mentioning charset= must not hijack an undeclared
    // UTF-8 page (WHATWG: the prescan only reads <meta> tags)
    val prose = ("declare an encoding with charset=iso-8859-1 inside a " +
      "meta tag — café").getBytes("UTF-8")
    assert(d(prose, "text/html") ==
      ((new String(prose, "UTF-8"), "utf-8")),
      "prose charset= outside <meta> must not fire")
    // the identical declaration inside a real <meta> tag DOES fire
    val realMeta = ("<meta charset=iso-8859-1><p>caf").getBytes("US-ASCII") ++
      Array(0xE9.toByte)
    assert(d(realMeta, "text/html")._2 == "iso-8859-1")
    // a non-HTML content type skips the prescan: the fake meta inside a
    // JSON string is ignored and the content sniff (1252 fallback for
    // the stray 0x93) decides instead
    val json = "{\"note\":\"<meta charset=iso-8859-1>\",\"v\":\""
      .getBytes("US-ASCII") ++ Array(0x93.toByte) ++
      "\"}".getBytes("US-ASCII")
    assert(d(json, "application/json")._2 == "windows-1252",
      "non-HTML content type must skip the meta prescan")
    // ...but the same bytes under text/html honor the meta declaration
    assert(d(json, "text/html")._2 == "iso-8859-1")
  }

  test("HttpTextDecode tier 4: undeclared CJK pages sniff structurally, Latin keeps 1252") {
    import spark.implicits._
    def d(body: Array[Byte], ct: String): (String, String) = {
      val r = Seq((body, ct)).toDF("body", "ct")
        .select(org.apache.spark.sql.graft.HttpTextDecode(
          col("body"), col("ct")).as("d"))
        .select(col("d.text"), col("d.charset")).head()
      (r.getString(0), r.getString(1))
    }
    // undeclared Shift_JIS: kana-rich page, no BOM/header/meta
    val jp = "日本語のテキストです。ひらがなとカタカナがたくさんあります。"
    assert(d(("<p>" + jp + "</p>").getBytes("Shift_JIS"), "text/html") ==
      (("<p>" + jp + "</p>", "shift_jis")))
    // undeclared EUC-KR: hangul page
    val kr = "한국어 텍스트입니다. 이 문서는 인코딩 선언이 없습니다."
    assert(d(("<p>" + kr + "</p>").getBytes("EUC-KR"), "text/html") ==
      (("<p>" + kr + "</p>", "euc-kr")))
    // undeclared GBK: hanzi page (GB2312-range bytes are often
    // EUC-KR-valid too — the hangul-dominance rule must reject that)
    val zh = "这是一段没有声明编码的中文网页文本内容，用来测试编码探测。"
    assert(d(("<p>" + zh + "</p>").getBytes("GBK"), "text/html") ==
      (("<p>" + zh + "</p>", "gbk")))
    // a Latin 1252 page with sparse accents stays on the WHATWG
    // fallback: isolated high bytes before space/punct are invalid
    // trails in all three CJK families
    val latin = "résumé café déjà vu, naïve"
      .getBytes("windows-1252")
    assert(d(latin, "text/html")._2 == "windows-1252")
    // totality fuzz: any byte soup decodes deterministically to SOME
    // (text, charset) — the decode must never throw
    val rnd = new scala.util.Random(20260816L)
    val soups = (0 until 64).map { k =>
      val b = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(b); (b, k)
    }
    val out = soups.toDF("body", "k")
      .select(org.apache.spark.sql.graft.HttpTextDecode(
        col("body"), lit("text/html")).as("d"))
      .select(col("d.charset")).collect()
    assert(out.length == 64 && out.forall(!_.isNullAt(0)))
  }

  test("docs_from_warc decodes a windows-1252 crawl page end-to-end") {
    // a real WARC segment whose page is 1252-encoded and header-declared
    def rec(id: Long, ctype: String, body: Array[Byte]): Array[Byte] = {
      val httpHead =
        s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n".getBytes("US-ASCII")
      val len = httpHead.length + body.length
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://docs.example.nz/doc/$id\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: $len\r\n\r\n").getBytes("US-ASCII") ++
        httpHead ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val dir = java.nio.file.Files.createTempDirectory("warc1252")
    val page = "<html><body><p>café naïve résumé</p></body></html>"
    java.nio.file.Files.write(dir.resolve("seg.warc"),
      rec(7L, "text/html; charset=windows-1252",
        page.getBytes("windows-1252")) ++
        rec(8L, "text/html; charset=utf-8", page.getBytes("UTF-8")))
    val got = HtmlExtract.fromWarcRecords(
        graft.sources.WarcIngest.toDataFrame(spark, dir.toString))
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("charset") == "windows-1252")
    assert(got(1).getAs[String]("charset") == "utf-8")
    // the decoded texts are identical, so the extraction chain agrees
    // byte-for-byte across encodings: same word count, same md5
    assert(got(0).getAs[Long]("n_words") == 3L)
    assert(got(0).getAs[String]("text_md5") ==
      got(1).getAs[String]("text_md5"),
      "1252 and UTF-8 encodings of the same page must hash identically")
  }

  test("crawl pipeline report: monotone funnel, full mass at stage 0") {
    val rows = HtmlExtract.crawlPipelineReport(spark, sfDir)
      .orderBy(col("stage")).collect()
    assert(rows.length == 7)
    assert(rows(0).getString(1) == "warc_records" &&
      rows(6).getString(1) == "first_wave")
    val nDocsTotal = Tables(spark, sfDir, "documents").count()
    assert(rows(0).getLong(2) == nDocsTotal,
      s"stage 0 must carry the whole corpus: ${rows(0)} vs $nDocsTotal")
    // cumulative gates: doc AND domain mass never increase stage over
    // stage — the composition is a funnel, not a re-mix
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2),
        s"doc mass must be monotone: $a -> $b")
      assert(b.getLong(3) <= a.getLong(3),
        s"domain mass must be monotone: $a -> $b")
    }
    // the politeness window really cuts: first_wave ≤ 5 pages per
    // surviving domain
    assert(rows(6).getLong(2) <= rows(6).getLong(3) * 5)
    assert(rows(0).getDouble(4) == 1.0 && rows(6).getDouble(4) < 1.0)
  }

  // ---------------------------------------------------------- outlinks

  test("outlinks: relative resolved, absolute passed, mailto dropped") {
    import spark.implicits._
    val links = HtmlExtract.htmlLinks(spark, sfDir)
      .where(col("doc_id") === 0)
      .select(col("href"), col("link_url"), col("link_domain"),
        col("is_external"))
      .as[(String, String, String, Boolean)].collect()
    assert(links.length == 8) // 9 hrefs in template, mailto: dropped
    val byHref = links.map(l => l._1 -> l).toMap
    assert(byHref("/docs") ==
      (("/docs", "https://docs.example.nz/docs", "example.nz", false)))
    assert(byHref("https://ads.tracker.io/px") ==
      (("https://ads.tracker.io/px", "https://ads.tracker.io/px",
        "tracker.io", true)))
    assert(!byHref.contains("mailto:info@example.nz"))
    assert(links.count(_._4) == 1) // exactly one external edge per page
  }

  test("domain link graph: self-edges from relative hrefs, ad edge everywhere") {
    import spark.implicits._
    val edges = HtmlExtract.domainLinks(spark, sfDir)
      .select(col("src_domain"), col("dst_domain"), col("n_links"))
      .as[(String, String, Long)].collect()
    val srcs = edges.map(_._1).distinct.sorted
    // 8 fixture hosts collapse to 7 registered domains
    assert(srcs.length == 7)
    // relative hrefs resolve to the page's own origin → a self-edge per
    // domain; the template's ad link adds a tracker.io edge from every
    // domain (coinciding with the self-edge for tracker.io itself)
    srcs.foreach { s =>
      assert(edges.exists(e => e._1 == s && e._2 == s), s"no self-edge for $s")
      assert(edges.exists(e => e._1 == s && e._2 == "tracker.io"))
    }
    assert(edges.length == 7 + 7 - 1)
    // 7 relative links per page, example.com spans TWO hosts (www + port)
    val selfByDomain = edges.filter(e => e._1 == e._2)
      .map(e => e._1 -> e._3).toMap
    val total = Tables(spark, sfDir, "documents").count()
    assert(selfByDomain("example.com") >= selfByDomain("wikipedia.org"))
    assert(edges.filter(_._2 == "tracker.io").map(_._3).sum +
      edges.filter(e => e._2 != "tracker.io").map(_._3).sum == total * 8)
  }

  test("domain rank: the universally-linked ad domain dominates") {
    import spark.implicits._
    val ranks = HtmlExtract.domainRank(spark, sfDir)
      .as[(String, Long)].collect()
    assert(ranks.length == 7)
    // tracker.io receives an in-link from EVERY domain; all others only
    // self-link, so they share the identical rank below it
    assert(ranks.head._1 == "tracker.io")
    val rest = ranks.tail.map(_._2).distinct
    assert(rest.length == 1 && rest.head < ranks.head._2)
    // deterministic tie order (rank DESC, domain ASC)
    assert(ranks.tail.map(_._1).toSeq == ranks.tail.map(_._1).sorted.toSeq)
  }

  test("incremental domain rank == full recompute, bit-for-bit; snapshot reused") {
    import spark.implicits._
    val full = HtmlExtract.domainRank(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val inc1 = HtmlExtract.domainRankIncremental(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(inc1 == full, s"incremental diverged:\n full=$full\n  inc=$inc1")
    // second call serves the persisted history artifacts (write-once
    // gate) and must still be bit-equal
    val inc2 = HtmlExtract.domainRankIncremental(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(inc2 == full)
  }

  test("domain ppr: seed mass shared, universally-linked sink absorbs the walk") {
    import spark.implicits._
    val r = HtmlExtract.domainPpr(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val seeds = r.keys.filter(_.endsWith(".nz"))
    // the three .nz seeds hold identical (teleport-symmetric) mass > 0
    assert(seeds.size == 3 && seeds.map(r).toSet.size == 1 &&
      r(seeds.head) > 0)
    // the ad domain is linked from EVERY domain incl. the seeds: it
    // absorbs the directed walk and outranks everything
    assert(r("tracker.io") == r.values.max)
    // domains unreachable from the seed set carry zero mass
    assert(r("wikipedia.org") == 0L && r("spam-farm.net") == 0L)
  }

  test("domain reciprocity: matches a scalar recompute of the edge set") {
    val e = HtmlExtract.domainLinks(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(p => p._1 != p._2).distinct.toSet
    val row = HtmlExtract.domainReciprocity(spark, sfDir).collect().head
    val recip = e.count(p => e.contains((p._2, p._1))).toLong
    assert(row.getLong(0) == e.size.toLong, s"edges ${row.getLong(0)} vs ${e.size}")
    assert(row.getLong(1) == recip, s"reciprocal ${row.getLong(1)} vs $recip")
    assert(math.abs(row.getDouble(2) - recip.toDouble / e.size) < 1e-6)
  }

  test("warc fixture synthesis is idempotent (marker gate, O2 shape)") {
    val dir = HtmlExtract.synthWarcSegments(spark, sfDir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    val again = HtmlExtract.synthWarcSegments(spark, sfDir)
    val files2 = new java.io.File(again).listFiles().map(_.getName).sorted
    assert(dir == again && files.sameElements(files2))
    assert(files.contains("_SUCCESS") && files.exists(_.endsWith(".warc.gz")))
  }

  test("domain components: the ad domain stitches the crawl into one island") {
    val rows = graft.operators.HtmlExtract.domainComponents(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // every page links the universally-embedded ad domain, so the whole
    // domain graph is one weak component labeled by its lexicographic min
    assert(rows.values.toSet == Set(rows.keys.min), rows.toString)
    assert(rows.size >= 5)
  }
}
