package graft

import scala.util.Random

import graft.functions.{ScoredId, TopKAgg}
import graft.sources.CastMatrix

/** Property-style checks (SURVEY.md §5.3) with seeded random cases:
  * cast-matrix totality, TopKAgg's merge/reduce agreement under
  * arbitrary splits, and exact top-k selection.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  test("cast matrix: every supported name maps, every other name throws") {
    CastMatrix.all.foreach { t =>
      assert(CastMatrix.fromName(t.name) == t)
    }
    (1 to 100).foreach { _ =>
      val s = rnd.alphanumeric.take(8).mkString.toUpperCase
      if (!CastMatrix.all.exists(_.name == s))
        intercept[IllegalArgumentException](CastMatrix.fromName(s))
    }
  }

  test("TopKAgg: any split of any input merges to the same top-k as a fold") {
    (1 to 100).foreach { _ =>
      val items = List.fill(rnd.nextInt(40))(
        ScoredId(rnd.nextInt(50).toLong, (rnd.nextInt(2000) - 1000) / 100.0))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKAgg(k)
      val folded = items.foldLeft(agg.zero)(agg.reduce)
      (0 to items.size).foreach { cut =>
        val (l, r) = items.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(merged == folded, s"split at $cut diverged for k=$k items=$items")
      }
      assert(folded.size <= k)
      assert(folded == folded.sortBy(s => (-s.score, s.id)))
      // exact selection: fold == global sort-take
      assert(folded == items.sortBy(s => (-s.score, s.id)).take(k))
    }
  }

  test("funnel stages are monotone non-increasing on the fixture") {
    val rows = graft.operators.Events.funnel(spark, sfDir).collect()
      .sortBy(_.getLong(0)).map(_.getLong(2))
    assert(rows.length == 3)
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b },
      s"stage counts grew: ${rows.mkString(",")}")
  }

  test("retention day-0 equals cohort size; transitions conserve event count") {
    // every user is active on their own cohort day, so offset-0 rows sum
    // to the number of distinct users
    val ret = graft.operators.Events.retention(spark, sfDir).collect()
    val day0 = ret.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(day0 == users, s"day-0 total $day0 != $users users")
    // each user's transitions = their events - 1 (chain property), so the
    // matrix total is n_events - n_users(with >=1 event)
    val trans = graft.operators.Events.transitions(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    val events = Tables(spark, sfDir, "events").count()
    assert(trans == events - users, s"$trans != $events - $users")
  }

  test("mixture kept tokens stay within budget + one document overflow") {
    val kept = graft.operators.Curation.mixture(spark, sfDir).collect()
    kept.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val budget = rows.head.getDouble(4)
      val total = rows.map(_.getLong(2)).sum
      val maxDoc = rows.map(_.getLong(2)).max
      assert(total < budget + maxDoc,
        s"$src kept $total tokens vs budget $budget (+max doc $maxDoc)")
      // greedy keep: every kept doc STARTS inside the budget
      assert(rows.forall(r => r.getLong(3) - r.getLong(2) < budget))
    }
  }

  test("repetition fractions are consistent bounds") {
    graft.operators.TextAnalysis.repetition(spark, sfDir).collect().foreach { r =>
      val (n, nd) = (r.getLong(1), r.getLong(2))
      val (dup, top) = (r.getDouble(3), r.getDouble(4))
      assert(nd >= 1 && nd <= n)
      assert(dup >= 0.0 && dup < 1.0)
      // the most-repeated bigram is at least the average multiplicity
      // (1e-6 slack: top_share is rounded to 6 decimals)
      assert(top >= 1.0 / nd - 1e-6 && top <= (n - nd + 1).toDouble / n + 1e-6)
    }
  }

  test("HashEmbedVec: random token arrays match an independent md5 fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 64
    // independent reference path: hex-string md5 via DigestUtils, the
    // way the SQL oracle derives it — not the expression's byte math
    def refVec(tokens: Seq[String]): Seq[Long] = {
      val acc = new Array[Long](dim)
      tokens.foreach { t =>
        val hv = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            t.getBytes("UTF-8")).substring(0, 8), 16)
        acc((hv % dim).toInt) += (if ((hv / dim) % 2 == 0) 1L else -1L)
      }
      acc.toSeq
    }
    val cases = (1 to 60).map { i =>
      val n = rnd.nextInt(80)
      val toks = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString) ++
        (if (i % 5 == 0) Seq("", "§ünïcødé", "a b") else Nil)
      (i.toLong, toks)
    }
    val got = cases.toDF("id", "toks")
      .select(col("id"), org.apache.spark.sql.graft.HashEmbedVec(
        col("toks"), dim).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) == refVec(toks), s"fold diverged for case $id")
    }
  }

  test("MdbCatalog: random tdef pages round-trip; fuzzed pages never throw") {
    import graft.sources.MdbCatalog
    val PageSize = 4096
    val ValidCodes = Seq(0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08,
      0x09, 0x0A, 0x0B, 0x0C, 0x0F, 0x10)
    def header: Array[Byte] = {
      val p = new Array[Byte](PageSize)
      Array[Byte](0x00, 0x01, 0x00, 0x00).copyToArray(p, 0)
      "Standard Jet DB".getBytes("US-ASCII").copyToArray(p, 4)
      p(0x14) = 0x01; p
    }
    def tdef(tableType: Int, cols: Seq[(String, Int, Int)],
        numRealIdx: Int): Array[Byte] = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x02; p(1) = 0x01
      p(0x28) = tableType.toByte
      buf.putShort(0x2D, cols.size.toShort)
      buf.putInt(0x33, numRealIdx)
      val descBase = 0x3F + numRealIdx * 12
      cols.zipWithIndex.foreach { case ((_, code, colNum), i) =>
        p(descBase + i * 25) = code.toByte
        buf.putShort(descBase + i * 25 + 5, colNum.toShort)
      }
      var off = descBase + cols.size * 25
      cols.foreach { case (name, _, _) =>
        val b = name.getBytes("UTF-16LE")
        buf.putShort(off, b.length.toShort); off += 2
        b.copyToArray(p, off); off += b.length
      }
      p
    }
    // round-trip: random catalogs survive build → parse exactly
    (1 to 40).foreach { i =>
      val nCols = 1 + rnd.nextInt(12)
      val cols = (0 until nCols).map { c =>
        (s"c${c}_" + rnd.alphanumeric.take(rnd.nextInt(8)).mkString,
          ValidCodes(rnd.nextInt(ValidCodes.size)), c)
      }
      val sys = rnd.nextBoolean()
      val bytes = header ++ tdef(if (sys) 0x53 else 0x4E, cols,
        rnd.nextInt(5))
      val cat = MdbCatalog.read(bytes).fold(e => fail(s"case $i: $e"), identity)
      assert(cat.tables.size == 1 && cat.quarantined.isEmpty, s"case $i")
      val t = cat.tables.head
      assert(t.system == sys)
      assert(t.columns.map(c => (c.name, c.typeCode, c.colNum)) == cols,
        s"case $i round-trip diverged")
    }
    // fuzz: random bytes behind a tdef page marker must quarantine or
    // parse, never throw — the half-damaged-database contract
    (1 to 200).foreach { i =>
      val junk = new Array[Byte](PageSize)
      rnd.nextBytes(junk)
      junk(0) = 0x02; junk(1) = 0x01
      MdbCatalog.read(header ++ junk).fold(
        e => fail(s"fuzz $i rejected whole file: $e"),
        cat => assert(cat.tables.size + cat.quarantined.size == 1))
    }
  }

  test("MdbCatalog rows: fuzzed data/LVAL bytes never throw — rows and " +
      "quarantines stay well-formed") {
    import graft.sources.MdbCatalog
    val PageSize = 4096
    def header: Array[Byte] = {
      val p = new Array[Byte](PageSize)
      Array[Byte](0x00, 0x01, 0x00, 0x00).copyToArray(p, 0)
      "Standard Jet DB".getBytes("US-ASCII").copyToArray(p, 4)
      p(0x14) = 0x01; p
    }
    // id LONG fixed @0, m MEMO var index 0
    val tdefP = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x02; p(1) = 0x01; p(0x28) = 0x4E
      buf.putShort(0x2D, 2.toShort); buf.putInt(0x33, 0)
      p(0x3F) = 0x04                                   // LONG
      buf.putShort(0x3F + 5, 0.toShort)                // colNum 0
      p(0x3F + 15) = 0x01                              // fixed
      buf.putShort(0x3F + 21, 0.toShort)               // offF 0
      p(0x3F + 25) = 0x0C                              // MEMO
      buf.putShort(0x3F + 25 + 5, 1.toShort)           // colNum 1
      buf.putShort(0x3F + 25 + 7, 0.toShort)           // var idx 0
      var off = 0x3F + 50
      Seq("id", "m").foreach { n =>
        val b = n.getBytes("UTF-16LE")
        buf.putShort(off, b.length.toShort); off += 2
        b.copyToArray(p, off); off += b.length
      }
      p
    }
    val memoData = "fuzz memo payload".getBytes("UTF-16LE")
    val row = { // [cnt][id][12B memo def → lval pg3 row0][offsets][cnt][mask]
      val varStart = 2 + 4
      val len = varStart + 12 + 2 * 2 + 2 + 1
      val r = new Array[Byte](len)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putShort(0, 2.toShort); buf.putInt(2, 7)
      buf.putInt(varStart, memoData.length | 0x40000000)
      buf.putInt(varStart + 4, (3 << 8) | 0)
      val varCntOff = len - 1 - 2
      buf.putShort(varCntOff, 1.toShort)
      buf.putShort(varCntOff - 2, varStart.toShort)
      buf.putShort(varCntOff - 4, (varStart + 12).toShort)
      r(len - 1) = 0x03
      r
    }
    def page(tpe: Int, ownerOrSig: Either[Int, String],
        rows: Seq[Array[Byte]]): Array[Byte] = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = tpe.toByte; p(1) = 0x01
      ownerOrSig match {
        case Left(owner) => buf.putInt(0x04, owner)
        case Right(sig) => sig.getBytes("US-ASCII").copyToArray(p, 4)
      }
      buf.putShort(0x0C, rows.size.toShort)
      var end = PageSize
      rows.zipWithIndex.foreach { case (r, i) =>
        val start = end - r.length
        r.copyToArray(p, start)
        buf.putShort(0x0E + 2 * i, start.toShort)
        end = start
      }
      p
    }
    val base = header ++ tdefP ++
      page(0x01, Left(1), Seq(row)) ++
      page(0x01, Right("LVAL"), Seq(memoData))
    val cat = MdbCatalog.read(base).fold(e => fail(e), identity)
    val tdef = cat.tables.head
    // sanity: the unfuzzed fixture decodes the memo through the LVAL hop
    val (okRows, okQuar) = MdbCatalog.readRows(base, PageSize, tdef)
    assert(okRows == Seq(Seq(7L, "fuzz memo payload")), s"$okRows $okQuar")
    // fuzz the data + LVAL pages (never the tdef): the decoder must
    // return, and anything it returns must be shape-correct — a row has
    // one slot per column; quarantines are (key, nonempty reason)
    (1 to 300).foreach { i =>
      val b = base.clone()
      val nMut = 1 + rnd.nextInt(4)
      (0 until nMut).foreach { _ =>
        val off = 2 * PageSize + rnd.nextInt(2 * PageSize)
        b(off) = rnd.nextInt(256).toByte
      }
      val (rows, quar) = MdbCatalog.readRows(b, PageSize, tdef)
      rows.foreach(r => assert(r.size == tdef.columns.size, s"fuzz $i"))
      quar.foreach { case (_, reason) =>
        assert(reason.nonEmpty, s"fuzz $i empty reason") }
    }
  }

  test("MDB overflow: the pointer resolves; fuzzed/cyclic pointers " +
      "quarantine, never throw") {
    import graft.sources.MdbCatalog
    val PageSize = 4096
    def header: Array[Byte] = {
      val p = new Array[Byte](PageSize)
      Array[Byte](0x00, 0x01, 0x00, 0x00).copyToArray(p, 0)
      "Standard Jet DB".getBytes("US-ASCII").copyToArray(p, 4)
      p(0x14) = 0x01; p
    }
    // id LONG fixed @0 — single-column tdef on page 1
    val tdefP = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x02; p(1) = 0x01; p(0x28) = 0x4E
      buf.putShort(0x2D, 1.toShort); buf.putInt(0x33, 0)
      p(0x3F) = 0x04                         // LONG
      buf.putShort(0x3F + 5, 0.toShort)      // colNum 0
      p(0x3F + 15) = 0x01                    // fixed
      buf.putShort(0x3F + 21, 0.toShort)     // offF 0
      var off = 0x3F + 25
      val nb = "id".getBytes("UTF-16LE")
      buf.putShort(off, nb.length.toShort); off += 2
      nb.copyToArray(p, off)
      p
    }
    def idRow(v: Int): Array[Byte] = {
      // [cnt u16=1][int32][var cnt u16 = 0][one var offset][mask]
      val r = new Array[Byte](2 + 4 + 2 + 2 + 1)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putShort(0, 1.toShort); buf.putInt(2, v)
      buf.putShort(r.length - 1 - 2, 0.toShort)
      r(r.length - 1) = 0x01
      r
    }
    def dataPage(owner: Int,
        rows: Seq[(Array[Byte], Int)]): Array[Byte] = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x01; p(1) = 0x01
      buf.putInt(0x04, owner)
      buf.putShort(0x0C, rows.size.toShort)
      var end = PageSize
      rows.zipWithIndex.foreach { case ((r, flags), i) =>
        val start = end - r.length
        r.copyToArray(p, start)
        buf.putShort(0x0E + 2 * i, (start | flags).toShort)
        end = start
      }
      p
    }
    def ptr(rowNum: Int, page: Int): Array[Byte] =
      Array[Byte](rowNum.toByte, (page & 0xFF).toByte,
        ((page >> 8) & 0xFF).toByte, ((page >> 16) & 0xFF).toByte)
    // page 2: a plain row + an overflow pointer to page 3 row 0;
    // page 3: the body, hidden from the scan by its 0x8000 bit
    val base = header ++ tdefP ++
      dataPage(1, Seq(idRow(11) -> 0, ptr(0, 3) -> 0x4000)) ++
      dataPage(1, Seq(idRow(99) -> 0x8000))
    val cat = MdbCatalog.read(base).fold(e => fail(e), identity)
    val tdef = cat.tables.head
    val (rows, quar) = MdbCatalog.readRows(base, PageSize, tdef)
    assert(rows.map(_.head).toSet == Set(11L, 99L), s"$rows $quar")
    assert(quar.isEmpty, s"quar: $quar")
    // a pointer CYCLE (page 3's slot is itself an overflow pointer
    // back to page 2 row 1) quarantines with a reason, never spins
    val cyc = header ++ tdefP ++
      dataPage(1, Seq(idRow(11) -> 0, ptr(0, 3) -> 0x4000)) ++
      dataPage(1, Seq(ptr(1, 2) -> (0x8000 | 0x4000)))
    val (rows2, quar2) = MdbCatalog.readRows(cyc, PageSize, tdef)
    assert(rows2.map(_.head) == Seq(11L))
    assert(quar2.exists(_._2.contains("overflow")), s"quar2: $quar2")
    // fuzz the 4 pointer bytes: every outcome is rows + well-formed
    // quarantines — out-of-range pages, foreign owners, junk row
    // numbers all land in the broken-pointer branch
    (1 to 200).foreach { i =>
      val b = base.clone()
      val pOff = 2 * PageSize + (PageSize - idRow(0).length - 4)
      (0 until 4).foreach(j => b(pOff + j) = rnd.nextInt(256).toByte)
      val (r, q) = MdbCatalog.readRows(b, PageSize, tdef)
      assert(r.forall(_.size == 1), s"fuzz $i")
      q.foreach { case (_, reason) =>
        assert(reason.nonEmpty, s"fuzz $i empty reason") }
    }
  }

  test("pixel/PCM decode: fuzzed magic-prefixed payloads never throw, " +
      "outputs stay sane") {
    import graft.operators.Multimodal
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte))
    (1 to 150).foreach { i =>
      val m = magics(rnd.nextInt(magics.size))
      val junk = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(junk)
      Multimodal.decodePixels(m ++ junk).foreach { case (w, h, ml, ah) =>
        assert(w > 0 && h > 0 && ml >= 0 && ml <= 255 &&
          ah.matches("[0-9a-f]{16}"), s"fuzz $i: ($w,$h,$ml,$ah)")
      }
    }
    (1 to 150).foreach { i =>
      val junk = new Array[Byte](12 + rnd.nextInt(512))
      rnd.nextBytes(junk)
      "RIFF".getBytes.copyToArray(junk, 0)
      "WAVE".getBytes.copyToArray(junk, 8)
      Multimodal.decodeWavSamples(junk).foreach { case (n, pk, rms, zc) =>
        assert(n > 0 && pk >= 0 && pk <= 32768 && rms >= 0 && zc >= 0,
          s"fuzz $i: ($n,$pk,$rms,$zc)")
      }
    }
    // G.711 / IMA-ADPCM branches: a well-formed header over random
    // payload bytes, then random single-byte mutations of the whole
    // file — every path returns an Option, never throws, and any
    // decoded stats stay sane (G.711 peaks bounded by the codebook max)
    def wav(fmt: Int, ch: Int, bits: Int, ba: Int, spb: Int,
        data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int) = (0 until 4).foreach(k => out.write((v >> (8 * k)) & 255))
      def le16(v: Int) = (0 until 2).foreach(k => out.write((v >> (8 * k)) & 255))
      val fl = if (spb > 0) 20 else 16
      out.write("RIFF".getBytes); le32(20 + fl + data.length)
      out.write("WAVE".getBytes); out.write("fmt ".getBytes); le32(fl)
      le16(fmt); le16(ch); le32(8000); le32(8000 * ba / ch); le16(ba); le16(bits)
      if (spb > 0) { le16(2); le16(spb) }
      out.write("data".getBytes); le32(data.length); out.write(data)
      out.toByteArray
    }
    (1 to 120).foreach { i =>
      val payload = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(payload)
      val f = rnd.nextInt(3) match {
        case 0 => wav(6, 1 + rnd.nextInt(2), 8, 1 + rnd.nextInt(2), 0, payload)
        case 1 => wav(7, 1, 8, 1, 0, payload)
        case _ => wav(17, 1, 4, 256, 505, payload)
      }
      if (rnd.nextBoolean() && f.nonEmpty)
        f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeWavSamples(f).foreach { case (n, pk, rms, zc) =>
        assert(n > 0 && pk >= 0 && pk <= 32768 && rms >= 0 && zc >= 0 &&
          zc <= n, s"codec fuzz $i: ($n,$pk,$rms,$zc)")
      }
    }
  }

  test("HTML extraction: fuzzed tag soup leaves no tag, comment, or " +
      "uncollapsed whitespace") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.HtmlExtract
    // no &lt;/&gt; pieces: decoded entities are TEXT by design (browser
    // semantics) and may legitimately look tag-shaped in the output —
    // entity behavior is pinned by the golden cases instead
    val pieces = Seq("<div>", "</div>", "<script>", "</script>", "<p a=\"b\">",
      "<!--", "-->", "<style>", "</style>", "text", "&amp;", "a<b",
      "x > y", " ", "\t", "\n", "\"", "'", "<", ">", "wor ds", "<br/>")
    val soupRnd = new Random(4242) // private stream: never shifts the
    val soups = (1 to 200).map { _ => // shared seeded fuzzes below
      (1 to (3 + soupRnd.nextInt(25)))
        .map(_ => pieces(soupRnd.nextInt(pieces.size))).mkString
    }
    val cleaned = soups.toDF("html")
      .select(HtmlExtract.cleanHtmlCol(col("html")).as("t"))
      .as[String].collect() ++
      soups.toDF("html") // the single-pass expression holds the same laws
        .select(org.apache.spark.sql.graft.HtmlClean(col("html")).as("t"))
        .as[String].collect()
    cleaned.foreach { t =>
      assert(!"<[^>]*>".r.findFirstIn(t).isDefined, s"tag survived: '$t'")
      assert(!t.contains("<script") && !t.contains("<!--"), s"'$t'")
      assert(!t.contains("  ") && !t.contains("\t") && !t.contains("\n"),
        s"whitespace uncollapsed: '$t'")
      assert(t == t.trim)
    }
  }

  test("WARC wrap round-trip: random special-char texts survive " +
      "record → parse → extract") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.HtmlExtract
    import graft.sources.WarcIngest
    val alphabet = "ab c&<>\"'12 .x"
    val wrapRnd = new Random(777) // private stream (see tag-soup test)
    val cases = (1 to 80).map { i =>
      val text = (1 to (1 + wrapRnd.nextInt(40)))
        .map(_ => alphabet(wrapRnd.nextInt(alphabet.length))).mkString.trim
      (i.toLong, text)
    }
    cases.foreach { case (id, text) =>
      val (recs, quar) = WarcIngest.records(HtmlExtract.warcRecord(id, text))
      assert(quar.isEmpty && recs.length == 1, s"case $id '$text'")
      assert(recs.head.httpStatus == 200 &&
        recs.head.targetUri.endsWith(s"/doc/$id"))
      assert(new String(recs.head.body, "UTF-8") ==
        HtmlExtract.wrapScala(id, text), s"body drift for '$text'")
    }
    // extraction recovers the whitespace-collapsed text from the page
    val got = cases.toDF("doc_id", "text")
      .select(col("text"), HtmlExtract.cleanHtmlCol(
        HtmlExtract.wrapCol(col("doc_id"), col("text"))).as("clean"))
      .as[(String, String)].collect()
    got.foreach { case (text, clean) =>
      val collapsed = text.replaceAll("\\s+", " ").trim
      assert(collapsed.isEmpty || clean.contains(collapsed),
        s"extract lost '$text' → '$clean'")
    }
  }

  test("scan-family plans stay exchange-free (no accidental shuffle)") {
    for (n <- Seq("text_html_extract", "text_redact_pii",
        "curate_url_canonical", "text_html_links", "docs_from_warc")) {
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$n plan gained a shuffle")
    }
  }

  test("WARC: fuzzed streams never throw; records + quarantines partition") {
    import graft.sources.WarcIngest
    // pure fuzz: arbitrary bytes parse to (possibly empty) records +
    // quarantines, never an exception
    (1 to 200).foreach { i =>
      val junk = new Array[Byte](64 + rnd.nextInt(2048))
      rnd.nextBytes(junk)
      val (recs, quar) = WarcIngest.records(junk)
      assert(recs.forall(_.offset >= 0) && quar.forall(_._1 >= 0), s"fuzz $i")
    }
    // seeded fuzz: plant a VALID record inside random garbage — the
    // parser must recover it via resync regardless of surroundings.
    // (Guard: the garbage must not itself contain a magic AFTER the
    // planted record's offset table-free body — regenerate on clash.)
    (1 to 60).foreach { i =>
      val payload = s"HTTP/1.1 200 OK\r\n\r\nok-$i".getBytes("US-ASCII")
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://f.nz/$i\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload ++ "\r\n\r\n".getBytes("US-ASCII")
      var pre = new Array[Byte](rnd.nextInt(256))
      var post = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(pre); rnd.nextBytes(post)
      // random bytes can't contain the ASCII magic by accident often,
      // but make it impossible: zero any 'W'
      pre = pre.map(b => if (b == 'W'.toByte) 0.toByte else b)
      post = post.map(b => if (b == 'W'.toByte) 0.toByte else b)
      val (recs, _) = WarcIngest.records(pre ++ rec ++ post)
      assert(recs.exists(_.targetUri == s"https://f.nz/$i"),
        s"seeded record $i lost in garbage")
    }
  }

  test("MDB rows: fuzzed data pages never throw; decoded rows type-check") {
    import graft.sources.{CastMatrix, MdbCatalog}
    // a real tdef (from the round-trip builder above) + fuzzed DATA
    // pages owned by it: every outcome is rows or quarantines, no throw
    val PageSize = 4096
    def header: Array[Byte] = {
      val p = new Array[Byte](PageSize)
      Array[Byte](0x00, 0x01, 0x00, 0x00).copyToArray(p, 0)
      "Standard Jet DB".getBytes("US-ASCII").copyToArray(p, 4)
      p(0x14) = 0x01; p
    }
    def tdef(cols: Seq[(String, Int, Int)]): Array[Byte] = {
      val p = new Array[Byte](PageSize)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x02; p(1) = 0x01
      p(0x28) = 0x4E
      buf.putShort(0x2D, cols.size.toShort)
      buf.putInt(0x33, 0)
      cols.zipWithIndex.foreach { case ((_, code, colNum), i) =>
        p(0x3F + i * 25) = code.toByte
        buf.putShort(0x3F + i * 25 + 5, colNum.toShort)
        p(0x3F + i * 25 + 15) = 0x01 // fixed
      }
      var off = 0x3F + cols.size * 25
      cols.foreach { case (name, _, _) =>
        val b = name.getBytes("UTF-16LE")
        buf.putShort(off, b.length.toShort); off += 2
        b.copyToArray(p, off); off += b.length
      }
      p
    }
    val base = header ++ tdef(Seq(("a", 0x04, 0), ("b", 0x07, 1)))
    (1 to 200).foreach { i =>
      val page = new Array[Byte](PageSize)
      rnd.nextBytes(page)
      page(0) = 0x01; page(1) = 0x01
      java.nio.ByteBuffer.wrap(page)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x04, 1)
      val bytes = base ++ page
      val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
      val t = cat.tables.head
      val (rows, _) = MdbCatalog.readRows(bytes, PageSize, t)
      rows.foreach { r =>
        assert(r.size == 2, s"fuzz $i row arity")
        assert(r(0) == null || r(0).isInstanceOf[java.lang.Long])
        assert(r(1) == null || r(1).isInstanceOf[java.lang.Double])
      }
    }
  }

  test("JPEG decode: fuzzed SOI payloads never throw, outputs stay sane") {
    import graft.operators.Multimodal
    val assets = (1 to 300).map { i =>
      val junk = new Array[Byte](2 + rnd.nextInt(512))
      rnd.nextBytes(junk)
      junk(0) = 0xFF.toByte; junk(1) = 0xD8.toByte
      Multimodal.Asset(i.toLong, "image", junk, "fuzz")
    }
    Multimodal.extractMeta(spark.createDataset(assets)(
      org.apache.spark.sql.Encoders.product[Multimodal.Asset]))
      .collect().foreach { m =>
        assert((m.width == -1 && m.height == -1 && m.channels == 0) ||
          (m.width > 0 && m.height > 0 && m.channels > 0),
          s"insane decode: $m")
      }
  }

  test("WAV decode: fuzzed RIFF payloads never throw, outputs stay consistent") {
    import graft.operators.Multimodal
    val payloads = (1 to 200).map { i =>
      val n = rnd.nextInt(200)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // half the cases get a RIFF/WAVE prefix so the chunk walk runs on
      // garbage chunk structure, not just the fallback path
      if (i % 2 == 0 && n >= 12) {
        "RIFF".getBytes.copyToArray(b, 0)
        "WAVE".getBytes.copyToArray(b, 8)
      }
      Multimodal.Asset(i.toLong, "audio", b, "fuzz")
    }
    import spark.implicits._
    val out = Multimodal.extractAudioMeta(spark.createDataset(payloads))
      .collect()
    assert(out.length == payloads.size)
    out.foreach { m =>
      // quarantined rows are all-(-1); decoded/fallback rows are all-sane
      val quarantined = m.sample_rate == -1
      if (quarantined)
        assert(m.channels == -1 && m.bits == -1 && m.n_frames == -1L &&
          m.duration_ms == -1L, s"mixed quarantine row: $m")
      else
        // bits == 0 is legitimate: random bytes can contain a valid
        // MPEG sync, and the MP3 frame walk reports no bit depth by
        // contract (Multimodal scaladoc) — found by fuzz when the
        // shared seed stream shifted
        assert(m.sample_rate > 0 && m.channels > 0 && m.bits >= 0 &&
          m.n_frames >= 0L && m.duration_ms >= 0L, s"insane decode: $m")
    }
  }

  // ------------------------------------------------ crawl-surface fuzz
  // robots, URLs, and WARC are untrusted bytes: the r12 TRY_CAST lesson
  // is that even when Spark is safe, semantics can silently drift on
  // malformed input. These cases pin never-throw + the semantic
  // invariants on adversarial strings the fixture synthesis never makes
  // (the cross-ENGINE fuzz — Spark vs DuckDB on a garbage corpus — is
  // tools/fuzz_crawl.py, run per-round).

  private def garbage(rnd: Random, n: Int): String = {
    val metas = "?&#%\\^$[](){}|.*+\n\r\t\"'`<>@:;,=~!│ -代码абв "
    (0 until n).map(_ => metas(rnd.nextInt(metas.length))).mkString
  }

  test("fuzz: URL canonicalization never throws; fragments and tracking params never survive") {
    import spark.implicits._
    val r = new Random(1337)
    val urls: Seq[String] = Seq(
      "", "https://", "http://h:80", "HTTPS://UPPER.Host:443/P#f#g",
      "https://h/p?utm_source=x&utm_source=y&&&",
      "https://h/\n#a\n#b", "no-scheme-at-all",
      "https://h/p?" + Seq.fill(500)("a=1").mkString("&"),
      "https://h/" + "x" * 10000 + "#frag",
      "https://例え.テスト/パス?q=値#断片",
      "https://h/p?gclid=1&ref=2&fbclid=3&utm_x=4&keep=5",
      "https://h/p???", "https://h/p?#?", "https://h:443:443/p",
      garbage(r, 100)) ++
      (1 to 60).map(_ => "https://h/" + garbage(r, 1 + r.nextInt(80)))
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url_raw")
    val rows = graft.operators.Domains.urlCanonicalCols(df).collect()
    assert(rows.length == urls.length)
    rows.foreach { row =>
      assert(!row.isNullAt(2), s"null canonical for ${row.getString(1)}")
      val canon = row.getString(2)
      assert(!canon.contains("#"),
        s"fragment survived: ${row.getString(1)} -> $canon")
      val q = canon.indexOf('?')
      if (q >= 0) canon.substring(q + 1).split("&").foreach { p =>
        Seq("utm_", "gclid=", "fbclid=", "ref=").foreach(t =>
          assert(!p.startsWith(t),
            s"tracking param survived: ${row.getString(1)} -> $canon"))
      }
      assert(row.getLong(3) >= 0, s"negative drop count: $row")
    }
  }

  test("fuzz: robots admission returns a verdict for every garbage page, no exchange") {
    import spark.implicits._
    val r = new Random(7331)
    val domains = Seq("example.com", "spam-farm.net", "example.co.nz",
      "wikipedia.org", "heritage.org.nz", "no-rules.zz")
    val pages = (0L until 200L).map { i =>
      val d = domains((i % domains.size).toInt)
      val path = i % 5 match {
        case 0 => ""                       // no path at all
        case 1 => "/src1" + garbage(r, 30) // rule-colliding prefix
        case 2 => "/" + "p" * 10000        // 10 kB path
        case 3 => garbage(r, 40)           // not even /-rooted
        case _ => "/src5/1/" + garbage(r, 10)
      }
      (i, d, path)
    }.toDF("doc_id", "registered_domain", "path")
    val rules = graft.operators.Domains.ruleArrays(spark, sfDir)
    val out = graft.operators.Domains.admissionCols(pages, rules)
    val rows = out.collect()
    assert(rows.length == 200)
    rows.foreach { row =>
      assert(!row.isNullAt(5), s"null verdict: $row")
      val d = row.getString(3)
      assert(d == "Allow" || d == "Disallow" || d == "default",
        s"unknown directive: $row")
      // RFC 9309: a matched verdict must come from a true prefix match
      if (d != "default")
        assert(row.getString(2).startsWith(row.getString(4)), s"bogus match: $row")
    }
    // the gate stays map-side even on garbage (DomainsSpec's plan pin):
    // the only repartitioning exchange may build the KB rule array;
    // the page side never shuffles
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("registered_domain")),
      s"fact-side shuffle: $exchanges")
  }

  test("fuzz: seen-bloom keeps zero false negatives on garbage URLs") {
    import spark.implicits._
    val r = new Random(4242)
    val urls = (0L until 300L).map { i =>
      val u = i % 4 match {
        case 0 => "https://h/" + garbage(r, 1 + r.nextInt(50))
        case 1 => ""                            // empty URL
        case 2 => "https://h/" + "q" * 5000     // 5 kB URL
        case _ => s"https://例え.テスト/$i"      // non-ASCII
      }
      (i, u)
    }
    val probe = urls.toDF("doc_id", "url")
    val hist = urls.filter(_._1 % 3 == 0).toDF("doc_id", "url")
    // tiny filter (64 bits) so false POSITIVES are forced too — the
    // audit column must stay consistent under saturation
    val rows = graft.operators.Domains
      .seenBloomCore(probe, hist, mBits = 64, kHashes = 3).collect()
    assert(rows.length == 300)
    rows.foreach { row =>
      val (maybe, seen, fp) =
        (row.getBoolean(1), row.getBoolean(2), row.getBoolean(3))
      assert(!seen || maybe,
        s"FALSE NEGATIVE: doc ${row.getLong(0)} seen but not flagged")
      assert(fp == (maybe && !seen), s"audit column inconsistent: $row")
    }
    // exact membership is by URL VALUE (duplicate garbage strings —
    // notably the empty URL — make some ids seen through a twin)
    val histUrls = urls.filter(_._1 % 3 == 0).map(_._2).toSet
    val expectSeen = urls.filter(u => histUrls.contains(u._2)).map(_._1).toSet
    val seenIds = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(seenIds == expectSeen, "exact membership diverged")
  }

  test("exif fuzz: arbitrary and magic-prefixed bytes never throw") {
    val r = new Random(1414)
    (1 to 300).foreach { _ =>
      val n = r.nextInt(96)
      val b = new Array[Byte](n); r.nextBytes(b)
      graft.operators.Multimodal.parseExif(b) // must not throw
      if (n >= 2) { b(0) = 0xFF.toByte; b(1) = 0xD8.toByte }
      graft.operators.Multimodal.parseExif(b) match {
        case Some((o, _, _, _)) => assert(o >= -1 && o <= 8)
        case None => ()
      }
      // a claimed APP1/Exif header followed by garbage must quarantine
      // or parse, never throw
      val hdr = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
        0xE1.toByte, 0, 40, 'E', 'x', 'i', 'f', 0, 0)
      val tail = new Array[Byte](34); r.nextBytes(tail)
      graft.operators.Multimodal.parseExif(hdr ++ tail)
    }
  }

  test("mp3 side-info fuzz: sync-prefixed garbage never throws") {
    val r = new Random(2828)
    (1 to 300).foreach { _ =>
      val n = r.nextInt(600)
      val b = new Array[Byte](n); r.nextBytes(b)
      graft.operators.Multimodal.parseMp3SideInfo(b)
      if (n >= 4) {
        // force a plausible MPEG1 Layer III sync so the side-info walk
        // engages on random side-info bits
        b(0) = 0xFF.toByte; b(1) = 0xFB.toByte; b(2) = 0x90.toByte
        graft.operators.Multimodal.parseMp3SideInfo(b) match {
          case Some((f, g, bits, mdb, s, _)) =>
            assert(f >= -1 && g >= -1 && bits >= -1 && mdb >= -1 && s >= -1)
          case None => ()
        }
      }
    }
  }

  test("id3 fuzz: ID3-prefixed garbage never throws, verdicts in contract") {
    val r = new Random(4242)
    (1 to 300).foreach { _ =>
      val n = 10 + r.nextInt(120)
      val b = new Array[Byte](n); r.nextBytes(b)
      graft.operators.Multimodal.parseId3Tags(b)
      b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 3; b(4) = 0; b(5) = 0
      b(6) = (b(6) & 0x7F).toByte; b(7) = (b(7) & 0x7F).toByte
      b(8) = (b(8) & 0x7F).toByte; b(9) = (b(9) & 0x7F).toByte
      graft.operators.Multimodal.parseId3Tags(b) match {
        case Some((v, f, _, _)) => assert(v == 3 && f >= -1)
        case None => fail("valid preamble must be claimed")
      }
    }
  }
}
