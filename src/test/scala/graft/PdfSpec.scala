package graft

import org.apache.spark.sql.functions._

import graft.operators.Pdf

/** PDF text extraction: renderer↔extractor round-trips across every
  * seam combination, hand-built golden bytes for the paths the fixture
  * renderer never emits (StandardEncoding high range, /Prev chains,
  * array-of-streams contents), and the quarantine discipline
  * (truncation, encryption, unsupported filters, xref streams — all
  * refuse with a reason, never partial text).
  */
class PdfSpec extends SparkSpec {

  private val ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  // ------------------------------------------------------- round-trips

  test("render → extract round-trips text across all four seam combos") {
    val texts = Seq(
      "plain words only here",
      // escapes: parens and backslashes must survive literal strings
      "a(b) c\\d (nested (parens)) end",
      // enough words for multiple lines AND multiple pages: 8/line,
      // 20 lines/page → 400 words spill to page 3
      (1 to 350).map(i => s"word$i").mkString(" "),
      // single word, empty-ish, and whitespace runs
      "one", "  padded   runs	collapse  ")
    for {
      text <- texts
      flate <- Seq(true, false)
      indirect <- Seq(true, false)
    } {
      val pdf = Pdf.render(text, flate, indirect)
      val r = Pdf.extract(pdf)
      assert(r.status == "ok", s"($flate,$indirect) on '$text': ${r.status}")
      val expected = Pdf.layoutLines(text).mkString("\n")
      assert(r.text == expected,
        s"($flate,$indirect) round-trip diverged on '${text.take(40)}'")
      val expPages = math.max(1,
        math.ceil(Pdf.layoutLines(text).length / 20.0).toInt)
      assert(r.nPages == expPages)
      // the MODERN writer (xref stream + ObjStm) yields the same text
      val rm = Pdf.extract(Pdf.renderModern(text))
      assert(rm.status == "ok" && rm.text == expected &&
        rm.nPages == expPages, s"modern writer diverged: ${rm.status}")
      // the COMPOSITE-FONT writer (2-byte /ToUnicode shows) too — only
      // a CMap-aware extractor can round-trip these bytes
      val rc = Pdf.extract(Pdf.render(text, flate, indirect,
        lzw = false, encrypt = false, cmapFont = true))
      assert(rc.status == "ok" && rc.text == expected,
        s"cmap writer diverged: ${rc.status} '${rc.text.take(60)}'")
      // ...and composed with encryption (the CMap stream decrypts too)
      val rce = Pdf.extract(Pdf.render(text, flate, indirect,
        lzw = false, encrypt = true, cmapFont = true))
      assert(rce.status == "ok" && rce.text == expected,
        s"cmap+rc4 writer diverged: ${rce.status}")
    }
  }

  test("empty and all-space text round-trips as one empty page") {
    Seq("", "   ").foreach { t =>
      val r = Pdf.extract(Pdf.render(t, flate = false, indirectLength = false))
      assert(r.status == "ok" && r.nPages == 1 && r.text == "")
    }
  }

  // ------------------------------------------------- hand-built bytes

  /** Minimal classic-xref PDF around one content stream. */
  private def onePagePdf(content: Array[Byte],
      extraTrailer: String = "",
      streamDictExtra: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    offs(4) = out.size()
    w(s"4 0 obj\n<< /Length ${content.length}$streamDictExtra >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 5\n0000000000 65535 f \n")
    (1 to 4).foreach(n => w("%010d 00000 n \n".format(offs(n))))
    w(s"trailer\n<< /Size 5 /Root 1 0 R$extraTrailer >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  test("StandardEncoding high range maps per Annex D; ASCII is identity") {
    // bytes: A, 0241 exclamdown, 0341 AE, 0361 ae, 0373 germandbls, B
    val content = ("BT (A" + "\\241\\341\\361\\373" + "B) Tj ET").getBytes(ascii)
    val r = Pdf.extract(onePagePdf(content))
    assert(r.status == "ok")
    assert(r.text == "A¡Ææß" + "B", s"got '${r.text}'")
  }

  test("hex strings, octal escapes, and line continuations decode") {
    val content = ("BT <414243> Tj (\\101\\102) Tj (a\\\nb) Tj ET")
      .getBytes(ascii)
    val r = Pdf.extract(onePagePdf(content))
    assert(r.status == "ok" && r.text == "ABCABab", s"got '${r.text}'")
  }

  test("contents as an ARRAY of streams concatenates in order") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    val c1 = "BT (first) Tj".getBytes(ascii)
    val c2 = "T* (second) Tj ET".getBytes(ascii)
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n")
    offs(4) = out.size(); w(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n")
    out.write(c1); w("\nendstream\nendobj\n")
    offs(5) = out.size(); w(s"5 0 obj\n<< /Length ${c2.length} >>\nstream\n")
    out.write(c2); w("\nendstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(n => w("%010d 00000 n \n".format(offs(n))))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = Pdf.extract(out.toByteArray)
    assert(r.status == "ok" && r.text == "first\nsecond", s"got '${r.text}'")
  }

  test("incremental update: /Prev chain resolves, newest revision wins") {
    // revision 1: a complete one-page pdf showing (old)
    val c1 = "BT (old) Tj ET".getBytes(ascii)
    val rev1 = onePagePdf(c1)
    val xref1 = {
      // recover rev1's startxref (last startxref line)
      val s = new String(rev1, ascii)
      s.substring(s.lastIndexOf("startxref") + 10).trim
        .takeWhile(_.isDigit).toInt
    }
    // revision 2: append a REPLACEMENT content object 4 and an xref
    // section that points at it, with /Prev to revision 1's table
    val out = new java.io.ByteArrayOutputStream()
    out.write(rev1)
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    val c2 = "BT (new) Tj ET".getBytes(ascii)
    val off4 = out.size()
    w(s"4 0 obj\n<< /Length ${c2.length} >>\nstream\n")
    out.write(c2); w("\nendstream\nendobj\n")
    val xref2 = out.size()
    w("xref\n4 1\n")
    w("%010d 00001 n \n".format(off4))
    w(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $xref1 >>\nstartxref\n$xref2\n%%EOF\n")
    val r = Pdf.extract(out.toByteArray)
    assert(r.status == "ok" && r.text == "new", s"got '${r.text}'")
  }

  // ------------------------------------------------------- quarantine

  test("truncation refuses — never partial text") {
    val full = Pdf.render((1 to 100).map(i => s"w$i").mkString(" "),
      flate = true, indirectLength = true)
    assert(Pdf.extract(full).status == "ok")
    // cut anywhere: header-only, mid-stream, mid-xref, no trailer
    Seq(4, full.length / 4, full.length / 2, full.length - 30).foreach { n =>
      val cut = java.util.Arrays.copyOfRange(full, 0, n)
      val r = Pdf.extract(cut)
      assert(r.status.startsWith("quarantine:"), s"cut at $n: ${r.status}")
      assert(r.text.isEmpty, s"cut at $n leaked partial text")
    }
  }

  test("encrypted documents quarantine before any object parse") {
    val pdf = onePagePdf("BT (secret) Tj ET".getBytes(ascii),
      extraTrailer = " /Encrypt 9 0 R")
    val r = Pdf.extract(pdf)
    assert(r.status == "quarantine:encrypted" && r.text.isEmpty)
  }

  test("standard security: empty-user-password RC4 decrypts; real passwords refuse") {
    // build a permissions-only encrypted PDF (owner pw set, user pw
    // empty — the population every viewer opens without a prompt):
    // O per Algorithm 3, U per Algorithm 5, R 3 / V 2 / 128-bit
    val S = Pdf.StdSecurity
    def padPw(pw: String) = (pw.getBytes(ascii) ++ S.Pad).take(32)
    var h = S.md5(padPw("owner-secret"))
    (0 until 50).foreach(_ => h = S.md5(h.take(16)))
    val rc4Key = h.take(16)
    var o = S.rc4(rc4Key, padPw(""))
    (1 to 19).foreach(i => o = S.rc4(rc4Key.map(b => (b ^ i).toByte), o))
    val id0 = Array.fill[Byte](16)(0x42)
    val perm = -44
    val fileKey = S.deriveKey(o, perm, id0, 3, 128)
    val u = S.expectedU(fileKey, id0, 3) ++ Array.fill[Byte](16)(0)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val content = "BT (secret but readable) Tj ET".getBytes(ascii)
    val encContent = S.rc4(S.objectKey(fileKey, 4, 0), content)
    def trailerFor(uEntry: Array[Byte], extra: String = "") =
      s" /Encrypt << /Filter /Standard /V 2 /R 3 /Length 128$extra" +
        s" /O <${hex(o)}> /U <${hex(uEntry)}> /P $perm >>" +
        s" /ID [<${hex(id0)}> <${hex(id0)}>]"
    val r = Pdf.extract(onePagePdf(encContent,
      extraTrailer = trailerFor(u)))
    assert(r.status == "ok" && r.text == "secret but readable",
      s"got ${r.status} '${r.text}'")
    // a REAL user password (U no longer matches the empty-pw key)
    val uWrong = u.clone(); uWrong(0) = (uWrong(0) ^ 0x5A).toByte
    assert(Pdf.extract(onePagePdf(encContent,
      extraTrailer = trailerFor(uWrong))).status == "quarantine:encrypted")
    // V4/R4 with the AESV2 crypt filter DECRYPTS (AES-128-CBC, IV +
    // PKCS#5; same empty-password authentication, R4 key derivation)
    val key4 = S.deriveKey(o, perm, id0, 4, 128)
    val u4 = S.expectedU(key4, id0, 4) ++ Array.fill[Byte](16)(0)
    val aesContent = S.aesEncrypt(
      S.objectKey(key4, 4, 0, aes = true), content)
    val aesTrailer = s" /Encrypt << /Filter /Standard /V 4 /R 4 " +
      s"/Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
      s"/StmF /StdCF /StrF /StdCF" +
      s" /O <${hex(o)}> /U <${hex(u4)}> /P $perm >>" +
      s" /ID [<${hex(id0)}> <${hex(id0)}>]"
    val ra = Pdf.extract(onePagePdf(aesContent, extraTrailer = aesTrailer))
    assert(ra.status == "ok" && ra.text == "secret but readable",
      s"aesv2 got ${ra.status} '${ra.text}'")
    // ...with a wrong /U the same file refuses (real password)
    val u4w = u4.clone(); u4w(3) = (u4w(3) ^ 0x11).toByte
    val aesWrong = aesTrailer.replace(hex(u4), hex(u4w))
    assert(Pdf.extract(onePagePdf(aesContent, extraTrailer = aesWrong))
      .status == "quarantine:encrypted")
    // AES-256 / V5 handlers stay out of scope, labeled distinctly
    val v5 = s" /Encrypt << /Filter /Standard /V 5 /R 6 /Length 256" +
      s" /O <${hex(o)}> /U <${hex(u)}> /P $perm >>" +
      s" /ID [<${hex(id0)}> <${hex(id0)}>]"
    assert(Pdf.extract(onePagePdf(encContent, extraTrailer = v5))
      .status == "quarantine:encrypted-unsupported")
    // an encrypted FLATE stream decrypts before inflating
    val flated = {
      val d = new java.util.zip.Deflater()
      d.setInput(content); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    val encFlated = S.rc4(S.objectKey(fileKey, 4, 0), flated)
    val rf = Pdf.extract(onePagePdf(encFlated,
      extraTrailer = trailerFor(u),
      streamDictExtra = " /Filter /FlateDecode"))
    assert(rf.status == "ok" && rf.text == "secret but readable",
      s"flate+rc4 got ${rf.status}")
  }

  test("standard security V5/R6: AES-256 empty-user-password decrypts; tampering refuses") {
    val S = Pdf.StdSecurity
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    // golden pin: Algorithm 2.B over the fixture user validation salt.
    // An accidental KDF edit must fail HERE, loudly — /U hashes in real
    // documents depend on exact round semantics (hash choice by
    // first-block mod 3, 64+ rounds, last-byte stop rule)
    val vSalt = Array.tabulate[Byte](8)(i => (i * 31 + 7).toByte)
    assert(hex(S.hash2B(Array.emptyByteArray, vSalt, Array.emptyByteArray))
      == "bc7328c995d618e863e8fe0df7048c5a949f80887afdbbec4f846df7ad6d449d")
    val fileKey = Array.tabulate[Byte](32)(i => (i * 7 + 1).toByte)
    val (u, ue, o, oe, perms) = S.buildV5(6, fileKey, -44)
    // the derive side inverts the build side: empty password
    // authenticates and unwraps the exact file key; /Perms verifies
    assert(S.deriveKeyV5(6, u, ue).exists(_.sameElements(fileKey)))
    assert(S.permsOk(fileKey, perms))
    val content = "BT (aes two five six) Tj ET".getBytes(ascii)
    val enc = S.aesEncrypt(fileKey, content)
    def trailerV5(r: Int, uE: Array[Byte], ueE: Array[Byte],
        oE: Array[Byte], oeE: Array[Byte], permsE: Array[Byte]) =
      s" /Encrypt << /Filter /Standard /V 5 /R $r /Length 256" +
        s" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>" +
        s" /StmF /StdCF /StrF /StdCF" +
        s" /O <${hex(oE)}> /U <${hex(uE)}>" +
        s" /OE <${hex(oeE)}> /UE <${hex(ueE)}>" +
        s" /Perms <${hex(permsE)}> /P -44 >>"
    val r6 = Pdf.extract(onePagePdf(enc,
      extraTrailer = trailerV5(6, u, ue, o, oe, perms)))
    assert(r6.status == "ok" && r6.text == "aes two five six",
      s"r6 got ${r6.status} '${r6.text}'")
    // R 5 (withdrawn Adobe extension: single SHA-256, no 2.B loop)
    val (u5, ue5, o5, oe5, perms5) = S.buildV5(5, fileKey, -44)
    val r5 = Pdf.extract(onePagePdf(enc,
      extraTrailer = trailerV5(5, u5, ue5, o5, oe5, perms5)))
    assert(r5.status == "ok" && r5.text == "aes two five six",
      s"r5 got ${r5.status} '${r5.text}'")
    // tampered /U validation hash = a real user password — refuses
    val uBad = u.clone(); uBad(0) = (uBad(0) ^ 0x5A).toByte
    assert(Pdf.extract(onePagePdf(enc,
      extraTrailer = trailerV5(6, uBad, ue, o, oe, perms)))
      .status == "quarantine:encrypted")
    // tampered /Perms = wrapped-permissions integrity failure — refuses
    val pBad = perms.clone(); pBad(2) = (pBad(2) ^ 0x11).toByte
    assert(Pdf.extract(onePagePdf(enc,
      extraTrailer = trailerV5(6, u, ue, o, oe, pBad)))
      .status == "quarantine:encrypted")
    // a V5 dict WITHOUT the AESV3 crypt filter stays unsupported
    val noCf = s" /Encrypt << /Filter /Standard /V 5 /R 6 /Length 256" +
      s" /O <${hex(o)}> /U <${hex(u)}> /UE <${hex(ue)}> /P -44 >>"
    assert(Pdf.extract(onePagePdf(enc, extraTrailer = noCf))
      .status == "quarantine:encrypted-unsupported")
    // fixture writer end-to-end, composed with every writer seam the
    // mix rotates (flate, LZW, indirect /Length, composite font)
    val txt = (1 to 60).map(i => s"w$i").mkString(" ")
    Seq(
      Pdf.render(txt, flate = true, indirectLength = false,
        encrypt = true, aes256 = true),
      Pdf.render(txt, flate = false, indirectLength = true, lzw = true,
        encrypt = true, aes256 = true),
      Pdf.render(txt, flate = false, indirectLength = false,
        encrypt = true, cmapFont = true, aes256 = true)).foreach { bytes =>
      val r = Pdf.extract(bytes)
      assert(r.status == "ok" && r.text.startsWith("w1 w2 "),
        s"fixture v5 got ${r.status}")
    }
  }

  test("unsupported filters and predictors quarantine with a reason") {
    val dct = Pdf.extract(onePagePdf("xxxx".getBytes(ascii),
      streamDictExtra = " /Filter /DCTDecode"))
    assert(dct.status == "quarantine:unsupported-filter:DCTDecode")
    // the TIFF predictor (2) stays out of scope; PNG (10-15) decodes
    val pred = Pdf.extract(onePagePdf("xxxx".getBytes(ascii),
      streamDictExtra = " /Filter /FlateDecode /DecodeParms << /Predictor 2 >>"))
    assert(pred.status == "quarantine:unsupported-predictor")
  }

  test("LZW: hand-pinned vector, encoder round-trip incl. width growth, damage refuses") {
    // "ABABAB" → codes (clear, 65, 66, 258, 258, EOD) at 9 bits,
    // MSB-packed — computed by hand from the PDF 32000-1 §7.4.4 tables
    val pinned = Array(0x80, 0x10, 0x48, 0x50, 0x28, 0x14, 0x04)
      .map(_.toByte)
    assert(Pdf.lzwEncode("ABABAB".getBytes(ascii)).toSeq == pinned.toSeq,
      "encoder diverged from the hand-packed vector")
    val viaPdf = Pdf.extract(onePagePdf(
      Pdf.lzwEncode("BT (lzw works) Tj ET".getBytes(ascii)),
      streamDictExtra = " /Filter /LZWDecode"))
    assert(viaPdf.status == "ok" && viaPdf.text == "lzw works")
    // width-growth + table-full round-trip: 40k seeded random bytes
    // push the dictionary through 9→10→11→12 bits and past 4096
    val rnd = new scala.util.Random(17)
    val big = new Array[Byte](40000)
    rnd.nextBytes(big)
    val enc = Pdf.lzwEncode(big)
    assert(java.util.Arrays.equals(Pdf.lzwDecode(enc, 1), big),
      "wide random round-trip diverged")
    // EOD-boundary alignment: sweep sizes so the final code lands the
    // table EXACTLY on each width boundary (the off-by-one the
    // encoder's mirror-grow fixes)
    (500 to 520).foreach { n =>
      val data = Array.tabulate(n)(i => ((i * 131) % 256).toByte)
      assert(java.util.Arrays.equals(
        Pdf.lzwDecode(Pdf.lzwEncode(data), 1), data),
        s"boundary n=$n diverged")
    }
    // truncated LZW (no EOD) refuses
    val cut = java.util.Arrays.copyOfRange(enc, 0, enc.length / 2)
    assert(Pdf.extract(onePagePdf(cut,
      streamDictExtra = " /Filter /LZWDecode")).status
      .startsWith("quarantine:"))
  }

  test("PDF 1.5: xref stream + Up predictor + object stream extracts") {
    // a fully modern PDF: catalog/pages/page live COMPRESSED inside an
    // /ObjStm; the xref is a /W [1 2 1] stream, Flate + PNG Up
    // predictor — the default shape every current writer emits
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    w("%PDF-1.5\n")
    // obj 4: the content stream, direct
    val c = "BT (hello modern xref) Tj ET".getBytes(ascii)
    val off4 = out.size()
    w(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n")
    out.write(c); w("\nendstream\nendobj\n")
    // obj 5: object stream holding objects 1 (catalog), 2 (pages),
    // 3 (page) as bare values after the (objnum, offset) header
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${o1.length + 1} 3 ${o1.length + o2.length + 2} "
    val stmPayload = (header + o1 + " " + o2 + " " + o3).getBytes(ascii)
    val stmData = deflate(stmPayload)
    val off5 = out.size()
    w(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${stmData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stmData); w("\nendstream\nendobj\n")
    // obj 6: the xref stream itself — /W [1 2 1] rows, Up-predicted
    val off6 = out.size()
    val rows: Array[Array[Int]] = Array(
      Array(0, 0, 0),      // 0: free
      Array(2, 5, 0),      // 1: in objstm 5, idx 0
      Array(2, 5, 1),      // 2: idx 1
      Array(2, 5, 2),      // 3: idx 2
      Array(1, off4, 0),   // 4: direct
      Array(1, off5, 0),   // 5: direct
      Array(1, off6, 0))   // 6: this stream
    val rowBytes = 4
    val raw = rows.flatMap { r =>
      Array(r(0), (r(1) >> 8) & 0xFF, r(1) & 0xFF, r(2)) }
    val filtered = new Array[Byte](rows.length * (rowBytes + 1))
    var i = 0
    while (i < rows.length) {
      filtered(i * 5) = 2 // Up filter
      var j = 0
      while (j < rowBytes) {
        val cur = raw(i * rowBytes + j)
        val up = if (i > 0) raw((i - 1) * rowBytes + j) else 0
        filtered(i * 5 + 1 + j) = ((cur - up) & 0xFF).toByte
        j += 1
      }
      i += 1
    }
    val xrefData = deflate(filtered)
    w(s"6 0 obj\n<< /Type /XRef /W [1 2 1] /Size 7 /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns 4 >> >>\nstream\n")
    out.write(xrefData); w("\nendstream\nendobj\n")
    w(s"startxref\n$off6\n%%EOF\n")
    val r = Pdf.extract(out.toByteArray)
    assert(r.status == "ok", s"modern pdf: ${r.status}")
    assert(r.text == "hello modern xref" && r.nPages == 1,
      s"got '${r.text}' (${r.nPages} pages)")
    // truncation of the modern file refuses like the classic one
    val cut = java.util.Arrays.copyOfRange(out.toByteArray, 0, off5 + 10)
    assert(Pdf.extract(cut).status.startsWith("quarantine:"))
  }

  test("a garbage xref stream quarantines as damaged, never misparses") {
    val body = "%PDF-1.5\n5 0 obj\n<< /Type /XRef >>\nstream\n" +
      "..\nendstream\nendobj\n"
    val pdf = (body + s"startxref\n9\n%%EOF\n").getBytes(ascii)
    assert(Pdf.extract(pdf).status == "quarantine:damaged")
  }

  test("non-PDF bytes quarantine as not-pdf; garbage never throws") {
    assert(Pdf.extract("not a pdf at all".getBytes(ascii))
      .status == "quarantine:not-pdf")
    assert(Pdf.extract(Array[Byte]()).status == "quarantine:not-pdf")
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      // force the magic sometimes so the walk goes deeper
      if (b.length > 8 && rnd.nextBoolean())
        "%PDF-1.4".getBytes(ascii).copyToArray(b)
      val r = Pdf.extract(b) // must not throw
      assert(r.status == "ok" || r.status.startsWith("quarantine:"))
    }
  }

  // ---------------------------------------------------------- operator

  /** One-page PDF with a Type0 font whose /ToUnicode is `cmap`. */
  private def pdfWithCmap(cmap: String, content: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    val c = content.getBytes(ascii)
    val cm = cmap.getBytes(ascii)
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offs(4) = out.size(); w(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n")
    out.write(c); w("\nendstream\nendobj\n")
    offs(5) = out.size(); w("5 0 obj\n<< /Type /Font /Subtype /Type0 " +
      "/BaseFont /T /Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n")
    offs(6) = out.size(); w(s"6 0 obj\n<< /Length ${cm.length} >>\nstream\n")
    out.write(cm); w("\nendstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    (1 to 6).foreach(n => w("%010d 00000 n \n".format(offs(n))))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  test("ToUnicode CMaps: bfchar, bfrange array form, unmapped codes; damage refuses") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <ffff>
        |endcodespacerange
        |1 beginbfchar
        |<0041> <0048>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> [<00570075> <0059> <005a>]
        |endbfrange
        |endcmap""".stripMargin
    // codes: 0x41→'H' (bfchar), 0x50→"Wu" (multi-unit array dst),
    // 0x51→'Y', 0x52→'Z', 0x60 unmapped → U+FFFD
    val content = "BT /F1 12 Tf <00410050005100520060> Tj ET"
    val r = Pdf.extract(pdfWithCmap(cmap, content))
    assert(r.status == "ok" && r.text == "HWuYZ�", s"got '${r.text}'")
    // hex-string dst range form with the advancing last byte
    val cmap2 =
      """begincmap
        |1 beginbfrange
        |<0061> <0063> <0041>
        |endbfrange
        |endcmap""".stripMargin
    val r2 = Pdf.extract(pdfWithCmap(cmap2,
      "BT /F1 12 Tf <006100620063> Tj ET"))
    assert(r2.status == "ok" && r2.text == "ABC", s"got '${r2.text}'")
    // a truncated CMap refuses — never silently-wrong text
    val broken = "begincmap 1 beginbfchar <0041> "
    assert(Pdf.extract(pdfWithCmap(broken, content))
      .status == "quarantine:damaged")
    // a font WITHOUT /ToUnicode under 1-byte codes keeps the byte path
    val noCmapPdf = {
      val base = pdfWithCmap(cmap, "BT /F1 12 Tf (plain) Tj ET")
      // swap the Type0 font for a simple one by rebuilding via the
      // one-page helper: simple fonts take the StandardEncoding path
      onePagePdf("BT (plain) Tj ET".getBytes(ascii))
    }
    assert(Pdf.extract(noCmapPdf).text == "plain")
  }

  test("multimodal_pdf_ingest: file form agrees with the in-memory form, idempotent") {
    import spark.implicits._
    val inMem = Pdf.pdfText(spark, sfDir)
      .where(col("status") === "ok")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val fromFiles = Pdf.docsFromPdf(spark, sfDir).collect()
    assert(fromFiles.nonEmpty && fromFiles.length == inMem.size)
    fromFiles.foreach { r =>
      assert(r.getString(1) == "ok", s"doc ${r.getLong(0)}: ${r.getString(1)}")
      assert(inMem(r.getLong(0)) == r.getString(4),
        s"file form diverged from in-memory form for doc ${r.getLong(0)}")
    }
    // _SUCCESS gate: the second run re-reads, never re-writes
    val landing = Pdf.synthPdfFiles(spark, sfDir)
    val before = new java.io.File(landing).listFiles().map(_.lastModified).max
    Pdf.docsFromPdf(spark, sfDir).count()
    val after = new java.io.File(landing).listFiles().map(_.lastModified).max
    assert(before == after, "re-run must not rewrite the landing dir")
  }

  test("multimodal_pdf_pages: page boundaries, md5 re-joins to the doc text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pdfpg").toString
    // 8 words/line, 20 lines/page: 170 words = 22 lines = 2 pages
    // (20 + 2); id 2 routes through the encrypted writer branch
    val many = (1 to 170).map(i => s"w$i").mkString(" ")
    Seq((2L, many), (7L, "just one page"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Pdf.pdfPages(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.count(_._1 == 2L) == 2 && rows.count(_._1 == 7L) == 1)
    val Seq(p1, p2) = rows.filter(_._1 == 2L).sortBy(_._2).toSeq
    assert(p1._2 == 1L && p2._2 == 2L)
    // page texts re-join (with the page separator) to the full doc
    // extraction — chunked and whole forms agree byte-for-byte
    val full = Pdf.extract(Pdf.render(many, flate = true,
      indirectLength = false, encrypt = true, aes = false))
    assert(full.status == "ok")
    assert(full.pages.map(_.length.toLong) == Seq(p1._3, p2._3))
    assert(full.pages.mkString("\n") == full.text)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(x: String) = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h(full.pages(0)) == p1._4 && h(full.pages(1)) == p2._4)
  }

  test("/Info metadata: text strings, D: dates, encrypted strings decrypt") {
    // plain writer round-trip
    val pdf = Pdf.render("alpha beta gamma delta epsilon", flate = true,
      indirectLength = false,
      info = Some(("alpha beta gamma delta", "web-7",
        "D:20260715120000Z")))
    val r = Pdf.extract(pdf)
    assert(r.status == "ok")
    assert(r.info("Title") == "alpha beta gamma delta")
    assert(r.info("Author") == "web-7")
    assert(Pdf.pdfDate(r.info("CreationDate")) == "2026-07-15T12:00:00Z")
    // STRING decryption through all three handlers (streams-only paths
    // never exercise this seam)
    Seq((false, false), (true, false), (false, true)).foreach {
      case (a128, a256) =>
        val enc = Pdf.extract(Pdf.render("words here", flate = false,
          indirectLength = false, encrypt = true, aes = a128,
          aes256 = a256, info = Some(("words here", "src", 
            "D:20260701120000Z"))))
        assert(enc.status == "ok" && enc.info("Title") == "words here",
          s"aes=$a128 aes256=$a256 got ${enc.info}")
    }
    // UTF-16BE BOM text string (hand-built hex string in the Info obj)
    val title16 = Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'J', 0x30, 0x42)
    val hex16 = title16.map("%02x".format(_)).mkString
    val content = "BT (x) Tj ET".getBytes(ascii)
    val withInfo = onePagePdf(content,
      extraTrailer = " /Info << /Title <" + hex16 + "> >>")
    val r16 = Pdf.extract(withInfo)
    assert(r16.status == "ok" && r16.info("Title") == "Jあ",
      s"got ${r16.info}")
    // D: date forms: offset, no-tz, malformed
    assert(Pdf.pdfDate("D:20260715120000+05'30'") ==
      "2026-07-15T12:00:00+05:30")
    assert(Pdf.pdfDate("D:20260715120000") == "2026-07-15T12:00:00")
    assert(Pdf.pdfDate("D:2026") == null)
    assert(Pdf.pdfDate("garbage") == null)
    // partial offsets must NOT silently drop (degrade, never guess)
    assert(Pdf.pdfDate("D:20260715120000+0530") == null)
    assert(Pdf.pdfDate("D:20260715120000+05'") == null)
    // a dangling /Info ref degrades to no metadata, text still extracts
    val dangling = Pdf.extract(onePagePdf(content,
      extraTrailer = " /Info 99 0 R"))
    assert(dangling.status == "ok" && dangling.info.isEmpty)
  }

  test("/Annots links: plain, encrypted, indirect, malformed-skipped") {
    // plain writer: links land on their pages
    val many = (1 to 170).map(i => s"w$i").mkString(" ") // 2 pages
    val r = Pdf.extract(Pdf.render(many, flate = true,
      indirectLength = false,
      links = Seq(1 -> "http://a.example/x", 2 -> "https://b.example/y")))
    assert(r.status == "ok")
    assert(r.links == Vector(1 -> "http://a.example/x",
      2 -> "https://b.example/y"), s"got ${r.links}")
    // encrypted writers: the URI string decrypts under the PAGE key
    Seq((false, false), (true, false), (false, true)).foreach {
      case (a128, a256) =>
        val e = Pdf.extract(Pdf.render("short doc", flate = false,
          indirectLength = false, encrypt = true, aes = a128,
          aes256 = a256, links = Seq(1 -> "http://enc.example/z")))
        assert(e.status == "ok" &&
          e.links == Vector(1 -> "http://enc.example/z"),
          s"aes=$a128/$a256 got ${e.links}")
    }
    // hand-built: an INDIRECT annot object decrypts under its OWN
    // number; a malformed annot (no /A) and a non-link annot are
    // SKIPPED without losing the good one or the text
    val content = "BT (x) Tj ET".getBytes(ascii)
    val extra = " /Annots [ 9 0 R << /Type /Annot /Subtype /Link >> " +
      "<< /Type /Annot /Subtype /Square >> ]"
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R$extra >>\nendobj\n")
    offs(4) = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content); w("\nendstream\nendobj\n")
    offs(9) = out.size()
    w("9 0 obj\n<< /Type /Annot /Subtype /Link /A << /S /URI /URI (http://ind.example/q) >> >>\nendobj\n")
    val xref = out.size()
    w("xref\n0 10\n0000000000 65535 f \n")
    (1 to 9).foreach { n =>
      w("%010d 00000 n \n".format(offs.getOrElse(n, 0)))
    }
    w(s"trailer\n<< /Size 10 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val ri = Pdf.extract(out.toByteArray)
    assert(ri.status == "ok" && ri.text == "x")
    assert(ri.links == Vector(1 -> "http://ind.example/q"),
      s"got ${ri.links}")
  }

  test("/Outlines: preorder levels, encrypted titles, cycles degrade") {
    val many = (1 to 170).map(i => s"w$i").mkString(" ") // 2 pages
    val r = Pdf.extract(Pdf.render(many, flate = true,
      indirectLength = false, outline = true))
    assert(r.status == "ok")
    assert(r.outline == Vector(1 -> "Contents", 2 -> "Page 1",
      2 -> "Page 2"), s"got ${r.outline}")
    // titles decrypt under each ITEM's own key through all handlers
    Seq((false, false), (true, false), (false, true)).foreach {
      case (a128, a256) =>
        val e = Pdf.extract(Pdf.render("short doc", flate = false,
          indirectLength = false, encrypt = true, aes = a128,
          aes256 = a256, outline = true))
        assert(e.status == "ok" &&
          e.outline == Vector(1 -> "Contents", 2 -> "Page 1"),
          s"aes=$a128/$a256 got ${e.outline}")
    }
    // a CYCLIC sibling chain degrades to an empty outline, text intact
    val content = "BT (x) Tj ET".getBytes(ascii)
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Outlines 5 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    offs(4) = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content); w("\nendstream\nendobj\n")
    offs(5) = out.size(); w("5 0 obj\n<< /Type /Outlines /First 6 0 R >>\nendobj\n")
    offs(6) = out.size(); w("6 0 obj\n<< /Title (a) /Next 7 0 R >>\nendobj\n")
    offs(7) = out.size(); w("7 0 obj\n<< /Title (b) /Next 6 0 R >>\nendobj\n")
    val xref = out.size()
    w("xref\n0 8\n0000000000 65535 f \n")
    (1 to 7).foreach(n => w("%010d 00000 n \n".format(offs(n))))
    w(s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val rc = Pdf.extract(out.toByteArray)
    assert(rc.status == "ok" && rc.text == "x" && rc.outline.isEmpty,
      s"got ${rc.status} ${rc.outline}")
  }

  test("/EmbeddedFiles: round trip, /Kids tree, damaged payload reported") {
    // fixture writer round trip through flate + encryption
    val payload = "hello attachment".getBytes(ascii)
    Seq((true, false, false), (false, true, false), (true, false, true))
      .foreach { case (fl, a128, a256) =>
        val r = Pdf.extract(Pdf.render("some words here", flate = fl,
          indirectLength = false, encrypt = a128 || a256, aes = a128,
          aes256 = a256, attachments = Seq("a.txt" -> payload)))
        assert(r.status == "ok", s"$fl/$a128/$a256: ${r.status}")
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(payload).map("%02x".format(_)).mkString
        assert(r.attachments == Vector(("a.txt", payload.length.toLong,
          hex)), s"$fl/$a128/$a256 got ${r.attachments}")
      }
    // hand-built: a /Kids name tree resolves; a TRUNCATED payload
    // stream reports (name, -1, null) instead of silently dropping
    val content = "BT (x) Tj ET".getBytes(ascii)
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ascii))
    val offs = scala.collection.mutable.LinkedHashMap[Int, Int]()
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Names << /EmbeddedFiles 5 0 R >> >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    offs(4) = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content); w("\nendstream\nendobj\n")
    offs(5) = out.size(); w("5 0 obj\n<< /Kids [6 0 R] >>\nendobj\n")
    offs(6) = out.size(); w("6 0 obj\n<< /Names [(deep.txt) 7 0 R (gone.txt) 8 0 R] >>\nendobj\n")
    offs(7) = out.size(); w("7 0 obj\n<< /Type /Filespec /F (deep.txt) /EF << /F 9 0 R >> >>\nendobj\n")
    offs(8) = out.size(); w("8 0 obj\n<< /Type /Filespec /F (gone.txt) /EF << /F 10 0 R >> >>\nendobj\n")
    offs(9) = out.size()
    w("9 0 obj\n<< /Length 4 >>\nstream\nDATA\nendstream\nendobj\n")
    offs(10) = out.size()
    // /Length claims 4096 bytes the file does not have → damaged
    w("10 0 obj\n<< /Length 4096 >>\nstream\nxx\nendstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 11\n0000000000 65535 f \n")
    (1 to 10).foreach(n => w("%010d 00000 n \n".format(offs(n))))
    w(s"trailer\n<< /Size 11 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = Pdf.extract(out.toByteArray)
    assert(r.status == "ok" && r.text == "x")
    val md = java.security.MessageDigest.getInstance("MD5")
    val dataHex = md.digest("DATA".getBytes(ascii)).map("%02x".format(_)).mkString
    assert(r.attachments == Vector(("deep.txt", 4L, dataHex),
      ("gone.txt", -1L, null)), s"got ${r.attachments}")
  }

  test("multimodal_pdf_text matches the layout oracle shape at sf0.001") {
    import spark.implicits._
    val got = Pdf.pdfText(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getString(1) == "ok"))
    // spot-check one row against a driver-side recompute
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val row = got.head
    val lines = Pdf.layoutLines(docs(row.getLong(0)))
    assert(row.getInt(2) == math.ceil(lines.length / 20.0).toInt)
    assert(row.getLong(3) == lines.mkString("\n").length.toLong)
  }
}
