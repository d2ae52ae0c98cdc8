package graft.operators

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** PDF text extraction (north-star extension; VERDICT r15/r16 item 1) —
  * the highest-volume real-corpus document format a training-data
  * pipeline ingests. Pure-JVM, no decode library:
  *
  *  - cross-reference walk from `startxref`, following `/Prev` chains
  *    (incremental updates; first-seen object wins and frees shadow —
  *    the newest-revision rule): classic TABLES, PDF 1.5+ xref
  *    STREAMS (`/W` big-endian fields over `/Index` subsections, PNG
  *    row predictors 10–15 per RFC 2083), and hybrid `/XRefStm`
  *    files;
  *  - a full miniature object model (dicts, arrays, names, numbers,
  *    literal + hex strings with every escape form, indirect
  *    references, streams with direct OR indirect `/Length`), plus
  *    compressed objects inside `/Type /ObjStm` containers (one
  *    cached inflate serves every member);
  *  - `/Root` → `/Pages` tree walk (recursive `/Kids`, cycle + depth
  *    guarded) to the page leaves;
  *  - content-stream text operators inside `BT`..`ET`: `Tj`, `TJ`
  *    (string elements concatenated; kerning numbers ignored), `'`,
  *    `"`, with `Td`/`TD`/`T*` as line breaks and `Tf` font tracking —
  *    shows under a font carrying a `/ToUnicode` CMap (§9.10.3:
  *    `bfchar` + `bfrange`, hex and array destinations, UTF-16BE)
  *    decode through it, 2-byte big-endian codes for Type0/Identity-H
  *    composite fonts;
  *  - stream filters: none, `/FlateDecode` (`java.util.zip.Inflater`
  *    — the [[org.apache.spark.sql.graft.DeflateLen]] precedent), and
  *    `/LZWDecode` (PDF 32000-1 §7.4.4 TIFF-variant, MSB-first 9→12
  *    bit codes with `EarlyChange`), each with the PNG predictor
  *    family.
  *
  * The standard security handler decrypts documents whose EMPTY user
  * password validates against `/U` — permissions-only "encryption",
  * the population every viewer opens without a prompt (see
  * [[StdSecurity]]): RC4 (V 1–2, R 2–3), the V 4 / R 4 crypt
  * filters with `/CFM /AESV2` (AES-128-CBC via the JDK cipher) or
  * `/V2`, and V 5 / R 5–6 `/CFM /AESV3` (AES-256 with the ISO
  * 32000-2 Algorithm 2.B SHA-2 KDF and `/Perms` integrity check).
  * Everything outside that
  * honest scope QUARANTINES with a reason instead of emitting partial
  * text — the [[graft.sources.MdbCatalog]] / [[Multimodal]]
  * discipline: genuinely password-protected documents
  * (`quarantine:encrypted`), non-standard security handlers
  * (`encrypted-unsupported`),
  * DCT/JBIG2/other filters, the TIFF predictor, and any structural
  * damage including truncation (`quarantine:damaged` — a cut-off body
  * must refuse, not return half a document silently).
  *
  * Byte → char mapping: printable ASCII (0x20–0x7E) is identity — the
  * view every mainstream extractor takes for the base-14 fonts — and
  * the HIGH range (0241–0373) maps through the Adobe StandardEncoding
  * table (PDF 32000-1 Annex D). Unmapped bytes become U+FFFD.
  *
  * The registered query synthesizes REAL multi-page PDF bytes from each
  * document's text (this sandbox ships no PDF corpus — the
  * [[Multimodal]] fixture convention), alternating FlateDecode /
  * plain streams and direct / indirect stream lengths so both branches
  * of each seam run at every scale, then extracts the text back and
  * emits layout-derived fields the DuckDB oracle recomputes from
  * `documents.text` with pure string ops. Render + extract is one
  * narrow `mapPartitions` projection — no shuffle, no driver state; on
  * a real corpus the input is a binary `pdf` column and the extract
  * half IS the operator, so the plan shape (scan → project) is already
  * the 100 TB shape.
  */
object Pdf {

  // ------------------------------------------------------------ layout

  private[graft] val WordsPerLine = 8
  private[graft] val LinesPerPage = 20

  /** The fixture layout contract, mirrored verbatim by the oracle:
    * whitespace-split words, `WordsPerLine` per line, lines joined by
    * newline (page boundaries join identically, so pagination never
    * changes the text).
    */
  private[graft] def layoutLines(text: String): Vector[String] = {
    val words = text.trim.split(' ').filter(_.nonEmpty)
    if (words.isEmpty) Vector("")
    else words.grouped(WordsPerLine).map(_.mkString(" ")).toVector
  }

  // ---------------------------------------------------------- renderer

  private def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach { ch =>
      ch match {
        case '\\' => sb.append("\\\\")
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case c if c >= 0x20 && c <= 0x7E => sb.append(c)
        case c if c.toInt < 0x100 => sb.append("\\%03o".format(c.toInt))
        case _ => sb.append('?') // callers quarantine non-Latin before render
      }
    }
    sb.toString
  }

  /** CMap-font show encoding: each char becomes the 2-byte code
    * 0x0300 + byte, rendered as a hex string — only a /ToUnicode-aware
    * extractor can round-trip it.
    */
  private def hexShow(sv: String): String =
    "<" + sv.map(c => "%04x".format(0x0300 + (c.toInt & 0xFF))).mkString + ">"

  /** The /ToUnicode CMap the composite-font writer ships: one bfrange
    * mapping code 0x0300+b back to char b (source range stays within
    * one high byte, destination last byte advances — the spec shape).
    */
  private[graft] val FixtureCmap: Array[Byte] =
    ("""/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <ffff>
      |endcodespacerange
      |1 beginbfrange
      |<0300> <03ff> <0000>
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end""".stripMargin)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** One page's content stream — rotates the three show forms (`Tj`,
    * `TJ` with a mid-line chunk split + kern number, `'`) so every
    * text operator the extractor implements is exercised on every
    * multi-line document. `cmapFont` switches the shows to 2-byte hex
    * codes under the composite font.
    */
  private def pageContent(lines: Seq[String],
      cmapFont: Boolean = false): Array[Byte] = {
    def lit(sv: String): String =
      if (cmapFont) hexShow(sv) else s"(${escapeLiteral(sv)})"
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf 72 720 Td\n")
    lines.zipWithIndex.foreach { case (line, j) =>
      if (j == 0) sb.append(s"${lit(line)} Tj\n")
      else if (j % 3 == 1 && line.length >= 2) {
        val cut = line.length / 2
        sb.append(s"T* [${lit(line.substring(0, cut))} -250 " +
          s"${lit(line.substring(cut))}] TJ\n")
      } else if (j % 3 == 2) sb.append(s"${lit(line)} '\n")
      else sb.append(s"T* ${lit(line)} Tj\n")
    }
    sb.append("ET")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    // BEST_SPEED: this is fixture synthesis — the EXTRACT side is the
    // operator; compression level changes neither the decoded text nor
    // the oracle, only the render cost the bench pays per run
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Fixed permissions-only encryption material for the fixture
    * writer: owner password set, user password EMPTY (the readable-
    * everywhere population), R 3 / V 2 / 128-bit. Computed once —
    * deterministic, so the fixture bytes are too.
    */
  private lazy val FixtureCrypt: (Array[Byte], Array[Byte], Array[Byte],
      Array[Byte], Int) = {
    val S = StdSecurity
    def padPw(pw: String) =
      (pw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        S.Pad).take(32)
    var h = S.md5(padPw("graft-fixture-owner"))
    (0 until 50).foreach(_ => h = S.md5(h.take(16)))
    val rc4Key = h.take(16)
    var o = S.rc4(rc4Key, padPw(""))
    (1 to 19).foreach(i => o = S.rc4(rc4Key.map(b => (b ^ i).toByte), o))
    val id0 = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    val perm = -44
    val fileKey = S.deriveKey(o, perm, id0, 3, 128)
    val u = S.expectedU(fileKey, id0, 3) ++ Array.fill[Byte](16)(0)
    (o, u, id0, fileKey, perm)
  }

  /** V4/R4 twin of [[FixtureCrypt]] (same /O, R4 key derivation) for
    * the AESV2 writer branch: (u4, key4).
    */
  private lazy val FixtureCryptV4: (Array[Byte], Array[Byte]) = {
    val S = StdSecurity
    val (o, _, id0, _, perm) = FixtureCrypt
    val key4 = S.deriveKey(o, perm, id0, 4, 128)
    (S.expectedU(key4, id0, 4) ++ Array.fill[Byte](16)(0), key4)
  }

  /** V 5 / R 6 (AES-256) fixture handler: deterministic 32-byte file
    * key wrapped for the empty user password — (fileKey, U, UE, O,
    * OE, Perms, P).
    */
  private[graft] lazy val FixtureCryptV6: (Array[Byte], Array[Byte],
      Array[Byte], Array[Byte], Array[Byte], Array[Byte], Int) = {
    val fileKey = Array.tabulate[Byte](32)(i => (i * 41 + 13).toByte)
    val perm = -44
    val (u, ue, o, oe, perms) = StdSecurity.buildV5(6, fileKey, perm)
    (fileKey, u, ue, o, oe, perms, perm)
  }

  /** Render `text` as a complete classic-xref PDF. `flate` compresses
    * the content streams (`lzw` wins when both are set); `indirectLength`
    * routes every stream's `/Length` through a forward indirect
    * reference; `encrypt` applies the fixture's permissions-only RC4
    * handler (all real-PDF shapes the extractor must resolve).
    */
  private[graft] def render(text: String, flate: Boolean,
      indirectLength: Boolean, lzw: Boolean = false,
      encrypt: Boolean = false, cmapFont: Boolean = false,
      aes: Boolean = false, aes256: Boolean = false,
      info: Option[(String, String, String)] = None,
      links: Seq[(Int, String)] = Nil,
      outline: Boolean = false,
      attachments: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    val pages = layoutLines(text).grouped(LinesPerPage).toVector
    val nPages = pages.length
    // object numbers: 1 catalog, 2 pages, 3 font, then per page i:
    // 4+2i page, 5+2i content; indirect lengths appended after
    val out = new java.io.ByteArrayOutputStream(4096)
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    val offsets = mutable.LinkedHashMap[Int, Int]()
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = out.size()
      w(s"$n 0 obj\n"); body; w("\nendobj\n")
    }
    w("%PDF-1.4\n%")
    out.write(Array(0xE2, 0xE3, 0xCF, 0xD3).map(_.toByte)); w("\n")
    // the catalog is written LAST (after the outline root's number is
    // known) — xref records offsets by object number, not write order
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"))
    val tuNum = if (indirectLength) 4 + 3 * nPages else 4 + 2 * nPages
    obj(3)(w(if (cmapFont)
      s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
        s"/Encoding /Identity-H /ToUnicode $tuNum 0 R >>"
      else "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val streamLens = new Array[Int](nPages)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      // link annotations ride as DIRECT dicts in the page, so their
      // URI strings encrypt under the PAGE object's key (the spec's
      // containing-object rule) and no extra object numbers are needed
      val annots = links.collect { case (pageNo, uri) if pageNo == i + 1 =>
        val uriTok =
          if (!encrypt) s"(${escapeLiteral(uri)})"
          else {
            val raw = uri.getBytes(ascii)
            val enc =
              if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1, raw)
              else if (aes) StdSecurity.aesEncrypt(StdSecurity.objectKey(
                FixtureCryptV4._2, pageNum, 0, aes = true), raw)
              else StdSecurity.rc4(StdSecurity.objectKey(
                FixtureCrypt._4, pageNum, 0), raw)
            "<" + enc.map("%02x".format(_)).mkString + ">"
          }
        s"<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] " +
          s"/A << /S /URI /URI $uriTok >> >>"
      }
      val annotsPart =
        if (annots.isEmpty) "" else annots.mkString(" /Annots [", " ", "]")
      obj(pageNum)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contNum 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >>$annotsPart >>"))
      val raw = pageContent(lines, cmapFont)
      val compressed =
        if (lzw) lzwEncode(raw) else if (flate) deflate(raw) else raw
      val data =
        if (!encrypt) compressed
        else if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1,
          compressed)
        else if (aes) StdSecurity.aesEncrypt(
          StdSecurity.objectKey(FixtureCryptV4._2, contNum, 0, aes = true),
          compressed)
        else StdSecurity.rc4(
          StdSecurity.objectKey(FixtureCrypt._4, contNum, 0), compressed)
      streamLens(i) = data.length
      val lenPart =
        if (indirectLength) s"/Length ${4 + 2 * nPages + i} 0 R"
        else s"/Length ${data.length}"
      val filterPart =
        if (lzw) " /Filter /LZWDecode"
        else if (flate) " /Filter /FlateDecode" else ""
      offsets(contNum) = out.size()
      w(s"$contNum 0 obj\n<< $lenPart$filterPart >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    if (indirectLength) (0 until nPages).foreach { i =>
      obj(4 + 2 * nPages + i)(w(streamLens(i).toString))
    }
    if (cmapFont) {
      val cm =
        if (!encrypt) FixtureCmap
        else if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1,
          FixtureCmap)
        else if (aes) StdSecurity.aesEncrypt(
          StdSecurity.objectKey(FixtureCryptV4._2, tuNum, 0, aes = true),
          FixtureCmap)
        else StdSecurity.rc4(
          StdSecurity.objectKey(FixtureCrypt._4, tuNum, 0), FixtureCmap)
      offsets(tuNum) = out.size()
      w(s"$tuNum 0 obj\n<< /Length ${cm.length} >>\nstream\n")
      out.write(cm)
      w("\nendstream\nendobj\n")
    }
    // document information dictionary — its STRINGS encrypt with the
    // same handler as streams (per-object key for V < 5, file key for
    // V 5), written as hex strings so the bytes survive verbatim
    val infoNum = info.map { case (title, author, cdate) =>
      val n = offsets.keys.max + 1
      def strTok(s: String): String =
        if (!encrypt) s"(${escapeLiteral(s)})"
        else {
          val raw = s.getBytes(ascii)
          val enc =
            if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1, raw)
            else if (aes) StdSecurity.aesEncrypt(
              StdSecurity.objectKey(FixtureCryptV4._2, n, 0, aes = true), raw)
            else StdSecurity.rc4(
              StdSecurity.objectKey(FixtureCrypt._4, n, 0), raw)
          "<" + enc.map("%02x".format(_)).mkString + ">"
        }
      obj(n)(w(s"<< /Title ${strTok(title)} /Author ${strTok(author)} " +
        s"/CreationDate ${strTok(cdate)} >>"))
      n
    }
    // outline tree: a root section + one item per page, as INDIRECT
    // objects in a /First//Next sibling chain — titles are text
    // strings encrypted under EACH ITEM'S OWN object number
    val outlineNum = if (!outline) None else {
      val base = offsets.keys.max + 1
      def strTok(txt: String, objN: Int): String =
        if (!encrypt) s"(${escapeLiteral(txt)})"
        else {
          val raw = txt.getBytes(ascii)
          val enc =
            if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1, raw)
            else if (aes) StdSecurity.aesEncrypt(StdSecurity.objectKey(
              FixtureCryptV4._2, objN, 0, aes = true), raw)
            else StdSecurity.rc4(StdSecurity.objectKey(
              FixtureCrypt._4, objN, 0), raw)
          "<" + enc.map("%02x".format(_)).mkString + ">"
        }
      val rootN = base
      val secN = base + 1
      val itemN = (i: Int) => base + 2 + i
      obj(rootN)(w(s"<< /Type /Outlines /First $secN 0 R " +
        s"/Last $secN 0 R /Count ${1 + nPages} >>"))
      obj(secN)(w(s"<< /Title ${strTok("Contents", secN)} " +
        s"/Parent $rootN 0 R /First ${itemN(0)} 0 R " +
        s"/Last ${itemN(nPages - 1)} 0 R /Count $nPages >>"))
      (0 until nPages).foreach { i =>
        val prev = if (i > 0) s" /Prev ${itemN(i - 1)} 0 R" else ""
        val next = if (i < nPages - 1) s" /Next ${itemN(i + 1)} 0 R" else ""
        obj(itemN(i))(w(s"<< /Title ${strTok(s"Page ${i + 1}", itemN(i))} " +
          s"/Parent $secN 0 R /Dest [${4 + 2 * i} 0 R /Fit]$prev$next >>"))
      }
      Some(rootN)
    }
    val outlinePart = outlineNum.map(n => s" /Outlines $n 0 R").getOrElse("")
    // embedded files: /Names name tree → Filespec → /EF /F stream.
    // Payload streams run the SAME filter/encryption pipeline as
    // content streams (flate per the writer flag, per-object key)
    val namesPart = if (attachments.isEmpty) "" else {
      val base = offsets.keys.max + 1
      val entries = attachments.zipWithIndex.map { case ((name, bytes), i) =>
        val fsN = base + 2 * i
        val efN = base + 2 * i + 1
        val compressed = if (flate) deflate(bytes) else bytes
        val data =
          if (!encrypt) compressed
          else if (aes256) StdSecurity.aesEncrypt(FixtureCryptV6._1,
            compressed)
          else if (aes) StdSecurity.aesEncrypt(StdSecurity.objectKey(
            FixtureCryptV4._2, efN, 0, aes = true), compressed)
          else StdSecurity.rc4(StdSecurity.objectKey(
            FixtureCrypt._4, efN, 0), compressed)
        val filterPart = if (flate) " /Filter /FlateDecode" else ""
        offsets(efN) = out.size()
        w(s"$efN 0 obj\n<< /Length ${data.length}$filterPart >>\nstream\n")
        out.write(data)
        w("\nendstream\nendobj\n")
        obj(fsN)(w(s"<< /Type /Filespec /F (${escapeLiteral(name)}) " +
          s"/EF << /F $efN 0 R >> >>"))
        s"(${escapeLiteral(name)}) $fsN 0 R"
      }
      s" /Names << /EmbeddedFiles << /Names [${entries.mkString(" ")}] >> >>"
    }
    obj(1)(w(s"<< /Type /Catalog /Pages 2 0 R$outlinePart$namesPart >>"))
    val xrefAt = out.size()
    val maxObj = offsets.keys.max
    w(s"xref\n0 ${maxObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxObj).foreach { n =>
      w("%010d 00000 n \n".format(offsets(n)))
    }
    val encPart =
      if (!encrypt) ""
      else {
        def hx(bs: Array[Byte]) = bs.map("%02x".format(_)).mkString
        val (o, u, id0, _, perm) = FixtureCrypt
        if (aes256) {
          val (_, u5, ue5, o5, oe5, perms5, p5) = FixtureCryptV6
          s" /Encrypt << /Filter /Standard /V 5 /R 6 /Length 256 " +
            s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
            s"/StmF /StdCF /StrF /StdCF " +
            s"/O <${hx(o5)}> /U <${hx(u5)}> " +
            s"/OE <${hx(oe5)}> /UE <${hx(ue5)}> " +
            s"/Perms <${hx(perms5)}> /P $p5 >> " +
            s"/ID [<${hx(id0)}> <${hx(id0)}>]"
        } else if (aes)
          s" /Encrypt << /Filter /Standard /V 4 /R 4 /Length 128 " +
            s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
            s"/StmF /StdCF /StrF /StdCF " +
            s"/O <${hx(o)}> /U <${hx(FixtureCryptV4._1)}> /P $perm >> " +
            s"/ID [<${hx(id0)}> <${hx(id0)}>]"
        else
          s" /Encrypt << /Filter /Standard /V 2 /R 3 /Length 128 " +
            s"/O <${hx(o)}> /U <${hx(u)}> /P $perm >> " +
            s"/ID [<${hx(id0)}> <${hx(id0)}>]"
      }
    val infoPart = infoNum.map(n => s" /Info $n 0 R").getOrElse("")
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R$infoPart$encPart >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Render `text` as a MODERN (PDF 1.5) file: content streams direct
    * and Flate'd, the catalog / pages / page dicts compressed inside a
    * `/Type /ObjStm` container, and the cross-reference as a
    * `/W [1 4 2]` xref STREAM behind the PNG Up predictor — the shape
    * every current writer emits, so the modern parse path runs under
    * the per-scale oracle, not just the golden spec.
    */
  private[graft] def renderModern(text: String): Array[Byte] = {
    val pages = layoutLines(text).grouped(LinesPerPage).toVector
    val nPages = pages.length
    // 1 catalog, 2 pages (both in the ObjStm); 3..2+P content streams
    // (direct); 3+P..2+2P page dicts (in the ObjStm); S objstm; X xref
    val objStmNum = 3 + 2 * nPages
    val xrefNum = 4 + 2 * nPages
    val out = new java.io.ByteArrayOutputStream(4096)
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    def w(str: String): Unit = out.write(str.getBytes(ascii))
    w("%PDF-1.5\n%")
    out.write(Array(0xE2, 0xE3, 0xCF, 0xD3).map(_.toByte)); w("\n")
    val contOff = new Array[Int](nPages)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val data = deflate(pageContent(lines))
      contOff(i) = out.size()
      w(s"${3 + i} 0 obj\n<< /Length ${data.length} " +
        "/Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    // object stream: catalog, pages, page dicts as bare values
    val kids = (0 until nPages).map(i => s"${3 + nPages + i} 0 R")
      .mkString(" ")
    val members: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $nPages >>") ++
        (0 until nPages).map(i => (3 + nPages + i) ->
          s"<< /Type /Page /Parent 2 0 R /Contents ${3 + i} 0 R >>")
    val body = new StringBuilder
    val pairs = members.map { case (n, v) =>
      val off = body.length
      body.append(v).append(' ')
      s"$n $off"
    }.mkString("", " ", " ")
    val stmPayload = (pairs + body.toString)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val stmData = deflate(stmPayload)
    val objStmOff = out.size()
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${members.length} " +
      s"/First ${pairs.length} /Length ${stmData.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    // xref stream: /W [1 4 2], rows Up-predicted then Flate'd
    val xrefOff = out.size()
    val rows: Seq[(Int, Int, Int)] =
      Seq((0, 0, 0)) ++                                  // 0: free
        members.take(2).zipWithIndex.map { case (_, i) =>
          (2, objStmNum, i) } ++                         // 1, 2
        (0 until nPages).map(i => (1, contOff(i), 0)) ++ // content
        (0 until nPages).map(i => (2, objStmNum, 2 + i)) ++ // page dicts
        Seq((1, objStmOff, 0), (1, xrefOff, 0))          // S, X
    val rowBytes = 7
    val raw = rows.flatMap { case (t, f2, f3) =>
      Seq(t, (f2 >>> 24) & 0xFF, (f2 >>> 16) & 0xFF, (f2 >>> 8) & 0xFF,
        f2 & 0xFF, (f3 >>> 8) & 0xFF, f3 & 0xFF)
    }.toArray
    val filtered = new Array[Byte](rows.length * (rowBytes + 1))
    var i = 0
    while (i < rows.length) {
      filtered(i * (rowBytes + 1)) = 2 // Up
      var j = 0
      while (j < rowBytes) {
        val cur = raw(i * rowBytes + j)
        val up = if (i > 0) raw((i - 1) * rowBytes + j) else 0
        filtered(i * (rowBytes + 1) + 1 + j) = ((cur - up) & 0xFF).toByte
        j += 1
      }
      i += 1
    }
    val xrefData = deflate(filtered)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /W [1 4 2] /Size ${xrefNum + 1} " +
      s"/Root 1 0 R /Length ${xrefData.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $rowBytes >> >>\nstream\n")
    out.write(xrefData)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------ object model

  private sealed trait PObj
  private case class PNum(v: Double) extends PObj { def int: Int = v.toInt }
  private case class PName(s: String) extends PObj
  private case class PStr(bytes: Array[Byte]) extends PObj
  private case class PArr(items: Vector[PObj]) extends PObj
  private case class PDict(m: Map[String, PObj]) extends PObj
  private case class PRef(num: Int, gen: Int) extends PObj
  private case class PBool(v: Boolean) extends PObj
  private case object PNull extends PObj
  private case class PStream(dict: PDict, at: Int, num: Int,
      gen: Int) extends PObj

  private final case class Quarantine(status: String)
      extends RuntimeException(status)

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Byte cursor + recursive-descent object reader. `allowRefs` is off
    * in content streams (no indirect references there; `R` would be an
    * operator).
    */
  private final class Lexer(val b: Array[Byte], var pos: Int,
      allowRefs: Boolean) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xFF

    def ws(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c == '%') { while (!eof && peek != '\n' && peek != '\r') pos += 1 }
        else if (isWs(c)) pos += 1
        else go = false
      }
    }

    /** Maximal run of regular characters (PDF keyword / operator). */
    def keyword(): String = {
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }

    def expect(kw: String): Unit = {
      ws()
      val got = keyword()
      if (got != kw) throw Quarantine("quarantine:damaged")
    }

    private def literalString(): Array[Byte] = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream(64)
      var depth = 1
      while (depth > 0) {
        if (eof) throw Quarantine("quarantine:damaged")
        val c = b(pos) & 0xFF; pos += 1
        if (c == '\\') {
          if (eof) throw Quarantine("quarantine:damaged")
          val e = b(pos) & 0xFF; pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (!eof && peek == '\n') pos += 1 // line continuation
            case '\n' => // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && !eof && peek >= '0' && peek <= '7') {
                v = v * 8 + (peek - '0'); pos += 1; k += 1
              }
              out.write(v & 0xFF)
            case other => out.write(other) // spec: stray escape = literal
          }
        } else if (c == '(') { depth += 1; out.write(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c) }
        else out.write(c)
      }
      out.toByteArray
    }

    private def hexString(): Array[Byte] = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream(32)
      var hi = -1
      var done = false
      while (!done) {
        if (eof) throw Quarantine("quarantine:damaged")
        val c = b(pos) & 0xFF; pos += 1
        if (c == '>') done = true
        else if (!isWs(c)) {
          val v = Character.digit(c, 16)
          if (v < 0) throw Quarantine("quarantine:damaged")
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi * 16) // odd digit: trailing 0 per spec
      out.toByteArray
    }

    private def name(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!eof && !isWs(peek) && !isDelim(peek)) {
        val c = b(pos) & 0xFF; pos += 1
        if (c == '#' && pos + 1 < b.length) {
          val v = Character.digit(b(pos) & 0xFF, 16) * 16 +
            Character.digit(b(pos + 1) & 0xFF, 16)
          if (v < 0) throw Quarantine("quarantine:damaged")
          sb.append(v.toChar); pos += 2
        } else sb.append(c.toChar)
      }
      PName(sb.toString)
    }

    private def number(): PNum = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      while (!eof && ((peek >= '0' && peek <= '9') || peek == '.')) pos += 1
      val s = new String(b, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      try PNum(s.toDouble)
      catch { case _: NumberFormatException =>
        throw Quarantine("quarantine:damaged") }
    }

    def value(): PObj = {
      ws()
      if (eof) throw Quarantine("quarantine:damaged")
      peek match {
        case '(' => PStr(literalString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PObj]
          ws()
          while (peek != ']') {
            items += value(); ws()
            if (eof) throw Quarantine("quarantine:damaged")
          }
          pos += 1
          PArr(items.result())
        case '/' => name()
        case '<' =>
          if (pos + 1 < b.length && (b(pos + 1) & 0xFF) == '<') {
            pos += 2
            val m = Map.newBuilder[String, PObj]
            ws()
            while (!(peek == '>' && pos + 1 < b.length &&
                (b(pos + 1) & 0xFF) == '>')) {
              if (eof || peek != '/') throw Quarantine("quarantine:damaged")
              val k = name().s
              m += k -> value()
              ws()
            }
            pos += 2
            PDict(m.result())
          } else PStr(hexString())
        case c if (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' =>
          val n1 = number()
          if (allowRefs && n1.v >= 0 && n1.v == math.floor(n1.v)) {
            // lookahead for "<int> R" → indirect reference
            val save = pos
            ws()
            if (!eof && peek >= '0' && peek <= '9') {
              val n2 = number()
              val save2 = pos
              ws()
              if (!eof && peek == 'R') {
                pos += 1
                if (eof || isWs(peek) || isDelim(peek))
                  return PRef(n1.int, n2.int)
              }
              pos = save2
              // n2 consumed but not a ref — rewind fully, the caller
              // will re-read it as its own token
              pos = save
            } else pos = save
          }
          n1
        case _ =>
          keyword() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case _ => throw Quarantine("quarantine:damaged")
          }
      }
    }
  }

  // --------------------------------------------------------- xref walk

  /** Where an object lives: directly in the file, or at index `idx`
    * inside compressed object stream `stm` (PDF 1.5 `/ObjStm`).
    */
  private sealed trait Loc
  private case class Direct(off: Int) extends Loc
  private case class InObjStm(stm: Int, idx: Int) extends Loc

  private def lastIndexOf(b: Array[Byte], pat: String): Int = {
    val p = pat.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = b.length - p.length
    while (i >= 0) {
      var j = 0
      while (j < p.length && b(i + j) == p(j)) j += 1
      if (j == p.length) return i
      i -= 1
    }
    -1
  }

  private def asInt(o: PObj): Int = o match {
    case PNum(v) => v.toInt
    case _ => throw Quarantine("quarantine:damaged")
  }

  /** Entries of one PDF 1.5 cross-reference STREAM located at `at`:
    * `/W`-described big-endian fields over `/Index` subsections, after
    * the filter + PNG-predictor decode. Merges entries first-seen-wins
    * (frees SHADOW — a newer revision's freed object must not
    * resurrect from an older table) and returns the stream dict (it
    * doubles as the trailer: /Root /Prev /Encrypt /Size).
    */
  private def readXrefStream(b: Array[Byte], at: Int,
      offsets: mutable.Map[Int, Loc],
      shadowed: mutable.Set[Int]): Map[String, PObj] = {
    val lx = new Lexer(b, at, allowRefs = true)
    lx.value(); lx.value() // objnum, generation
    lx.expect("obj")
    val dict = lx.value() match {
      case d: PDict => d
      case _ => throw Quarantine("quarantine:damaged")
    }
    lx.ws()
    if (lx.keyword() != "stream") throw Quarantine("quarantine:damaged")
    if (lx.peek == '\r') lx.pos += 1
    if (lx.peek == '\n') lx.pos += 1
    // /Length must be direct here: the entries needed to resolve an
    // indirect one live in this very stream
    val len = asInt(dict.m.getOrElse("Length",
      throw Quarantine("quarantine:damaged")))
    if (len < 0 || lx.pos + len > b.length)
      throw Quarantine("quarantine:damaged")
    val data = applyFilters(dict,
      java.util.Arrays.copyOfRange(b, lx.pos, lx.pos + len), identity)
    val w = dict.m.get("W") match {
      case Some(PArr(a)) if a.length >= 3 => a.take(3).map(asInt)
      case _ => throw Quarantine("quarantine:damaged")
    }
    if (w.exists(x => x < 0 || x > 8)) throw Quarantine("quarantine:damaged")
    val size = asInt(dict.m.getOrElse("Size",
      throw Quarantine("quarantine:damaged")))
    val index: Seq[(Int, Int)] = dict.m.get("Index") match {
      case Some(PArr(a)) if a.length % 2 == 0 =>
        a.map(asInt).grouped(2).map(p => (p(0), p(1))).toSeq
      case None => Seq((0, size))
      case _ => throw Quarantine("quarantine:damaged")
    }
    val rowBytes = w.sum
    var p = 0
    def be(width: Int): Long = {
      var v = 0L; var i = 0
      while (i < width) { v = (v << 8) | (data(p) & 0xFF); p += 1; i += 1 }
      v
    }
    index.foreach { case (start, count) =>
      if (count < 0 || count > 1000000) throw Quarantine("quarantine:damaged")
      (0 until count).foreach { k =>
        if (p + rowBytes > data.length) throw Quarantine("quarantine:damaged")
        val t = if (w(0) == 0) 1L else be(w(0))
        val f2 = be(w(1))
        val f3 = if (w(2) == 0) 0L else be(w(2))
        val objnum = start + k
        if (!offsets.contains(objnum) && !shadowed(objnum)) t match {
          case 0 => shadowed += objnum
          case 1 => offsets(objnum) = Direct(f2.toInt)
          case 2 => offsets(objnum) = InObjStm(f2.toInt, f3.toInt)
          case _ => // unknown type: spec says treat as null-reference
        }
      }
    }
    dict.m
  }

  /** Parse the cross-reference chain from `startxref`, following
    * `/Prev` (and hybrid `/XRefStm` pointers): classic tables AND
    * PDF 1.5 xref streams. Returns (objnum → location, merged trailer)
    * with first-seen-wins on both (newest revision rules; frees
    * shadow).
    */
  private def readXref(b: Array[Byte]): (Map[Int, Loc], Map[String, PObj]) = {
    val sx = lastIndexOf(b, "startxref")
    if (sx < 0) throw Quarantine("quarantine:damaged")
    val lx0 = new Lexer(b, sx + "startxref".length, allowRefs = false)
    lx0.ws()
    val first = lx0.value() match {
      case PNum(v) => v.toInt
      case _ => throw Quarantine("quarantine:damaged")
    }
    val offsets = mutable.Map[Int, Loc]()
    val shadowed = mutable.Set[Int]()
    val trailer = mutable.Map[String, PObj]()
    val seen = mutable.Set[Int]()
    var at = first
    var hops = 0
    while (at >= 0 && hops < 64) {
      if (at >= b.length || seen(at)) throw Quarantine("quarantine:damaged")
      seen += at
      val lx = new Lexer(b, at, allowRefs = true)
      lx.ws()
      val save = lx.pos
      val kw = lx.keyword()
      val tdict: Map[String, PObj] =
        if (kw == "xref") {
          var inSections = true
          while (inSections) {
            lx.ws()
            val p0 = lx.pos
            val tok = lx.keyword()
            if (tok == "trailer") inSections = false
            else {
              lx.pos = p0
              val start = asInt(lx.value())
              val count = asInt(lx.value())
              if (count < 0 || count > 1000000)
                throw Quarantine("quarantine:damaged")
              (0 until count).foreach { k =>
                val off = asInt(lx.value())
                lx.value() // generation — unused
                lx.ws()
                val t = lx.keyword()
                if (t != "n" && t != "f")
                  throw Quarantine("quarantine:damaged")
                val objnum = start + k
                if (!offsets.contains(objnum) && !shadowed(objnum)) {
                  if (t == "n") offsets(objnum) = Direct(off)
                  else shadowed += objnum
                }
              }
            }
          }
          val td = lx.value() match {
            case PDict(m) => m
            case _ => throw Quarantine("quarantine:damaged")
          }
          // hybrid-reference file: the classic table is supplemented by
          // an xref STREAM holding the compressed-object entries
          td.get("XRefStm").foreach { v =>
            readXrefStream(b, asInt(v), offsets, shadowed)
          }
          td
        } else {
          lx.pos = save
          if (lx.eof || lx.peek < '0' || lx.peek > '9')
            throw Quarantine("quarantine:damaged")
          readXrefStream(b, at, offsets, shadowed)
        }
      tdict.foreach { case (k, v) =>
        if (!trailer.contains(k)) trailer(k) = v
      }
      at = tdict.get("Prev") match {
        case Some(PNum(v)) => hops += 1; v.toInt
        case _ => -1
      }
    }
    (offsets.toMap, trailer.toMap)
  }

  // ------------------------------------------------- standard security

  /** PDF standard security handler, the RC4 subset (PDF 32000-1 §7.6.3,
    * Algorithms 2/4/5; V 1–2, R 2–3): derive the file key from the
    * EMPTY user password and authenticate it against `/U`. Covers the
    * large population of "encrypted" PDFs that only set owner
    * permissions — every viewer opens them without a prompt, and so
    * does every mainstream extraction library. A document whose empty
    * user password does NOT validate is genuinely password-protected
    * and stays `quarantine:encrypted`; AES handlers (V ≥ 4) quarantine
    * as `encrypted-unsupported`. Only STREAMS are decrypted — the text
    * path never reads dictionary strings.
    */
  private[graft] object StdSecurity {
    val Pad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
      0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
      0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

    def md5(parts: Array[Byte]*): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(md.update)
      md.digest()
    }

    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val sBox = Array.tabulate(256)(_.toByte)
      var j = 0
      var i = 0
      while (i < 256) {
        j = (j + (sBox(i) & 0xFF) + (key(i % key.length) & 0xFF)) & 0xFF
        val t = sBox(i); sBox(i) = sBox(j); sBox(j) = t
        i += 1
      }
      val out = new Array[Byte](data.length)
      var a = 0; var b = 0; var k = 0
      while (k < data.length) {
        a = (a + 1) & 0xFF
        b = (b + (sBox(a) & 0xFF)) & 0xFF
        val t = sBox(a); sBox(a) = sBox(b); sBox(b) = t
        out(k) = (data(k) ^
          sBox(((sBox(a) & 0xFF) + (sBox(b) & 0xFF)) & 0xFF)).toByte
        k += 1
      }
      out
    }

    /** Algorithm 2 with the empty user password. For R ≥ 4 with
      * `/EncryptMetadata false` the spec appends 0xFFFFFFFF before
      * hashing.
      */
    def deriveKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int,
        lengthBits: Int, encryptMetadata: Boolean = true): Array[Byte] = {
      val pLe = Array(p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF,
        (p >> 24) & 0xFF).map(_.toByte)
      val tail =
        if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xFF.toByte)
        else Array.emptyByteArray
      var h = md5(Pad, o.take(32), pLe, id0, tail)
      val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
      if (r >= 3) (0 until 50).foreach(_ => h = md5(h.take(n)))
      h.take(n)
    }

    /** Algorithms 4/5: what /U must equal under `key`. */
    def expectedU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
      if (r == 2) rc4(key, Pad)
      else {
        var x = rc4(key, md5(Pad, id0))
        (1 to 19).foreach { i =>
          x = rc4(key.map(b => (b ^ i).toByte), x)
        }
        x
      }

    def authenticates(key: Array[Byte], u: Array[Byte], id0: Array[Byte],
        r: Int): Boolean = {
      val exp = expectedU(key, id0, r)
      val cmp = if (r == 2) 32 else 16
      u.length >= cmp && (0 until cmp).forall(i => exp(i) == u(i))
    }

    /** Algorithm 1: per-object key; AES adds the "sAlT" suffix. */
    def objectKey(key: Array[Byte], num: Int, gen: Int,
        aes: Boolean = false): Array[Byte] = {
      val ext = Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte,
        ((gen >> 8) & 0xFF).toByte)
      val h = if (aes) md5(key, ext,
        Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)) else md5(key, ext)
      h.take(math.min(key.length + 5, 16))
    }

    /** AESV2 (AES-128-CBC, §7.6.2): leading 16-byte IV, PKCS#5-padded
      * body. Malformed geometry refuses as damaged.
      */
    def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      if (data.length < 32 || (data.length - 16) % 16 != 0)
        throw Quarantine("quarantine:damaged")
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        c.doFinal(data, 16, data.length - 16)
      } catch {
        case _: java.security.GeneralSecurityException =>
          throw Quarantine("quarantine:damaged")
      }
    }

    /** AESV2 encrypt — the fixture/spec side (deterministic IV from the
      * object key so fixture bytes are reproducible).
      */
    def aesEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val iv = md5(key, Array[Byte]('i', 'v'))
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }

    // ------------------------------------------- V 5 / AES-256 (AESV3)

    private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance(alg)
      parts.foreach(md.update)
      md.digest()
    }

    /** Raw AES-CBC without padding — the ISO 32000-2 KDF block and the
      * /UE / /OE wrappers are exact-multiple-of-16 payloads.
      */
    private def aesCbcNoPad(key: Array[Byte], iv: Array[Byte],
        data: Array[Byte], encrypt: Boolean): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    }

    /** ISO 32000-2 Algorithm 2.B (R 6) hardened hash: iterate
      * SHA-256/384/512 selected by the first AES-CBC block's value
      * mod 3 (256 ≡ 1 mod 3, so a byte-sum mod 3 is the same number),
      * at least 64 rounds, stopping once the last byte of the
      * encrypted block is ≤ rounds − 32. R 5 (the withdrawn Adobe
      * extension) uses a single SHA-256 — `hash2A`.
      */
    def hash2B(pwd: Array[Byte], salt: Array[Byte],
        udata: Array[Byte]): Array[Byte] = {
      var k = sha("SHA-256", pwd, salt, udata)
      var e: Array[Byte] = Array.emptyByteArray
      var i = 0
      while (i < 64 || (e(e.length - 1) & 0xFF) > i - 32) {
        val block = pwd ++ k ++ udata
        val k1 = new Array[Byte](block.length * 64)
        var j = 0
        while (j < 64) {
          System.arraycopy(block, 0, k1, j * block.length, block.length)
          j += 1
        }
        e = aesCbcNoPad(k.take(16), k.slice(16, 32), k1, encrypt = true)
        (e.take(16).map(_ & 0xFF).sum % 3: @unchecked) match {
          case 0 => k = sha("SHA-256", e)
          case 1 => k = sha("SHA-384", e)
          case 2 => k = sha("SHA-512", e)
        }
        i += 1
      }
      k.take(32)
    }

    def hash2A(pwd: Array[Byte], salt: Array[Byte],
        udata: Array[Byte]): Array[Byte] = sha("SHA-256", pwd, salt, udata)

    /** Algorithm 2.A for the EMPTY user password against a 48-byte /U
      * (32-byte hash ‖ 8-byte validation salt ‖ 8-byte key salt): on
      * match, unwrap the 32-byte file key from /UE (AES-256-CBC,
      * zero IV, no padding). None = genuinely password-protected.
      */
    def deriveKeyV5(r: Int, u48: Array[Byte],
        ue: Array[Byte]): Option[Array[Byte]] = {
      if (u48.length < 48 || ue.length != 32) return None
      val valSalt = u48.slice(32, 40)
      val keySalt = u48.slice(40, 48)
      val h = if (r == 6) hash2B(Array.emptyByteArray, valSalt,
        Array.emptyByteArray)
      else hash2A(Array.emptyByteArray, valSalt, Array.emptyByteArray)
      if (!(0 until 32).forall(i => h(i) == u48(i))) return None
      val inter = if (r == 6) hash2B(Array.emptyByteArray, keySalt,
        Array.emptyByteArray)
      else hash2A(Array.emptyByteArray, keySalt, Array.emptyByteArray)
      Some(aesCbcNoPad(inter, new Array[Byte](16), ue, encrypt = false))
    }

    /** /Perms integrity: AES-256-ECB decrypt with the file key must
      * expose "adb" at bytes 9–11 (ISO 32000-2 Algorithm 13 subset).
      */
    def permsOk(fileKey: Array[Byte], perms: Array[Byte]): Boolean = {
      if (perms.length != 16) return false
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
      val d = c.doFinal(perms)
      d(9) == 'a'.toByte && d(10) == 'd'.toByte && d(11) == 'b'.toByte
    }

    /** Fixture/spec writer side of V 5: build (U, UE, O, OE, Perms)
      * for the empty user password over deterministic salts and a
      * caller-chosen 32-byte file key.
      */
    def buildV5(r: Int, fileKey: Array[Byte], p: Int):
        (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
      def h(salt: Array[Byte], udata: Array[Byte]) =
        if (r == 6) hash2B(Array.emptyByteArray, salt, udata)
        else hash2A(Array.emptyByteArray, salt, udata)
      val uValSalt = Array.tabulate[Byte](8)(i => (i * 31 + 7).toByte)
      val uKeySalt = Array.tabulate[Byte](8)(i => (i * 13 + 5).toByte)
      val u = h(uValSalt, Array.emptyByteArray) ++ uValSalt ++ uKeySalt
      val ue = aesCbcNoPad(h(uKeySalt, Array.emptyByteArray),
        new Array[Byte](16), fileKey, encrypt = true)
      val oValSalt = Array.tabulate[Byte](8)(i => (i * 29 + 11).toByte)
      val oKeySalt = Array.tabulate[Byte](8)(i => (i * 37 + 3).toByte)
      val o = h(oValSalt, u) ++ oValSalt ++ oKeySalt
      val oe = aesCbcNoPad(h(oKeySalt, u),
        new Array[Byte](16), fileKey, encrypt = true)
      val permsPlain = Array[Byte](
        (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
        ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte,
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        'T', 'a', 'd', 'b', 'g', 'r', 'f', 't')
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
      (u, ue, o, oe, c.doFinal(permsPlain))
    }
  }

  // ----------------------------------------------------- object reader

  private final class Reader(b: Array[Byte], offsets: Map[Int, Loc],
      val trailer: Map[String, PObj]) {
    private val memo = mutable.Map[Int, PObj]()
    private val resolving = mutable.Set[Int]()
    private val objStmCache = mutable.Map[Int, Array[Byte]]()
    /** File encryption key once the empty user password validated;
      * null = unencrypted document. Streams decrypt with the
      * per-object key (Algorithm 1) BEFORE filters.
      */
    var encKey: Array[Byte] = null
    /** true = AESV2 crypt filter; false = RC4. */
    var encAes: Boolean = false
    /** true = V 5 (AESV3): the 32-byte file key IS the object key. */
    var encV5: Boolean = false

    def deref(o: PObj): PObj = o match {
      case PRef(n, _) => obj(n)
      case x => x
    }

    def obj(n: Int): PObj = memo.getOrElseUpdate(n, {
      if (resolving(n)) throw Quarantine("quarantine:damaged")
      resolving += n
      try {
        offsets.getOrElse(n, throw Quarantine("quarantine:damaged")) match {
          case Direct(off) => directObj(n, off)
          case InObjStm(stm, idx) => objStmObj(n, stm, idx)
        }
      } finally resolving -= n
    })

    private def directObj(n: Int, off: Int): PObj = {
      if (off < 0 || off >= b.length) throw Quarantine("quarantine:damaged")
      val lx = new Lexer(b, off, allowRefs = true)
      lx.value() match {
        case PNum(objn) if objn.toInt == n =>
          val gen = asInt(lx.value())
          lx.expect("obj")
          val v = lx.value()
          lx.ws()
          val save = lx.pos
          val kw = lx.keyword()
          if (kw == "stream") {
            // exactly one EOL after the keyword, then Length raw bytes
            if (lx.peek == '\r') lx.pos += 1
            if (lx.peek == '\n') lx.pos += 1
            v match {
              case d: PDict => PStream(d, lx.pos, n, gen)
              case _ => throw Quarantine("quarantine:damaged")
            }
          } else { lx.pos = save; v }
        case _ => throw Quarantine("quarantine:damaged")
      }
    }

    /** An object compressed inside a `/Type /ObjStm` container: the
      * decoded stream opens with N (objnum, offset) pairs, then the
      * bare object values start at `/First`. The container decode is
      * cached — one inflate serves every member.
      */
    private def objStmObj(n: Int, stm: Int, idx: Int): PObj = {
      val container = obj(stm) match {
        case s: PStream => s
        case _ => throw Quarantine("quarantine:damaged")
      }
      val data = objStmCache.getOrElseUpdate(stm, streamData(container))
      val count = asInt(deref(container.dict.m.getOrElse("N",
        throw Quarantine("quarantine:damaged"))))
      val first = asInt(deref(container.dict.m.getOrElse("First",
        throw Quarantine("quarantine:damaged"))))
      if (count < 0 || count > 1000000) throw Quarantine("quarantine:damaged")
      val hlx = new Lexer(data, 0, allowRefs = false)
      val pairs = (0 until count).map(_ => (asInt(hlx.value()),
        asInt(hlx.value())))
      // the xref entry names our index; validate and fall back to a
      // pair search (writers occasionally renumber)
      val off = pairs.lift(idx).filter(_._1 == n).orElse(
        pairs.find(_._1 == n)).map(_._2)
        .getOrElse(throw Quarantine("quarantine:damaged"))
      if (first + off < 0 || first + off >= data.length)
        throw Quarantine("quarantine:damaged")
      new Lexer(data, first + off, allowRefs = true).value()
    }

    /** Decoded stream payload: /Length resolved (possibly indirect),
      * bounds-checked (truncation refuses), filters + predictors
      * applied.
      */
    def streamData(s: PStream): Array[Byte] = {
      val len = deref(s.dict.m.getOrElse("Length",
        throw Quarantine("quarantine:damaged"))) match {
        case PNum(v) => v.toInt
        case _ => throw Quarantine("quarantine:damaged")
      }
      if (len < 0 || s.at + len > b.length)
        throw Quarantine("quarantine:damaged")
      val raw = java.util.Arrays.copyOfRange(b, s.at, s.at + len)
      val plain =
        if (encKey == null) raw
        else if (encV5) StdSecurity.aesDecrypt(encKey, raw)
        else if (encAes) StdSecurity.aesDecrypt(
          StdSecurity.objectKey(encKey, s.num, s.gen, aes = true), raw)
        else StdSecurity.rc4(
          StdSecurity.objectKey(encKey, s.num, s.gen), raw)
      applyFilters(s.dict, plain, deref)
    }

    /** String decryption mirrors [[streamData]]'s handler branches —
      * used by the /Info reader, keyed by the CONTAINING object.
      */
    def decryptString(b: Array[Byte], num: Int, gen: Int): Array[Byte] =
      if (encKey == null) b
      else if (encV5) StdSecurity.aesDecrypt(encKey, b)
      else if (encAes) StdSecurity.aesDecrypt(
        StdSecurity.objectKey(encKey, num, gen, aes = true), b)
      else StdSecurity.rc4(StdSecurity.objectKey(encKey, num, gen), b)
  }

  /** Filter chain over raw stream bytes: none / FlateDecode, with PNG
    * predictors 10–15 (RFC 2083 row filters — xref streams are almost
    * always `/Predictor 12 /Columns w`). TIFF predictor 2 and every
    * other filter quarantine with a reason.
    */
  private def applyFilters(dict: PDict, raw: Array[Byte],
      deref: PObj => PObj): Array[Byte] = {
    val filters: List[String] = deref(dict.m.getOrElse("Filter", PNull)) match {
      case PNull => Nil
      case PName(f) => List(f)
      case PArr(fs) => fs.toList.map(x => deref(x) match {
        case PName(f) => f
        case _ => throw Quarantine("quarantine:damaged")
      })
      case _ => throw Quarantine("quarantine:damaged")
    }
    val parmsRaw = deref(dict.m.getOrElse("DecodeParms",
      dict.m.getOrElse("DP", PNull)))
    val parms: List[Option[PDict]] = parmsRaw match {
      case PNull => List.fill(filters.length)(None)
      case d: PDict => Some(d) :: List.fill(math.max(filters.length - 1, 0))(None)
      case PArr(a) => a.toList.map(x => deref(x) match {
        case d: PDict => Some(d)
        case PNull => None
        case _ => throw Quarantine("quarantine:damaged")
      })
      case _ => throw Quarantine("quarantine:damaged")
    }
    if (filters.isEmpty && parmsRaw != PNull)
      throw Quarantine("quarantine:damaged")
    filters.zipAll(parms, "", None).foldLeft(raw) { case (data, (f, pm)) =>
      def intOr(k: String, d: Int): Int = pm.flatMap(_.m.get(k)) match {
        case Some(v) => asInt(deref(v))
        case None => d
      }
      // validate the predictor BEFORE paying the decode, so an
      // out-of-scope predictor reports itself even on damaged data
      def withPredictor(decode: => Array[Byte]): Array[Byte] = {
        val pred = intOr("Predictor", 1)
        if (pred != 1 && (pred < 10 || pred > 15))
          throw Quarantine("quarantine:unsupported-predictor")
        val decoded = decode
        if (pred == 1) decoded
        else {
          val colors = intOr("Colors", 1)
          val bpc = intOr("BitsPerComponent", 8)
          val columns = intOr("Columns", 1)
          val bpp = math.max(1, colors * bpc / 8)
          pngPredictor(decoded, columns * bpp, bpp)
        }
      }
      f match {
        case "FlateDecode" => withPredictor(inflate(data))
        case "LZWDecode" =>
          withPredictor(lzwDecode(data, intOr("EarlyChange", 1)))
        case "" => data
        case other => throw Quarantine(
          s"quarantine:unsupported-filter:$other")
      }
    }
  }

  /** PDF/TIFF LZW decode (PDF 32000-1 §7.4.4): MSB-first variable-width
    * codes 9→12 bits, ClearTable 256, EOD 257, dictionary entries from
    * 258, code width grows `EarlyChange` codes before the table would
    * overflow the current width (default 1 — the Adobe convention).
    * Malformed streams (code beyond the table, width overflow without
    * a clear, missing EOD at exhaustion) refuse as damaged.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    // dictionary as flat byte chains: (prefixCode, suffixByte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var tableSize = 258
    var bits = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev = -1
    def emit(code: Int): Byte = {
      // walk the chain onto a stack, emit in order, return first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= 258) {
        stack = suffix(c) :: stack
        c = prefix(c)
        if (stack.length > 4096) throw Quarantine("quarantine:damaged")
      }
      if (c > 255) throw Quarantine("quarantine:damaged")
      val first = c.toByte
      out.write(c)
      stack.foreach(b => out.write(b & 0xFF))
      first
    }
    var done = false
    while (!done) {
      while (bitCnt < bits && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xFF)
        bitCnt += 8
        pos += 1
      }
      if (bitCnt < bits) throw Quarantine("quarantine:damaged") // no EOD
      val code = ((bitBuf >>> (bitCnt - bits)) & ((1L << bits) - 1)).toInt
      bitCnt -= bits
      if (code == 256) { tableSize = 258; bits = 9; prev = -1 }
      else if (code == 257) done = true
      else if (prev < 0) {
        if (code > 255) throw Quarantine("quarantine:damaged")
        out.write(code)
        prev = code
      } else {
        if (code > tableSize) throw Quarantine("quarantine:damaged")
        val first: Byte =
          if (code < tableSize) emit(code)
          else { // the KwKwK case: entry being defined right now
            var c = prev
            while (c >= 258) c = prefix(c)
            if (c > 255) throw Quarantine("quarantine:damaged")
            val f = c.toByte
            // emit prev then its first byte
            emit(prev)
            out.write(f & 0xFF)
            f
          }
        if (tableSize < 4096) {
          prefix(tableSize) = prev
          suffix(tableSize) = first
          tableSize += 1
        }
        prev = code
        if (out.size() > (64 << 20)) throw Quarantine("quarantine:damaged")
      }
      if (!done && tableSize + earlyChange >= (1 << bits) && bits < 12)
        bits += 1
    }
    out.toByteArray
  }

  /** TIFF-variant LZW ENCODE — the renderer's half, so the fixture mix
    * exercises the decoder at every scale (and the spec round-trips
    * decoder against encoder, the ADPCM discipline).
    */
  private[graft] def lzwEncode(data: Array[Byte],
      earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var bits = 9
    val dict = mutable.Map[(Int, Byte), Int]()
    var next = 258
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << bits) | code
      bitCnt += bits
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt)
        bitCnt -= 8
      }
    }
    put(256) // lead with ClearTable, the Adobe writer convention
    var cur = -1
    data.foreach { b =>
      if (cur < 0) cur = b & 0xFF
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          if (next < 4096) { dict((cur, b)) = next; next += 1 }
          // the DECODER grows its width after consuming the code that
          // fills (1 << bits) - earlyChange, so the encoder must grow
          // in the same place
          if (next + earlyChange > (1 << bits) && bits < 12) bits += 1
          cur = b & 0xFF
      }
    }
    if (cur >= 0) {
      put(cur)
      // the decoder adds one more entry after consuming this code and
      // THEN sizes the EOD read — mirror that grow or the widths skew
      // by one exactly when the table sits at a boundary
      if (next < 4096) next += 1
      if (next + earlyChange > (1 << bits) && bits < 12) bits += 1
    }
    put(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** PNG row de-filtering (RFC 2083 §6): each row is a filter-type
    * byte + `rowBytes` filtered bytes; types None/Sub/Up/Average/Paeth
    * reconstruct against the left (`bpp` back) and up neighbors.
    */
  private def pngPredictor(data: Array[Byte], rowBytes: Int,
      bpp: Int): Array[Byte] = {
    if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0)
      throw Quarantine("quarantine:damaged")
    val nRows = data.length / (rowBytes + 1)
    val out = new Array[Byte](nRows * rowBytes)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowBytes + 1)) & 0xFF
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = data(src + i) & 0xFF
        val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val up = if (r > 0) out(dst - rowBytes + i) & 0xFF else 0
        val c = if (r > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xFF
          else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) / 2)
          case 4 =>
            val pr = a + up - c
            val pa = math.abs(pr - a)
            val pb = math.abs(pr - up)
            val pc = math.abs(pr - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => throw Quarantine("quarantine:damaged")
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw Quarantine("quarantine:damaged")
        out.write(buf, 0, n)
        if (out.size() > (64 << 20)) throw Quarantine("quarantine:damaged")
      }
    } catch {
      case _: java.util.zip.DataFormatException =>
        throw Quarantine("quarantine:damaged")
    } finally inf.end()
    out.toByteArray
  }

  // ------------------------------------------------- text extraction

  /** Adobe StandardEncoding, high range (PDF 32000-1 Annex D). */
  private val StdHigh: Map[Int, Char] = Map(
    0xA1 -> '¡', 0xA2 -> '¢', 0xA3 -> '£', 0xA4 -> '⁄',
    0xA5 -> '¥', 0xA6 -> 'ƒ', 0xA7 -> '§', 0xA8 -> '¤',
    0xA9 -> '\'', 0xAA -> '“', 0xAB -> '«', 0xAC -> '‹',
    0xAD -> '›', 0xAE -> 'ﬁ', 0xAF -> 'ﬂ',
    0xB1 -> '–', 0xB2 -> '†', 0xB3 -> '‡', 0xB4 -> '·',
    0xB6 -> '¶', 0xB7 -> '•', 0xB8 -> '‚', 0xB9 -> '„',
    0xBA -> '”', 0xBB -> '»', 0xBC -> '…', 0xBD -> '‰',
    0xBF -> '¿',
    0xC1 -> '`', 0xC2 -> '´', 0xC3 -> 'ˆ', 0xC4 -> '˜',
    0xC5 -> '¯', 0xC6 -> '˘', 0xC7 -> '˙', 0xC8 -> '¨',
    0xCA -> '˚', 0xCB -> '¸', 0xCD -> '˝', 0xCE -> '˛',
    0xCF -> 'ˇ', 0xD0 -> '—',
    0xE1 -> 'Æ', 0xE3 -> 'ª', 0xE8 -> 'Ł', 0xE9 -> 'Ø',
    0xEA -> 'Œ', 0xEB -> 'º',
    0xF1 -> 'æ', 0xF5 -> 'ı', 0xF8 -> 'ł', 0xF9 -> 'ø',
    0xFA -> 'œ', 0xFB -> 'ß')

  private def decodeText(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { byte =>
      val c = byte & 0xFF
      if (c < 0x80) sb.append(c.toChar)
      else sb.append(StdHigh.getOrElse(c, '�'))
    }
    sb.toString
  }

  /** One page font: `twoByte` for Type0/Identity-H composite fonts
    * (show-string codes are 2-byte big-endian), `cmap` the /ToUnicode
    * code → text mapping (null = no CMap; byte path applies).
    */
  private final case class PdfFont(twoByte: Boolean,
      cmap: Map[Int, String])

  /** /ToUnicode CMap parse (PDF 32000-1 §9.10.3): `beginbfchar` pairs
    * and `beginbfrange` runs (destination = hex string whose LAST byte
    * advances, or an explicit array), destinations decoded as UTF-16BE.
    * Structural damage refuses — a half-read CMap would emit silently
    * wrong text, which the quarantine discipline forbids.
    */
  private def parseCmap(data: Array[Byte]): Map[Int, String] = {
    val lx = new Lexer(data, 0, allowRefs = false)
    val out = Map.newBuilder[Int, String]
    val operands = mutable.ArrayBuffer[PObj]()
    def codeOf(bs: Array[Byte]): Int = {
      if (bs.length < 1 || bs.length > 3)
        throw Quarantine("quarantine:damaged")
      bs.foldLeft(0)((a, b) => (a << 8) | (b & 0xFF))
    }
    def utf16(bs: Array[Byte]): String =
      new String(bs, java.nio.charset.StandardCharsets.UTF_16BE)
    while ({ lx.ws(); !lx.eof }) {
      val c = lx.peek
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
          (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        operands += lx.value()
      } else {
        lx.keyword() match {
          case "beginbfchar" =>
            var go = true
            while (go) {
              lx.ws()
              if (lx.peek == '<') {
                val src = lx.value(); val dst = lx.value()
                (src, dst) match {
                  case (PStr(sb), PStr(db)) => out += codeOf(sb) -> utf16(db)
                  case _ => throw Quarantine("quarantine:damaged")
                }
              } else {
                if (lx.keyword() != "endbfchar")
                  throw Quarantine("quarantine:damaged")
                go = false
              }
            }
          case "beginbfrange" =>
            var go = true
            while (go) {
              lx.ws()
              if (lx.peek == '<') {
                val (lo, hi) = (lx.value(), lx.value()) match {
                  case (PStr(l), PStr(h)) => (codeOf(l), codeOf(h))
                  case _ => throw Quarantine("quarantine:damaged")
                }
                if (hi < lo || hi - lo > 65535)
                  throw Quarantine("quarantine:damaged")
                lx.value() match {
                  case PStr(db) =>
                    (0 to hi - lo).foreach { k =>
                      if (k == 0) out += lo -> utf16(db)
                      else {
                        // only the LAST byte advances (spec: ranges
                        // must not cross a byte boundary)
                        val last = (db(db.length - 1) & 0xFF) + k
                        if (last > 255) throw Quarantine("quarantine:damaged")
                        val bb = db.clone(); bb(bb.length - 1) = last.toByte
                        out += (lo + k) -> utf16(bb)
                      }
                    }
                  case PArr(items) =>
                    if (items.length != hi - lo + 1)
                      throw Quarantine("quarantine:damaged")
                    items.zipWithIndex.foreach {
                      case (PStr(db), k) => out += (lo + k) -> utf16(db)
                      case _ => throw Quarantine("quarantine:damaged")
                    }
                  case _ => throw Quarantine("quarantine:damaged")
                }
              } else {
                if (lx.keyword() != "endbfrange")
                  throw Quarantine("quarantine:damaged")
                go = false
              }
            }
          case _ => operands.clear()
        }
      }
    }
    out.result()
  }

  /** Text of one content stream: shows inside BT..ET accumulate into
    * the current line; Td/TD/T* (and the quote forms' implicit
    * next-line) commit it. `Tf` switches the current font: shows
    * under a /ToUnicode-carrying font decode through its CMap (2-byte
    * big-endian codes for Type0 fonts, the Identity-H shape; a
    * trailing odd byte is dropped, matching mainstream extractors);
    * everything else takes the StandardEncoding byte path.
    */
  private def contentText(content: Array[Byte],
      fonts: Map[String, PdfFont]): Vector[String] = {
    val lx = new Lexer(content, 0, allowRefs = false)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inBT = false
    var pendingBreak = false
    var shown = false
    var font: PdfFont = null
    val operands = mutable.ArrayBuffer[PObj]()
    def break(): Unit = pendingBreak = true
    def decodeShow(bs: Array[Byte]): String =
      if (font == null || font.cmap == null) decodeText(bs)
      else {
        val w = if (font.twoByte) 2 else 1
        val sb = new StringBuilder(bs.length)
        var i = 0
        while (i + w <= bs.length) {
          var code = 0
          var j = 0
          while (j < w) { code = (code << 8) | (bs(i + j) & 0xFF); j += 1 }
          sb.append(font.cmap.getOrElse(code, "�"))
          i += w
        }
        sb.toString
      }
    def show(s: String): Unit = if (inBT) {
      if (pendingBreak) {
        if (shown) { lines += cur.toString; cur.clear() }
        pendingBreak = false
      }
      cur.append(s)
      shown = true
    }
    def arrText(a: PArr): String =
      a.items.collect { case PStr(bs) => decodeShow(bs) }.mkString
    while ({ lx.ws(); !lx.eof }) {
      val c = lx.peek
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
          (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        operands += lx.value()
      } else {
        val op = lx.keyword()
        if (op.isEmpty) throw Quarantine("quarantine:damaged")
        op match {
          case "BT" => inBT = true; pendingBreak = false
          case "ET" => inBT = false
          case "Tf" => operands.collectFirst { case PName(f) => f }
            .foreach(f => font = fonts.getOrElse(f, null))
          case "Tj" => operands.lastOption.foreach {
            case PStr(bs) => show(decodeShow(bs))
            case _ =>
          }
          case "TJ" => operands.lastOption.foreach {
            case a: PArr => show(arrText(a))
            case _ =>
          }
          case "'" =>
            break()
            operands.lastOption.foreach {
              case PStr(bs) => show(decodeShow(bs))
              case _ =>
            }
          case "\"" =>
            break()
            operands.lastOption.foreach {
              case PStr(bs) => show(decodeShow(bs))
              case _ =>
            }
          case "Td" | "TD" | "T*" => if (inBT) break()
          case _ => // every other operator: positioning/state, ignored
        }
        operands.clear()
      }
    }
    if (shown) lines += cur.toString
    lines.result()
  }

  /** PDF TEXT STRING (ISO 32000-1 §7.9.2.2): UTF-16BE with BOM, else
    * byte encoding — PDFDocEncoding's ASCII range is identity, and the
    * fixture scope stops there (non-ASCII single-byte text strings map
    * to U+FFFD rather than guessing the Doc/Latin high range).
    */
  private[graft] def textString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else b.map { x =>
      val c = x & 0xFF
      if (c >= 0x20 && c <= 0x7E) c.toChar else '�'
    }.mkString

  private val PdfDateRe =
    "^D:(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(Z|[+\\-]\\d{2}'\\d{2}'?)?$".r

  /** `D:YYYYMMDDHHmmSS(Z|±HH'mm')` → ISO-8601 text. Anything outside
    * the full-precision form returns null (metadata degrades, never
    * guesses).
    */
  private[graft] def pdfDate(s: String): String = s match {
    case PdfDateRe(y, mo, d, h, mi, sec, tz) =>
      val suffix = tz match {
        case null => ""
        case "Z" => "Z"
        case o => o.substring(0, 3) + ":" + o.substring(4, 6)
      }
      s"$y-$mo-${d}T$h:$mi:$sec$suffix"
    case _ => null
  }

  private[graft] final case class Extracted(status: String, nPages: Int,
      text: String, pages: Vector[String] = Vector.empty,
      info: Map[String, String] = Map.empty,
      links: Vector[(Int, String)] = Vector.empty,
      outline: Vector[(Int, String)] = Vector.empty,
      attachments: Vector[(String, Long, String)] = Vector.empty)

  /** Full walk: header → xref → trailer → page tree → content text.
    * Any structural failure returns a quarantine row — never partial
    * text, never an exception across the operator boundary.
    */
  private[graft] def extract(bytes: Array[Byte]): Extracted = {
    try {
      if (bytes.length < 8 ||
          !new String(bytes, 0, 5,
            java.nio.charset.StandardCharsets.US_ASCII).equals("%PDF-"))
        return Extracted("quarantine:not-pdf", 0, "")
      val (offsets, trailer) = readXref(bytes)
      val rd = new Reader(bytes, offsets, trailer)
      trailer.get("Encrypt").foreach { e =>
        val enc = (try rd.deref(e) catch {
          case Quarantine(_) =>
            return Extracted("quarantine:encrypted", 0, "")
        }) match {
          case d: PDict => d
          case _ => return Extracted("quarantine:encrypted", 0, "")
        }
        def num(k: String, d: Int): Int = enc.m.get(k) match {
          case Some(v) => asInt(rd.deref(v))
          case None => d
        }
        val isStd = enc.m.get("Filter").contains(PName("Standard"))
        val v = num("V", 0)
        val r = num("R", 0)
        // V 1-2 = document-wide RC4; V 4 = crypt filters, where the
        // stream filter must be /StdCF with /CFM /AESV2 (AES-128-CBC)
        // or /V2 (RC4); V 5 (R 5-6) = AES-256 with /CFM /AESV3 and
        // SHA-2 key derivation (ISO 32000-2 Algorithm 2.B for R 6).
        def stmCfm: Option[PName] = enc.m.get("StmF").map(rd.deref) match {
          case Some(PName(cfName)) =>
            rd.deref(enc.m.getOrElse("CF", PNull)) match {
              case cf: PDict => rd.deref(cf.m.getOrElse(cfName, PNull)) match {
                case d: PDict => d.m.get("CFM") match {
                  case Some(n: PName) => Some(n)
                  case _ => None
                }
                case _ => None
              }
              case _ => None
            }
          case _ => None
        }
        var aesMode = false
        var v5Mode = false
        val vOk =
          if (v >= 1 && v <= 2 && r >= 2 && r <= 3) true
          else if (v == 4 && r == 4) stmCfm match {
            case Some(PName("AESV2")) => aesMode = true; true
            case Some(PName("V2")) => true
            case _ => false
          }
          else if (v == 5 && (r == 5 || r == 6)) stmCfm match {
            case Some(PName("AESV3")) => v5Mode = true; true
            case _ => false
          }
          else false
        if (!isStd || !vOk)
          return Extracted("quarantine:encrypted-unsupported", 0, "")
        if (v5Mode) {
          val (u48, ue) = (rd.deref(enc.m.getOrElse("U", PNull)),
            rd.deref(enc.m.getOrElse("UE", PNull))) match {
            case (PStr(ub), PStr(ueb)) => (ub, ueb)
            case _ => return Extracted("quarantine:encrypted", 0, "")
          }
          val fileKey = StdSecurity.deriveKeyV5(r, u48, ue) match {
            case Some(k) => k
            case None => return Extracted("quarantine:encrypted", 0, "")
          }
          // /Perms integrity when present: a key that opens but fails
          // the wrapped-permissions check is a tampered document
          rd.deref(enc.m.getOrElse("Perms", PNull)) match {
            case PStr(pb) =>
              val ok = try StdSecurity.permsOk(fileKey, pb) catch {
                case _: java.security.GeneralSecurityException => false
              }
              if (!ok) return Extracted("quarantine:encrypted", 0, "")
            case _ => ()
          }
          rd.encKey = fileKey
          rd.encV5 = true
        } else {
        val (o, u) = (rd.deref(enc.m.getOrElse("O", PNull)),
          rd.deref(enc.m.getOrElse("U", PNull))) match {
          case (PStr(ob), PStr(ub)) => (ob, ub)
          case _ => return Extracted("quarantine:encrypted", 0, "")
        }
        val perm = num("P", -1)
        val lengthBits = num("Length", 40)
        val id0 = trailer.get("ID").map(rd.deref) match {
          case Some(PArr(items)) if items.nonEmpty =>
            rd.deref(items.head) match {
              case PStr(idb) => idb
              case _ => return Extracted("quarantine:encrypted", 0, "")
            }
          case _ => return Extracted("quarantine:encrypted", 0, "")
        }
        val encMeta = enc.m.get("EncryptMetadata") match {
          case Some(PBool(bv)) => bv
          case _ => true
        }
        val key = StdSecurity.deriveKey(o, perm, id0, r, lengthBits, encMeta)
        // empty user password must VALIDATE — otherwise the document
        // is genuinely password-protected and refuses
        if (!StdSecurity.authenticates(key, u, id0, r))
          return Extracted("quarantine:encrypted", 0, "")
        rd.encKey = key
        rd.encAes = aesMode
        }
      }
      val root = rd.deref(trailer.getOrElse("Root",
        throw Quarantine("quarantine:damaged"))) match {
        case d: PDict => d
        case _ => throw Quarantine("quarantine:damaged")
      }
      val pagesRoot = rd.deref(root.m.getOrElse("Pages",
        throw Quarantine("quarantine:damaged")))
      // page dicts WITH their object numbers: direct /Annots strings
      // decrypt under the containing (= page) object's key
      val pages = Vector.newBuilder[(PDict, Int, Int)]
      val visited = mutable.Set[PObj]()
      def walk(node: PObj, depth: Int): Unit = {
        if (depth > 64 || visited(node)) throw Quarantine("quarantine:damaged")
        visited += node
        val (nodeNum, nodeGen) = node match {
          case PRef(n, g) => (n, g)
          case _ => (-1, 0)
        }
        rd.deref(node) match {
          case d: PDict =>
            d.m.get("Type") match {
              case Some(PName("Page")) => pages += ((d, nodeNum, nodeGen))
              case _ =>
                d.m.get("Kids") match {
                  case Some(k) => rd.deref(k) match {
                    case PArr(kids) => kids.foreach(walk(_, depth + 1))
                    case _ => throw Quarantine("quarantine:damaged")
                  }
                  case None => throw Quarantine("quarantine:damaged")
                }
            }
          case _ => throw Quarantine("quarantine:damaged")
        }
      }
      walk(pagesRoot, 0)
      val pageList = pages.result()
      val pageTexts = pageList.map { case (pg, _, _) =>
        // page fonts: name → (Type0?, /ToUnicode CMap). Resources are
        // read from the PAGE dict (inherited /Resources without fonts
        // simply take the byte path — documented scope)
        val fonts: Map[String, PdfFont] =
          rd.deref(pg.m.getOrElse("Resources", PNull)) match {
            case res: PDict => rd.deref(res.m.getOrElse("Font", PNull)) match {
              case fd: PDict => fd.m.map { case (name, fref) =>
                val f = rd.deref(fref) match {
                  case d: PDict => d
                  case _ => throw Quarantine("quarantine:damaged")
                }
                val two = f.m.get("Subtype").contains(PName("Type0"))
                val cmap = f.m.get("ToUnicode").map(rd.deref) match {
                  case Some(st: PStream) => parseCmap(rd.streamData(st))
                  case Some(_) => throw Quarantine("quarantine:damaged")
                  case None => null
                }
                name -> PdfFont(two, cmap)
              }
              case _ => Map.empty[String, PdfFont]
            }
            case _ => Map.empty[String, PdfFont]
          }
        val streams = pg.m.get("Contents") match {
          case None => Vector.empty[Array[Byte]]
          case Some(c) => rd.deref(c) match {
            case s: PStream => Vector(rd.streamData(s))
            case PArr(items) => items.map(i => rd.deref(i) match {
              case s: PStream => rd.streamData(s)
              case _ => throw Quarantine("quarantine:damaged")
            })
            case _ => throw Quarantine("quarantine:damaged")
          }
        }
        // array-of-streams concatenate with a separator byte (spec:
        // contents parts form ONE stream; a newline is the safe joint)
        val joined =
          if (streams.isEmpty) Array.emptyByteArray
          else streams.reduce((a, bb) => a ++ Array('\n'.toByte) ++ bb)
        contentText(joined, fonts).mkString("\n")
      }
      // /Annots link annotations: URI actions per page. Direct annot
      // dicts decrypt under the PAGE object's key, indirect ones under
      // their own. A malformed annotation is SKIPPED (links are
      // auxiliary — they never block text), but only structurally:
      // a string that fails DECRYPTION still throws like any stream.
      val links = Vector.newBuilder[(Int, String)]
      pageList.zipWithIndex.foreach { case ((pg, pgNum, pgGen), i) =>
        rd.deref(pg.m.getOrElse("Annots", PNull)) match {
          case PArr(items) => items.foreach { a =>
            val (keyNum, keyGen) = a match {
              case PRef(n, g) => (n, g)
              case _ => (pgNum, pgGen)
            }
            rd.deref(a) match {
              case ad: PDict if ad.m.get("Subtype").contains(PName("Link")) =>
                rd.deref(ad.m.getOrElse("A", PNull)) match {
                  case act: PDict if act.m.get("S").contains(PName("URI")) =>
                    act.m.get("URI").map(rd.deref) match {
                      case Some(PStr(b)) if keyNum >= 0 =>
                        links += ((i + 1,
                          textString(rd.decryptString(b, keyNum, keyGen))))
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          }
          case _ => ()
        }
      }
      // /Names → /EmbeddedFiles name tree: attachments. Tree nodes
      // carry direct /Names pairs or /Kids subtrees; each value is a
      // Filespec whose /EF /F stream runs the normal stream pipeline
      // (per-object decryption + filters). A structurally malformed
      // entry is skipped; a DAMAGED payload (truncation, bad filter)
      // is reported honestly as (name, -1, null) — attachments carry
      // bytes, so silently dropping a corrupt one would be data loss.
      val attachments = Vector.newBuilder[(String, Long, String)]
      try {
        rd.deref(root.m.getOrElse("Names", PNull)) match {
          case nd: PDict =>
            rd.deref(nd.m.getOrElse("EmbeddedFiles", PNull)) match {
              case efRoot: PDict =>
                val seenT = mutable.Set[PObj]()
                def walkTree(node: PDict, depth: Int): Unit = {
                  if (depth > 32) throw Quarantine("quarantine:damaged")
                  node.m.get("Names").map(rd.deref).foreach {
                    case PArr(items) => items.grouped(2).foreach {
                      case Seq(k, v) => (rd.deref(k), rd.deref(v)) match {
                        case (PStr(nb), fs: PDict) =>
                          val name = textString(nb)
                          try {
                            rd.deref(fs.m.getOrElse("EF", PNull)) match {
                              case ef: PDict =>
                                rd.deref(ef.m.getOrElse("F", PNull)) match {
                                  case st: PStream =>
                                    val bytes = rd.streamData(st)
                                    val md = java.security.MessageDigest
                                      .getInstance("MD5")
                                    attachments += ((name,
                                      bytes.length.toLong,
                                      md.digest(bytes)
                                        .map("%02x".format(_)).mkString))
                                  case _ => ()
                                }
                              case _ => ()
                            }
                          } catch {
                            case Quarantine(_) =>
                              attachments += ((name, -1L, null))
                          }
                        case _ => ()
                      }
                      case _ => ()
                    }
                    case _ => ()
                  }
                  node.m.get("Kids").map(rd.deref).foreach {
                    case PArr(kids) => kids.foreach { kref =>
                      if (seenT(kref)) throw Quarantine("quarantine:damaged")
                      seenT += kref
                      rd.deref(kref) match {
                        case kd: PDict => walkTree(kd, depth + 1)
                        case _ => ()
                      }
                    }
                    case _ => ()
                  }
                }
                walkTree(efRoot, 0)
              case _ => ()
            }
          case _ => ()
        }
      } catch { case Quarantine(_) => () }
      // /Outlines bookmark tree: preorder DFS over /First (children)
      // and /Next (siblings), cycle- and depth-guarded; titles decrypt
      // under each item's OWN object number. Outline damage degrades
      // to an empty outline — it never blocks text extraction.
      val outlineItems = Vector.newBuilder[(Int, String)]
      try {
        root.m.get("Outlines").foreach { oref =>
          val seen = mutable.Set[Int]()
          def walkOl(node: PObj, level: Int): Unit = node match {
            case PRef(n, g) =>
              if (level > 32 || seen.size > 4096 || seen(n))
                throw Quarantine("quarantine:damaged")
              seen += n
              rd.obj(n) match {
                case d: PDict =>
                  d.m.get("Title").foreach { t =>
                    rd.deref(t) match {
                      case PStr(b) => outlineItems += ((level,
                        textString(rd.decryptString(b, n, g))))
                      case _ => ()
                    }
                  }
                  d.m.get("First").foreach(walkOl(_, level + 1))
                  d.m.get("Next").foreach(walkOl(_, level))
                case _ => ()
              }
            case _ => () // direct outline nodes are out of scope
          }
          rd.deref(oref) match {
            case d: PDict => d.m.get("First").foreach(walkOl(_, 1))
            case _ => ()
          }
        }
      } catch { case Quarantine(_) => outlineItems.clear() }
      // /Info document metadata: decrypt strings with the containing
      // object's key, decode as PDF text strings. A damaged Info dict
      // degrades to NO metadata — it never blocks text extraction.
      val infoMap: Map[String, String] = try {
        trailer.get("Info") match {
          case Some(PRef(n, g)) => rd.obj(n) match {
            case d: PDict => d.m.collect { case (k, PStr(b)) =>
              k -> textString(rd.decryptString(b, n, g))
            }
            case _ => Map.empty[String, String]
          }
          case Some(d: PDict) => d.m.collect { case (k, PStr(b)) =>
            k -> textString(b)
          }
          case _ => Map.empty[String, String]
        }
      } catch { case Quarantine(_) => Map.empty[String, String] }
      Extracted("ok", pageTexts.length, pageTexts.mkString("\n"), pageTexts,
        infoMap, links.result(), outlineItems.result(),
        attachments.result())
    } catch {
      case Quarantine(s) => Extracted(s, 0, "")
      case scala.util.control.NonFatal(_) =>
        Extracted("quarantine:damaged", 0, "")
    }
  }

  // ------------------------------------------------------------ query

  private val NonAscii = "[^\\x20-\\x7E]".r

  /** `multimodal_pdf_text`: synthesize real PDF bytes per document —
    * ids ≡ 0 mod 5 take the MODERN writer (xref stream + predictor +
    * ObjStm), the rest the classic writer with flate on even ids and
    * indirect /Length on ids ≡ 0 mod 3, LZW content streams on
    * ids ≡ 1 mod 7, the permissions-only handler on ids ≡ 2 mod 11
    * (AESV2 crypt filters on the odd ones, AES-256 / R 6 on ids ≡ 0
    * mod 4, RC4 on the rest), and the
    * Type0 composite font with 2-byte /ToUnicode shows on ids ≡ 3
    * mod 13, so every parse seam runs at any sf —
    * extract the text back, emit the layout-derived fields.
    * Non-ASCII documents quarantine BEFORE render in both engines
    * (the fixture path covers printable ASCII; the StandardEncoding
    * high range is golden-tested in PdfSpec).
    */
  def pdfText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined)
            (id, "quarantine:non-ascii", 0, 0L, null: String)
          else {
            val pdf =
              if (id % 5 == 0) renderModern(text)
              else render(text, flate = id % 2 == 0,
                indirectLength = id % 3 == 0, lzw = id % 7 == 1,
                encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
                aes = id % 11 == 2 && id % 2 == 1,
                aes256 = id % 11 == 2 && id % 4 == 0)
            val r = extract(pdf)
            md.reset()
            val hex = md.digest(r.text.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString
            (id, r.status, r.nPages, r.text.length.toLong, hex)
          }
        }
      }
      .toDF("doc_id", "status", "n_pages", "n_chars_extracted", "text_md5")
  }

  /** Oracle: the layout contract re-derived from `documents.text` with
    * pure string ops — words, 8-per-line grouping, newline joins, page
    * count at 20 lines/page.
    */
  val pdfTextSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, text,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words,
       |         regexp_matches(text, '[^\\x20-\\x7E]') AS nonascii
       |  FROM documents
       |), l AS (
       |  SELECT doc_id, nonascii,
       |         CASE WHEN len(words) = 0 THEN ['']
       |              ELSE [array_to_string(words[i:i+${WordsPerLine - 1}], ' ')
       |                    for i in range(1, len(words)+1, $WordsPerLine)]
       |         END AS lines
       |  FROM w
       |), t AS (
       |  SELECT doc_id, nonascii, lines,
       |         array_to_string(lines, chr(10)) AS txt
       |  FROM l
       |)
       |SELECT doc_id,
       |       CASE WHEN nonascii THEN 'quarantine:non-ascii'
       |            ELSE 'ok' END AS status,
       |       CASE WHEN nonascii THEN 0
       |            ELSE CAST(ceil(len(lines) / $LinesPerPage.0) AS INT)
       |       END AS n_pages,
       |       CASE WHEN nonascii THEN 0
       |            ELSE CAST(length(txt) AS BIGINT)
       |       END AS n_chars_extracted,
       |       CASE WHEN nonascii THEN NULL ELSE md5(txt) END AS text_md5
       |FROM t""".stripMargin

  // -------------------------------------------------- file ingest form

  /** Landing-dir key: folds a probe render through EVERY writer branch
    * so any renderer edit invalidates the `_SUCCESS` idempotence gate
    * (the `synthWarcSegments` discipline).
    */
  private def pdfLandingDir(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(render("probe words for the key", flate = true,
      indirectLength = true, lzw = false, encrypt = false))
    md.update(render("probe", flate = false, indirectLength = false,
      lzw = true, encrypt = true))
    md.update(render("probe", flate = false, indirectLength = true,
      lzw = false, encrypt = false, cmapFont = true))
    md.update(render("probe", flate = false, indirectLength = false,
      lzw = false, encrypt = true, cmapFont = false, aes = true))
    md.update(render("probe", flate = false, indirectLength = false,
      lzw = false, encrypt = true, cmapFont = false, aes256 = true))
    md.update(renderModern("probe words for the key"))
    val key = md.digest().map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_pdf_fixture_$key"
  }

  /** Synthesize the PDF landing dir once per scale dir: one REAL `.pdf`
    * FILE per (printable-ASCII) document — the shape PDFs actually
    * arrive in — written per-partition with temp-file + rename and a
    * `_SUCCESS` marker (the O2 idempotence shape). Writer seams rotate
    * exactly as in [[pdfText]]. Fixture synthesis only; the OPERATOR is
    * everything after the landing dir.
    */
  private[graft] def synthPdfFiles(spark: SparkSession,
      dir: String): String = {
    val out = pdfLandingDir(dir)
    val marker = new java.io.File(out, "_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(out).mkdirs()
      import spark.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          it.foreach { case (id, text) =>
            if (text != null && NonAscii.findFirstIn(text).isEmpty) {
              val bytes =
                if (id % 5 == 0) renderModern(text)
                else render(text, flate = id % 2 == 0,
                  indirectLength = id % 3 == 0, lzw = id % 7 == 1,
                  encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
                  aes = id % 11 == 2 && id % 2 == 1,
                  aes256 = id % 11 == 2 && id % 4 == 0)
              val tmp = new java.io.File(out, s".doc-$id.tmp")
              val dst = new java.io.File(out, s"doc-$id.pdf")
              val fos = new java.io.FileOutputStream(tmp)
              try fos.write(bytes) finally fos.close()
              if (!dst.exists() && !tmp.renameTo(dst))
                throw new java.io.IOException(s"rename failed: $dst")
            }
          }
        }
      marker.createNewFile()
    }
    out
  }

  /** `multimodal_pdf_ingest`: the file-ingest form — a landing dir of
    * real `.pdf` files scanned with `binaryFile` (small files pack into
    * partitions via maxPartitionBytes, so task count tracks bytes, not
    * file count) and extracted per-partition. Same layout oracle as
    * [[pdfText]] over the ASCII documents; doc identity rides the file
    * name, the convention file-drop pipelines actually use. Scan →
    * project, no shuffle — at 100 TB the landing dir is the real
    * corpus and this plan is unchanged.
    */
  /** Shared (path, bytes) → result-row mapper for the batch and
    * streaming file-ingest forms (stateless, so stream/batch parity is
    * by construction).
    */
  private def extractFileRows(it: Iterator[(String, Array[Byte])])
      : Iterator[(Long, String, Int, Long, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    it.map { case (path, bytes) =>
      val base = path.substring(path.lastIndexOf('/') + 1)
      val id = base.stripPrefix("doc-").stripSuffix(".pdf").toLong
      val r = extract(bytes)
      md.reset()
      val hex = md.digest(r.text.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      (id, r.status, r.nPages, r.text.length.toLong, hex)
    }
  }

  private val FileIngestCols =
    Seq("doc_id", "status", "n_pages", "n_chars_extracted", "text_md5")

  def docsFromPdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val landing = synthPdfFiles(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(landing)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(extractFileRows)
      .toDF(FileIngestCols: _*)
  }

  /** Streaming twin of [[docsFromPdf]]: a landing dir watched with the
    * streaming `binaryFile` source, extraction on arrival. Stateless —
    * no watermark, no stream state — so batch parity is by
    * construction and exactly-once comes from the file-source log
    * alone (the [[graft.sources.WarcIngest.streamDataFrame]] shape).
    */
  def pdfStream(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.pdf")
      .load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(extractFileRows)
      .toDF(FileIngestCols: _*)
  }

  val docsFromPdfSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, text,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words
       |  FROM documents
       |  WHERE NOT regexp_matches(text, '[^\\x20-\\x7E]')
       |), l AS (
       |  SELECT doc_id,
       |         CASE WHEN len(words) = 0 THEN ['']
       |              ELSE [array_to_string(words[i:i+${WordsPerLine - 1}], ' ')
       |                    for i in range(1, len(words)+1, $WordsPerLine)]
       |         END AS lines
       |  FROM w
       |), t AS (
       |  SELECT doc_id, lines, array_to_string(lines, chr(10)) AS txt
       |  FROM l
       |)
       |SELECT doc_id, 'ok' AS status,
       |       CAST(ceil(len(lines) / $LinesPerPage.0) AS INT) AS n_pages,
       |       CAST(length(txt) AS BIGINT) AS n_chars_extracted,
       |       md5(txt) AS text_md5
       |FROM t""".stripMargin

  /** `multimodal_pdf_pages`: the page-CHUNKED form of [[pdfText]] —
    * one row per extracted page, the shape a RAG pipeline feeds to a
    * chunk index (page = the natural citation unit for PDFs; cf.
    * `rag_chunk_topk` over character windows in [[TextAnalysis]]).
    * Same writer mix, so every parse seam runs here too; documents
    * that quarantine emit NO page rows (both engines).
    */
  def pdfPages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined)
            Iterator.empty
          else {
            val pdf =
              if (id % 5 == 0) renderModern(text)
              else render(text, flate = id % 2 == 0,
                indirectLength = id % 3 == 0, lzw = id % 7 == 1,
                encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
                aes = id % 11 == 2 && id % 2 == 1,
                aes256 = id % 11 == 2 && id % 4 == 0)
            val r = extract(pdf)
            if (r.status != "ok") Iterator.empty
            else r.pages.iterator.zipWithIndex.map { case (pg, i) =>
              md.reset()
              val hex = md.digest(pg.getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
                .map("%02x".format(_)).mkString
              (id, (i + 1).toLong, pg.length.toLong, hex)
            }
          }
        }
      }
      .toDF("doc_id", "page_no", "n_chars_page", "page_md5")
  }

  /** Oracle: the layout contract re-derived per PAGE — lines of
    * [[WordsPerLine]] words, [[LinesPerPage]]-line slices, newline
    * joins.
    */
  val pdfPagesSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, text,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND NOT regexp_matches(text, '[^\\x20-\\x7E]')
       |), l AS (
       |  SELECT doc_id,
       |         CASE WHEN len(words) = 0 THEN ['']
       |              ELSE [array_to_string(words[i:i+${WordsPerLine - 1}], ' ')
       |                    for i in range(1, len(words)+1, $WordsPerLine)]
       |         END AS lines
       |  FROM w
       |), p AS (
       |  SELECT doc_id, lines,
       |         unnest(range(1,
       |           CAST(ceil(len(lines) / $LinesPerPage.0) AS INT) + 1))
       |           AS page_no
       |  FROM l
       |), pg AS (
       |  SELECT doc_id, page_no,
       |         array_to_string(
       |           lines[(page_no - 1) * $LinesPerPage + 1 :
       |                 page_no * $LinesPerPage], chr(10)) AS ptxt
       |  FROM p
       |)
       |SELECT doc_id, CAST(page_no AS BIGINT) AS page_no,
       |       CAST(length(ptxt) AS BIGINT) AS n_chars_page,
       |       md5(ptxt) AS page_md5
       |FROM pg""".stripMargin

  /** `multimodal_pdf_meta`: document-information extraction — /Info
    * dict through the trailer, strings decrypted per handler and
    * decoded as PDF text strings, `/CreationDate` parsed from the
    * `D:` form to ISO-8601. The fixture plants deterministic metadata
    * (title = first 4 words, author = the `source` column, creation
    * day keyed by doc_id) so the oracle re-derives every field; the
    * encrypted writer branches exercise STRING decryption, which
    * streams-only paths never touch.
    */
  def pdfMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text, source) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined)
            Iterator.empty
          else {
            val title = text.trim.split(' ').filter(_.nonEmpty)
              .take(4).mkString(" ")
            // author mirrors the oracle's coalesce + ASCII strip — a
            // null or non-ASCII source degrades identically, never NPEs
            val author = Option(source).getOrElse("")
              .replaceAll("[^\\x20-\\x7E]", "")
            val cdate = f"D:202607${id % 28 + 1}%02d120000Z"
            val pdf =
              if (id % 5 == 0) renderModern(text)
              else render(text, flate = id % 2 == 0,
                indirectLength = id % 3 == 0, lzw = id % 7 == 1,
                encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
                aes = id % 11 == 2 && id % 2 == 1,
                aes256 = id % 11 == 2 && id % 4 == 0,
                info = Some((title, author, cdate)))
            val r = extract(pdf)
            if (r.status != "ok") Iterator.empty
            else Iterator.single((id, r.info.getOrElse("Title", null),
              r.info.getOrElse("Author", null),
              r.info.get("CreationDate").map(pdfDate).orNull))
          }
        }
      }
      .toDF("doc_id", "title", "author", "created")
  }

  /** Oracle: the planted metadata re-derived from the documents table.
    * Modern-writer ids (≡ 0 mod 5) carry no Info dict → NULL fields.
    */
  val pdfMetaSql: String =
    s"""SELECT doc_id,
       |       CASE WHEN doc_id % 5 = 0 THEN NULL
       |            ELSE array_to_string(
       |              ([x for x in string_split(trim(text), ' ')
       |                if x <> ''])[1:4], ' ') END AS title,
       |       CASE WHEN doc_id % 5 = 0 THEN NULL
       |            ELSE regexp_replace(coalesce(source, ''),
       |                                '[^\\x20-\\x7E]', '', 'g')
       |       END AS author,
       |       CASE WHEN doc_id % 5 = 0 THEN NULL
       |            ELSE '2026-07-' ||
       |                 lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
       |                 'T12:00:00Z' END AS created
       |FROM documents
       |WHERE text IS NOT NULL
       |  AND NOT regexp_matches(text, '[^\\x20-\\x7E]')""".stripMargin

  /** `multimodal_pdf_links`: URI link-annotation extraction — the
    * crawl-seed surface of a PDF corpus (the [[Domains]] /
    * [[HtmlExtract]] frontier machinery consumes exactly this row
    * shape). The fixture plants one link on page 1 and one on the
    * LAST page of every classic-writer document; annotations ride as
    * direct dicts whose URI strings encrypt under the page object's
    * key, so the encrypted branches exercise the containing-object
    * rule for direct strings.
    */
  def pdfLinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined ||
              id % 5 == 0) Iterator.empty
          else {
            val nPages = (layoutLines(text).length + LinesPerPage - 1) /
              LinesPerPage
            val planted = Seq(
              1 -> s"http://ex${id % 7}.example/d$id",
              nPages -> s"https://ref.example/p${id % 13}")
            val pdf = render(text, flate = id % 2 == 0,
              indirectLength = id % 3 == 0, lzw = id % 7 == 1,
              encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
              aes = id % 11 == 2 && id % 2 == 1,
              aes256 = id % 11 == 2 && id % 4 == 0,
              links = planted)
            val r = extract(pdf)
            if (r.status != "ok") Iterator.empty
            else r.links.iterator.map { case (pageNo, uri) =>
              (id, pageNo.toLong, uri)
            }
          }
        }
      }
      .toDF("doc_id", "page_no", "uri")
  }

  /** Shared oracle CTE: the planted link plan re-derived (last page
    * from the layout contract); modern-writer ids carry no
    * annotations. Ends with a `links(doc_id, page_no, uri)` CTE so
    * riders can compose.
    */
  private val pdfLinksCte: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND NOT regexp_matches(text, '[^\\x20-\\x7E]')
       |    AND doc_id % 5 <> 0
       |), l AS (
       |  SELECT doc_id,
       |         greatest(1, CAST(ceil(
       |           (CASE WHEN len(words) = 0 THEN 1
       |                 ELSE CAST(ceil(len(words) / $WordsPerLine.0) AS INT)
       |            END) / $LinesPerPage.0) AS INT)) AS n_pages
       |  FROM w
       |), links AS (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS page_no,
       |         'http://ex' || (doc_id % 7) || '.example/d' || doc_id AS uri
       |  FROM l
       |  UNION ALL
       |  SELECT doc_id, CAST(n_pages AS BIGINT) AS page_no,
       |         'https://ref.example/p' || (doc_id % 13) AS uri
       |  FROM l
       |)""".stripMargin

  val pdfLinksSql: String =
    s"""$pdfLinksCte
       |SELECT doc_id, page_no, uri FROM links""".stripMargin

  /** `crawl_pdf_seeds`: the composition step — link URIs through the
    * [[Domains.withDomain]] registered-domain rule, aggregated into
    * the per-domain seed report a frontier consumes. Proves the PDF
    * and crawl families interoperate on the same row contract (the
    * `crawl_pipeline_report` convention).
    */
  def pdfSeeds(spark: SparkSession, dir: String): DataFrame =
    Domains.withDomain(pdfLinks(spark, dir)
        .withColumnRenamed("uri", "url"))
      .groupBy("registered_domain")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_links"))

  val pdfSeedsSql: String =
    s"""$pdfLinksCte,
       |d AS (
       |  SELECT doc_id, uri AS url,
       |         ${Domains.domainSelectSql}
       |  FROM links
       |)
       |SELECT registered_domain,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_links
       |FROM d GROUP BY registered_domain""".stripMargin

  /** `multimodal_pdf_outline`: the bookmark tree as preorder rows —
    * the table-of-contents surface (section-aware chunking reads it).
    * The fixture plants a "Contents" section owning one "Page i" item
    * per page; titles are text strings encrypted under each item's
    * own object number, the third distinct string-decryption keying
    * after /Info (its own dict) and direct /Annots (the page).
    */
  def pdfOutline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined ||
              id % 5 == 0) Iterator.empty
          else {
            val pdf = render(text, flate = id % 2 == 0,
              indirectLength = id % 3 == 0, lzw = id % 7 == 1,
              encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
              aes = id % 11 == 2 && id % 2 == 1,
              aes256 = id % 11 == 2 && id % 4 == 0,
              outline = true)
            val r = extract(pdf)
            if (r.status != "ok") Iterator.empty
            else r.outline.iterator.zipWithIndex.map {
              case ((level, title), i) =>
                (id, (i + 1).toLong, level.toLong, title)
            }
          }
        }
      }
      .toDF("doc_id", "ord", "level", "title")
  }

  val pdfOutlineSql: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND NOT regexp_matches(text, '[^\\x20-\\x7E]')
       |    AND doc_id % 5 <> 0
       |), l AS (
       |  SELECT doc_id,
       |         greatest(1, CAST(ceil(
       |           (CASE WHEN len(words) = 0 THEN 1
       |                 ELSE CAST(ceil(len(words) / $WordsPerLine.0) AS INT)
       |            END) / $LinesPerPage.0) AS INT)) AS n_pages
       |  FROM w
       |)
       |SELECT doc_id, CAST(1 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS level,
       |       'Contents' AS title
       |FROM l
       |UNION ALL
       |SELECT doc_id, CAST(i + 1 AS BIGINT) AS ord, CAST(2 AS BIGINT),
       |       'Page ' || i
       |FROM l, LATERAL (SELECT unnest(range(1, n_pages + 1)) AS i) g"""
      .stripMargin

  /** `multimodal_pdf_attach`: embedded-file extraction — the /Names
    * name tree to Filespec to /EF stream walk, with payload bytes
    * running the SAME stream pipeline as page contents (per-object
    * decryption, filters). The fixture plants one text attachment per
    * classic-writer document with a payload derived from the
    * document, so the oracle recomputes the exact bytes and md5.
    */
  def pdfAttach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null || NonAscii.findFirstIn(text).isDefined ||
              id % 5 == 0) Iterator.empty
          else {
            val payload = (s"payload for document $id: " +
              text.trim.split(' ').filter(_.nonEmpty).take(6)
                .mkString(" "))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val pdf = render(text, flate = id % 2 == 0,
              indirectLength = id % 3 == 0, lzw = id % 7 == 1,
              encrypt = id % 11 == 2, cmapFont = id % 13 == 3,
              aes = id % 11 == 2 && id % 2 == 1,
              aes256 = id % 11 == 2 && id % 4 == 0,
              attachments = Seq(s"att-$id.txt" -> payload))
            val r = extract(pdf)
            if (r.status != "ok") Iterator.empty
            else r.attachments.iterator.map { case (name, n, md5hex) =>
              (id, name, n, md5hex)
            }
          }
        }
      }
      .toDF("doc_id", "att_name", "n_bytes", "payload_md5")
  }

  val pdfAttachSql: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         [x for x in string_split(trim(text), ' ') if x <> '']
       |           AS words
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND NOT regexp_matches(text, '[^\\x20-\\x7E]')
       |    AND doc_id % 5 <> 0
       |), pay AS (
       |  SELECT doc_id,
       |         'payload for document ' || doc_id || ': ' ||
       |         array_to_string(words[1:6], ' ') AS payload
       |  FROM w
       |)
       |SELECT doc_id, 'att-' || doc_id || '.txt' AS att_name,
       |       CAST(length(payload) AS BIGINT) AS n_bytes,
       |       md5(payload) AS payload_md5
       |FROM pay""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("multimodal_pdf_text", pdfText _, Some(pdfTextSql)),
    Op("multimodal_pdf_ingest", docsFromPdf _, Some(docsFromPdfSql)),
    Op("multimodal_pdf_pages", pdfPages _, Some(pdfPagesSql)),
    Op("multimodal_pdf_meta", pdfMeta _, Some(pdfMetaSql)),
    Op("multimodal_pdf_links", pdfLinks _, Some(pdfLinksSql)),
    Op("crawl_pdf_seeds", pdfSeeds _, Some(pdfSeedsSql)),
    Op("multimodal_pdf_outline", pdfOutline _, Some(pdfOutlineSql)),
    Op("multimodal_pdf_attach", pdfAttach _, Some(pdfAttachSql)))
}
