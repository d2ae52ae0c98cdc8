package org.apache.spark.sql.graft

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: charset-aware HTTP body → text decode,
  * the ingest-side twin of the reference's metadata-driven typed decode
  * (`AccessExporter.createTable` reads the catalog's column types before
  * touching row bytes; a web ingest must read the DECLARED encoding
  * before touching body bytes). Real crawl segments are full of
  * windows-1252 / latin-1 / meta-charset pages — a UTF-8-only
  * `cast(body AS string)` turns every one of them into mojibake that
  * then poisons shingles, token counts, and dedup keys downstream.
  *
  * Returns `struct(text STRING, charset STRING)` where `charset` is the
  * lower-cased name of the encoding actually used, resolved in the
  * WHATWG-ish sniff order every mainstream fetcher implements:
  *
  *  1. byte-order mark: UTF-8 / UTF-16LE / UTF-16BE (BOM stripped —
  *     a BOM outranks headers because it is part of the payload);
  *  2. `charset=` parameter of the HTTP `Content-Type` header;
  *  3. `charset=` sniffed from the first 1024 bytes of the body (the
  *     `<meta charset>` / `http-equiv` declaration, matched on the raw
  *     lower-cased ASCII view, quotes optional — the prefix is ASCII in
  *     every encoding this tier targets);
  *  4. content sniff: strict UTF-8 validation; valid → utf-8,
  *     malformed → windows-1252 (the WHATWG fallback — every byte maps,
  *     so step 4 never fails and the decode is total).
  *
  * A declared-but-unknown charset name falls through to tier 4; a
  * declared known charset decodes with REPLACE (the header is
  * authoritative even over slightly damaged payloads — quarantining is
  * the WARC parser's job, not the decoder's). Deterministic by
  * construction: same bytes + header always yield the same (text,
  * charset) pair on every executor.
  *
  * Single primitive byte pass for the sniff; one charset decode for the
  * payload. Stays inside whole-stage codegen via `nullSafeCodeGen`
  * (same pattern as [[HtmlClean]]).
  */
case class HttpTextDecode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = HttpTextDecode.schema

  override def nullSafeEval(body: Any, ct: Any): Any =
    HttpTextDecode.decode(body.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = org.apache.spark.sql.graft.HttpTextDecode.decode($b, $c);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HttpTextDecode =
    copy(left = newLeft, right = newRight)
}

object HttpTextDecode {

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("charset", StringType, nullable = false)))

  private val Win1252 = Charset.forName("windows-1252")

  /** charset token from a lower-cased ASCII view: the chars after
    * "charset=" (optionally quoted), stopping at the first byte outside
    * [a-z0-9._:-] — covers every IANA name this tier meets.
    */
  private def charsetToken(s: Array[Byte], n: Int, fromExclusive: Int): String = {
    var i = fromExclusive
    if (i < n && (s(i) == '"' || s(i) == '\'')) i += 1
    val start = i
    while (i < n && {
      val b = s(i)
      (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
        b == '-' || b == '_' || b == '.' || b == ':'
    }) i += 1
    if (i == start) "" else new String(s, start, i - start, StandardCharsets.US_ASCII)
  }

  /** Lower-cased ASCII copy of the first `limit` bytes (non-ASCII bytes
    * pass through untouched — they can never match an ASCII pattern).
    */
  private def lowerPrefix(bytes: Array[Byte], limit: Int): Array[Byte] = {
    val n = math.min(bytes.length, limit)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      out(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    out
  }

  private def indexOfAscii(s: Array[Byte], pat: String, from: Int): Int = {
    val p = pat.getBytes(StandardCharsets.US_ASCII)
    var i = math.max(from, 0)
    while (i <= s.length - p.length) {
      var j = 0
      while (j < p.length && s(i + j) == p(j)) j += 1
      if (j == p.length) return i
      i += 1
    }
    -1
  }

  private def findCharsetEq(s: Array[Byte], from: Int, to: Int): Int = {
    val pat = "charset".getBytes(StandardCharsets.US_ASCII)
    val n = math.min(to, s.length)
    var i = math.max(from, 0)
    while (i <= n - pat.length) {
      var j = 0
      while (j < pat.length && s(i + j) == pat(j)) j += 1
      if (j == pat.length) {
        // skip optional whitespace around '='
        var k = i + pat.length
        while (k < n && (s(k) == ' ' || s(k) == '\t')) k += 1
        if (k < n && s(k) == '=') {
          var v = k + 1
          while (v < n && (s(v) == ' ' || s(v) == '\t')) v += 1
          return v
        }
      }
      i += 1
    }
    -1
  }

  /** WHATWG prescan discipline: a body `charset=` only counts INSIDE a
    * `<meta ...>` tag (scanned up to the tag's closing `>` or the
    * prescan limit) — body prose like "use charset=iso-8859-1" in an
    * undeclared page must not hijack the decode.
    */
  private def findMetaCharsetEq(head: Array[Byte]): Int = {
    var at = indexOfAscii(head, "<meta", 0)
    while (at >= 0) {
      var end = at
      while (end < head.length && head(end) != '>') end += 1
      val eq = findCharsetEq(head, at, end)
      if (eq >= 0) return eq
      at = indexOfAscii(head, "<meta", at + 5)
    }
    -1
  }

  /** The meta prescan is an HTML algorithm — it fires only when the
    * content type says (or does not deny) HTML/XML. An absent content
    * type is treated as HTML-ish, matching fetcher practice.
    */
  private def htmlish(ct: Array[Byte]): Boolean =
    ct.length == 0 || indexOfAscii(ct, "html", 0) >= 0 ||
      indexOfAscii(ct, "xml", 0) >= 0

  private def known(name: String): Charset =
    try { if (name.isEmpty) null else Charset.forName(name) }
    catch { case _: Exception => null }

  private def strictUtf8(bytes: Array[Byte], from: Int): String = {
    val dec: CharsetDecoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from))
      .toString
  }

  private def lenient(cs: Charset, bytes: Array[Byte], from: Int): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from))
      .toString
  }

  private def row(text: String, charset: String): InternalRow =
    InternalRow(UTF8String.fromString(text), UTF8String.fromString(charset))

  // ------------------------------------------- tier-4 CJK content sniff

  private val Sjis = known("shift_jis")
  private val EucKr = known("euc-kr")
  private val Gbk = known("gbk")

  /** Native-script evidence floor: a CJK claim needs at least this many
    * characters of the family's DISTINCTIVE script. A Latin page whose
    * sparse accents happen to form valid double-byte pairs stays under
    * it; a real CJK page of any useful length clears it.
    */
  private val MinNativeChars = 8

  private def strictOrNull(cs: Charset, bytes: Array[Byte]): String =
    try {
      cs.newDecoder().onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  private def countCp(s: String)(pred: Int => Boolean): Int = {
    var i = 0; var c = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (pred(cp)) c += 1
      i += Character.charCount(cp)
    }
    c
  }

  private def isHangul(cp: Int): Boolean =
    (cp >= 0xAC00 && cp <= 0xD7A3) || (cp >= 0x1100 && cp <= 0x11FF) ||
      (cp >= 0x3130 && cp <= 0x318F)
  private def isKana(cp: Int): Boolean =
    (cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0xFF61 && cp <= 0xFF9F)
  private def isHan(cp: Int): Boolean = cp >= 0x4E00 && cp <= 0x9FFF

  /** Undeclared-non-UTF-8 sniff for the three big CJK families, checked
    * most-distinctive-script first. Each claim needs (a) a STRICT full
    * decode under the family charset and (b) `MinNativeChars` of the
    * family's distinctive script in the result — for EUC-KR additionally
    * hangul-dominance over hanja, because GB2312 hanzi bytes are often
    * EUC-KR-valid and decode to a hangul/hanja MIX (lead rows 0xB0-0xC8
    * map to hangul), while real Korean text is nearly hangul-pure.
    * Shift_JIS is claimed on kana (GB/EUC-KR bytes land in the SJIS
    * kanji region, never kana); GBK last, on han, since han evidence is
    * shared by all three families. Known residual: kanji-only Japanese
    * classifies as GBK — structurally indistinguishable without a
    * frequency model, and both decodes are han text. Latin pages keep
    * the windows-1252 fallback: isolated accents followed by
    * space/punct are invalid trail bytes in all three families, so the
    * strict decodes fail (and sparse valid pairs stay under the floor).
    */
  private def cjkSniff(bytes: Array[Byte]): InternalRow = {
    if (EucKr != null) {
      val kr = strictOrNull(EucKr, bytes)
      if (kr != null) {
        val hangul = countCp(kr)(isHangul)
        if (hangul >= MinNativeChars && hangul >= countCp(kr)(isHan))
          return row(kr, "euc-kr")
      }
    }
    if (Sjis != null) {
      val jp = strictOrNull(Sjis, bytes)
      if (jp != null && countCp(jp)(isKana) >= MinNativeChars)
        return row(jp, "shift_jis")
    }
    if (Gbk != null) {
      val zh = strictOrNull(Gbk, bytes)
      if (zh != null && countCp(zh)(isHan) >= MinNativeChars)
        return row(zh, "gbk")
    }
    null
  }

  def decode(bytes: Array[Byte], contentType: UTF8String): InternalRow = {
    val n = bytes.length
    // tier 1: BOM
    if (n >= 3 && (bytes(0) & 0xFF) == 0xEF && (bytes(1) & 0xFF) == 0xBB &&
        (bytes(2) & 0xFF) == 0xBF)
      return row(lenient(StandardCharsets.UTF_8, bytes, 3), "utf-8")
    if (n >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return row(lenient(StandardCharsets.UTF_16LE, bytes, 2), "utf-16le")
    if (n >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return row(lenient(StandardCharsets.UTF_16BE, bytes, 2), "utf-16be")
    // tier 2: Content-Type header parameter
    val ct = lowerPrefix(contentType.getBytes, Int.MaxValue)
    val ctEq = findCharsetEq(ct, 0, ct.length)
    if (ctEq >= 0) {
      val name = charsetToken(ct, ct.length, ctEq)
      val cs = known(name)
      if (cs != null) return row(lenient(cs, bytes, 0), name)
    }
    // tier 3: <meta ...charset=> prescan over the first 1024 bytes,
    // HTML-ish payloads only (WHATWG: the prescan is an HTML algorithm)
    if (htmlish(ct)) {
      val head = lowerPrefix(bytes, 1024)
      val mEq = findMetaCharsetEq(head)
      if (mEq >= 0) {
        val name = charsetToken(head, head.length, mEq)
        val cs = known(name)
        if (cs != null) return row(lenient(cs, bytes, 0), name)
      }
    }
    // tier 4: content sniff — strict UTF-8; then the CJK structural
    // sniff (undeclared Shift_JIS/GBK/EUC-KR pages are a real slice of
    // any crawl and would be 1252 mojibake); else the total 1252
    // fallback (every byte maps, so the decode never fails)
    try row(strictUtf8(bytes, 0), "utf-8")
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        val cjk = cjkSniff(bytes)
        if (cjk != null) cjk
        else row(lenient(Win1252, bytes, 0), "windows-1252")
    }
  }

  def apply(body: Column, contentType: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(HttpTextDecode(
      org.apache.spark.sql.classic.ExpressionUtils.expression(body),
      org.apache.spark.sql.classic.ExpressionUtils.expression(contentType)))
}
