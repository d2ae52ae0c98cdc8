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
  *  - classic cross-reference TABLE walk from `startxref`, following
  *    `/Prev` chains (incremental updates; first-seen object wins, the
  *    newest-revision rule);
  *  - a full miniature object model (dicts, arrays, names, numbers,
  *    literal + hex strings with every escape form, indirect
  *    references, streams with direct OR indirect `/Length`);
  *  - `/Root` → `/Pages` tree walk (recursive `/Kids`, cycle + depth
  *    guarded) to the page leaves;
  *  - content-stream text operators inside `BT`..`ET`: `Tj`, `TJ`
  *    (string elements concatenated; kerning numbers ignored), `'`,
  *    `"`, with `Td`/`TD`/`T*` as line breaks;
  *  - stream filters: none and `/FlateDecode` (`java.util.zip.Inflater`
  *    — the [[org.apache.spark.sql.graft.DeflateLen]] precedent).
  *
  * Everything outside that honest scope QUARANTINES with a reason
  * instead of emitting partial text — the
  * [[graft.sources.MdbCatalog]] / [[Multimodal]] discipline:
  * encrypted documents (`/Encrypt`), LZW/DCT/unsupported filters,
  * predictor `/DecodeParms`, cross-reference STREAMS (PDF 1.5+
  * compressed xref — needs the predictor machinery; detected and
  * labeled, never misparsed), and any structural damage including
  * truncation (`quarantine:damaged` — a cut-off body must refuse, not
  * return half a document silently).
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

  /** One page's content stream — rotates the three show forms (`Tj`,
    * `TJ` with a mid-line chunk split + kern number, `'`) so every
    * text operator the extractor implements is exercised on every
    * multi-line document.
    */
  private def pageContent(lines: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf 72 720 Td\n")
    lines.zipWithIndex.foreach { case (line, j) =>
      if (j == 0) sb.append(s"(${escapeLiteral(line)}) Tj\n")
      else if (j % 3 == 1 && line.length >= 2) {
        val cut = line.length / 2
        sb.append(s"T* [(${escapeLiteral(line.substring(0, cut))}) -250 " +
          s"(${escapeLiteral(line.substring(cut))})] TJ\n")
      } else if (j % 3 == 2) sb.append(s"(${escapeLiteral(line)}) '\n")
      else sb.append(s"T* (${escapeLiteral(line)}) Tj\n")
    }
    sb.append("ET")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Render `text` as a complete classic-xref PDF. `flate` compresses
    * the content streams; `indirectLength` routes every stream's
    * `/Length` through a forward indirect reference (both are real-PDF
    * shapes the extractor must resolve).
    */
  private[graft] def render(text: String, flate: Boolean,
      indirectLength: Boolean): Array[Byte] = {
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
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"))
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val streamLens = new Array[Int](nPages)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      obj(pageNum)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contNum 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >> >>"))
      val raw = pageContent(lines)
      val data = if (flate) deflate(raw) else raw
      streamLens(i) = data.length
      val lenPart =
        if (indirectLength) s"/Length ${4 + 2 * nPages + i} 0 R"
        else s"/Length ${data.length}"
      val filterPart = if (flate) " /Filter /FlateDecode" else ""
      offsets(contNum) = out.size()
      w(s"$contNum 0 obj\n<< $lenPart$filterPart >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    if (indirectLength) (0 until nPages).foreach { i =>
      obj(4 + 2 * nPages + i)(w(streamLens(i).toString))
    }
    val xrefAt = out.size()
    val maxObj = offsets.keys.max
    w(s"xref\n0 ${maxObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxObj).foreach { n =>
      w("%010d 00000 n \n".format(offsets(n)))
    }
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
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
  private case class PStream(dict: PDict, at: Int) extends PObj

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

  /** Parse the classic xref table(s) from `startxref`, following
    * `/Prev`. Returns (objnum → offset, merged trailer) with
    * first-seen-wins on both (newest revision rules).
    */
  private def readXref(b: Array[Byte]): (Map[Int, Int], Map[String, PObj]) = {
    val sx = lastIndexOf(b, "startxref")
    if (sx < 0) throw Quarantine("quarantine:damaged")
    val lx0 = new Lexer(b, sx + "startxref".length, allowRefs = false)
    lx0.ws()
    val first = lx0.value() match {
      case PNum(v) => v.toInt
      case _ => throw Quarantine("quarantine:damaged")
    }
    val offsets = mutable.Map[Int, Int]()
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
      if (kw != "xref") {
        // an integer here means "N G obj" — a PDF 1.5 xref STREAM
        lx.pos = save
        if (!lx.eof && lx.peek >= '0' && lx.peek <= '9')
          throw Quarantine("quarantine:xref-stream")
        throw Quarantine("quarantine:damaged")
      }
      var inSections = true
      while (inSections) {
        lx.ws()
        val p0 = lx.pos
        val tok = lx.keyword()
        if (tok == "trailer") inSections = false
        else {
          lx.pos = p0
          val start = lx.value() match {
            case PNum(v) => v.toInt
            case _ => throw Quarantine("quarantine:damaged")
          }
          val count = lx.value() match {
            case PNum(v) => v.toInt
            case _ => throw Quarantine("quarantine:damaged")
          }
          if (count < 0 || count > 1000000)
            throw Quarantine("quarantine:damaged")
          (0 until count).foreach { k =>
            val off = lx.value() match {
              case PNum(v) => v.toInt
              case _ => throw Quarantine("quarantine:damaged")
            }
            lx.value() // generation — unused
            lx.ws()
            val t = lx.keyword()
            if (t != "n" && t != "f") throw Quarantine("quarantine:damaged")
            val objnum = start + k
            if (t == "n" && !offsets.contains(objnum)) offsets(objnum) = off
          }
        }
      }
      val tdict = lx.value() match {
        case PDict(m) => m
        case _ => throw Quarantine("quarantine:damaged")
      }
      if (tdict.contains("XRefStm"))
        throw Quarantine("quarantine:xref-stream")
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

  // ----------------------------------------------------- object reader

  private final class Reader(b: Array[Byte], offsets: Map[Int, Int],
      val trailer: Map[String, PObj]) {
    private val memo = mutable.Map[Int, PObj]()
    private val resolving = mutable.Set[Int]()

    def deref(o: PObj): PObj = o match {
      case PRef(n, _) => obj(n)
      case x => x
    }

    def obj(n: Int): PObj = memo.getOrElseUpdate(n, {
      if (resolving(n)) throw Quarantine("quarantine:damaged")
      resolving += n
      try {
        val off = offsets.getOrElse(n, throw Quarantine("quarantine:damaged"))
        if (off < 0 || off >= b.length) throw Quarantine("quarantine:damaged")
        val lx = new Lexer(b, off, allowRefs = true)
        lx.value() match {
          case PNum(objn) if objn.toInt == n =>
            lx.value() // generation
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
                case d: PDict => PStream(d, lx.pos)
                case _ => throw Quarantine("quarantine:damaged")
              }
            } else { lx.pos = save; v }
          case _ => throw Quarantine("quarantine:damaged")
        }
      } finally resolving -= n
    })

    /** Decoded stream payload: /Length resolved (possibly indirect),
      * bounds-checked (truncation refuses), filters applied.
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
      if (s.dict.m.contains("DecodeParms") || s.dict.m.contains("DP"))
        throw Quarantine("quarantine:unsupported-predictor")
      val filters = s.dict.m.get("Filter") match {
        case None | Some(PNull) => Nil
        case Some(PName(f)) => List(f)
        case Some(PArr(fs)) => fs.toList.map {
          case PName(f) => f
          case _ => throw Quarantine("quarantine:damaged")
        }
        case _ => throw Quarantine("quarantine:damaged")
      }
      filters.foldLeft(raw) { (data, f) =>
        f match {
          case "FlateDecode" => inflate(data)
          case other => throw Quarantine(
            s"quarantine:unsupported-filter:$other")
        }
      }
    }
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

  /** Text of one content stream: shows inside BT..ET accumulate into
    * the current line; Td/TD/T* (and the quote forms' implicit
    * next-line) commit it.
    */
  private def contentText(content: Array[Byte]): Vector[String] = {
    val lx = new Lexer(content, 0, allowRefs = false)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inBT = false
    var pendingBreak = false
    var shown = false
    val operands = mutable.ArrayBuffer[PObj]()
    def break(): Unit = pendingBreak = true
    def show(s: String): Unit = if (inBT) {
      if (pendingBreak) {
        if (shown) { lines += cur.toString; cur.clear() }
        pendingBreak = false
      }
      cur.append(s)
      shown = true
    }
    def arrText(a: PArr): String =
      a.items.collect { case PStr(bs) => decodeText(bs) }.mkString
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
          case "Tj" => operands.lastOption.foreach {
            case PStr(bs) => show(decodeText(bs))
            case _ =>
          }
          case "TJ" => operands.lastOption.foreach {
            case a: PArr => show(arrText(a))
            case _ =>
          }
          case "'" =>
            break()
            operands.lastOption.foreach {
              case PStr(bs) => show(decodeText(bs))
              case _ =>
            }
          case "\"" =>
            break()
            operands.lastOption.foreach {
              case PStr(bs) => show(decodeText(bs))
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

  private[graft] final case class Extracted(status: String, nPages: Int,
      text: String)

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
      if (trailer.contains("Encrypt"))
        return Extracted("quarantine:encrypted", 0, "")
      val rd = new Reader(bytes, offsets, trailer)
      val root = rd.deref(trailer.getOrElse("Root",
        throw Quarantine("quarantine:damaged"))) match {
        case d: PDict => d
        case _ => throw Quarantine("quarantine:damaged")
      }
      val pagesRoot = rd.deref(root.m.getOrElse("Pages",
        throw Quarantine("quarantine:damaged")))
      val pages = Vector.newBuilder[PDict]
      val visited = mutable.Set[PObj]()
      def walk(node: PObj, depth: Int): Unit = {
        if (depth > 64 || visited(node)) throw Quarantine("quarantine:damaged")
        visited += node
        rd.deref(node) match {
          case d: PDict =>
            d.m.get("Type") match {
              case Some(PName("Page")) => pages += d
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
      val pageTexts = pages.result().map { pg =>
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
        contentText(joined).mkString("\n")
      }
      Extracted("ok", pageTexts.length, pageTexts.mkString("\n"))
    } catch {
      case Quarantine(s) => Extracted(s, 0, "")
      case scala.util.control.NonFatal(_) =>
        Extracted("quarantine:damaged", 0, "")
    }
  }

  // ------------------------------------------------------------ query

  private val NonAscii = "[^\\x20-\\x7E]".r

  /** `multimodal_pdf_text`: synthesize real PDF bytes per document
    * (flate on even ids, indirect /Length on ids ≡ 0 mod 3 — all four
    * seam combinations run at any sf), extract the text back, emit the
    * layout-derived fields. Non-ASCII documents quarantine BEFORE
    * render in both engines (the fixture path covers printable ASCII;
    * the StandardEncoding high range is golden-tested in PdfSpec).
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
            val pdf = render(text, flate = id % 2 == 0,
              indirectLength = id % 3 == 0)
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

  val ops: Seq[Op] = Seq(
    Op("multimodal_pdf_text", pdfText _, Some(pdfTextSql)))
}
