package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import CastMatrix.AccessType

/** Minimal pure-JVM reader for the CATALOG layer of an Access (Jet)
  * `.mdb`/`.accdb` file: page-0 magic/version validation plus a
  * table-definition (TDEF) page walk that enumerates each table's
  * columns — names, Jet type codes, fixed/variable class — and feeds
  * them through `CastMatrix.fromName`, closing as much of the S4 gap as
  * a zero-egress build allows (r5 verdict #3; the reference shells out
  * to an external converter for this step, `fetch.go:189-196` +
  * `mdb-sqlite.jar!com/plausiblelabs/mdb/AccessExporter.class`).
  *
  * Format knowledge is the PUBLIC Jet format documentation (the
  * mdbtools project's HACKING notes; the layout below is the Jet4
  * variant — 4096-byte pages, UTF-16LE identifiers). Same decode
  * pattern as the PNG/BMP/GIF header parsers in `Multimodal.scala`:
  * fixed offsets, bounds-checked reads, and CORRUPT PAGES QUARANTINE
  * with a reason instead of failing the whole scan — a half-damaged
  * database should still enumerate its intact tables.
  *
  * Deliberate seams (documented, not silent):
  *  - TABLE NAMES are not stored in TDEF pages — Jet keeps them as rows
  *    of the MSysObjects system table, so recovering them requires full
  *    data-row decode (null masks, variable-column offset tables,
  *    overflow rows): exactly the external-converter seam SURVEY §7.3
  *    declares. Tables are therefore keyed by TDEF page number
  *    (`table_pg<N>`), with an optional caller-supplied name map for
  *    deployments that know their catalog (the reference's PRISM schema
  *    is fixed, so its map is a constant).
  *  - Jet3 files (2048-byte pages, version 0x00) are RECOGNIZED by the
  *    header probe and reported as unsupported rather than mis-parsed:
  *    their TDEF layout differs (18-byte column descriptors, ASCII
  *    names) and the upstream RSM data is Jet4-era.
  *  - ROW DATA is never decoded here. The catalog feeds
  *    `TableMigrator.TableDef` / `CastMatrix.schemaFor`; moving rows
  *    stays with the declared converter seam.
  */
object MdbCatalog {

  final case class MdbColumn(name: String, typeCode: Int,
      accessType: AccessType, colNum: Int, fixed: Boolean)

  final case class MdbTableDef(page: Int, system: Boolean,
      columns: Seq[MdbColumn]) {
    def defaultName: String = s"table_pg$page"
  }

  final case class Catalog(version: Int, pageSize: Int,
      tables: Seq[MdbTableDef], quarantined: Seq[(Int, String)])

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

  // Jet4 TDEF page offsets (mdbtools HACKING):
  private val PageTypeTdef = 0x02
  private val OffTableType = 0x28      // 0x4F user, 0x53 system
  private val OffNumCols = 0x2D        // short
  private val OffNumRealIdx = 0x33     // int
  private val IdxEntryLen = 12         // per real index, Jet4
  private val ColDescStart = 0x3F      // after the fixed header
  private val ColDescLen = 25          // Jet4 column descriptor
  private val TableTypeUser = 0x4F
  private val TableTypeSystem = 0x53
  private val FlagFixed = 0x01         // descriptor flag byte, bit 0

  /** Parse one Jet4 TDEF page. Either a table definition or a
    * quarantine reason — never a throw: corrupt catalog pages must not
    * take down the scan of their neighbors.
    */
  private[sources] def parseTdef(page: Array[Byte], pageNo: Int)
      : Either[String, MdbTableDef] = {
    val buf = ByteBuffer.wrap(page).order(ByteOrder.LITTLE_ENDIAN)
    def u8(off: Int): Int = page(off) & 0xFF
    try {
      if (u8(0) != PageTypeTdef || u8(1) != 0x01)
        return Left(s"not a tdef page (type 0x${u8(0).toHexString})")
      val tableType = u8(OffTableType)
      if (tableType != TableTypeUser && tableType != TableTypeSystem)
        return Left(f"unknown table type 0x$tableType%02x")
      val numCols = buf.getShort(OffNumCols) & 0xFFFF
      if (numCols == 0 || numCols > 255)
        return Left(s"implausible column count $numCols")
      val numRealIdx = buf.getInt(OffNumRealIdx)
      if (numRealIdx < 0 || numRealIdx > 64)
        return Left(s"implausible index count $numRealIdx")
      val descBase = ColDescStart + numRealIdx * IdxEntryLen
      val namesBase = descBase + numCols * ColDescLen
      if (namesBase > page.length)
        return Left(s"tdef overruns page: $numCols cols, $numRealIdx idx")
      val descs = (0 until numCols).map { i =>
        val off = descBase + i * ColDescLen
        val code = u8(off)
        val colNum = buf.getShort(off + 5) & 0xFFFF
        val fixed = (u8(off + 15) & FlagFixed) != 0
        (code, colNum, fixed)
      }
      descs.find(d => !TypeCodes.contains(d._1)) match {
        case Some(d) =>
          Left(f"unhandled Jet type code 0x${d._1}%02x (col ${d._2})")
        case None =>
          // Column names follow the descriptors: short byte-length +
          // UTF-16LE characters, one entry per column in descriptor order.
          var off = namesBase
          var nameErr: Option[String] = None
          val names = Vector.newBuilder[String]
          var i = 0
          while (i < numCols && nameErr.isEmpty) {
            if (off + 2 > page.length) nameErr = Some("name table truncated")
            else {
              val len = buf.getShort(off) & 0xFFFF
              off += 2
              if (len % 2 != 0 || off + len > page.length || len > 2 * 64)
                nameErr = Some(s"implausible name length $len")
              else {
                names += new String(page, off, len, StandardCharsets.UTF_16LE)
                off += len
              }
            }
            i += 1
          }
          nameErr match {
            case Some(e) => Left(e)
            case None =>
              val cols = descs.zip(names.result())
                .map { case ((code, colNum, fixed), name) =>
                  MdbColumn(name, code,
                    CastMatrix.fromName(TypeCodes(code)), colNum, fixed)
                }.sortBy(_.colNum)
              Right(MdbTableDef(pageNo, tableType == TableTypeSystem, cols))
          }
      }
    } catch {
      case e: IndexOutOfBoundsException =>
        Left(s"truncated tdef: ${e.getMessage}")
    }
  }

  /** Full catalog scan: header gate, then every page whose leading
    * bytes mark a table definition. Intact tables and quarantined
    * (page, reason) pairs come back side by side — the `multimodal_meta`
    * contract applied to catalog pages.
    */
  def read(bytes: Array[Byte]): Either[String, Catalog] =
    readHeader(bytes).flatMap { case (version, pageSize) =>
      if (version == 0x00)
        Left("Jet3 (2048-byte pages) catalog decode not implemented: " +
          "external converter seam (SURVEY §7.3)")
      else scanPages(bytes, version, pageSize)
    }

  private def scanPages(bytes: Array[Byte], version: Int,
      pageSize: Int): Either[String, Catalog] = {
      val nPages = bytes.length / pageSize
      val tables = Vector.newBuilder[MdbTableDef]
      val quarantined = Vector.newBuilder[(Int, String)]
      (1 until nPages).foreach { p =>
        val off = p.toLong * pageSize
        if ((bytes(off.toInt) & 0xFF) == PageTypeTdef) {
          val page = java.util.Arrays.copyOfRange(
            bytes, off.toInt, off.toInt + pageSize)
          parseTdef(page, p) match {
            case Right(t) => tables += t
            case Left(reason) => quarantined += (p -> reason)
          }
        }
      }
      Right(Catalog(version, pageSize, tables.result(), quarantined.result()))
  }

  /** Bridge to the migration loop: user tables only (the reference's
    * converter also walks user tables; MSys* stay behind), with names
    * resolved from the caller's map where known. Indexes are left empty
    * — per-index column lists live in the same row-decoded system
    * catalog as table names (the declared seam).
    */
  def toTableDefs(cat: Catalog,
      names: Map[Int, String] = Map.empty): Seq[TableMigrator.TableDef] =
    cat.tables.filterNot(_.system).map { t =>
      TableMigrator.TableDef(
        names.getOrElse(t.page, t.defaultName),
        t.columns.map(c => c.name -> c.accessType))
    }
}
