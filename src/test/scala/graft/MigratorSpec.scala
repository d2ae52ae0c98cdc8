package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DecimalType

import graft.sources.{CsvJsonEgress, SqliteDdl, TableMigrator}
import graft.sources.CastMatrix._

/** Full-catalog migration (S4→K1) and the S6 all-string CSV reader. */
class MigratorSpec extends SparkSpec {

  test("catalog migration: DDL + parity casts + unique assertion per table") {
    import spark.implicits._
    val licence = Seq((1L, "Fixed Link", true, BigDecimal("150.0000")),
      (2L, "Mobile", false, BigDecimal("75.5000")))
      .toDF("licenceid", "licencetype", "active", "fee")
      .select($"licenceid", $"licencetype", $"active",
        $"fee".cast(DecimalType(19, 4)).as("fee"))
    val catalog = Seq(TableMigrator.TableDef(
      "licence",
      Seq("licenceid" -> ALong, "licencetype" -> AText,
        "active" -> ABoolean, "fee" -> AMoney),
      Seq(SqliteDdl.IndexDef("pk", Seq("licenceid"), unique = true))))

    var written = Map.empty[String, DataFrame]
    val results = TableMigrator.migrate(spark, catalog,
      source = _ => licence,
      sink = (name, df) => written += name -> df,
      metricGraceSec = 0) // recording sink runs no action: skip the metric wait

    assert(results.head.ddl == Seq(
      "CREATE TABLE licence (licenceid INTEGER, licencetype TEXT, active INTEGER, fee TEXT);",
      "CREATE UNIQUE INDEX licence_pk ON licence (licenceid);"))
    assert(results.head.rows == 2)
    val rows = written("licence").collect()
    assert(rows(0).getInt(2) == 1 && rows(1).getInt(2) == 0) // boolean→0/1
    assert(rows(0).getString(3) == "150.0000")               // money→string
  }

  test("K1 transport: generated DDL + batched inserts execute on a Connection") {
    import spark.implicits._

    val rec = new JdbcRecorder

    val licence = Seq((1L, "Fixed Link", true, BigDecimal("150.0000")),
      (2L, "Mobile", false, BigDecimal("75.5000")))
      .toDF("licenceid", "licencetype", "active", "fee")
      .select($"licenceid", $"licencetype", $"active",
        $"fee".cast(DecimalType(19, 4)).as("fee"))
    val catalog = Seq(TableMigrator.TableDef(
      "licence",
      Seq("licenceid" -> ALong, "licencetype" -> AText,
        "active" -> ABoolean, "fee" -> AMoney),
      Seq(SqliteDdl.IndexDef("pk", Seq("licenceid"), unique = true))))

    val results =
      TableMigrator.migrateJdbc(spark, catalog, _ => licence, rec.connection)

    // The statements that ran are exactly the generated DDL, in order.
    assert(rec.executed.toSeq == results.head.ddl)
    assert(rec.prepared.toSeq == Seq(
      "INSERT INTO licence (licenceid, licencetype, active, fee) VALUES (?, ?, ?, ?)"))
    // Every row arrived through the batch path with §1.2 parity values.
    assert(results.head.rows == 2 && rec.inserted.size == 2)
    assert(rec.inserted(0) == Vector(1L, "Fixed Link", 1, "150.0000"))
    assert(rec.inserted(1) == Vector(2L, "Mobile", 0, "75.5000"))
    // The table writes as ONE transaction: autocommit suspended, a
    // single commit, caller's autocommit restored — never a rollback.
    assert(rec.txEvents.toSeq ==
      Seq("setAutoCommit(false)", "commit", "setAutoCommit(true)"))
  }

  test("migration fails fast when a unique index is violated") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "name")
    val catalog = Seq(TableMigrator.TableDef("t",
      Seq("id" -> ALong, "name" -> AText),
      Seq(SqliteDdl.IndexDef("pk", Seq("id"), unique = true))))
    val e = intercept[IllegalArgumentException](
      TableMigrator.migrate(spark, catalog, _ => dup, (_, _) => ()))
    assert(e.getMessage.contains("UNIQUE violated"))
  }

  test("S6: header CSV reads back all-string, no inference") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s6").toString
    val df = Seq((1, 2.5, "x")).toDF("a", "b", "c")
    CsvJsonEgress.writeCsvSingle(df, s"$dir/t.csv")
    val back = CsvJsonEgress.readCsvAllStrings(spark, s"$dir/t.csv")
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.columns.toSeq == Seq("a", "b", "c"))
    assert(back.head().getString(1) == "2.5")
  }

  // ------------------------------------------------ MDB catalog reader

  /** Synthetic Jet4 page fixtures, built to the same published layout
    * the reader implements (mdbtools HACKING; see MdbCatalog scaladoc).
    * No real .mdb can exist in the zero-egress build, so the fixture is
    * the spec: it pins the offsets, the quarantine behavior, and the
    * CastMatrix bridge — full row decode stays the declared seam.
    */
  private val PageSize = 4096

  private def jetHeader(version: Int, fmt: String = "Standard Jet DB")
      : Array[Byte] = {
    val p = new Array[Byte](PageSize)
    Array[Byte](0x00, 0x01, 0x00, 0x00).copyToArray(p, 0)
    fmt.getBytes("US-ASCII").copyToArray(p, 4)
    p(0x14) = version.toByte
    p
  }

  private def tdefPage(tableType: Int,
      cols: Seq[(String, Int, Int, Boolean)], // (name, typeCode, colNum, fixed)
      numRealIdx: Int = 0,
      truncateNames: Boolean = false): Array[Byte] = {
    val p = new Array[Byte](PageSize)
    val buf = java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    p(0) = 0x02; p(1) = 0x01
    p(0x28) = tableType.toByte
    buf.putShort(0x2D, cols.size.toShort)
    buf.putInt(0x33, numRealIdx)
    val descBase = 0x3F + numRealIdx * 12
    cols.zipWithIndex.foreach { case ((_, code, colNum, fixed), i) =>
      val off = descBase + i * 25
      p(off) = code.toByte
      buf.putShort(off + 5, colNum.toShort)
      p(off + 15) = if (fixed) 0x01 else 0x00
    }
    var off = descBase + cols.size * 25
    cols.foreach { case (name, _, _, _) =>
      val b = name.getBytes("UTF-16LE")
      buf.putShort(off, (if (truncateNames) 3000 else b.length).toShort)
      off += 2
      b.copyToArray(p, off)
      off += b.length
    }
    p
  }

  test("MDB catalog: header gate, tdef walk, quarantine, CastMatrix bridge") {
    import graft.sources.MdbCatalog
    val sys = tdefPage(0x53, Seq(("Name", 0x0A, 0, false)))
    val user = tdefPage(0x4E, Seq(
      ("licenceid", 0x04, 0, true),    // LONG
      ("licencetype", 0x0A, 1, false), // TEXT
      ("active", 0x01, 2, true),       // BOOLEAN
      ("fee", 0x05, 3, true),          // MONEY
      ("issued", 0x08, 4, true)),      // SHORT_DATE_TIME
      numRealIdx = 2)
    val dataPage = { val d = new Array[Byte](PageSize); d(0) = 0x01; d }
    val badCode = tdefPage(0x4E, Seq(("mystery", 0x7E, 0, true)))
    val truncated = tdefPage(0x4E, Seq(("n", 0x0A, 0, false)),
      truncateNames = true)
    val bytes = jetHeader(0x01) ++ dataPage ++ sys ++ user ++ badCode ++ truncated

    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    assert(cat.pageSize == PageSize && cat.version == 0x01)
    // intact tables parsed, sorted by catalog column number
    assert(cat.tables.map(_.page) == Seq(2, 3))
    assert(cat.tables.head.system)
    val lic = cat.tables(1)
    assert(!lic.system)
    assert(lic.columns.map(_.name) ==
      Seq("licenceid", "licencetype", "active", "fee", "issued"))
    assert(lic.columns.map(_.accessType) ==
      Seq(ALong, AText, ABoolean, AMoney, AShortDateTime))
    assert(lic.columns.map(_.fixed) == Seq(true, false, true, true, true))
    // corrupt pages quarantine with reasons; the scan survives them
    val q = cat.quarantined.toMap
    assert(q(4).contains("unhandled Jet type code 0x7e"))
    assert(q(5).contains("name length"))
    // the bridge feeds the migration loop: user tables only, named from
    // the caller's map, Access types ready for the §1.2 matrix
    val defs = MdbCatalog.toTableDefs(cat, Map(3 -> "licence"))
    assert(defs.map(_.name) == Seq("licence"))
    assert(defs.head.columns == Seq("licenceid" -> ALong,
      "licencetype" -> AText, "active" -> ABoolean, "fee" -> AMoney,
      "issued" -> AShortDateTime))
    assert(schemaFor(defs.head.columns).fieldNames.length == 5)
  }

  /** Jet3 TDEF page (2048 bytes): table type at 0x14, column count at
    * 0x19, real-index count at 0x1F, 8-byte index entries from 0x2B,
    * 18-byte column descriptors, 1-byte-length ASCII names.
    */
  private def tdef3Page(tableType: Int,
      cols: Seq[(String, Int, Int, Boolean)],
      numRealIdx: Int = 0): Array[Byte] = {
    val p = new Array[Byte](2048)
    val buf = java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    p(0) = 0x02; p(1) = 0x01
    p(0x14) = tableType.toByte
    buf.putShort(0x19, cols.size.toShort)
    buf.putInt(0x1F, numRealIdx)
    val descBase = 0x2B + numRealIdx * 8
    cols.zipWithIndex.foreach { case ((_, code, colNum, fixed), i) =>
      val off = descBase + i * 18
      p(off) = code.toByte
      buf.putShort(off + 1, colNum.toShort)
      p(off + 13) = if (fixed) 0x01 else 0x00
    }
    var off = descBase + cols.size * 18
    cols.foreach { case (name, _, _, _) =>
      val b = name.getBytes("US-ASCII")
      p(off) = b.length.toByte
      off += 1
      b.copyToArray(p, off)
      off += b.length
    }
    p
  }

  test("MDB catalog: Jet3 tdef pages enumerate columns (r6 verdict #6)") {
    import graft.sources.MdbCatalog
    val user = tdef3Page(0x4E, Seq(
      ("clientid", 0x04, 0, true),   // LONG
      ("clientname", 0x0A, 1, false), // TEXT
      ("since", 0x08, 2, true)),      // SHORT_DATE_TIME
      numRealIdx = 1)
    val bad = tdef3Page(0x4E, Seq(("m", 0x7E, 0, true)))
    val bytes = jetHeader(0x00).take(2048) ++ user ++ bad
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    assert(cat.version == 0x00 && cat.pageSize == 2048)
    assert(cat.tables.map(_.page) == Seq(1))
    assert(cat.tables.head.columns.map(_.name) ==
      Seq("clientid", "clientname", "since"))
    assert(cat.tables.head.columns.map(_.accessType) ==
      Seq(ALong, AText, AShortDateTime))
    assert(cat.quarantined.toMap.apply(2).contains("unhandled Jet type"))
    // Jet3 names stay the declared seam: page-keyed unless the caller maps
    assert(cat.names.isEmpty)
    assert(MdbCatalog.toTableDefs(cat).map(_.name) == Seq("table_pg1"))
  }

  // ------------------------------------- MSysObjects name recovery (r7)

  /** The catalog table's 3-column slice the name decode needs, with the
    * row-format fields (fixed offset / var index / length) populated:
    * Id LONG fixed @0, Type INT fixed @4, Name TEXT var index 0.
    */
  private def msysTdefPage: Array[Byte] = {
    val p = tdefPage(0x53, Seq(
      ("Id", 0x04, 0, true), ("Type", 0x03, 1, true), ("Name", 0x0A, 2, false)))
    val buf = java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // descriptor fields beyond what tdefPage writes: offset_F at +21,
    // offset_V at +7, col_len at +23 (Jet4 25-byte descriptor)
    val descBase = 0x3F
    buf.putShort(descBase + 21, 0.toShort)       // Id fixed offset 0
    buf.putShort(descBase + 23, 4.toShort)
    buf.putShort(descBase + 25 + 21, 4.toShort)  // Type fixed offset 4
    buf.putShort(descBase + 25 + 23, 2.toShort)
    buf.putShort(descBase + 50 + 7, 0.toShort)   // Name var index 0
    p
  }

  /** One Jet4 catalog data row for the 3-column slice: 2-byte column
    * count, Id int @2, Type short @6, name bytes @8; trailer from the
    * end = null mask (1 byte), var count (1), then the two offsets
    * (start, end) walking backward.
    */
  private def msysRow(id: Int, objType: Int, name: Array[Byte]): Array[Byte] = {
    val len = 2 + 6 + name.length + 2 * 2 + 2 + 1
    val r = new Array[Byte](len)
    val buf = java.nio.ByteBuffer.wrap(r)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0, 3.toShort)
    buf.putInt(2, id)
    buf.putShort(6, objType.toShort)
    name.copyToArray(r, 8)
    val varCntOff = len - 1 - 2
    buf.putShort(varCntOff, 1.toShort)
    buf.putShort(varCntOff - 2, 8.toShort)                  // var[0] start
    buf.putShort(varCntOff - 4, (8 + name.length).toShort)  // var end
    r(len - 1) = 0x07 // null mask: all three columns present
    r
  }

  /** Assemble a Jet4 data page owned by `owner`: rows packed from the
    * page end backward, 2-byte offsets (with optional flag bits) from
    * 0x0E, row count at 0x0C.
    */
  private def jet4DataPage(owner: Int,
      rows: Seq[(Array[Byte], Int)]): Array[Byte] = {
    val p = new Array[Byte](PageSize)
    val buf = java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    p(0) = 0x01; p(1) = 0x01
    buf.putInt(0x04, owner)
    buf.putShort(0x0C, rows.size.toShort)
    var end = PageSize
    rows.zipWithIndex.foreach { case ((row, flags), i) =>
      val start = end - row.length
      row.copyToArray(p, start)
      buf.putShort(0x0E + 2 * i, (start | flags).toShort)
      end = start
    }
    p
  }

  test("MDB catalog: MSysObjects rows recover real table names (r6 verdict #2)") {
    import graft.sources.MdbCatalog
    val licence = tdefPage(0x4E, Seq(("licenceid", 0x04, 0, true)))
    val spectrum = tdefPage(0x4E, Seq(("freq", 0x07, 0, true)))
    val corrupt = msysRow(9, 1, "x".getBytes("UTF-16LE"))
    // wreck the var offset table: end before start
    java.nio.ByteBuffer.wrap(corrupt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(corrupt.length - 7, 2000.toShort)
    val rows = Seq(
      msysRow(2, 1, "MSysObjects".getBytes("UTF-16LE")) -> 0,
      msysRow(3, 1, "licence".getBytes("UTF-16LE")) -> 0,
      // high Id bytes beyond the page number must be masked off; the
      // compressed-text variant carries the 0xFF 0xFE marker
      msysRow(0x01000000 | 4, 1,
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++
          "spectrum".getBytes("ISO-8859-1")) -> 0,
      msysRow(99, 5, "aQueryNotATable".getBytes("UTF-16LE")) -> 0,
      msysRow(98, 1, "deletedGhost".getBytes("UTF-16LE")) -> 0x8000,
      corrupt -> 0)
    val bytes = jetHeader(0x01) ++ new Array[Byte](PageSize) ++
      msysTdefPage ++ licence ++ spectrum ++ jet4DataPage(2, rows)
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    // names resolved from catalog rows: page := low 3 bytes of Id; the
    // non-table object, the deleted row, and the corrupt row contribute
    // nothing (the corrupt one quarantines with a row-keyed reason)
    assert(cat.names == Map(2 -> "MSysObjects", 3 -> "licence",
      4 -> "spectrum"), s"got ${cat.names}")
    assert(cat.quarantined.exists { case (k, r) =>
      k == -(5 * 1000 + 5) && r.contains("var extent") },
      s"corrupt row not quarantined: ${cat.quarantined}")
    // the migration bridge now enumerates BY NAME with no caller map...
    assert(MdbCatalog.toTableDefs(cat).map(_.name).toSet ==
      Set("licence", "spectrum"))
    // ...and an explicit caller map still wins (deployment overrides)
    assert(MdbCatalog.toTableDefs(cat, Map(3 -> "licence_renamed"))
      .map(_.name).toSet == Set("licence_renamed", "spectrum"))
  }

  // (name, typeCode, colNum, fixed, offsetF, offsetV, colLen): one of
  // every decodable scalar class + a var TEXT + a MEMO seam column.
  // Fixed area: id@0(4) b@4(1) cnt@5(2) price@7(8) ratio@15(8)
  // made@23(8) gid@31(16) = 47 bytes; flag lives in the null mask.
  private val widgetCols = Seq(
    ("id", 0x04, 0, true, 0, 0, 0), ("flag", 0x01, 1, true, 0, 0, 0),
    ("b", 0x02, 2, true, 4, 0, 0), ("cnt", 0x03, 3, true, 5, 0, 0),
    ("price", 0x05, 4, true, 7, 0, 0), ("ratio", 0x07, 5, true, 15, 0, 0),
    ("made", 0x08, 6, true, 23, 0, 0), ("gid", 0x0F, 7, true, 31, 0, 0),
    ("name", 0x0A, 8, false, 0, 0, 0), ("note", 0x0C, 9, false, 0, 1, 0))

  private def tdef4Rich(tableType: Int,
      cols: Seq[(String, Int, Int, Boolean, Int, Int, Int)]): Array[Byte] = {
    val p = tdefPage(tableType, cols.map(c => (c._1, c._2, c._3, c._4)))
    val buf = java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cols.zipWithIndex.foreach { case ((_, _, _, _, offF, offV, colLen), i) =>
      val off = 0x3F + i * 25
      buf.putShort(off + 7, offV.toShort)
      buf.putShort(off + 21, offF.toShort)
      buf.putShort(off + 23, colLen.toShort)
    }
    p
  }

  /** One widgets data row. `rowCols = 9` simulates a row written before
    * the `note` column was added to the table.
    */
  private def widgetRow(id: Int, flag: Boolean, b: Int, cnt: Option[Int],
      priceRaw: Long, ratio: Double, days: Double, guid: Array[Byte],
      name: Option[String], rowCols: Int = 10,
      // default note payload is NOT a valid 12-byte long-value
      // definition — the scalar test uses it to pin the corrupt-LVAL
      // value-null path; pass a real definition to decode a memo
      note: Array[Byte] = Array[Byte](1, 2, 3, 4)): Array[Byte] = {
    val nameBytes = name.map(_.getBytes("UTF-16LE")).getOrElse(Array.empty[Byte])
    val noteBytes: Array[Byte] =
      if (rowCols > 9) note else Array.empty
    val numVar = if (rowCols > 9) 2 else 1
    val varStart = 2 + 47
    val len = varStart + nameBytes.length + noteBytes.length +
      2 * (numVar + 1) + 2 + 2
    val r = new Array[Byte](len)
    val buf = java.nio.ByteBuffer.wrap(r)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0, rowCols.toShort)
    buf.putInt(2, id)
    r(2 + 4) = b.toByte
    cnt.foreach(v => buf.putShort(2 + 5, v.toShort))
    buf.putLong(2 + 7, priceRaw)
    buf.putDouble(2 + 15, ratio)
    buf.putDouble(2 + 23, days)
    guid.copyToArray(r, 2 + 31)
    nameBytes.copyToArray(r, varStart)
    noteBytes.copyToArray(r, varStart + nameBytes.length)
    val maskOff = len - 2
    val varCntOff = maskOff - 2
    buf.putShort(varCntOff, numVar.toShort)
    buf.putShort(varCntOff - 2, varStart.toShort)
    if (numVar == 2)
      buf.putShort(varCntOff - 4, (varStart + nameBytes.length).toShort)
    buf.putShort(varCntOff - 2 * (numVar + 1),
      (varStart + nameBytes.length + noteBytes.length).toShort)
    var mask = 0
    def set(bit: Int): Unit = mask |= (1 << bit)
    set(0); if (flag) set(1); set(2); if (cnt.isDefined) set(3)
    set(4); set(5); set(6); set(7)
    if (name.isDefined) set(8)
    if (rowCols > 9) set(9)
    buf.putShort(maskOff, mask.toShort)
    r
  }

  // --------------------------- long-value (LVAL) + NUMERIC fixtures

  /** Inline long-value definition: length word with the 0x80 "data in
    * this definition" flag, zero data pointer, data after the 12-byte
    * header.
    */
  private def inlineMemoDef(data: Array[Byte]): Array[Byte] = {
    val d = new Array[Byte](12 + data.length)
    java.nio.ByteBuffer.wrap(d).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0, data.length | 0x80000000)
    data.copyToArray(d, 12)
    d
  }

  /** Pointer long-value definition: `single` sets the 0x40 one-record
    * flag, otherwise the zero-flag chain form; dp = page in the high
    * three bytes, row in the low byte.
    */
  private def pointerMemoDef(len: Int, single: Boolean,
      pg: Int, row: Int): Array[Byte] = {
    val d = new Array[Byte](12)
    val b = java.nio.ByteBuffer.wrap(d)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, len | (if (single) 0x40000000 else 0))
    b.putInt(4, (pg << 8) | row)
    d
  }

  /** An LVAL page: data-page geometry with the ASCII 'LVAL' signature
    * where data pages carry their owner TDEF pointer.
    */
  private def lvalPage(rows: Seq[Array[Byte]]): Array[Byte] = {
    val p = jet4DataPage(0, rows.map(_ -> 0))
    p(4) = 'L'; p(5) = 'V'; p(6) = 'A'; p(7) = 'L'
    p
  }

  /** 17-byte NUMERIC storage: sign byte (0x80 = negative), then the
    * 16-byte big-endian unsigned mantissa re-grouped as four LE 32-bit
    * words most-significant-first (the group swap is involutive, so
    * building from the BE form and swapping yields the stored form).
    */
  private def numeric17(unscaled: Long, negative: Boolean): Array[Byte] = {
    val out = new Array[Byte](17)
    out(0) = if (negative) 0x80.toByte else 0x00
    val be = new Array[Byte](16)
    java.nio.ByteBuffer.wrap(be).putLong(8, unscaled) // big-endian
    var g = 0
    while (g < 16) {
      val t0 = be(g); be(g) = be(g + 3); be(g + 3) = t0
      val t1 = be(g + 1); be(g + 1) = be(g + 2); be(g + 2) = t1
      g += 4
    }
    be.copyToArray(out, 1)
    out
  }

  test("MDB rows: MEMO/OLE long values (inline, single LVAL, chain, " +
      "corrupt) and NUMERIC decode") {
    import graft.sources.MdbCatalog
    // id LONG fixed @0 (4 B), amt NUMERIC fixed @4 (17 B, prec 18
    // scale 2), m MEMO var 0, o OLE var 1. Fixed area = 21 B.
    val cols = Seq(
      ("id", 0x04, 0, true, 0, 0, 0), ("amt", 0x10, 1, true, 4, 0, 0),
      ("m", 0x0C, 2, false, 0, 0, 0), ("o", 0x0B, 3, false, 0, 1, 0))
    val tdefP = tdef4Rich(0x4E, cols)
    // NUMERIC precision/scale live at descriptor bytes 11/12 (Jet4)
    tdefP(0x3F + 25 + 11) = 18.toByte
    tdefP(0x3F + 25 + 12) = 2.toByte
    def lvRow(id: Int, amt: Array[Byte], mDef: Array[Byte],
        oDef: Array[Byte]): Array[Byte] = {
      val varStart = 2 + 21
      val len = varStart + mDef.length + oDef.length + 2 * 3 + 2 + 1
      val r = new Array[Byte](len)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putShort(0, 4.toShort)
      buf.putInt(2, id)
      amt.copyToArray(r, 2 + 4)
      mDef.copyToArray(r, varStart)
      oDef.copyToArray(r, varStart + mDef.length)
      val maskOff = len - 1
      val varCntOff = maskOff - 2
      buf.putShort(varCntOff, 2.toShort)
      buf.putShort(varCntOff - 2, varStart.toShort)
      buf.putShort(varCntOff - 4, (varStart + mDef.length).toShort)
      buf.putShort(varCntOff - 6,
        (varStart + mDef.length + oDef.length).toShort)
      r(maskOff) = 0x0F // all four columns present
      r
    }
    val singleData = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "compressed lval".getBytes("ISO-8859-1")
    val oleChunk1 = (1 to 10).map(_.toByte).toArray
    val oleChunk2 = (11 to 20).map(_.toByte).toArray
    // LVAL page 3: row 0 = the single-record memo, row 1 = chain head
    // (next pointer → page 4 row 0 + first chunk); LVAL page 4: row 0 =
    // chain tail (zero next pointer + second chunk).
    val chainHead = {
      val rec = new Array[Byte](4 + oleChunk1.length)
      java.nio.ByteBuffer.wrap(rec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(0, (4 << 8) | 0)
      oleChunk1.copyToArray(rec, 4)
      rec
    }
    val chainTail = {
      val rec = new Array[Byte](4 + oleChunk2.length)
      oleChunk2.copyToArray(rec, 4)
      rec
    }
    val rows = Seq(
      lvRow(1, numeric17(12345L, negative = false),
        inlineMemoDef("inline memo!".getBytes("UTF-16LE")),
        inlineMemoDef(Array[Byte](9, 8, 7))) -> 0,
      lvRow(2, numeric17(500L, negative = true),
        pointerMemoDef(singleData.length, single = true, pg = 3, row = 0),
        pointerMemoDef(20, single = false, pg = 3, row = 1)) -> 0,
      lvRow(3, numeric17(0L, negative = false),
        pointerMemoDef(10, single = true, pg = 99, row = 0),
        inlineMemoDef(Array[Byte](5))) -> 0)
    val bytes = jetHeader(0x01) ++ tdefP ++ jet4DataPage(1, rows) ++
      lvalPage(Seq(singleData, chainHead)) ++ lvalPage(Seq(chainTail))
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val tdef = cat.tables.find(_.page == 1).getOrElse(fail("tdef missing"))
    assert(tdef.columns.find(_.name == "amt").exists(c =>
      c.precision == 18 && c.scale == 2), "NUMERIC prec/scale not captured")
    val (got, quar) = MdbCatalog.readRows(bytes, 4096, tdef)
    assert(got.size == 3, s"got ${got.size} rows, quar=$quar")
    assert(got(0)(0) == 1L && got(0)(1) == 123.45 &&
      got(0)(2) == "inline memo!", s"row0 ${got(0)}")
    assert(got(0)(3).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9, 8, 7))
    assert(got(1)(0) == 2L && got(1)(1) == -5.0 &&
      got(1)(2) == "compressed lval", s"row1 ${got(1)}")
    assert(got(1)(3).asInstanceOf[Array[Byte]].toSeq ==
      (1 to 20).map(_.toByte).toSeq, s"chained OLE ${got(1)(3)}")
    // the bogus pointer nulls the VALUE and notes it; the row survives
    assert(got(2)(0) == 3L && got(2)(1) == 0.0 && got(2)(2) == null &&
      got(2)(3).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](5))
    assert(quar.exists { case (_, msg) =>
      msg.contains("m (MEMO)") && msg.contains("page 99") }, s"quar=$quar")
  }

  test("MDB rows: every scalar type decodes; nulls, seams, flags quarantine") {
    import graft.sources.MdbCatalog
    val guid = Array[Byte](0x04, 0x03, 0x02, 0x01, 0x06, 0x05, 0x08, 0x07,
      0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x0e, 0x0f, 0x10)
    val r1 = widgetRow(7, flag = true, 200, Some(-5), 1234567L, 2.5,
      36526.5, guid, Some("Gizmo"))
    val r2 = widgetRow(8, flag = false, 3, None, -50000L, -0.25,
      25569.0, guid, None)
    val old = widgetRow(9, flag = true, 1, Some(2), 0L, 0.0,
      36526.0, guid, Some("Old"), rowCols = 9)
    val corrupt = widgetRow(10, flag = true, 1, Some(2), 0L, 0.0, 0.0,
      guid, Some("x"))
    // wreck the NAME var extent (its end = var[1]'s start slot): the
    // memo slot would not do — its extent is never read, the column
    // seam-nulls first
    java.nio.ByteBuffer.wrap(corrupt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(corrupt.length - 8, 3000.toShort)
    val bytes = jetHeader(0x01) ++ tdef4Rich(0x4E, widgetCols) ++
      jet4DataPage(1, Seq(r1 -> 0, r2 -> 0, old -> 0,
        widgetRow(99, flag = true, 0, None, 0L, 0.0, 0.0, guid, None) -> 0x8000,
        widgetRow(98, flag = true, 0, None, 0L, 0.0, 0.0, guid, None) -> 0x4000,
        corrupt -> 0))
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val tdef = cat.tables.find(_.page == 1).getOrElse(fail("tdef missing"))
    val (rows, quar) = MdbCatalog.readRows(bytes, 4096, tdef)
    val ts = (d: String) => java.sql.Timestamp.from(java.time.Instant.parse(d))
    assert(rows.size == 3, s"got ${rows.size} rows, quar=$quar")
    assert(rows(0) == Seq(7L, true, 200, -5,
      java.math.BigDecimal.valueOf(1234567L, 4), 2.5,
      ts("2000-01-01T12:00:00Z"),
      "01020304-0506-0708-090a-0b0c0d0e0f10", "Gizmo", null),
      s"r1 decoded as ${rows(0)}")
    // r2: flag false from the mask, cnt/name null, epoch day 25569 = 1970
    assert(rows(1) == Seq(8L, false, 3, null,
      java.math.BigDecimal.valueOf(-50000L, 4), -0.25,
      ts("1970-01-01T00:00:00Z"),
      "01020304-0506-0708-090a-0b0c0d0e0f10", null, null),
      s"r2 decoded as ${rows(1)}")
    // pre-ALTER row: the note column post-dates it -> null
    assert(rows(2)(0) == 9L && rows(2)(8) == "Old" && rows(2)(9) == null)
    // memo seam noted once per page (the data page is page index 2),
    // overflow + corrupt rows quarantined by their row-keyed slots
    assert(quar.exists { case (k, msg) => k == 2 && msg.contains("note") &&
      msg.contains("MEMO") }, s"quar=$quar")
    assert(quar.count { case (_, msg) => msg.contains("MEMO") } == 1,
      "seam note must fire once per page, not per row")
    assert(quar.exists { case (k, msg) => k == -(2 * 1000 + 4) &&
      msg.contains("overflow") })
    assert(quar.exists { case (k, msg) => k == -(2 * 1000 + 5) &&
      msg.contains("var extent") })
  }

  test("MDB end-to-end: catalog + row decode + K1 transport, no converter") {
    import graft.sources.{MdbCatalog, TableMigrator}
    val guid = Array[Byte](0x04, 0x03, 0x02, 0x01, 0x06, 0x05, 0x08, 0x07,
      0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x0e, 0x0f, 0x10)
    // page1 filler, page2 MSysObjects tdef, page3 widgets tdef,
    // page4 catalog rows (naming page 3), page5 widgets rows
    val bytes = jetHeader(0x01) ++ new Array[Byte](PageSize) ++
      msysTdefPage ++ tdef4Rich(0x4E, widgetCols) ++
      jet4DataPage(2, Seq(
        msysRow(2, 1, "MSysObjects".getBytes("UTF-16LE")) -> 0,
        msysRow(3, 1, "widgets".getBytes("UTF-16LE")) -> 0)) ++
      jet4DataPage(3, Seq(
        widgetRow(7, flag = true, 200, Some(-5), 1234567L, 2.5,
          36526.5, guid, Some("Gizmo"),
          note = inlineMemoDef("memo rides along".getBytes("UTF-16LE"))) -> 0))
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val defs = MdbCatalog.toTableDefs(cat)
    assert(defs.map(_.name) == Seq("widgets"))
    val byName = cat.tables.map(t =>
      cat.names.getOrElse(t.page, t.defaultName) -> t).toMap
    val rec = new JdbcRecorder
    val results = TableMigrator.migrateJdbc(spark, defs,
      name => MdbCatalog.tableDataFrame(spark, bytes, cat.pageSize,
        byName(name), name),
      rec.connection)
    assert(results.map(r => r.table -> r.rows) == Seq("widgets" -> 1L))
    // §1.2 parity at the wire: BOOLEAN as 0/1 int, MONEY as its 4-dp
    // string, MEMO as TEXT passthrough (createTable case 13),
    // everything else typed passthrough
    assert(rec.inserted.size == 1)
    val row = rec.inserted.head
    assert(row(0) == 7L && row(1) == 1 && row(2) == 200 && row(3) == -5)
    assert(row(4) == "123.4567", s"money wire value ${row(4)}")
    assert(row(8) == "Gizmo")
    assert(row(9) == "memo rides along", s"memo wire value ${row(9)}")
  }

  test("MDB rows: Jet3 rows decode, including >255 B via the jump table") {
    import graft.sources.MdbCatalog
    // clientid LONG fixed @0 (4B), since DOUBLE-dated fixed @4 (8B),
    // clientname TEXT var index 0. Fixed area = 12 bytes.
    val tdefP = tdef3Page(0x4E, Seq(
      ("clientid", 0x04, 0, true), ("clientname", 0x0A, 1, false),
      ("since", 0x08, 2, true)))
    val b3 = java.nio.ByteBuffer.wrap(tdefP)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val descBase = 0x2B
    b3.putShort(descBase + 14, 0.toShort)       // clientid fixed off 0
    b3.putShort(descBase + 18 + 3, 0.toShort)   // clientname var index 0
    b3.putShort(descBase + 36 + 14, 4.toShort)  // since fixed off 4
    def jet3Row(id: Int, name: Option[String], days: Double,
        pad: Int = 0): Array[Byte] = {
      val nb = name.map(_.getBytes("ISO-8859-1")).getOrElse(Array.empty[Byte])
      val varStart = 1 + 12
      val len = varStart + nb.length + pad + 2 + 1 + 1 // offs, cnt, mask
      val r = new Array[Byte](len)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      r(0) = 3
      buf.putInt(1, id)
      buf.putDouble(1 + 4, days)
      nb.copyToArray(r, varStart)
      r(len - 1) = (0x05 | (if (name.isDefined) 0x02 else 0)).toByte
      r(len - 2) = 1 // numVar
      r(len - 3) = varStart.toByte
      r(len - 4) = (varStart + nb.length).toByte
      r
    }
    // A REAL >255-byte Jet3 row: 300-char name, so the row end crosses
    // one 256 boundary. Trailer from the end: mask(1) + numVar(1) +
    // jump table(1 entry = the var INDEX at which offsets wrapped) +
    // two 1-byte var offsets stored mod 256.
    val longName = "A" * 300
    val longRow = {
      val nb = longName.getBytes("ISO-8859-1")
      val varStart = 1 + 12
      val len = varStart + nb.length + 2 + 1 + 1 + 1 // offs, jump, cnt, mask
      val r = new Array[Byte](len)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      r(0) = 3
      buf.putInt(1, 9)
      buf.putDouble(1 + 4, 36526.0)
      nb.copyToArray(r, varStart)
      r(len - 1) = 0x07          // mask: all three present
      r(len - 2) = 1             // numVar
      r(len - 3) = 1             // jump entry: wrap occurs at var idx 1
      r(len - 4) = varStart.toByte                    // var[0] = 13
      r(len - 5) = ((varStart + nb.length) % 256).toByte // var[1] mod 256
      r
    }
    assert(longRow.length > 255 && longRow.length < 512)
    def jet3DataPage(owner: Int, rows: Seq[Array[Byte]]): Array[Byte] = {
      val p = new Array[Byte](2048)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x01; p(1) = 0x01
      buf.putInt(0x04, owner)
      buf.putShort(0x08, rows.size.toShort)
      var end = 2048
      rows.zipWithIndex.foreach { case (row, i) =>
        val start = end - row.length
        row.copyToArray(p, start)
        buf.putShort(0x0A + 2 * i, start.toShort)
        end = start
      }
      p
    }
    val bytes = jetHeader(0x00).take(2048) ++ tdefP ++
      jet3DataPage(1, Seq(
        jet3Row(41, Some("Aroha Wireless"), 36526.0),
        jet3Row(42, None, 25569.5),
        longRow))
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val tdef = cat.tables.find(_.page == 1).getOrElse(fail("tdef missing"))
    val (rows, quar) = MdbCatalog.readRows(bytes, 2048, tdef)
    val ts = (d: String) => java.sql.Timestamp.from(java.time.Instant.parse(d))
    assert(rows == Seq(
      Seq(41L, "Aroha Wireless", ts("2000-01-01T00:00:00Z")),
      Seq(42L, null, ts("1970-01-01T12:00:00Z")),
      Seq(9L, longName, ts("2000-01-01T00:00:00Z"))),
      s"got ${rows.map(_.map { case s: String if s.length > 20 =>
        s"<${s.length} chars>"; case v => v })}, quar=$quar")
    assert(quar.isEmpty, s"quar=$quar")
  }

  test("MDB catalog: Jet3 MSysObjects rows also recover real names") {
    import graft.sources.MdbCatalog
    // Jet3 MSysObjects slice: Id LONG fixed @0, Type INT fixed @4,
    // Name TEXT var index 0 — the page-2 catalog, 2048-byte layout
    val msys3 = tdef3Page(0x53, Seq(
      ("Id", 0x04, 0, true), ("Type", 0x03, 1, true), ("Name", 0x0A, 2, false)))
    val b3 = java.nio.ByteBuffer.wrap(msys3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b3.putShort(0x2B + 14, 0.toShort)       // Id fixed offset 0
    b3.putShort(0x2B + 18 + 14, 4.toShort)  // Type fixed offset 4
    b3.putShort(0x2B + 36 + 3, 0.toShort)   // Name var index 0
    val user = tdef3Page(0x4E, Seq(("clientid", 0x04, 0, true)))
    def catRow(id: Int, typ: Int, name: String): Array[Byte] = {
      val nb = name.getBytes("US-ASCII")
      val varStart = 1 + 6
      val len = varStart + nb.length + 2 + 1 + 1
      val r = new Array[Byte](len)
      val buf = java.nio.ByteBuffer.wrap(r)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      r(0) = 3
      buf.putInt(1, id)
      buf.putShort(1 + 4, typ.toShort)
      nb.copyToArray(r, varStart)
      r(len - 1) = 0x07                  // all three columns present
      r(len - 2) = 1                     // numVar
      r(len - 3) = varStart.toByte
      r(len - 4) = (varStart + nb.length).toByte
      r
    }
    def dataPage3(owner: Int, rows: Seq[Array[Byte]]): Array[Byte] = {
      val p = new Array[Byte](2048)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p(0) = 0x01; p(1) = 0x01
      buf.putInt(0x04, owner)
      buf.putShort(0x08, rows.size.toShort)
      var end = 2048
      rows.zipWithIndex.foreach { case (row, i) =>
        val start = end - row.length
        row.copyToArray(p, start)
        buf.putShort(0x0A + 2 * i, start.toShort)
        end = start
      }
      p
    }
    val bytes = jetHeader(0x00).take(2048) ++ new Array[Byte](2048) ++
      msys3 ++ user ++ dataPage3(2, Seq(
        catRow(2, 1, "MSysObjects"),
        catRow(3, 1, "licence3"),
        catRow(99, 5, "notATable")))
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    assert(cat.names == Map(2 -> "MSysObjects", 3 -> "licence3"),
      s"got ${cat.names}, quar ${cat.quarantined}")
    assert(MdbCatalog.toTableDefs(cat).map(_.name) == Seq("licence3"))
  }

  test("MDB catalog: non-mdb and unsupported inputs fail at the door") {
    import graft.sources.MdbCatalog
    // wrong magic
    assert(MdbCatalog.read("PK not a jet database file".getBytes("US-ASCII"))
      .left.exists(_.contains("magic")))
    // truncated header
    assert(MdbCatalog.read(Array[Byte](0x00, 0x01))
      .left.exists(_.contains("truncated")))
    // right magic, garbled format string
    val garbled = jetHeader(0x01, "Standard XYZ DB")
    assert(MdbCatalog.read(garbled).left.exists(_.contains("format string")))
    // Jet3 headers pass the gate (TDEF enumeration landed in r7); a
    // Jet3 file with no tdef pages is an empty catalog, and names stay
    // unresolved (row decode is the declared Jet3 seam)
    val jet3 = jetHeader(0x00).take(2048)
    val cat3 = MdbCatalog.read(jet3 ++ new Array[Byte](2048))
      .fold(e => fail(e), identity)
    assert(cat3.version == 0x00 && cat3.pageSize == 2048 &&
      cat3.tables.isEmpty && cat3.names.isEmpty)
    // ACE (accdb) headers pass the gate with the Jet4 layout
    val ace = jetHeader(0x02, "Standard ACE DB")
    assert(MdbCatalog.read(ace).exists(_.tables.isEmpty))
  }
}
