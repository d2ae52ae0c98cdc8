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
    val user = tdefPage(0x4F, Seq(
      ("licenceid", 0x04, 0, true),    // LONG
      ("licencetype", 0x0A, 1, false), // TEXT
      ("active", 0x01, 2, true),       // BOOLEAN
      ("fee", 0x05, 3, true),          // MONEY
      ("issued", 0x08, 4, true)),      // SHORT_DATE_TIME
      numRealIdx = 2)
    val dataPage = { val d = new Array[Byte](PageSize); d(0) = 0x01; d }
    val badCode = tdefPage(0x4F, Seq(("mystery", 0x7E, 0, true)))
    val truncated = tdefPage(0x4F, Seq(("n", 0x0A, 0, false)),
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
    // Jet3 is recognized and reported as the declared seam, not mis-parsed
    val jet3 = jetHeader(0x00).take(2048)
    assert(MdbCatalog.read(jet3 ++ new Array[Byte](2048))
      .left.exists(_.contains("Jet3")))
    // ACE (accdb) headers pass the gate with the Jet4 layout
    val ace = jetHeader(0x02, "Standard ACE DB")
    assert(MdbCatalog.read(ace).exists(_.tables.isEmpty))
  }
}
