package graft

import java.io.{File, FileOutputStream}
import java.util.zip.ZipFile

import graft.sources.MdbCatalog

/** Golden-file evidence for the Access reader, against bytes this
  * repo's constants did NOT produce (closing the self-referential-
  * fixture gap open since r6):
  *
  *  1. the REAL Microsoft-produced Jet4 template databases shipped
  *     inside the reference's vendored Jackcess
  *     (`mdb-sqlite.jar!lib/jackcess-1.2.1.jar!com/healthmarketscience/
  *     jackcess/empty.mdb` and `empty2003.mdb`) must read: header,
  *     TDEF walk, and the MSysObjects row decode recovering every
  *     system table's name;
  *  2. the vendored Jackcess itself, driven reflectively as an
  *     INDEPENDENT WRITER, creates a database with one column per
  *     §1.2 type and a data row — and `MdbCatalog` must round-trip it
  *     through the same catalog → row-decode → CastMatrix path the
  *     migration uses.
  *
  * This evidence found a real bug on arrival: user tables are TDEF
  * type 0x4E (not the 0x4F the r6–r8 readers and their synthetic
  * fixtures agreed on), and Access's own NavPane tables are
  * user-TYPED but system-FLAGGED via MSysObjects.Flags.
  *
  * The tests cancel (not fail) when the reference jar is absent —
  * golden evidence is only claimable where the golden bytes exist.
  */
class GoldenMdbSpec extends SparkSpec {

  private val refJar = new File("/root/reference/mdb-sqlite.jar")

  /** Extract `entry` from the jar at `outer` into a temp file. */
  private def extract(outer: File, entry: String, suffix: String): File = {
    val zf = new ZipFile(outer)
    try {
      val e = zf.getEntry(entry)
      assert(e != null, s"$entry missing from ${outer.getName}")
      val out = File.createTempFile("golden", suffix)
      out.deleteOnExit()
      val in = zf.getInputStream(e)
      val os = new FileOutputStream(out)
      try in.transferTo(os) finally { os.close(); in.close() }
      out
    } finally zf.close()
  }

  private lazy val jackcessJar: File =
    extract(refJar, "lib/jackcess-1.2.1.jar", ".jar")
  private lazy val commonsLangJar: File =
    extract(refJar, "lib/commons-lang-2.4.jar", ".jar")
  private lazy val commonsLoggingJar: File =
    extract(refJar, "lib/commons-logging-1.1.1.jar", ".jar")

  private def templateBytes(name: String): Array[Byte] = {
    val f = extract(jackcessJar,
      s"com/healthmarketscience/jackcess/$name", ".mdb")
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  test("golden: Microsoft's empty.mdb template reads — header, system " +
      "catalog, MSysObjects name recovery") {
    assume(refJar.exists(), "reference jar not present")
    val cat = MdbCatalog.read(templateBytes("empty.mdb"))
      .fold(e => fail(e), identity)
    assert(cat.version == 1 && cat.pageSize == 4096)
    // the four core Jet4 system tables parse with their full documented
    // schemas; all must be marked system (0x53-typed)
    val byName = cat.tables.map(t =>
      cat.names.getOrElse(t.page, t.defaultName) -> t).toMap
    assert(byName.keySet == Set("MSysObjects", "MSysACEs", "MSysQueries",
      "MSysRelationships"), s"got ${byName.keySet}")
    assert(cat.tables.forall(_.system))
    assert(byName("MSysObjects").columns.map(_.name)
      .containsSlice(Seq("Id", "ParentId", "Name", "Type")))
    assert(byName("MSysACEs").columns.map(c =>
      c.name -> c.accessType.name) == Seq("ObjectId" -> "LONG",
      "SID" -> "BINARY", "ACM" -> "LONG", "FInheritable" -> "BOOLEAN"))
    // name recovery decoded REAL catalog rows (incl. one for the
    // 0x11-typed MSysAccessObjects tdef, which itself quarantines —
    // Access-internal type the reference's exporter also can't handle)
    assert(cat.names.values.toSet.contains("MSysAccessObjects"))
    assert(cat.quarantined.map(_._2).forall(_.contains("0x11")),
      s"unexpected quarantines: ${cat.quarantined}")
    // nothing reaches the migration loop from an empty template
    assert(MdbCatalog.toTableDefs(cat).isEmpty)
  }

  test("golden: empty2003.mdb reads clean — NavPane tables are " +
      "user-TYPED but system-FLAGGED, and stay out of the migration") {
    assume(refJar.exists(), "reference jar not present")
    val cat = MdbCatalog.read(templateBytes("empty2003.mdb"))
      .fold(e => fail(e), identity)
    assert(cat.version == 1 && cat.pageSize == 4096)
    assert(cat.quarantined.isEmpty, s"quarantined: ${cat.quarantined}")
    val names = cat.tables.map(t => cat.names(t.page)).toSet
    assert(names == Set("MSysObjects", "MSysACEs", "MSysQueries",
      "MSysRelationships", "MSysNavPaneObjectIDs", "MSysAccessStorage",
      "MSysNavPaneGroupCategories", "MSysNavPaneGroups",
      "MSysNavPaneGroupToObjects"), s"got $names")
    // the Flags overlay is what keeps the 0x4E-typed MSysNavPane*
    // tables out of toTableDefs — without it they'd migrate as user data
    assert(cat.tables.forall(_.system))
    assert(MdbCatalog.toTableDefs(cat).isEmpty)
  }

  // ------------------------------------------------- independent writer

  /** Reflection harness over the vendored Jackcess 1.2.1 (its API is
    * public knowledge; the jar is the reference's own). A separate
    * classloader keeps the 2010 jar off the test classpath; Jackcess
    * resolves its bundled resources (the empty.mdb template, the
    * index_codes tables) through the CONTEXT classloader, so `body`
    * runs with it pointed at the vendored jar.
    */
  private class Jackcess {
    val cl = new java.net.URLClassLoader(Array(jackcessJar.toURI.toURL,
      commonsLangJar.toURI.toURL, commonsLoggingJar.toURI.toURL))
    val dbCls = cl.loadClass("com.healthmarketscience.jackcess.Database")
    val colCls = cl.loadClass("com.healthmarketscience.jackcess.Column")
    val dtCls = cl.loadClass("com.healthmarketscience.jackcess.DataType")
    def dataType(name: String): AnyRef =
      dtCls.getMethod("valueOf", classOf[String]).invoke(null, name)
    def column(name: String, t: String,
        precScale: Option[(Byte, Byte)] = None,
        textLen: Option[Short] = None): AnyRef = {
      val c = colCls.getDeclaredConstructor().newInstance()
        .asInstanceOf[AnyRef]
      colCls.getMethod("setName", classOf[String]).invoke(c, name)
      colCls.getMethod("setType", dtCls).invoke(c, dataType(t))
      precScale.foreach { case (p, s) =>
        colCls.getMethod("setPrecision", java.lang.Byte.TYPE)
          .invoke(c, java.lang.Byte.valueOf(p))
        colCls.getMethod("setScale", java.lang.Byte.TYPE)
          .invoke(c, java.lang.Byte.valueOf(s))
      }
      textLen.foreach(l =>
        colCls.getMethod("setLength", java.lang.Short.TYPE)
          .invoke(c, java.lang.Short.valueOf(l)))
      c
    }
    def create(f: File): AnyRef =
      dbCls.getMethod("create", classOf[File]).invoke(null, f)
    def createTable(db: AnyRef, name: String, cols: java.util.List[_]): Unit =
      dbCls.getMethod("createTable", classOf[String],
        classOf[java.util.List[_]]).invoke(db, name, cols)
    def getTable(db: AnyRef, name: String): AnyRef =
      dbCls.getMethod("getTable", classOf[String]).invoke(db, name)
    def addRow(table: AnyRef, vals: AnyRef*): Unit = {
      val m = table.getClass.getMethod("addRow", classOf[Array[AnyRef]])
      m.setAccessible(true)
      m.invoke(table, Seq[AnyRef](vals.toArray): _*)
    }
    def close(db: AnyRef): Unit = dbCls.getMethod("close").invoke(db)
    def withContext[A](body: => A): A = {
      val prev = Thread.currentThread().getContextClassLoader
      Thread.currentThread().setContextClassLoader(cl)
      try body finally Thread.currentThread().setContextClassLoader(prev)
    }
  }

  private def writeWithJackcess(): File = {
    val jk = new Jackcess
    import jk._
    def column(name: String, t: String,
        precScale: Option[(Byte, Byte)] = None): AnyRef =
      jk.column(name, t, precScale)
    val f = File.createTempFile("jackcess-rt", ".mdb")
    f.delete() // Database.create wants to create it
    f.deleteOnExit()
    withContext {
    val db = create(f)
    val cols = java.util.Arrays.asList(
      column("c_bool", "BOOLEAN"), column("c_byte", "BYTE"),
      column("c_int", "INT"), column("c_long", "LONG"),
      column("c_money", "MONEY"), column("c_float", "FLOAT"),
      column("c_double", "DOUBLE"), column("c_date", "SHORT_DATE_TIME"),
      column("c_text", "TEXT"), column("c_memo", "MEMO"),
      column("c_numeric", "NUMERIC", Some((10.toByte, 2.toByte))),
      column("c_guid", "GUID"), column("c_bin", "BINARY"),
      column("c_ole", "OLE"))
    createTable(db, "t_all", cols)
    val table = getTable(db, "t_all")
    def row(vals: AnyRef*): Unit = addRow(table, vals: _*)
    row(java.lang.Boolean.TRUE, java.lang.Byte.valueOf(7.toByte),
      java.lang.Short.valueOf(1234.toShort),
      java.lang.Integer.valueOf(123456),
      new java.math.BigDecimal("12.3400"),
      java.lang.Float.valueOf(1.5f), java.lang.Double.valueOf(2.25),
      new java.util.Date(1407283200000L), // 2014-08-06T00:00:00Z
      "hello wireless",
      "m" * 300, // forces the writer's real LVAL path
      new java.math.BigDecimal("1234.56"),
      "{01234567-89AB-CDEF-0123-456789ABCDEF}",
      Array[Byte](1, 2, 3), Array[Byte](9, 8, 7, 6))
    // second row: all NULLs — the null-mask path on real written bytes
    row(Seq.fill[AnyRef](14)(null): _*)
    close(db)
    f
    }
  }

  /** Make Jackcess produce a genuine OVERFLOW row: pack a data page
    * tight, then grow its first row past the page's free space — the
    * writer relocates the body to a fresh page, leaves a 4-byte
    * pointer flagged 0x4000 in the old slot, and marks the body's own
    * slot 0x8000 so sequential scans skip it.
    */
  private def writeOverflowDb(): File = {
    val jk = new Jackcess
    import jk._
    val f = File.createTempFile("jackcess-ovfl", ".mdb")
    f.delete(); f.deleteOnExit()
    withContext {
      val db = create(f)
      createTable(db, "t", java.util.Arrays.asList(
        column("id", "LONG"),
        column("b1", "TEXT", textLen = Some(500.toShort)),
        column("b2", "TEXT", textLen = Some(500.toShort))))
      val table = getTable(db, "t")
      addRow(table, Int.box(0), "a", "a")
      (1 to 3).foreach { i =>
        addRow(table, Int.box(i),
          ("x" * 248) + f"$i%02d", ("y" * 248) + f"$i%02d")
      }
      val curCls = cl.loadClass("com.healthmarketscience.jackcess.Cursor")
      val cur = curCls.getMethod("createCursor",
        cl.loadClass("com.healthmarketscience.jackcess.Table"))
        .invoke(null, table)
      curCls.getMethod("moveToNextRow").invoke(cur)
      curCls.getMethod("updateCurrentRow", classOf[Array[AnyRef]])
        .invoke(cur, Seq[AnyRef](Array[AnyRef](Int.box(0),
          ("Y" * 248) + "#0", ("Z" * 248) + "#0")): _*)
      close(db)
      f
    }
  }

  test("golden overflow: a row relocated by the vendored Jackcess " +
      "resolves through its 0x4000 pointer — no data loss, no quarantine") {
    assume(refJar.exists(), "reference jar not present")
    val bytes = java.nio.file.Files.readAllBytes(writeOverflowDb().toPath)
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val tdef = cat.tables.find(t => cat.names.get(t.page).contains("t")).get
    val (rows, quarantined) = MdbCatalog.readRows(bytes, cat.pageSize, tdef)
    assert(quarantined.isEmpty, s"quarantined: $quarantined")
    assert(rows.size == 4, s"got ${rows.size} rows")
    // the relocated row carries the UPDATED body (the pointer was
    // followed, not the stale slot skipped)
    val r0 = rows.find(_.head == 0L).get
    assert(r0(1).toString == ("Y" * 248) + "#0")
    assert(r0(2).toString == ("Z" * 248) + "#0")
    assert(rows.filter(_.head != 0L).forall(
      _(1).toString.startsWith("xxxx")))
  }

  test("golden round-trip: a database CREATED by the vendored Jackcess " +
      "reads back through catalog + row decode with every §1.2 type") {
    assume(refJar.exists(), "reference jar not present")
    val f = writeWithJackcess()
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val cat = MdbCatalog.read(bytes).fold(e => fail(e), identity)
    val defs = MdbCatalog.toTableDefs(cat)
    assert(defs.map(_.name) == Seq("t_all"), s"got ${defs.map(_.name)}")
    val tdef = cat.tables.find(t =>
      cat.names.get(t.page).contains("t_all")).get
    assert(tdef.columns.map(_.name) == Seq("c_bool", "c_byte", "c_int",
      "c_long", "c_money", "c_float", "c_double", "c_date", "c_text",
      "c_memo", "c_numeric", "c_guid", "c_bin", "c_ole"))
    val (df, quarantined) = MdbCatalog.tableDataFrameWithQuarantine(
      spark, bytes, cat.pageSize, tdef, "t_all")
    assert(quarantined.isEmpty, s"quarantined: $quarantined")
    val rows = df.collect()
    assert(rows.length == 2)
    val r = rows.find(!_.isNullAt(1)).get
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 7 && r.getInt(2) == 1234)
    assert(r.getLong(3) == 123456L)
    assert(r.getDecimal(4) ==
      new java.math.BigDecimal("12.3400"), s"money ${r.getDecimal(4)}")
    assert(r.getDouble(5) == 1.5 && r.getDouble(6) == 2.25)
    assert(r.getTimestamp(7).getTime == 1407283200000L,
      s"date ${r.getTimestamp(7)}")
    assert(r.getString(8) == "hello wireless")
    assert(r.getString(9) == "m" * 300, s"memo len ${r.getString(9).length}")
    assert(r.getDouble(10) == 1234.56, s"numeric ${r.getDouble(10)}")
    // GUID: pin shape (the byte-order convention is pinned by the
    // synthetic fixtures; 1.2-era Jackcess had its own write quirk)
    assert(r.getString(11).matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"),
      s"guid ${r.getString(11)}")
    assert(r.getAs[Array[Byte]](12).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getAs[Array[Byte]](13).toSeq == Seq[Byte](9, 8, 7, 6))
    // BOOLEAN is non-nullable in Jet (the null-mask bit IS the value:
    // a null write stores false), so the all-null row reads
    // c_bool=false with every other column null
    val nullRow = rows.find(_.isNullAt(1)).get
    assert(!nullRow.getBoolean(0))
    assert((1 until 14).forall(nullRow.isNullAt),
      "all-null row must decode as nulls")
  }
}
