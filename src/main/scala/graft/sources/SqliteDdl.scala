package graft.sources

import org.apache.spark.sql.DataFrame

import CastMatrix.AccessType

/** The K1 sink's DDL/DML surface (SURVEY.md §2.2 K1): per-table
  * `CREATE TABLE` with the §1.2 storage classes, `CREATE [UNIQUE] INDEX
  * <table>_<index>`, and parameterized row inserts — the exact statement
  * shapes the converter emits (`AccessExporter.createTable`,
  * `createIndex` @bc 52-104, `populateTable` @bc 31-176).
  *
  * Statement generation is separated from transport: `writeTable`
  * executes the generated DDL + batched inserts against ANY
  * `java.sql.Connection` (sqlite-jdbc in a real deployment; the test
  * suite drives it with a recording in-memory connection — no SQLite
  * driver jar exists in this build). The reference's whole-export
  * single transaction (`export` @bc 0-23) relaxes to per-table
  * atomicity — the right unit at scale, where one 100 TB transaction
  * is neither possible nor desirable.
  */
object SqliteDdl {

  final case class IndexDef(name: String, columns: Seq[String], unique: Boolean)

  def createTable(table: String, columns: Seq[(String, AccessType)]): String = {
    val cols = columns
      .map { case (n, t) => s"$n ${CastMatrix.sqliteDdlType(t)}" }
      .mkString(", ")
    s"CREATE TABLE $table ($cols);"
  }

  /** `<table>_<index>` naming, UNIQUE branch included (@bc 52-66). */
  def createIndex(table: String, idx: IndexDef): String = {
    val unique = if (idx.unique) "UNIQUE " else ""
    s"CREATE ${unique}INDEX ${table}_${idx.name} ON $table (${idx.columns.mkString(", ")});"
  }

  def insertSql(table: String, columns: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES (${columns.map(_ => "?").mkString(", ")});"

  /** UNIQUE indexes have no Spark-side analog; they become data-quality
    * assertions (SURVEY.md §1.1): count == distinct-count over the key,
    * both read off ONE aggregation pass (the struct wrapper makes
    * null-keyed tuples count as distinct values, exactly like
    * `distinct().count()` — but without the second scan).
    */
  def assertUnique(df: DataFrame, columns: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val r = df.select(
      count(lit(1)).as("n"),
      countDistinct(struct(columns.map(col): _*)).as("d")).head()
    val (total, distinct) = (r.getLong(0), r.getLong(1))
    require(total == distinct,
      s"UNIQUE violated on (${columns.mkString(", ")}): $total rows, $distinct distinct")
  }

  /** K1 transport: run the generated DDL, then stream the frame through
    * batched `PreparedStatement` inserts on `conn`. A single SQLite file
    * has exactly one writer by design, so the driver-side stream IS the
    * correct topology for this sink (like the reference's in-process
    * export loop, `populateTable` @bc 31-176); `toLocalIterator` pulls
    * one partition at a time, bounding driver memory. Returns rows
    * written. For a parallel-writable JDBC target use `df.write.jdbc`
    * instead — this path exists for the single-file contract.
    *
    * The reference's whole-export transaction (`export` @bc 0-23)
    * relaxes to one transaction PER TABLE: autocommit is suspended, the
    * DDL and every insert batch commit together, and any failure rolls
    * the table back — so a mid-stream crash never leaves a
    * half-populated table (per-batch autocommits are also SQLite's
    * classic slow path: one fsync per batch instead of per table). The
    * caller's autocommit setting is restored either way.
    */
  def writeTable(conn: java.sql.Connection, table: String,
      columns: Seq[(String, AccessType)], indexes: Seq[IndexDef],
      df: DataFrame, batchSize: Int = 1000): Long = {
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    try {
      val st = conn.createStatement()
      try {
        st.execute(createTable(table, columns))
        indexes.foreach(ix => st.execute(createIndex(table, ix)))
      } finally st.close()
      val names = columns.map(_._1)
      val ps = conn.prepareStatement(insertSql(table, names).stripSuffix(";"))
      var rows = 0L
      try {
        var inBatch = 0
        val it = df.select(names.map(org.apache.spark.sql.functions.col): _*)
          .toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < names.length) {
            // Values are already §1.2-normalized (CastMatrix.toSqliteParity:
            // Boolean → 0/1 int, MONEY → string, NULL passthrough).
            ps.setObject(i + 1, if (row.isNullAt(i)) null else row.get(i))
            i += 1
          }
          ps.addBatch()
          inBatch += 1; rows += 1
          if (inBatch >= batchSize) { ps.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) ps.executeBatch()
      } finally ps.close()
      conn.commit()
      rows
    } catch {
      case e: Throwable =>
        try conn.rollback()
        catch { case s: Exception => e.addSuppressed(s) }
        throw e
    } finally {
      try conn.setAutoCommit(prevAutoCommit) catch { case _: Exception => () }
    }
  }
}
