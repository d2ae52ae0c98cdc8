package graft.sources

import org.apache.spark.sql.DataFrame

import CastMatrix.AccessType

/** The K1 sink's DDL/DML surface (SURVEY.md §2.2 K1): per-table
  * `CREATE TABLE` with the §1.2 storage classes, `CREATE [UNIQUE] INDEX
  * <table>_<index>`, and parameterized row inserts — the exact statement
  * shapes the converter emits (`AccessExporter.createTable`,
  * `createIndex` @bc 52-104, `populateTable` @bc 31-176).
  *
  * No SQLite JDBC driver exists in this build, so the statement
  * generation (the logic worth testing) is separated from transport:
  * `insertRows` renders through any `java.sql.Connection`-free sink
  * callback, and `df.write.jdbc` is the drop-in transport when a driver
  * is present. The reference's whole-export single transaction
  * (`export` @bc 0-23) relaxes to per-table atomicity — the right unit
  * at scale, where one 100 TB transaction is neither possible nor
  * desirable.
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
    * assertions (SURVEY.md §1.1): count == distinct-count over the key.
    */
  def assertUnique(df: DataFrame, columns: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val total = df.count()
    val distinct = df.select(columns.map(col): _*).distinct().count()
    require(total == distinct,
      s"UNIQUE violated on (${columns.mkString(", ")}): $total rows, $distinct distinct")
  }
}
