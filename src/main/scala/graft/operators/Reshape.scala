package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Op, Tables}
import graft.sources.CsvJsonEgress

/** The reference's CSV→JSON reshape as a verifiable operator
  * (SURVEY.md §2.2 K3, §1.2 layer 3): every column degraded to its
  * string form, column order preserved — exactly what survives the
  * `sqlite3 .mode csv | csv.DictReader | json.dump` chain
  * (`csv2json2.py:1-3`, "Note all output fields are strings").
  *
  * The oracle twin applies SQL VARCHAR casts to the same flagship-query
  * result, checking that Spark's string rendering of every type
  * (bigint/double/int/string) matches DuckDB's — the typed→string
  * boundary is where silent format drift would otherwise hide.
  */
object Reshape {

  def csvJsonReshape(spark: SparkSession, dir: String): DataFrame =
    CsvJsonEgress.allStrings(Relational.p2pLinks(spark, dir))

  val csvJsonReshapeSql: String = {
    val cols = Seq("licence_id", "client", "rx_location", "rx_code",
      "rx_region", "tx_location", "tx_code", "tx_region", "qty", "price",
      "line_no")
    val casts = cols.map(c => s"CAST($c AS VARCHAR) AS $c").mkString(",\n       ")
    s"""SELECT $casts
       |FROM (
       |${Relational.p2pLinksSql}
       |)""".stripMargin
  }

  /** Columnar-format round-trip gate: the documents table written to
    * ORC (Spark's second first-class columnar format — the one a
    * Hive-side consumer reads) and read back must be ROW-EXACT and
    * schema-identical. The comparison is declarative: a full-outer
    * join on the key with a null-safe bool_and over every column —
    * a dropped, duplicated, or value-mutated row breaks either the
    * count or the conjunction, and both sides red CORRECTNESS because
    * the oracle pins the count from the source table and the booleans
    * TRUE. Writes go to a DETERMINISTIC source-keyed scratch path in
    * overwrite mode (bounded: one copy of the fixture table that
    * repeat bench/verify invocations overwrite in place, never
    * accumulate — the SnapshotStore content-addressing idea); at
    * warehouse scale this is the format-migration smoke gate run on a
    * sampled partition, same plan.
    */
  def orcRoundtripCheck(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, dir, "documents")
    // Key by (source dir, THIS session's application id): the content
    // key alone made the path predictable and shared, so two concurrent
    // sessions over the same fixture raced overwrite-vs-read (and a
    // world-readable fixed /tmp name is squattable). The applicationId
    // is unique per SparkContext, so each session gets its own scratch
    // while repeat invocations WITHIN a session still overwrite in
    // place rather than accumulate.
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|${spark.sparkContext.applicationId}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_orc_$key").toString
    val path = s"$tmp/documents.orc"
    d.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    val b = back.select(col("doc_id"), col("text").as("t2"),
      col("lang").as("l2"), col("source").as("s2"), col("n_chars").as("n2"))
    d.join(b, Seq("doc_id"), "full_outer")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(bool_and(col("text") <=> col("t2") &&
          col("lang") <=> col("l2") && col("source") <=> col("s2") &&
          col("n_chars") <=> col("n2")), lit(true)).as("roundtrip_exact"))
      .withColumn("schema_ok",
        lit(back.schema.map(f => (f.name, f.dataType)) ==
          d.schema.map(f => (f.name, f.dataType))))
  }

  val orcRoundtripCheckSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |       true AS roundtrip_exact,
      |       true AS schema_ok
      |FROM documents""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("csv_json_reshape", csvJsonReshape _, Some(csvJsonReshapeSql)),
    Op("src_orc_roundtrip_check", orcRoundtripCheck _,
      Some(orcRoundtripCheckSql)),
  )
}
