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

  val ops: Seq[Op] = Seq(
    Op("csv_json_reshape", csvJsonReshape _, Some(csvJsonReshapeSql)),
  )
}
