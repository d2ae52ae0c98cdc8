package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (TESTDATA.md): one parquet file per table under a
  * scale-factor directory. Mirrors the reference's catalog-driven table
  * access (fetch.go:222, select_point_to_point_links.sql:49-58) — tables
  * are addressed by name, schema comes from file metadata, never inferred
  * from data (SURVEY.md §1.1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view, making the whole
    * catalog addressable from `spark.sql` — the same table names the
    * DuckDB oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try apply(spark, dir, n).createOrReplaceTempView(n)
      catch { case _: Exception => () } // missing fixture file: skip
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown fixture table: $name")
    if (name == "events") {
      // The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects outright. Read nanos as epoch
      // longs, then truncate to microsecond timestamps — the same ns→µs
      // truncation DuckDB applies, so oracle timestamps agree exactly.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // TIMESTAMP_NTZ matches the fixture's naive (isAdjustedToUTC=false)
      // semantics: parquet dumps read back as timestamp[us] with no zone,
      // exactly what DuckDB produces for the same data.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000"))
              .cast(org.apache.spark.sql.types.TimestampNTZType))
        case org.apache.spark.sql.types.TimestampType =>
          df.withColumn("ts",
            df("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
