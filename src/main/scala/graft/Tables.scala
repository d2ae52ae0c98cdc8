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

  /** O5 wired into the optimizer: register the fixture tables as CATALOG
    * tables (temp views can't carry statistics), `ANALYZE TABLE` each for
    * row counts + per-column NDV/min/max, and switch on cost-based
    * optimization. This is the reference's `ANALYZE` step
    * (`fetch.go:198-202` — run right after the database lands, so the
    * planner has stats before the first query) in Spark terms: with CBO
    * on, filter selectivity comes from column stats instead of raw file
    * size, which is what lets the planner broadcast a
    * filtered-but-large-file side and reorder multi-joins. At 100 TB the
    * same statement sequence runs against the metastore after ingest.
    *
    * `events` stays a temp view (its raw parquet carries NANOS
    * timestamps that need the read-time normalization in `apply`), so it
    * keeps spark.sql addressability without stats.
    */
  def registerAllWithStats(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    names.foreach { n =>
      if (new java.io.File(s"$dir/$n.parquet").exists()) {
        if (n == "events") {
          apply(spark, dir, n).createOrReplaceTempView(n)
        } else {
          // A same-named temp view (from any earlier registerAll in the
          // session) shadows the catalog table, and ANALYZE would
          // resolve the view first and throw "not supported on views" —
          // drop it here instead of making every caller know to.
          spark.catalog.dropTempView(n)
          spark.sql(s"DROP TABLE IF EXISTS $n")
          spark.catalog.createTable(n, s"$dir/$n.parquet", "parquet")
          spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
          // Column stats (NDV/min/max/null-count) only exist for atomic
          // types — ANALYZE errors outright on array/map/struct columns
          // (e.g. embeddings.embedding), so enumerate the eligible ones.
          val statCols = {
            import org.apache.spark.sql.types._
            spark.table(n).schema.fields.collect {
              case f if (f.dataType match {
                case ByteType | ShortType | IntegerType | LongType |
                     FloatType | DoubleType | StringType | BooleanType |
                     DateType | TimestampType | TimestampNTZType => true
                case _: DecimalType => true
                case _ => false
              }) => f.name
            }
          }
          if (statCols.nonEmpty) spark.sql(
            s"ANALYZE TABLE $n COMPUTE STATISTICS FOR COLUMNS ${statCols.mkString(", ")}")
        }
      }
    }
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
