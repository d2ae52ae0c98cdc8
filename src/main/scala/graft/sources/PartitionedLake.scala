package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-layout partitioned lake tables — `write.partitionBy(day)` with
  * DYNAMIC partition overwrite, the standard shape for a daily-ingest
  * fact table at 100 TB:
  *
  *  - reads with a partition-key predicate scan only the matching
  *    directories (partition pruning happens at FILE LISTING time —
  *    before any row or footer is touched — which is what makes
  *    "yesterday's data" queries independent of table history size);
  *  - re-running one day's ingest rewrites ONLY that day's directory
  *    (`partitionOverwriteMode=dynamic`): static overwrite mode would
  *    truncate the whole table — the classic lake-destroying default —
  *    so the writer pins the dynamic mode per write rather than
  *    trusting session config.
  *
  * Complements the repo's other layouts: `SnapshotStore` versions whole
  * tables (the reference's dated-copy scheme), `Bucketing` pre-shuffles
  * join keys, `ZOrder` orders within files for row-group pruning;
  * hive partitioning is the coarse-grained top layer the others nest
  * under.
  */
object PartitionedLake {

  /** Write (or idempotently re-write) partitions of `df`. Only the
    * partition values PRESENT in `df` are replaced; untouched
    * directories survive byte-identical. The mode override is scoped to
    * this writer via the DataFrameWriter option, not session config.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(cols: _*)
      .parquet(path)

  /** Events laid out by event day — the canonical daily-fact layout.
    * The partition column is DERIVED (cast of `ts`) and therefore also
    * kept as data-in-name only; `ts` itself stays in the files, so no
    * information is lost to the layout.
    */
  def writeEventsByDay(spark: SparkSession, dir: String, path: String): Unit = {
    val events = graft.Tables(spark, dir, "events")
      .withColumn("day", col("ts").cast("date"))
    writePartitioned(events, path, Seq("day"))
  }

  /** Partition-pruned day read: the `day = d` predicate binds to the
    * directory name, so the scan lists exactly one partition dir.
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).where(col("day") === lit(day).cast("date"))
}
