package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout: the persistent half of the shuffle story.
  *
  * A join between two tables bucketed (and sorted) on their join keys
  * with the same bucket count is planned WITHOUT exchanges — each task
  * zips bucket i of both sides. For fact-to-fact joins that repeat
  * across a pipeline's runs (orders ⋈ lineitem here; licence ⋈
  * spectrum in the reference's schema), paying one bucketed write
  * amortizes the shuffle out of every subsequent join, which is the
  * single biggest cost at the 100 TB scale (`BucketingSpec` pins the
  * exchange-free plan). Bucket count is a layout decision: pick it so
  * one bucket of the LARGER table fits an executor's memory at target
  * scale, and keep it identical across tables that join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Sorting within buckets lets sort-merge joins skip their
    * sort too (plan becomes scan → join, nothing else).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
