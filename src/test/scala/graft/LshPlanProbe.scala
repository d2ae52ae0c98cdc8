package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan microscope for the anchor-capped LSH candidate stage:
  * prints the executed plan of the bucket self-join so the exchange
  * count (and ReusedExchange) can be audited by eye. Not a spec —
  * plan-shape asserts live in DedupSimilaritySpec once the shape is
  * confirmed.
  *
  * Usage: sbt "Test/runMain graft.LshPlanProbe <sfDir>"
  */
object LshPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, args(0), "documents")
    val sh = docs.select(col("doc_id"),
        org.apache.spark.sql.graft.ShingleHash
          .charShingleHashes(trim(col("text"))).as("shingles"))
      .where(col("shingles").isNotNull).persist()
    val buckets = sh.select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.ShingleHash
          .minhashBands(col("shingles"))))
      .toDF("doc_id", "band", "bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("doc_id"))
    val anchors = buckets.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 64)
      .select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
    val cand = anchors.join(
        buckets.select(col("doc_id").as("doc_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand.collect()
    val plan = cand.queryExecution.executedPlan.toString()
    val nEx = "Exchange".r.findAllMatchIn(plan).size
    val nReuse = "ReusedExchange".r.findAllMatchIn(plan).size
    println(s"[lshplan] exchanges=$nEx reused=$nReuse")
    println(plan.take(6000))
    spark.stop()
  }
}
