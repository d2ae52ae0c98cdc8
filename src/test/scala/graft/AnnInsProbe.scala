package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Cost split for incremental ANN maintenance (r12 verdict #3): the
  * once-per-version BASE build (IVF Lloyd train + corpus assign, PQ
  * book train + corpus encode) vs the per-batch INSERT step (assign +
  * encode the batch against the frozen artifacts). The insert is the
  * cost a growing corpus pays per batch — it must track |batch|, not
  * |corpus|.
  *
  * Usage: sbt "Test/runMain graft.AnnInsProbe [sfDir]"
  */
object AnnInsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.where(col("vec_id") % 10 =!= 9)
    val batch = e.where(col("vec_id") % 10 === 9)
    val n = (base.count(), batch.count())
    val store = new graft.sources.SnapshotStore(
      java.nio.file.Files.createTempDirectory("annprobe").toString,
      spark.sparkContext.hadoopConfiguration)
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annins] $what%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s"  (base=${n._1} batch=${n._2})")
      r
    }
    timed("base build")(Similarity.buildIncBase(spark, store, base, "p0"))
    timed("ivf insert")(
      Similarity.ivfInsertStep(spark, store, batch, "p0", "p1"))
    timed("pq insert")(
      Similarity.pqInsertStep(spark, store, batch, "p0", "p1"))
    timed("drift report")(
      Similarity.insertDriftReport(spark, store, "p0", "p1").collect())
    spark.stop()
  }
}
