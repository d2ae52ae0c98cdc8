package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Recall/latency sweep for the PQ training-depth dial (r11 verdict #4):
  * recall@10 of `topkPqTrained(rounds)` against the exact brute-force
  * top-k, plus wall time, per Lloyd round count.
  *
  * Usage: sbt "Test/runMain graft.PqProbe [sfDir]"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bf = Similarity.topkBruteForce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    // composed serving stack: recall of IVF-gated ADC vs brute force
    val t0 = System.nanoTime()
    val ivfpq = Similarity.topkIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val sec0 = (System.nanoTime() - t0) / 1e9
    val rc = bf.keys.toSeq
      .map(q => bf(q).intersect(ivfpq.getOrElse(q, Set.empty)).size)
      .sum / (bf.size * 10.0)
    println(f"[pq-probe] dir=$dir IVFPQ recall@10=$rc%.3f wall_sec=$sec0%.2f")
    for {
      ks <- Seq(64, 128)
      shortlist <- Seq(100, 150, 200)
      rounds <- Seq(2, 4)
    } {
      val t0 = System.nanoTime()
      val pq = Similarity.topkPqTrained(spark, dir, rounds, ks, shortlist)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = bf.keys.toSeq
        .map(q => bf(q).intersect(pq.getOrElse(q, Set.empty)).size)
        .sum / (bf.size * 10.0)
      println(f"[pq-probe] dir=$dir ks=$ks shortlist=$shortlist " +
        f"rounds=$rounds recall@10=$recall%.3f wall_sec=$sec%.2f")
    }
    spark.stop()
  }
}
