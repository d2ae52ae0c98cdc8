package graft

import org.apache.spark.sql.SparkSession

import graft.operators.HtmlExtract

/** Scale probe for the incremental domain rank (r11 verdict #5 "done"
  * criterion): with the history artifacts persisted, a batch pays only
  * batch-page extraction + the domain-sized rank core — cost must track
  * the batch, not history. Cold = first call (builds + stores history),
  * warm = steady state (best-of-3), full = `graph_domain_rank`'s whole-
  * corpus recompute for comparison.
  *
  * Usage: sbt "Test/runMain graft.DrProbe <dir1> <dir2> ..."
  */
object DrProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def best3(f: () => Unit): Double = (1 to 3).map(_ => time(f)).min
    dirs.foreach { dir =>
      val cold = time(() => HtmlExtract.domainRankIncremental(spark, dir)
        .foreach(_ => ()))
      val warm = best3(() => HtmlExtract.domainRankIncremental(spark, dir)
        .foreach(_ => ()))
      val full = best3(() => HtmlExtract.domainRank(spark, dir)
        .foreach(_ => ()))
      println(f"[dr-probe] dir=$dir cold=$cold%.2f warm=$warm%.2f " +
        f"full=$full%.2f")
    }
    spark.stop()
  }
}
