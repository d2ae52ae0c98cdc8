package graft
import org.apache.spark.sql.SparkSession

/** Plan-dump (and optional result-dump) tool for iterating on a single
  * query: `runMain graft.Explain [-x] [queryName ...]` prints each
  * query's formatted physical plan; `-x` executes the query first so the
  * FINALIZED adaptive plan is shown (ReusedExchange / runtime join
  * demotions are only visible post-execution). Set SPARK_GRAFT_SHOW=N to
  * also print the first N result rows. SPARK_GRAFT_SF_DIR overrides the
  * fixture dir. The session carries the same `GraftExtensions` wiring as
  * Verify/Bench, so optimizer-rule rewrites (RangeJoinBanding) appear.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (flags, qnames) = args.toSeq.partition(_.startsWith("-"))
    val execute = flags.contains("-x")
    val names =
      if (qnames.nonEmpty) qnames
      else Seq("p2p_links", "q1_agg", "sim_topk_bruteforce")
    val show = sys.env.get("SPARK_GRAFT_SHOW").map(_.toInt)
    for (name <- names) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      if (execute) df.collect() // finalize THIS df's adaptive plan
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      show.foreach { n => df.show(n, truncate = false); println(s"rows=${df.count()}") }
    }
    spark.stop()
  }
}
