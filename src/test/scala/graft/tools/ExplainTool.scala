package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named queries.
  * Usage: Test/runMain graft.tools.ExplainTool <sfDir> <name> [<name>...]
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = graft.SparkEntry.queries
    val (flags, names) = args.drop(1).partition(_.startsWith("-"))
    val execute = flags.contains("-x") // run first: final AQE plan, reuse visible
    names.foreach { n =>
      println(s"===== $n =====")
      val df = queries(n)(spark, dir)
      if (execute) df.collect() // finalize THIS df's AQE plan (reuse visible)
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
