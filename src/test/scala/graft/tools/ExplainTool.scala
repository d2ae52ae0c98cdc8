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
    args.drop(1).foreach { n =>
      println(s"===== $n =====")
      val df = queries(n)(spark, dir)
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
