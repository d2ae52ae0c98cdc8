package graft

import org.apache.spark.sql.SparkSession

/** Generic per-op timing probe for scale sweeps: run named registry
  * queries against any SF directory, warm best-of-N, one line per op —
  * the measurement harness behind BENCH_NOTES' 10×/100× family tables
  * (Bench.scala stays the driver's canonical suite record; this is the
  * builder-side microscope).
  *
  * Usage: sbt "Test/runMain graft.QueryProbe <sfDir> <op1,op2,...> [reps] [cpus]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ops = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    ops.foreach { name =>
      val fn = queries.getOrElse(name,
        sys.error(s"unknown op $name"))
      val noop = sys.env.get("GRAFT_PROBE_NOOP").contains("1")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        // GRAFT_PROBE_NOOP=1 reproduces Bench's measurement (noop sink
        // executes every expression and ships every row); default
        // count() is the cheap iteration mode
        val n = if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
          else df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"[probe] $name%-32s best $best%7.2f s  " +
        f"(all ${times.map(t => f"${t._1}%.2f").mkString("/")}; " +
        f"rows ${times.head._2})")
    }
    spark.stop()
  }
}
