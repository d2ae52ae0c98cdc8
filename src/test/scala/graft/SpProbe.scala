package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ShardedPrefix

/** Probe for the ShardedPrefix materialization tradeoff (r15 verdict
  * nit): the eager `localCheckpoint` of the binned frame caps input
  * passes at one, but at 100 TB it is a full corpus write to executor
  * disk per call — for a twice-scanned PARQUET source (columnar,
  * filter-pushed) recompute may be cheaper. This times the same cumsum
  * over the events table (the `events_sprt`/`events_cusum` rider shape)
  * with materialize on/off, warm best-of-N, and prints the BENCH_NOTES
  * table row.
  *
  * Usage: sbt "Test/runMain graft.SpProbe <sfDir> [reps] [cpus]"
  */
object SpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"),
        unix_timestamp(col("ts").cast("timestamp")).as("ord"),
        lit(1L).as("step"))
    for (mat <- Seq(true, false)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = ShardedPrefix.cumsum(spark, ev, Seq("event_type"), "ord",
            Seq("step"), rnCol = Some("rn"), materialize = mat)
          .agg(sum(col("step_cum")), max(col("rn"))).collect()(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"materialize=$mat%-5s best-of-$reps = $best%.2f s " +
        s"(check=${times.head._2})")
    }
    spark.stop()
  }
}
