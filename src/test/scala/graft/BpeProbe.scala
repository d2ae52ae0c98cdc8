package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Scale probe for the sampled BPE trainer (r11 verdict #1 "done"
  * criterion): learning cost must be independent of corpus size, because
  * the only corpus-sized work is the doc-sample filter + one word-count
  * shuffle, and the driver-local learning sees at most `VocabWords` rows.
  *
  * Usage: sbt "Test/runMain graft.BpeProbe <dir1> <dir2> ..."
  * Prints per-dir (docs, vocab, merges, wordcount_sec, learn_sec).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    dirs.foreach { dir =>
      val nDocs = Tables(spark, dir, "documents").count()
      // best-of-3 per stage, matching the Bench discipline
      def best(f: () => Unit): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
      var wc: Array[(String, Long)] = null
      val tWc = best(() => wc = Bpe.sampledWordCounts(spark, dir))
      var merges: Seq[(String, String)] = null
      val tLearn = best(() => merges = Bpe.learnMergesLocal(wc))
      println(f"[bpe-probe] dir=$dir docs=$nDocs vocab=${wc.length} " +
        f"merges=${merges.size} wordcount_sec=$tWc%.3f learn_sec=$tLearn%.3f")
    }
    spark.stop()
    // real-vocabulary-scale learner timing: a synthetic Zipf dict at the
    // VocabWords cap, merge budget MergeRounds — the shape a 100 TB corpus
    // hands the driver after sampling/truncation
    val rnd = new java.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val dict = Array.tabulate(65536) { i =>
      val len = 3 + rnd.nextInt(12)
      val w = (0 until len)
        .map(_ => alpha.charAt(rnd.nextInt(alpha.length))).mkString
      (w + i.toString, (1000000L / (i + 1)) + 1L) // Zipf-ish counts
    }
    val t0 = System.nanoTime()
    val m = Bpe.learnMergesLocal(dict)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-probe] synthetic vocab=${dict.length} " +
      f"merges=${m.size} learn_sec=$sec%.2f")
  }
}
