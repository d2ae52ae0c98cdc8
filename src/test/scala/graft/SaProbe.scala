package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{FuzzyMatch, SuffixArray}

/** Corpus-scale probe for the suffix-array and fuzzy-match families:
  * the registered ops run on the ≤ 5k-doc fixture, so their sf probes
  * bound the per-doc constants, not the corpus slope. This plants a
  * synthetic corpus at 25k → 250k documents (hash-derived 12-word
  * texts over a 2 000-word vocabulary; 1% carry a shared boilerplate
  * sentence — the cross-doc repeated-span signal at volume), runs
  * `text_suffix_array` / `dedup_repeat_corpus` /
  * `fuzzy_match_best` directly, validates the planted detections, and
  * prints walls for the slope read.
  *
  * Usage: sbt "Test/runMain graft.SaProbe [nDocs] [nDocs2]"
  */
object SaProbe {
  def main(args: Array[String]): Unit = {
    val n1 = if (args.length > 0) args(0).toInt else 25000
    val n2 = if (args.length > 1) args(1).toInt else 250000
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def plant(n: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"saprobe_$n").toString
      val words = (0 until 12).map(i =>
        expr(s"concat('w', pmod(hash(id, $i), 2000))"))
      spark.range(n.toLong)
        .select(col("id").as("doc_id"),
          when(col("id") % 100 === 0,
            concat_ws(" ",
              lit("shared boilerplate sentence planted across docs") +:
                words: _*))
            .otherwise(concat_ws(" ", words: _*)).as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[saprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    Seq(n1, n2).foreach { n =>
      val dir = plant(n)
      println(s"[saprobe] === n=$n ===")
      // aggregate OVER sa_rank so column pruning cannot drop the
      // window chain (a bare count() measures only the explode)
      val saSum = time(s"suffix_array n=$n")(
        SuffixArray.suffixArray(spark, dir)
          .agg(sum(col("sa_rank")), count(lit(1))).head())
      println(s"[saprobe] suffix rows: ${saSum.getLong(1)}")
      val rep = time(s"repeat_corpus n=$n")(
        SuffixArray.repeatCorpus(spark, dir)
          .where(col("max_xdoc_repeat") === 32).count())
      // every boilerplate carrier shares a ≥32-char span with another
      val carriers = n / 100
      println(s"[saprobe] 32-cap repeat docs: $rep (carriers: $carriers)")
      assert(rep >= carriers,
        s"planted boilerplate under-detected: $rep < $carriers")
      val best = time(s"fuzzy_match_best n=$n")(
        FuzzyMatch.matchBest(spark, dir).count())
      // recall under saturation: the per-block cap (the LshBucketCap
      // discipline) sheds corpus rows once a 4-char block exceeds 64
      // entries, so on this deliberately dense vocabulary recall
      // falls below the fixture's 100% as blocks saturate — REPORT
      // the measured recall (the probe's finding), floor it at 30%
      println(f"[saprobe] fuzzy best rows: $best of $n " +
        f"(recall ${best * 100.0 / n}%.1f%%)")
      assert(best >= n * 3L / 10, s"fuzzy recall collapsed: $best of $n")
    }
    spark.stop()
  }
}
