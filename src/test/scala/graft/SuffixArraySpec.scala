package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SuffixArray

/** Suffix-array family: planted known-answer arrays, the prefix-
  * doubling ↔ naive-sort equivalence on randomized strings, and the
  * [[org.apache.spark.sql.graft.PrefixLen]] LCP kernel (golden values
  * incl. multibyte clipping — eval and codegen share one helper).
  */
class SuffixArraySpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sa").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("banana: the textbook suffix array, ranks and longest repeat") {
    val dir = docsDir(Seq((1L, "banana")))
    val sa = SuffixArray.suffixArray(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // sorted suffixes: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    assert(sa == Map(6L -> 1L, 4L -> 2L, 2L -> 3L, 1L -> 4L,
      5L -> 5L, 3L -> 6L), s"got $sa")
    val lr = SuffixArray.longestRepeat(spark, dir).collect()
    assert(lr.length == 1)
    // max LCP = 3 ("ana" ↔ "anana"); no adjacent pair shares ≥ 8
    assert(lr.head.getLong(1) == 3L && lr.head.getLong(2) == 0L)
  }

  test("normalization: case folds, punctuation drops, cap truncates") {
    val long = ("ab" * 100) + "zq" // normalized form caps at 64 chars
    val dir = docsDir(Seq((1L, "Ba-NA!na"), (2L, long), (3L, "!!"), (4L, null)))
    val sa = SuffixArray.suffixArray(spark, dir)
    val byDoc = sa.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 normalizes to "banana" (6 suffixes); doc 2 caps at 64;
    // doc 3 normalizes to "" and is dropped entirely; null drops
    assert(byDoc == Map(1L -> 6L, 2L -> 64L), s"got $byDoc")
    val d1 = sa.where(col("doc_id") === 1).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(d1(6L) == 1L && d1(1L) == 4L)
    // doc 2 = "abab…" capped: the longest repeat is the full 62-char
    // overlap between the suffixes at pos 1 and pos 3
    val lr2 = SuffixArray.longestRepeat(spark, dir)
      .where(col("doc_id") === 2).collect().head
    assert(lr2.getLong(1) == 62L, s"got ${lr2.getLong(1)}")
    assert(lr2.getLong(2) > 0L)
  }

  test("SuffixRanks kernel ≡ naive suffix sort on randomized strings") {
    val rnd = new scala.util.Random(42)
    val alph = "abc d"
    val rows = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(63)
      id -> (1 to n).map(_ => alph(rnd.nextInt(alph.length))).mkString
    }
    val dir = docsDir(rows)
    val got = SuffixArray.suffixArray(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = rows.flatMap { case (id, text) =>
      val s = text.toLowerCase.replaceAll("[^a-z0-9 ]", "").take(64)
      if (s.length < 2) Seq.empty
      else {
        val order = (1 to s.length).sortBy(p => s.substring(p - 1))
        order.zipWithIndex.map { case (pos, i) =>
          (id, pos.toLong, (i + 1).toLong)
        }
      }
    }.toSet
    assert(got == want)
  }

  test("LongestRepeatStats kernel ≡ brute force on randomized strings") {
    val rnd = new scala.util.Random(7)
    val alph = "ab1 "
    val rows = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(63)
      id -> (1 to n).map(_ => alph(rnd.nextInt(alph.length))).mkString
    }
    val dir = docsDir(rows)
    val got = SuffixArray.longestRepeat(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.flatMap { case (id, text) =>
      val s = text.toLowerCase.replaceAll("[^a-z0-9 ]", "").take(64)
      if (s.length < 2) None
      else {
        val sufs = (1 to s.length).map(p => s.substring(p - 1)).sorted
        val lcps = sufs.sliding(2).map { case Seq(a, b) =>
          a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
        }.toSeq
        Some(id -> (lcps.max, lcps.count(_ >= 8L).toLong))
      }
    }.toMap
    assert(got == want)
  }

  test("dedup_repeat_corpus: planted cross-doc span surfaces on every carrier") {
    val span = "this exact span is shared verbatim" // 34 chars → key-capped at 32
    val dir = docsDir(Seq(
      1L -> s"first document carries $span in the middle",
      2L -> s"$span opens the second one",
      3L -> s"and a third carrier also has $span",
      4L -> "totally unrelated content with no overlap qqq"))
    val rows = SuffixArray.repeatCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every carrier reports the span at the 32-char key cap; each has
    // ≥ 1 adjacent ≥16-char pair (suffixes inside the span align too)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(rows.contains(id), s"doc $id missing: $rows")
      assert(rows(id)._1 == 32L, s"doc $id max = ${rows(id)._1}")
      assert(rows(id)._2 >= 1L)
    }
    // doc 4 shares no ≥8-char span — it must not appear
    assert(!rows.contains(4L), s"doc 4 leaked: ${rows.get(4L)}")
  }

  test("PrefixLen: golden values, multibyte clipping, codegen parity") {
    val P = org.apache.spark.sql.graft.PrefixLen
    def lcp(a: String, b: String): Long = P.commonPrefixChars(
      UTF8String.fromString(a), UTF8String.fromString(b))
    assert(lcp("", "") == 0L)
    assert(lcp("abc", "abd") == 2L)
    assert(lcp("abc", "abc") == 3L)
    assert(lcp("ab", "abc") == 2L) // strict prefix
    assert(lcp("x", "y") == 0L)
    // multibyte: é = 2 bytes; common prefix "aé" = 2 CHARS
    assert(lcp("aéz", "aéq") == 2L)
    // differing inside a codepoint: é (C3 A9) vs è (C3 A8) share the
    // C3 lead byte — the partial codepoint must NOT count
    assert(lcp("aé", "aè") == 1L)
    // 4-byte astral plane: 𝄞 (F0 9D 84 9E); shared then diverging
    assert(lcp("𝄞a", "𝄞b") == 1L)
    // continuation-vs-start difference: "aé" (61 C3 A9) vs "ao"
    // (61 6F) differ at byte 1 where a has a START byte — clean cut
    assert(lcp("aé", "ao") == 1L)
    // expression path (codegen) agrees with the helper
    import spark.implicits._
    val df = Seq(("prefix match here", "prefix mismatch"),
      ("aéz", "aèz"), ("", "x")).toDF("a", "b")
      .select(P(col("a"), col("b")).as("l"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(8L, 1L, 0L))
  }
}
