package graft

import graft.operators.Bpe

/** BPE learn/encode (VERDICT r10 #4): merge-rule semantics, deterministic
  * tie-breaks, early stop, and the round-trip/conservation invariants the
  * driver's `_check` twin pins.
  */
class BpeSpec extends SparkSpec {

  test("applyMerge is leftmost-first with skip") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a")
      .sameElements(Array("aa", "a")))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b")
      .sameElements(Array("ab", "ab")))
    assert(Bpe.applyMerge(Array("x"), "a", "b").sameElements(Array("x")))
    assert(Bpe.applyMerge(Array.empty[String], "a", "b").isEmpty)
  }

  test("encodeTokens applies the table in learned order") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.encodeTokens("abc", merges).sameElements(Array("abc")))
    assert(Bpe.encodeTokens("cab", merges).sameElements(Array("c", "ab")))
    assert(Bpe.encodeTokens("", merges).isEmpty)
  }

  test("learnMerges: Sennrich toy corpus, deterministic ties, early stop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "low low low lower"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val merges = Bpe.learnMerges(spark, dir, rounds = 10)
    // (l,o) and (o,w) both count 4 → pair-ASC tie-break picks (l,o);
    // after "low" merges, (e,r) sorts before (low,e); fully-merged
    // vocabulary stops the loop before the round budget
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    assert(Bpe.encodeTokens("lower", merges).sameElements(Array("lower")))
    assert(Bpe.encodeTokens("low", merges).sameElements(Array("low")))
    assert(Bpe.encodeTokens("slow", merges)
      .sameElements(Array("s", "low")))
    // the sampled-local production trainer agrees merge-for-merge with
    // the distributed reference on the same fixture (no sampling or
    // vocab truncation triggers at this size)
    assert(Bpe.learnMergesSampled(spark, dir, rounds = 10) == merges)
  }

  test("sampled-local trainer == distributed reference, merge-for-merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe3").toString
    // mixed corpus: repeats, overlapping runs ("aaaa"), shared prefixes,
    // tie-heavy short words — the shapes that expose argmax/rewrite drift
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog the fox"),
      (2L, "aaaa aaa aa a abab ababab"),
      (3L, "lower lowest low slow slower glow glowing"),
      (4L, "the the the and and or or or or"),
      (5L, "internationalization interning internal intern"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rounds = 24
    val ref = Bpe.learnMerges(spark, dir, rounds)
    val fast = Bpe.learnMergesSampled(spark, dir, rounds)
    assert(fast == ref, s"sampled-local diverged:\n  ref=$ref\n fast=$fast")
    // run the local learner to exhaustion: every word fully merged means
    // encode(word) == [word] for every corpus word
    val full = Bpe.learnMergesLocal(Bpe.sampledWordCounts(spark, dir))
    val rank = Bpe.rankOf(full)
    Seq("the", "aaaa", "ababab", "internationalization").foreach { w =>
      assert(Bpe.encodeGreedy(w, rank).sameElements(Array(w)), w)
    }
  }

  test("encodeGreedy reproduces learned-order encoding") {
    val merges =
      Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"), ("a", "b"))
    val rank = Bpe.rankOf(merges)
    Seq("lower", "low", "slow", "lowlow", "ablow", "xyz", "", "l")
      .foreach { w =>
        assert(Bpe.encodeGreedy(w, rank)
          .sameElements(Bpe.encodeTokens(w, merges)), w)
      }
  }

  test("learning cost is bounded by the sample, not the corpus") {
    // the only unbounded inputs reach the driver through
    // sampledWordCounts, which caps at VocabWords rows; pin the contract
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe4").toString
    val docs = (0L until 200L).map(i => (i, s"tok$i common common"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val wc = Bpe.sampledWordCounts(spark, dir)
    assert(wc.length <= Bpe.VocabWords)
    // deterministic truncation order: count DESC first
    assert(wc.head._1 == "common" && wc.head._2 == 400L)
  }

  test("check twin invariants hold on awkward whitespace and unicode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe2").toString
    Seq(
      (1L, "  spark spark spark rows  "),   // leading/trailing spaces
      (2L, "a  b"),                          // double space survives detok
      (3L, "café café naïve"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Bpe.bpeApplyCheck(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(1L).getString(1) == md5("spark spark spark rows"))
    assert(rows(2L).getString(1) == md5("a  b"))
    assert(rows(3L).getString(1) == md5("café café naïve"))
    // conservation: token chars == non-space chars of trimmed text
    assert(rows(1L).getLong(2) == "sparksparksparkrows".length)
    assert(rows(2L).getLong(2) == 2L)
    rows.values.foreach(r => assert(r.getBoolean(3), "bounds_ok"))
  }
}
