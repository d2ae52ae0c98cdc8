package graft

import graft.operators.Retrieval

/** Positional phrase search: planted contiguity, overlap, and
  * boundary cases — the distinctions a bag-of-words or
  * non-overlapping-substring count would get wrong.
  */
class PhraseSearchSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phr").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("contiguity required; overlapping and adjacent hits all count") {
    // phrase source: doc 0 (0 % 97 == 0) → words 2..4 = "b c b"
    val dir = docsDir(Seq(
      0L -> "a b c b x y z",
      1L -> "q b c b r",          // one hit
      2L -> "b c b c b",          // OVERLAPPING: starts 1 and 3
      3L -> "b c b b c b",        // adjacent (shared boundary): 2 hits
      4L -> "b x c y b",          // all words present, NOT contiguous
      5L -> "c b b",              // wrong order
      6L -> "b c"))               // too short
    val got = Retrieval.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (0L, 3L) -> 2L),
      s"got $got")
  }

  test("multiple phrase sources; no phrase from short docs") {
    val dir = docsDir(Seq(
      0L -> "p q r s t",          // phrase "q r s"
      97L -> "u v w",             // only 3 words → no phrase
      194L -> "m q r s n",        // phrase "q r s" (same as doc 0's)
      5L -> "z q r s z"))
    val got = Retrieval.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // both sources match docs 0, 194, and 5; doc 97 contributes nothing
    val expect = for {
      src <- Set(0L, 194L); m <- Set(0L, 194L, 5L)
    } yield (src, m)
    assert(got == expect, s"got $got")
  }
}
