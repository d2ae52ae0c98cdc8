package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** Blocked fuzzy matching: planted-recall guarantees (a deletion at
  * EVERY position survives at least one of the two blocks), the block
  * cap, and confirm-threshold behavior.
  */
class FuzzyMatchSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fz").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("every deletion position recalls its source at distance 1") {
    // 16 docs over the same 20-char base name: doc_id % 16 sweeps the
    // deletion across positions 1..16 — prefix-breaking (≤ 4),
    // both-blocks (5..16), every one must resolve to itself
    val base = "quick brown foxes run"
    val dir = docsDir((0L until 16L).map(id => id -> s"$base $id"))
    val best = FuzzyMatch.matchBest(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(best.size == 16)
    (0L until 16L).foreach { id =>
      assert(best(id) == (id, 1L), s"doc $id resolved to ${best(id)}")
    }
  }

  test("near-collisions confirm at distance 2; far pairs never appear") {
    val dir = docsDir(Seq(
      1L -> "shared prefix alpha zzz",
      2L -> "shared prefix alphb zzz", // dist 1 from doc 1's name
      3L -> "completely different words here"))
    val pairs = FuzzyMatch.matchDeletions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // each query hits its own source at 1; queries from 1↔2 cross-hit
    // (deletion + substitution = distance 2); doc 3 matches only itself
    assert(pairs.contains((1L, 1L, 1L)) && pairs.contains((2L, 2L, 1L))
      && pairs.contains((3L, 3L, 1L)))
    assert(pairs.contains((1L, 2L, 2L)) && pairs.contains((2L, 1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L && p._2 != 3L))
    assert(!pairs.exists(p => p._1 != 3L && p._2 == 3L))
  }

  test("block cap bounds a hot prefix deterministically") {
    // 80 docs share the 4-char prefix block "hotb"; the corpus side of
    // that block must admit exactly BlockCap rows, ranked by
    // (name, doc_id) — so low-sorting names stay, high ones drop
    val dir = docsDir((1L to 80L).map(id =>
      id -> f"hotblock key number $id%03d"))
    val pairs = FuzzyMatch.matchDeletions(spark, dir)
    // per-query candidates ≤ 2 blocks × cap; the self-match survives
    // for every query whose name ranks within the cap in EITHER block
    val perQuery = pairs.groupBy("q_doc_id").count().collect()
    assert(perQuery.forall(_.getLong(1) <= 2L * FuzzyMatch.BlockCap))
    // the saturated prefix block is VISIBLE: capped_blocks audit = 1
    assert(pairs.select("capped_blocks").head().getLong(0) == 1L)
    // names sort by the zero-padded id, so ids 1..64 rank inside the
    // prefix-block cap; the suffix block (distinct last-4 keys) keeps
    // everyone — planted recall survives the hot block via the OTHER
    // block, exactly the two-block design claim
    val best = FuzzyMatch.matchBest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best.size == 80)
    assert((1L to 80L).forall(id => best(id) == id))
  }

  test("er clusters: cross-matched docs merge, unrelated stay singleton") {
    val dir = docsDir(Seq(
      1L -> "shared prefix alpha zzz",
      2L -> "shared prefix alphb zzz",
      3L -> "completely different words here"))
    val got = FuzzyMatch.erClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 2 cross-hit at distance 2 -> one cluster labeled by
    // the min id; doc 3 self-matches only -> singleton
    assert(got == Map(1L -> 2L, 3L -> 1L), s"got $got")
  }

  test("short names drop; punctuation and case normalize away") {
    val dir = docsDir(Seq(1L -> "ab", 2L -> "QUICK-brown?! Foxes run"))
    val best = FuzzyMatch.matchBest(spark, dir).collect()
    assert(best.length == 1 && best.head.getLong(0) == 2L)
  }
}
