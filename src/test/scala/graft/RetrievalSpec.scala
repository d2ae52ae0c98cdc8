package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions.col

class RetrievalSpec extends SparkSpec {

  test("bm25: multi-term short doc outranks high-tf long doc; misses absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    Seq(
      (0L, "apple banana"),                          // the query doc
      (5L, "apple apple apple pad pad pad pad pad"), // high tf, long, 1 term
      (6L, "apple banana"),                          // both terms, short
      (7L, "cherry cherry"))                         // no query term
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 2) // doc 7 never surfaces, self excluded
    val (r1doc, r1terms, r1score) = rows((0L, 1L))
    val (r2doc, r2terms, r2score) = rows((0L, 2L))
    assert(r1doc == 6L && r1terms == 2L) // matches apple AND banana
    assert(r2doc == 5L && r2terms == 1L)
    assert(r1score > r2score && r2score > 0L)
  }

  test("mmr: second pick skips the exact duplicate of the first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    // q=0; a(11) and its exact dup a2(12) at rel .9; b(13) equally
    // relevant but diverse (sim to a ≈ .81) — plain ranking would take
    // the dup second, MMR must take b
    Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (11L, Array(0.9f, 0.436f, 0f), 0),
      (12L, Array(0.9f, 0.436f, 0f), 0),
      (13L, Array(0.9f, 0f, 0.436f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val picks = graft.operators.Similarity.mmrDiversify(spark, dir)
      .where(col("query_id") === 0L).orderBy("pick").collect()
      .map(r => r.getLong(2))
    assert(picks.toSeq == Seq(11L, 13L, 12L))
  }

  test("bm25: identical docs tie exactly and break on doc_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25t").toString
    Seq(
      (0L, "apple pie"),
      (8L, "apple pie crust"),
      (9L, "apple pie crust"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4))).toMap
    assert(rows(1L)._1 == 8L && rows(2L)._1 == 9L) // integer tiebreak
    assert(rows(1L)._2 == rows(2L)._2)             // bit-exact equal scores
  }

  test("plan shapes: bm25 broadcasts the query side, no cartesian") {
    val df = Retrieval.bm25TopK(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"cartesian in bm25:\n$plan")
    // term-set prune, per-query terms, df, and the scalar frame all ride
    // broadcasts; only the posting build and the final agg shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"expected broadcast joins on the bounded sides:\n$plan")
  }

  test("incremental bm25: store-extended postings equal a rebuild exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25inc").toString
    // ids straddle the %10==9 batch split; doc 9/19 arrive as the batch
    Seq(
      (0L, "apple banana"),
      (6L, "apple banana pie"),
      (9L, "apple apple crust"),
      (19L, "banana crust pad"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).sortBy(_.toString).toList
    assert(canon(Retrieval.bm25Incremental(spark, dir)) ==
      canon(Retrieval.bm25TopK(spark, dir)))
    // second call serves the persisted snapshot (warm path), same rows
    assert(canon(Retrieval.bm25Incremental(spark, dir)) ==
      canon(Retrieval.bm25TopK(spark, dir)))
  }

  test("rrf fusion: integer fusion matches the definition over both rankers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rrf").toString
    val words = Seq("apple", "banana", "cherry", "durian", "elder", "fig")
    (0L until 20L).map(i => (i,
      (0 to 3).map(j => words(((i + j) % 6).toInt)).mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    (0L until 20L).map(i => (i, Array.tabulate(64)(d =>
      math.sin(d * 0.7 + i * 1.9).toFloat * 2f).toSeq))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val lex = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val dense = graft.operators.Similarity.topkIvf(spark, dir).collect()
      .filter(_.getLong(0) < 5L)
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // recompute the fusion from the two rankers' own outputs
    val expected = (lex.keySet ++ dense.keySet).map { k =>
      val c = lex.get(k).map(rk => 1000000L / (60L + rk)).getOrElse(0L) +
        dense.get(k).map(rk => 1000000L / (60L + rk)).getOrElse(0L)
      val n = lex.contains(k).compare(false) + dense.contains(k).compare(false)
      k -> (c, n.toLong)
    }.toMap
    val got = Retrieval.rrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (k, (_, n, micro)) =>
      assert(expected(k) == ((micro, n)), s"$k: ${expected(k)} vs ($micro, $n)")
    }
    // ranks are dense 1..min(10, |candidates|) per query
    val byQ = got.groupBy(_._1._1)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_._2._1).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the fused top must respect the fusion score order
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2._1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2._3 >= b._2._3)
        case _ => ()
      }
    }
  }

  test("bm25 invariant: every doc yields >= 1 posting, even empty text") {
    import spark.implicits._
    // the oracle derives N/sum(dl) from `documents` while the engine
    // derives them from the postings frame — equal ONLY while the
    // tokenizer emits >= 1 token per doc. Pin the edge: empty and
    // whitespace-only text both produce the single empty-string token.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "apple"))
      .toDF("doc_id", "text")
    val p = Retrieval.postingsFromText(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getAs[Number](3).longValue))
      .toMap
    assert(p.size == 3) // one posting per doc — no doc drops out
    assert(p(1L) == (("", 1L, 1L)))
    assert(p(2L) == (("", 1L, 1L)))
    assert(p(3L) == (("apple", 1L, 1L)))
  }
}
