package graft

import graft.operators.Retrieval

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
}
