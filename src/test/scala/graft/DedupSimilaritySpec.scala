package graft

import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopKAgg}
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  test("simhash: near-identical docs are Hamming-close, unrelated far") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w30", "w30x") // one token changed
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sim").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val rows = Dedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(rows(1L), rows(2L)) <= 8)
    assert(hamming(rows(1L), rows(3L)) >= 16)
  }

  test("minhash LSH finds constructed near-dups, skips unrelated docs") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"t$i").mkString(" ")
    val nearDup = base.replace("t40 ", "t40 extra ")
    val other = (200 to 280).map(i => s"u$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("mh").toString
    Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")

    val pairs = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("TopKAgg keeps k best with deterministic ties, bounded buffer") {
    val agg = new TopKAgg(3)
    val items = Seq(ScoredId(5, 1.0), ScoredId(1, 3.0), ScoredId(2, 3.0),
      ScoredId(9, 2.0), ScoredId(4, 0.5), ScoredId(3, 3.0))
    val out = items.foldLeft(agg.zero)(agg.reduce)
    assert(out.size == 3)
    assert(out == Seq(ScoredId(1, 3.0), ScoredId(2, 3.0), ScoredId(3, 3.0)))
    // merge path agrees with reduce path regardless of split point
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == out)
  }

  test("IVF top-k recall vs brute force is usable at sf0.001") {
    val exact = Similarity.topkBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.topkIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed — check cell assignment")
    // and the approximate path must never return MORE than k per query
    assert(approx.groupBy(_._1).values.forall(_.size <= 10))
  }

  test("hyperplane-LSH top-k recall vs brute force is usable at sf0.001") {
    val exact = Similarity.topkBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.topkLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH-ANN recall $recall collapsed")
    assert(approx.groupBy(_._1).values.forall(_.size <= 10))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Similarity.embeddingNearDup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.45)
    }
  }
}
