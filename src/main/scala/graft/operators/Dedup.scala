package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Deduplication operators for a training-data pipeline, each designed
  * for the 100 TB regime:
  *
  *  - exact:   hash-groupBy on the full text (one shuffle, map-side
  *             partial aggregation).
  *  - minhash: shingle → per-seed min-hash signature → banded LSH
  *             bucket-join → exact-Jaccard verification of candidates.
  *             Cost is linear in corpus size + output pairs; the
  *             quadratic all-pairs comparison never materializes.
  *  - ngram:   character-12-gram Jaccard on the same LSH candidate
  *             machinery (different shingling, same scale shape).
  *  - simhash: 64-bit sign-vote fingerprint per document (xxhash64-based,
  *             codegen'd); Hamming-adjacent pairs via multi-probe banding.
  *
  * The oracle states the *semantic spec* (all pairs with J ≥ τ, computed
  * exactly); the Spark side implements the scalable LSH path, whose
  * internals (hash family, banding) therefore never need DuckDB parity.
  * With b=16 bands × r=4 rows, a pair at
  * J=0.9 is missed with probability (1-0.9^4)^16 ≈ 4e-8, while a
  * background pair at J=0.1 becomes a candidate with probability ~1e-4 —
  * steep enough that candidate volume stays linear in the true-duplicate
  * count. (r=2 was measurably wrong here: the fixture's word-salad
  * corpus has background char-gram Jaccard ≈ 0.2, and 1-(1-0.04)^16 ≈
  * 48% of ALL pairs collided somewhere — a quasi-quadratic verify.)
  */
object Dedup {

  /** Exact dedup: canonical doc per distinct text (min doc_id) + copy
    * count. At 100 TB you'd group on md5(text) instead of the raw text to
    * shrink shuffle width — `text_fingerprint` provides that key; here the
    * raw-text groupBy is kept because the oracle compares the text column.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"), length(col("text")).as("n_chars"))

  val exactSql: String =
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
      |       length(text) AS n_chars
      |FROM documents GROUP BY text""".stripMargin

  // ---------------------------------------------------------------- LSH core

  private val NumHashes = 64 // 16 bands × 4 rows
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** doc_id + distinct word-3-shingle array (positions 1-based to match
    * DuckDB list indexing in the oracle).
    */
  private def wordShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), " ").as("words"))
      .where(size(col("words")) >= 3)
      .select(col("doc_id"),
        array_distinct(expr(
          """transform(sequence(1, size(words) - 2),
            |  i -> concat_ws(' ', element_at(words, i),
            |                 element_at(words, i + 1),
            |                 element_at(words, i + 2)))""".stripMargin))
          .as("shingles"))

  /** doc_id + distinct character-12-gram array. 12 chars spans ~2.5
    * words, which is what makes the grams discriminative: 5-grams mostly
    * fall inside single words, so same-vocabulary documents share ~20% of
    * them and LSH cannot separate signal from background.
    */
  private def charShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), trim(col("text")).as("t"))
      .where(length(col("t")) >= 12)
      .select(col("doc_id"),
        array_distinct(expr(
          "transform(sequence(1, length(t) - 11), i -> substring(t, i, 12))"))
          .as("shingles"))

  /** Candidate pairs (doc_a < doc_b) sharing at least one LSH band bucket.
    *
    * Signatures use a Carter-Wegman family over xxhash64: one codegen'd
    * 64-bit hash per shingle, then g_i = h1 + i·h2 for the 64 per-seed
    * minima. This is ~30× cheaper than one cryptographic hash per
    * (seed, shingle) and keeps the signature aggregation on fixed-width
    * longs (map-side partial min, narrow shuffle).
    *
    * Plan shape: explode shingles → hash once → one aggregation producing
    * the 64-wide signature → explode 16 (band, bucket) rows → self-join
    * on (band, bucket) → distinct pairs. The self-join shuffles on the
    * band key; only near-duplicates collide, so bucket cardinality — not
    * corpus size² — bounds the join output.
    */
  private def lshCandidates(shingled: DataFrame): DataFrame = {
    val sigCols: Seq[Column] = (0 until NumHashes).map { i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"sig_$i")
    }
    val sigs = shingled
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"),
        // Mask to 50 bits: h1 + 31·h2 < 2^56, so the Carter-Wegman
        // arithmetic can't overflow under Spark's default ANSI mode.
        xxhash64(col("s")).bitwiseAND(lit((1L << 50) - 1)).as("h1"),
        xxhash64(concat(lit("seed2|"), col("s")))
          .bitwiseAND(lit((1L << 50) - 1)).as("h2"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      val sigsInBand = (0 until RowsPerBand)
        .map(r => col(s"sig_${RowsPerBand * b + r}"))
      // Fold the band's r signature minima into one 64-bit bucket key; a
      // bucket collision only produces a spurious candidate, which the
      // exact-Jaccard verify filters out.
      struct(lit(b).as("band"),
        xxhash64(concat_ws("|", sigsInBand: _*)).as("bucket"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("k"))
      .select(col("doc_id"), col("k.band").as("band"), col("k.bucket").as("bucket"))
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against shingle sets.
    * Candidates are few (near-dups only) → broadcast them into the two
    * shingle-array joins.
    */
  private def verifyJaccard(candidates: DataFrame, shingled: DataFrame,
      threshold: Double): DataFrame = {
    val a = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    broadcast(candidates)
      .join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .where(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash+LSH near-dedup: word-3-shingle Jaccard ≥ 0.8 pairs. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = wordShingles(Tables(spark, dir, "documents")).cache()
    verifyJaccard(lshCandidates(sh), sh, 0.8)
  }

  /** Oracle: the semantic spec — exact all-pairs shingle Jaccard ≥ τ.
    * (Quadratic, but the oracle only ever runs at sf0.01.)
    */
  private def jaccardOracleSql(shingleExpr: String, where: String,
      threshold: Double): String =
    s"""WITH sh AS (
       |  SELECT doc_id, $shingleExpr AS shingles
       |  FROM documents WHERE $where
       |), e AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT p.doc_a, p.doc_b,
       |       round(CAST(p.inter AS DOUBLE) /
       |             (len(sa.shingles) + len(sb.shingles) - p.inter), 6) AS jaccard
       |FROM pairs p
       |JOIN sh sa ON sa.doc_id = p.doc_a
       |JOIN sh sb ON sb.doc_id = p.doc_b
       |WHERE CAST(p.inter AS DOUBLE) /
       |      (len(sa.shingles) + len(sb.shingles) - p.inter) >= $threshold""".stripMargin

  val minhashLshSql: String = jaccardOracleSql(
    """list_distinct([concat_ws(' ', words[i], words[i+1], words[i+2])
      |                for i in range(1, len(words) - 1)])""".stripMargin
      .replace("words", "string_split(trim(text), ' ')"),
    "len(string_split(trim(text), ' ')) >= 3", 0.8)

  /** Character-12-gram Jaccard near-dedup on the same LSH machinery. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = charShingles(Tables(spark, dir, "documents")).cache()
    verifyJaccard(lshCandidates(sh), sh, 0.8)
  }

  val ngramJaccardSql: String = jaccardOracleSql(
    "list_distinct([substr(trim(text), i, 12) for i in range(1, length(trim(text)) - 10)])",
    "length(trim(text)) >= 12", 0.8)

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: per-word xxhash64, sign-vote each bit,
    * plus the Hamming-ball band keys (4×16-bit) used to find candidate
    * pairs at distance ≤ 3 without an all-pairs scan. xxhash64 is Spark's
    * codegen'd 64-bit hash — no DuckDB twin exists, so this op is
    * rows-only checked by the driver and property-tested in the suite.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitVotes: Seq[Column] = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v_$j")
    }
    val sig = (0 until 64).map { j =>
      when(col(s"v_$j") >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce[Column](_.bitwiseOR(_))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .groupBy(col("doc_id"))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
      .select(col("doc_id"), col("simhash"),
        col("simhash").bitwiseAND(lit(0xFFFFL)).as("band0"),
        shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)).as("band1"),
        shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)).as("band2"),
        shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)).as("band3"))
  }

  val ops: Seq[Op] = Seq(
    Op("dedup_exact", exact _, Some(exactSql)),
    Op("dedup_minhash_lsh", minhashLsh _, Some(minhashLshSql)),
    Op("dedup_ngram_jaccard", ngramJaccard _, Some(ngramJaccardSql)),
    Op("dedup_simhash", simhash _, None),
  )
}
