package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PrefixLen

import graft.{Op, Tables}

/** Suffix-array operators — the exact-substring-repetition machinery of
  * a training-data pipeline (the structure behind "deduplicate exact
  * substrings ≥ L tokens", Lee et al. 2022, arXiv:2107.06499; the
  * cross-document span family in [[Dedup]] covers the corpus-wide form
  * with a rare-shingle index — here the per-document form is EXACT).
  *
  * The suffix array is built by prefix doubling (Manber–Myers 1990):
  * start from single-character ranks, then in round k replace each
  * suffix's rank with the dense rank of the pair (rank[pos],
  * rank[pos+k]) — after ⌈log₂ cap⌉ rounds the ranks order complete
  * suffixes. In Spark terms each round is two window functions over
  * the SAME `doc_id` hash partitioning (`lead(rank, k)` needs ORDER BY
  * pos, the re-rank needs ORDER BY (rank, rank_k)), so the whole build
  * is ONE exchange followed by per-round in-partition sorts — no
  * joins, no substring materialization, and per-document work that
  * distributes evenly across a 100 TB corpus. The O(n log n) plan
  * shape is what survives scale-up; materializing the suffixes
  * themselves (the naive oracle form) is O(n²) bytes.
  *
  * Documents are normalized to a lowercase `[a-z0-9 ]` alphabet and
  * CAPPED at [[SuffixArray.Cap]] leading characters — the contract
  * that keeps the emitted relation linear in the corpus (cap × docs
  * rows) and lets the DuckDB oracle afford the naive
  * sort-the-substrings formulation at fixture scale.
  */
object SuffixArray {

  /** Normalized-prefix cap (characters). Folded into the op contract:
    * both engines cut the SAME prefix, so results are hash-comparable.
    */
  private[operators] val Cap = 64

  private val NormSpark = "[^a-z0-9 ]"

  private def normDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), NormSpark, ""), 1, Cap)
          .as("s"))
      .where(length(col("s")) >= 2)

  private val normSqlCte: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
       |                1, $Cap) AS s
       |  FROM documents
       |  WHERE length(substr(regexp_replace(lower(text), '[^a-z0-9 ]', '',
       |                                     'g'), 1, $Cap)) >= 2
       |), p AS (
       |  SELECT doc_id, s, CAST(unnest(range(1, length(s) + 1)) AS INT)
       |           AS pos
       |  FROM t
       |)""".stripMargin

  /** Prefix-doubling core: (doc_id, s, pos, rank) where `rank` is the
    * 1-based dense suffix rank within the document. Suffixes at
    * distinct positions have distinct lengths, so ranks are total.
    */
  private[operators] def suffixRanks(spark: SparkSession,
      dir: String): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    var df = normDocs(spark, dir)
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(1), length(col("s")))).as("pos"))
      .withColumn("rank", ascii(expr("substring(s, pos, 1)")).cast("long"))
    var k = 1
    while (k < Cap) {
      // rank of the suffix k positions later; 0 = past the end, which
      // sorts FIRST (a shorter suffix is a strict prefix of the longer
      // one, so it compares smaller)
      df = df
        .withColumn("rank_k",
          coalesce(lead(col("rank"), k).over(byPos), lit(0L)))
        .withColumn("rank",
          dense_rank().over(
            Window.partitionBy("doc_id").orderBy(col("rank"), col("rank_k")))
            .cast("long"))
        .drop("rank_k")
      k *= 2
    }
    df
  }

  /** `text_suffix_array`: one row per retained suffix — the position
    * and its rank in the document's suffix order.
    */
  def suffixArray(spark: SparkSession, dir: String): DataFrame =
    suffixRanks(spark, dir)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("rank").as("sa_rank"))

  val suffixArraySql: String =
    s"""$normSqlCte
       |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |       CAST(row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY substr(s, pos))
       |            AS BIGINT) AS sa_rank
       |FROM p""".stripMargin

  /** `text_longest_repeat`: per document, the longest substring that
    * occurs at least twice (= the max LCP over lexicographically
    * ADJACENT suffix pairs — non-adjacent pairs never beat an adjacent
    * one) plus the count of adjacent pairs sharing ≥ 8 characters (a
    * density signal for boilerplate-heavy documents). The LCP kernel
    * is the native [[PrefixLen]] expression — one byte-walk per
    * adjacent pair instead of the oracle's O(cap²) substring probe.
    */
  def longestRepeat(spark: SparkSession, dir: String): DataFrame = {
    val byRank = Window.partitionBy("doc_id").orderBy("rank")
    suffixRanks(spark, dir)
      .withColumn("prev_pos", lag(col("pos"), 1).over(byRank))
      .where(col("prev_pos").isNotNull)
      .withColumn("lcp", PrefixLen(
        expr(s"substring(s, pos, $Cap)"),
        expr(s"substring(s, prev_pos, $Cap)")))
      .groupBy("doc_id")
      .agg(max(col("lcp")).as("max_repeat_len"),
        sum(when(col("lcp") >= 8, 1L).otherwise(0L)).as("n_repeat8_pairs"))
  }

  val longestRepeatSql: String =
    s"""$normSqlCte,
       |r AS (
       |  SELECT doc_id, substr(s, pos) AS suf FROM p
       |), o AS (
       |  SELECT doc_id, suf,
       |         lag(suf) OVER (PARTITION BY doc_id ORDER BY suf) AS psuf
       |  FROM r
       |), l AS (
       |  SELECT doc_id,
       |         (SELECT coalesce(max(i), 0)
       |          FROM range(1, ${Cap + 1}) g(i)
       |          WHERE i <= least(length(suf), length(psuf))
       |            AND substr(suf, 1, CAST(i AS INT)) =
       |                substr(psuf, 1, CAST(i AS INT))) AS lcp
       |  FROM o WHERE psuf IS NOT NULL
       |)
       |SELECT doc_id, CAST(max(lcp) AS BIGINT) AS max_repeat_len,
       |       CAST(sum(CASE WHEN lcp >= 8 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_repeat8_pairs
       |FROM l GROUP BY doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("text_suffix_array", suffixArray _, Some(suffixArraySql)),
    Op("text_longest_repeat", longestRepeat _, Some(longestRepeatSql)))
}
