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
      // a single-file fixture is ONE scan task; hash-spreading by
      // doc_id parallelizes the explode/initial-rank projection AND
      // already satisfies the build windows' partitioning, so the
      // doubling rounds add no further exchange (the Similarity
      // annIngest precedent). At 100 TB the scan has real splits and
      // this is one co-partitioned shuffle of the normalized prefixes.
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))

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

  /** Cross-document repeat key length: LCPs are measured against
    * 32-char suffix KEYS, so a reported repeat saturates at 32 —
    * enough to clear [[MinRepeat]] with margin while keeping the
    * materialized key linear in the corpus (≤ Cap keys × 32 chars
    * per document).
    */
  private[operators] val XKeyLen = 32
  private[operators] val MinRepeat = 16
  private val EmitFloor = 8

  /** `dedup_repeat_corpus`: the CROSS-document form (Lee et al. 2022's
    * repeated-substring signal): order every suffix key of every
    * document's normalized prefix GLOBALLY, take lexicographically
    * adjacent pairs from DIFFERENT documents, and aggregate each
    * document's max shared-span length and its count of ≥
    * [[MinRepeat]]-char adjacencies. Documents sharing a long span
    * are adjacent in suffix order unless a third document carrying
    * the same span sits between them — in which case THAT adjacency
    * reports the span — so every repeated span surfaces on every
    * document that carries it.
    *
    * Scale shape: the global order comes from [[ShardedPrefix]]'s
    * exact sharded row number (range-bin on the order-preserving
    * codepoint proxy, per-shard sort, offsets from the tiny totals
    * frame) — no corpus-sized single-partition window anywhere — and
    * neighbors join on `rn = rn + 1`, a plain equi-join. The LCP is
    * one [[PrefixLen]] byte-walk per adjacent pair.
    */
  def repeatCorpus(spark: SparkSession, dir: String): DataFrame = {
    val sfx = normDocs(spark, dir)
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(1), length(col("s")))).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(s, pos, $XKeyLen)").as("suf"))
    val ranked = ShardedPrefix.cumsum(spark, sfx, Nil, "suf", Nil,
      rnCol = Some("rn"), tiebreaks = Seq(col("doc_id"), col("pos")))
      .select("rn", "doc_id", "suf")
      .localCheckpoint() // feeds both sides of the neighbor join
    val prev = ranked.select((col("rn") + 1).as("rn"),
      col("doc_id").as("pdoc"), col("suf").as("psuf"))
    val x = ranked.join(prev, "rn")
      .where(col("pdoc") =!= col("doc_id"))
      .select(col("doc_id"), col("pdoc"),
        PrefixLen(col("suf"), col("psuf")).as("lcp"))
    x.select(col("doc_id"), col("lcp"))
      .union(x.select(col("pdoc").as("doc_id"), col("lcp")))
      .groupBy("doc_id")
      .agg(max(col("lcp")).as("max_xdoc_repeat"),
        sum(when(col("lcp") >= MinRepeat, 1L).otherwise(0L))
          .as(s"n_adj_repeat$MinRepeat"))
      .where(col("max_xdoc_repeat") >= EmitFloor)
  }

  val repeatCorpusSql: String =
    s"""$normSqlCte,
       |sfx AS (
       |  SELECT doc_id, pos, substr(s, pos, $XKeyLen) AS suf FROM p
       |), o AS (
       |  SELECT doc_id, suf,
       |         lag(doc_id) OVER (ORDER BY suf, doc_id, pos) AS pdoc,
       |         lag(suf) OVER (ORDER BY suf, doc_id, pos) AS psuf
       |  FROM sfx
       |), x AS (
       |  SELECT doc_id, pdoc,
       |         (SELECT coalesce(max(i), 0)
       |          FROM range(1, ${XKeyLen + 1}) g(i)
       |          WHERE i <= least(length(suf), length(psuf))
       |            AND substr(suf, 1, CAST(i AS INT)) =
       |                substr(psuf, 1, CAST(i AS INT))) AS lcp
       |  FROM o WHERE psuf IS NOT NULL AND pdoc <> doc_id
       |), b AS (
       |  SELECT doc_id, lcp FROM x
       |  UNION ALL
       |  SELECT pdoc AS doc_id, lcp FROM x
       |)
       |SELECT doc_id, CAST(max(lcp) AS BIGINT) AS max_xdoc_repeat,
       |       CAST(sum(CASE WHEN lcp >= $MinRepeat THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_adj_repeat$MinRepeat
       |FROM b GROUP BY doc_id HAVING max(lcp) >= $EmitFloor""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("text_suffix_array", suffixArray _, Some(suffixArraySql)),
    Op("text_longest_repeat", longestRepeat _, Some(longestRepeatSql)),
    Op("dedup_repeat_corpus", repeatCorpus _, Some(repeatCorpusSql)))
}
