package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PrefixLen

import graft.{Op, Tables}

/** Suffix-array operators — the exact-substring-repetition machinery of
  * a training-data pipeline (the structure behind "deduplicate exact
  * substrings ≥ L tokens", Lee et al. 2022, arXiv:2107.06499; the
  * cross-document span family in [[Dedup]] covers the corpus-wide form
  * with a rare-shingle index — here the per-document form is EXACT).
  *
  * Because every document is bounded to a ≤ `Cap`-char normalized
  * prefix, its whole suffix order is a pure function of one short
  * string already on the row: the per-document operators compute it
  * with the [[org.apache.spark.sql.graft.SuffixRanks]] kernel — one
  * whole-stage-codegen projection, zero exchanges, work that
  * distributes with the scan at any corpus size. (The first build ran
  * Manber–Myers prefix doubling as ⌈log₂ cap⌉ rounds of paired window
  * functions; r17 replaced it — the distributed formulation only earns
  * its exchanges when per-key state exceeds a row, which a capped
  * prefix never does. The cross-document operator below still uses the
  * distributed sharded sort, which IS corpus-sized.) Materializing the
  * suffixes themselves (the naive oracle form) is O(n²) bytes.
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

  /** `spread=true` hash-repartitions by doc_id: a single-file fixture
    * is ONE scan task, and [[repeatCorpus]]'s suffix explode feeds a
    * corpus-wide sharded sort that benefits from parallel input. The
    * per-document kernel ops ([[suffixArray]], [[longestRepeat]]) pass
    * `false` — their plans are pure projections, and the exchange would
    * be their only shuffle (guide §2.4: remove shuffles outright); at
    * 100 TB the scan has real splits either way.
    */
  private def normDocs(spark: SparkSession, dir: String,
      spread: Boolean): DataFrame = {
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), NormSpark, ""), 1, Cap)
          .as("s"))
      .where(length(col("s")) >= 2)
    if (spread)
      base.repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))
    else base
  }

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

  /** `text_suffix_array`: one row per retained suffix — the position
    * and its rank in the document's suffix order.
    *
    * The ranks come from the [[SuffixRanks.rankArray]] kernel — the
    * per-document suffix order is a pure function of the ≤ [[Cap]]-char
    * string already on the row, so the first implementation's
    * Manber–Myers prefix doubling (⌈log₂ Cap⌉ rounds × 2 window sorts
    * each over a doc_id exchange) collapses to one codegen projection
    * with no exchange at all (plans/r17/text_suffix_array_{before,after}
    * .txt; the kernel's order contract is proven against the doubling
    * formulation in SuffixArraySpec and against the oracle's
    * `ORDER BY substr(s, pos)` by the unchanged hash gate).
    */
  def suffixArray(spark: SparkSession, dir: String): DataFrame =
    normDocs(spark, dir, spread = false)
      .select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.SuffixRanks.ranks(col("s")))
          .as(Seq("p0", "sa_rank")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("sa_rank"))

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
  def longestRepeat(spark: SparkSession, dir: String): DataFrame =
    // whole aggregate as one per-row kernel call: the adjacent-pair LCP
    // walk over the document's own suffix order needs neither the
    // doubling windows nor the groupBy (each doc_id is one input row) —
    // scan → project, zero exchanges (guide §2.4)
    normDocs(spark, dir, spread = false)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.SuffixRanks.repeat(col("s"), 8).as("_lr"))
      .select(col("doc_id"),
        col("_lr").getItem(0).as("max_repeat_len"),
        col("_lr").getItem(1).as("n_repeat8_pairs"))

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
    val sfx = normDocs(spark, dir, spread = true)
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
