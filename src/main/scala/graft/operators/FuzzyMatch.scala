package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Fuzzy matching / entity resolution: find near-identical records
  * across two sets without an all-pairs scan — the classic
  * blocking-then-confirm shape (Papadakis et al. 2020 survey,
  * arXiv:1905.06167). A training-data pipeline hits this as
  * "resolve near-duplicate titles/URLs/names across crawls" where
  * the variation is single-character (OCR slips, truncation, typo
  * squatting) rather than the paragraph-level drift [[Dedup]]'s
  * MinHash family targets.
  *
  * Query set: a deterministic single-character DELETION of each
  * document's normalized name at position `doc_id % min(16, len) + 1`
  * — SQL-expressible in both engines, so the oracle re-derives the
  * exact same planted perturbation (the [[Pdf]] fixture discipline).
  *
  * Candidate generation is TWO equi-joins — on the 4-char name prefix
  * and on the 4-char suffix. A single deletion leaves at least one of
  * the two intact (position ≤ 4 spares the suffix, position within
  * the tail spares the prefix, anything between spares both), so the
  * planted pair always survives blocking; the join never compares
  * strings across different blocks. Each block is capped at
  * [[FuzzyMatch.BlockCap]] corpus rows by a deterministic
  * `(name, doc_id)` rank — mirrored verbatim in the oracle's QUALIFY
  * — so a hot prefix ("the " at web scale) bounds to cap × queries
  * pairs instead of going quadratic: the [[Dedup]] `LshBucketCap`
  * rule applied to ER blocking. Confirmation is `levenshtein ≤ 2`,
  * an exact integer in both engines.
  */
object FuzzyMatch {

  /** Normalized-name length (chars) — long enough that prefix+suffix
    * blocks are distinct, short enough that levenshtein stays cheap.
    */
  private val NameLen = 24

  /** Max corpus rows admitted per block key (deterministic rank). */
  private[graft] val BlockCap = 64

  /** Confirm threshold: edit distance ≤ 2 keeps the planted deletion
    * (distance 1) plus genuine near-collisions.
    */
  private val MaxDist = 2

  private val normName =
    s"substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, $NameLen)"

  private def named(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          1, NameLen).as("name"))
      .where(length(col("name")) >= 8)

  /** The deletion position expression — the identical text runs in
    * both engines.
    */
  private val delPos =
    s"CAST(doc_id % least(16, length(name)) AS INT)"

  private def queriesOf(named0: DataFrame): DataFrame =
    named0.selectExpr("doc_id AS q_doc_id",
      s"concat(substring(name, 1, $delPos), " +
        s"substring(name, $delPos + 2, $NameLen)) AS q_name")

  private def prefKey(c: String) = s"substring($c, 1, 4)"
  private def sufKey(c: String) = s"substring($c, length($c) - 3, 4)"

  /** Both block keys of one name column as (block_type, key) rows —
    * ONE scan feeds both blocks instead of one subtree per block.
    */
  private def withBlockKeys(df: DataFrame, c: String): DataFrame =
    df.select(col("*"), explode(array(
        struct(lit("p").as("bt"), expr(prefKey(c)).as("bk")),
        struct(lit("s").as("bt"), expr(sufKey(c)).as("bk")))).as("_b"))
      .select(df.columns.map(col) :+ col("_b.bt").as("bt")
        :+ col("_b.bk").as("bk"): _*)

  /** Confirmed pairs (internal: shared by both registered ops). The
    * per-(block type, key) cap is one window over the exploded frame
    * — equivalent to capping each block CTE separately, which is how
    * the oracle spells it.
    */
  /** `named0` must be MATERIALIZED by the caller (localCheckpoint):
    * it feeds both the corpus blocks and the derived query set — uncut,
    * each op ran the normalize-regex corpus scan 2–3 times (r17).
    */
  private def confirmed(named0: DataFrame): DataFrame = {
    val corpus = withBlockKeys(named0, "name")
      .withColumn("_rn", row_number().over(
        Window.partitionBy("bt", "bk").orderBy(col("name"), col("doc_id"))))
      .where(col("_rn") <= BlockCap).drop("_rn")
    // confirm BEFORE the pair dedup: the filter is deterministic per
    // pair, so filter-then-distinct ≡ the oracle's distinct-then-
    // filter, and the distinct exchange carries only survivors keyed
    // by two longs (names are functions of the ids)
    // the THRESHOLDED levenshtein runs the banded O(len × dist) DP and
    // returns -1 over the threshold — same confirmed set and values as
    // the oracle's plain levenshtein ≤ MaxDist, ~5× less DP work
    withBlockKeys(queriesOf(named0), "q_name")
      .join(corpus, Seq("bt", "bk"))
      .withColumn("lev_dist",
        levenshtein(col("q_name"), col("name"), MaxDist).cast("long"))
      .where(col("lev_dist") >= 0)
      .select(col("q_doc_id"), col("doc_id").as("match_doc_id"),
        col("lev_dist"))
      .dropDuplicates("q_doc_id", "match_doc_id")
  }

  /** `fuzzy_match_deletions`: every confirmed (query, corpus) pair,
    * with the SATURATED-block count riding every row — the house
    * visible-shed rule (`graph_jaccard`'s capped-hub audit): once a
    * block holds more than [[BlockCap]] corpus rows the cap sheds
    * candidates and recall thins, and the audit column is how a
    * reader distinguishes "no match exists" from "the block was hot"
    * (measured in SaProbe: 100% fixture recall, 89% at 25k docs over
    * a dense vocabulary, 42% at 250k — at which point a deployment
    * widens the cap or lengthens the block key).
    */
  def matchDeletions(spark: SparkSession, dir: String): DataFrame = {
    val n = named(spark, dir).localCheckpoint()
    val saturated = withBlockKeys(n, "name")
      .groupBy("bt", "bk").count()
      .where(col("count") > BlockCap)
      .agg(count(lit(1)).as("capped_blocks"))
    confirmed(n).crossJoin(saturated) // 1-row audit frame
  }

  private val candSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, $normName AS name
       |  FROM documents
       |  WHERE length($normName) >= 8
       |), q AS (
       |  SELECT doc_id AS q_doc_id,
       |         concat(substr(name, 1, $delPos),
       |                substr(name, $delPos + 2, $NameLen))
       |           AS q_name
       |  FROM n
       |), cp AS (
       |  SELECT doc_id, name, substr(name, 1, 4) AS bk FROM n
       |  QUALIFY row_number() OVER (PARTITION BY bk ORDER BY name, doc_id)
       |          <= $BlockCap
       |), cs AS (
       |  SELECT doc_id, name, substr(name, length(name) - 3, 4) AS bk
       |  FROM n
       |  QUALIFY row_number() OVER (PARTITION BY bk ORDER BY name, doc_id)
       |          <= $BlockCap
       |), cand AS (
       |  SELECT q_doc_id, doc_id, q_name, name
       |  FROM q JOIN cp ON substr(q_name, 1, 4) = cp.bk
       |  UNION
       |  SELECT q_doc_id, doc_id, q_name, name
       |  FROM q JOIN cs ON substr(q_name, length(q_name) - 3, 4) = cs.bk
       |)""".stripMargin

  val matchDeletionsSql: String =
    s"""$candSql,
       |sat AS (
       |  SELECT CAST(count(*) AS BIGINT) AS capped_blocks FROM (
       |    SELECT 'p' AS bt, substr(name, 1, 4) AS bk, count(*) AS c
       |    FROM n GROUP BY 1, 2
       |    UNION ALL
       |    SELECT 's', substr(name, length(name) - 3, 4), count(*)
       |    FROM n GROUP BY 1, 2
       |  ) WHERE c > $BlockCap
       |)
       |SELECT q_doc_id, doc_id AS match_doc_id,
       |       CAST(levenshtein(q_name, name) AS BIGINT) AS lev_dist,
       |       capped_blocks
       |FROM cand, sat
       |WHERE levenshtein(q_name, name) <= $MaxDist""".stripMargin

  /** `fuzzy_match_best`: the RESOLUTION step — each query keeps its
    * single best match by (distance, doc_id). The planted deletion
    * guarantees a distance-1 hit, so this is exact-recall top-1 under
    * the block contract.
    */
  def matchBest(spark: SparkSession, dir: String): DataFrame =
    confirmed(named(spark, dir).localCheckpoint())
      .withColumn("_rn", row_number().over(
        Window.partitionBy("q_doc_id")
          .orderBy(col("lev_dist"), col("match_doc_id"))))
      .where(col("_rn") === 1).drop("_rn")

  val matchBestSql: String =
    s"""$candSql,
       |conf AS (
       |  SELECT q_doc_id, doc_id AS match_doc_id,
       |         CAST(levenshtein(q_name, name) AS BIGINT) AS lev_dist
       |  FROM cand
       |  WHERE levenshtein(q_name, name) <= $MaxDist
       |)
       |SELECT q_doc_id, match_doc_id, lev_dist
       |FROM conf
       |QUALIFY row_number() OVER (PARTITION BY q_doc_id
       |                           ORDER BY lev_dist, match_doc_id) = 1""".stripMargin

  /** `fuzzy_er_clusters`: the MERGE step of entity resolution —
    * confirmed match pairs treated as identity edges and contracted
    * through [[Graph.connectedComponents]] (label = component-minimum
    * doc_id), reported as (cluster, n_docs). Self-matches keep
    * singletons present, so every named document lands in exactly one
    * cluster; transitive chains (a ≈ b ≈ c with a ≉ c) merge, which
    * is the point of the closure.
    */
  def erClusters(spark: SparkSession, dir: String): DataFrame =
    // localCheckpoint: connectedComponents evaluates its input twice
    // (edge checkpoint + node cache) — materializing the confirmed
    // pair frame once keeps the blocked join from running both times
    Graph.connectedComponents(
        confirmed(named(spark, dir).localCheckpoint())
          .select(col("q_doc_id").as("u"),
            col("match_doc_id").as("v")).localCheckpoint())
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_docs"))

  val erClustersSql: String =
    s"""${candSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |conf AS (
       |  SELECT q_doc_id AS u, doc_id AS v FROM cand
       |  WHERE levenshtein(q_name, name) <= $MaxDist
       |),
       |edges AS (SELECT u, v FROM conf UNION SELECT v, u FROM conf),
       |walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |),
       |lab AS (SELECT u, min(x) AS cluster FROM walk GROUP BY u)
       |SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs
       |FROM lab GROUP BY cluster""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("fuzzy_match_deletions", matchDeletions _, Some(matchDeletionsSql)),
    Op("fuzzy_match_best", matchBest _, Some(matchBestSql)),
    Op("fuzzy_er_clusters", erClusters _, Some(erClustersSql)))
}
