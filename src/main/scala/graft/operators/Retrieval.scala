package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Lexical retrieval (north-star extension): the BM25 inverted-index
  * scoring path a training-data pipeline uses for decontamination
  * lookups, more-like-this mining, and retrieval-based quality
  * filtering at corpus scale.
  *
  * The shape is the production one — posting lists, not brute force:
  * the corpus is reduced ONCE to (doc, term, tf) postings with
  * map-side combine; the (tiny, bounded) query term set broadcasts
  * against the postings so only matching-term postings survive the
  * scan; document frequency is computed on the pruned postings
  * (pruning is by TERM only, so per-term df over the pruned frame
  * equals global df — every posting of a surviving term survives).
  * Nothing corpus-sized crosses the shuffle except the one
  * map-side-combined groupBy building the postings themselves; at
  * 100 TB that is the same one-pass inverted-index build every search
  * engine's indexer runs, and the per-query cost is bounded by the
  * postings of its terms, not the corpus.
  *
  * Determinism contract (the house float discipline): tf, df, dl are
  * integers; avgdl enters as the exact rational dl·N/Σdl; the single
  * transcendental (the BM25 idf's ln) is computed once per (term,
  * query) and immediately quantized to BIGINT micro-units with an
  * explicit floor(x·1e6 + 0.5) — both engines evaluate the SAME
  * expression tree left-to-right, so every double is bit-identical
  * up to the documented 1-ulp libm seam, and the SUM that crosses the
  * shuffle is an order-free integer sum, never a float accumulation.
  * Ranking orders on (score_micro DESC, doc_id ASC) — integer keys
  * only.
  */
object Retrieval {

  /** Queries = the first QueryDocs documents; a query's terms are the
    * DISTINCT tokens of its first QueryPrefix whitespace tokens
    * (classic more-like-this: the document's own head as the query).
    */
  private val QueryDocs = 5
  private val QueryPrefix = 12
  private val TopK = 10
  // Okapi defaults; written as literals in BOTH expression trees.
  private val K1 = "1.2"
  private val B75 = "0.75"

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))

  /** The postings build: (doc_id, term, tf, dl) in ONE explode +
    * map-side combine. Postings are PER-DOCUMENT — a new batch's
    * postings compute from the batch alone, which is what makes the
    * incremental index below exactly equal to a rebuild.
    */
  /** Tokenize + postings off a raw (doc_id, text) frame — the entry
    * the streaming ingest shares with the batch paths. */
  private[graft] def postingsFromText(docs: DataFrame): DataFrame =
    buildPostings(docs.select(col("doc_id"),
      split(trim(col("text")), " ").as("w")))

  private def buildPostings(d: DataFrame): DataFrame =
    d.select(col("doc_id"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Score + rank against a postings frame. Corpus stats (N, Σdl)
    * derive from the postings themselves (every document contributes
    * ≥ 1 posting row, so the distinct-doc frame IS the corpus), which
    * lets the served/incremental variants share this body verbatim.
    *
    * INVARIANT the oracle equality rests on: the oracle derives
    * N/Σdl from `documents` directly, which equals the postings-
    * derived stats ONLY because `split(trim(text), " ")` yields ≥ 1
    * token for EVERY document — including empty text, where both
    * engines produce the single empty-string token (dl = 1). A future
    * tokenizer that can emit zero tokens would silently break this
    * equality; RetrievalSpec pins the empty-text case.
    */
  private[graft] def bm25Rank(spark: SparkSession, dir: String,
      postings: DataFrame): DataFrame = {
    val d = docs(spark, dir)
    // query terms: distinct head tokens of the first QueryDocs docs
    val qterms = d.where(col("doc_id") < QueryDocs)
      .select(col("doc_id").as("query_id"),
        explode(slice(col("w"), 1, QueryPrefix)).as("term"))
      .distinct()
    val termset = qterms.select(col("term")).distinct()
    // prune postings to query terms BEFORE any further shuffle; df on
    // the pruned frame is exact (pruning is by term only)
    val p = postings.join(broadcast(termset), Seq("term"))
    val df = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scalars = postings
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).cast("double").as("sum_dl"))
    // per-(query, term, doc) contribution, quantized to micro-units at
    // the leaf so the cross-shuffle SUM is pure integer
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfp = (col("tf").cast("double") * expr(s"($K1 + 1.0)")) /
      (col("tf").cast("double") + expr(K1) *
        (expr(s"(1.0 - $B75)") + expr(B75) *
          ((col("dl").cast("double") * col("n_docs")) / col("sum_dl"))))
    val contrib = p
      .join(broadcast(qterms), Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(scalars))
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfp * lit(1000000.0) + lit(0.5)).as("c_micro"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms"), col("score_micro"))
  }

  /** BM25 top-k retrieval over the documents table. Output: one row
    * per (query_id, rank) with the retrieved doc, its matched-term
    * count and integer micro-unit score.
    *
    * Offline/online split (the `servedDomainRank` shape): the postings
    * index builds ONCE per corpus version into the content-addressed
    * snapshot store — the one-pass map-side-combined inverted-index
    * build every indexer runs — and the registered query path serves
    * the persisted snapshot, paying only the (pruned) postings scan.
    * A stale or lossy snapshot reds CORRECTNESS: the oracle rebuilds
    * from `documents` every run.
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/documents.parquet", "graft_bm25_postings_full")
    if (!store.hasTableSnapshot("bm25_postings_full", ts))
      store.writeTableSnapshot(
        buildPostings(docs(spark, dir)), "bm25_postings_full", ts)
    bm25Rank(spark, dir,
      store.readTableSnapshot(spark, "bm25_postings_full", ts)
        .select(col("doc_id"), col("term"), col("tf"), col("dl")))
  }

  /** Incremental BM25: the inverted index maintained under corpus
    * growth WITHOUT rebuild. Postings are per-document and corpus
    * stats recompute from the postings frame, so appending a batch's
    * postings to the persisted history yields EXACTLY the index a
    * full rebuild would produce — insert ≡ rebuild is an identity
    * here, not a recall floor (contrast the ANN family, where frozen
    * geometry makes it approximate). History (doc_id % 10 != 9)
    * round-trips through the content-addressed snapshot store once
    * per corpus version; the batch (doc_id % 10 == 9) tokenizes and
    * appends; serving reads store ∪ batch. The oracle is the SAME SQL
    * as `text_bm25_topk` over the full corpus — a lossy append, a
    * stale snapshot, or drifted stats red CORRECTNESS by hash.
    */
  def bm25Incremental(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/documents.parquet", "graft_bm25_postings")
    if (!store.hasTableSnapshot("bm25_postings", ts))
      store.writeTableSnapshot(
        buildPostings(d.where(col("doc_id") % 10 =!= 9)), "bm25_postings", ts)
    val hist = store.readTableSnapshot(spark, "bm25_postings", ts)
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val batch = buildPostings(d.where(col("doc_id") % 10 === 9))
    // eager checkpoint: bm25Rank consumes postings TWICE (corpus
    // scalars + the pruned query join); without it the batch half
    // re-tokenizes per consumer. The served bm25TopK path needs no
    // checkpoint — its postings are already a parquet snapshot scan.
    bm25Rank(spark, dir, hist.unionByName(batch).localCheckpoint())
  }

  val bm25TopKSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
       |), postings AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       |         CAST(max(dl) AS BIGINT) AS dl
       |  FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d)
       |  GROUP BY doc_id, term
       |), qterms AS (
       |  SELECT DISTINCT doc_id AS query_id, unnest(w[1:$QueryPrefix]) AS term
       |  FROM d WHERE doc_id < $QueryDocs
       |), p AS (
       |  SELECT * FROM postings
       |  WHERE term IN (SELECT DISTINCT term FROM qterms)
       |), dfr AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term
       |), scalars AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         CAST(sum(len(w)) AS DOUBLE) AS sum_dl
       |  FROM d
       |), contrib AS (
       |  SELECT q.query_id, p.doc_id,
       |         CAST(floor(
       |           ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
       |                    / (CAST(df AS DOUBLE) + 0.5))
       |           * ((CAST(tf AS DOUBLE) * ($K1 + 1.0))
       |              / (CAST(tf AS DOUBLE) + $K1
       |                 * ((1.0 - $B75) + $B75
       |                    * ((CAST(dl AS DOUBLE) * n_docs) / sum_dl))))
       |           * 1000000.0 + 0.5) AS BIGINT) AS c_micro
       |  FROM p JOIN qterms q USING (term)
       |       JOIN dfr USING (term), scalars
       |  WHERE p.doc_id != q.query_id
       |), scored AS (
       |  SELECT query_id, doc_id,
       |         CAST(sum(c_micro) AS BIGINT) AS score_micro,
       |         CAST(count(*) AS BIGINT) AS n_terms
       |  FROM contrib GROUP BY query_id, doc_id
       |)
       |SELECT query_id, rank, doc_id, n_terms, score_micro
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rank
       |      FROM scored)
       |WHERE rank <= $TopK""".stripMargin

  // --------------------------------------------------- hybrid retrieval

  private val RrfK0 = 60L // the standard RRF dampening constant

  /** Reciprocal-rank fusion of the LEXICAL (BM25 over the served
    * postings snapshot) and DENSE (served-IVF ANN) retrievers — the
    * standard hybrid-retrieval combiner an LLM data pipeline runs for
    * decontamination and more-like-this mining, where lexical recall
    * (exact rare terms) and dense recall (paraphrase) fail on disjoint
    * queries. The fixture's `embeddings` are the dense view of
    * `documents` (shared 0-based id space), so candidates fuse on id.
    * RRF score = Σ_retrievers ⌊10⁶ / (k₀ + rank)⌋ in exact INTEGER
    * micro-units (floor division — no float sum anywhere), k₀ = 60
    * per the original Cormack–Clarke–Büttcher formulation; ties break
    * on candidate id. `n_sources` marks cross-retriever agreement.
    *
    * Scale shape: both inputs are served-index top-k frames (bounded:
    * queries × K rows), so the fusion is a reduce over ≤ 2·|Q|·K rows
    * regardless of corpus size; the rank window is per-query over ≤ 2K
    * candidates. Fully oracled DYNAMICALLY: the oracle composes the
    * BM25 SQL with the literal-centroid IVF oracle and replays the
    * same integer fusion (`SparkEntry.dynamicOracleSql`).
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val lex = bm25TopK(spark, dir)
      .select(col("query_id"), col("doc_id").as("cand_id"),
        expr(s"CAST(1000000 DIV ($RrfK0 + rank) AS BIGINT)")
          .as("contrib_micro"))
    val dense = Similarity.topkIvf(spark, dir)
      .where(col("query_id") < QueryDocs)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        expr(s"CAST(1000000 DIV ($RrfK0 + rank) AS BIGINT)")
          .as("contrib_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("cand_id").asc)
    lex.unionByName(dense)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("contrib_micro")).as("rrf_micro"),
        count(lit(1)).as("n_sources"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("cand_id"),
        col("n_sources"), col("rrf_micro"))
  }

  /** Dynamic full oracle for [[rrfFusion]]: the BM25 oracle SQL and
    * the literal-centroid IVF serve oracle as CTEs, fused with the
    * same integer floor-division arithmetic.
    */
  def rrfFusionOracle(spark: SparkSession, dir: String): String = {
    val denseSql = Similarity.ivfTopkOracle(spark, dir)
    s"""WITH lex AS (
       |$bm25TopKSql
       |), dense AS (
       |$denseSql
       |), c AS (
       |  SELECT query_id, doc_id AS cand_id,
       |         CAST(1000000 // ($RrfK0 + rank) AS BIGINT) AS contrib_micro
       |  FROM lex
       |  UNION ALL
       |  SELECT query_id, neighbor_id AS cand_id,
       |         CAST(1000000 // ($RrfK0 + rank) AS BIGINT) AS contrib_micro
       |  FROM dense WHERE query_id < $QueryDocs
       |), f AS (
       |  SELECT query_id, cand_id,
       |         CAST(sum(contrib_micro) AS BIGINT) AS rrf_micro,
       |         CAST(count(*) AS BIGINT) AS n_sources
       |  FROM c GROUP BY 1, 2
       |)
       |SELECT query_id, rank, cand_id, n_sources, rrf_micro
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY rrf_micro DESC, cand_id ASC) AS BIGINT) AS rank
       |      FROM f)
       |WHERE rank <= $TopK""".stripMargin
  }

  /** `text_phrase_search`: exact phrase matching by POSITIONAL-posting
    * intersection — the inverted-index primitive BM25's bag-of-words
    * scoring cannot express. Each phrase word joins the postings on
    * the word itself (phrase terms BROADCAST, so the corpus-sized
    * posting frame never shuffles for the probe), aligned starts are
    * grouped, and a start matching ALL phrase positions is a hit:
    * `(doc, pos − idx)` groups with a full distinct-idx count. The
    * phrase set is GENUINELY bounded (one 3-word phrase per 97th
    * document, sources capped below doc_id 97·64 — ≤ 64 phrases at
    * any corpus size), so the broadcast stays fixed-size and the
    * shuffle candidate-sized; a corpus-proportional phrase set would
    * be a query-log join — same plan, shuffled instead of broadcast.
    *
    * The oracle proves the position arithmetic: contiguous-position
    * intersection ≡ substring containment of the space-joined
    * normalized words with boundary spaces — two entirely different
    * formulations, one hash.
    */
  private val PhraseLen = 3

  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val words = filter(
      split(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " "),
      w => w =!= "")
    val docs = Tables(spark, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), words.as("ws"))
    val phrases = docs
      .where(col("doc_id") % 97 === 0 && col("doc_id") < 97L * 64 &&
        size(col("ws")) >= 4)
      .select(col("doc_id").as("phrase_src"),
        posexplode(slice(col("ws"), 2, PhraseLen)).as(Seq("idx", "w")))
    val postings = docs
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
    postings.join(broadcast(phrases), "w")
      .select(col("phrase_src"), col("doc_id"),
        (col("pos") - col("idx")).as("start"), col("idx"))
      .groupBy("phrase_src", "doc_id", "start")
      // count(*) ≡ count(DISTINCT idx) here: postings are unique by
      // (doc_id, pos) and phrase terms by (phrase_src, idx), and pos =
      // start + idx pins pos per idx within a group — so no (doc,
      // start, idx) row can repeat. Dropping the distinct removes the
      // two-level distinct aggregation (one exchange + expand) from the
      // candidate reduction (r17, guide §2.3 map-side aggregation).
      .agg(count(lit(1)).as("_k"))
      .where(col("_k") === PhraseLen)
      .groupBy("phrase_src", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .select(col("phrase_src"), col("doc_id").as("match_doc_id"),
        col("n_hits"))
  }

  val phraseSearchSql: String =
    s"""WITH nw AS (
       |  SELECT doc_id,
       |         [x for x in string_split(
       |            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' ')
       |          if x <> ''] AS ws
       |  FROM documents WHERE text IS NOT NULL
       |), ph AS (
       |  SELECT doc_id AS phrase_src,
       |         array_to_string(ws[2:${1 + PhraseLen}], ' ') AS phrase
       |  FROM nw WHERE doc_id % 97 = 0 AND doc_id < ${97 * 64}
       |    AND len(ws) >= 4
       |), hits AS (
       |  -- exact positional count (overlaps and shared boundaries
       |  -- included), mirroring the postings grouping
       |  SELECT ph.phrase_src, nw.doc_id AS match_doc_id,
       |         len([i for i in range(1, len(nw.ws) - ${PhraseLen - 2})
       |              if array_to_string(nw.ws[i:i+${PhraseLen - 1}], ' ')
       |                 = ph.phrase]) AS n_hits
       |  FROM ph, nw
       |)
       |SELECT phrase_src, match_doc_id, CAST(n_hits AS BIGINT) AS n_hits
       |FROM hits WHERE n_hits > 0""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("text_phrase_search", phraseSearch _, Some(phraseSearchSql)),
    Op("text_bm25_topk", bm25TopK _, Some(bm25TopKSql)),
    // same oracle: the incremental index must EQUAL a rebuild by hash
    Op("text_bm25_incremental", bm25Incremental _, Some(bm25TopKSql)),
    // oracled dynamically (literal served-IVF geometry) via SparkEntry
    Op("text_rrf_fusion", rrfFusion _, None))
}
