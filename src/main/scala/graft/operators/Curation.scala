package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Corpus-curation operators — the steps between "deduplicated documents"
  * and "training batches" in a large-scale data pipeline (north-star
  * extensions; no counterpart in the reference's 381-line surface):
  *
  *  - `pack`:          greedy sequence packing into fixed token budgets,
  *                     sharded so packing parallelizes;
  *  - `contamination`: n-gram overlap against a benchmark set — the
  *                     standard eval-decontamination join;
  *  - `qualityGate`:   percentile-threshold filtering (keep the top
  *                     quintile by a quality signal);
  *  - `balancedSample`: per-class downsampling to the smallest class,
  *                     deterministic via hash order.
  *
  * Each is exactly SQL-expressible, so all four are fully oracled.
  */
object Curation {

  // ------------------------------------------------------------- packing
  /** Tokens per training sequence. Small enough that the fixture's short
    * documents produce multi-doc packs. */
  private val PackBudget = 512
  /** Writer-task shards. Packing needs a running sum, which is inherently
    * sequential — so it is SHARDED: each shard packs independently under
    * a per-shard window (the way distributed packing actually runs: one
    * writer task per shard, each emitting its own bin sequence). The
    * cumulative-sum window parallelizes across shards and no global
    * single-partition window ever exists; at 100 TB shard count scales
    * with writers and the plan shape is unchanged.
    */
  private val PackShards = 8

  /** Pack documents into ≤-budget training bins, greedy in doc_id order
    * within each shard: a document starts in the bin its running prefix
    * ends in (`(cum − tokens) div budget`) — bins can overflow by one
    * document (standard greedy packing; oversized documents get bins of
    * their own). Output is pack-level: docs per pack, token fill, and
    * the fill ratio the trainer cares about.
    */
  def pack(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - tokens) div $PackBudget"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .withColumn("fill_ratio",
        round(col("pack_tokens").cast("double") / PackBudget, 6))
  }

  val packSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, tokens,
       |         CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t
       |)
       |SELECT shard, (cum - tokens) // $PackBudget AS pack_id,
       |       count(*) AS n_docs,
       |       CAST(sum(tokens) AS BIGINT) AS pack_tokens,
       |       min(doc_id) AS first_doc,
       |       round(CAST(sum(tokens) AS DOUBLE) / $PackBudget, 6) AS fill_ratio
       |FROM c GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- contamination check
  /** Shared-n-gram threshold: ≥ 2 distinct shared 8-grams flags a pair
    * (one shared 8-gram happens by phrase coincidence; two is the
    * standard dirty signal at this gram size). */
  private val GramWords = 8
  private val BenchDocs = 20 // doc_id < 20 stands in for the benchmark set
  private val MinShared = 2

  /** Benchmark contamination: for every corpus document, the benchmark
    * documents it shares ≥ MinShared distinct 8-grams with. Both sides
    * reduce to DISTINCT n-gram keys before the pair join (a document's
    * repeated phrase counts once), the join key is the md5 of the gram —
    * 16-byte keys shuffle, never text — and the benchmark side is tiny
    * by construction, so Spark broadcasts it.
    *
    * The load-bearing scale move is the SEMI-JOIN REDUCTION: corpus
    * grams are pre-filtered map-side against the broadcast benchmark
    * gram set BEFORE their distinct, so the only corpus rows that ever
    * reach an exchange are grams that actually collide with the
    * benchmark (a vanishing fraction of a clean corpus). Filtering
    * commutes with distinct, so results are identical — without it the
    * distinct shuffles every corpus gram, which is the dominant cost of
    * decontamination at 100 TB.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame, idCol: String) = df
      .select(col("doc_id").as(idCol), split(trim(col("text")), " ").as("w"))
      .where(size(col("w")) >= GramWords)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(w) - ${GramWords - 1}), " +
          s"i -> md5(concat_ws(' ', slice(w, i, $GramWords))))")).as("g"))
    val d = Tables(spark, dir, "documents")
    val bench = grams(d.where(col("doc_id") < BenchDocs), "bench_id").distinct()
    val corpus = grams(d.where(col("doc_id") >= BenchDocs), "doc_id")
      .join(broadcast(bench.select(col("g"))).as("bg"), Seq("g"), "left_semi")
      .distinct()
    corpus.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= MinShared)
  }

  val contaminationSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
       |  WHERE len(string_split(trim(text), ' ')) >= $GramWords
       |), g AS (
       |  SELECT DISTINCT doc_id,
       |         md5(array_to_string(list_slice(w, i, i + ${GramWords - 1}), ' ')) AS g
       |  FROM s, unnest(range(1, len(w) - ${GramWords - 2})) AS t(i)
       |)
       |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
       |FROM g c JOIN g b ON c.g = b.g
       |WHERE c.doc_id >= $BenchDocs AND b.doc_id < $BenchDocs
       |GROUP BY 1, 2 HAVING count(*) >= $MinShared""".stripMargin

  // ------------------------------------------------------- quality gate
  private val GatePercentile = 0.8

  /** Percentile quality gate: keep documents at or above the corpus's
    * 80th percentile of a quality signal (here `n_chars` — any scalar
    * score slots in). The threshold is EXACT but never buffers the
    * corpus: built-in `percentile` holds every value of the group in
    * one aggregation buffer (a corpus-sized single-task buffer for a
    * global percentile), so the exact interpolated quantile is derived
    * from the VALUE HISTOGRAM instead — one (value, count) aggregation
    * whose frame is |distinct score values| (bounded for any discrete
    * quality score), a cumulative count over that reduced frame, and
    * the two order statistics around rank 1 + (N−1)·q interpolated
    * exactly as `quantile_cont` defines. The gate scan then streams
    * against the broadcast scalar — no global sort or rank anywhere.
    */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val hist = d.where(col("n_chars").isNotNull)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    // cumulative counts over the reduced histogram frame
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("n_chars").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = hist.agg(sum(col("cnt")).as("n"))
    // continuous-quantile position p (1-based): lo/hi order statistics
    // are the smallest values whose cumulative count reaches ⌊p⌋ / ⌈p⌉
    val thr = cum.crossJoin(broadcast(total))
      .select(col("n_chars"), col("cum"),
        (lit(1.0) + (col("n") - 1).cast("double") * GatePercentile).as("p"))
      .agg(
        max(col("p")).as("p"),
        min(when(col("cum") >= floor(col("p")), col("n_chars"))).as("lo"),
        min(when(col("cum") >= ceil(col("p")), col("n_chars"))).as("hi"))
      .select((col("lo") +
        (col("hi") - col("lo")) * (col("p") - floor(col("p")))).as("thr"))
    d.join(broadcast(thr), col("n_chars") >= col("thr"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("thr"), 6).as("threshold"))
  }

  val qualityGateSql: String =
    s"""SELECT doc_id, lang, n_chars,
       |       round((SELECT quantile_cont(n_chars, $GatePercentile)
       |              FROM documents), 6) AS threshold
       |FROM documents
       |WHERE n_chars >= (SELECT quantile_cont(n_chars, $GatePercentile)
       |                  FROM documents)""".stripMargin

  // -------------------------------------------------- balanced sampling
  /** Per-class balanced downsample, SERVING PATH: keep a document iff
    * the first 32 bits of its id hash fall below the class's keep
    * fraction m/c (m = min class count, c = the class's count), i.e.
    * `substr(md5(id),1,8) < hex((m·2³²) div c)` — hex strings compare
    * lexicographically exactly as the numbers they encode, and the
    * smallest class (m = c) short-circuits to keep-all. One pass over
    * the corpus after a class-count aggregation broadcast back: no
    * rank, no sort, no per-class window — parallelism stays the scan's
    * at any corpus size, which is why this is the shape a 100 TB
    * balancing job runs. The price is per-class counts of Binomial(c,
    * m/c) — concentrated at m (±√m), not exactly m; the windowed form
    * below (`balancedSampleExact`, served as the `_check` twin) is the
    * exact-m reference. Integer arithmetic throughout (m < 2³¹ by the
    * BIGINT bound, fail-fast on overflow), so the sample is
    * bit-reproducible on any engine — the oracle runs the identical
    * rule, making this approximate-in-count op fully value-oracled.
    */
  def balancedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
    val m = counts.agg(min(col("c")).as("m"))
    val cut = lower(lpad(hex(expr("(m * 4294967296) div c")), 8, "0"))
    d.join(broadcast(counts), Seq("lang"))
      .crossJoin(broadcast(m))
      .where(col("c") === col("m") ||
        substring(md5(col("doc_id").cast("string")), 1, 8) < cut)
      .select(col("doc_id"), col("lang"),
        col("c").as("class_count"), col("m").as("min_count"))
  }

  val balancedSampleSql: String =
    """WITH c AS (
      |  SELECT lang, count(*) AS c FROM documents GROUP BY lang
      |), m AS (
      |  SELECT min(c) AS m FROM c
      |)
      |SELECT d.doc_id, d.lang, c.c AS class_count, m.m AS min_count
      |FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
      |WHERE c.c = m.m OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
      |      lower(lpad(hex((m.m * 4294967296) // c.c), 8, '0'))""".stripMargin

  /** Exact-m per-class downsample (the `_check` reference for
    * `balancedSample`): every language keeps exactly min-class-count
    * documents in deterministic hash order. The per-class rank runs
    * through [[ShardedPrefix.cumsum]] on the md5 STRING key (the
    * string-key generalization: shards split on sampled hash-prefix
    * cut points, the window orders by the real key within a shard, so
    * parallelism is |classes|·shards and the skew bound is a shard of
    * the largest class — the last global per-class window in the
    * registry, retired).
    */
  def balancedSampleExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val minCount = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("m"))
    val keyed = d.select(col("doc_id"), col("lang"),
      md5(col("doc_id").cast("string")).as("pick_key"))
    ShardedPrefix.cumsum(spark, keyed, Seq("lang"), "pick_key", Nil,
        rnCol = Some("rk"), tiebreaks = Seq(col("doc_id").asc))
      .join(broadcast(minCount), col("rk") <= col("m"))
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
  }

  val balancedSampleExactSql: String =
    """WITH m AS (
      |  SELECT min(c) AS m FROM (SELECT count(*) AS c FROM documents GROUP BY lang)
      |), r AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
      |  FROM documents
      |)
      |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
      |FROM r, m WHERE rk <= m""".stripMargin

  // ----------------------------------------------------- mixture sampling
  /** Fraction of total corpus tokens the mixture keeps. */
  private val MixtureKeep = 0.5
  /** Prefix-sum shards per source. Sharding is BY HASH RANGE (top bits
    * of the selection hash), so shards are contiguous in the selection
    * order and the global per-source prefix decomposes exactly into
    * (sum of lower shards' totals) + (running sum within the shard) —
    * the same sharded-prefix-sum shape as `pack`, except pack shards an
    * arbitrary order and mixture must shard ITS order. */
  private val MixtureShards = 8

  /** Token-budgeted mixture sampling: re-weight the corpus so each source
    * contributes its TARGET share of kept tokens (here a stand-in config:
    * even-indexed sources weight 1.0, odd 0.5), keeping documents in
    * seeded-hash order until the source's token budget is crossed — the
    * up/down-sampling step that sets a training corpus's source mixture.
    * A document is kept iff its cumulative prefix STARTS inside the
    * budget (greedy, same convention as `pack`), so the sample is stable
    * under re-runs and across engines.
    *
    * Scale shape: one count-sized aggregation for budgets (broadcast
    * back); the per-source running sum is sharded by hash range — the
    * window partitions on (source, shard), so parallelism is
    * |sources| × shards and the skew bound is a shard of the largest
    * source, not the whole source; per-(source, shard) totals reduce to
    * a metadata-sized frame whose triangular self-join yields the
    * broadcast prefix offsets. The ORACLE stays the single per-source
    * global window, which is exactly the point: the sharded
    * decomposition must reproduce it bit-for-bit.
    *
    * Weights use try_cast on both engines (ADVICE r4): a source id not
    * of the form src<int> gets the null→0.5 branch everywhere instead
    * of diverging (lenient cast here, strict CAST in the oracle).
    */
  def mixture(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens"))
    val weight = when(
      expr("try_cast(substring(source, 4, 10) AS int)") % 2 === 0, lit(1.0))
      .otherwise(lit(0.5))
    val perSource = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", weight)
    val totals = perSource.agg(sum(col("w")).as("sum_w"))
    val totalTokens = d.agg(sum(col("tokens")).as("total"))
    val budget = perSource
      .crossJoin(broadcast(totals)).crossJoin(broadcast(totalTokens))
      .select(col("source"),
        (col("w") / col("sum_w") * col("total") * MixtureKeep).as("budget"))
    // shard = top bits of the selection hash: monotone in hash order, so
    // (shard, h, doc_id) order == (h, doc_id) order
    val h = md5(col("doc_id").cast("string"))
    val sharded = d
      .withColumn("h", h)
      .withColumn("shard", (conv(substring(col("h"), 1, 2), 16, 10)
        .cast("int") / (256 / MixtureShards)).cast("int"))
    val inShard = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(source, shard) totals → prefix offsets over lower shards;
    // |sources| × shards rows — metadata-sized, broadcast back
    val shardTotals = sharded.groupBy(col("source"), col("shard"))
      .agg(sum(col("tokens")).as("t"))
    val offsets = shardTotals.as("a")
      .join(shardTotals.as("b"),
        col("a.source") === col("b.source") &&
          col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.source").as("source"), col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.t")), lit(0L)).as("off"))
    sharded
      .withColumn("local_cum", sum(col("tokens")).over(inShard))
      .join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("cum", col("off") + col("local_cum"))
      .join(budget, Seq("source"))
      .where(col("cum") - col("tokens") < col("budget"))
      .select(col("source"), col("doc_id"), col("tokens"), col("cum"),
        round(col("budget"), 6).as("budget"))
  }

  val mixtureSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tokens,
       |         CASE WHEN TRY_CAST(substr(source, 4, 10) AS INT) % 2 = 0
       |              THEN 1.0 ELSE 0.5 END AS w
       |  FROM documents
       |), b AS (
       |  SELECT source, any_value(w) AS w FROM d GROUP BY source
       |), bb AS (
       |  SELECT source,
       |         w / (SELECT sum(w) FROM b) *
       |           (SELECT sum(tokens) FROM d) * $MixtureKeep AS budget
       |  FROM b
       |), c AS (
       |  SELECT doc_id, source, tokens,
       |         CAST(sum(tokens) OVER (PARTITION BY source
       |                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d
       |)
       |SELECT c.source, c.doc_id, c.tokens, c.cum, round(bb.budget, 6) AS budget
       |FROM c JOIN bb ON c.source = bb.source
       |WHERE c.cum - c.tokens < bb.budget""".stripMargin

  // ------------------------------------------ loss-band data selection
  private val LossBandLo = 0.2
  private val LossBandHi = 0.8

  /** Model-score ("goldilocks") data selection: keep documents whose
    * unigram cross-entropy sits in the middle band of the corpus
    * distribution — the selection rule behind loss-based filtering:
    * the LOW tail is boilerplate the model already knows (training
    * signal ~0), the HIGH tail is noise/garbage it never will, the
    * middle is where learning happens. Complements `qualityGate`
    * (single-tail threshold on a heuristic) with a TWO-SIDED band on a
    * model-derived score; any per-doc loss column (a real LM's, at
    * production) slots into the same shape.
    *
    * Thresholds are EXACT inclusive-rank order statistics (smallest
    * score whose cumulative count reaches ⌈q·n⌉ — `quantile_disc`
    * semantics), computed on the REDUCED distinct-score histogram like
    * `qualityGate`: the corpus never sorts globally, the histogram
    * window runs over |distinct scores| rows, and both thresholds ride
    * one broadcast-back scalar frame. Band-edge comparisons are safe
    * across engines because the score is the already-hash-stable
    * rounded `cross_entropy` from `text_perplexity`.
    *
    * BOUNDEDNESS INVARIANT (do not weaken): the unpartitioned
    * `Window.orderBy` below is acceptable ONLY because its input is the
    * distinct-score histogram, whose cardinality is bounded by the
    * score's 4-dp rounding in `TextAnalysis.perplexity` — unigram
    * cross-entropies live in roughly (0, 30] nats, so there are at most
    * a few ×10⁵ representable values at ANY corpus size; the window
    * never sees a corpus-sized frame. If the rounding is ever removed
    * or deepened past ~6 dp, this must switch to the sharded
    * prefix-sum decomposition used by `curriculum`/`aggPareto`.
    * CurationSpec pins the shape: the Window's subtree must contain
    * the cross_entropy groupBy (histogram) aggregate.
    */
  def lossBand(spark: SparkSession, dir: String): DataFrame = {
    val ce = TextAnalysis.perplexity(spark, dir)
    val hist = ce.groupBy(col("cross_entropy")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("cross_entropy").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = hist.agg(sum(col("cnt")).as("n"))
    val thr = cum.crossJoin(broadcast(total)).agg(
      min(when(col("cum") >= ceil(col("n") * LossBandLo), col("cross_entropy")))
        .as("band_lo"),
      min(when(col("cum") >= ceil(col("n") * LossBandHi), col("cross_entropy")))
        .as("band_hi"))
    ce.crossJoin(broadcast(thr))
      .where(col("cross_entropy") >= col("band_lo") &&
        col("cross_entropy") <= col("band_hi"))
      .select(col("doc_id"), col("n_tokens"), col("cross_entropy"),
        col("band_lo"), col("band_hi"))
  }

  val lossBandSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
       |  FROM documents
       |), v AS (
       |  SELECT w, count(*) AS c FROM toks GROUP BY w
       |), ce AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |         round(-avg(ln(CAST(c AS DOUBLE) / (SELECT count(*) FROM toks))), 4)
       |           AS cross_entropy
       |  FROM toks JOIN v USING (w)
       |  GROUP BY doc_id
       |), h AS (
       |  SELECT cross_entropy, count(*) AS cnt FROM ce GROUP BY 1
       |), cc AS (
       |  SELECT cross_entropy,
       |         CAST(sum(cnt) OVER (ORDER BY cross_entropy ASC
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM h
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ce),
       |t AS (
       |  SELECT min(CASE WHEN cum >= ceil(n * $LossBandLo) THEN cross_entropy END) AS band_lo,
       |         min(CASE WHEN cum >= ceil(n * $LossBandHi) THEN cross_entropy END) AS band_hi
       |  FROM cc CROSS JOIN nn
       |)
       |SELECT ce.doc_id, ce.n_tokens, ce.cross_entropy, t.band_lo, t.band_hi
       |FROM ce CROSS JOIN t
       |WHERE ce.cross_entropy >= t.band_lo AND ce.cross_entropy <= t.band_hi""".stripMargin

  // ------------------------------------- PPS systematic weighted sample
  /** Target draws for the PPS sample. */
  private val PpsTarget = 100L
  private val PpsShards = 8

  /** Weighted sampling with inclusion probability ∝ weight (here
    * `n_chars` — any quality score slots in), by SYSTEMATIC
    * probability-proportional-to-size selection: lay every document's
    * weight end-to-end along a line in seeded-hash order (the hash
    * order is the method's built-in randomization), then select each
    * document whose weight interval crosses a multiple of
    * `total_weight / target`. The crossing test is pure BIGINT —
    * `floor(cum·n / W) > floor((cum−w)·n / W)` — so both engines pick
    * the identical sample: no ln/pow (not correctly rounded across
    * engines, unlike the sqrt `temperatureSample` leans on), no float
    * boundaries. The float-keyed alternative (Efraimidis–Spirakis
    * u^(1/w) ranking) was rejected for exactly that cross-engine
    * boundary risk.
    *
    * Scale shape: same sharded prefix-sum decomposition as `mixture` —
    * shard by the top bits of the selection hash (contiguous in the
    * selection order), per-shard running sums under a (shard)-keyed
    * window, shard totals reduce to a metadata-sized frame whose
    * triangular self-join yields broadcast offsets. One corpus shuffle.
    *
    * Standard PPS caveat, inherited deliberately: a document heavier
    * than W/n crosses several multiples but is emitted once, so the
    * draw count can fall below `target` on extremely skewed weights
    * (the fixture's ~uniform doc lengths keep it exact; CurationSpec
    * pins the draw-count contract).
    */
  def ppsSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        greatest(col("n_chars"), lit(1L)).as("w"))
    val h = md5(concat_ws(":", lit("pps"), col("doc_id").cast("string")))
    val sharded = d
      .withColumn("h", h)
      .withColumn("shard", (conv(substring(col("h"), 1, 2), 16, 10)
        .cast("int") / (256 / PpsShards)).cast("int"))
    val inShard = Window.partitionBy(col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shardTotals = sharded.groupBy(col("shard"))
      .agg(sum(col("w")).as("t"))
    val offsets = shardTotals.as("a")
      .join(shardTotals.as("b"), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.t")), lit(0L)).as("off"))
    val total = shardTotals.agg(sum(col("t")).as("tw"))
    sharded
      .withColumn("local_cum", sum(col("w")).over(inShard))
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("cum", col("off") + col("local_cum"))
      .crossJoin(broadcast(total))
      // DECIMAL(38,0), not BIGINT, for the crossing products: cum·target
      // reaches total_corpus_weight × target, which at 100 TB (W ≈ 1e14
      // chars) overflows a signed 64-bit long as soon as the target has
      // six digits — silently, into a wrong sample (AUDIT r6 #2). The
      // 38-digit decimal holds W·target to ~1e31; DuckDB's twin gets the
      // same headroom via HUGEINT. Quotients stay long-sized (≤ target).
      .where(expr(s"(CAST(cum AS DECIMAL(38,0)) * $PpsTarget) div tw") >
        expr(s"(CAST(cum - w AS DECIMAL(38,0)) * $PpsTarget) div tw"))
      .select(col("doc_id"), col("lang"), col("w").as("weight"),
        col("cum"))
  }

  val ppsSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, greatest(n_chars, 1) AS w,
       |         md5(concat_ws(':', 'pps', CAST(doc_id AS VARCHAR))) AS h
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, lang, w,
       |         CAST(sum(w) OVER (ORDER BY h ASC, doc_id ASC
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d
       |), t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d)
       |SELECT doc_id, lang, w AS weight, cum
       |FROM c CROSS JOIN t
       |WHERE (CAST(cum AS HUGEINT) * $PpsTarget) // tw
       |    > (CAST(cum - w AS HUGEINT) * $PpsTarget) // tw""".stripMargin

  // ------------------------------------------------ train/val/test split
  /** Deterministic stratified split: the md5 of a salted doc id lands in
    * one of 256 hex buckets; buckets below 'cd' (205/256 ≈ 80%) are
    * train, below 'e6' (another ~10%) are val, the rest test. A pure
    * seeded projection — no shuffle, no state, reproducible on any
    * engine and stable when the corpus grows (a document's split never
    * changes), which is exactly why hash splits, not random splits, are
    * the production standard.
    */
  def split3(spark: SparkSession, dir: String): DataFrame = {
    val b = substring(md5(concat_ws(":", lit("split"),
      col("doc_id").cast("string"))), 1, 2)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
          .as("split"))
  }

  val split3Sql: String =
    """SELECT doc_id, source, n_chars,
      |       CASE WHEN substr(md5(concat_ws(':', 'split', CAST(doc_id AS VARCHAR))), 1, 2) < 'cd' THEN 'train'
      |            WHEN substr(md5(concat_ws(':', 'split', CAST(doc_id AS VARCHAR))), 1, 2) < 'e6' THEN 'val'
      |            ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** Group-aware (leakage-safe) 80/10/10 split: `split3` hashes each
    * document independently, so two near-duplicate documents can land in
    * train and test — exactly the contamination a held-out set must not
    * contain. Here the hash unit is the near-dup CLUSTER: every document
    * carries its component's canonical id from the MinHash pair graph
    * (`Dedup.clusters`, singletons are their own group), and the split
    * bucket is the md5 of that GROUP id — so an entire duplicate family
    * moves as one unit and can never straddle splits (pinned by a
    * CurationSpec assertion over the actual pair set).
    *
    * Scale shape: the clustering rides the star-contraction loop (frames
    * confined to the pair graph); the corpus then takes ONE left join
    * against the label frame (pair-graph-sized, usually far smaller than
    * the corpus — AQE broadcasts it when small) and a codegen'd hash
    * projection. The salt prefix is shared with `split3`, so the two
    * splits agree wherever a document is its own group.
    */
  def splitGroupAware(spark: SparkSession, dir: String): DataFrame = {
    val groups = Dedup.clusters(spark, dir)
      .select(col("doc_id"), col("canonical_id"))
    val withGroup = Tables(spark, dir, "documents")
      .join(groups, Seq("doc_id"), "left_outer")
      .withColumn("group_id", coalesce(col("canonical_id"), col("doc_id")))
    val b = substring(md5(concat_ws(":", lit("split"),
      col("group_id").cast("string"))), 1, 2)
    withGroup.select(col("doc_id"), col("source"), col("group_id"),
      when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
        .as("split"))
  }

  val splitGroupAwareSql: String =
    s"""WITH labels AS (
       |${Dedup.clustersSql}
       |), g AS (
       |  SELECT d.doc_id, d.source,
       |         COALESCE(l.canonical_id, d.doc_id) AS group_id
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
       |)
       |SELECT doc_id, source, group_id,
       |       CASE WHEN substr(md5(concat_ws(':', 'split', CAST(group_id AS VARCHAR))), 1, 2) < 'cd' THEN 'train'
       |            WHEN substr(md5(concat_ws(':', 'split', CAST(group_id AS VARCHAR))), 1, 2) < 'e6' THEN 'val'
       |            ELSE 'test' END AS split
       |FROM g""".stripMargin

  // --------------------------------------------------- curriculum phases
  private val CurriculumPhases = 4

  /** Curriculum binning: order the corpus by a quality signal (n_chars
    * as the stand-in) and cut it into equal-size training phases —
    * curriculum learning's "easy/clean first" schedule as a deterministic
    * assignment (exactly `ntile` over a TOTAL order; the doc_id tiebreak
    * makes equal-quality placement reproducible).
    *
    * Scale shape — NO global window and no single-partition sort:
    *  1. range-bin the corpus on DETERMINISTIC cut points: the exact
    *     interior percentiles of the quality key (one scalar reduce,
    *     broadcast back), bin = count of cut points above the row's
    *     key. Deterministic binning is the load-bearing choice: an
    *     earlier form used `repartitionByRange` + partition ids, whose
    *     SAMPLED range bounds differ between the rank and count
    *     branches whenever the exchange is not reused — caught as an
    *     off-by-one-partition phase shift by the sf0.1 oracle. A plan's
    *     correctness must not depend on the optimizer choosing reuse;
    *  2. local rank = `row_number` over a window PARTITIONED by bin
    *     (parallelism = numPartitions at any corpus size; each task
    *     sorts only its slab — skew bound is the largest run of ties,
    *     since ties share a bin);
    *  3. per-bin counts reduce to ≤ numPartitions rows; prefix offsets
    *     come from a triangular self-join on that metadata-sized frame,
    *     broadcast back;
    *  4. global rank = offset + local rank; phase = closed-form ntile
    *     arithmetic (first N mod P buckets get one extra row).
    * One corpus shuffle (the bin window) + broadcast joins. Exact — the
    * oracle stays plain `ntile` SQL.
    */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    // Composite total-order key: one long whose DESCENDING order is
    // exactly (n_chars DESC, doc_id ASC), so percentile cuts on it
    // break ties and bins stay uniform even on a COARSE quality score
    // (binning on n_chars alone would collapse a 5-tier score to 5
    // bins — parallelism 5 at any cluster size). Bounds: n_chars <
    // 2²² and doc_id < 2⁴⁰ fit the product in a long; beyond ~2⁵³ the
    // double-typed cut points lose ulps but stay MONOTONE, which is
    // the only property binning needs — boundary ties just merge.
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("n_chars") * (1L << 40) - col("doc_id")).as("k"))
    // Cut points only set bin BALANCE — ranks are recomputed exactly
    // from actual per-bin counts below, so any monotone cuts give the
    // right answer. That buys two scale properties: approx_percentile
    // (mergeable sketch, bounded memory — exact percentile would buffer
    // the whole corpus's keys in ONE aggregation buffer), and a driver
    // collect of the numPartitions-1 doubles so both consumers of `pid`
    // share LITERAL constants — the same metadata-sized collect a
    // RangePartitioner does for its sample, and it makes cross-branch
    // cut divergence (the bug the sampled-bounds form had) impossible
    // by construction.
    // null cuts = empty corpus: one bin, empty result (EdgeCaseSpec)
    val cutRow = d.agg(expr(
      s"approx_percentile(k, array(${fracs.mkString(", ")}), 10000)")
      .as("cuts")).head()
    val cutVals: Seq[Double] =
      if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Double](0)
    // bin 0 holds the highest-quality rows (descending order), so a
    // row's bin = how many cut points sit strictly above its key; the
    // mapping is monotone along the sort order, which is what makes
    // bin-local ranks + prefix offsets reconstruct the global rank.
    val cutArr =
      if (cutVals.isEmpty) array().cast("array<double>")
      else array(cutVals.map(lit): _*)
    val binned = d
      .withColumn("pid",
        size(filter(cutArr, c => c > col("k").cast("double"))).cast("int"))
      .drop("k")
    val byBin = Window.partitionBy(col("pid"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ranged = binned.withColumn("lr", row_number().over(byBin).cast("long"))
    val counts = binned.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
    // Prefix offset per partition: rows in all lower-range partitions.
    // Triangular self-join over ≤ numPartitions rows — metadata-sized.
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    // Exact ntile(P) over global rank r of N rows: the first N mod P
    // buckets hold (N div P)+1 rows, the rest N div P. `if` evaluates
    // only the taken branch, so q = 0 (N < P) never divides by zero.
    ranged
      .join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(total))
      .withColumn("r", col("off") + col("lr"))
      .withColumn("q", expr(s"n div ${CurriculumPhases}L"))
      .withColumn("rem", col("n") % CurriculumPhases)
      .withColumn("cut", col("rem") * (col("q") + 1L))
      .withColumn("phase", expr(
        "if(r <= cut, (r - 1) div (q + 1) + 1," +
          " rem + (r - cut - 1) div q + 1)"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("phase").cast("long").as("phase"))
  }

  val curriculumSql: String =
    s"""SELECT doc_id, source, n_chars,
       |       CAST(ntile($CurriculumPhases) OVER (
       |         ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS phase
       |FROM documents""".stripMargin

  // ------------------------------------------- temperature sampling
  /** Fraction of the corpus the temperature-balanced sample targets. */
  private val TempBudgetFrac = 0.3

  /** Temperature-scaled language sampling — the multilingual rebalancing
    * step (sample language l with probability ∝ p_l^T): high-resource
    * languages are downsampled and low-resource ones kept, flattening
    * the language distribution without inverting it. T = 0.5 so the
    * weight is `sqrt`, which IEEE defines as correctly rounded — both
    * engines derive bit-identical per-language weights; the only
    * order-sensitive arithmetic is the |langs|-term weight sum, whose
    * ulp wobble would have to move the 2⁻³² selection cut across a doc
    * hash to flip a row (P ≈ |docs|·2⁻³² per ulp — negligible).
    *
    * Selection reuses the balanced-sample integer-cut rule: keep iff
    * the first 32 hash bits fall below ⌊rate·2³²⌋ rendered as 8 hex
    * chars, so the kept set is reproducible on any engine. Shape at
    * scale: one map-side-combined |langs|-row aggregation broadcast
    * back; the corpus itself never shuffles — scan, hash, filter.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val perLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val t = perLang.agg(sum(col("n")).cast("double").as("total"),
      sum(sqrt(col("n").cast("double"))).as("sum_w"))
    val rates = perLang.crossJoin(broadcast(t))
      .select(col("lang"),
        least(lit(1.0), lit(TempBudgetFrac) * col("total") *
          sqrt(col("n").cast("double")) / col("sum_w") /
          col("n").cast("double")).as("rate"))
    val cut =
      lpad(lower(hex(floor(col("rate") * 4294967296.0).cast("long"))), 8, "0")
    d.join(broadcast(rates), Seq("lang"))
      .where(col("rate") >= 1.0 ||
        substring(md5(col("doc_id").cast("string")), 1, 8) < cut)
      .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate_r"))
  }

  val temperatureSampleSql: String =
    s"""WITH pl AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
       |             sum(sqrt(CAST(n AS DOUBLE))) AS sum_w FROM pl),
       |r AS (
       |  SELECT lang,
       |         least(CAST(1.0 AS DOUBLE),
       |               CAST($TempBudgetFrac AS DOUBLE) * total
       |                 * sqrt(CAST(n AS DOUBLE)) / sum_w
       |                 / CAST(n AS DOUBLE)) AS rate
       |  FROM pl, t)
       |SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate_r
       |FROM documents d JOIN r USING (lang)
       |WHERE r.rate >= 1.0
       |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
       |      lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))),
       |           8, '0')""".stripMargin

  /** Mixture-weight PLANNING — the step before `mixture` samples: given
    * a uniform target share per source and what each source actually
    * has, how many tokens can each contribute and at what rate? The
    * availability cap (`planned = min(avail, target)`) is the
    * waterfilling first step every mixture recipe needs; the report
    * surfaces the deficit a rebalancing (or upsampling) decision is
    * made from. All quantities are INTEGER arithmetic — `target = T div
    * K` — so both engines plan the identical mixture; only the
    * diagnostic `rate` is a rounded ratio.
    *
    * Scale shape: one scan reducing to ≤ |sources| rows map-side, the
    * scalar total broadcast back over the tiny frame. Nothing
    * corpus-sized survives the first aggregation.
    */
  def mixtureSolver(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Eager checkpoint: bySource feeds both the totals reduce and the
    // output join; without the cut the corpus scan+tokenize runs twice.
    // The frame is ≤ |sources| rows — free to materialize.
    val bySource = Tables(spark, dir, "documents")
      .select($"source",
        size(split($"text", " ")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("avail_tokens"))
      .localCheckpoint()
    val totals = bySource.agg(
      sum("avail_tokens").as("t"), count(lit(1)).as("k"))
    bySource.crossJoin(broadcast(totals))
      // TRUE integer division (`div`), matching the twin's `t // k` —
      // double-divide-then-truncate crosses an integer boundary when
      // t/k lands within a ulp of one (r7 ADVICE; realistic at 100 TB
      // token totals over ~100 sources).
      .select($"source", $"avail_tokens",
        expr("t div k").as("target_tokens"),
        least($"avail_tokens", expr("t div k"))
          .as("planned_tokens"))
      .select($"source", $"avail_tokens", $"target_tokens",
        $"planned_tokens",
        round($"planned_tokens".cast("double") / $"avail_tokens", 6)
          .as("rate"),
        ($"target_tokens" - $"planned_tokens").as("deficit_tokens"))
  }

  val mixtureSolverSql: String =
    """WITH s AS (
      |  SELECT source,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |           AS avail_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT sum(avail_tokens) AS t, count(*) AS k FROM s)
      |SELECT source, avail_tokens,
      |       CAST(t // k AS BIGINT) AS target_tokens,
      |       CAST(least(avail_tokens, t // k) AS BIGINT) AS planned_tokens,
      |       round(CAST(least(avail_tokens, t // k) AS DOUBLE)
      |             / avail_tokens, 6) AS rate,
      |       CAST(t // k - least(avail_tokens, t // k) AS BIGINT)
      |         AS deficit_tokens
      |FROM s CROSS JOIN t""".stripMargin

  // -------------------------------- importance resampling (DSIR-style)

  /** Target domain for importance weighting: the `lang = 'en'` slice
    * stands in for "the distribution we want more of" (in production: a
    * high-quality reference corpus).
    */
  private val DsirTargetLang = "en"
  private val DsirTopK = 100

  /** Data Selection with Importance Resampling (Xie et al. 2023),
    * unigram form: score every RAW document by how much its token
    * distribution looks like the TARGET domain versus the raw pool —
    * per-token log-likelihood ratio `ln(p_target(w) / p_raw(w))` with
    * add-one smoothing, summed over the document — then take the
    * top-K under the total order (weight DESC, doc_id). The standard
    * recipe for tilting a web-scale crawl toward a reference corpus
    * without training a classifier.
    *
    * Determinism across engines: both unigram LMs are exact integer
    * counts; each word's log-ratio is computed once on the vocab frame
    * from identical integer-derived doubles, rounded to 6 dp and FIXED
    * AS DECIMAL(18,6) there — so the per-document reduction is an
    * exact decimal dot product (`lr × count` summed), immune to
    * float accumulation order (the `agg_pareto` discipline applied to
    * a log-domain score).
    *
    * Scale shape: one corpus scan reduces to vocab-sized count frames
    * (map-side combined); the scalar totals broadcast over the vocab
    * join; the per-doc reduction shuffles (doc_id, w, cnt) triples
    * joined against the vocab scores; top-K is a TakeOrdered. At a
    * 100 TB vocab the word key swaps for the hashed-bucket features of
    * `text_hash_embed` (DSIR's own production trick) — the plan shape
    * is unchanged.
    */
  def dsir(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(spark, dir, identity)

  /** The DSIR pipeline with a pluggable feature map over the token
    * column — `identity` gives the word-feature exact form (`dsir`),
    * a hash-bucket map gives the vocab-scale serving form
    * (`dsirHashed`). One pipeline, two feature spaces.
    */
  private def dsirWeights(spark: SparkSession, dir: String,
      feature: Column => Column): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w0"))
      .select(col("doc_id"), col("lang"), feature(col("w0")).as("w"))
    // vocab-sized count frames; the corpus never survives the first agg.
    // Both checkpoint: each feeds the totals reduce AND the score join,
    // and without the cut each consumer re-runs its corpus scan —
    // three document scans total (raw LM, target LM, per-doc counts).
    val raw = toks.groupBy("w").agg(count(lit(1)).as("cr"))
      .localCheckpoint()
    val tgt = toks.where($"lang" === DsirTargetLang)
      .groupBy("w").agg(count(lit(1)).as("ct"))
      .localCheckpoint()
    val totals = raw.join(tgt, Seq("w"), "left").agg(
      sum("cr").as("nr"), sum(coalesce($"ct", lit(0L))).as("nt"),
      count(lit(1)).as("v"))
    val scores = raw.join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select($"w",
        round(log(
          ((coalesce($"ct", lit(0L)) + 1).cast("double") /
            ($"nt" + $"v").cast("double")) /
            (($"cr" + 1).cast("double") / ($"nr" + $"v").cast("double"))),
          6).cast("decimal(18,6)").as("lr"))
    // Boundary rule (r8 verdict): the top-K ranking runs on the exact
    // DECIMAL(38,6) dot product, but the EMITTED weight is cast to
    // DOUBLE on both engines — decimal128 must not cross the oracle
    // boundary (the driver's hash canonicalizes it differently from
    // any local mirror). Same exact decimal → bit-identical doubles.
    toks.groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .join(scores, "w")
      .groupBy("doc_id")
      .agg(sum($"cnt").as("n_tokens"),
        sum($"lr" * $"cnt").cast("decimal(38,6)").as("wd"))
      .orderBy($"wd".desc, $"doc_id".asc)
      .limit(DsirTopK)
      .select($"doc_id", $"n_tokens",
        $"wd".cast("double").as("weight"))
  }

  val dsirSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |raw AS (SELECT w, CAST(count(*) AS BIGINT) AS cr FROM toks GROUP BY w),
       |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct FROM toks
       |        WHERE lang = '$DsirTargetLang' GROUP BY w),
       |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
       |               CAST(sum(COALESCE(ct, 0)) AS BIGINT) AS nt,
       |               CAST(count(*) AS BIGINT) AS v
       |        FROM raw LEFT JOIN tgt USING (w)),
       |scores AS (
       |  SELECT w, CAST(round(ln(
       |           (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) /
       |            CAST(nt + v AS DOUBLE)) /
       |           (CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE))), 6)
       |         AS DECIMAL(18,6)) AS lr
       |  FROM raw LEFT JOIN tgt USING (w) CROSS JOIN tot),
       |dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
       |       FROM toks GROUP BY doc_id, w),
       |ranked AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |         CAST(sum(lr * cnt) AS DECIMAL(38,6)) AS wd
       |  FROM dw JOIN scores USING (w)
       |  GROUP BY doc_id
       |  ORDER BY wd DESC, doc_id ASC
       |  LIMIT $DsirTopK)
       |SELECT doc_id, n_tokens, CAST(wd AS DOUBLE) AS weight
       |FROM ranked
       |ORDER BY wd DESC, doc_id ASC""".stripMargin

  /** Hash buckets for the vocab-scale DSIR form. */
  private val DsirHashBuckets = 65536

  /** The SERVING form of `curate_dsir` at 100 TB vocab: identical
    * pipeline with tokens mapped to `xxhash64 mod 65536` buckets (the
    * hashed n-gram features DSIR itself prescribes), so the LM frames
    * are bounded by the bucket count regardless of vocabulary size.
    * Hash values are engine-specific → rows-only;
    * `curate_dsir_hashed_check` pins the selection-agreement contract
    * against the exact word-feature form.
    */
  def dsirHashed(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(spark, dir,
      w => pmod(xxhash64(w), lit(DsirHashBuckets.toLong)))

  /** Oracled contract for the hashed form: at least 80% of the exact
    * top-K document selection must survive the move to hashed features
    * (bucket collisions perturb weights, but the selection an engineer
    * acts on has to be stable). The DuckDB twin pins the flag true.
    */
  def dsirHashedCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = dsir(spark, dir).select("doc_id")
    val hashed = dsirHashed(spark, dir).select("doc_id")
    exact.join(hashed, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(DsirTopK.toLong).as("k"),
        ($"n_overlap" >= (DsirTopK * 0.8).toLong).as("ok"))
  }

  val dsirHashedCheckSql: String =
    s"SELECT CAST($DsirTopK AS BIGINT) AS k, true AS ok"

  // ------------------------------- data-constrained epoch planning

  /** Token-budget multiple of the available corpus the plan must fill
    * (a 2× over-train is the common data-constrained regime), and the
    * repeat ceiling per source — the Muennighoff et al. 2023 finding
    * that value decays to ~zero past ~4 epochs of the same data.
    */
  private val EpochBudgetMult = 2L
  private val EpochMaxRepeats = 4L

  /** Data-constrained scaling plan (repetition-aware mixture): given a
    * token budget of `EpochBudgetMult`× the available corpus, give
    * each source an equal target share (the `curate_mixture_solver`
    * waterfill) but let a source REPEAT up to `EpochMaxRepeats` epochs
    * to fill its share — the planning step for training past the
    * single-epoch data wall. Reports per source the planned tokens,
    * the (fractional) epoch count, whether the epoch cap bound it, and
    * the unfilled deficit the solver would re-distribute.
    *
    * All token arithmetic is exact integers (`div`, `least`) — the
    * mixtureSolver discipline; only the reported epoch ratio is a
    * rounded double.
    *
    * Scale shape: corpus reduces to the |sources| frame; the totals
    * ride one broadcast scalar frame.
    */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables(spark, dir, "documents")
      .select($"source", size(split(trim($"text"), " ")).as("toks"))
      .groupBy("source")
      .agg(sum($"toks".cast("long")).as("avail_tokens"))
    val t = s.agg(sum("avail_tokens").as("ta"), count(lit(1)).as("k"))
    s.crossJoin(broadcast(t))
      .select($"source", $"avail_tokens",
        expr(s"(ta * $EpochBudgetMult) div k").as("target_tokens"),
        least(expr(s"(ta * $EpochBudgetMult) div k"),
          $"avail_tokens" * EpochMaxRepeats).as("planned_tokens"))
      .select($"source", $"avail_tokens", $"target_tokens",
        $"planned_tokens",
        round($"planned_tokens".cast("double") /
          $"avail_tokens".cast("double"), 4).as("epochs"),
        ($"planned_tokens" === $"avail_tokens" * EpochMaxRepeats &&
          $"target_tokens" > $"avail_tokens" * EpochMaxRepeats)
          .as("capped"),
        ($"target_tokens" - $"planned_tokens").as("deficit_tokens"))
  }

  val epochPlanSql: String =
    s"""WITH s AS (
       |  SELECT source,
       |         CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
       |           AS avail_tokens
       |  FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS ta,
       |             CAST(count(*) AS BIGINT) AS k FROM s)
       |SELECT source, avail_tokens,
       |       CAST((ta * $EpochBudgetMult) // k AS BIGINT) AS target_tokens,
       |       CAST(least((ta * $EpochBudgetMult) // k,
       |                  avail_tokens * $EpochMaxRepeats) AS BIGINT)
       |         AS planned_tokens,
       |       round(CAST(least((ta * $EpochBudgetMult) // k,
       |                        avail_tokens * $EpochMaxRepeats) AS DOUBLE)
       |             / CAST(avail_tokens AS DOUBLE), 4) AS epochs,
       |       (least((ta * $EpochBudgetMult) // k,
       |              avail_tokens * $EpochMaxRepeats)
       |          = avail_tokens * $EpochMaxRepeats
       |        AND (ta * $EpochBudgetMult) // k
       |          > avail_tokens * $EpochMaxRepeats) AS capped,
       |       CAST((ta * $EpochBudgetMult) // k -
       |            least((ta * $EpochBudgetMult) // k,
       |                  avail_tokens * $EpochMaxRepeats) AS BIGINT)
       |         AS deficit_tokens
       |FROM s CROSS JOIN t""".stripMargin

  // ------------------------------------------- trained-scorer application

  /** Apply a fixed logistic-regression quality scorer — the "run the
    * trained fastText/LR quality model over the corpus" step of a
    * web-pipeline, with the model baked in as literal weights (features:
    * log doc length in words, stopword ratio, mean word length — the
    * `text_quality` feature set). Score = σ(z); keep = z ≥ 0.
    *
    * Determinism: the features are exact integers; z is ONE fixed double
    * expression with identical literal weights and association order on
    * both engines, so the doubles — and therefore the keep decisions —
    * are bit-identical (the fixed-expression recipe used suite-wide).
    * On the fixture the minimum |z| is ~5.9e-3, nine orders above
    * double slack. Scan-only projection: no shuffle, no window; the
    * sigmoid stays inside whole-stage codegen.
    */
  def qualityLr(spark: SparkSession, dir: String): DataFrame = {
    val sw = TextAnalysis.stopwordList
    val f = Tables(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      expr("size(split(trim(text), ' '))").cast("long").as("n_words"),
      expr(s"size(filter(split(trim(text), ' '), w -> w IN ($sw)))")
        .cast("long").as("n_stopwords"))
    val z = lit(-4.0) +
      lit(1.0) * log(col("n_words").cast("double") + lit(1.0)) +
      lit(8.0) * (col("n_stopwords").cast("double") / col("n_words")) -
      lit(0.1) * (col("n_chars").cast("double") / col("n_words"))
    f.select(col("doc_id"), col("n_words"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"),
      (z >= 0).as("keep"))
  }

  val qualityLrSql: String = {
    val sw = TextAnalysis.stopwordList
    s"""WITH f AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len(string_split(trim(text), ' ')) AS n_words,
       |         len(list_filter(string_split(trim(text), ' '),
       |                         w -> w IN ($sw))) AS n_stopwords
       |  FROM documents),
       |z AS (
       |  SELECT doc_id, n_words,
       |         -4.0 +
       |         1.0 * ln(CAST(n_words AS DOUBLE) + 1.0) +
       |         8.0 * (CAST(n_stopwords AS DOUBLE) / n_words) -
       |         0.1 * (CAST(n_chars AS DOUBLE) / n_words) AS z
       |  FROM f)
       |SELECT doc_id, n_words,
       |       round(1.0 / (1.0 + exp(-z)), 6) AS score,
       |       z >= 0 AS keep
       |FROM z""".stripMargin
  }

  // ------------------------------------------------------ LR TRAINING

  /** Trained-in-engine quality scorer — the step `curate_quality_lr`
    * (fixed weights) points at: learn the weights HERE, by full-batch
    * gradient descent distilling the Gopher rule cascade into a cheap
    * linear scorer (the standard rule→model distillation a curation
    * stack runs so serving pays one dot product instead of nine rule
    * counters). Features are `curate_quality_lr`'s (log words, stopword
    * ratio, chars/word); labels are the engine's own oracled
    * `curate_gopher_filter` keep flags.
    *
    * Cross-engine exactness uses the decimal-moments recipe on GRADIENT
    * terms: each per-row mean-gradient contribution (σ(z) − y)·x / n is
    * one fixed double expression (identical literals and association
    * order on both engines), rounded to the 10-dp grid and summed as
    * DECIMAL(30,10) — exact, order-independent. Weight updates happen
    * in EXACT decimal arithmetic (w − `LrTrainRate`·g, rate 0.1; Scala
    * BigDecimal here, the
    * decimal engine in DuckDB — equal rationals), and each step's z
    * re-enters double precision through the correctly-rounded
    * decimal→double cast, so the engines cannot drift step over step.
    * The per-step gradient is ONE distributed aggregate with a bounded
    * 1-row collect (the graph-fixpoint convention); the feature frame
    * is materialized once. Output: one row per step — weights (DOUBLE
    * at the boundary), predicted-keep count, and training accuracy
    * against the Gopher labels, all integers exact.
    */
  private val LrTrainSteps = 20
  private val LrTrainRate = BigDecimal("0.1")

  /** Per-process trained-weight cache keyed by scale dir — the learned
    * model is a build artifact (the `Bpe.mergeCache` amortization), so
    * the serving op pays scoring, not 40 training jobs per call.
    */
  private val lrWeightCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, Array[BigDecimal], Long, Long)]]()

  /** The training loop: per-step (step, weights-after-update,
    * n_keep_pred, n_correct). Shared by the trajectory op and the
    * trained scorer.
    */
  private def trainLr(spark: SparkSession,
      dir: String): Seq[(Int, Array[BigDecimal], Long, Long)] =
    lrWeightCache.computeIfAbsent(dir, d => trainLrUncached(spark, d))

  private def trainLrUncached(spark: SparkSession,
      dir: String): Seq[(Int, Array[BigDecimal], Long, Long)] = {
    val sw = TextAnalysis.stopwordList
    val feats = Tables(spark, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr("size(split(trim(text), ' '))").cast("long").as("n_words"),
        expr(s"size(filter(split(trim(text), ' '), w -> w IN ($sw)))")
          .cast("long").as("n_stopwords"))
      .join(gopherFilter(spark, dir).select(col("doc_id"), col("keep")),
        "doc_id")
      .select(
        log(col("n_words").cast("double") + lit(1.0)).as("x1"),
        (col("n_stopwords").cast("double") / col("n_words")).as("x2"),
        (col("n_chars").cast("double") / col("n_words")).as("x3"),
        when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
      .localCheckpoint() // one corpus scan; steps re-read the snapshot
    val n = feats.count()
    val w = Array.fill(4)(BigDecimal(0))
    def zCol: Column = lit(w(0).toDouble) +
      lit(w(1).toDouble) * col("x1") +
      lit(w(2).toDouble) * col("x2") +
      lit(w(3).toDouble) * col("x3")
    val out = Seq.newBuilder[(Int, Array[BigDecimal], Long, Long)]
    for (step <- 1 to LrTrainSteps) {
      val p = lit(1.0) / (lit(1.0) + exp(-zCol))
      def g(x: Column) =
        sum(round((p - col("y")) * x / lit(n.toDouble), 10)
          .cast("decimal(30,10)"))
      val gs = feats.agg(g(lit(1.0)), g(col("x1")), g(col("x2")),
        g(col("x3"))).collect()(0)
      for (j <- 0 to 3)
        w(j) = w(j) - LrTrainRate * BigDecimal(gs.getDecimal(j))
      val acc = feats.agg(
        count(when(zCol >= 0, 1)).as("n_keep"),
        count(when((zCol >= 0) === (col("y") === 1.0), 1)).as("n_ok"))
        .collect()(0)
      out += ((step, w.clone(), acc.getLong(0), acc.getLong(1)))
    }
    out.result()
  }

  def lrTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainLr(spark, dir)
      .map { case (step, w, nKeep, nOk) =>
        (step, w(0).toDouble, w(1).toDouble, w(2).toDouble, w(3).toDouble,
          nKeep, nOk)
      }
      .toDF("step", "w_bias", "w_log_words", "w_stop_ratio",
        "w_chars_per_word", "n_keep_pred", "n_correct")
  }

  /** Train→serve composition: the corpus scored by the TRAINED weights
    * (the final GD step's), closing the loop `curate_quality_lr` opens
    * with fixed literals — the distilled model a pipeline actually
    * applies after `curate_lr_train` converges. Weights enter the
    * scoring expression as the correctly-rounded doubles of the exact
    * decimals (identical to the oracle's CAST from its w-CTE), so score
    * and keep are bit-stable; scoring itself is one codegen'd
    * projection over the scan — no shuffle, the `qualityLr` shape.
    */
  def qualityLrTrained(spark: SparkSession, dir: String): DataFrame = {
    val w = trainLr(spark, dir).last._2
    val sw = TextAnalysis.stopwordList
    val f = Tables(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      expr("size(split(trim(text), ' '))").cast("long").as("n_words"),
      expr(s"size(filter(split(trim(text), ' '), w -> w IN ($sw)))")
        .cast("long").as("n_stopwords"))
    val z = lit(w(0).toDouble) +
      lit(w(1).toDouble) * log(col("n_words").cast("double") + lit(1.0)) +
      lit(w(2).toDouble) *
        (col("n_stopwords").cast("double") / col("n_words")) +
      lit(w(3).toDouble) *
        (col("n_chars").cast("double") / col("n_words"))
    f.select(col("doc_id"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"),
      (z >= 0).as("keep"))
  }

  /** Unrolled-CTE oracle: the same three GD steps, gradient terms on
    * the same 10-dp decimal grid, weight updates in DuckDB's exact
    * decimal engine, weights re-entering double via the same cast.
    */
  // lazy: interpolates gopherFilterSql, declared later in this object
  lazy val lrTrainSql: String = {
    val sw = TextAnalysis.stopwordList
    def zSql(wcte: String): String =
      s"CAST($wcte.wb AS DOUBLE) + CAST($wcte.w1 AS DOUBLE)*f.x1 + " +
        s"CAST($wcte.w2 AS DOUBLE)*f.x2 + CAST($wcte.w3 AS DOUBLE)*f.x3"
    def gSql(x: String, wcte: String): String =
      s"SUM(CAST(round((1.0/(1.0+exp(-(${zSql(wcte)}))) - f.y) * $x / " +
        s"params.n, 10) AS DECIMAL(30,10)))"
    val steps = (1 to LrTrainSteps).map { s =>
      val prev = if (s == 1) "w0" else s"w${s - 1}"
      s"""g$s AS MATERIALIZED (
         |  SELECT ${gSql("1.0", prev)} AS gb, ${gSql("f.x1", prev)} AS g1,
         |         ${gSql("f.x2", prev)} AS g2, ${gSql("f.x3", prev)} AS g3
         |  FROM f CROSS JOIN $prev CROSS JOIN params
         |), w$s AS MATERIALIZED (
         |  SELECT $prev.wb - $LrTrainRate*g$s.gb AS wb,
         |         $prev.w1 - $LrTrainRate*g$s.g1 AS w1,
         |         $prev.w2 - $LrTrainRate*g$s.g2 AS w2,
         |         $prev.w3 - $LrTrainRate*g$s.g3 AS w3
         |  FROM $prev CROSS JOIN g$s
         |), a$s AS MATERIALIZED (
         |  SELECT count(CASE WHEN ${zSql(s"w$s")} >= 0 THEN 1 END)
         |           AS n_keep,
         |         count(CASE WHEN (${zSql(s"w$s")} >= 0) = (f.y = 1.0)
         |                    THEN 1 END) AS n_ok
         |  FROM f CROSS JOIN w$s
         |)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to LrTrainSteps).map { s =>
      s"""SELECT CAST($s AS INT) AS step, CAST(wb AS DOUBLE) AS w_bias,
         |       CAST(w1 AS DOUBLE) AS w_log_words,
         |       CAST(w2 AS DOUBLE) AS w_stop_ratio,
         |       CAST(w3 AS DOUBLE) AS w_chars_per_word,
         |       CAST(n_keep AS BIGINT) AS n_keep_pred,
         |       CAST(n_ok AS BIGINT) AS n_correct
         |FROM w$s CROSS JOIN a$s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $lrTrainCtes,
       |$steps
       |$rows""".stripMargin
  }

  /** The training CTE prologue (features, labels, params, w0) shared by
    * the trajectory oracle and the trained-scorer oracle.
    */
  private lazy val lrTrainCtes: String = {
    val sw = TextAnalysis.stopwordList
    s"""f0 AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len(string_split(trim(text), ' ')) AS n_words,
       |         len(list_filter(string_split(trim(text), ' '),
       |                         w -> w IN ($sw))) AS n_stopwords
       |  FROM documents),
       |lbl AS MATERIALIZED (SELECT doc_id, keep FROM ($gopherFilterSql)),
       |f AS MATERIALIZED (
       |  SELECT ln(CAST(n_words AS DOUBLE) + 1.0) AS x1,
       |         CAST(n_stopwords AS DOUBLE) / n_words AS x2,
       |         CAST(n_chars AS DOUBLE) / n_words AS x3,
       |         CASE WHEN lbl.keep THEN 1.0 ELSE 0.0 END AS y
       |  FROM f0 JOIN lbl ON lbl.doc_id = f0.doc_id),
       |params AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
       |w0 AS (SELECT CAST(0 AS DECIMAL(30,10)) AS wb,
       |              CAST(0 AS DECIMAL(30,10)) AS w1,
       |              CAST(0 AS DECIMAL(30,10)) AS w2,
       |              CAST(0 AS DECIMAL(30,10)) AS w3)""".stripMargin
  }

  /** Oracle for the trained scorer: the SAME training chain (gradient
    * CTEs verbatim, so the driver re-proves the training run inside
    * this query too), then every document scored with w$LrTrainSteps —
    * the decimal weights entering double via the identical cast the
    * Spark literals took.
    */
  lazy val qualityLrTrainedSql: String = {
    val sw = TextAnalysis.stopwordList
    def zSql(wcte: String): String =
      s"CAST($wcte.wb AS DOUBLE) + CAST($wcte.w1 AS DOUBLE)*f.x1 + " +
        s"CAST($wcte.w2 AS DOUBLE)*f.x2 + CAST($wcte.w3 AS DOUBLE)*f.x3"
    def gSql(x: String, wcte: String): String =
      s"SUM(CAST(round((1.0/(1.0+exp(-(${zSql(wcte)}))) - f.y) * $x / " +
        s"params.n, 10) AS DECIMAL(30,10)))"
    val steps = (1 to LrTrainSteps).map { s =>
      val prev = if (s == 1) "w0" else s"w${s - 1}"
      s"""g$s AS MATERIALIZED (
         |  SELECT ${gSql("1.0", prev)} AS gb, ${gSql("f.x1", prev)} AS g1,
         |         ${gSql("f.x2", prev)} AS g2, ${gSql("f.x3", prev)} AS g3
         |  FROM f CROSS JOIN $prev CROSS JOIN params
         |), w$s AS MATERIALIZED (
         |  SELECT $prev.wb - $LrTrainRate*g$s.gb AS wb,
         |         $prev.w1 - $LrTrainRate*g$s.g1 AS w1,
         |         $prev.w2 - $LrTrainRate*g$s.g2 AS w2,
         |         $prev.w3 - $LrTrainRate*g$s.g3 AS w3
         |  FROM $prev CROSS JOIN g$s
         |)""".stripMargin
    }.mkString(",\n")
    val wf = s"w$LrTrainSteps"
    s"""WITH $lrTrainCtes,
       |$steps,
       |fd AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len(string_split(trim(text), ' ')) AS n_words,
       |         len(list_filter(string_split(trim(text), ' '),
       |                         w -> w IN ($sw))) AS n_stopwords
       |  FROM documents),
       |z AS (
       |  SELECT fd.doc_id,
       |         CAST($wf.wb AS DOUBLE) +
       |         CAST($wf.w1 AS DOUBLE) *
       |           ln(CAST(n_words AS DOUBLE) + 1.0) +
       |         CAST($wf.w2 AS DOUBLE) *
       |           (CAST(n_stopwords AS DOUBLE) / n_words) +
       |         CAST($wf.w3 AS DOUBLE) *
       |           (CAST(n_chars AS DOUBLE) / n_words) AS z
       |  FROM fd CROSS JOIN $wf)
       |SELECT doc_id,
       |       round(1.0 / (1.0 + exp(-z)), 6) AS score,
       |       z >= 0 AS keep
       |FROM z""".stripMargin
  }

  // ---------------------------------------------- CCNet perplexity buckets

  /** CCNet-style perplexity bucketing (Wenzek 2020): within each
    * language, split the corpus into head/middle/tail thirds by LM
    * cross-entropy — the canonical web-corpus quality partition (train
    * on head+middle, drop or downweight tail). The LM signal is
    * `text_perplexity`'s corpus-self unigram cross-entropy.
    *
    * Buckets come from per-language tercile THRESHOLDS (percentile ≡
    * DuckDB quantile_cont over the 4-dp-rounded scores), not ntile —
    * exactly how CCNet applies cutoffs, and the scale-correct shape:
    * the threshold frame is |languages| rows and broadcasts back over
    * the scan, so no per-language total sort of the corpus is needed.
    * At 100 TB the exact `percentile` becomes `approx_percentile`
    * (mergeable sketch) with identical downstream semantics. Docs at or
    * below t_lo are head, at or below t_hi middle, else tail — boundary
    * compares are on bit-identical doubles (rounded scores, shared
    * interpolation arithmetic).
    */
  def ccnetBucket(spark: SparkSession, dir: String): DataFrame = {
    val ppl = TextAnalysis.perplexity(spark, dir)
      .select(col("doc_id"), col("cross_entropy"))
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(ppl, "doc_id")
    val th = scored.groupBy(col("lang")).agg(
      expr("percentile(cross_entropy, 0.333333)").as("t_lo"),
      expr("percentile(cross_entropy, 0.666667)").as("t_hi"))
    scored.join(broadcast(th), "lang")
      .select(col("doc_id"), col("lang"), col("cross_entropy"),
        when(col("cross_entropy") <= col("t_lo"), lit("head"))
          .when(col("cross_entropy") <= col("t_hi"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  val ccnetBucketSql: String = {
    val ppl = TextAnalysis.perplexitySql
    s"""WITH ppl AS ($ppl),
       |scored AS (
       |  SELECT d.doc_id, d.lang, p.cross_entropy
       |  FROM documents d JOIN ppl p ON p.doc_id = d.doc_id),
       |th AS (
       |  SELECT lang,
       |         quantile_cont(cross_entropy, 0.333333) AS t_lo,
       |         quantile_cont(cross_entropy, 0.666667) AS t_hi
       |  FROM scored GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.cross_entropy,
       |       CASE WHEN s.cross_entropy <= th.t_lo THEN 'head'
       |            WHEN s.cross_entropy <= th.t_hi THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM scored s JOIN th USING (lang)""".stripMargin
  }

  // ------------------------------------------------ Gopher rule filter

  /** Gopher rule thresholds (Rae et al. 2021, table A1 — the published
    * web-corpus repetition-free quality gate every large pretraining
    * pipeline replicates). Values are the paper's; the stop list keeps
    * the paper's function-word INTENT on this fixture's vocabulary
    * (which contains `the`/`a` but not `be`/`that`/`have`/`with`). */
  private val GopherMinWords = 50L
  private val GopherMaxWords = 100000L
  private val GopherMinMeanLen = 3.0
  private val GopherMaxMeanLen = 10.0
  private val GopherMaxSymbolRatio = 0.1
  private val GopherMaxBulletFrac = 0.9
  private val GopherMaxEllipsisFrac = 0.3
  private val GopherMinAlphaFrac = 0.8
  // single source of truth shared with the native GopherStats
  // expression, so the chain and the byte-pass cannot drift
  private val GopherStops: Seq[String] =
    org.apache.spark.sql.graft.GopherStats.Stops
  private val GopherMinStopHits = 2

  /** Frame-in/frame-out Gopher metric core over any (doc_id, text)
    * frame: every rule's measured value, its pass flag, and the overall
    * keep conjunction. All metrics are exact integer counts divided
    * once at the boundary (round 6, DOUBLE), so both engines agree
    * bit-for-bit: word/line splits are the same regex in Java and
    * DuckDB's RE2 (`[ \n]+` has identical semantics), per-word length
    * sums are integer list folds, and symbol counts come from
    * length-difference arithmetic after literal `replace` (both engines
    * replace non-overlapping left-to-right).
    *
    * Scale shape: one codegen'd projection over the scan — no shuffle,
    * no explode; the word array lives only inside its own row's
    * expressions. The 100 TB plan is the sf0.01 plan.
    */
  def gopherMetrics(df: DataFrame): DataFrame = {
    val words = split(col("text"), "[ \n]+")
    val lines = split(col("text"), "\n")
    val nWords = size(words).cast("long")
    val wordChars = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val alphaWords = size(filter(words, w => w.rlike("^[a-z]+$"))).cast("long")
    val hashCount =
      (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
        .cast("long")
    val ellipsisCount =
      ((length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^[-*•]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast("long")
    val nLines = size(lines).cast("long")
    val padded = concat(lit(" "),
      regexp_replace(col("text"), "\n", " "), lit(" "))
    val stopHits = GopherStops.map(s =>
      when(padded.contains(s" $s "), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val meanLen = round(wordChars.cast("double") / nWords, 6)
    val alphaFrac = round(alphaWords.cast("double") / nWords, 6)
    val symbolRatio =
      round((hashCount + ellipsisCount).cast("double") / nWords, 6)
    val bulletFrac = round(bulletLines.cast("double") / nLines, 6)
    val ellipsisFrac = round(ellipsisLines.cast("double") / nLines, 6)
    val passWords = nWords >= GopherMinWords && nWords <= GopherMaxWords
    val passMeanLen =
      meanLen >= GopherMinMeanLen && meanLen <= GopherMaxMeanLen
    val passStops = stopHits >= GopherMinStopHits
    val passAlpha = alphaFrac >= GopherMinAlphaFrac
    val passSymbols = symbolRatio <= GopherMaxSymbolRatio
    val passBullets = bulletFrac <= GopherMaxBulletFrac
    val passEllipsis = ellipsisFrac <= GopherMaxEllipsisFrac
    df.select(col("doc_id"), nWords.as("n_words"),
      meanLen.as("mean_word_len"), stopHits.as("stop_hits"),
      alphaFrac.as("alpha_frac"), symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"),
      passWords.as("pass_words"), passMeanLen.as("pass_mean_len"),
      passStops.as("pass_stops"), passAlpha.as("pass_alpha"),
      passSymbols.as("pass_symbols"), passBullets.as("pass_bullets"),
      passEllipsis.as("pass_ellipsis"),
      (passWords && passMeanLen && passStops && passAlpha &&
        passSymbols && passBullets && passEllipsis).as("keep"))
  }

  def gopherFilter(spark: SparkSession, dir: String): DataFrame =
    gopherMetrics(Tables(spark, dir, "documents"))

  /** The serving-path twin of [[gopherMetrics]]: identical columns and
    * values from the native `GopherStats` byte-pass expression instead
    * of the three per-row arrays the chain allocates (regex word
    * split, line split, element lambdas). Equality is pinned
    * Spark-vs-Spark on planted edge cases in `CurationSpec` AND
    * corpus-wide by the ORACLED `_check` twin, which runs THIS path
    * against the chain's DuckDB SQL at the driver gate.
    */
  def gopherMetricsFast(df: DataFrame): DataFrame = {
    val raw = df.select(col("doc_id"),
      org.apache.spark.sql.graft.GopherStats(col("text")).as("g"))
      .select(col("doc_id"),
        element_at(col("g"), 1).as("n_words"),
        element_at(col("g"), 2).as("wc"),
        element_at(col("g"), 3).as("aw"),
        element_at(col("g"), 4).as("hashes"),
        element_at(col("g"), 5).as("ellipses"),
        element_at(col("g"), 6).as("nl"),
        element_at(col("g"), 7).as("bl"),
        element_at(col("g"), 8).as("el"),
        element_at(col("g"), 9).as("stop_hits"))
    val m = raw.select(col("doc_id"), col("n_words"),
      round(col("wc").cast("double") / col("n_words").cast("double"), 6)
        .as("mean_word_len"),
      col("stop_hits"),
      round(col("aw").cast("double") / col("n_words").cast("double"), 6)
        .as("alpha_frac"),
      round((col("hashes") + col("ellipses")).cast("double") /
        col("n_words").cast("double"), 6).as("symbol_ratio"),
      round(col("bl").cast("double") / col("nl").cast("double"), 6)
        .as("bullet_frac"),
      round(col("el").cast("double") / col("nl").cast("double"), 6)
        .as("ellipsis_frac"))
    m.select(col("doc_id"), col("n_words"), col("mean_word_len"),
      col("stop_hits"), col("alpha_frac"), col("symbol_ratio"),
      col("bullet_frac"), col("ellipsis_frac"),
      (col("n_words") >= GopherMinWords &&
        col("n_words") <= GopherMaxWords).as("pass_words"),
      (col("mean_word_len") >= GopherMinMeanLen &&
        col("mean_word_len") <= GopherMaxMeanLen).as("pass_mean_len"),
      (col("stop_hits") >= GopherMinStopHits).as("pass_stops"),
      (col("alpha_frac") >= GopherMinAlphaFrac).as("pass_alpha"),
      (col("symbol_ratio") <= GopherMaxSymbolRatio).as("pass_symbols"),
      (col("bullet_frac") <= GopherMaxBulletFrac).as("pass_bullets"),
      (col("ellipsis_frac") <= GopherMaxEllipsisFrac).as("pass_ellipsis"),
      (col("n_words") >= GopherMinWords &&
        col("n_words") <= GopherMaxWords &&
        col("mean_word_len") >= GopherMinMeanLen &&
        col("mean_word_len") <= GopherMaxMeanLen &&
        col("stop_hits") >= GopherMinStopHits &&
        col("alpha_frac") >= GopherMinAlphaFrac &&
        col("symbol_ratio") <= GopherMaxSymbolRatio &&
        col("bullet_frac") <= GopherMaxBulletFrac &&
        col("ellipsis_frac") <= GopherMaxEllipsisFrac).as("keep"))
  }

  def gopherFilterFast(spark: SparkSession, dir: String): DataFrame =
    gopherMetricsFast(Tables(spark, dir, "documents"))

  val gopherFilterSql: String = {
    val stops = GopherStops
      .map(s => s"CASE WHEN padded LIKE '% $s %' THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |         string_split_regex(text, '[ \n]+') AS words,
       |         string_split(text, chr(10)) AS lines,
       |         ' ' || replace(text, chr(10), ' ') || ' ' AS padded,
       |         length(text) AS nc,
       |         length(replace(text, '#', '')) AS nc_nohash,
       |         length(replace(text, '...', '')) AS nc_nodots
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         CAST(len(words) AS BIGINT) AS n_words,
       |         CAST(list_sum(list_transform(words, w -> length(w)))
       |              AS BIGINT) AS word_chars,
       |         CAST(len(list_filter(words,
       |                w -> regexp_full_match(w, '[a-z]+'))) AS BIGINT)
       |           AS alpha_words,
       |         CAST(nc - nc_nohash AS BIGINT) +
       |           CAST((nc - nc_nodots) / 3 AS BIGINT) AS symbols,
       |         CAST(len(list_filter(lines,
       |                l -> regexp_matches(l, '^[-*•]'))) AS BIGINT)
       |           AS bullet_lines,
       |         CAST(len(list_filter(lines,
       |                l -> regexp_matches(l, '\\.\\.\\.$$'))) AS BIGINT)
       |           AS ellipsis_lines,
       |         CAST(len(lines) AS BIGINT) AS n_lines,
       |         CAST($stops AS BIGINT) AS stop_hits
       |  FROM m
       |), v AS (
       |  SELECT doc_id, n_words, stop_hits,
       |         round(CAST(word_chars AS DOUBLE) / n_words, 6)
       |           AS mean_word_len,
       |         round(CAST(alpha_words AS DOUBLE) / n_words, 6)
       |           AS alpha_frac,
       |         round(CAST(symbols AS DOUBLE) / n_words, 6)
       |           AS symbol_ratio,
       |         round(CAST(bullet_lines AS DOUBLE) / n_lines, 6)
       |           AS bullet_frac,
       |         round(CAST(ellipsis_lines AS DOUBLE) / n_lines, 6)
       |           AS ellipsis_frac
       |  FROM c
       |)
       |SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac,
       |       symbol_ratio, bullet_frac, ellipsis_frac,
       |       n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
       |         AS pass_words,
       |       mean_word_len >= $GopherMinMeanLen AND
       |         mean_word_len <= $GopherMaxMeanLen AS pass_mean_len,
       |       stop_hits >= $GopherMinStopHits AS pass_stops,
       |       alpha_frac >= $GopherMinAlphaFrac AS pass_alpha,
       |       symbol_ratio <= $GopherMaxSymbolRatio AS pass_symbols,
       |       bullet_frac <= $GopherMaxBulletFrac AS pass_bullets,
       |       ellipsis_frac <= $GopherMaxEllipsisFrac AS pass_ellipsis,
       |       (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords)
       |         AND (mean_word_len >= $GopherMinMeanLen AND
       |              mean_word_len <= $GopherMaxMeanLen)
       |         AND stop_hits >= $GopherMinStopHits
       |         AND alpha_frac >= $GopherMinAlphaFrac
       |         AND symbol_ratio <= $GopherMaxSymbolRatio
       |         AND bullet_frac <= $GopherMaxBulletFrac
       |         AND ellipsis_frac <= $GopherMaxEllipsisFrac AS keep
       |FROM v""".stripMargin
  }

  // ------------------------------------------------ pipeline yield

  /** End-to-end curation funnel — the yield table every data team
    * tracks: document and token mass surviving each cumulative stage
    * of the standard web pipeline (raw → domain blocklist → Gopher
    * rules → exact dedup), each stage COMPOSED from this engine's own
    * operators (`Domains.domainFilter`, `gopherMetricsFast` — the
    * oracle-proven byte-pass — and `Dedup.keepBest`). The fractions
    * answer "where does my corpus go", and a stage whose yield moves
    * round-over-round is the regression alarm.
    *
    * Scale shape: stage membership is three id-frames (projection-only
    * or window-on-md5) semi-joined against the token spine; the
    * aggregates are map-side-combined counts; 4-row output with
    * window fractions on that tiny frame.
    */
  def pipelineReport(spark: SparkSession, dir: String): DataFrame = {
    val d0 = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val s1 = Domains.domainFilter(spark, dir).select(col("doc_id"))
    val s2 = gopherMetricsFast(Tables(spark, dir, "documents"))
      .where(col("keep")).select(col("doc_id"))
    val s3 = Dedup.keepBest(spark, dir).select(col("doc_id"))
    def stageAgg(df: DataFrame, stage: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))
    val c1 = d0.join(s1, "doc_id")
    val c2 = c1.join(s2, "doc_id")
    val c3 = c2.join(s3, "doc_id")
    val stages = stageAgg(d0, 0, "raw")
      .unionAll(stageAgg(c1, 1, "domain_filter"))
      .unionAll(stageAgg(c2, 2, "gopher_rules"))
      .unionAll(stageAgg(c3, 3, "exact_dedup"))
    val w = Window.partitionBy()
    val rawDocs = max(when(col("stage") === 0, col("n_docs"))).over(w)
    val rawToks = max(when(col("stage") === 0, col("n_tokens"))).over(w)
    stages.select(col("stage"), col("stage_name"), col("n_docs"),
      col("n_tokens"),
      round(col("n_docs").cast("double") / rawDocs.cast("double"), 6)
        .as("docs_frac"),
      round(col("n_tokens").cast("double") / rawToks.cast("double"), 6)
        .as("tokens_frac"))
  }

  val pipelineReportSql: String =
    s"""WITH d0 AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents
       |), s1 AS (
       |  SELECT doc_id FROM (
       |${Domains.domainFilterSql}
       |  )
       |), s2 AS (
       |  SELECT doc_id FROM (
       |${gopherFilterSql}
       |  ) WHERE keep
       |), s3 AS (
       |  SELECT doc_id FROM (
       |${graft.operators.Dedup.keepBestSql}
       |  )
       |), stages AS (
       |  SELECT 0 AS stage, 'raw' AS stage_name,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(toks) AS BIGINT) AS n_tokens FROM d0
       |  UNION ALL
       |  SELECT 1, 'domain_filter', CAST(count(*) AS BIGINT),
       |         CAST(sum(toks) AS BIGINT)
       |  FROM d0 JOIN s1 USING (doc_id)
       |  UNION ALL
       |  SELECT 2, 'gopher_rules', CAST(count(*) AS BIGINT),
       |         CAST(sum(toks) AS BIGINT)
       |  FROM d0 JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
       |  UNION ALL
       |  SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT),
       |         CAST(sum(toks) AS BIGINT)
       |  FROM d0 JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
       |          JOIN s3 USING (doc_id)
       |)
       |SELECT stage, stage_name, n_docs, n_tokens,
       |       round(CAST(n_docs AS DOUBLE) /
       |             CAST(max(CASE WHEN stage = 0 THEN n_docs END) OVER ()
       |                  AS DOUBLE), 6) AS docs_frac,
       |       round(CAST(n_tokens AS DOUBLE) /
       |             CAST(max(CASE WHEN stage = 0 THEN n_tokens END) OVER ()
       |                  AS DOUBLE), 6) AS tokens_frac
       |FROM stages""".stripMargin

  // ------------------------------------------------ curate_k_anonymity

  private val KAnonK = 5L

  /** k-ANONYMITY audit over a quasi-identifier tuple — the privacy/
    * compliance gate a training-data pipeline runs before structured
    * records (user tables, metadata sidecars) enter a corpus: a row is
    * re-identifiable when its quasi-identifier combination is shared by
    * fewer than k rows, so the audit reports every equivalence class
    * with its population, the under-k flag, and the corpus-wide share
    * of at-risk ROWS (the number a release decision reads). Quasi-
    * identifiers here: (nation, market segment, account-balance
    * band) — the classic "harmless individually, identifying jointly"
    * shape; the band is exact integer floor(acctbal/1000), identical
    * IEEE arithmetic on both engines.
    *
    * Scale: one map-side-combined groupBy on the quasi tuple; the
    * share rides a window over the |classes| frame (bounded by the
    * attribute cross-product, never corpus-sized). Suppression/
    * generalization would consume exactly this frame.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("acctbal_band"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.partitionBy()
    g.select(col("c_nationkey"), col("c_mktsegment"), col("acctbal_band"),
      col("n_rows"), (col("n_rows") < KAnonK).as("at_risk"),
      round(sum(when(col("n_rows") < KAnonK, col("n_rows")).otherwise(0L))
          .over(w).cast("double") /
        sum(col("n_rows")).over(w).cast("double"), 6).as("risk_row_share"))
  }

  val kAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
       |         count(*) AS n_rows
       |  FROM customer GROUP BY 1, 2, 3
       |)
       |SELECT c_nationkey, c_mktsegment, acctbal_band,
       |       CAST(n_rows AS BIGINT) AS n_rows,
       |       n_rows < $KAnonK AS at_risk,
       |       round(CAST(sum(CASE WHEN n_rows < $KAnonK THEN n_rows
       |                           ELSE 0 END) OVER () AS DOUBLE) /
       |             CAST(sum(n_rows) OVER () AS DOUBLE), 6)
       |         AS risk_row_share
       |FROM g""".stripMargin

  /** Differentially-private released histogram over (lang, source) —
    * the privacy-preserving corpus-composition report a pipeline can
    * publish without exposing exact slice counts. Noise is the TRUE
    * two-sided geometric mechanism (Ghosh–Roughgarden–Sundararajan's
    * geometric mechanism at α = 1/2, i.e. ε = ln 2 at unit
    * sensitivity: P(Z = k) = (1/3)·2^−|k|), constructed EXACTLY as the
    * difference of two iid geometric(1/2) draws — Z = X − Y with
    * P(X = k) = 2^−(k+1) is the standard difference representation of
    * the two-sided geometric, and each geometric is the leading-zero
    * count of an independent 24-bit uniform word. (A sign·magnitude
    * construction with P(mag = 0) = 1/2 double-weights zero and only
    * provides ε = 2·ln 2 — the adjacent-output likelihood ratio at the
    * origin is 4; the difference form has ratio exactly 2 everywhere.)
    * Each geometric truncates at 24 (P = 2^−24 per draw), so formally
    * the guarantee is (ln 2, δ)-DP with δ ≤ 2^−23 ≈ 1.2e-7.
    * The two words are disjoint 24-bit substrings of the house md5
    * convention on the group key, making the mechanism a deterministic
    * function of the key — hash-exact across engines (both sides
    * derive the SAME bits from the SAME md5), pure integer end-to-end,
    * with none of the inverse-CDF `ln` that makes float Laplace noise
    * an oracle hazard. In production the salt below rotates per
    * release; a pinned salt here is what makes the op testable.
    * `n_true` is emitted for audit parity only — a real release drops
    * it.
    *
    * Scale shape: one map-side-combined groupBy to ≤ |langs|·|sources|
    * rows; noise is a projection on the reduced frame. Nothing
    * corpus-sized survives the aggregation.
    */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val key = concat(lit("dp1:"), col("lang"), lit(":"), col("source"))
    // leading-zero count of a 24-bit draw: geometric(1/2) from 0
    def mag(hv: Column): Column = {
      var c = when(hv >= (1L << 23), 0L)
      for (k <- 1 to 23) c = c.when(hv >= (1L << (23 - k)), k.toLong)
      c.otherwise(24L)
    }
    val hvA = conv(substring(md5(key), 1, 6), 16, 10).cast("long")
    val hvB = conv(substring(md5(key), 7, 6), 16, 10).cast("long")
    val noise = mag(hvA) - mag(hvB)
    Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_true"))
      .select(col("lang"), col("source"), col("n_true"),
        noise.as("noise"),
        (col("n_true") + noise).as("n_noisy"),
        greatest(lit(0L), col("n_true") + noise).as("n_released"))
  }

  lazy val dpCountsSql: String = {
    def magCase(hv: String): String = {
      val whens = (s"WHEN $hv >= ${1L << 23} THEN 0" +:
        (1 to 23).map(k => s"WHEN $hv >= ${1L << (23 - k)} THEN $k"))
        .mkString("\n           ")
      s"(CASE $whens\n           ELSE 24 END)"
    }
    s"""WITH g AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_true
       |  FROM documents GROUP BY 1, 2
       |), h AS (
       |  SELECT lang, source, n_true,
       |         CAST(('0x' || substr(md5('dp1:' || lang || ':' || source),
       |                              1, 6)) AS BIGINT) AS hva,
       |         CAST(('0x' || substr(md5('dp1:' || lang || ':' || source),
       |                              7, 6)) AS BIGINT) AS hvb
       |  FROM g
       |), n AS (
       |  SELECT lang, source, n_true,
       |         CAST(${magCase("hva")} - ${magCase("hvb")}
       |           AS BIGINT) AS noise
       |  FROM h
       |)
       |SELECT lang, source, n_true, noise,
       |       n_true + noise AS n_noisy,
       |       greatest(CAST(0 AS BIGINT), n_true + noise) AS n_released
       |FROM n""".stripMargin
  }

  /** Differentially-private mean doc length per lang — the composed
    * form every DP release of an average uses: noise the CLAMPED sum
    * and the count separately (each via the [[dpCounts]] geometric
    * mechanism; the sum's noise scales by the clamp bound C, its
    * sensitivity), release their ratio. Clamping to [0, C] is what
    * BOUNDS the sensitivity — without it one outlier document could
    * shift the sum arbitrarily and no finite noise would hide it.
    * Everything stays exact integer until the final division of two
    * released BIGINTs (one double division — bit-identical
    * cross-engine); a fully-noised-away slice (released count 0)
    * degrades to a NULL mean, never a division error.
    */
  def dpMean(spark: SparkSession, dir: String): DataFrame = {
    val C = 200L // clamp bound: tokens of n_chars-scale docs
    // two-sided geometric per [[dpCounts]]: difference of two iid
    // geometric(1/2) leading-zero draws from disjoint md5 substrings
    def draw(salt: String): Column = {
      val key = concat(lit(s"$salt:"), col("lang"))
      def mag(hv: Column): Column = {
        var c = when(hv >= (1L << 23), 0L)
        for (k <- 1 to 23) c = c.when(hv >= (1L << (23 - k)), k.toLong)
        c.otherwise(24L)
      }
      mag(conv(substring(md5(key), 1, 6), 16, 10).cast("long")) -
        mag(conv(substring(md5(key), 7, 6), 16, 10).cast("long"))
    }
    val zN = draw("dpm_n")
    val zS = draw("dpm_s")
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_true"),
        sum(least(greatest(col("n_chars"), lit(0L)), lit(C))).as("sum_true"))
      .select(col("lang"), col("n_true"), col("sum_true"),
        greatest(lit(0L), col("n_true") + zN).as("n_released"),
        greatest(lit(0L), col("sum_true") + zS * lit(C))
          .as("sum_released"))
      .withColumn("mean_released",
        when(col("n_released") > 0,
          col("sum_released").cast("double") / col("n_released").cast("double")))
  }

  lazy val dpMeanSql: String = {
    val C = 200L
    def magSql(hv: String): String = {
      val whens = (s"WHEN $hv >= ${1L << 23} THEN 0" +:
        (1 to 23).map(k => s"WHEN $hv >= ${1L << (23 - k)} THEN $k"))
        .mkString("\n             ")
      s"(CASE $whens\n             ELSE 24 END)"
    }
    def hv(salt: String, from: Int) =
      s"CAST(('0x' || substr(md5('$salt:' || lang), $from, 6)) AS BIGINT)"
    def z(salt: String) =
      s"(${magSql(hv(salt, 1))} - ${magSql(hv(salt, 7))})"
    s"""WITH g AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_true,
       |         CAST(sum(least(greatest(n_chars, 0), $C)) AS BIGINT) AS sum_true
       |  FROM documents GROUP BY 1
       |), r AS (
       |  SELECT lang, n_true, sum_true,
       |         greatest(CAST(0 AS BIGINT),
       |           n_true + ${z("dpm_n")})
       |           AS n_released,
       |         greatest(CAST(0 AS BIGINT),
       |           sum_true + ${z("dpm_s")} * $C)
       |           AS sum_released
       |  FROM g
       |)
       |SELECT lang, n_true, sum_true, n_released, sum_released,
       |       CASE WHEN n_released > 0
       |            THEN CAST(sum_released AS DOUBLE) / CAST(n_released AS DOUBLE)
       |            END AS mean_released
       |FROM r""".stripMargin
  }

  private val SeqLenGrid = Seq(128L, 256L, 512L, 1024L)

  /** Sequence-length planning — the sizing decision every training run
    * makes BEFORE packing: for each candidate max_len, what fraction
    * of tokens does truncation lose, what would per-document padding
    * waste (the unpacked baseline the packer's win is measured
    * against), and the greedy packer's sequence-count lower bound
    * ⌈kept/L⌉. Longer max_len loses less to truncation but pads more
    * unpacked and costs quadratic attention — this table is the
    * engine-side evidence for that trade. One corpus scan reduces to a
    * token count per doc; the 4-row length grid explodes against the
    * REDUCED frame and everything aggregates as exact integers
    * (map-side combine), shares as rounded doubles of integer ratios.
    */
  def seqlenPlan(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(size(split(trim(col("text")), " ")).cast("long").as("n_tok"))
    val grid = SeqLenGrid.map(lit)
    toks.select(col("n_tok"), explode(array(grid: _*)).as("max_len"))
      .groupBy(col("max_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("n_tok") > col("max_len"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum(least(col("n_tok"), col("max_len"))).as("kept_tokens"),
        sum(greatest(col("n_tok") - col("max_len"), lit(0L)))
          .as("lost_tokens"),
        sum(greatest(col("max_len") - col("n_tok"), lit(0L)))
          .as("pad_tokens_unpacked"))
      .select(col("max_len"), col("n_docs"), col("total_tokens"),
        col("n_truncated"), col("kept_tokens"), col("lost_tokens"),
        col("pad_tokens_unpacked"),
        round(col("lost_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("loss_share"),
        round(col("pad_tokens_unpacked").cast("double") /
          (col("kept_tokens") + col("pad_tokens_unpacked")).cast("double"),
          6).as("pad_share_unpacked"),
        expr("CAST((kept_tokens + max_len - 1) DIV max_len AS BIGINT)")
          .as("n_seqs_packed_lb"))
  }

  lazy val seqlenPlanSql: String = {
    val grid = SeqLenGrid.mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
       |  FROM documents
       |), g AS (
       |  SELECT n_tok, CAST(unnest($grid) AS BIGINT) AS max_len FROM toks
       |), a AS (
       |  SELECT max_len, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |         CAST(sum(CASE WHEN n_tok > max_len THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_truncated,
       |         CAST(sum(least(n_tok, max_len)) AS BIGINT) AS kept_tokens,
       |         CAST(sum(greatest(n_tok - max_len, 0)) AS BIGINT)
       |           AS lost_tokens,
       |         CAST(sum(greatest(max_len - n_tok, 0)) AS BIGINT)
       |           AS pad_tokens_unpacked
       |  FROM g GROUP BY max_len
       |)
       |SELECT max_len, n_docs, total_tokens, n_truncated, kept_tokens,
       |       lost_tokens, pad_tokens_unpacked,
       |       round(CAST(lost_tokens AS DOUBLE) /
       |             CAST(total_tokens AS DOUBLE), 6) AS loss_share,
       |       round(CAST(pad_tokens_unpacked AS DOUBLE) /
       |             CAST(kept_tokens + pad_tokens_unpacked AS DOUBLE), 6)
       |         AS pad_share_unpacked,
       |       CAST((kept_tokens + max_len - 1) // max_len AS BIGINT)
       |         AS n_seqs_packed_lb
       |FROM a""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("curate_seqlen_plan", seqlenPlan _, Some(seqlenPlanSql)),
    Op("curate_dp_mean", dpMean _, Some(dpMeanSql)),
    Op("curate_dp_counts", dpCounts _, Some(dpCountsSql)),
    Op("curate_k_anonymity", kAnonymity _, Some(kAnonymitySql)),
    Op("curate_pipeline_report", pipelineReport _, Some(pipelineReportSql)),
    Op("curate_gopher_filter", gopherFilter _, Some(gopherFilterSql)),
    // fast Spark output vs the CHAIN's DuckDB oracle: driver-green
    // proves expression == chain corpus-wide (the HtmlClean pattern) --
    // the oracle rides the primary row directly (r11 verdict #6)
    Op("curate_gopher_filter_fast", gopherFilterFast _,
      Some(gopherFilterSql)),
    Op("curate_quality_lr", qualityLr _, Some(qualityLrSql)),
    Op("curate_lr_train", lrTrain _, Some(lrTrainSql)),
    Op("curate_quality_lr_trained", qualityLrTrained _,
      Some(qualityLrTrainedSql)),
    Op("curate_ccnet_bucket", ccnetBucket _, Some(ccnetBucketSql)),
    Op("curate_epoch_plan", epochPlan _, Some(epochPlanSql)),
    Op("curate_dsir", dsir _, Some(dsirSql)),
    Op("curate_dsir_hashed", dsirHashed _, None),
    Op("curate_dsir_hashed_check", dsirHashedCheck _,
      Some(dsirHashedCheckSql)),
    Op("curate_mixture_solver", mixtureSolver _, Some(mixtureSolverSql)),
    Op("curate_pack", pack _, Some(packSql)),
    Op("curate_curriculum", curriculum _, Some(curriculumSql)),
    Op("curate_contamination", contamination _, Some(contaminationSql)),
    Op("curate_quality_gate", qualityGate _, Some(qualityGateSql)),
    Op("curate_loss_band", lossBand _, Some(lossBandSql)),
    Op("curate_balanced_sample", balancedSample _, Some(balancedSampleSql)),
    Op("curate_balanced_sample_check", balancedSampleExact _,
      Some(balancedSampleExactSql)),
    Op("curate_mixture", mixture _, Some(mixtureSql)),
    Op("curate_temperature_sample", temperatureSample _,
      Some(temperatureSampleSql)),
    Op("curate_pps_sample", ppsSample _, Some(ppsSampleSql)),
    Op("curate_split", split3 _, Some(split3Sql)),
    Op("curate_split_groupaware", splitGroupAware _, Some(splitGroupAwareSql)),
  )
}
