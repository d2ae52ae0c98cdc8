package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}
import graft.functions.{ScoredId, TopKAgg, VectorFunctions => V}

/** Similarity search over the `embeddings` fixture
  * (`ArrayType(FloatType)`, dim 64) — north-star extension.
  *
  *  - brute-force top-k: the exact baseline. Queries are a small fixed
  *    set, broadcast against a linear scan of the corpus; per-query top-k
  *    via a bounded typed Aggregator (partial aggregation ⇒ each map task
  *    ships ≤ k rows per query to the shuffle — O(k) state, works
  *    unchanged on a 1000-executor corpus scan).
  *  - IVF: the scale path. Corpus is clustered to deterministic
  *    centroids; a query probes only its nprobe nearest cells, cutting
  *    scanned vectors by ~|cells|/nprobe at some recall cost (measured in
  *    the test suite against the brute-force baseline).
  *  - embedding near-dedup: all pairs above a cosine threshold.
  *
  * Cosine is computed with codegen'd higher-order functions in double
  * precision with sequential accumulation — bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))` formulation.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

  /** Exact top-k neighbors by cosine for queries vec_id < NumQueries. */
  def topkBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val topk = udaf(new TopKAgg(K))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosine(col("q_emb"), col("embedding")).as("cos"))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  /** The oracle's double-precision cosine between two list columns. */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
       |         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       | / sqrt(list_sum(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
       |      * list_sum(list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))""".stripMargin

  val topkBruteForceSql: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |         ${duckCos("q.embedding", "x.embedding")} AS cos
       |  FROM embeddings q, embeddings x
       |  WHERE q.vec_id < $NumQueries AND x.vec_id != q.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin

  /** Embedding-space near-dedup: ALL pairs with cosine ≥ τ, exactly.
    *
    * τ = 0.45 on this fixture (max pairwise cosine ≈ 0.51 — random-ish
    * vectors have no tight duplicates, so the threshold sits where the
    * operator has observable output). That regime makes the exactness
    * contract inherently Θ(n²) compute: a pair AT the threshold agrees
    * with a random hyperplane with p = 1 − θ/π ≈ 0.65, barely above the
    * background 0.5, so no banding scheme can prune without missing
    * true pairs — measured: 96×8-bit sign-LSH bands pruned only ~3× yet
    * still missed 7 of 144 true pairs at sf0.1 ((1−p⁸)⁹⁶ ≈ 4.7% per
    * threshold pair). Production near-dedup at τ ≥ 0.8 belongs on the
    * hyperplane-LSH path (`topkLsh` machinery: p⁸ ≈ 0.21 ⇒ ~1e-4 miss
    * at ~30× pruning); an EXACT low-τ threshold join has no sub-
    * quadratic algorithm for dense vectors.
    *
    * What scale CAN fix is the join's shape: this is a blocked
    * theta-join (the classic 1-Bucket-Theta layout), never a nested
    * loop. Each vector is hashed to one of B blocks; the tiny
    * B(B+1)/2 block-pair table is broadcast; BOTH sides replicate
    * through it, so the pair-forming join keys on the COMPOSITE
    * (block_a, block_b) — key cardinality B(B+1)/2, one uniformly
    * loaded task of (n/B)² comparisons per block pair. (Keying on a
    * single block column would collapse the layout to B skewed
    * partitions and cap cluster parallelism at B.) Communication is
    * O(n·B) — each row replicated ≤ B ways, ~(B+1)/2 on average — and
    * B is the dial that spreads the quadratic compute across a
    * cluster: raising B buys quadratic task fan-out for linear
    * replication. At 1000 executors you raise B, not the algorithm.
    */
  private val PairBlocks = 8

  /** `embeddingNearDup` is the EXACTNESS/AUDIT TWIN, quadratic by
    * contract (r5 verdict, "What's wrong" #1): the production paths for
    * near-dup at scale are `dedup_minhash_lsh` (text) and the
    * `sim_topk_lsh`/`sim_topk_ivf` family (vectors). This guard makes a
    * misuse fail loudly BEFORE launching Θ(n²) work: past MaxExactPairRows
    * input vectors (override with `spark.graft.maxExactPairRows`) the
    * all-pairs contract is hours of compute, not an audit, and the right
    * answer is an error naming the scalable alternative. The count() that
    * enforces it is one narrow scan of a 2-column projection — noise next
    * to the quadratic stage it gates.
    */
  private[graft] val MaxExactPairRows = 100000L

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val B = PairBlocks
    val e = emb(spark, dir)
    val bound = spark.conf.getOption("spark.graft.maxExactPairRows")
      .map(_.toLong).getOrElse(MaxExactPairRows)
    val n = e.count()
    require(n <= bound,
      s"dedup_embedding_cosine is exact all-pairs (Θ(n²)) by contract and " +
        s"refuses $n input vectors (bound $bound; raise " +
        s"spark.graft.maxExactPairRows only for a deliberate audit). For " +
        s"near-dup at this scale use dedup_minhash_lsh / sim_topk_lsh / " +
        s"sim_topk_ivf instead.")
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      pmod(xxhash64(col("vec_id")), lit(B.toLong)).as("block_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      pmod(xxhash64(col("vec_id")), lit(B.toLong)).as("block_b"))
    // Ordered block pairs (i ≤ j): every unordered vector pair lands in
    // exactly one — cross-block pairs via their (min-block, max-block)
    // task, same-block pairs deduplicated by the vec_a < vec_b filter.
    // A local literal (B(B+1)/2 rows), not a join.
    val blockPairs = {
      import spark.implicits._
      (for { i <- 0 until B; j <- i until B } yield (i.toLong, j.toLong))
        .toDF("block_a", "block_b")
    }
    a.join(broadcast(blockPairs), "block_a")
      .join(b.join(broadcast(blockPairs), "block_b"), Seq("block_a", "block_b"))
      .where(col("block_a") =!= col("block_b") || col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        V.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= 0.45)
      // cosine is symmetric; emit ids in canonical order.
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"),
        round(col("cos"), 6).as("cos"))
  }

  val embeddingNearDupSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND ${duckCos("a.embedding", "b.embedding")} >= 0.45""".stripMargin

  /** IVF approximate top-k: NLIST centroids seeded from the lowest
    * vec_ids then refined with `lloydRounds` Lloyd steps (assign every
    * vector to its nearest centroid, recompute each cell's mean — the
    * standard k-means update, and the difference between a sample and a
    * trained codebook); vectors are assigned to the trained centroids
    * once, and a query scans only its NPROBE nearest cells. Every stage
    * is a DataFrame aggregation, so training parallelizes like any
    * other scan. Not SQL-oracled as a set (approximate by design);
    * recall@10 vs the brute-force baseline is gated in the test suite,
    * and `sim_topk_ivf_check` oracles the returned values themselves.
    */
  private val NList = 16
  private val NProbe = 4
  /** Served-index training depth. 2, not 1: the Lloyd sweep spec
    * (DedupSimilaritySpec "Lloyd sweep at sf0.01") measures recall@10
    * ≥ 0.8 from 2 rounds up, and the served gate below holds the same
    * 0.8 floor — the index must train at least to the depth its own
    * evidence says the bar needs. */
  private val LloydRounds = 2

  /** Assign each corpus vector to its nearest centroid (argmax cosine):
    * one broadcast-join scan + a k=1 bounded aggregation. The group key
    * is the id alone — the embedding rides in a `first` buffer instead
    * of being hashed/compared as part of the key (one long key vs a
    * 64-float array key for every one of the NLIST candidate rows).
    */
  private def assignCells(e: DataFrame, cent: DataFrame): DataFrame = {
    val maxCos = udaf(new TopKAgg(1))
    e.join(broadcast(cent), expr("true"))
      .select(col("vec_id"), col("embedding"),
        col("cent_id"), V.cosine(col("embedding"), col("cent_emb")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(maxCos(col("cent_id"), col("ccos")).as("c"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("c")(0)("id").as("cell"))
  }

  /** One Lloyd step: per-cell per-dimension mean, reassembled into
    * float vectors. Seed cells are never empty (each seed vector
    * assigns to itself at cosine 1), so all NLIST centroids survive.
    */
  private def lloydStep(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell").as("cent_id"),
        expr("transform(dm, x -> CAST(x.m AS FLOAT))").as("cent_emb"))

  /** The SERVED IVF index: codebook training and corpus assignment run
    * ONCE per corpus version and land as two store tables — `ivf_centroids`
    * (NLIST rows) and `ivf_cells` (the corpus with its cell key, written
    * LAST so it doubles as the index-complete marker). Every subsequent
    * search reads the stored tables: the query pays probe + scan of its
    * nprobe cells, never Lloyd training — the offline-index /
    * online-serve split every production ANN deployment has, same
    * content-addressed economics as the int8 path (`servedInt8`).
    */
  private[graft] def servedIvfIndex(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    // The namespace carries the training hyperparameters: the snapshot
    // key alone is corpus bytes, so a depth/geometry change must change
    // the address or a stale shallower index would keep being served.
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/embeddings.parquet",
      s"graft_ivf_n${NList}_r${LloydRounds}")
    if (!store.hasTableSnapshot("ivf_cells", ts)) {
      val e = emb(spark, dir)
      var cent = e.where(col("vec_id") < NList)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      for (_ <- 0 until LloydRounds)
        cent = lloydStep(assignCells(e, cent)).localCheckpoint()
      store.writeTableSnapshot(cent, "ivf_centroids", ts)
      store.writeTableSnapshot(assignCells(e, cent), "ivf_cells", ts)
    }
    (store.readTableSnapshot(spark, "ivf_centroids", ts)
        .select(col("cent_id"), col("cent_emb")),
      store.readTableSnapshot(spark, "ivf_cells", ts)
        .select(col("vec_id"), col("embedding"), col("cell")))
  }

  def topkIvf(spark: SparkSession, dir: String): DataFrame = {
    val (cent, assigned) = servedIvfIndex(spark, dir)
    val q = emb(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    ivfSearch(q, cent, assigned)
  }

  /** IVF with an explicit training depth: `lloydRounds` k-means update
    * rounds over the seeded codebook before the corpus is assigned.
    * Each round's tiny centroid frame is materialized (localCheckpoint)
    * so round r+1 starts from r's RESULT, not a replay of its plan —
    * training cost is rounds × (one broadcast-join scan + two aggs).
    * Trains inline (no store) — this is the SWEEP entry point the suite
    * uses to compare training depths; `topkIvf` serves the persisted
    * index.
    */
  def topkIvfTrained(spark: SparkSession, dir: String,
      lloydRounds: Int): DataFrame = {
    val e = emb(spark, dir)
    var cent = e.where(col("vec_id") < NList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    for (_ <- 0 until lloydRounds)
      cent = lloydStep(assignCells(e, cent)).localCheckpoint()
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    ivfSearch(q, cent, assignCells(e, cent))
  }

  /** Probe + search over a (trained or store-read) index: each query
    * ranks the NLIST centroids, searches its NPROBE nearest cells only.
    */
  private def ivfSearch(q: DataFrame, cent: DataFrame,
      assigned: DataFrame): DataFrame = ivfSearch(q, cent, assigned, NProbe)

  private def ivfSearch(q: DataFrame, cent: DataFrame,
      assigned: DataFrame, nprobe: Int): DataFrame = {
    val probeK = udaf(new TopKAgg(nprobe))
    val probes = q.join(broadcast(cent), expr("true"))
      .select(col("query_id"), col("q_emb"),
        col("cent_id"), V.cosine(col("q_emb"), col("cent_emb")).as("ccos"))
      .groupBy(col("query_id"), col("q_emb"))
      .agg(probeK(col("cent_id"), col("ccos")).as("p"))
      .select(col("query_id"), col("q_emb"),
        explode(expr("transform(p, x -> x.id)")).as("cell"))

    val topk = udaf(new TopKAgg(K))
    probes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  /** Random-hyperplane LSH ANN: sign-bit signatures over NBITS seeded
    * pseudo-random hyperplanes (components derived from xxhash64 —
    * deterministic, no stored model), bucketed by BITS_PER_BAND-bit
    * bands; a query scans only vectors sharing at least one band bucket.
    * The sign-agreement probability is 1 − θ/π per hyperplane, so
    * near-neighbors collide with high probability while the bucket join
    * keeps scanned candidates ~|matches|, not |corpus|. Rows-only
    * (approximate); recall vs brute force asserted in the suite.
    */
  private val NBits = 16
  private val BitsPerBand = 4 // 4 bands × 4 bits

  /** (vec_id, embedding, sig): bit j = sign(Σ_d v_d · h(j,d)), h =
    * centered 16-bit lattice noise from xxhash64(j·4096+d) — cheap,
    * seeded, identical for all rows. One primitive per-partition pass;
    * the earlier formulation ran 16 per-row `aggregate(zip_with(...))`
    * HOF reductions, the boxed-allocation pattern measured 30× slower
    * on the cosine path. Bit values are unchanged for the operator's
    * contract inputs (dim-64 arrays; same hash family, same sequential
    * accumulation) and null embeddings keep sig 0; arrays shorter than
    * 64 contribute zero terms for the missing dimensions.
    */
  /** One hyperplane coefficient h(j, d) — DRIVER-computable (plain
    * xxhash arithmetic), which is what lets `semanticDedup`'s oracle
    * embed the full hyperplane family as SQL literals and recompute
    * bit-identical signatures in DuckDB.
    */
  private[graft] def hyperplaneVal(j: Int, d: Int): Double =
    ((org.apache.spark.sql.catalyst.expressions.XXH64
      .hashInt(j * 4096 + d, 42L) & 65535L) - 32768L).toDouble

  private def hyperplaneSigs(e: DataFrame): DataFrame =
    hyperplaneSigsN(e, NBits)

  /** Signature pass parameterized by bit count (≤ 64): the top-k LSH
    * family uses NBits = 16; `semanticDedup` widens to 48 so its bands
    * can be 8 bits — bucket COUNT is what keeps banded candidate
    * volume subquadratic, and 16 buckets per band stops being a
    * partition long before 16-bucket bands stop being cheap.
    */
  private def hyperplaneSigsN(e: DataFrame, nb: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.as[(Long, scala.collection.Seq[Float])]
      .mapPartitions { it =>
        val h = Array.tabulate(nb * 64)(i => hyperplaneVal(i / 64, i % 64))
        it.map { case (vecId, embS) =>
          var sig = 0L
          if (embS != null) {
            val v = embS.toArray
            val dim = math.min(v.length, 64)
            var j = 0
            while (j < nb) {
              var dot = 0.0
              var d = 0
              val base = j * 64
              while (d < dim) { dot += v(d) * h(base + d); d += 1 }
              if (dot >= 0) sig |= 1L << j
              j += 1
            }
          }
          (vecId, embS, sig)
        }
      }
      .toDF("vec_id", "embedding", "sig")
  }

  /** STATIC full oracle for `sim_topk_lsh` — the hyperplane family is
    * xxhash-seeded (driver-computable, data-INDEPENDENT), so unlike
    * the Lloyd-trained IVF geometry it inlines at object init: the
    * `semanticDedup` literal-hyperplane move applied to the top-k
    * path. DuckDB recomputes every signature bit with the SAME
    * sequential d-order dot (list_sum left fold ≡ the while-loop
    * accumulation), rebuilds the band buckets, takes the DISTINCT
    * collision candidates, and ranks by exact cosine with the TopKAgg
    * tie order. Upgrades the op from rows-only to full hash parity;
    * the exactly-K `_check` twin stays registered.
    */
  lazy val topkLshSql: String = {
    def dot(j: Int) = {
      val lits = (0 until 64).map(d => hyperplaneVal(j, d))
        .mkString("[", ", ", "]")
      // coalesce: a zero-length (non-null) embedding makes list_sum
      // return NULL in DuckDB (sum over no rows) where the engine's
      // while-loop dot is 0.0 — pin both to 0.0 so every signature bit
      // agrees even on degenerate vectors.
      s"""coalesce(list_sum(list_transform(list_zip(embedding, $lits),
         |           x -> CAST(x[1] AS DOUBLE) * x[2])), 0.0)""".stripMargin
    }
    val sigExpr = (0 until NBits)
      .map(j => s"(CASE WHEN ${dot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n       + ")
    val bandList = (0 until NBits / BitsPerBand).mkString("[", ", ", "]")
    s"""WITH s AS (
       |  SELECT vec_id, embedding, CAST($sigExpr AS BIGINT) AS sig
       |  FROM embeddings
       |), bd AS (
       |  SELECT vec_id, band,
       |         (sig >> (band * $BitsPerBand)) &
       |           ${(1L << BitsPerBand) - 1} AS bucket
       |  FROM s CROSS JOIN (SELECT unnest($bandList) AS band)
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
       |  FROM bd q JOIN bd c ON q.band = c.band AND q.bucket = c.bucket
       |  WHERE q.vec_id < $NumQueries AND c.vec_id != q.vec_id
       |), scored AS (
       |  SELECT ca.query_id, ca.vec_id AS neighbor_id,
       |         ${duckCos("qe.embedding", "ce.embedding")} AS cos
       |  FROM cand ca JOIN embeddings qe ON qe.vec_id = ca.query_id
       |       JOIN embeddings ce ON ce.vec_id = ca.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC)
       |           AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |       round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin
  }

  def topkLsh(spark: SparkSession, dir: String): DataFrame = {
    // Persisted because four frames derive from it (query bands, corpus
    // bands, query embeddings, candidate embeddings); eagerly released
    // once the small top-k result is materialized — at corpus scale a
    // leaked signature cache would pin executor storage long after the
    // operator returned.
    val sigs = hyperplaneSigs(emb(spark, dir)).persist()
    try topkLshFrom(sigs).localCheckpoint()
    finally sigs.unpersist()
  }

  /** The un-materialized plan, factored out so the suite can pin plan
    * shape (id-only dedup exchange) before `localCheckpoint` replaces
    * it with a scan of the result.
    */
  private[graft] def topkLshPlan(spark: SparkSession, dir: String): DataFrame =
    topkLshFrom(hyperplaneSigs(emb(spark, dir)))

  private def topkLshFrom(sigs: DataFrame): DataFrame = {
    // Band frames carry ids only: the band-collision join and the
    // candidate dedup shuffle fixed-width longs, never the float
    // arrays (candidate volume at corpus scale dwarfs the query set,
    // and a distinct over embedding columns would ship every array
    // through the exchange).
    def bands(df: DataFrame) = {
      val bandCols = (0 until NBits / BitsPerBand).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * BitsPerBand)
            .bitwiseAND((1L << BitsPerBand) - 1).as("bucket"))
      }
      df.select(col("vec_id"), explode(array(bandCols: _*)).as("k"))
        .select(col("vec_id"),
          col("k.band").as("band"), col("k.bucket").as("bucket"))
    }
    val idSigs = sigs.select(col("vec_id"), col("sig"))
    val q = bands(idSigs.where(col("vec_id") < NumQueries))
      .withColumnRenamed("vec_id", "query_id")
    val candIds = q.join(bands(idSigs), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct() // a pair can share several bands
    // Re-attach vectors AFTER the dedup: corpus side by equi-join,
    // the NumQueries-row query side broadcast.
    val qEmb = sigs.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val topk = udaf(new TopKAgg(K))
    candIds
      .join(sigs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  /** Values-if-present oracle for the approximate top-k ops. The SET of
    * neighbors is engine-specific (xxhash64-seeded hyperplanes / trained
    * centroids — no DuckDB twin), but every returned row makes exact
    * claims an oracle CAN check: each query returns exactly K rows, and
    * each row's `cos` equals the true cosine of the (query, neighbor)
    * pair it names — verified by re-deriving the cosine from the raw
    * embeddings table, not from anything the operator carried along.
    * Aggregated per query to a deterministic row (n_results,
    * n_correct_cos), both K iff the operator's output is honest, which
    * a constant-valued DuckDB query states exactly.
    */
  private def topkValueCheck(result: DataFrame, e: DataFrame): DataFrame = {
    val nEmb = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"))
    val qEmb = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    result
      .join(nEmb, Seq("neighbor_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_results"),
        count(when(round(V.cosine(col("q_emb"), col("n_emb")), 6)
          === col("cos"), 1)).as("n_correct_cos"))
  }

  /** LSH twin of the value check: band collision carries NO structural
    * lower bound on a query's candidate pool — a query may collide with
    * fewer than K vectors, or none, on a sparse fixture — so pinning
    * exactly K rows would assert fixture density, not an operator
    * contract. The claims that ARE structural at any scale: every query
    * emits a check row (zero-candidate queries included via the left
    * join), at most K results each, and every emitted cosine exact
    * against the raw embeddings.
    */
  private def topkStructCheck(result: DataFrame, e: DataFrame): DataFrame = {
    val qEmb = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    qEmb.select(col("query_id"))
      .join(topkValueCheck(result, e), Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_results"), lit(0L)) <= K).as("n_le_k"),
        (coalesce(col("n_correct_cos"), lit(0L))
          === coalesce(col("n_results"), lit(0L))).as("all_cos_exact"))
  }

  def topkIvfCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkIvf(spark, dir), emb(spark, dir))

  def topkLshCheck(spark: SparkSession, dir: String): DataFrame =
    topkStructCheck(topkLsh(spark, dir), emb(spark, dir))

  /** Strict exactly-K oracle — IVF only. IVF's candidate pool is the
    * union of the query's NProbe probed cells, which partition the whole
    * corpus: expected pool ≈ corpus · NProbe / NList (≥ thousands of
    * vectors at sf ≥ 0.001 for NProbe=4, NList=16), so K full results
    * per query is a property of the algorithm's geometry at any fixture
    * this library ships, not a lucky density. LSH has no such bound and
    * uses the relaxed `topkLshCheckSql` instead.
    */
  val topkCheckSql: String =
    s"""SELECT vec_id AS query_id, CAST($K AS BIGINT) AS n_results,
       |       CAST($K AS BIGINT) AS n_correct_cos
       |FROM embeddings WHERE vec_id < $NumQueries""".stripMargin

  val topkLshCheckSql: String =
    s"""SELECT vec_id AS query_id, TRUE AS n_le_k, TRUE AS all_cos_exact
       |FROM embeddings WHERE vec_id < $NumQueries""".stripMargin

  /** Symmetric int8 quantization — the storage/serving compression step
    * for an embedding corpus (4× smaller than float32, dot products in
    * integer SIMD downstream). Per-vector scale = max|x|/127; elements
    * round half-up via floor(x/scale + 0.5), which both engines evaluate
    * identically in double precision (widening float32→double is exact,
    * and one divide + one add + floor are single correctly-rounded IEEE
    * ops — no accumulation order anywhere). Pure projection over the
    * scan: no shuffle, embarrassingly parallel at 100 TB. The quantized
    * vector itself plus its sum ride out as oracle-checked columns
    * (the vector rendered as a canonical CSV string — Spark parquet and
    * DuckDB arrow disagree on the list element FIELD NAME
    * (`element` vs `l`), which fails arrow-schema-identity compares even
    * when every value matches), and max_err_over_scale demonstrates the
    * ≤ scale/2 reconstruction contract. Zero vectors (scale 0) are
    * dropped explicitly — quantizing them is undefined and engines
    * disagree on inf casts.
    */
  /** (vec_id, embedding, scale, q): the shared quantization projection
    * under both the export query and the quantized search. */
  private def quantizedVectors(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        (expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))") / 127.0)
          .as("scale"))
      .where(col("scale") > 0)
      .select(col("vec_id"), col("label"), col("embedding"), col("scale"),
        // nullif guard: the scale > 0 filter above removes zero vectors,
        // but Catalyst may evaluate this projection before the filter in
        // a collapsed stage — under ANSI a 0.0 divisor then THROWS
        // mid-scan instead of the row being dropped. null propagates
        // harmlessly through the arithmetic of a row that cannot survive.
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / nullif(scale, 0.0d) + 0.5d) AS INT))")
          .as("q"))

  def quantize(spark: SparkSession, dir: String): DataFrame =
    quantizedVectors(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(col("scale"), 9).as("scale_r"),
        expr("array_join(transform(q, x -> CAST(x AS STRING)), ',')").as("q_csv"),
        expr("""round(array_max(zip_with(embedding, q,
                 (x, qi) -> abs(CAST(x AS DOUBLE) - qi * scale))) / nullif(scale, 0.0d), 6)""")
          .as("max_err_over_scale"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"))

  val quantizeSql: String =
    """SELECT vec_id,
      |       CAST(len(embedding) AS BIGINT) AS n_dims,
      |       round(scale, 9) AS scale_r,
      |       array_to_string(q, ',') AS q_csv,
      |       round(list_max(list_transform(range(1, len(embedding) + 1),
      |               i -> abs(CAST(embedding[i] AS DOUBLE) - q[i] * scale))) / scale,
      |             6) AS max_err_over_scale,
      |       CAST(list_sum(q) AS BIGINT) AS q_sum
      |FROM (
      |  SELECT vec_id, embedding, scale,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS q
      |  FROM (
      |    SELECT vec_id, embedding,
      |           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |    FROM embeddings)
      |  WHERE scale > 0)""".stripMargin

  /** Per-label class prototypes over the int8-quantized corpus: for
    * every (label, dimension), the mean and variance of the quantized
    * coordinate — the nearest-class-mean / per-class-drift primitive a
    * labeled embedding corpus gets audited with. Quantized, not float,
    * coordinates are the point: per-vector max-normalization makes the
    * prototype a DIRECTION statistic (matching the cosine geometry the
    * similarity stack uses), and integer sums make the whole operator
    * exact — mean and variance come out of (Σq, Σq², n) integer
    * aggregates with one final IEEE division each, so it is FULLY
    * oracled despite averaging floats' quantized images.
    *
    * Shape at scale: posexplode (linear ×dim) into a partial-aggregated
    * groupBy — the exchange carries |labels|·dim partial rows per task,
    * never vectors.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    // Quantize AFTER the explode, not before: exploding a pre-built `q`
    // array makes the Generate's implicit input checks re-evaluate the
    // whole quantization lambda stack per row (measured 1.54 s/sf0.1),
    // while per-element scalar arithmetic above the explode runs inside
    // whole-stage codegen with the per-row scale carried through.
    Tables(spark, dir, "embeddings")
      .select(col("label"),
        (expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
          / 127.0).as("scale"),
        col("embedding"))
      .where(col("scale") > 0)
      .select(col("label"), col("scale"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) / nullif(scale, 0.0d) + 0.5d) AS INT)")
          .as("qi"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("s"),
        sum(col("qi") * col("qi")).as("ss"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("mean_q"),
        round((col("ss") * col("n") - col("s") * col("s")).cast("double")
          / (col("n") * col("n")), 6).as("var_q"))

  val labelCentroidsSql: String =
    """WITH qv AS (
      |  SELECT label,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS q
      |  FROM (
      |    SELECT label, embedding,
      |           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |    FROM embeddings)
      |  WHERE scale > 0
      |), flat AS (
      |  SELECT label, CAST(i - 1 AS BIGINT) AS dim, q[i] AS qi
      |  FROM qv, unnest(range(1, len(q) + 1)) AS t(i)
      |)
      |SELECT label, dim, count(*) AS n,
      |       round(CAST(sum(qi) AS DOUBLE) / count(*), 6) AS mean_q,
      |       round(CAST(sum(qi * qi) * count(*) - sum(qi) * sum(qi) AS DOUBLE)
      |             / (count(*) * count(*)), 6) AS var_q
      |FROM flat GROUP BY 1, 2""".stripMargin

  /** Top-k search over the int8-QUANTIZED corpus — the serving-side
    * payoff of `quantize`: the scan reads 4×-smaller vectors and the
    * scoring inner loop is integer multiply-adds (a long dot product of
    * values ≤127 over 64 dims cannot overflow), with one double divide
    * per candidate at the end. Per-vector scales cancel out of cosine,
    * so the score is cos(q(a), q(b)) directly. Unlike the IVF/LSH
    * paths this is FULLY oracled, not rows-only: quantization is
    * deterministic, the dot products are exact integers (thus exact
    * doubles), and the top-k tie-break (score desc, id asc) matches the
    * oracle's window ordering — so even though the ANSWER is
    * approximate relative to float cosine, the COMPUTATION is
    * bit-reproducible. The suite additionally gates recall against the
    * exact brute-force baseline (≥ 0.9 at sf0.001).
    */
  /** The SERVED int8 corpus: the quantization projection is written ONCE
    * through `SnapshotStore.writeTableSnapshot` as `array<tinyint>` — the
    * genuinely-4×-smaller layout `quantize` promises — and every
    * subsequent search reads the stored parquet instead of re-deriving
    * int8 from the float corpus inline. The store is content-addressed:
    * the snapshot ts is the corpus file's (length, mtime) identity, so a
    * regenerated fixture invalidates it and a repeat query is a pure
    * 4×-smaller scan. In a deployment this is the offline index-build
    * step (run at ingest, snapshot versioned like any other table);
    * keying it off the corpus identity here makes the same economics
    * observable in a single-process run.
    */
  private[graft] def servedInt8(spark: SparkSession, dir: String): DataFrame = {
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark, s"$dir/embeddings.parquet", "graft_int8")
    if (!store.hasTableSnapshot("emb_int8", ts))
      store.writeTableSnapshot(
        quantizedVectors(spark, dir)
          .select(col("vec_id"), expr("transform(q, x -> CAST(x AS TINYINT))").as("q8")),
        "emb_int8", ts)
    store.readTableSnapshot(spark, "emb_int8", ts)
      .select(col("vec_id"), col("q8"))
  }

  def topkQuantized(spark: SparkSession, dir: String): DataFrame = {
    // int8 values are exact in float32 and every product/sum stays far
    // below 2^53, so scoring through the native float-array cosine
    // expression is bit-identical to the oracle's integer formulation —
    // and runs in CosineSim's primitive codegen loop instead of boxed
    // higher-order functions (measured 1.5 s -> brute-force-class).
    // The corpus comes from the persisted int8 snapshot, not an inline
    // re-quantization: the scan this query pays is the compressed one.
    val qz = servedInt8(spark, dir)
      .select(col("vec_id"), expr("transform(q8, x -> CAST(x AS FLOAT))").as("qv"))
    val q = qz.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"))
    val topk = udaf(new TopKAgg(K))
    qz.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosine(col("q_qv"), col("qv")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  val topkQuantizedSql: String =
    s"""WITH qz AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS qv
       |  FROM (SELECT vec_id, embedding,
       |               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |        FROM embeddings)
       |  WHERE scale > 0
       |), scored AS (
       |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |         (CAST(list_sum(list_transform(list_zip(q.qv, x.qv),
       |                 p -> CAST(p[1] AS BIGINT) * p[2])) AS DOUBLE)
       |          / sqrt(CAST(list_sum(list_transform(x.qv, v -> CAST(v AS BIGINT) * v)) AS DOUBLE)
       |               * CAST(list_sum(list_transform(q.qv, v -> CAST(v AS BIGINT) * v)) AS DOUBLE))) AS cos
       |  FROM qz q, qz x
       |  WHERE q.vec_id < $NumQueries AND x.vec_id != q.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin

  // ------------------------------------------- random sign projection
  /** Output dimensionality of the Johnson–Lindenstrauss reduction. */
  private val ProjDims = 16

  /** ±1 sign matrix, derived once from MD5 parity of the (i, j) cell
    * coordinates — deterministic, and embedded as LITERALS in both the
    * Spark plan and the SQL oracle, so no cross-engine hash arithmetic
    * is ever evaluated per row. Achlioptas (2003): ±1 entries satisfy
    * the JL distance-preservation guarantee with E‖Px‖² = D·‖x‖². */
  private lazy val projSigns: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(ProjDims) { j =>
      Array.tabulate(64) { i =>
        if ((md.digest(s"${i}_$j".getBytes("UTF-8"))(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** Random-projection dimensionality reduction over the QUANTIZED
    * corpus (64 → 16 dims): p_j = Σ_i s_ij·q_i with s ∈ {±1} — the
    * standard distance-preserving sketch (clustering, dedup blocking,
    * visualization; JL guarantees E‖Px‖² = D·‖x‖²). Projecting int8
    * images instead of floats makes every sum EXACT integer arithmetic
    * (|p_j| ≤ 64·127), so the operator is fully oracled — the
    * float-matrix form would be order-sensitive in both engines. The
    * sign matrix is sized to the corpus's embedding dim (the fixture
    * contract: 64).
    *
    * Deliberately NOT served as an ANN candidate filter: on this
    * corpus's weak similarity structure (true top-10 cosines barely
    * above background — the same adversarial regime that killed banded
    * sign-LSH for the exact near-dup in round 2), the measured
    * projected-cosine rank of true neighbors has median 169 / p80 558
    * of n=2000 — reaching the library's 0.8 recall bar would keep ~28%
    * of the corpus as candidates, matching IVF's scan fraction while
    * paying an extra full re-rank join. D=16 distortion (~25%) cannot
    * separate a cosine band ~0.1 wide; the served ANN paths stay
    * IVF/quantized.
    *
    * Shape at scale: posexplode (linear ×dim) with per-element scalar
    * quantization ABOVE the explode (the `labelCentroids` lesson: the
    * whole stack stays in whole-stage codegen), sign lookup from
    * 64-element literal arrays (no join), partial-aggregated groupBy —
    * the one exchange carries a single 17-column row per vector.
    */
  /** (vec_id, p0..p15): the shared projected-integer frame under both
    * the export query and the projected candidate search. */
  private def projectedInts(spark: SparkSession, dir: String): DataFrame = {
    val exploded = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        (expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
          / 127.0).as("scale"),
        col("embedding"))
      .where(col("scale") > 0)
      .select(col("vec_id"), col("scale"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) / nullif(scale, 0.0d) + 0.5d) AS BIGINT)")
          .as("qi"))
    val sums = (0 until ProjDims).map { j =>
      val s = array(projSigns(j).map(lit): _*)
      sum(col("qi") * element_at(s, col("i") + 1)).as(s"p$j")
    }
    exploded.groupBy(col("vec_id")).agg(sums.head, sums.tail: _*)
  }

  def randomProject(spark: SparkSession, dir: String): DataFrame = {
    val agg = projectedInts(spark, dir)
    val norm = (0 until ProjDims).map(j => col(s"p$j") * col(s"p$j"))
      .reduce(_ + _)
    agg.select(col("vec_id"),
      concat_ws(",",
        (0 until ProjDims).map(j => col(s"p$j").cast("string")): _*).as("p_csv"),
      norm.as("p_norm2"))
  }

  val randomProjectSql: String = {
    val pExprs = (0 until ProjDims).map { j =>
      val signs = projSigns(j).mkString("[", ", ", "]")
      s"CAST(sum(qi * ($signs)[i]) AS BIGINT) AS p$j"
    }.mkString(",\n         ")
    val csv = (0 until ProjDims).map(j => s"CAST(p$j AS VARCHAR)")
      .mkString("concat_ws(',', ", ", ", ")")
    val norm = (0 until ProjDims).map(j => s"p$j * p$j").mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id, embedding,
       |         list_max(list_transform(embedding,
       |                  x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS qv
       |  FROM base WHERE scale > 0
       |), e AS (
       |  SELECT vec_id, i, qv[i] AS qi
       |  FROM q, unnest(range(1, len(qv) + 1)) AS t(i)
       |), p AS (
       |  SELECT vec_id,
       |         $pExprs
       |  FROM e GROUP BY vec_id
       |)
       |SELECT vec_id, $csv AS p_csv, $norm AS p_norm2
       |FROM p""".stripMargin
  }

  /** Semantic eval-decontamination — the embedding-space complement of
    * `Curation.contamination` (shared 8-grams): a paraphrased benchmark
    * leak shares NO surface n-grams with its source but keeps a high
    * embedding cosine, so a decontamination pass needs both signals.
    * Benchmark = `vec_id < EmbBenchVecs` (standing in for an eval
    * suite's embeddings); every corpus vector whose cosine to any
    * benchmark vector reaches τ is flagged with that benchmark id.
    *
    * Scale shape: the benchmark side is FIXED-SIZE BY CONTRACT (an eval
    * suite is thousands of items, not a corpus), so it broadcasts and
    * the corpus pays exactly ONE scan with the |bench| cosines fused
    * into the scan's projection — no corpus shuffle anywhere, the same
    * broadcast-dense shape as `rag_chunk_topk`. The crossJoin is the
    * deliberate bounded-side exception to the 1-row-aggregate rule:
    * |corpus| × |bench| is linear in the corpus with a contract-bounded
    * constant. τ = 0.35 sits in the fixture distribution's tail
    * (25 pairs at sf0.01, 91 at sf0.1 — observable, not bulk).
    */
  private val EmbBenchVecs = 20
  private val EmbContaminationTau = 0.35

  def contaminationEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val bench = e.where(col("vec_id") < EmbBenchVecs)
      .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"))
    e.where(col("vec_id") >= EmbBenchVecs)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        V.cosine(col("embedding"), col("b_emb")).as("cos"))
      .where(col("cos") >= EmbContaminationTau)
      .select(col("vec_id"), col("bench_id"), round(col("cos"), 6).as("cos"))
  }

  val contaminationEmbeddingSql: String =
    s"""SELECT c.vec_id, b.vec_id AS bench_id,
       |       round(${duckCos("c.embedding", "b.embedding")}, 6) AS cos
       |FROM embeddings c, embeddings b
       |WHERE c.vec_id >= $EmbBenchVecs AND b.vec_id < $EmbBenchVecs
       |  AND ${duckCos("c.embedding", "b.embedding")} >= $EmbContaminationTau""".stripMargin

  /** Recall contract for the served ANN paths, as a HARNESS-CHECKABLE
    * row (the `dedup_simhash_pairs_check` move applied to recall): the
    * suite's recall gates live in specs the driver never runs, so this
    * query recomputes recall@K of the served IVF, hyperplane-LSH, and
    * int8-quantized paths against the exact brute-force baseline and
    * emits the pass/fail verdicts. The oracle pins `n_exact` from its own exact
    * top-k SQL (a real-data anchor: NumQueries × K rows) and the
    * verdicts to TRUE — an ANN regression that drops recall below the
    * floors now fails CORRECTNESS, not just `sbt test`. Floors match
    * the spec gates (IVF ≥ 0.7 served; LSH ≥ 0.3 at fixture scale —
    * hyperplane banding is recall-weaker on low-separation corpora,
    * which is exactly why the floor is pinned rather than assumed).
    */
  private val IvfRecallFloor = 0.7
  private val LshRecallFloor = 0.3
  // int8 only perturbs near-ties (DedupSimilaritySpec's gate); a drop
  // below 0.9 means the quantization or the served snapshot broke
  private val QuantizedRecallFloor = 0.9
  // the Lloyd-refined served codebook measures 0.95/0.90 at
  // sf0.01/sf0.1 (BENCH_NOTES r12) — 0.85 is the regression floor
  private val PqRecallFloor = 0.85
  // the composed stack measures 0.87/0.96 (IVF probe misses dominate
  // at small corpora where the shortlist covers the whole probed pool)
  private val IvfPqRecallFloor = 0.8

  def recallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = topkBruteForce(spark, dir)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    def hits(approx: DataFrame, name: String): DataFrame =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as(name))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits(topkIvf(spark, dir), "ivf_hits")))
      .crossJoin(broadcast(hits(topkLsh(spark, dir), "lsh_hits")))
      .crossJoin(broadcast(hits(topkQuantized(spark, dir), "quant_hits")))
      .crossJoin(broadcast(hits(topkPq(spark, dir), "pq_hits")))
      .crossJoin(broadcast(hits(topkIvfPq(spark, dir), "ivfpq_hits")))
      // the incrementally-maintained indexes serve at the SAME floors as
      // their full-rebuild twins — insert ≡ rebuild at the floor, so a
      // degraded insert path reds CORRECTNESS, not just a spec
      .crossJoin(broadcast(hits(topkIvfIncremental(spark, dir), "ivfinc_hits")))
      .crossJoin(broadcast(hits(topkPqIncremental(spark, dir), "pqinc_hits")))
      .crossJoin(broadcast(hits(topkIvfPqInc(spark, dir), "ivfpqinc_hits")))
      .select(col("n_exact"),
        (col("ivf_hits").cast("double") / col("n_exact") >= IvfRecallFloor)
          .as("ivf_recall_ok"),
        (col("lsh_hits").cast("double") / col("n_exact") >= LshRecallFloor)
          .as("lsh_recall_ok"),
        (col("quant_hits").cast("double") / col("n_exact") >= QuantizedRecallFloor)
          .as("quantized_recall_ok"),
        (col("pq_hits").cast("double") / col("n_exact") >= PqRecallFloor)
          .as("pq_recall_ok"),
        (col("ivfpq_hits").cast("double") / col("n_exact") >= IvfPqRecallFloor)
          .as("ivfpq_recall_ok"),
        (col("ivfinc_hits").cast("double") / col("n_exact") >= IvfRecallFloor)
          .as("ivfinc_recall_ok"),
        (col("pqinc_hits").cast("double") / col("n_exact") >= PqRecallFloor)
          .as("pqinc_recall_ok"),
        (col("ivfpqinc_hits").cast("double") / col("n_exact")
          >= IvfPqRecallFloor).as("ivfpqinc_recall_ok"))
  }

  val recallAuditSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       true AS ivf_recall_ok,
       |       true AS lsh_recall_ok,
       |       true AS quantized_recall_ok,
       |       true AS pq_recall_ok,
       |       true AS ivfpq_recall_ok,
       |       true AS ivfinc_recall_ok,
       |       true AS pqinc_recall_ok,
       |       true AS ivfpqinc_recall_ok
       |FROM ($topkBruteForceSql)""".stripMargin

  /** Corpus similarity audit: the distribution of pairwise cosines over
    * a DETERMINISTIC pair sample — the number that tells you whether a
    * similarity threshold τ sits in the distribution's tail (useful)
    * or its bulk (meaningless), before anyone runs a dedup pass with
    * it. Sampling is two DISJOINT hash buckets of vectors (first md5
    * hex char '0' vs '1', ~1/16 of the corpus each — disjointness
    * makes every cross pair distinct-by-construction, no self-pairs,
    * no double counting), crossed exactly: |corpus/16|² pairs at
    * fixture scale. At 100 TB the sample is capped by DEEPENING the
    * hash prefix (each extra hex char cuts each side 16×, the pair
    * count 256×) — the knob is in the constant, the plan shape never
    * changes. NaN cosines (zero vectors) are excluded on both engines
    * rather than letting them pick a bucket by engine-specific float
    * semantics.
    */
  def cosineAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    def samp(prefix: String, idc: String, embc: String) =
      e.where(substring(md5(col("vec_id").cast("string")), 1, 1) === prefix)
        .select(col("vec_id").as(idc), col("embedding").as(embc))
    samp("0", "vec_a", "emb_a").crossJoin(samp("1", "vec_b", "emb_b"))
      .select(V.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(!isnan(col("cos")))
      .groupBy(floor(col("cos") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("cos")), 6).as("mean_cos"))
  }

  val cosineAuditSql: String = {
    val cos = duckCos("a.embedding", "b.embedding")
    s"""WITH a AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'
       |), b AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '1'
       |), pairs AS (
       |  SELECT $cos AS cos FROM a, b
       |)
       |SELECT CAST(floor(cos * 10) AS BIGINT) AS bucket,
       |       count(*) AS n_pairs, round(avg(cos), 6) AS mean_cos
       |FROM pairs WHERE NOT isnan(cos)
       |GROUP BY 1""".stripMargin
  }

  // ------------------------------------------- semantic dedup (SemDeDup)

  // τ, signature width, and band geometry are ONE tuning unit: at
  // τ = 0.95 per-bit agreement is p = 1 − arccos(.95)/π ≈ 0.90, so an
  // 8-bit band matches a true pair with p⁸ ≈ 0.43 and six bands give
  // candidate recall 1 − (1 − p⁸)⁶ ≈ 0.97 — while 2⁸ buckets per band
  // keep candidate volume subquadratic. The first cut (4-bit bands from
  // the top-k family) measured 49.7 s at sf1: 16 buckets per band is a
  // PARTITION of the corpus, not a blocking scheme — candidate pairs
  // grew with n²/16. Widening buckets, not probing fewer bands, is the
  // scale dial (BENCH_NOTES r7).
  private val SemTau = 0.95
  private val SemBits = 48
  private val SemBandBits = 8
  private val SemBands = SemBits / SemBandBits

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023: cluster
    * the embedding space, drop all-but-one of each within-cluster
    * near-identical group). The cluster proxy here is hyperplane LSH —
    * banded 6×8 over a 48-bit signature — instead of trained k-means
    * cells, for one decisive reason: the hyperplanes are
    * DRIVER-COMPUTED CONSTANTS, so the DuckDB twin embeds them as
    * literals, recomputes bit-identical signatures, and the WHOLE
    * operator is strictly oracled — where a k-means proxy (float-mean
    * training) can never be cross-engine reproducible and would demote
    * the op to a check-twin. At τ = 0.95 the 6×8 banding gives
    * candidate recall ≈ 0.97 (see the constants above) — the high-τ
    * regime the round-2 lesson pinned for hyperplane LSH; low-τ
    * near-dup belongs on `dedup_minhash_lsh`.
    *
    * Keeper rule: a vector drops iff some CONFIRMED (exact cosine ≥ τ)
    * candidate neighbor has a smaller id; `kept_by` names the smallest
    * such neighbor as evidence. The minimum id of every semantic group
    * always survives.
    *
    * Scale shape: the band-collision join and candidate dedup ship
    * (id, band, bucket) longs only — embeddings are re-attached by
    * equi-join for CANDIDATE pairs alone, so the float arrays never
    * ride the corpus-wide exchange; the confirm stage is bounded by
    * candidate volume (near-identical pairs are the rare case). Widen
    * NBits for bigger corpora — bucket population, not algorithm,
    * is the knob.
    */
  /** (id, band, bucket) explosion of the 48-bit signature under the
    * 6×8 geometry — shared by `semanticDedup` and `knnLsh`.
    */
  private def semBands(idSigs: DataFrame, idAs: String): DataFrame = {
    val bandCols = (0 until SemBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * SemBandBits)
          .bitwiseAND((1L << SemBandBits) - 1).as("bucket"))
    }
    idSigs.select(col("vec_id").as(idAs),
      explode(array(bandCols: _*)).as("k"))
      .select(col(idAs), col("k.band").as("band"), col("k.bucket").as("bucket"))
  }

  /** Hot-bucket bound for the banded candidate stage (r13): a
    * candidate pair must include one of its bucket's `SemBucketCap`
    * SMALLEST ids (the bucket's anchors), so per-bucket pair volume is
    * O(cap · |bucket|) — linear in bucket size — instead of |bucket|²,
    * and a boilerplate-embedding mega-bucket (the 100 TB runaway shape)
    * is bounded IN CODE. The anchor rank is a window PARTITIONED by
    * (band, bucket) — sharded, never a global sort. For the dedup
    * keeper rule the anchor restriction is usually lossless: a dropped
    * vector only needs SOME confirmed smaller-id neighbor, and a real
    * near-dup family's smallest ids are exactly its bucket anchors.
    * When a bucket overflows the cap, the count rides every output row
    * as `capped_buckets` — capped runs are visibly capped (the
    * `graph_jaccard` / `dedup_edit_pairs` audit discipline), and the
    * ORACLE mirrors the same rank rule, so the op stays hash-exact at
    * every scale, firing or not. Fixture buckets sit far under the cap.
    */
  private val SemBucketCap = 64

  /** (capped candidate pairs id_a < id_b, 1-row capped-bucket count)
    * over the shared banded signatures.
    */
  private def bandedCandidates(idSigs: DataFrame): (DataFrame, DataFrame) = {
    val b = semBands(idSigs, "vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("vec_id"))
    val ranked = b.withColumn("rk", row_number().over(w))
    val cand = ranked.where(col("rk") <= SemBucketCap)
      .select(col("vec_id").as("id_a"), col("band"), col("bucket"))
      .join(b.select(col("vec_id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val capped = ranked.groupBy(col("band"), col("bucket"))
      .agg(max(col("rk")).as("n"))
      .where(col("n") > SemBucketCap)
      .agg(count(lit(1)).as("capped_buckets"))
    (cand, capped)
  }

  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val idSigs = hyperplaneSigsN(emb(spark, dir), SemBits)
      .select(col("vec_id"), col("sig"))
    val (cand, capped) = bandedCandidates(idSigs)
    val e = emb(spark, dir)
    val confirmed = cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")),
        Seq("id_b"))
      .where(V.cosine(col("emb_a"), col("emb_b")) >= SemTau)
    val drops = confirmed.groupBy(col("id_b").as("vec_id"))
      .agg(min("id_a").as("kept_by"))
    idSigs.join(drops, Seq("vec_id"), "left")
      .select(col("vec_id"), col("sig").as("bucket"),
        when(col("kept_by").isNull, "keep").otherwise("drop").as("status"),
        col("kept_by"))
      .crossJoin(broadcast(capped))
  }

  val semanticDedupSql: String = {
    def dot(j: Int) = {
      val lits = (0 until 64).map(d => hyperplaneVal(j, d))
        .mkString("[", ", ", "]")
      // coalesce: a zero-length (non-null) embedding makes list_sum
      // return NULL in DuckDB (sum over no rows) where the engine's
      // while-loop dot is 0.0 — pin both to 0.0 so every signature bit
      // agrees even on degenerate vectors.
      s"""coalesce(list_sum(list_transform(list_zip(embedding, $lits),
         |           x -> CAST(x[1] AS DOUBLE) * x[2])), 0.0)""".stripMargin
    }
    val sigExpr = (0 until SemBits)
      .map(j => s"(CASE WHEN ${dot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n       + ")
    val bandList = (0 until SemBands).mkString("[", ", ", "]")
    s"""WITH s AS (
       |  SELECT vec_id, embedding,
       |         CAST($sigExpr AS BIGINT) AS sig
       |  FROM embeddings),
       |bd AS (SELECT vec_id, sig, band,
       |              (sig >> (band * $SemBandBits)) &
       |                ${(1L << SemBandBits) - 1} AS bucket
       |       FROM s CROSS JOIN (SELECT unnest($bandList) AS band)),
       |ranked AS (SELECT vec_id, band, bucket,
       |                  row_number() OVER (PARTITION BY band, bucket
       |                    ORDER BY vec_id) AS rk
       |           FROM bd),
       |cb AS (SELECT CAST(count(*) AS BIGINT) AS capped_buckets
       |       FROM (SELECT band, bucket, max(rk) AS n FROM ranked
       |             GROUP BY 1, 2) WHERE n > $SemBucketCap),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |         FROM (SELECT * FROM ranked WHERE rk <= $SemBucketCap) x
       |         JOIN bd y
       |           ON x.band = y.band AND x.bucket = y.bucket
       |          AND x.vec_id < y.vec_id),
       |conf AS (SELECT c.id_a, c.id_b
       |         FROM cand c
       |         JOIN embeddings a ON a.vec_id = c.id_a
       |         JOIN embeddings b ON b.vec_id = c.id_b
       |         WHERE ${duckCos("a.embedding", "b.embedding")} >= $SemTau),
       |drops AS (SELECT id_b AS vec_id, min(id_a) AS kept_by
       |          FROM conf GROUP BY id_b)
       |SELECT s.vec_id, s.sig AS bucket,
       |       CASE WHEN d.kept_by IS NULL THEN 'keep' ELSE 'drop' END
       |         AS status,
       |       d.kept_by, capped_buckets
       |FROM s LEFT JOIN drops d ON s.vec_id = d.vec_id
       |CROSS JOIN cb""".stripMargin
  }

  // ------------------------------------------- sim_hard_negatives

  /** Contrastive TRIPLET MINING — the training-data op for embedding
    * models: for each benchmark query vector (the anchor), its best
    * same-label neighbor by exact cosine (the positive) and its best
    * DIFFERENT-label neighbor (the hard negative — the pair that
    * actually teaches a margin; random negatives are trivially easy,
    * which is why production contrastive pipelines mine hard ones).
    * `margin` = positive − negative cosine: ≤ 0 flags an anchor whose
    * nearest foreign vector beats its own class — a label error or a
    * genuinely hard region, either way the row a curator reads first.
    *
    * Exact and single-pass: one broadcast of the bounded query set,
    * one corpus scan, and per side a conditional max over
    * (cos, −neighbor_id) structs — the `TopKAgg` tie order (score
    * desc, id asc) without a window or a second scan; a query with no
    * same-label (resp. different-label) neighbor carries nulls, never
    * a fabricated pair. At 100 TB the same mining serves from the
    * persisted IVF/PQ shortlist instead of the full scan — the corpus
    * pass here is the exactness baseline the fixture can afford.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val el = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = el.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    def best(sameLabel: Boolean) = {
      val cond =
        if (sameLabel) col("label") === col("q_label")
        else col("label") =!= col("q_label")
      max(when(cond, struct(col("cos"),
        (-col("neighbor_id")).as("nid"), col("neighbor_id"))))
    }
    el.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"), col("label"),
        col("vec_id").as("neighbor_id"),
        V.cosine(col("embedding"), col("q_emb")).as("cos"))
      .groupBy(col("query_id"))
      .agg(best(sameLabel = true).as("p"), best(sameLabel = false).as("n"))
      .select(col("query_id"),
        col("p.neighbor_id").as("positive_id"),
        round(col("p.cos"), 6).as("pos_cos"),
        col("n.neighbor_id").as("negative_id"),
        round(col("n.cos"), 6).as("neg_cos"),
        round(col("p.cos") - col("n.cos"), 6).as("margin"))
  }

  val hardNegativesSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
       |  FROM embeddings WHERE vec_id < $NumQueries
       |), scored AS (
       |  SELECT q.query_id, q.q_label, e.label, e.vec_id AS neighbor_id,
       |         ${duckCos("e.embedding", "q.q_emb")} AS cos
       |  FROM embeddings e, q WHERE e.vec_id != q.query_id
       |), pos AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rk
       |  FROM scored WHERE label = q_label
       |), neg AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rk
       |  FROM scored WHERE label != q_label
       |)
       |SELECT q.query_id, p.neighbor_id AS positive_id,
       |       round(p.cos, 6) AS pos_cos,
       |       n.neighbor_id AS negative_id, round(n.cos, 6) AS neg_cos,
       |       round(p.cos - n.cos, 6) AS margin
       |FROM q
       |LEFT JOIN pos p ON p.query_id = q.query_id AND p.rk = 1
       |LEFT JOIN neg n ON n.query_id = q.query_id AND n.rk = 1""".stripMargin

  /** The 100 TB form of the triplet miner: the SAME per-side
    * conditional-max selection, but over the served IVF index's probed
    * cells instead of a full corpus scan — each anchor pays
    * probe + |its NProbe cells|, the production economics of every
    * served search path here. Rows-only (which vectors the shortlist
    * holds is index geometry); the oracled `_check` twin pins the
    * contract: every emitted cosine re-derives exactly from the raw
    * embeddings (value check), margins are consistent, and the served
    * NEGATIVE side agrees with the exact miner on a floor fraction of
    * anchors (the IVF recall economics — positives live in dense
    * same-class cells, negatives on boundaries, so the floor is the
    * interesting number).
    */
  private val HardNegAgreeFloor = 0.6

  def hardNegativesServed(spark: SparkSession, dir: String): DataFrame = {
    val (cent, cells) = servedIvfIndex(spark, dir)
    val lbl = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val q = Tables(spark, dir, "embeddings")
      .where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val probeK = udaf(new TopKAgg(NProbe))
    val probes = q.join(broadcast(cent), expr("true"))
      .select(col("query_id"), col("q_emb"), col("q_label"),
        col("cent_id"), V.cosine(col("q_emb"), col("cent_emb")).as("ccos"))
      .groupBy(col("query_id"), col("q_emb"), col("q_label"))
      .agg(probeK(col("cent_id"), col("ccos")).as("p"))
      .select(col("query_id"), col("q_emb"), col("q_label"),
        explode(expr("transform(p, x -> x.id)")).as("cell"))
    def best(sameLabel: Boolean) = {
      val cond =
        if (sameLabel) col("label") === col("q_label")
        else col("label") =!= col("q_label")
      max(when(cond, struct(col("cos"),
        (-col("neighbor_id")).as("nid"), col("neighbor_id"))))
    }
    val bests = probes.join(cells, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .join(lbl, Seq("vec_id"))
      .select(col("query_id"), col("q_label"), col("label"),
        col("vec_id").as("neighbor_id"),
        V.cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(best(sameLabel = true).as("p"), best(sameLabel = false).as("n"))
    // Re-anchor on the query spine: a query whose probed cells hold no
    // candidate but itself would otherwise vanish from the groupBy while
    // the oracle's LEFT JOIN from q still emits its all-NULL row —
    // one-row-per-anchor is the contract on both engines.
    q.select(col("query_id")).join(bests, Seq("query_id"), "left")
      .select(col("query_id"),
        col("p.neighbor_id").as("positive_id"),
        round(col("p.cos"), 6).as("pos_cos"),
        col("n.neighbor_id").as("negative_id"),
        round(col("n.cos"), 6).as("neg_cos"),
        round(col("p.cos") - col("n.cos"), 6).as("margin"))
  }

  /** Dynamic FULL oracle for `sim_hard_negatives_ann`: literal served
    * centroids → recomputed cells → per-anchor probe → per-side best
    * by (cos DESC, id ASC) — exactly the engine's
    * `max(struct(cos, −nid, nid))` tie order; an empty side LEFT-JOINs
    * to NULLs on both engines. The `_check` twin's value/agreement
    * floors stay registered.
    */
  def hardNegativesServedOracle(spark: SparkSession, dir: String): String = {
    val (cent, _) = servedIvfIndex(spark, dir)
    val cents = cent.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Float](1)))
    s"""WITH ${annCellsCtes(cents)}, q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
       |  FROM embeddings WHERE vec_id < $NumQueries
       |), hnqs AS (
       |  SELECT q.query_id, q.q_emb, q.q_label, c.cent_id,
       |         -(${duckCos("q.q_emb", "c.cent_emb")}) AS negcos
       |  FROM q, cent c
       |), hnprobe AS (
       |  SELECT query_id, q_emb, q_label, cent_id AS cell,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY negcos ASC, cent_id ASC) AS rn
       |  FROM hnqs
       |), hnscored AS (
       |  SELECT p.query_id, p.q_label, e.vec_id AS neighbor_id, e.label,
       |         ${duckCos("p.q_emb", "e.embedding")} AS cos
       |  FROM (SELECT query_id, q_emb, q_label, cell FROM hnprobe
       |        WHERE rn <= $NProbe) p
       |       JOIN cells cl ON cl.cell = p.cell
       |       JOIN embeddings e ON e.vec_id = cl.vec_id
       |  WHERE e.vec_id != p.query_id
       |), pos AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rk
       |  FROM hnscored WHERE label = q_label
       |), neg AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rk
       |  FROM hnscored WHERE label != q_label
       |)
       |SELECT q.query_id, p.neighbor_id AS positive_id,
       |       round(p.cos, 6) AS pos_cos,
       |       n.neighbor_id AS negative_id, round(n.cos, 6) AS neg_cos,
       |       round(p.cos - n.cos, 6) AS margin
       |FROM q
       |LEFT JOIN pos p ON p.query_id = q.query_id AND p.rk = 1
       |LEFT JOIN neg n ON n.query_id = q.query_id AND n.rk = 1""".stripMargin
  }

  def hardNegativesServedCheck(spark: SparkSession, dir: String): DataFrame = {
    val served = hardNegativesServed(spark, dir).localCheckpoint()
    val e = emb(spark, dir)
    // value check: every emitted cosine re-derives from raw embeddings
    def rederive(idCol: String, cosCol: String, name: String) =
      served.where(col(idCol).isNotNull)
        .join(e.select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb")), Seq("query_id"))
        .join(e.select(col("vec_id").as(idCol), col("embedding").as("n_emb")),
          Seq(idCol))
        .agg(every(col(cosCol) ===
          round(V.cosine(col("q_emb"), col("n_emb")), 6)).as(name))
    val exact = hardNegatives(spark, dir)
      .select(col("query_id"), col("negative_id").as("x_neg"))
    val agree = served.join(exact, Seq("query_id"))
      .agg((count(when(col("negative_id") === col("x_neg"), 1))
        .cast("double") / count(lit(1)) >= HardNegAgreeFloor)
        .as("neg_agree_ok"))
    served.agg(count(lit(1)).as("n_queries"),
        // margin exists exactly when both sides do (it rounds the RAW
        // difference, so re-deriving it from the rounded sides would
        // be a false mismatch — nullability is the checkable contract)
        every(col("margin").isNotNull ===
          (col("positive_id").isNotNull && col("negative_id").isNotNull))
          .as("margin_consistent"))
      .crossJoin(broadcast(rederive("positive_id", "pos_cos", "pos_rederives")))
      .crossJoin(broadcast(rederive("negative_id", "neg_cos", "neg_rederives")))
      .crossJoin(broadcast(agree))
      .select(col("n_queries"), col("pos_rederives"), col("neg_rederives"),
        col("margin_consistent"), col("neg_agree_ok"))
  }

  val hardNegativesServedCheckSql: String =
    s"""SELECT CAST($NumQueries AS BIGINT) AS n_queries,
       |       true AS pos_rederives, true AS neg_rederives,
       |       true AS margin_consistent, true AS neg_agree_ok""".stripMargin

  // ------------------------------------------- sim_label_noise

  private val NoiseTau = 0.9
  private val NoiseMinNbrs = 2L

  /** Label-noise flagging by NEIGHBORHOOD AGREEMENT (the confident-
    * learning intuition at corpus scale): a vector whose confirmed
    * τ-similar neighbors mostly carry a DIFFERENT label is either
    * mislabeled or sits on a class boundary — the rows a labeling-QA
    * pass re-reviews first. Neighborhoods come from the SAME
    * literal-hyperplane banded candidates as `dedup_semantic` (anchor-
    * capped, audit column riding every row) confirmed by exact cosine
    * ≥ τ — so the op is strictly oracled end-to-end AND bounded in
    * code; no all-pairs form exists outside the DuckDB twin. A vector
    * with fewer than `NoiseMinNbrs` confirmed neighbors is never
    * flagged (one neighbor is an anecdote, not evidence); agreement is
    * exact integer arithmetic (2·n_agree < n_neighbors) at the flag
    * boundary, doubles only in the reported ratio.
    */
  def labelNoise(spark: SparkSession, dir: String): DataFrame = {
    val lbl = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val idSigs = hyperplaneSigsN(emb(spark, dir), SemBits)
      .select(col("vec_id"), col("sig"))
    val (cand, capped) = bandedCandidates(idSigs)
    val e = emb(spark, dir)
    val confirmed = cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")),
        Seq("id_b"))
      .where(V.cosine(col("emb_a"), col("emb_b")) >= NoiseTau)
      .select(col("id_a"), col("id_b"))
      // candidate-sized; feeds both branches of the symmetric union
      .localCheckpoint()
    val sym = confirmed.unionByName(confirmed
      .select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val agree = sym
      .join(lbl.select(col("vec_id").as("id_a"), col("label").as("lab_a")),
        Seq("id_a"))
      .join(lbl.select(col("vec_id").as("id_b"), col("label").as("lab_b")),
        Seq("id_b"))
      .groupBy(col("id_a").as("vec_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("lab_a") === col("lab_b"), 1L).otherwise(0L))
          .as("n_agree"))
    lbl.join(agree, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("n_agree"), lit(0L)).as("n_agree"),
        round(col("n_agree").cast("double") / col("n_neighbors"), 6)
          .as("agreement"),
        (coalesce(col("n_neighbors"), lit(0L)) >= NoiseMinNbrs &&
          coalesce(col("n_agree"), lit(0L)) * 2 <
            coalesce(col("n_neighbors"), lit(0L))).as("flagged"))
      .crossJoin(broadcast(capped))
  }

  /** The shared banded-candidate CTE chain (signatures → bands →
    * anchor-capped pairs + capped-bucket audit) — textually the same
    * construction `semanticDedupSql` inlines; factored for the oracles
    * that rank or aggregate over the SAME candidate set.
    */
  private def semCandSql: String = {
    def dot(j: Int) = {
      val lits = (0 until 64).map(d => hyperplaneVal(j, d))
        .mkString("[", ", ", "]")
      // coalesce: a zero-length (non-null) embedding makes list_sum
      // return NULL in DuckDB (sum over no rows) where the engine's
      // while-loop dot is 0.0 — pin both to 0.0 so every signature bit
      // agrees even on degenerate vectors.
      s"""coalesce(list_sum(list_transform(list_zip(embedding, $lits),
         |           x -> CAST(x[1] AS DOUBLE) * x[2])), 0.0)""".stripMargin
    }
    val sigExpr = (0 until SemBits)
      .map(j => s"(CASE WHEN ${dot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n       + ")
    val bandList = (0 until SemBands).mkString("[", ", ", "]")
    s"""s AS (
       |  SELECT vec_id, embedding,
       |         CAST($sigExpr AS BIGINT) AS sig
       |  FROM embeddings),
       |bd AS (SELECT vec_id, sig, band,
       |              (sig >> (band * $SemBandBits)) &
       |                ${(1L << SemBandBits) - 1} AS bucket
       |       FROM s CROSS JOIN (SELECT unnest($bandList) AS band)),
       |ranked AS (SELECT vec_id, band, bucket,
       |                  row_number() OVER (PARTITION BY band, bucket
       |                    ORDER BY vec_id) AS rk
       |           FROM bd),
       |cb AS (SELECT CAST(count(*) AS BIGINT) AS capped_buckets
       |       FROM (SELECT band, bucket, max(rk) AS n FROM ranked
       |             GROUP BY 1, 2) WHERE n > $SemBucketCap),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |         FROM (SELECT * FROM ranked WHERE rk <= $SemBucketCap) x
       |         JOIN bd y
       |           ON x.band = y.band AND x.bucket = y.bucket
       |          AND x.vec_id < y.vec_id)""".stripMargin
  }

  val labelNoiseSql: String =
    s"""WITH $semCandSql,
       |conf AS (SELECT c.id_a, c.id_b
       |         FROM cand c
       |         JOIN embeddings a ON a.vec_id = c.id_a
       |         JOIN embeddings b ON b.vec_id = c.id_b
       |         WHERE ${duckCos("a.embedding", "b.embedding")} >= $NoiseTau),
       |sym AS (SELECT id_a, id_b FROM conf
       |        UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM conf),
       |agree AS (SELECT p.id_a AS vec_id,
       |                 CAST(count(*) AS BIGINT) AS n_neighbors,
       |                 CAST(sum(CASE WHEN la.label = lb.label
       |                               THEN 1 ELSE 0 END) AS BIGINT)
       |                   AS n_agree
       |          FROM sym p
       |          JOIN embeddings la ON la.vec_id = p.id_a
       |          JOIN embeddings lb ON lb.vec_id = p.id_b
       |          GROUP BY 1)
       |SELECT e.vec_id, e.label,
       |       COALESCE(n_neighbors, 0) AS n_neighbors,
       |       COALESCE(n_agree, 0) AS n_agree,
       |       round(CAST(n_agree AS DOUBLE) / n_neighbors, 6) AS agreement,
       |       (COALESCE(n_neighbors, 0) >= $NoiseMinNbrs AND
       |        COALESCE(n_agree, 0) * 2 < COALESCE(n_neighbors, 0))
       |         AS flagged,
       |       capped_buckets
       |FROM embeddings e
       |LEFT JOIN agree ON agree.vec_id = e.vec_id
       |CROSS JOIN cb""".stripMargin

  private val KnnK = 3

  /** kNN-GRAPH construction over the same literal-hyperplane LSH
    * candidates as `dedup_semantic` — the input clustering methods,
    * label propagation, and graph-based dedup start from: for EVERY
    * vector, its top-`KnnK` candidate neighbors by exact cosine, ties
    * broken by neighbor id. Strictly oracled end-to-end because BOTH
    * the candidate set (driver-constant hyperplanes) and the ranking
    * (raw cosine DESC, id ASC — a total order; both engines compute
    * bit-identical cosines by the sequential-accumulation parity) are
    * deterministic. Vectors whose buckets hold no neighbor contribute
    * no rows — the honest sparse-graph answer, not a fabricated edge.
    *
    * Scale shape: candidate generation and dedup ship (id, id) longs;
    * embeddings re-attach per candidate; the rank is a window
    * PARTITIONED by vec_id (never global). Same bucket-width dial as
    * `dedup_semantic`.
    */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val idSigs = hyperplaneSigsN(emb(spark, dir), SemBits)
      .select(col("vec_id"), col("sig"))
    // score each unordered pair ONCE (cosine is symmetric), mirror the
    // scored frame for the per-vector ranking — halves both the
    // candidate dedup and the cosine evaluations vs a directed join.
    // Candidates are the anchor-capped banded pairs (`bandedCandidates`)
    // so a hot bucket costs O(cap·|bucket|), with `capped_buckets`
    // riding every row; in an over-cap bucket a vector ranks only the
    // bucket's cap smallest ids as candidates FROM THAT BAND — other
    // bands still contribute, and the audit column says it happened.
    val (cand, capped) = bandedCandidates(idSigs)
    val e = emb(spark, dir)
    val scored = cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        V.cosine(col("emb_a"), col("emb_b")).as("cos_raw"))
      // candidate-sized; the cut stops the union's two branches from
      // re-running the band joins + cosines (the span-family pattern)
      .localCheckpoint()
    val both = scored.unionByName(scored.select(
      col("id_b").as("id_a"), col("id_a").as("id_b"), col("cos_raw")))
    val byVec = org.apache.spark.sql.expressions.Window.partitionBy("id_a")
      .orderBy(col("cos_raw").desc, col("id_b").asc)
    both
      .withColumn("rank", row_number().over(byVec).cast("long"))
      .where(col("rank") <= KnnK)
      .select(col("id_a").as("vec_id"), col("rank"),
        col("id_b").as("neighbor_id"), round(col("cos_raw"), 6).as("cos"))
      .crossJoin(broadcast(capped))
  }

  val knnLshSql: String = {
    def dot(j: Int) = {
      val lits = (0 until 64).map(d => hyperplaneVal(j, d))
        .mkString("[", ", ", "]")
      // coalesce: a zero-length (non-null) embedding makes list_sum
      // return NULL in DuckDB (sum over no rows) where the engine's
      // while-loop dot is 0.0 — pin both to 0.0 so every signature bit
      // agrees even on degenerate vectors.
      s"""coalesce(list_sum(list_transform(list_zip(embedding, $lits),
         |           x -> CAST(x[1] AS DOUBLE) * x[2])), 0.0)""".stripMargin
    }
    val sigExpr = (0 until SemBits)
      .map(j => s"(CASE WHEN ${dot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n       + ")
    val bandList = (0 until SemBands).mkString("[", ", ", "]")
    s"""WITH s AS (
       |  SELECT vec_id, embedding,
       |         CAST($sigExpr AS BIGINT) AS sig
       |  FROM embeddings),
       |bd AS (SELECT vec_id, sig, band,
       |              (sig >> (band * $SemBandBits)) &
       |                ${(1L << SemBandBits) - 1} AS bucket
       |       FROM s CROSS JOIN (SELECT unnest($bandList) AS band)),
       |rk0 AS (SELECT vec_id, band, bucket,
       |               row_number() OVER (PARTITION BY band, bucket
       |                 ORDER BY vec_id) AS rk
       |        FROM bd),
       |cb AS (SELECT CAST(count(*) AS BIGINT) AS capped_buckets
       |       FROM (SELECT band, bucket, max(rk) AS n FROM rk0
       |             GROUP BY 1, 2) WHERE n > $SemBucketCap),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |         FROM (SELECT * FROM rk0 WHERE rk <= $SemBucketCap) x
       |         JOIN bd y
       |           ON x.band = y.band AND x.bucket = y.bucket
       |          AND x.vec_id < y.vec_id),
       |scored0 AS (SELECT c.id_a, c.id_b,
       |                   ${duckCos("a.embedding", "b.embedding")} AS cos_raw
       |            FROM cand c
       |            JOIN embeddings a ON a.vec_id = c.id_a
       |            JOIN embeddings b ON b.vec_id = c.id_b),
       |scored AS (SELECT id_a, id_b, cos_raw FROM scored0
       |           UNION ALL
       |           SELECT id_b, id_a, cos_raw FROM scored0),
       |ranked AS (SELECT id_a, id_b, cos_raw,
       |                  row_number() OVER (PARTITION BY id_a
       |                    ORDER BY cos_raw DESC, id_b ASC) AS rank
       |           FROM scored)
       |SELECT id_a AS vec_id, CAST(rank AS BIGINT) AS rank,
       |       id_b AS neighbor_id, round(cos_raw, 6) AS cos, capped_buckets
       |FROM ranked CROSS JOIN cb WHERE rank <= $KnnK""".stripMargin
  }

  // ------------------------------------------- nearest-centroid confusion

  /** Nearest-class-mean confusion matrix over the quantized corpus — the
    * standard "are these embeddings linearly separable by label?" eval a
    * labeled embedding table gets before anyone trains on it. Every
    * vector is classified to the class centroid with the highest cosine
    * (resubstitution: a vector contributes to its own class's centroid —
    * the diagnostic convention; ties break to the smallest label), and
    * the (true, predicted) counts come out as the confusion matrix.
    *
    * Exactness: coordinates are the int8-quantized images (the
    * `labelCentroids` geometry), so vector·centroidSum dot products and
    * centroid norms are EXACT integers (Σq ≤ 127·n per dim; the norm's
    * squares accumulate as DECIMAL(38,0) for headroom at any class
    * size); the classification score `dot / √ssq` is one fixed double
    * expression over identical exact scalars — the query vector's own
    * norm is label-constant and drops out of the argmax. Fully oracled.
    *
    * Shape at scale: the centroid frame is |labels|·dim rows and
    * BROADCASTS twice (sums, norms); per-vector work is the dim-explode
    * joined against it with map-side partial sums — |vecs|·dim·|labels|
    * flows through partial aggregation, never a shuffle of vectors; the
    * argmax window partitions on vec_id.
    */
  def centroidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val flat = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        (expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
          / 127.0).as("scale"),
        col("embedding"))
      .where(col("scale") > 0)
      .select(col("vec_id"), col("label"), col("scale"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) / nullif(scale, 0.0d) + 0.5d) AS INT)")
          .cast("long").as("qi"))
    val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
      .agg(sum(col("qi")).as("s"))
    val cnorm = cent.groupBy(col("clabel"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("s")).as("ssq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("clabel").asc)
    flat
      .join(broadcast(cent), "dim")
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum(col("qi") * col("s")).as("dot"))
      .join(broadcast(cnorm), "clabel")
      .select(col("vec_id"), col("label"), col("clabel"),
        (col("dot").cast("double") / sqrt(col("ssq").cast("double")))
          .as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("label").as("label_true"), col("clabel").as("label_pred"))
      .agg(count(lit(1)).as("n"))
  }

  val centroidConfusionSql: String =
    """WITH flat AS (
      |  SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS dim,
      |         CAST(CAST(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5)
      |                   AS INT) AS BIGINT) AS qi
      |  FROM (
      |    SELECT vec_id, label, embedding,
      |           list_max(list_transform(embedding,
      |             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |    FROM embeddings)
      |  CROSS JOIN unnest(range(1, len(embedding) + 1)) AS t(i)
      |  WHERE scale > 0
      |), cent AS (
      |  SELECT label AS clabel, dim, CAST(sum(qi) AS BIGINT) AS s
      |  FROM flat GROUP BY 1, 2
      |), cnorm AS (
      |  SELECT clabel,
      |         CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS ssq
      |  FROM cent GROUP BY 1
      |), dots AS (
      |  SELECT f.vec_id, f.label, c.clabel,
      |         CAST(sum(f.qi * c.s) AS BIGINT) AS dot
      |  FROM flat f JOIN cent c ON c.dim = f.dim
      |  GROUP BY 1, 2, 3
      |), scored AS (
      |  SELECT d.vec_id, d.label, d.clabel,
      |         CAST(d.dot AS DOUBLE) / sqrt(CAST(n.ssq AS DOUBLE)) AS score
      |  FROM dots d JOIN cnorm n USING (clabel)
      |), best AS (
      |  SELECT vec_id, label, clabel,
      |         row_number() OVER (PARTITION BY vec_id
      |           ORDER BY score DESC, clabel ASC) AS rn
      |  FROM scored)
      |SELECT label AS label_true, clabel AS label_pred, count(*) AS n
      |FROM best WHERE rn = 1 GROUP BY 1, 2""".stripMargin

  // ------------------------------------------ product quantization

  /** PQ-ADC top-k — the fourth ANN family (after IVF, hyperplane LSH,
    * int8): vectors compressed to M sub-space code bytes, queries
    * scanned in the COMPRESSED domain via additive distance tables
    * (Jégou 2011). Unlike IVF/LSH, PQ-ADC is an exhaustive scan by
    * design — its win is bandwidth (M bytes/vector vs 4·dim), which is
    * why serving stacks compose it INSIDE IVF cells at 100 TB (probe
    * cells → ADC over the cell's codes; this operator is that inner
    * kernel, and the composition note is the scale path).
    *
    * The SERVED codebook is Lloyd-refined (r11 verdict #4): seeded from
    * the sub-vectors of the first `PqKs` corpus vectors, then
    * `PqLloydRounds` k-means rounds per sub-space, trained ONCE per
    * corpus version and persisted via the content-addressed store (the
    * `servedIvfIndex` economics). Config chosen from the measured
    * recall/latency sweep (BENCH_NOTES r12): ks=64, shortlist=150,
    * rounds=2 → recall@10 0.95 at sf0.01 / 0.90 at sf0.1, vs 0.75/0.60
    * for the unrefined ks=32/shortlist=50 baseline. Assignment = min L2
    * per sub-space with code tie-break (min_by on a (dist, code)
    * struct). Serving: per-query M×Ks dot table (tiny, broadcast),
    * additive scores over the code frame, top-`PqShortlist` shortlist,
    * then EXACT cosine re-rank to K — emitted scores are exact, so the
    * strict exactly-K value check applies (full-scan pool ⇒ K results
    * always, the IVF argument a fortiori). Lloyd float means make the
    * refined codebook engine-specific (like IVF's) — the exact re-rank
    * keeps emitted cosines exact regardless, so quality moves,
    * correctness doesn't.
    */
  private val PqM = 8
  private val PqDsub = 8 // 64 dims = 8 sub-spaces x 8
  private val PqKs = 64
  private val PqShortlist = 150
  private val PqLloydRounds = 2

  /** (vec_id, m, sub): the M sub-vector slices of each embedding. */
  private def pqSubvecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(array((0 until PqM).map(m =>
      slice(col("embedding"), m * PqDsub + 1, PqDsub)): _*))
      .as(Seq("m", "sub")))

  private def pqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Corpus code assignment: each vector's nearest code per sub-space
    * (min L2, code tie-break) — the expensive |corpus|×Ks sweep that
    * production PQ runs ONCE at index-build time, because the codes ARE
    * the index (M bytes per vector).
    */
  private def pqCodes(e: DataFrame, book: DataFrame): DataFrame =
    pqSubvecs(e).join(broadcast(book), Seq("m"))
      .select(col("vec_id"), col("m"), col("code"),
        pqL2(col("sub"), col("c_sub")).as("d2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** The served PQ index: codebook AND corpus codes, trained/assigned
    * once per corpus version and stored — queries pay the broadcast dot
    * table + the ADC scan over the code frame, never the |corpus|×Ks
    * assignment sweep (the `servedIvfIndex` economics; codes written
    * LAST as the completion marker). The namespace carries the training
    * hyperparameters so a geometry/depth change re-builds instead of
    * serving a stale index.
    */
  private[graft] def servedPq(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/embeddings.parquet",
      s"graft_pq_m${PqM}_ks${PqKs}_r$PqLloydRounds")
    if (!store.hasTableSnapshot("pq_codes", ts)) {
      val book = trainPqBook(emb(spark, dir), PqLloydRounds, PqKs)
        .localCheckpoint()
      store.writeTableSnapshot(book, "pq_book", ts)
      store.writeTableSnapshot(pqCodes(emb(spark, dir), book), "pq_codes", ts)
    }
    (store.readTableSnapshot(spark, "pq_book", ts)
        .select(col("m"), col("code"), col("c_sub")),
      store.readTableSnapshot(spark, "pq_codes", ts)
        .select(col("vec_id"), col("m"), col("code")))
  }

  def topkPq(spark: SparkSession, dir: String): DataFrame = {
    val (book, codes) = servedPq(spark, dir)
    pqServe(emb(spark, dir), book, codes)
  }

  def topkPqCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkPq(spark, dir), emb(spark, dir))

  /** PQ with Lloyd-refined sub-space codebooks — the training-depth
    * dial, mirroring `topkIvfTrained`: each round reassigns every
    * sub-vector to its nearest code and recenters codes on their
    * members (per-(code, dim) mean via dimension explode; the tiny
    * M×Ks centroid frame is materialized per round so round r+1 plans
    * against r's RESULT). rounds = 0 is exactly the sampled-codebook
    * serving path. Float means make refined codebooks engine-specific
    * (like IVF's) — the exact re-rank keeps emitted cosines exact
    * regardless, so quality moves, correctness doesn't.
    */
  def topkPqTrained(spark: SparkSession, dir: String, lloydRounds: Int,
      ks: Int = PqKs, shortlist: Int = PqShortlist): DataFrame = {
    val e = emb(spark, dir)
    val book = trainPqBook(e, lloydRounds, ks)
    pqServe(e, book, pqCodes(e, book), shortlist)
  }

  /** Sampled seed codebook + `lloydRounds` refinement rounds: each round
    * reassigns every sub-vector to its nearest code and recenters codes
    * on their members (per-(code, dim) mean via dimension explode; the
    * tiny M×Ks centroid frame is materialized per round so round r+1
    * plans against r's RESULT, not a replay of its plan).
    */
  private[graft] def trainPqBook(e: DataFrame, lloydRounds: Int,
      ks: Int): DataFrame = {
    var book = pqSubvecs(e.where(col("vec_id") < ks))
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sub").as("c_sub"))
    for (_ <- 0 until lloydRounds) {
      val assigned = pqSubvecs(e).join(broadcast(book), Seq("m"))
        .select(col("vec_id"), col("m"), col("code"), col("sub"),
          pqL2(col("sub"), col("c_sub")).as("d2"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min_by(struct(col("code"), col("sub")),
          struct(col("d2"), col("code"))).as("a"))
        .select(col("m"), col("a.code").as("code"), col("a.sub").as("sub"))
      book = assigned
        .select(col("m"), col("code"), posexplode(col("sub"))
          .as(Seq("dim", "x")))
        .groupBy(col("m"), col("code"), col("dim"))
        .agg(avg(col("x")).as("mu"))
        .groupBy(col("m"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("dim"),
          col("mu")))), x => x("mu").cast("float")).as("c_sub"))
        .localCheckpoint()
    }
    book
  }

  /** IVF×PQ — the composed serving stack every production ANN deployment
    * actually runs at 100 TB (the composition both component scaladocs
    * point at): the query probes its `NProbe` nearest IVF cells, the
    * ADC scan runs over ONLY the probed cells' code rows (≈ corpus ·
    * NProbe/NList instead of the whole corpus — the factor PQ alone
    * can't buy), and the shortlist re-ranks by exact cosine. Both
    * indexes are the PERSISTED served artifacts (`servedIvfIndex`,
    * `servedPqBook`) — this operator adds no training of its own. The
    * probed cells partition-cover ≥ corpus/NList·NProbe vectors, so the
    * strict exactly-K value check applies (the IVF argument; shortlist
    * ≥ K a fortiori).
    */
  def topkIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val (cent, assigned) = servedIvfIndex(spark, dir)
    val (book, storedCodes) = servedPq(spark, dir)
    ivfPqServe(emb(spark, dir), cent, assigned, book, storedCodes)
  }

  /** The composed IVF×PQ serving stack served from the INCREMENTALLY
    * maintained artifacts (`servedIncStore`: base-trained centroids +
    * codebook, cells/codes extended by the insert step) — the round's
    * two flagships composed: corpus growth pays batch-proportional
    * inserts AND the production probe-ADC-rerank query path serves the
    * grown corpus without any retrain. Same strict exactly-K value
    * check (probed cells partition-cover the corpus), same recall floor
    * as the rebuilt composition in `sim_recall_audit`.
    */
  def topkIvfPqInc(spark: SparkSession, dir: String): DataFrame = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val cent = store.readTableSnapshot(spark, "ivf_centroids", tsIns)
      .select(col("cent_id"), col("cent_emb"))
    val cells = store.readTableSnapshot(spark, "ivf_cells", tsIns)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val book = store.readTableSnapshot(spark, "pq_book", tsIns)
      .select(col("m"), col("code"), col("c_sub"))
    val codes = store.readTableSnapshot(spark, "pq_codes", tsIns)
      .select(col("vec_id"), col("m"), col("code"))
    ivfPqServe(emb(spark, dir), cent, cells, book, codes)
  }

  def topkIvfPqIncCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkIvfPqInc(spark, dir), emb(spark, dir))

  /** Shared probe → cell-gated ADC → exact-rerank body over any served
    * (centroids, cell assignments, codebook, codes) artifact set.
    */
  private def ivfPqServe(e: DataFrame, cent: DataFrame, assigned: DataFrame,
      book: DataFrame, storedCodes: DataFrame): DataFrame = {
    val codes = storedCodes
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeK = udaf(new TopKAgg(NProbe))
    val probes = q.join(broadcast(cent), expr("true"))
      .select(col("query_id"), col("cent_id"),
        V.cosine(col("q_emb"), col("cent_emb")).as("ccos"))
      .groupBy(col("query_id"))
      .agg(probeK(col("cent_id"), col("ccos")).as("p"))
      .select(col("query_id"),
        explode(expr("transform(p, x -> x.id)")).as("cell"))
    val table = pqSubvecs(q.select(col("query_id").as("vec_id"),
      col("q_emb").as("embedding")))
      .join(broadcast(book), Seq("m"))
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        V.dot(col("sub"), col("c_sub")).as("pdot"))
    val shortK = udaf(new TopKAgg(PqShortlist))
    val shortlist = codes
      .join(broadcast(probes), Seq("cell")) // the cell gate: corpus/4 scanned
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(table), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      // ADC = Σ_m pdot in PINNED m order (sort the M-element buffer,
      // left-fold): a bare float sum(pdot) is shuffle-order-dependent
      // at the ULP, which would make the shortlist boundary engine-
      // specific and block the full dynamic oracle below
      .agg(aggregate(array_sort(collect_list(struct(col("m"), col("pdot")))),
        lit(0.0), (acc, x) => acc + x.getField("pdot")).as("adc"))
      .groupBy(col("query_id"))
      .agg(shortK(col("vec_id"), col("adc")).as("s"))
      .select(col("query_id"), explode(expr("transform(s, x -> x.id)"))
        .as("neighbor_id"))
    val topk = udaf(new TopKAgg(K))
    shortlist
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        V.cosine(col("q_emb"), col("n_emb")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  def topkIvfPqCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkIvfPq(spark, dir), emb(spark, dir))

  /** The shared PQ serving path over any (m, code, c_sub) codebook and
    * its pre-assigned (vec_id, m, code) frame.
    */
  private def pqServe(e: DataFrame, book: DataFrame, codes: DataFrame,
      shortlistK: Int = PqShortlist): DataFrame = {
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val table = pqSubvecs(q.select(col("query_id").as("vec_id"),
      col("q_emb").as("embedding")))
      .join(broadcast(book), Seq("m"))
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        V.dot(col("sub"), col("c_sub")).as("pdot"))
    val shortK = udaf(new TopKAgg(shortlistK))
    val shortlist = codes.join(broadcast(table), Seq("m", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      // m-ordered ADC fold — see ivfPqServe: pins the float sum order
      // so the shortlist is engine-exact and the dynamic oracle holds
      .agg(aggregate(array_sort(collect_list(struct(col("m"), col("pdot")))),
        lit(0.0), (acc, x) => acc + x.getField("pdot")).as("adc"))
      .groupBy(col("query_id"))
      .agg(shortK(col("vec_id"), col("adc")).as("s"))
      .select(col("query_id"), explode(expr("transform(s, x -> x.id)"))
        .as("neighbor_id"))
    val topk = udaf(new TopKAgg(K))
    shortlist
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        V.cosine(col("q_emb"), col("n_emb")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  // ------------------- incremental index maintenance (corpus growth)

  /** Incremental ANN index maintenance — the #1 operational cost of a
    * real embedding store (r12 verdict #3): `servedIvfIndex` /
    * `servedPq` train once per corpus VERSION, so a new embedding batch
    * used to force a full retrain of cells and codebook. The insert
    * path is pure serving arithmetic: assign the batch to the EXISTING
    * centroids (`assignCells`) and encode it against the EXISTING
    * codebook (`pqCodes`), then persist extended cells/codes as a NEW
    * immutable snapshot — the `minhashIncrementalStep` discipline
    * (history snapshots never mutate; the next batch reads the extended
    * ts; replayed batches are anti-joined out, so a step is
    * idempotent). Per-batch cost is batch-proportional for the compute
    * (|batch| × NLIST resp. |batch| × M·KS broadcast sweeps); the
    * snapshot write is the merged table (the lakehouse-MERGE economics
    * documented at `SnapshotStore.upsertTableSnapshot`).
    *
    * The DRIFT GATE makes "serve stale centroids forever" safe: an
    * insert-only index degrades when the data distribution moves, so
    * each insert reports (a) cell-size skew — max/mean cell population
    * after the insert; a batch the old centroids don't fit piles into
    * few cells — and (b) the batch's mean PQ quantization error against
    * the BASE corpus mean (stored at build time, so no base rescan);
    * either ratio past its threshold flips the `retrain` flag that
    * tells the pipeline to fall back to the full `servedIvfIndex` /
    * `servedPq` build. Thresholds sit well above the fixture's
    * same-distribution values (skew ~2, err ratio ~1) and the spec
    * plants a drifted batch to flip them.
    *
    * Fixture semantics: base = vec_id % 10 ≠ 9, batch = vec_id % 10 = 9
    * (the `minhashIncremental` split convention). Base training seeds
    * from the base corpus only; serving recall over the FULL corpus is
    * pinned in `sim_recall_audit` at the SAME floors as the full
    * rebuild — incremental ≡ rebuild at the floor.
    */
  private val IvfDriftSkewMax = 6.0
  private val PqDriftErrRatioMax = 2.0

  private def incBase(e: DataFrame): DataFrame =
    e.where(col("vec_id") % 10 =!= 9)
  private def incBatch(e: DataFrame): DataFrame =
    e.where(col("vec_id") % 10 === 9)

  /** PQ assignment that also returns the achieved L2 error — the drift
    * gate's signal. `pqCodes` = this minus the error column.
    */
  private def pqCodesErr(e: DataFrame, book: DataFrame): DataFrame =
    pqSubvecs(e).join(broadcast(book), Seq("m"))
      .select(col("vec_id"), col("m"), col("code"),
        pqL2(col("sub"), col("c_sub")).as("d2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(struct(col("code"), col("d2")),
        struct(col("d2"), col("code"))).as("a"))
      .select(col("vec_id"), col("m"), col("a.code").as("code"),
        col("a.d2").as("d2"))

  /** One corpus-growth step for the served IVF index: assign `batch` to
    * the `prevTs` centroids, write `nextTs` = cells ∪ the NOVEL batch
    * assignments (vectors already indexed are anti-joined out — a
    * replayed batch adds nothing), centroids copied forward unchanged.
    * Returns the added (vec_id, embedding, cell) frame.
    */
  private[graft] def ivfInsertStep(spark: SparkSession,
      store: graft.sources.SnapshotStore, batch: DataFrame,
      prevTs: String, nextTs: String): DataFrame = {
    val cent = store.readTableSnapshot(spark, "ivf_centroids", prevTs)
      .select(col("cent_id"), col("cent_emb"))
    val cells = store.readTableSnapshot(spark, "ivf_cells", prevTs)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val novel = batch.join(cells.select("vec_id"), Seq("vec_id"), "left_anti")
    val added = assignCells(novel, cent).localCheckpoint()
    store.writeTableSnapshot(cent, "ivf_centroids", nextTs)
    store.writeTableSnapshot(cells.unionByName(added), "ivf_cells", nextTs)
    added
  }

  /** One corpus-growth step for the served PQ index: encode `batch`
    * against the `prevTs` codebook, write `nextTs` = codes ∪ the novel
    * batch codes; the batch's mean quantization error lands alongside
    * as `pq_qerr_batch` for the drift gate. Returns the added
    * (vec_id, m, code, d2) frame.
    */
  private[graft] def pqInsertStep(spark: SparkSession,
      store: graft.sources.SnapshotStore, batch: DataFrame,
      prevTs: String, nextTs: String): DataFrame = {
    val book = store.readTableSnapshot(spark, "pq_book", prevTs)
      .select(col("m"), col("code"), col("c_sub"))
    val codes = store.readTableSnapshot(spark, "pq_codes", prevTs)
      .select(col("vec_id"), col("m"), col("code"))
    val novel = batch.join(codes.select("vec_id").distinct(),
      Seq("vec_id"), "left_anti")
    val added = pqCodesErr(novel, book).localCheckpoint()
    store.writeTableSnapshot(book, "pq_book", nextTs)
    store.writeTableSnapshot(
      codes.unionByName(added.select("vec_id", "m", "code")),
      "pq_codes", nextTs)
    store.writeTableSnapshot(added.agg(avg(col("d2")).as("qerr")),
      "pq_qerr_batch", nextTs)
    added
  }

  /** Base-train + one insert step, built once per corpus version:
    * returns (store, baseTs, insertedTs). The LAST write of the build
    * (`pq_qerr_batch` at the inserted ts) is the completion marker.
    */
  private def servedIncStore(spark: SparkSession, dir: String)
      : (graft.sources.SnapshotStore, String, String) = {
    val (store, ts) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$dir/embeddings.parquet",
      // `_sr` = seed-by-rank discipline: the seeding change is part of
      // the trained geometry, so it must change the snapshot address
      s"graft_annins_n${NList}_r${LloydRounds}_m${PqM}_ks${PqKs}_sr")
    val tsBase = s"${ts}_base"
    val tsIns = s"${ts}_ins"
    if (!store.hasTableSnapshot("pq_qerr_batch", tsIns)) {
      val e = emb(spark, dir)
      buildIncBase(spark, store, incBase(e), tsBase)
      ivfInsertStep(spark, store, incBatch(e), tsBase, tsIns)
      pqInsertStep(spark, store, incBatch(e), tsBase, tsIns)
    }
    (store, tsBase, tsIns)
  }

  /** Full base-index build (IVF centroids+cells, PQ book+codes, base
    * quantization error) at `ts` — the once-per-version training the
    * insert path amortizes away. Shared by `servedIncStore` and the
    * two-successive-batches spec.
    */
  private[graft] def buildIncBase(spark: SparkSession,
      store: graft.sources.SnapshotStore, base: DataFrame,
      ts: String): Unit = {
    // Seed by RANK, not absolute id (r13 ADVICE): `vec_id < NList` over
    // an arbitrary input frame under-seeds — the %10 base split drops
    // seed id 9 (15 of 16 centroids), and a maintainStep rebuild over a
    // corpus whose ids don't start near 0 could seed none. The NList
    // smallest vec_ids of THIS frame always exist when the corpus does;
    // the count is asserted so a too-small corpus fails loudly instead
    // of training a degenerate index.
    var cent = base.orderBy(col("vec_id")).limit(NList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint()
    require(cent.count() == NList,
      s"ANN base training needs >= $NList seed vectors")
    for (_ <- 0 until LloydRounds)
      cent = lloydStep(assignCells(base, cent)).localCheckpoint()
    store.writeTableSnapshot(cent, "ivf_centroids", ts)
    store.writeTableSnapshot(assignCells(base, cent), "ivf_cells", ts)
    val book = trainPqBook(base, PqLloydRounds, PqKs).localCheckpoint()
    store.writeTableSnapshot(book, "pq_book", ts)
    val baseCodes = pqCodesErr(base, book).localCheckpoint()
    store.writeTableSnapshot(baseCodes.select("vec_id", "m", "code"),
      "pq_codes", ts)
    store.writeTableSnapshot(baseCodes.agg(avg(col("d2")).as("qerr")),
      "pq_qerr", ts)
  }

  /** The insert report: per-cell before/added/after populations plus
    * the drift gate — rows-only (cell geometry is the engine-specific
    * Lloyd float means, like every served-index frame); its exact
    * invariants are the oracled `sim_index_insert_check` twin.
    */
  def indexInsert(spark: SparkSession, dir: String): DataFrame = {
    val (store, tsBase, tsIns) = servedIncStore(spark, dir)
    insertDriftReport(spark, store, tsBase, tsIns)
  }

  /** The per-cell report + drift gate over any (base ts, inserted ts)
    * snapshot pair — split from `indexInsert` so the spec can plant a
    * drifted batch and watch the gate flip.
    */
  private[graft] def insertDriftReport(spark: SparkSession,
      store: graft.sources.SnapshotStore, tsBase: String,
      tsIns: String): DataFrame = {
    val before = store.readTableSnapshot(spark, "ivf_cells", tsBase)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_before"))
    val after = store.readTableSnapshot(spark, "ivf_cells", tsIns)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_after"))
    val perCell = after.join(before, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_before"), lit(0L)).as("n_before"),
        (col("n_after") - coalesce(col("n_before"), lit(0L))).as("n_added"),
        col("n_after"))
    val skew = perCell.agg((max(col("n_after")).cast("double") /
      avg(col("n_after"))).as("skew"))
    val baseErr = store.readTableSnapshot(spark, "pq_qerr", tsBase)
      .select(col("qerr").as("base_qerr"))
    val batchErr = store.readTableSnapshot(spark, "pq_qerr_batch", tsIns)
      .select(col("qerr").as("batch_qerr"))
    perCell
      .crossJoin(broadcast(skew))
      .crossJoin(broadcast(baseErr))
      .crossJoin(broadcast(batchErr))
      .withColumn("err_ratio",
        // a zero-error base (every vector a codebook seed — tiny corpus)
        // makes any nonzero batch error infinite drift, not a crash; an
        // EMPTY insert (all-replay batch → null batch error) is calm
        coalesce(
          when(col("base_qerr") > 0, col("batch_qerr") / col("base_qerr"))
            .otherwise(when(col("batch_qerr") > 0,
              lit(Double.PositiveInfinity)).otherwise(lit(1.0))),
          lit(1.0)))
      .select(col("cell"), col("n_before"), col("n_added"), col("n_after"),
        round(col("skew"), 4).as("cell_skew"),
        (col("skew") > IvfDriftSkewMax).as("ivf_retrain"),
        round(col("err_ratio"), 4).as("pq_err_ratio"),
        (col("err_ratio") > PqDriftErrRatioMax).as("pq_retrain"))
  }

  /** Oracled exact invariants of the insert step: every batch vector
    * assigned exactly once (conservation), per-cell populations add up,
    * the code frame grew by exactly |batch| × M rows, and a replay
    * would add nothing (idempotence) — all independent of WHERE the
    * engine-specific centroids put each vector.
    */
  def indexInsertCheck(spark: SparkSession, dir: String): DataFrame = {
    val (store, tsBase, tsIns) = servedIncStore(spark, dir)
    val batch = incBatch(emb(spark, dir)).localCheckpoint()
    val cellsB = store.readTableSnapshot(spark, "ivf_cells", tsBase)
      .select(col("vec_id"), col("cell"))
    val cellsA = store.readTableSnapshot(spark, "ivf_cells", tsIns)
      .select(col("vec_id"), col("cell"))
    val added = cellsA.join(cellsB.select("vec_id"), Seq("vec_id"), "left_anti")
    val nBatch = batch.agg(count(lit(1)).as("n_batch"))
    val conservation = added.agg(
      (count(lit(1)) === countDistinct(col("vec_id"))).as("unique_assign"),
      count(lit(1)).as("n_added"))
    val monotone = cellsA.groupBy(col("cell")).agg(count(lit(1)).as("na"))
      .join(cellsB.groupBy(col("cell")).agg(count(lit(1)).as("nb")), Seq("cell"), "left")
      .join(added.groupBy(col("cell")).agg(count(lit(1)).as("nd")), Seq("cell"), "left")
      .agg(every(col("na") === coalesce(col("nb"), lit(0L)) +
        coalesce(col("nd"), lit(0L))).as("monotone_ok"))
    val codeGrowth = store.readTableSnapshot(spark, "pq_codes", tsIns)
      .agg(count(lit(1)).as("ca"))
      .crossJoin(store.readTableSnapshot(spark, "pq_codes", tsBase)
        .agg(count(lit(1)).as("cb")))
      .select((col("ca") - col("cb")).as("code_rows_added"))
    val replay = batch.join(cellsA, Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n_unindexed"))
    nBatch
      .crossJoin(broadcast(conservation))
      .crossJoin(broadcast(monotone))
      .crossJoin(broadcast(codeGrowth))
      .crossJoin(broadcast(replay))
      .select(col("n_batch"),
        (col("unique_assign") && col("n_added") === col("n_batch"))
          .as("conservation_ok"),
        col("monotone_ok"),
        (col("code_rows_added") === col("n_batch") * PqM)
          .as("pq_conservation_ok"),
        (col("n_unindexed") === 0L).as("replay_ok"))
  }

  val indexInsertCheckSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_batch,
      |       true AS conservation_ok, true AS monotone_ok,
      |       true AS pq_conservation_ok, true AS replay_ok
      |FROM embeddings WHERE vec_id % 10 = 9""".stripMargin

  /** Serve the FULL corpus from the incrementally-extended index: the
    * recall evidence that insert ≡ rebuild at the floor (the probed
    * cells still partition-cover the corpus, so the strict exactly-K
    * value check applies unchanged).
    */
  def topkIvfIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val cent = store.readTableSnapshot(spark, "ivf_centroids", tsIns)
      .select(col("cent_id"), col("cent_emb"))
    val cells = store.readTableSnapshot(spark, "ivf_cells", tsIns)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val q = emb(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    ivfSearch(q, cent, cells)
  }

  def topkIvfIncrementalCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkIvfIncremental(spark, dir), emb(spark, dir))

  def topkPqIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val book = store.readTableSnapshot(spark, "pq_book", tsIns)
      .select(col("m"), col("code"), col("c_sub"))
    val codes = store.readTableSnapshot(spark, "pq_codes", tsIns)
      .select(col("vec_id"), col("m"), col("code"))
    pqServe(emb(spark, dir), book, codes)
  }

  def topkPqIncrementalCheck(spark: SparkSession, dir: String): DataFrame =
    topkValueCheck(topkPqIncremental(spark, dir), emb(spark, dir))

  /** One full maintenance step — the ACTION the drift gate exists for:
    * insert `batch` (IVF + PQ, `prevTs` → `nextTs`), read the gate
    * against `baseTs`'s training-time error floor, and when either flag
    * fires REBUILD the index from the full extended corpus at
    * `${nextTs}_rb` (fresh Lloyd centroids + fresh codebook — the
    * fallback both retrain flags point at). Returns (servingTs,
    * retrained): callers serve from `servingTs` either way, so the
    * rotation is invisible to readers — the snapshot-pointer discipline.
    * Cost: batch-proportional serving arithmetic when calm; one
    * corpus-proportional rebuild exactly when the gate says the frozen
    * geometry stopped fitting (spec: a rebuilt index absorbs the
    * drifted direction, so the NEXT alien batch rides in calm).
    */
  private[graft] def maintainStep(spark: SparkSession,
      store: graft.sources.SnapshotStore, batch: DataFrame,
      baseTs: String, prevTs: String, nextTs: String): (String, Boolean) = {
    ivfInsertStep(spark, store, batch, prevTs, nextTs)
    pqInsertStep(spark, store, batch, prevTs, nextTs)
    val flags = insertDriftReport(spark, store, baseTs, nextTs)
      .select(col("ivf_retrain"), col("pq_retrain")).limit(1).collect()
    val retrain = flags.nonEmpty &&
      (flags(0).getBoolean(0) || flags(0).getBoolean(1))
    if (retrain) {
      val corpus = store.readTableSnapshot(spark, "ivf_cells", nextTs)
        .select(col("vec_id"), col("embedding"))
      buildIncBase(spark, store, corpus, s"${nextTs}_rb")
      (s"${nextTs}_rb", true)
    } else (nextTs, false)
  }

  /** The served artifacts COLLECTED for the stateless ingest projection:
    * NList centroid rows and M×Ks codebook rows — both bounded by
    * contract (16 resp. 512 rows), the LR-weights collect convention.
    */
  private[graft] def servedArtifactRows(spark: SparkSession, dir: String)
      : (Seq[(Long, Seq[Float])], Seq[(Int, Int, Seq[Float])]) = {
    val (cent, _) = servedIvfIndex(spark, dir)
    val (book, _) = servedPq(spark, dir)
    (cent.collect().toSeq.map(r =>
       (r.getLong(0), r.getSeq[Float](1))),
     book.collect().toSeq.map(r =>
       (r.getInt(0), r.getInt(1), r.getSeq[Float](2))))
  }

  /** Stateless ANN ingest projection over any (vec_id, embedding) frame
    * — the insert-on-arrival kernel: per row, the IVF cell (argmax
    * cosine over the literal centroid array, the `TopKAgg` tie-break:
    * score desc then id asc) and the M PQ codes (min L2 per sub-space,
    * code tie-break) as ONE codegen'd expression with zero aggregation
    * state. Because it aggregates nothing, the identical function body
    * serves the batch table and a landing STREAM (the `gopherMetrics`
    * convention — `CorpusStream.annIngestStream` is the streaming twin),
    * and parity with the batch `assignCells`/`pqCodes` paths is exact:
    * same cosine/L2 double arithmetic over the same artifacts, same tie
    * order, pinned row-for-row in StreamingSpec.
    */
  private[graft] def annIngestCols(embs: DataFrame,
      cents: Seq[(Long, Seq[Float])],
      book: Seq[(Int, Int, Seq[Float])]): DataFrame = {
    // One native evaluation per row (r14): the HOF composition
    // (transform + array_sort over 16 + M·Ks literal structs) allocated
    // and sorted ~530 boxed structs per vector — 40 s for a 20k-vector
    // single-task scan at sf1; `AnnAssign` runs the same double
    // arithmetic (CosineSim's fused fold, pqL2's sequential squares,
    // Spark's nulls-first/NaN-last struct order) as primitive loops.
    // CollapseProject leaves the non-cheap expression un-duplicated, so
    // it evaluates once per row despite the two field references.
    val assign = org.apache.spark.sql.graft.AnnAssign(
      col("embedding"), cents, book, PqM, PqDsub)
    embs.select(col("vec_id"), assign.as("a"))
      .select(col("vec_id"), col("a.cell").as("cell"),
        col("a.codes").as("codes"))
  }

  /** Batch form of the ingest projection (`annIngestCols` over the full
    * corpus against the served artifacts) — the assignment query an
    * embedding pipeline runs on every landed batch, EXPLODED to one
    * scalar row per (vector, sub-space): `(vec_id, cell, m, code)`.
    * The exploded shape exists for the verification boundary: the
    * driver's row canonicalization sorts scalar columns only (an
    * `array<int>` column crashed it — r13's one red row), and scalars
    * make the op FULLY oracled — `annIngestOracle` embeds the served
    * centroid/codebook geometry as DOUBLE literals (the
    * `dedup_semantic` literal-hyperplane trick applied to collected
    * Lloyd artifacts, which are bounded by contract at 16 + 512 rows)
    * and replays the same argmax-cosine / argmin-L2 double arithmetic
    * in DuckDB. The streaming twin keeps the compact `codes` array —
    * `annIngestCols` is unchanged.
    */
  def annIngest(spark: SparkSession, dir: String): DataFrame = {
    val (cents, book) = servedArtifactRows(spark, dir)
    // The assignment kernel is per-row HOF arithmetic (16 cosines +
    // M·Ks sub-space L2s), so wall-clock is bounded by input
    // parallelism, not data volume — and a single-file fixture arrives
    // as ONE scan task (sf1 measured 40 s single-task vs ~5 s spread).
    // The batch registration pays one small shuffle to spread the
    // corpus; the streaming twin keeps the exchange-free `annIngestCols`
    // (a stream's parallelism is its source partitioning).
    val embs = emb(spark, dir)
      .repartition(spark.sessionState.conf.numShufflePartitions)
    annIngestCols(embs, cents, book)
      .select(col("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("m", "code")))
  }

  /** The full-oracle twin of `annIngest`: DuckDB SQL with the served
    * centroids and codebook inlined as exact DOUBLE literals
    * (`Double.toString` round-trips, and DuckDB's decimal→double parse
    * is correctly rounded, so both engines see identical bits). Cell =
    * argmax cosine with the `TopKAgg` tie order (score desc, id asc),
    * expressed as `ORDER BY negcos ASC` to keep NaN-ordering identical
    * to Spark's struct sort (both engines sort NaN last ascending);
    * codes = argmin L2 per sub-space with code-asc ties. Same
    * sequential-left-fold double arithmetic as `duckCos`/`pqL2`.
    * Data-dependent (the literals are Lloyd artifacts of the corpus at
    * `dir`), so it is registered via `SparkEntry.dynamicOracleSql`,
    * not a static `Op` oracle.
    */
  private def dlist(xs: Seq[Float]): String =
    xs.map(f => f.toDouble.toString).mkString("[", ", ", "]")

  /** The literal-centroid cell-assignment CTE chain (cent → scored →
    * cellpick → cells(vec_id, cell)) — the oracle mirror of
    * `AnnAssign`'s cell half, shared by the ingest and drift oracles.
    */
  private def annCellsCtes(cents: Seq[(Long, Seq[Float])]): String = {
    val centVals = cents.map { case (id, e) =>
      s"(CAST($id AS BIGINT), CAST(${dlist(e)} AS DOUBLE[]))"
    }.mkString(",\n    ")
    s"""cent(cent_id, cent_emb) AS (
       |  SELECT * FROM (VALUES
       |    $centVals)
       |), scored AS (
       |  SELECT e.vec_id, c.cent_id,
       |         -(${duckCos("e.embedding", "c.cent_emb")}) AS negcos
       |  FROM embeddings e, cent c
       |), cellpick AS (
       |  SELECT vec_id, cent_id,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY negcos ASC, cent_id ASC) AS rn
       |  FROM scored
       |), cells AS (
       |  SELECT vec_id, cent_id AS cell FROM cellpick WHERE rn = 1
       |)""".stripMargin
  }

  /** The literal-codebook code-assignment CTE chain (book → subd →
    * codepick → pcodes(vec_id, m, code)) — the oracle mirror of
    * `pqCodes`/`AnnAssign`'s code half, shared by the ingest oracle and
    * the PQ-serve oracles below. Recomputing codes from the frozen
    * book equals the stored `pq_codes` for both the base and the
    * incrementally-extended snapshot (insert ≡ assignment).
    */
  private def pqCodesCtes(book: Seq[(Int, Int, Seq[Float])]): String = {
    val bookVals = book.map { case (m, c, sub) =>
      s"(CAST($m AS INTEGER), CAST($c AS INTEGER), CAST(${dlist(sub)} AS DOUBLE[]))"
    }.mkString(",\n    ")
    s"""book(m, code, c_sub) AS (
       |  SELECT * FROM (VALUES
       |    $bookVals)
       |), subd AS (
       |  SELECT e.vec_id, b.m, b.code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(e.embedding, b.m * $PqDsub + 1, b.m * $PqDsub + $PqDsub), b.c_sub),
       |           x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))) AS d2
       |  FROM embeddings e, book b
       |), codepick AS (
       |  SELECT vec_id, m, code,
       |         row_number() OVER (PARTITION BY vec_id, m
       |                            ORDER BY d2 ASC, code ASC) AS rn
       |  FROM subd
       |), pcodes AS (
       |  SELECT vec_id, m, code FROM codepick WHERE rn = 1
       |)""".stripMargin
  }

  def annIngestOracle(spark: SparkSession, dir: String): String = {
    val (cents, book) = servedArtifactRows(spark, dir)
    s"""WITH ${annCellsCtes(cents)}, ${pqCodesCtes(book)}
       |SELECT k.vec_id, cl.cell, k.m, k.code
       |FROM pcodes k JOIN cells cl ON k.vec_id = cl.vec_id""".stripMargin
  }

  /** Dynamic FULL oracles for the served-IVF search paths — the
    * `sim_ann_ingest` literal-artifact move applied to serving:
    * the served centroid geometry (bounded by contract at NList rows)
    * embeds as DOUBLE literals and DuckDB replays the ENTIRE serve
    * path — corpus cell assignment (recomputing cells from the frozen
    * centroids equals the stored `ivf_cells` because base assignment
    * and the incremental insert both use the same argmax kernel —
    * insert ≡ assignment), the per-query probe of the NProbe nearest
    * cells, and the exact top-K cosine rank with the TopKAgg tie order
    * (`cos DESC, id ASC`, the proven `topkBruteForceSql` ordering).
    * Upgrades `sim_topk_ivf` / `sim_topk_ivf_inc` from rows-only to
    * full hash parity; their strict exactly-K `_check` twins stay
    * registered. Data-dependent (the literals are Lloyd artifacts of
    * the corpus at `dir`), so registered via
    * `SparkEntry.dynamicOracleSql`, not a static `Op` oracle.
    */
  private def ivfTopkOracleSql(cents: Seq[(Long, Seq[Float])]): String =
    s"""WITH ${annCellsCtes(cents)}, q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < $NumQueries
       |), qscored AS (
       |  SELECT q.query_id, q.q_emb, c.cent_id,
       |         -(${duckCos("q.q_emb", "c.cent_emb")}) AS negcos
       |  FROM q, cent c
       |), qprobe AS (
       |  SELECT query_id, q_emb, cent_id AS cell,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY negcos ASC, cent_id ASC) AS rn
       |  FROM qscored
       |), cand AS (
       |  SELECT p.query_id, e.vec_id AS neighbor_id,
       |         ${duckCos("p.q_emb", "e.embedding")} AS cos
       |  FROM (SELECT query_id, q_emb, cell FROM qprobe
       |        WHERE rn <= $NProbe) p
       |       JOIN cells cl ON cl.cell = p.cell
       |       JOIN embeddings e ON e.vec_id = cl.vec_id
       |  WHERE e.vec_id != p.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC)
       |           AS rank
       |  FROM cand
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |       round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin

  def ivfTopkOracle(spark: SparkSession, dir: String): String = {
    val (cent, _) = servedIvfIndex(spark, dir)
    ivfTopkOracleSql(cent.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Float](1))))
  }

  def ivfTopkIncOracle(spark: SparkSession, dir: String): String = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val cent = store.readTableSnapshot(spark, "ivf_centroids", tsIns)
      .select(col("cent_id"), col("cent_emb"))
    ivfTopkOracleSql(cent.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Float](1))))
  }

  /** The query-side dot table + m-ordered ADC + shortlist + exact
    * re-rank — the oracle mirror of `pqServe`/`ivfPqServe`'s serve
    * stages. `adcFrom` supplies the candidate frame: the bare code
    * join (PQ) or the cell-gated join (IVF×PQ). The ADC sum replays
    * the engine's PINNED m-order left fold via
    * `list_sum(list(pdot ORDER BY m))`.
    */
  private def pqServeTail(adcFrom: String): String =
    s"""q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < $NumQueries
       |), qsub AS (
       |  SELECT q.query_id, b.m, b.code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(q.q_emb, b.m * $PqDsub + 1, b.m * $PqDsub + $PqDsub), b.c_sub),
       |           x -> CAST(x[1] AS DOUBLE) * x[2])) AS pdot
       |  FROM q, book b
       |), adc AS (
       |  $adcFrom
       |), short AS (
       |  SELECT query_id, vec_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc DESC, vec_id ASC) AS srn
       |  FROM adc
       |), cand AS (
       |  SELECT s.query_id, e.vec_id AS neighbor_id,
       |         ${duckCos("q.q_emb", "e.embedding")} AS cos
       |  FROM (SELECT query_id, vec_id FROM short
       |        WHERE srn <= $PqShortlist) s
       |       JOIN embeddings e ON e.vec_id = s.vec_id
       |       JOIN q ON q.query_id = s.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC)
       |           AS rank
       |  FROM cand
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |       round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin

  private def pqTopkOracleSql(book: Seq[(Int, Int, Seq[Float])]): String =
    s"""WITH ${pqCodesCtes(book)}, ${pqServeTail(
      s"""SELECT t.query_id, c.vec_id,
         |         list_sum(list(t.pdot ORDER BY t.m)) AS adc
         |  FROM pcodes c JOIN qsub t ON t.m = c.m AND t.code = c.code
         |  WHERE c.vec_id != t.query_id
         |  GROUP BY t.query_id, c.vec_id""".stripMargin)}""".stripMargin

  private def ivfPqTopkOracleSql(cents: Seq[(Long, Seq[Float])],
      book: Seq[(Int, Int, Seq[Float])]): String =
    s"""WITH ${annCellsCtes(cents)}, ${pqCodesCtes(book)}, qscored AS (
       |  SELECT e.vec_id AS query_id, c.cent_id,
       |         -(${duckCos("e.embedding", "c.cent_emb")}) AS negcos
       |  FROM embeddings e, cent c WHERE e.vec_id < $NumQueries
       |), qprobe AS (
       |  SELECT query_id, cent_id AS cell,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY negcos ASC, cent_id ASC) AS rn
       |  FROM qscored
       |), ${pqServeTail(
      s"""SELECT t.query_id, c.vec_id,
         |         list_sum(list(t.pdot ORDER BY t.m)) AS adc
         |  FROM pcodes c
         |       JOIN cells cl ON cl.vec_id = c.vec_id
         |       JOIN (SELECT query_id, cell FROM qprobe
         |             WHERE rn <= $NProbe) p ON p.cell = cl.cell
         |       JOIN qsub t ON t.query_id = p.query_id
         |            AND t.m = c.m AND t.code = c.code
         |  WHERE c.vec_id != p.query_id
         |  GROUP BY t.query_id, c.vec_id""".stripMargin)}""".stripMargin

  def pqTopkOracle(spark: SparkSession, dir: String): String = {
    val (book, _) = servedPq(spark, dir)
    pqTopkOracleSql(book.collect().toSeq.map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2))))
  }

  def pqTopkIncOracle(spark: SparkSession, dir: String): String = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val book = store.readTableSnapshot(spark, "pq_book", tsIns)
      .select(col("m"), col("code"), col("c_sub"))
    pqTopkOracleSql(book.collect().toSeq.map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2))))
  }

  def ivfPqTopkOracle(spark: SparkSession, dir: String): String = {
    val (cents, book) = servedArtifactRows(spark, dir)
    ivfPqTopkOracleSql(cents, book)
  }

  def ivfPqTopkIncOracle(spark: SparkSession, dir: String): String = {
    val (store, _, tsIns) = servedIncStore(spark, dir)
    val cents = store.readTableSnapshot(spark, "ivf_centroids", tsIns)
      .select(col("cent_id"), col("cent_emb")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val book = store.readTableSnapshot(spark, "pq_book", tsIns)
      .select(col("m"), col("code"), col("c_sub")).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    ivfPqTopkOracleSql(cents, book)
  }

  def annIngestCheck(spark: SparkSession, dir: String): DataFrame = {
    // one servedArtifactRows collect feeds both the checked frame and
    // the invariant constants (r13 ADVICE: annIngest re-collected them)
    val (cents, book) = servedArtifactRows(spark, dir)
    val centIds = cents.map(_._1).toSet
    val maxCode = book.map(_._2).max
    annIngestCols(emb(spark, dir), cents, book).agg(
      count(lit(1)).as("n_vectors"),
      every(col("cell").isInCollection(centIds)).as("cell_in_space"),
      every(expr(s"forall(codes, c -> c >= 0 AND c <= $maxCode)"))
        .as("codes_in_book"),
      every(size(col("codes")) === PqM).as("codes_complete"))
  }

  // ------------------------------------------- sim_embedding_drift

  /** χ² drift gate in integer MICRO-UNITS: flag threshold, chosen
    * between the fixture's same-distribution value (≤ ~200k — the %10
    * split over one distribution) and a planted alien batch (≥ ~10⁷,
    * spec-pinned). Units are parts-per-million fractions, so the
    * statistic is corpus-size-free.
    */
  private val DriftChi2MicroMax = 2000000L

  /** Embedding-distribution DRIFT between the history corpus and the
    * newest batch (%10 split, the `minhashIncremental` convention),
    * measured where an embedding pipeline actually feels it: the
    * served IVF cell histogram. Both slices are assigned to the SAME
    * frozen centroids (`AnnAssign`); per cell, Laplace-smoothed
    * parts-per-million occupancy of each slice and a χ²-style
    * contribution ((pb−ph)²/ph) — ALL arithmetic integer (BIGINT floor
    * division on ppm counts), so the op is engine-exact by
    * construction with no float sum-order or libm anywhere (the
    * `pagerankInt` micro-unit discipline applied to drift), and the
    * 16-row spine keeps empty cells present. FULLY oracled via the
    * dynamic literal-centroid oracle. This is the analytical
    * REGISTERED face of the maintenance loop's drift gate: the same
    * question (did the distribution move off the frozen geometry?),
    * answerable per corpus version without touching the store.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, book) = servedArtifactRows(spark, dir)
    val assign = org.apache.spark.sql.graft.AnnAssign(
      col("embedding"), cents, book, PqM, PqDsub)
    val cells = emb(spark, dir)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("vec_id"), assign.as("a"))
      .select(col("vec_id"), col("a.cell").as("cell"))
    val h = cells.where(col("vec_id") % 10 =!= 9)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_hist"))
    val b = cells.where(col("vec_id") % 10 === 9)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_batch"))
    import spark.implicits._
    val spine = cents.map(_._1).toDF("cell")
    val k = cents.length
    val w = Window.partitionBy()
    spine.join(h, Seq("cell"), "left").join(b, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_hist"), lit(0L)).as("n_hist"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"))
      .withColumn("nh_tot", sum(col("n_hist")).over(w))
      .withColumn("nb_tot", sum(col("n_batch")).over(w))
      .withColumn("ph_ppm", expr(
        s"CAST(1000000 * (n_hist + 1) DIV (nh_tot + $k) AS BIGINT)"))
      .withColumn("pb_ppm", expr(
        s"CAST(1000000 * (n_batch + 1) DIV (nb_tot + $k) AS BIGINT)"))
      .withColumn("chi2_contrib", expr(
        "CAST((pb_ppm - ph_ppm) * (pb_ppm - ph_ppm) " +
          "DIV greatest(ph_ppm, 1) AS BIGINT)"))
      .withColumn("chi2_total", sum(col("chi2_contrib")).over(w))
      .select(col("cell"), col("n_hist"), col("n_batch"),
        col("ph_ppm"), col("pb_ppm"), col("chi2_contrib"),
        col("chi2_total"),
        (col("chi2_total") > DriftChi2MicroMax).as("drifted"))
  }

  /** The dynamic oracle twin: the shared literal-centroid cell CTEs +
    * the same integer ppm/χ² arithmetic in DuckDB.
    */
  def embeddingDriftOracle(spark: SparkSession, dir: String): String = {
    val (cents, _) = servedArtifactRows(spark, dir)
    val k = cents.length
    val spineVals = cents.map(c => s"(CAST(${c._1} AS BIGINT))")
      .mkString(", ")
    s"""WITH ${annCellsCtes(cents)}, spine(cell) AS (
       |  SELECT * FROM (VALUES $spineVals)
       |), h AS (
       |  SELECT c.cell, count(*) AS n_hist FROM cells c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  WHERE e.vec_id % 10 != 9 GROUP BY 1
       |), b AS (
       |  SELECT c.cell, count(*) AS n_batch FROM cells c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  WHERE e.vec_id % 10 = 9 GROUP BY 1
       |), j AS (
       |  SELECT s.cell, COALESCE(n_hist, 0) AS n_hist,
       |         COALESCE(n_batch, 0) AS n_batch
       |  FROM spine s LEFT JOIN h ON h.cell = s.cell
       |  LEFT JOIN b ON b.cell = s.cell
       |), t AS (
       |  SELECT *, sum(n_hist) OVER () AS nh_tot,
       |         sum(n_batch) OVER () AS nb_tot
       |  FROM j
       |), p AS (
       |  SELECT cell, n_hist, n_batch,
       |         CAST(1000000 * (n_hist + 1) // (nh_tot + $k) AS BIGINT)
       |           AS ph_ppm,
       |         CAST(1000000 * (n_batch + 1) // (nb_tot + $k) AS BIGINT)
       |           AS pb_ppm
       |  FROM t
       |), c2 AS (
       |  SELECT *,
       |         CAST((pb_ppm - ph_ppm) * (pb_ppm - ph_ppm)
       |              // greatest(ph_ppm, 1) AS BIGINT) AS chi2_contrib
       |  FROM p
       |)
       |SELECT cell, n_hist, n_batch, ph_ppm, pb_ppm, chi2_contrib,
       |       CAST(sum(chi2_contrib) OVER () AS BIGINT) AS chi2_total,
       |       sum(chi2_contrib) OVER () > $DriftChi2MicroMax AS drifted
       |FROM c2""".stripMargin
  }

  val annIngestCheckSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
      |       true AS cell_in_space, true AS codes_in_book,
      |       true AS codes_complete
      |FROM embeddings""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("sim_ann_ingest", annIngest _, None),
    // dynamic literal-artifact oracle, like sim_ann_ingest
    Op("sim_embedding_drift", embeddingDrift _, None),
    Op("sim_ann_ingest_check", annIngestCheck _, Some(annIngestCheckSql)),
    Op("sim_index_insert", indexInsert _, None),
    Op("sim_index_insert_check", indexInsertCheck _,
      Some(indexInsertCheckSql)),
    Op("sim_topk_ivf_inc", topkIvfIncremental _, None),
    Op("sim_topk_ivf_inc_check", topkIvfIncrementalCheck _,
      Some(topkCheckSql)),
    Op("sim_topk_pq_inc", topkPqIncremental _, None),
    Op("sim_topk_pq_inc_check", topkPqIncrementalCheck _,
      Some(topkCheckSql)),
    Op("sim_topk_ivfpq_inc", topkIvfPqInc _, None),
    Op("sim_topk_ivfpq_inc_check", topkIvfPqIncCheck _,
      Some(topkCheckSql)),
    Op("sim_topk_pq", topkPq _, None),
    Op("sim_topk_pq_check", topkPqCheck _, Some(topkCheckSql)),
    Op("sim_topk_ivfpq", topkIvfPq _, None),
    Op("sim_topk_ivfpq_check", topkIvfPqCheck _, Some(topkCheckSql)),
    Op("sim_centroid_confusion", centroidConfusion _,
      Some(centroidConfusionSql)),
    Op("dedup_semantic", semanticDedup _, Some(semanticDedupSql)),
    Op("sim_knn_lsh", knnLsh _, Some(knnLshSql)),
    Op("sim_hard_negatives", hardNegatives _, Some(hardNegativesSql)),
    Op("sim_hard_negatives_ann", hardNegativesServed _, None),
    Op("sim_hard_negatives_ann_check", hardNegativesServedCheck _,
      Some(hardNegativesServedCheckSql)),
    Op("sim_label_noise", labelNoise _, Some(labelNoiseSql)),
    Op("sim_topk_bruteforce", topkBruteForce _, Some(topkBruteForceSql)),
    Op("emb_random_project", randomProject _, Some(randomProjectSql)),
    Op("sim_cosine_audit", cosineAudit _, Some(cosineAuditSql)),
    Op("sim_topk_quantized", topkQuantized _, Some(topkQuantizedSql)),
    Op("emb_quantize", quantize _, Some(quantizeSql)),
    Op("sim_label_centroids", labelCentroids _, Some(labelCentroidsSql)),
    Op("sim_topk_ivf", topkIvf _, None),
    Op("sim_topk_ivf_check", topkIvfCheck _, Some(topkCheckSql)),
    Op("sim_topk_lsh", topkLsh _, Some(topkLshSql)),
    Op("sim_topk_lsh_check", topkLshCheck _, Some(topkLshCheckSql)),
    Op("dedup_embedding_cosine", embeddingNearDup _, Some(embeddingNearDupSql)),
    Op("curate_contamination_emb", contaminationEmbedding _,
      Some(contaminationEmbeddingSql)),
    Op("sim_recall_audit", recallAudit _, Some(recallAuditSql)),
    Op("sim_mmr_diversify", mmrDiversify _, Some(mmrDiversifySql)),
    Op("sim_recall_curve", recallCurve _, None),
    Op("sim_nprobe_tune", nprobeTune _, None),
    Op("sim_recall_curve_check", recallCurveCheck _,
      Some(recallCurveCheckSql)),
  )

  // ---------------------------------------------------------------------
  // IVF recall/nprobe curve
  // ---------------------------------------------------------------------

  private final val CurveProbes = Seq(1, 2, 4, 8)

  /** Recall@K of the SERVED IVF index as a function of nprobe — the
    * tuning curve an operator reads before setting the latency/recall
    * dial in production (probing twice the cells costs ~2× scan for
    * the measured recall gain). One brute-force baseline, then four
    * searches against the SAME persisted index (training paid once by
    * the snapshot store); per-nprobe hits counted by semi-join against
    * the exact set. Rows-only (hit counts are index geometry); the
    * check twin pins what IS provable: hits MONOTONE in nprobe — a
    * displacing candidate must itself be an exact-top-K member, so
    * growing the probed pool can never lose a hit — and the served
    * floor at the production nprobe.
    */
  private def curveHits(spark: SparkSession, dir: String): DataFrame = {
    val exact = topkBruteForce(spark, dir)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val (cent, assigned) = servedIvfIndex(spark, dir)
    val q = emb(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val nEx = exact.agg(count(lit(1)).as("n_exact"))
    CurveProbes.map { np =>
      val hits = exact.join(
        ivfSearch(q, cent, assigned, np)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      broadcast(nEx).crossJoin(broadcast(hits))
        .select(lit(np.toLong).as("nprobe"), col("n_exact"), col("n_hits"))
    }.reduce(_ unionByName _)
  }

  def recallCurve(spark: SparkSession, dir: String): DataFrame =
    curveHits(spark, dir)
      .select(col("nprobe"), col("n_exact"), col("n_hits"),
        floor(col("n_hits").cast("double") / col("n_exact").cast("double")
          * lit(1000000.0) + lit(0.5)).as("recall_micro"))

  /** Dynamic FULL oracle for `sim_recall_curve`: with the served
    * centroids as literals, the recall-vs-nprobe curve is entirely
    * DuckDB-computable — one unnested nprobe spine drives the probe
    * depth, the per-(nprobe, query) IVF top-K intersects the
    * brute-force top-K, and the hit counts/ratios replay the same
    * integer+floor arithmetic. (The `_check` twin's monotone/floor
    * assertions stay registered; this pins the exact curve VALUES.)
    */
  def recallCurveOracle(spark: SparkSession, dir: String): String = {
    val (cent, _) = servedIvfIndex(spark, dir)
    val cents = cent.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Float](1)))
    val npList = CurveProbes.mkString("[", ", ", "]")
    s"""WITH ${annCellsCtes(cents)}, np AS (
       |  SELECT unnest($npList) AS nprobe
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < $NumQueries
       |), qscored AS (
       |  SELECT q.query_id, q.q_emb, c.cent_id,
       |         -(${duckCos("q.q_emb", "c.cent_emb")}) AS negcos
       |  FROM q, cent c
       |), qprobe AS (
       |  SELECT query_id, q_emb, cent_id AS cell,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY negcos ASC, cent_id ASC) AS rn
       |  FROM qscored
       |), cand AS (
       |  SELECT n.nprobe, p.query_id, e.vec_id AS neighbor_id,
       |         ${duckCos("p.q_emb", "e.embedding")} AS cos
       |  FROM np n
       |       JOIN qprobe p ON p.rn <= n.nprobe
       |       JOIN cells cl ON cl.cell = p.cell
       |       JOIN embeddings e ON e.vec_id = cl.vec_id
       |  WHERE e.vec_id != p.query_id
       |), appr AS (
       |  SELECT nprobe, query_id, neighbor_id
       |  FROM (SELECT nprobe, query_id, neighbor_id,
       |               row_number() OVER (PARTITION BY nprobe, query_id
       |                                  ORDER BY cos DESC, neighbor_id ASC)
       |                 AS rank
       |        FROM cand)
       |  WHERE rank <= $K
       |), bf AS (
       |  SELECT query_id, neighbor_id FROM ($topkBruteForceSql)
       |), hits AS (
       |  SELECT a.nprobe, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM appr a JOIN bf USING (query_id, neighbor_id)
       |  GROUP BY a.nprobe
       |)
       |SELECT CAST(n.nprobe AS BIGINT) AS nprobe,
       |       (SELECT CAST(count(*) AS BIGINT) FROM bf) AS n_exact,
       |       coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       |       CAST(floor(CAST(coalesce(h.n_hits, 0) AS DOUBLE) /
       |             (SELECT CAST(count(*) AS DOUBLE) FROM bf)
       |             * 1000000.0 + 0.5) AS BIGINT) AS recall_micro
       |FROM np n LEFT JOIN hits h ON h.nprobe = n.nprobe""".stripMargin
  }

  /** Auto-tune the serving probe depth from the engine's OWN recall
    * curve — the operational decision `sim_recall_curve` exists to
    * inform, made explicit as an operator: the smallest nprobe whose
    * measured recall@K meets the serving floor (0.7, the
    * `sim_recall_audit` floor), falling back to the widest probed
    * depth when none does. A production index maintenance loop runs
    * this after every rebuild/rotation to re-pick the probe depth the
    * SLO actually needs instead of serving a guessed constant — probe
    * cost scales linearly with nprobe, so the tune is the knob between
    * latency and the recall floor. Cost = the curve itself (the audit
    * economics: measuring recall IS the work).
    */
  def nprobeTune(spark: SparkSession, dir: String): DataFrame = {
    val floorMicro = math.round(IvfRecallFloor * 1e6)
    val c = recallCurve(spark, dir).localCheckpoint()
    val chosen = c.where(col("recall_micro") >= floorMicro)
      .agg(min(col("nprobe")).as("np_min"))
      .crossJoin(broadcast(c.agg(max(col("nprobe")).as("np_max"))))
      .select(coalesce(col("np_min"), col("np_max")).as("chosen_nprobe"),
        col("np_min").isNotNull.as("met_floor"))
    c.join(broadcast(chosen), col("nprobe") === col("chosen_nprobe"))
      .select(col("chosen_nprobe"), col("met_floor"), col("n_exact"),
        col("n_hits"), col("recall_micro"))
  }

  /** Dynamic oracle for [[nprobeTune]]: the recall-curve oracle wrapped
    * with the same smallest-passing / widest-fallback selection.
    */
  def nprobeTuneOracle(spark: SparkSession, dir: String): String = {
    val floorMicro = math.round(IvfRecallFloor * 1e6)
    s"""WITH curve AS (
       |${recallCurveOracle(spark, dir)}
       |), pick AS (
       |  SELECT coalesce(
       |           (SELECT min(nprobe) FROM curve
       |            WHERE recall_micro >= $floorMicro),
       |           (SELECT max(nprobe) FROM curve)) AS chosen_nprobe,
       |         (SELECT min(nprobe) FROM curve
       |          WHERE recall_micro >= $floorMicro) IS NOT NULL AS met_floor
       |)
       |SELECT p.chosen_nprobe, p.met_floor, c.n_exact, c.n_hits,
       |       c.recall_micro
       |FROM pick p JOIN curve c ON c.nprobe = p.chosen_nprobe""".stripMargin
  }

  def recallCurveCheck(spark: SparkSession, dir: String): DataFrame = {
    val h = curveHits(spark, dir)
    val byNp = CurveProbes.map(np =>
      h.where(col("nprobe") === np.toLong)
        .select(col("n_exact"), col("n_hits").as(s"h$np")))
    val one = byNp.reduce((a, b) =>
      broadcast(a).crossJoin(broadcast(b.drop("n_exact"))))
    one.select(col("n_exact"),
      (col("h1") <= col("h2") && col("h2") <= col("h4") &&
        col("h4") <= col("h8")).as("monotone_ok"),
      (col(s"h$NProbe").cast("double") / col("n_exact").cast("double")
        >= IvfRecallFloor).as("served_floor_ok"),
      (col("h8").cast("double") / col("n_exact").cast("double")
        >= IvfRecallFloor).as("widest_floor_ok"))
  }

  lazy val recallCurveCheckSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       true AS monotone_ok,
       |       true AS served_floor_ok,
       |       true AS widest_floor_ok
       |FROM ($topkBruteForceSql)""".stripMargin

  // ---------------------------------------------------------------------
  // MMR diversity re-ranking
  // ---------------------------------------------------------------------

  // `final` so they constant-fold at compile time: `ops` (declared above)
  // forces `mmrDiversifySql` during object init, before plain vals here
  // would have been assigned
  private final val MmrCands = 16
  private final val MmrPicks = 5

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
    * from each query's top-`MmrCands` exact-cosine candidates, greedily
    * pick `MmrPicks` results maximizing λ·rel(q,d) − (1−λ)·max_{s∈S}
    * sim(d,s) — the standard diversity-aware selection a training-data
    * pipeline uses to keep retrieved/mined examples from collapsing
    * onto near-duplicates (hard-negative mining, eval-set selection,
    * demonstration sampling).
    *
    * Scale shape: the expensive part is the candidate top-k, which is
    * the bounded-state `TopKAgg` scan (O(k) per task, same as
    * `sim_topk_bruteforce` and swappable for the served IVF path at
    * real scale); the greedy loop then runs on Q·C rows (bounded by
    * contract: queries × candidates, NOT corpus-sized) with Q·C²
    * pairwise sims, localCheckpointed once and probed per step. The
    * k-step sequential dependence is inherent to MMR; it runs on the
    * reduced frame, never the corpus.
    *
    * Determinism: rel and pairwise sims are the house bit-exact cosine
    * (sequential double accumulation ≡ DuckDB's list fold); each step's
    * argmax orders on (score DESC, id ASC) where score is the SAME
    * arithmetic tree in both engines, so selection is bit-deterministic
    * and the oracle UNROLLS the five steps as CTEs (the `curate_lr_train`
    * move applied to greedy selection).
    */
  def mmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val topc = udaf(new TopKAgg(MmrCands))
    val cand = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cid"),
        V.cosine(col("q_emb"), col("embedding")).as("rel"))
      .groupBy(col("query_id"))
      .agg(topc(col("cid"), col("rel")).as("top"))
      .select(col("query_id"), explode(col("top")).as("n"))
      .select(col("query_id"), col("n.id").as("cid"), col("n.score").as("rel"))
      .localCheckpoint()
    // pairwise sims among each query's candidates: Q·C² rows, bounded
    val ce = cand.select(col("cid")).distinct()
      .join(e, col("cid") === col("vec_id"))
      .select(col("cid"), col("embedding"))
    val pair = cand.select(col("query_id"), col("cid").as("aid"))
      .join(cand.select(col("query_id"), col("cid").as("bid")), Seq("query_id"))
      .where(col("aid") =!= col("bid"))
      .join(broadcast(ce.select(col("cid").as("aid"), col("embedding").as("ea"))),
        Seq("aid"))
      .join(broadcast(ce.select(col("cid").as("bid"), col("embedding").as("eb"))),
        Seq("bid"))
      .select(col("query_id"), col("aid"), col("bid"),
        V.cosine(col("ea"), col("eb")).as("sim"))
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cid").asc)
    var picks = cand
      .withColumn("score", lit(0.7) * col("rel"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("query_id"), col("cid"), col("rel"), col("score"),
        lit(1L).as("pick"))
      .localCheckpoint()
    for (i <- 2 to MmrPicks) {
      val selected = picks.select(col("query_id"), col("cid").as("bid"))
      val ms = pair.join(selected, Seq("query_id", "bid"))
        .groupBy(col("query_id"), col("aid"))
        .agg(max(col("sim")).as("m"))
        .select(col("query_id"), col("aid").as("cid"), col("m"))
      val sc = cand
        .join(picks.select(col("query_id"), col("cid")),
          Seq("query_id", "cid"), "left_anti")
        .join(ms, Seq("query_id", "cid"))
        .select(col("query_id"), col("cid"), col("rel"),
          (lit(0.7) * col("rel") - lit(0.3) * col("m")).as("score"))
      val p = sc.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("rel"), col("score"),
          lit(i.toLong).as("pick"))
      picks = picks.unionByName(p).localCheckpoint()
    }
    picks.select(col("query_id"), col("pick"), col("cid").as("neighbor_id"),
      round(col("score"), 6).as("mmr"), round(col("rel"), 6).as("cos"))
  }

  // lazy: referenced by the `ops` val declared above it
  lazy val mmrDiversifySql: String = {
    val base =
      s"""WITH cand AS (
         |  SELECT query_id, cid, rel FROM (
         |    SELECT q.vec_id AS query_id, x.vec_id AS cid,
         |           ${duckCos("q.embedding", "x.embedding")} AS rel,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCos("q.embedding", "x.embedding")} DESC,
         |                      x.vec_id ASC) AS rn
         |    FROM embeddings q, embeddings x
         |    WHERE q.vec_id < $NumQueries AND x.vec_id != q.vec_id)
         |  WHERE rn <= $MmrCands
         |), pair AS (
         |  SELECT a.query_id, a.cid AS aid, b.cid AS bid,
         |         ${duckCos("ea.embedding", "eb.embedding")} AS sim
         |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cid != b.cid
         |  JOIN embeddings ea ON ea.vec_id = a.cid
         |  JOIN embeddings eb ON eb.vec_id = b.cid
         |), pick1 AS (
         |  SELECT query_id, cid, rel, score, CAST(1 AS BIGINT) AS pick
         |  FROM (SELECT query_id, cid, rel, 0.7 * rel AS score,
         |               row_number() OVER (PARTITION BY query_id
         |                 ORDER BY 0.7 * rel DESC, cid ASC) AS rn FROM cand)
         |  WHERE rn = 1
         |), sel1 AS (SELECT query_id, cid FROM pick1)""".stripMargin
    val steps = (2 to MmrPicks).map { i =>
      val pv = i - 1
      s"""|, ms$i AS (
          |  SELECT p.query_id, p.aid AS cid, max(p.sim) AS m
          |  FROM pair p JOIN sel$pv s ON s.query_id = p.query_id AND s.cid = p.bid
          |  GROUP BY 1, 2
          |), sc$i AS (
          |  SELECT c.query_id, c.cid, c.rel, 0.7 * c.rel - 0.3 * m.m AS score
          |  FROM cand c JOIN ms$i m ON m.query_id = c.query_id AND m.cid = c.cid
          |  WHERE NOT EXISTS (SELECT 1 FROM sel$pv s
          |                    WHERE s.query_id = c.query_id AND s.cid = c.cid)
          |), pick$i AS (
          |  SELECT query_id, cid, rel, score, CAST($i AS BIGINT) AS pick
          |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          |          ORDER BY score DESC, cid ASC) AS rn FROM sc$i)
          |  WHERE rn = 1
          |), sel$i AS (SELECT query_id, cid FROM sel$pv
          |             UNION ALL SELECT query_id, cid FROM pick$i)""".stripMargin
    }.mkString("\n")
    val unions = (1 to MmrPicks)
      .map(i => s"SELECT * FROM pick$i").mkString(" UNION ALL ")
    s"""$base
       |$steps
       |SELECT query_id, pick, cid AS neighbor_id,
       |       round(score, 6) AS mmr, round(rel, 6) AS cos
       |FROM ($unions)""".stripMargin
  }
}
