package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Embedding-space near-dedup: all pairs with cosine ≥ τ, found via
    * hyperplane-LSH candidate generation + exact `CosineSim` verify —
    * never an all-pairs join (the previous broadcast nested-loop
    * formulation was O(n²) and the one operator here that died at 100×
    * scale).
    *
    * Banding math: a pair at angle θ agrees per sign-bit with
    * p = 1 − θ/π, so an 8-bit band collides with p⁸ and the pair is a
    * candidate with 1 − (1 − p⁸)^b over b bands. τ = 0.45 on this fixture
    * (max pairwise cosine ≈ 0.51 — random-ish vectors have no tight
    * duplicates, so the threshold sits where the operator has observable
    * output) gives p ∈ [0.649, 0.671]: a deliberately hard regime, so
    * b = 96 bands are needed for recall 1.0 and candidate volume is only
    * ~3× below all-pairs (verified empirically: 14/14 true pairs
    * collide, 33.6% of pairs become candidates at sf0.01). At a
    * production near-dup threshold (cos ≥ 0.85 ⇒ p = 0.824, p⁸ = 0.21)
    * the SAME structure with b = 32 misses a true pair with (0.79)³² ≈
    * 5e-4 while pruning background pairs ~30× — the parameters are the
    * dial, the shape scales.
    */
  private val DedupBands = 96
  private val DedupBitsPerBand = 8
  private val LshSeed = 1L

  /** (vec_id, sig) where sig(j) packs the 8 sign-bits of hyperplanes
    * 8j..8j+7 — one primitive per-partition pass, the same pattern as
    * Dedup.signatureBuckets (HOF formulations allocate boxed arrays per
    * bit and were measured 30× slower on the cosine path). Hyperplane
    * component h(p,d) is a centered 16-bit lattice value from a
    * splitmix64 mix of (seed + p·64 + d): seeded and deterministic, no
    * stored model, identical on every executor.
    */
  private def signBandSigs(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val (bands, bits, seed) = (DedupBands, DedupBitsPerBand, LshSeed)
    e.as[(Long, scala.collection.Seq[Float])]
      .mapPartitions { it =>
        def mix(v: Long): Long = {
          var z = v + 0x9E3779B97F4A7C15L
          z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
          z ^= (z >>> 27); z *= 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val nh = bands * bits
        val h = Array.tabulate(nh * 64) { i =>
          ((mix(seed + i) & 0xFFFFL) - 32768L).toDouble
        }
        it.flatMap { case (vecId, embS) =>
          if (embS == null || embS.isEmpty) None
          else {
            val v = embS.toArray
            val dim = math.min(v.length, 64)
            val sig = new Array[Int](bands)
            var p = 0
            while (p < nh) {
              var dot = 0.0
              var d = 0
              val base = p * 64
              while (d < dim) { dot += v(d) * h(base + d); d += 1 }
              if (dot >= 0) sig(p / bits) |= 1 << (p % bits)
              p += 1
            }
            Some((vecId, sig))
          }
        }
      }
      .toDF("vec_id", "sig")
  }

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // Candidate generation stays SKINNY: (vec_id, band, bucket) rows
    // only, so the (band, bucket) shuffle equi-join moves 16-byte rows,
    // not embeddings. A pair sharing k bands appears k times; distinct()
    // collapses that before any embedding is fetched. (The first
    // formulation carried both embeddings + both signatures through the
    // join and picked each pair's first shared band with per-row boxed
    // zip_with — measured 17× slower than this shape.)
    val bandRows = signBandSigs(e)
      .select(col("vec_id"), posexplode(col("sig")).as(Seq("band", "bucket")))
    val cands = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    // Embedding fetch + exact verify happen once per unique candidate.
    // No broadcast hints: AQE broadcasts the corpus side only while it
    // really is small.
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    cands.join(a, "vec_a").join(b, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        V.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= 0.45)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }

  val embeddingNearDupSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND ${duckCos("a.embedding", "b.embedding")} >= 0.45""".stripMargin

  /** IVF approximate top-k: cluster to NLIST deterministic centroids
    * (lowest vec_ids — a seeded sample), assign each vector to its
    * nearest centroid once, then answer queries by scanning only the
    * NPROBE nearest cells. Not SQL-oracled (approximate by design);
    * recall vs the brute-force baseline is asserted in the test suite.
    */
  private val NList = 16
  private val NProbe = 4

  def topkIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cent = e.where(col("vec_id") < NList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

    // Assignment pass: one broadcast-join scan, argmax cosine per vector.
    val maxCos = udaf(new TopKAgg(1))
    val assigned = e.join(broadcast(cent), expr("true"))
      .select(col("vec_id"), col("embedding"),
        col("cent_id"), V.cosine(col("embedding"), col("cent_emb")).as("ccos"))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(maxCos(col("cent_id"), col("ccos")).as("c"))
      .select(col("vec_id"), col("embedding"), col("c")(0)("id").as("cell"))

    // Probe pass: each query searches its NPROBE nearest cells only.
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeK = udaf(new TopKAgg(NProbe))
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

  private def hyperplaneBits(emb: String) = {
    // bit j = sign(Σ_d v_d · h(j,d)), h = centered 16-bit lattice noise
    // from xxhash64(j*4096+d) — cheap, seeded, identical for all rows.
    val bit = (j: Int) => {
      val terms = expr(
        s"""aggregate(zip_with($emb, sequence(0, 63),
           |  (v, d) -> CAST(v AS DOUBLE) * ((xxhash64($j * 4096 + d) & 65535) - 32768)),
           |  0D, (acc, x) -> acc + x)""".stripMargin)
      when(terms >= 0, 1L << j).otherwise(0L)
    }
    (0 until NBits).map(bit).reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
  }

  def topkLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val sigs = e.withColumn("sig", hyperplaneBits("embedding")).cache()
    def bands(df: DataFrame) = {
      val bandCols = (0 until NBits / BitsPerBand).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * BitsPerBand)
            .bitwiseAND((1L << BitsPerBand) - 1).as("bucket"))
      }
      df.select(col("vec_id"), col("embedding"), col("sig"),
        explode(array(bandCols: _*)).as("k"))
        .select(col("vec_id"), col("embedding"),
          col("k.band").as("band"), col("k.bucket").as("bucket"))
    }
    val q = bands(sigs.where(col("vec_id") < NumQueries))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("band"), col("bucket"))
    val topk = udaf(new TopKAgg(K))
    q.join(bands(sigs), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("q_emb"))
      .distinct() // a pair can share several bands
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cos"))
  }

  val ops: Seq[Op] = Seq(
    Op("sim_topk_bruteforce", topkBruteForce _, Some(topkBruteForceSql)),
    Op("sim_topk_ivf", topkIvf _, None),
    Op("sim_topk_lsh", topkLsh _, None),
    Op("dedup_embedding_cosine", embeddingNearDup _, Some(embeddingNearDupSql)),
  )
}
