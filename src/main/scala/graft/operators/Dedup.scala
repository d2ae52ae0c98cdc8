package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
      .select(col("canonical_id"), col("n_copies"), length(col("text")).cast("long").as("n_chars"))

  val exactSql: String =
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
      |       length(text) AS n_chars
      |FROM documents GROUP BY text""".stripMargin

  /** Incremental dedup — the production corpus-growth pattern: a new
    * batch is admitted only where its canonical fingerprint is absent
    * from the historical corpus AND first within the batch. The key here
    * is a 20-word-prefix fingerprint (md5 over the normalized leading
    * window) — prefix keys are the standard boilerplate/mirror-page
    * canonicalization, and unlike the full-text hash they actually fire
    * on this fixture's near-duplicate family. Shape: one groupBy on the
    * fingerprint (map-side combined) + one anti join against the
    * distinct historical keys; at 100 TB the historical side is the
    * persisted fingerprint store, the join shuffles on the hash key
    * (never the text), and nothing is broadcast by assumption — AQE can
    * still pick BHJ when the store is small. History/batch are split by
    * doc_id parity so the operator exercises both drop paths at any sf.
    */
  private val PrefixWords = 20

  /** (doc_id, fingerprint): the canonical 20-word-prefix key. */
  private def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(array_join(
        slice(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "),
          1, PrefixWords), " ")).as("fingerprint"))

  /** Admit `batch` rows whose fingerprint is first-in-batch AND absent
    * from `histFp` (a fingerprint-column frame — in production, the
    * persisted store). One map-side-combined groupBy on the hash + one
    * anti join; shuffles 16-byte keys, never text. */
  private[graft] def incrementalAgainst(batch: DataFrame,
      histFp: DataFrame): DataFrame =
    fingerprints(batch)
      .groupBy(col("fingerprint")).agg(min(col("doc_id")).as("doc_id"))
      .join(histFp.select(col("fingerprint")).distinct(), Seq("fingerprint"), "left_anti")
      .select(col("doc_id"), col("fingerprint"))

  /** One corpus-growth step against a persisted fingerprint store: admit
    * `batch` against the `prevTs` snapshot, then write `nextTs` =
    * history ∪ admitted. The admitted frame is localCheckpoint'd so the
    * caller's action does not recompute the anti join the store write
    * already ran. At warehouse scale the store is fingerprint-only
    * (16-byte keys — orders of magnitude smaller than the corpus) and the
    * union-distinct compaction can be replaced by an append-only
    * bucketed layout; the read/admit/extend contract is identical.
    */
  def incrementalStep(spark: SparkSession, store: graft.sources.SnapshotStore,
      batch: DataFrame, prevTs: String, nextTs: String): DataFrame = {
    val hist = store.readTableSnapshot(spark, "dedup_fp", prevTs)
      .select(col("fingerprint"))
    val admitted = incrementalAgainst(batch, hist).localCheckpoint()
    store.writeTableSnapshot(
      hist.union(admitted.select(col("fingerprint"))).distinct(), "dedup_fp", nextTs)
    admitted
  }

  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    // History/batch split by doc_id parity so both drop paths fire at
    // any sf. The historical fingerprints ROUND-TRIP through the
    // snapshot store — written once per corpus version (content-
    // addressed), then the batch anti-joins the STORED frame, exactly
    // the production corpus-growth pattern (fingerprint store persisted
    // between ingest batches, never re-derived from the corpus).
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark, s"$dir/documents.parquet", "graft_fpstore")
    if (!store.hasTableSnapshot("dedup_fp", ts))
      store.writeTableSnapshot(
        fingerprints(d.where(col("doc_id") % 2 === 0))
          .select(col("fingerprint")).distinct(),
        "dedup_fp", ts)
    incrementalAgainst(
      d.where(col("doc_id") % 2 === 1),
      store.readTableSnapshot(spark, "dedup_fp", ts))
  }

  val incrementalSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         md5(array_to_string(
       |           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[1:$PrefixWords],
       |           ' ')) AS fingerprint
       |  FROM documents
       |), hist AS (
       |  SELECT DISTINCT fingerprint FROM d WHERE doc_id % 2 = 0
       |), batch AS (
       |  SELECT fingerprint, min(doc_id) AS doc_id
       |  FROM d WHERE doc_id % 2 = 1 GROUP BY fingerprint
       |)
       |SELECT b.doc_id, b.fingerprint FROM batch b
       |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = b.fingerprint)""".stripMargin

  // ---------------------------------------------------------------- LSH core

  private val NumHashes = 64 // 16 bands × 4 rows
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** doc_id + the document's distinct shingle set, hashed to 64-bit
    * longs in the scan stage (`xxhash64`, codegen'd). Every downstream
    * stage — signatures, candidate join, exact-Jaccard verify — operates
    * on fixed-width longs instead of strings: set cardinalities are
    * preserved with overwhelming probability (within-document collision
    * odds ~|shingles|²/2⁶⁴), and the long-array intersect is ~5× cheaper
    * than string hashing per candidate pair.
    */
  /** Test seam for the incremental verify stage's candidates-only
    * contract: when set, `admitAgainst` threads this accumulator into
    * the HISTORY-side shingle pass, which adds 1 per history document it
    * actually scans. DedupSimilaritySpec asserts the count equals the
    * distinct candidate ids — not the corpus size. Never set outside
    * tests; `None` keeps the hot path accumulator-free.
    */
  @volatile private[graft] var histShingleProbe:
    Option[org.apache.spark.util.LongAccumulator] = None

  /** Hashing lives in `ShingleKernels` (one implementation, shared by
    * the codegen'd expression and the probe seam below). The default
    * path is the native `WordShingleHashes` expression — scan →
    * shingle stays inside whole-stage codegen, no Dataset encoder
    * boundary. The accumulator-probed mapPartitions path survives for
    * the incremental verify stage's candidates-only contract (the
    * accumulator must fire once per document actually scanned, which
    * only an imperative pass can promise); both paths share the SAME
    * kernel and a parity spec runs them against each other.
    */
  private[graft] def wordShingles(docs: DataFrame,
      probe: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    probe match {
      case None =>
        // guard on the CHEAP input condition, not isNotNull(shingles):
        // a null-filter on the computed column gets pushed below the
        // projection and evaluates the kernel twice per row in the
        // cache-build pass (seen in the executed plan). split-on-space
        // over the trimmed text counts words exactly as the kernel's
        // String.split(' ') does (trim kills the trailing-empty
        // divergence; interior empties count in both) — pinned by the
        // parity spec's consecutive-spaces and empty-text rows.
        docs.where(size(split(trim(col("text")), " ")) >= 3)
          .select(col("doc_id"),
            org.apache.spark.sql.graft.ShingleHash
              .wordShingleHashes(trim(col("text"))).as("shingles"))
      case Some(acc) =>
        val spark = docs.sparkSession
        import spark.implicits._
        docs.select(col("doc_id"), trim(col("text")).as("t"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.flatMap { case (docId, t) =>
              acc.add(1L)
              Option(org.apache.spark.sql.graft.ShingleKernels
                .wordShingleLongs(t)).map((docId, _))
            }
          }
          .toDF("doc_id", "shingles")
    }

  /** doc_id + distinct character-12-gram array. 12 chars spans ~2.5
    * words, which is what makes the grams discriminative: 5-grams mostly
    * fall inside single words, so same-vocabulary documents share ~20% of
    * them and LSH cannot separate signal from background.
    */
  private[graft] def charShingles(docs: DataFrame): DataFrame =
    docs.where(length(trim(col("text"))) >= 12)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.ShingleHash
          .charShingleHashes(trim(col("text"))).as("shingles"))

  /** (doc_id, band, bucket) rows from an imperative per-partition
    * signature pass. Three formulations were measured at sf0.1 on the
    * char-gram path before settling here:
    *   - explode + 64-column min aggregation: 23 s (shuffles
    *     |docs|·|shingles| rows; hash-agg on 64 long columns);
    *   - pure higher-order functions (transform/array_min, no shuffle):
    *     110 s — each row allocates 64 boxed |shingles|-element arrays
    *     and allocation dominates;
    *   - this mapPartitions loop over primitive arrays: the same
    *     arithmetic at memory speed, no shuffle, no boxing.
    * The hash family is per-slot multiply-shift hashing over the
    * pre-hashed shingle longs — internals only; candidate quality is all
    * that matters, the exact-Jaccard verify defines the output.
    */
  private[graft] def signatureBuckets(shingled: DataFrame): DataFrame =
    // Multiply-shift universal hashing with an independent seeded
    // (odd multiplier, offset) pair PER SIGNATURE SLOT — the family
    // rationale (and the measured rejection of explode+agg and of
    // higher-order-function formulations) lives at
    // `ShingleKernels.minhashBands`'s tight loop, now a native codegen
    // expression: reading the persisted shingle cache as primitive
    // ArrayData replaced this stage's former typed mapPartitions,
    // whose encoder decoded every shingle array into boxed rows.
    shingled.select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.ShingleHash
          .minhashBands(col("shingles"))))
      .toDF("doc_id", "band", "bucket")

  /** Hot-bucket bound for the text-LSH candidate stage (the r13
    * `dedup_semantic` anchor discipline applied to the shingle path):
    * a candidate pair must include one of its bucket's `LshBucketCap`
    * SMALLEST doc_ids (the bucket's anchors), so per-bucket pair volume
    * is O(cap · |bucket|) instead of |bucket|²/2 — a web-boilerplate
    * mega-family of 10⁵-10⁷ near-identical documents collides in EVERY
    * band (that is the point of LSH), and without the cap the candidate
    * frame goes quadratic in family size, the one 100 TB runaway shape
    * this file had left. The anchor rank is a window PARTITIONED by
    * (band, bucket) — sharded, never a global sort.
    */
  private val LshBucketCap = 64

  /** Companion OUTPUT bound, and the half of the cap the DuckDB oracle
    * can mirror exactly (the minhash geometry is runtime-hashed, so
    * unlike `dedup_semantic`'s literal hyperplanes the bucket ranks are
    * not SQL-expressible): of a document's confirmed J ≥ τ partners
    * with smaller ids, keep the `LshPairCap` smallest
    * (row_number over (PARTITION BY doc_b ORDER BY doc_a) ≤ cap). With
    * `LshPairCap` = `LshBucketCap`, capped candidates still produce the
    * EXACT ruled output on duplicate families of any size: a family's
    * bucket anchors are its smallest member ids, which are precisely
    * the partners the pair rule keeps — so the op stays hash-exact
    * against the mirrored oracle whether the cap fires or not. (The
    * adversarial exception — a bucket where ≥ cap smaller NON-matching
    * ids crowd out a true partner in every one of its ~16 colliding
    * bands at once — is the same probabilistic recall economics the
    * banding itself already accepts.) Every family member keeps its
    * pair to the family minimum (the smallest doc_a ranks first by
    * construction), so downstream clustering/weights/splits see the
    * same survivors.
    */
  private val LshPairCap = 64

  private[graft] def lshCandidates(shingled: DataFrame): DataFrame = {
    val buckets = signatureBuckets(shingled)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("doc_id"))
    val anchors = buckets.withColumn("rk", row_number().over(w))
      .where(col("rk") <= LshBucketCap)
      .select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
    anchors.join(
        buckets.select(col("doc_id").as("doc_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** The `LshPairCap` trim over a confirmed pair frame — applied by
    * every registered consumer of the LSH pair core and mirrored
    * verbatim (QUALIFY row_number) in their oracles.
    */
  private def lshPairRule(pairs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_b")).orderBy(col("doc_a"))
    pairs.withColumn("_pr", row_number().over(w))
      .where(col("_pr") <= LshPairCap).drop("_pr")
  }

  /** Exact-Jaccard verification of candidate pairs against shingle sets.
    * No broadcast hint: candidate volume is corpus-dependent (a crawl
    * snapshot with a 50% dup rate makes candidates O(corpus), not
    * "few"), so the joins shuffle on doc_a/doc_b and AQE is free to
    * downgrade to broadcast at runtime when the candidate set really is
    * small.
    */
  private def verifyJaccard(candidates: DataFrame, shingled: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccardSides(candidates, shingled, shingled, threshold)

  /** Two-sided variant: candidate (doc_a, doc_b) pairs verified against
    * separate shingle frames per side — the shape incremental ingest
    * needs, where doc_a is a new-batch document and doc_b a historical
    * one from a different (at scale: candidate-only fetched) frame.
    */
  private def verifyJaccardSides(candidates: DataFrame, aShingled: DataFrame,
      bShingled: DataFrame, threshold: Double): DataFrame = {
    val a = aShingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = bShingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates
      .join(a, "doc_a").join(b, "doc_b")
      // Size-ratio prefilter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a
      // cheap length test discards most spurious candidates before the
      // per-pair set intersection is ever computed.
      .where(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        greatest(size(col("sh_a")), size(col("sh_b"))) * threshold)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .where(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash+LSH near-dedup: word-3-shingle Jaccard ≥ 0.8 pairs.
    *
    * The shingle frame is persisted (four frames derive from it: the
    * bucket self-join's two sides and the verify join's two sides),
    * the small pair result is materialized eagerly, and the cache is
    * released before returning — a leaked corpus-sized shingle cache
    * would otherwise pin executor storage across every later query.
    */
  /** SERVED near-dup pair tables — the `domainLinks` derive-once
    * discipline applied to the LSH pair frames: the registered riders
    * (clusters, dedup weights, group-aware split, triangles, threshold
    * sweep, source overlap) each re-ran the full shingle → LSH →
    * verify chain because exchange reuse cannot cross queries, which
    * at sf0.1 cost ~1 s of pure recompute PER RIDER and at 100 TB
    * would re-shingle the corpus once per consumer. The pair frame is
    * now derived once per corpus version (content-addressed on the
    * documents source; the namespace folds the family parameters —
    * bands, caps, τ — so a semantic change can never serve a stale
    * artifact) and every consumer reads the stored table. This is the
    * dedup pipeline's production shape anyway: the dedup pass emits
    * pairs once, downstream jobs read them.
    */
  private def servedPairs(spark: SparkSession, dir: String, table: String,
      namespace: String)(compute: => DataFrame): DataFrame = {
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark, s"$dir/documents.parquet", namespace)
    if (!store.hasTableSnapshot(table, ts))
      store.writeTableSnapshot(compute, table, ts)
    store.readTableSnapshot(spark, table, ts)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    servedPairs(spark, dir, "minhash_pairs", "graft_mhpairs_b16c64p64t080") {
      val sh = wordShingles(Tables(spark, dir, "documents")).persist()
      try lshPairRule(verifyJaccard(lshCandidates(sh), sh, 0.8))
        .localCheckpoint()
      finally sh.unpersist()
    }

  /** Incremental MinHash near-dedup — the corpus-growth twin of
    * `minhashLsh`, the way near-dedup actually runs at 100 TB: the
    * historical corpus is represented by its PERSISTED band-bucket index
    * ((doc_id, band, bucket) — fixed 16 rows/doc regardless of text
    * size), a new batch LSHes only itself, and candidates come from
    * joining the batch's buckets against the STORED index — the corpus
    * is never re-shingled, never re-signed, never re-paired against
    * itself.
    *
    * Admission contract (deterministic, order-free, SQL-expressible —
    * near-dup equality is NOT transitive, so "first in batch" needs a
    * rule, not an ordering): a batch document is admitted iff
    *   1. it has no verified Jaccard ≥ 0.8 match in history, AND
    *   2. it is the canonical (min doc_id) member of its batch-internal
    *      near-dup cluster (connected components over verified batch
    *      pairs — one representative per novel family; a family whose
    *      canonical matched history is dropped entirely, the
    *      conservative reading of "this family is not novel").
    * Documents too short to shingle (< 3 words) cannot match anything
    * and are admitted — mirrored exactly by the oracle.
    *
    * History/batch split by doc_id parity like `incremental`, so both
    * drop paths and the store round-trip exercise at any sf. The verify
    * stage fetches only the CANDIDATE documents' texts — `admitAgainst`
    * semi-joins history to the candidate ids before shingling, so
    * per-batch history work is linear in the true-dup rate (the LSH
    * scaling argument at the top of this file), while the index side
    * stays stored longs.
    */
  /** Store-time twin of `LshBucketCap` for the PERSISTED band-bucket
    * index: a stored bucket keeps only its cap smallest doc_ids, so
    * the index row count per bucket — and therefore the batch×index
    * candidate join's per-bucket fan-out — is bounded IN THE ARTIFACT,
    * not just in the query (a web-boilerplate mega-family in history
    * would otherwise make every colliding batch document generate
    * |family| candidates). Admission only needs EXISTENCE of one
    * verified match, and a true near-dup of the family matches the
    * bucket's anchors (they are family members), so the cap preserves
    * the admit/reject decision on exactly the shapes it fires for —
    * the `lshCandidates` adjudication, applied to the store. The rank
    * runs as a map-side partial top-k (WindowGroupLimit), and at
    * fixture scale no bucket reaches the cap, so stored snapshots stay
    * byte-compatible.
    */
  private def capIndexBuckets(buckets: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("doc_id"))
    buckets.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= LshBucketCap).drop("_rk")
  }

  /** Namespace for the persisted band-bucket index. Folds
    * `LshBucketCap` because the cap is part of the ARTIFACT contract
    * ("≤ cap entries per bucket at every version") — the house rule
    * that a semantic-parameter change must never serve a stale
    * snapshot, same as the pair-table namespaces
    * (`graft_mhpairs_b16c64p64t080`).
    */
  private[graft] val LshStoreNamespace = s"graft_lshstore_c$LshBucketCap"

  def minhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val hist = d.where(col("doc_id") % 2 === 0)
    val batch = d.where(col("doc_id") % 2 === 1)
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark, s"$dir/documents.parquet", LshStoreNamespace)
    if (!store.hasTableSnapshot("lsh_index", ts))
      store.writeTableSnapshot(
        capIndexBuckets(signatureBuckets(wordShingles(hist))),
        "lsh_index", ts)
    admitAgainst(batch, hist,
      store.readTableSnapshot(spark, "lsh_index", ts))
  }

  /** One corpus-growth step for the near-dup index — the `incrementalStep`
    * twin: admit `batch` against the `prevTs` band-bucket index, then
    * write `nextTs` = stored index ∪ the ADMITTED documents' buckets, so
    * the next batch sees them as history. Only admitted docs extend the
    * index: a rejected near-dup must not become an anchor that rejects
    * future docs its canonical would have missed (the index stays exactly
    * "one entry per surviving document"). The admitted frame is
    * localCheckpoint'd by `admitAgainst`, so the store write and the
    * caller's action share one computation.
    */
  def minhashIncrementalStep(spark: SparkSession,
      store: graft.sources.SnapshotStore, batch: DataFrame, hist: DataFrame,
      prevTs: String, nextTs: String): DataFrame = {
    val index = store.readTableSnapshot(spark, "lsh_index", prevTs)
      .select(col("doc_id"), col("band"), col("bucket"))
    val admitted = admitAgainst(batch, hist, index)
    val admittedBuckets = signatureBuckets(
      wordShingles(batch.join(admitted, Seq("doc_id"), "left_semi")))
    // re-cap the union: admitted docs can push a stored bucket over
    // the bound across steps, and the artifact contract is "≤ cap
    // entries per bucket" at every version
    store.writeTableSnapshot(
      capIndexBuckets(index.unionByName(admittedBuckets)),
      "lsh_index", nextTs)
    admitted
  }

  /** The admission core shared by the query and the step: batch vs a
    * stored band-bucket index, exact-Jaccard verified, cluster-canonical
    * within the batch (contract documented at `minhashIncremental`).
    * `hist` supplies candidate texts for the verify stage — fetched for
    * CANDIDATES ONLY: the candidate pairs are computed first from the
    * batch's buckets against the stored index (no history text touched),
    * then `hist` is left-semi-joined to the distinct candidate `doc_b`
    * ids BEFORE shingling, so per-batch history work is O(|candidates|)
    * — linear in the true-dup rate — not O(|corpus|). The semi-join must
    * sit UPSTREAM of `wordShingles` because the shingle pass is an
    * opaque `mapPartitions` Catalyst cannot push a join through; pinned
    * by DedupSimilaritySpec via `histShingleProbe`.
    *
    * Replay idempotence: the candidate join drops `doc_a === doc_b`
    * pairs, so a batch document already present in the index (a replayed
    * batch) does not self-match at Jaccard 1.0 and reject itself — the
    * replay re-admits the same survivors.
    */
  private def admitAgainst(batch: DataFrame, hist: DataFrame,
      index: DataFrame): DataFrame = {
    val bsh = wordShingles(batch).persist()
    var hshRef: DataFrame = null
    var candRef: DataFrame = null
    try {
      val bb = signatureBuckets(bsh)
      // persist, not an eager checkpoint: the frame is read twice (the
      // candidate-id fetch feeding the semi-join, and the verify join)
      // but both reads live in the SAME final job, so a lazy cache
      // shares the computation without paying a separate materialization
      // barrier up front.
      val histCands = bb.as("x").join(index.as("y"),
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .persist()
      candRef = histCands
      val candIds = histCands.select(col("doc_b").as("doc_id")).distinct()
      val hsh = wordShingles(hist.join(candIds, Seq("doc_id"), "left_semi"),
        histShingleProbe).persist()
      hshRef = hsh
      val histMatched = verifyJaccardSides(histCands, bsh, hsh, 0.8)
        .select(col("doc_a").as("doc_id")).distinct()
      val batchPairs = verifyJaccard(lshCandidates(bsh), bsh, 0.8)
      // the components core consumes its input twice (edge build +
      // node set): materialize the verified pair frame once instead of
      // running the LSH-verify join both times (r17; the erClusters
      // adjudication applied here)
      val nonCanonical = Graph.connectedComponents(
          batchPairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
            .localCheckpoint())
        .where(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      batch.select(col("doc_id"))
        .join(histMatched, Seq("doc_id"), "left_anti")
        .join(nonCanonical, Seq("doc_id"), "left_anti")
        .localCheckpoint()
    } finally {
      bsh.unpersist()
      if (hshRef ne null) hshRef.unpersist()
      if (candRef ne null) candRef.unpersist()
    }
  }

  val minhashIncrementalSql: String = {
    val shingleExpr =
      """list_distinct([concat_ws(' ', words[i], words[i+1], words[i+2])
        |                for i in range(1, len(words) - 1)])""".stripMargin
        .replace("words", "string_split(trim(text), ' ')")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, $shingleExpr AS shingles
       |  FROM documents WHERE len(string_split(trim(text), ' ')) >= 3
       |), e AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT i.doc_a, i.doc_b
       |  FROM inter i
       |  JOIN sh sa ON sa.doc_id = i.doc_a
       |  JOIN sh sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.n AS DOUBLE) /
       |        (len(sa.shingles) + len(sb.shingles) - i.n) >= 0.8
       |), histmatch AS (
       |  SELECT DISTINCT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS doc_id
       |  FROM pairs WHERE (doc_a % 2) <> (doc_b % 2)
       |), bedges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  WHERE doc_a % 2 = 1 AND doc_b % 2 = 1
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |  WHERE doc_a % 2 = 1 AND doc_b % 2 = 1
       |), walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM bedges
       |  UNION
       |  SELECT w.u, e2.v FROM walk w JOIN bedges e2 ON e2.u = w.x
       |), noncanon AS (
       |  SELECT u AS doc_id FROM walk GROUP BY u HAVING u <> min(x)
       |)
       |SELECT doc_id FROM documents
       |WHERE doc_id % 2 = 1
       |  AND doc_id NOT IN (SELECT doc_id FROM histmatch)
       |  AND doc_id NOT IN (SELECT doc_id FROM noncanon)""".stripMargin
  }

  /** Oracle: the semantic spec — exact all-pairs shingle Jaccard ≥ τ,
    * trimmed by the contract's `LshPairCap` rank rule (QUALIFY mirrors
    * `lshPairRule` verbatim: per doc_b, the cap-many smallest confirmed
    * doc_a survive). (Quadratic, but the oracle only ever runs at
    * verify scale.)
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
       |      (len(sa.shingles) + len(sb.shingles) - p.inter) >= $threshold
       |QUALIFY row_number() OVER (PARTITION BY p.doc_b ORDER BY p.doc_a)
       |        <= $LshPairCap""".stripMargin

  val minhashLshSql: String = jaccardOracleSql(
    """list_distinct([concat_ws(' ', words[i], words[i+1], words[i+2])
      |                for i in range(1, len(words) - 1)])""".stripMargin
      .replace("words", "string_split(trim(text), ' ')"),
    "len(string_split(trim(text), ' ')) >= 3", 0.8)

  /** Character-12-gram Jaccard near-dedup on the same LSH machinery
    * (and the same persist → materialize → release hygiene).
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    servedPairs(spark, dir, "ngram_pairs", "graft_ngpairs_b16c64p64t080") {
      val sh = charShingles(Tables(spark, dir, "documents")).persist()
      try lshPairRule(verifyJaccard(lshCandidates(sh), sh, 0.8))
        .localCheckpoint()
      finally sh.unpersist()
    }

  val ngramJaccardSql: String = jaccardOracleSql(
    "list_distinct([substr(trim(text), i, 12) for i in range(1, length(trim(text)) - 10)])",
    "length(trim(text)) >= 12", 0.8)

  /** Inter-source duplication matrix — WHERE the near-duplication
    * lives, not just how much: confirmed char-12-gram Jaccard pairs
    * (the `dedup_ngram_jaccard` machinery verbatim — banded LSH
    * candidates, size-ratio prefilter, exact set-intersection confirm)
    * rolled up to unordered (source_a, source_b) cells with per-source
    * doc counts and the pair rate against the smaller side. The
    * corpus-mixing question every multi-source training run asks
    * (which crawls overlap which curated sets) answered from the pair
    * frame the dedup pass already computes — same banded economics,
    * one extra |pairs|-sized rollup, never all-pairs.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // rides the SERVED char-gram pair table — the same frame
    // `dedup_ngram_jaccard` derives; the rollup never re-shingles
    val pairs = ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val src = docs.select(col("doc_id"), col("source"))
    val cells = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
    val counts = src.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    cells.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
      .join(broadcast(counts.select(col("source").as("source_a"),
        col("n_docs").as("n_docs_a"))), Seq("source_a"))
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n_docs").as("n_docs_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_dup_pairs"),
        col("n_docs_a"), col("n_docs_b"),
        round(col("n_dup_pairs").cast("double") /
          least(col("n_docs_a"), col("n_docs_b")).cast("double"), 6)
          .as("overlap_rate"))
      .localCheckpoint()
  }

  val sourceOverlapSql: String =
    s"""WITH sh AS (
      |  SELECT doc_id,
      |         list_distinct([substr(trim(text), i, 12)
      |                        for i in range(1, length(trim(text)) - 10)])
      |           AS shingles
      |  FROM documents WHERE length(trim(text)) >= 12
      |), e AS (
      |  SELECT doc_id, unnest(shingles) AS s FROM sh
      |), prs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), conf AS (
      |  SELECT p.doc_a, p.doc_b
      |  FROM prs p
      |  JOIN sh sa ON sa.doc_id = p.doc_a
      |  JOIN sh sb ON sb.doc_id = p.doc_b
      |  WHERE CAST(p.inter AS DOUBLE) /
      |        (len(sa.shingles) + len(sb.shingles) - p.inter) >= 0.8
      |  QUALIFY row_number() OVER (PARTITION BY p.doc_b ORDER BY p.doc_a)
      |          <= $LshPairCap
      |), cells AS (
      |  SELECT least(da.source, db.source) AS source_a,
      |         greatest(da.source, db.source) AS source_b
      |  FROM conf
      |  JOIN documents da ON da.doc_id = conf.doc_a
      |  JOIN documents db ON db.doc_id = conf.doc_b
      |), counts AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1
      |)
      |SELECT c.source_a, c.source_b,
      |       CAST(count(*) AS BIGINT) AS n_dup_pairs,
      |       ca.n_docs AS n_docs_a, cb.n_docs AS n_docs_b,
      |       round(CAST(count(*) AS DOUBLE) /
      |             CAST(least(ca.n_docs, cb.n_docs) AS DOUBLE), 6)
      |         AS overlap_rate
      |FROM cells c
      |JOIN counts ca ON ca.source = c.source_a
      |JOIN counts cb ON cb.source = c.source_b
      |GROUP BY 1, 2, 4, 5""".stripMargin

  // ---------------------------------------------------------- containment

  /** Blocking knobs for containment — both part of the operator
    * CONTRACT (the oracle applies them identically), not hidden
    * heuristics: candidate pairs must share at least `ContainMinRare`
    * shingles whose corpus document-frequency is in
    * [2, `ContainRareMaxDf`]. The df cap bounds the inverted-index
    * self-join at cap·|shingle rows|; the overlap floor collapses the
    * coincidental-overlap tail this fixture's tiny vocabulary produces
    * (measured at sf0.1: floor 1 → 450 k candidates and a 15 s exact
    * verify; floor 16 → 232 candidates, while every true contained
    * pair shares HUNDREDS of rare shingles). A pair is findable iff it
    * clears the floor in the rare band — true for any genuinely
    * contained document, deliberately false for pairs whose overlap is
    * all template boilerplate (the line/span family's job).
    */
  private val ContainRareMaxDf = 10
  private val ContainMinRare = 16
  private val ContainThreshold = 0.8

  /** Asymmetric near-dup detection — CONTAINMENT |A∩B| / min(|A|,|B|)
    * over char-12-gram sets: catches a document swallowed whole by a
    * larger one (quote-wrapped reposts, doc-in-doc aggregation), where
    * symmetric Jaccard is low (a doc 10× larger than what it contains
    * scores J ≈ 0.1 and minhash banding rightly never pairs them).
    * Blocking therefore CANNOT ride the minhash index: candidates come
    * from the rare-shingle inverted index under the contract knobs
    * above, then exact set intersection confirms — the `crossSpans`
    * staging shape at shingle granularity.
    */
  def containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = charShingles(Tables(spark, dir, "documents")).persist()
    try {
      val e = sh.select($"doc_id", explode($"shingles").as("s"))
      val rare = e.groupBy("s").agg(count(lit(1)).as("df"))
        .where($"df" >= 2 && $"df" <= ContainRareMaxDf).select("s")
      val er = e.join(rare, "s")
      val cand = er.as("a").join(er.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("rare_overlap"))
        .where($"rare_overlap" >= ContainMinRare)
        .select("doc_a", "doc_b")
      val a = sh.select($"doc_id".as("doc_a"), $"shingles".as("sh_a"))
      val b = sh.select($"doc_id".as("doc_b"), $"shingles".as("sh_b"))
      cand.join(a, "doc_a").join(b, "doc_b")
        // a containment ≥ t pair shares ≥ t·|smaller| shingles — the
        // cheap size test cannot prune here (smaller side can be ANY
        // size), so the exact intersect runs on every candidate
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("containment", round($"inter".cast("double") /
          least(size($"sh_a"), size($"sh_b")), 6))
        .withColumn("jaccard", round($"inter".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"inter"), 6))
        .where($"inter".cast("double") /
          least(size($"sh_a"), size($"sh_b")) >= ContainThreshold)
        .select($"doc_a", $"doc_b", $"containment", $"jaccard")
        .localCheckpoint()
    } finally sh.unpersist()
  }

  val containmentSql: String = {
    val shingleExpr =
      "list_distinct([substr(trim(text), i, 12) " +
        "for i in range(1, length(trim(text)) - 10)])"
    s"""WITH sh AS MATERIALIZED (
       |  SELECT doc_id, $shingleExpr AS shingles
       |  FROM documents WHERE length(trim(text)) >= 12
       |), e AS MATERIALIZED (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), rare AS (
       |  SELECT s FROM e GROUP BY s
       |  HAVING count(*) BETWEEN 2 AND $ContainRareMaxDf
       |), cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  WHERE a.s IN (SELECT s FROM rare)
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $ContainMinRare
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN e ea ON ea.doc_id = c.doc_a
       |  JOIN e eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc_a, i.doc_b,
       |       round(CAST(i.inter AS DOUBLE) /
       |             least(len(sa.shingles), len(sb.shingles)), 6)
       |         AS containment,
       |       round(CAST(i.inter AS DOUBLE) /
       |             (len(sa.shingles) + len(sb.shingles) - i.inter), 6)
       |         AS jaccard
       |FROM inter i
       |JOIN sh sa ON sa.doc_id = i.doc_a
       |JOIN sh sb ON sb.doc_id = i.doc_b
       |WHERE CAST(i.inter AS DOUBLE) /
       |      least(len(sa.shingles), len(sb.shingles)) >= $ContainThreshold"""
      .stripMargin
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: per-word xxhash64, sign-vote each bit,
    * plus the Hamming-ball band keys (4×16-bit) used to find candidate
    * pairs at distance ≤ 3 without an all-pairs scan. No DuckDB xxhash64
    * twin exists, so this op is rows-only checked by the driver and
    * property-tested in the suite.
    *
    * One `mapPartitions` pass (the `signatureBuckets` pattern): tokenize,
    * hash with Spark's own XXH64 (seed 42 — identical values to the SQL
    * `xxhash64` function), accumulate the 64 sign-votes in a primitive
    * int array, emit signature + band keys. The previous formulation —
    * explode every word and run a 64-column conditional-sum hash
    * aggregate — shuffled |corpus words| rows and was the slowest query
    * in the round-1 bench (10.4 s of 49.3 s); this pass shuffles
    * nothing.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    Tables(spark, dir, "documents")
      // Null texts are dropped, matching the explode(split(...))
      // formulation this pass replaced (explode emits nothing for a
      // null array) — without the filter the typed decode would NPE.
      .where(col("text").isNotNull)
      .select(col("doc_id"), trim(col("text")).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, t) =>
          val votes = new Array[Int](64)
          // Same tokenization as split(trim(text), ' '): every
          // space-delimited segment, including empties from runs of
          // spaces (the trim removes leading/trailing ones).
          var start = 0
          var i = 0
          val n = t.length
          while (i <= n) {
            if (i == n || t.charAt(i) == ' ') {
              val u = UTF8String.fromString(t.substring(start, i))
              val h = XXH64.hashUnsafeBytes(
                u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
              var j = 0
              while (j < 64) {
                if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
                j += 1
              }
              start = i + 1
            }
            i += 1
          }
          var sig = 0L
          var j = 0
          while (j < 64) {
            if (votes(j) >= 0) sig |= 1L << j
            j += 1
          }
          (docId, sig, sig & 0xFFFFL, (sig >>> 16) & 0xFFFFL,
            (sig >>> 32) & 0xFFFFL, (sig >>> 48) & 0xFFFFL)
        }
      }
      .toDF("doc_id", "simhash", "band0", "band1", "band2", "band3")
  }

  /** Internal-consistency oracle for simhash (the values-if-present
    * pattern): recompute signatures for a fixed doc sample with the
    * DECLARATIVE formulation — explode(split) → SQL `xxhash64` →
    * 64-column sign-vote aggregate, the shape the primitive pass
    * replaced — and count bit-for-bit agreements. Two independent
    * implementations of the same spec must agree exactly; the DuckDB
    * twin pins the sample size from the raw table, turning
    * "the fast pass computes real simhashes" into a driver-checkable
    * claim. Sampled (doc_id < SimhashCheckDocs) because the declarative
    * twin shuffles |words| rows — it exists to cross-check the hot
    * path, not to run at corpus scale.
    */
  private val SimhashCheckDocs = 50

  def simhashCheck(spark: SparkSession, dir: String): DataFrame = {
    val sample = simhash(spark, dir).where(col("doc_id") < SimhashCheckDocs)
    val words = Tables(spark, dir, "documents")
      .where(col("text").isNotNull && col("doc_id") < SimhashCheckDocs)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val declarative = words.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash2"))
    sample.join(declarative, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("simhash") === col("simhash2"), 1)).as("n_sig_match"))
  }

  val simhashCheckSql: String =
    s"""SELECT count(*) AS n_docs, count(*) AS n_sig_match
       |FROM documents
       |WHERE text IS NOT NULL AND doc_id < $SimhashCheckDocs""".stripMargin

  /** SimHash near-dup pairs: Hamming distance ≤ 3 on the 64-bit
    * signatures (the classic 64-bit/d=3 setting). Banding gives the
    * candidates losslessly by pigeonhole: ≤ 3 differing bits cannot
    * touch all four 16-bit bands, so every qualifying pair agrees
    * exactly on at least one band key; `bit_count(xor)` verifies.
    * Rows-only for the driver (xxhash64 has no DuckDB twin); behavioral
    * checks live in the test suite.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhash(spark, dir).persist()
    try {
      val bands = (0 to 3).map { b =>
        sig.select(col("doc_id"), lit(b).as("band"), col(s"band$b").as("key"))
      }.reduce(_.unionAll(_))
      val cands = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val a = sig.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
      val b = sig.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
      // No broadcast hint (candidate volume is corpus-dependent; AQE can
      // still pick broadcast at runtime when it really is small).
      cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .where(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .localCheckpoint() // materialize, then release the signature cache
    } finally sig.unpersist()
  }

  /** Harness-checkable contract for `simhashPairs` — pins the "lossless
    * d ≤ 3 banding" claim made above, which was the one registered query
    * with no CORRECTNESS row (r5 verdict #1). Two invariants, both
    * computed Spark-side and pinned to constants by the DuckDB twin:
    *
    *  1. Soundness over the FULL corpus: every emitted pair really is at
    *     Hamming distance ≤ 3, recomputed here from fresh signatures
    *     rather than trusted from the pair frame's own `hamming` column
    *     (`n_bad_hamming_full` must be 0).
    *  2. Completeness on a bounded subset (doc_id < PairsCheckDocs): the
    *     quadratic all-pairs bit_count scan — the formulation banding
    *     exists to avoid — finds no qualifying pair the banding missed
    *     (`n_missed` = 0), and the two pair sets have equal cardinality
    *     (`n_diff` = 0; together with n_missed = 0 and banded ⊆ quadratic
    *     from invariant 1, that is set equality).
    *
    * The oracle can state these zeros without a DuckDB xxhash64 because
    * the invariants are implementation-independent; `n_subset_docs` comes
    * from the raw table so the row is anchored to real data rather than
    * being a tautology. Quadratic work is bounded by contract:
    * PairsCheckDocs² comparisons, never corpus².
    */
  private val PairsCheckDocs = 200

  def simhashPairsCheck(spark: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairs(spark, dir) // already localCheckpointed
    val sig = simhash(spark, dir).select(col("doc_id"), col("simhash")).persist()
    try {
      val re = pairs
        .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("ra")),
          "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("rb")),
          "doc_b")
        .select(bit_count(col("ra").bitwiseXOR(col("rb"))).as("h2"))
      val bad = re.agg(count(when(col("h2") > 3, 1)).as("n_bad_hamming_full"))

      val sub = sig.where(col("doc_id") < PairsCheckDocs)
      val quad = sub.as("x")
        .join(broadcast(sub.as("y")), col("x.doc_id") < col("y.doc_id"))
        .where(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= 3)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val bandedSub = pairs
        .where(col("doc_a") < PairsCheckDocs && col("doc_b") < PairsCheckDocs)
        .select(col("doc_a"), col("doc_b"))
      val missed = quad
        .join(bandedSub, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      val diff = quad.agg(count(lit(1)).as("nq"))
        .crossJoin(broadcast(bandedSub.agg(count(lit(1)).as("nb"))))
        .select((col("nq") - col("nb")).as("n_diff"))
      val nDocs = Tables(spark, dir, "documents")
        .where(col("text").isNotNull && col("doc_id") < PairsCheckDocs)
        .agg(count(lit(1)).as("n_subset_docs"))

      nDocs.crossJoin(broadcast(diff)).crossJoin(broadcast(missed))
        .crossJoin(broadcast(bad))
        .select(col("n_subset_docs"), col("n_diff"), col("n_missed"),
          col("n_bad_hamming_full"))
    } finally sig.unpersist()
  }

  val simhashPairsCheckSql: String =
    s"""SELECT count(*) AS n_subset_docs,
       |       CAST(0 AS BIGINT) AS n_diff,
       |       CAST(0 AS BIGINT) AS n_missed,
       |       CAST(0 AS BIGINT) AS n_bad_hamming_full
       |FROM documents
       |WHERE text IS NOT NULL AND doc_id < $PairsCheckDocs""".stripMargin

  /** Near-duplicate clustering: connected components over the MinHash
    * pair graph, labeling every involved document with its component's
    * minimum doc_id — the step that turns pairwise similarity into
    * "keep one survivor per duplicate group", and transitivity is the
    * point (A~B, B~C ⇒ one group even when A~C was never measured).
    *
    * The labeling loop itself — min-label propagation with pointer
    * jumping, log-diameter rounds, per-round cache hygiene, throws on
    * non-convergence — lives in `Graph.connectedComponents` (shared with
    * the ship-graph `graph_components` operator); every frame in it is
    * over the pair graph only, tiny relative to the corpus. The oracle
    * states the same fixpoint as a recursive reachability CTE.
    */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    Graph.connectedComponents(
      minhashLsh(spark, dir).select(col("doc_a").as("u"), col("doc_b").as("v")))
      .select(col("id").as("doc_id"), col("label").as("canonical_id"))

  val clustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |${minhashLshSql}
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |), walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |)
       |SELECT u AS doc_id, min(x) AS canonical_id FROM walk GROUP BY u""".stripMargin

  /** Keep-best dedup: where `exact` keeps the MIN id per duplicate group,
    * production pipelines keep the best REPRESENTATIVE — here the longest
    * document (quality stand-in), id as tiebreak. One shuffle on the
    * normalized-text fingerprint; the rank and the group count share that
    * window partitioning, so no second exchange. At 100 TB this is the
    * canonical "collapse mirrors, keep the richest copy" step and the key
    * is the 16-byte md5, never the text.
    */
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    // md5(NULL) is NULL in both engines, so null-text documents would
    // all share one NULL fingerprint group and collapse to a single
    // survivor despite not being duplicates of each other (ADVICE r4).
    // A null-text doc gets a per-doc key instead — it survives alone.
    // (Empty-STRING texts still hash to the md5('') group: identical
    // content is a genuine duplicate set.)
    val fp = when(col("text").isNull,
      concat(lit("null:"), col("doc_id").cast("string")))
      .otherwise(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
    val byFp = Window.partitionBy(col("fp"))
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), fp.as("fp"))
    d.withColumn("rk", row_number().over(
        byFp.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("fp"), col("n_chars"), col("n_dups"))
  }

  val keepBestSql: String =
    """WITH f AS (
      |  SELECT doc_id, n_chars,
      |         CASE WHEN text IS NULL THEN 'null:' || CAST(doc_id AS VARCHAR)
      |              ELSE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |         END AS fp
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, fp, n_chars,
      |         row_number() OVER (PARTITION BY fp
      |           ORDER BY n_chars DESC, doc_id ASC) AS rk,
      |         count(*) OVER (PARTITION BY fp) AS n_dups
      |  FROM f
      |)
      |SELECT doc_id, fp, n_chars, n_dups FROM r WHERE rk = 1""".stripMargin

  // ---------------------------------------------- repeated-span scoring
  /** Words per span — the scale at which a shared phrase stops being
    * coincidence and starts being boilerplate/memorization. */
  // Package-visible for the same reason as BoilerSegWords: the stream
  // flag (`CorpusStream.spanFlagStream`) must gram at the width the
  // bloom was built with.
  private[graft] val SpanGram = 8

  /** Per-document repeated-span statistics — the corpus-vs-corpus form
    * of exact-substring dedup scoring: for every document, how many of
    * its distinct 8-word spans also appear in ANY other document, and
    * what fraction of the document that is (the signal span-level
    * dedup/memorization filters cut on).
    *
    * Shape at scale: per-doc distinctness is established MAP-SIDE
    * (`array_distinct` before the explode), so no (doc, gram) shuffle
    * ever happens; the exchanges that remain carry 16-byte gram hashes
    * — (1) partition by gram for the doc-frequency count, (2) the
    * partial-aggregated per-doc rollup. A gram-keyed exchange over the
    * corpus is the cost FLOOR of corpus-vs-corpus exact overlap — no
    * broadcast reduction exists here, unlike `curate_contamination`
    * where the benchmark side is bounded.
    */
  def repeatedNgrams(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .where(size(col("w")) >= SpanGram)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(w) - ${SpanGram - 1}), " +
          s"i -> md5(concat_ws(' ', slice(w, i, $SpanGram)))))")).as("g"))
    grams
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("nd") >= 2, lit(1))).as("n_dup_grams"))
      .withColumn("dup_frac",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
  }

  val repeatedNgramsSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
       |  WHERE len(string_split(trim(text), ' ')) >= $SpanGram
       |), g AS (
       |  SELECT DISTINCT doc_id,
       |         md5(array_to_string(list_slice(w, i, i + ${SpanGram - 1}), ' ')) AS g
       |  FROM s, unnest(range(1, len(w) - ${SpanGram - 2})) AS t(i)
       |), c AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY g) AS nd FROM g
       |)
       |SELECT doc_id, count(*) AS n_grams,
       |       count(CASE WHEN nd >= 2 THEN 1 END) AS n_dup_grams,
       |       round(CAST(count(CASE WHEN nd >= 2 THEN 1 END) AS DOUBLE)
       |             / count(*), 6) AS dup_frac
       |FROM c GROUP BY 1""".stripMargin

  /** Per-source dedup observability — the report a pipeline run emits
    * before anyone trusts its dedup stage: documents, distinct
    * normalized fingerprints, and the implied duplicate rate, per
    * source. Same normalization (and the same null-text per-doc key)
    * as `keepBest`, so the rates reconcile exactly with what that
    * operator would drop. Shape: count-distinct over (source, 16-byte
    * fp) — one reduced pair-frame shuffle, then a |sources|-row rollup.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val fp = when(col("text").isNull,
      concat(lit("null:"), col("doc_id").cast("string")))
      .otherwise(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
    Tables(spark, dir, "documents")
      .select(col("source"), fp.as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"))
      .withColumn("n_dups", col("n_docs") - col("n_distinct"))
      .withColumn("dup_rate",
        round(col("n_dups").cast("double") / col("n_docs"), 6))
  }

  val reportSql: String =
    """SELECT source, count(*) AS n_docs,
      |       count(DISTINCT CASE WHEN text IS NULL
      |                THEN 'null:' || CAST(doc_id AS VARCHAR)
      |                ELSE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |              END) AS n_distinct,
      |       count(*) - count(DISTINCT CASE WHEN text IS NULL
      |                THEN 'null:' || CAST(doc_id AS VARCHAR)
      |                ELSE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |              END) AS n_dups,
      |       round(CAST(count(*) - count(DISTINCT CASE WHEN text IS NULL
      |                THEN 'null:' || CAST(doc_id AS VARCHAR)
      |                ELSE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |              END) AS DOUBLE) / count(*), 6) AS dup_rate
      |FROM documents GROUP BY source""".stripMargin

  /** Edit-distance near-dup pairs with LOSSLESS paired-segment blocking
    * — the entity-resolution primitive (same record, small typo) that
    * Jaccard shingles are blind to. Finds all doc pairs whose 24-char
    * text prefixes are within Levenshtein distance 2, without the
    * all-pairs cross product, via the PassJoin pigeonhole (Li, Deng,
    * Feng: "PASS-JOIN: a partition-based method for similarity joins",
    * PVLDB 2011; public literature) STRENGTHENED to 2-of-4 signatures
    * (the r12 sf1 audit's skew fix): split each 24-char key into d+2 =
    * 4 segments of 6 — at most d = 2 edits touch at most 2 of them, so
    * at least TWO segments survive verbatim in the other string.
    * Candidates must therefore agree on a PAIR of aligned segments
    * (12 chars of content at two fixed slots), not one: a corpus-wide
    * hot 8-char prefix — the measured quadratic bucket at sf1 (max
    * bucket 1650, Σn² 5.2M under 1-of-3) — no longer forms a bucket at
    * all unless both slots' contents agree (max bucket 45, Σn² 0.78M,
    * growth tracking true-pair growth).
    *
    * Shift geometry (equal-length keys, d = 2 ⇒ #ins = #del ≤ 1): the
    * net indel displacement of any surviving segment is in {−1, 0, +1};
    * the leading segment cannot shift −1 (no characters precede it) and
    * the trailing cannot shift +1 (its copy would overrun the key); and
    * between the two survivors the displacement delta is bounded by the
    * ops the gap can hold — 0 for ADJACENT survivors (the gap is
    * exactly the edit-free earlier segment), else |Δ| ≤ 1. The probe
    * side enumerates exactly the 20 feasible (i < j, k_i, k_j) shift
    * combos; the index side emits its 6 segment pairs at exact
    * positions; candidates are the (i, j, piece_i, piece_j) equi-join —
    * provably a superset of all true pairs, which the exact
    * `levenshtein` then verifies. The all-pairs oracle proves the
    * blocking lossless on the corpus, the same contract as the MinHash
    * ops.
    *
    * Skew backstop, the `jaccardScores` hub discipline: index-side
    * buckets larger than `EditPairsMaxBucket` are excluded from
    * candidate generation (join output per bucket is then ≤ cap ×
    * probe rows — linear in corpus size by construction), and the
    * count of excluded buckets rides every row as the `capped_buckets`
    * audit column — a capped run is visibly capped, never silently
    * thinner. Fixture buckets max 45 at 10× sf0.1, so the cap never
    * fires on any oracled scale. Restricted to docs with ≥ 24 chars so
    * every key has full segments; equal-length keys also make the
    * oracle's semantics unambiguous.
    */
  private[graft] val EditPairsMaxBucket = 1024

  /** The 20 feasible (i, j, k_i, k_j) probe shift combos derived in the
    * scaladoc above — shared by the operator and its spec.
    */
  private[graft] val editPairShifts: Seq[(Int, Int, Int, Int)] = for {
    i <- 0 to 3; j <- i + 1 to 3
    ki <- -1 to 1; kj <- -1 to 1
    if !(i == 0 && ki == -1)      // nothing precedes the leading segment
    if !(j == 3 && kj == 1)       // trailing copy would overrun the key
    if math.abs(kj - ki) <= (if (j == i + 1) 0 else 1)
  } yield (i, j, ki, kj)

  def editPairs(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables(spark, dir, "documents")
      .where(col("text").isNotNull && length(col("text")) >= 24)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("s"))
    editPairsCore(keys, EditPairsMaxBucket)
  }

  /** Core blocking + verify over a (doc_id, s) frame of equal-length
    * 24-char keys, parameterized by the bucket cap so the spec can
    * plant a hot bucket and watch the audit column fire.
    */
  private[graft] def editPairsCore(keys: DataFrame, maxBucket: Int)
      : DataFrame = {
    // index side: the 6 segment pairs at exact positions
    val segPairs = (for { i <- 0 to 3; j <- i + 1 to 3 } yield
      s"struct($i AS i, $j AS j, substring(s, ${1 + 6 * i}, 6) AS pi, " +
        s"substring(s, ${1 + 6 * j}, 6) AS pj)")
      .mkString("array(", ", ", ")")
    val seg = keys.select(col("doc_id").as("a"), col("s").as("sa"),
        explode(expr(segPairs)).as("sp"))
      .select(col("a"), col("sa"), col("sp.i").as("i"), col("sp.j").as("j"),
        col("sp.pi").as("pi"), col("sp.pj").as("pj"))
    // skew backstop: drop over-cap index buckets, audit the count
    val bsz = seg.groupBy("i", "j", "pi", "pj").agg(count(lit(1)).as("n"))
    val kept = bsz.where(col("n") <= maxBucket)
      .select("i", "j", "pi", "pj")
    val cappedBuckets = bsz.where(col("n") > maxBucket)
      .agg(count(lit(1)).as("capped_buckets"))
    val segKept = seg.join(kept, Seq("i", "j", "pi", "pj"), "left_semi")
    // probe side: feasible shifted substring pairs
    val probePieces = editPairShifts.map { case (i, j, ki, kj) =>
      s"struct($i AS i, $j AS j, substring(s, ${1 + 6 * i + ki}, 6) AS pi, " +
        s"substring(s, ${1 + 6 * j + kj}, 6) AS pj)"
    }.mkString("array_distinct(array(", ", ", "))")
    val probe = keys.select(col("doc_id").as("b"), col("s").as("sb"),
        explode(expr(probePieces)).as("pp"))
      .select(col("b"), col("sb"), col("pp.i").as("i"), col("pp.j").as("j"),
        col("pp.pi").as("pi"), col("pp.pj").as("pj"))
    segKept.join(probe, Seq("i", "j", "pi", "pj"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sa"), col("sb")).distinct()
      .where(levenshtein(col("sa"), col("sb")) <= 2)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        levenshtein(col("sa"), col("sb")).as("dist"))
      .crossJoin(broadcast(cappedBuckets))
  }

  val editPairsSql: String = {
    val segUnion = (for { i <- 0 to 3; j <- i + 1 to 3 } yield
      s"SELECT $i AS i, $j AS j, substr(s, ${1 + 6 * i}, 6) AS pi, " +
        s"substr(s, ${1 + 6 * j}, 6) AS pj FROM k")
      .mkString("\n      UNION ALL ")
    s"""WITH k AS (
      |  SELECT doc_id, substr(text, 1, 24) AS s
      |  FROM documents WHERE text IS NOT NULL AND length(text) >= 24
      |),
      |seg AS ($segUnion),
      |cb AS (
      |  SELECT CAST(count(*) AS BIGINT) AS capped_buckets
      |  FROM (SELECT i, j, pi, pj, count(*) AS n FROM seg GROUP BY 1,2,3,4)
      |  WHERE n > $EditPairsMaxBucket)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist, capped_buckets
      |FROM k a, k b, cb
      |WHERE a.doc_id < b.doc_id AND levenshtein(a.s, b.s) <= 2""".stripMargin
  }

  /** Cross-document duplicated-SPAN detection — the word-granular
    * analogue of exact-substring training dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", §3:
    * suffix-array ExactSubstr): every 8-word gram occurring in ≥ 2
    * distinct documents marks its start position, and maximal runs of
    * marked positions (gap ≤ 8 ⇒ overlapping-or-adjacent gram coverage)
    * merge into trimmable spans `[span_start, span_end]` (1-based word
    * indices). Unlike document-level minhash/simhash above, this finds
    * the boilerplate INSIDE otherwise-distinct documents — licenses,
    * navigation chrome, quoted passages — which is what span trimming
    * removes without dropping whole docs.
    *
    * Scale shape (100 TB): the corpus-wide duplicate scan aggregates
    * (xxhash64(gram), doc_id) — 16 bytes per gram, never gram text —
    * with map-side partial `countDistinct`. The surviving dup-hash set
    * is proportional to the *duplicated* volume only; when small, AQE
    * broadcasts it back over the gram stream (no second full shuffle),
    * and only CANDIDATE grams re-group by their full string for the
    * exactness confirm — so a 64-bit hash collision can never fabricate
    * a span, and the non-duplicated bulk's text never crosses the wire.
    * Island-merge is one window over the already-reduced hit frame.
    * (`SpanGram` is shared with the repeated-span scorer above: the
    * same 8-word boilerplate threshold.)
    */

  /** The (doc_id, text) projection the span family grams over. */
  private def spanDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))

  /** Confirmed duplicated-gram hits grouped into islands: (doc_id, pos,
    * min_doc, grp) where min_doc is the gram's global minimum owner and
    * grp numbers maximal runs of hit positions with gap ≤ SpanGram.
    * The hash-prefilter/string-confirm staging is described on
    * `crossSpans`.
    */
  /** (doc_id, 1-based pos, gram, gh) for every full SpanGram-word gram —
    * the shared front of the whole span family. Built PER ROW from the
    * document's own word array (gram at pos = slice(ws, pos, n), the
    * `repeatedNgrams` pattern) — r18: the previous per-doc lead() window
    * shuffled the exploded word stream by doc_id (a corpus-sized
    * exchange, re-executed once per consumer of this frame) before any
    * reduction; the slice form is a scan-parallel projection whose first
    * exchange is already the 16-byte hash reduce.
    */
  private def gramsFromDocs(docs: DataFrame): DataFrame = {
    val n = SpanGram
    val ws = split(col("text"), " ")
    val grams = when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          p => array_join(slice(ws, p, n), " ")))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col("doc_id"), posexplode(grams).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("gram"), xxhash64(col("gram")).as("gh"))
  }

  /** Serialized bloom over a history corpus's gram STRINGS — the
    * broadcastable, bounded-size form of the span index for
    * ingest-time flagging (`CorpusStream.spanFlagStream`): ~1.2
    * bytes/gram at fpp 0.1%, no false negatives by construction, so a
    * stream stage can flag span-contaminated docs statelessly and the
    * exact batch pipeline confirms later.
    */
  def spanGramBloom(spark: SparkSession, history: DataFrame,
      fpp: Double = 0.001): Array[Byte] = {
    val grams = gramsFromDocs(history.select(col("doc_id"), col("text")))
      .select("gram")
    val expected = math.max(grams.count(), 1000L)
    RuntimeFilter.buildBloom(grams, "gram", expected, fpp)
  }

  private def spanIslands(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val n = SpanGram
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val grams = gramsFromDocs(docs)
    val dupHashes = grams.groupBy("gh")
      .agg(countDistinct("doc_id").as("nd")).where(c("nd") >= 2).select("gh")
    // No broadcast hint: the dup set scales with corpus duplication, so
    // the promise is AQE's to make from its measured size, not ours.
    //
    // Eager checkpoint — plan-audit finding: cand feeds TWO consumers
    // (the string confirm and the hits join), and without a cut the
    // corpus-sized scan+explode+gram-window subtree above it re-executes
    // once per consumer (4 scans total in the explain). cand is
    // CANDIDATE-sized (bounded by duplicated volume), so materializing
    // it is cheap at any corpus size and caps the corpus passes at two:
    // one to build the dup-hash set, one to filter candidates.
    val cand = grams.join(dupHashes, "gh").localCheckpoint()
    val confirmed = cand.groupBy("gram")
      .agg(countDistinct("doc_id").as("nd2"), min("doc_id").as("min_doc"))
      .where(c("nd2") >= 2).select("gram", "min_doc")
    val hits = cand.join(confirmed, "gram")
      .select("doc_id", "pos", "min_doc")
    hits
      .select(c("doc_id"), c("pos"), c("min_doc"),
        when(c("pos") - lag("pos", 1).over(byPos) <= n, 0)
          .otherwise(1).as("brk"))
      .select(c("doc_id"), c("pos"), c("min_doc"),
        sum("brk").over(byPos).as("grp"))
  }

  def crossSpans(spark: SparkSession, dir: String): DataFrame = {
    val n = SpanGram
    spanIslands(spanDocs(spark, dir)).groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + (n - 1)).as("span_end"),
        (max("pos") + n - min("pos")).as("span_words"),
        count(lit(1)).as("n_dup_grams"))
      .drop("grp")
  }

  /** The spans APPLIED — the second half of ExactSubstr dedup: rebuild
    * each document's text with its duplicated spans REMOVED, except in
    * each span's KEEPER document. Keeper is decided PER CONTIGUOUS
    * OWNER-RUN inside an island (a maximal run of adjacent hit
    * positions sharing the same global minimum owner), not per merged
    * island and not per owner-within-island: either coarser grouping
    * lets a foreign extent's interior cover a passage owned by THIS
    * doc (the A-B-A island), trimming it in its own owner doc too so
    * it survives nowhere (r7 + r8 ADVICE).
    * Owner = the gram's global minimum doc_id — a pure function of the
    * span's content, so both engines (and any two cluster runs) pick
    * the same survivor without coordination. Every owner's grams stay
    * intact in the owner document; where foreign-owned extents overlap
    * a kept passage's boundary (adjacent spans share up to n−1
    * positions), the boundary words follow the foreign extent — the
    * inherent position-granularity limit of extent-based trimming.
    *
    * Scale shape: everything up to the island frame is `crossSpans`'s
    * hash-staged pipeline; the trim adds one `sequence` explode over
    * span EXTENTS (bounded by duplicated volume, not corpus volume)
    * and one doc_id-keyed shuffle to reassemble text — the unavoidable
    * cost of emitting rewritten documents rather than a report. The
    * reassembly sort is per-doc (words of one document), never global.
    */
  def spanTrim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = SpanGram
    val words = spanWords(spark, dir)
    // Segment each island into CONTIGUOUS owner runs — not merely
    // per-owner: grouping by (grp, min_doc) alone merges the two A-runs
    // of an A-B-A island into ONE min..max extent whose interior covers
    // B's positions, so B's own passage would be trimmed in doc B
    // (inside a foreign A extent) AND in every other doc — surviving
    // nowhere, the exact r7 failure mode (r8 ADVICE). A run counter
    // that increments whenever the owner OR the island changes along
    // pos keeps every extent within a single owner's contiguous grams;
    // each owner's passage stays intact in its owner document.
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val runs = spanIslands(words)
      .select($"doc_id", $"pos", $"min_doc",
        when(lag("min_doc", 1).over(byPos).isNull ||
          lag("min_doc", 1).over(byPos) =!= $"min_doc" ||
          lag("grp", 1).over(byPos) =!= $"grp", 1).otherwise(0)
          .as("chg"))
      .select($"doc_id", $"pos", $"min_doc",
        sum("chg").over(byPos).as("run"))
    val spans = runs.groupBy("doc_id", "run", "min_doc")
      .agg(min("pos").as("s"), (max("pos") + (n - 1)).as("e"))
      .where($"min_doc" =!= $"doc_id")
    val drop = spans.select($"doc_id",
      explode(sequence($"s", $"e")).as("pos"))
    val kept = words.join(drop, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_words"),
        array_join(
          transform(array_sort(collect_list(struct($"pos", $"w"))),
            x => x("w")), " ").as("trimmed_text"))
    Tables(spark, dir, "documents").select($"doc_id")
      .join(kept, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"kept_words", lit(0L)).as("kept_words"),
        coalesce($"trimmed_text", lit("")).as("trimmed_text"))
  }

  val spanTrimSql: String = {
    val leads = (1 until SpanGram)
      .map(i => s"lead(w,$i) OVER dw").mkString(" || ' ' || ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |         generate_subscripts(string_split(text,' '),1) AS pos
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, pos, w || ' ' || $leads AS gram,
       |         lead(w,${SpanGram - 1}) OVER dw AS last_w
       |  FROM words WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |g2 AS (SELECT doc_id, pos, gram FROM grams WHERE last_w IS NOT NULL),
       |dup AS (SELECT gram, min(doc_id) AS min_doc FROM g2 GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |hits AS (SELECT g2.doc_id, g2.pos, dup.min_doc FROM g2
       |         JOIN dup USING (gram)),
       |isl AS (SELECT doc_id, pos, min_doc,
       |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                 ORDER BY pos) <= $SpanGram THEN 0 ELSE 1 END AS brk
       |        FROM hits),
       |gr AS (SELECT doc_id, pos, min_doc, sum(brk) OVER (
       |         PARTITION BY doc_id ORDER BY pos) AS grp FROM isl),
       |seg AS (SELECT doc_id, pos, min_doc,
       |          CASE WHEN lag(min_doc) OVER w IS NULL
       |                 OR lag(min_doc) OVER w <> min_doc
       |                 OR lag(grp) OVER w <> grp THEN 1 ELSE 0 END AS chg
       |        FROM gr WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |rn AS (SELECT doc_id, pos, min_doc, sum(chg) OVER (
       |         PARTITION BY doc_id ORDER BY pos) AS run FROM seg),
       |spans AS (SELECT doc_id, min(pos) AS s,
       |                 max(pos) + ${SpanGram - 1} AS e
       |          FROM rn GROUP BY doc_id, run, min_doc
       |          HAVING min_doc <> doc_id),
       |drop_pos AS (SELECT doc_id, unnest(generate_series(s, e)) AS pos
       |             FROM spans),
       |kept AS (SELECT w.doc_id,
       |                CAST(count(*) AS BIGINT) AS kept_words,
       |                string_agg(w.w, ' ' ORDER BY w.pos) AS trimmed_text
       |         FROM words w ANTI JOIN drop_pos d
       |           ON w.doc_id = d.doc_id AND w.pos = d.pos
       |         GROUP BY w.doc_id)
       |SELECT d.doc_id,
       |       COALESCE(k.kept_words, 0) AS kept_words,
       |       COALESCE(k.trimmed_text, '') AS trimmed_text
       |FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin
  }

  val crossSpansSql: String = {
    // SpanGram interpolated everywhere (like spanTrimSql) — a hardcoded
    // gram size here would silently break Scala↔SQL parity if SpanGram
    // ever changes (r7 ADVICE).
    val leads = (1 until SpanGram)
      .map(i => s"lead(w,$i) OVER dw").mkString(" || ' ' || ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |         generate_subscripts(string_split(text,' '),1) AS pos
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, pos, w || ' ' || $leads AS gram,
       |         lead(w,${SpanGram - 1}) OVER dw AS last_w
       |  FROM words WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |g2 AS (SELECT doc_id, pos, gram FROM grams WHERE last_w IS NOT NULL),
       |dup AS (SELECT gram FROM g2 GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |hits AS (SELECT doc_id, pos FROM g2
       |         WHERE gram IN (SELECT gram FROM dup)),
       |isl AS (SELECT doc_id, pos,
       |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                 ORDER BY pos) <= $SpanGram THEN 0 ELSE 1 END AS brk
       |        FROM hits),
       |gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |         ORDER BY pos) AS grp FROM isl)
       |SELECT doc_id,
       |       CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) + ${SpanGram - 1} AS BIGINT) AS span_end,
       |       CAST(max(pos) + $SpanGram - min(pos) AS BIGINT) AS span_words,
       |       CAST(count(*) AS BIGINT) AS n_dup_grams
       |FROM gr GROUP BY doc_id, grp""".stripMargin
  }

  /** INCREMENTAL cross-span detection — the corpus-growth form of
    * `crossSpans`, mirroring `minhashIncremental`'s discipline: the
    * history corpus is represented by its (gram-hash, doc_id) INDEX
    * (in production a persisted artifact via the SnapshotStore pattern,
    * extended per admitted batch), and a new batch finds its
    * duplicated-vs-history spans by:
    *  1. hashing ONLY its own grams and probing the index (hash-level
    *     candidates — 16-byte rows, no history text touched);
    *  2. re-gramming ONLY the history docs the index names for the
    *     candidate hashes (the candidates-only rule that r6's verdict
    *     forced onto minhashIncremental: per-batch history work is
    *     O(candidates), never O(|history|));
    *  3. confirming candidates by full gram STRING equality (a hash
    *     collision cannot fabricate a span), then island-merging as in
    *     `crossSpans`.
    * History/batch split by doc_id parity, the incremental family's
    * fixture convention. Batch-internal duplication is out of scope by
    * contract — that is `crossSpans`' job on the batch alone.
    */
  def spanIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = SpanGram
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    def gramsOf(words: DataFrame): DataFrame = gramsFrame(words)
    val words = spanWords(spark, dir)
    val hWords = words.where($"doc_id" % 2 === 0)
    val bWords = words.where($"doc_id" % 2 === 1)
    // the index: what production persists and extends per batch
    val index = gramsOf(hWords).select("gh", "doc_id").distinct()
    val bGrams = gramsOf(bWords)
    val candB = bGrams
      .join(index.select("gh").distinct(), "gh").localCheckpoint()
    // candidates-only: only history docs the index names for candidate
    // hashes are ever re-grammed
    val candHistDocs = index
      .join(candB.select("gh").distinct(), "gh")
      .select("doc_id").distinct()
    val histCandGrams =
      gramsOf(hWords.join(candHistDocs, Seq("doc_id"), "left_semi"))
        .select("gram").distinct()
    val hits = candB.join(histCandGrams, "gram").select("doc_id", "pos")
    hits
      .select($"doc_id", $"pos",
        when($"pos" - lag("pos", 1).over(byPos) <= n, 0)
          .otherwise(1).as("brk"))
      .select($"doc_id", $"pos", sum("brk").over(byPos).as("grp"))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + (n - 1)).as("span_end"),
        (max("pos") + n - min("pos")).as("span_words"),
        count(lit(1)).as("n_dup_grams"))
      .drop("grp")
  }

  val spanIncrementalSql: String = {
    val leads = (1 until SpanGram)
      .map(i => s"lead(w,$i) OVER dw").mkString(" || ' ' || ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |         generate_subscripts(string_split(text,' '),1) AS pos
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, pos, w || ' ' || $leads AS gram,
       |         lead(w,${SpanGram - 1}) OVER dw AS last_w
       |  FROM words WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |g2 AS (SELECT doc_id, pos, gram FROM grams WHERE last_w IS NOT NULL),
       |hist AS (SELECT DISTINCT gram FROM g2 WHERE doc_id % 2 = 0),
       |hits AS (SELECT doc_id, pos FROM g2
       |         WHERE doc_id % 2 = 1 AND gram IN (SELECT gram FROM hist)),
       |isl AS (SELECT doc_id, pos,
       |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                 ORDER BY pos) <= $SpanGram THEN 0 ELSE 1 END AS brk
       |        FROM hits),
       |gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |         ORDER BY pos) AS grp FROM isl)
       |SELECT doc_id,
       |       CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) + ${SpanGram - 1} AS BIGINT) AS span_end,
       |       CAST(max(pos) + $SpanGram - min(pos) AS BIGINT) AS span_words,
       |       CAST(count(*) AS BIGINT) AS n_dup_grams
       |FROM gr GROUP BY doc_id, grp""".stripMargin
  }

  // ------------------------------------ segment boilerplate removal

  /** Segment ("line") width for corpus boilerplate removal.
    * Package-visible: `CorpusStream.boilerFlagStream` segments arriving
    * docs with the SAME width — a private copy there would silently
    * diverge from the bloom's contents if this knob changes, voiding
    * the no-false-negative guarantee (r8 ADVICE).
    */
  private[graft] val BoilerSegWords = 8
  /** A segment appearing in at least this many DISTINCT docs is
    * boilerplate.
    */
  private val BoilerMinDocs = 2

  /** Corpus boilerplate removal — the line-dedup step of web-corpus
    * pipelines (CCNet / RefinedWeb): a text unit that recurs across
    * documents is navigation chrome, legal footers, or template filler,
    * and the policy is REMOVE EVERY COPY — unlike `spanTrim`, which
    * keeps one owner copy of genuinely duplicated prose. The unit here
    * is the aligned `BoilerSegWords`-word segment (the fixture's text
    * has no newlines; on real documents the same operator runs on
    * `split(text, '\n')` lines — only the segmentation expression
    * changes). Output is a per-document report: every doc_id with its
    * surviving word count, removed-segment count, and rebuilt text.
    *
    * Scale shape (the `crossSpans` staging): segment frequency is
    * counted on 16-byte xxhash64 keys — the corpus-wide shuffle moves
    * hashes, never segment strings; candidate segments (bounded by
    * boilerplate volume) re-group by full string to make the decision
    * collision-proof; the rebuild is one doc_id-keyed shuffle with
    * per-doc sorts only. Versus the span family's sliding grams, the
    * tumbling segments shuffle 1/`BoilerSegWords` the rows.
    */
  def lineBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = spanWords(spark, dir)
    val segs = words
      .withColumn("seg", expr(s"(pos - 1) div $BoilerSegWords"))
      .groupBy("doc_id", "seg")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"pos", $"w"))),
          x => x("w")), " ").as("seg_text"))
      .withColumn("gh", xxhash64($"seg_text"))
    // hash-level frequency prefilter (16-byte shuffle), then exact
    // string confirm over candidates only — a hash collision cannot
    // fabricate boilerplate
    val hotHashes = segs.groupBy("gh")
      .agg(countDistinct("doc_id").as("nd")).where($"nd" >= BoilerMinDocs)
      .select("gh")
    // Eager checkpoint (the spanIslands rationale): cand feeds the
    // string confirm AND the drop join; without the cut the corpus-
    // sized scan+explode+segment-agg subtree re-executes per consumer.
    // cand is bounded by boilerplate volume — cheap to materialize.
    val cand = segs.join(hotHashes, "gh").localCheckpoint()
    val confirmed = cand.groupBy("seg_text")
      .agg(countDistinct("doc_id").as("nd2")).where($"nd2" >= BoilerMinDocs)
      .select("seg_text")
    val drop = cand.join(confirmed, "seg_text").select("doc_id", "seg")
    val removed = drop.groupBy("doc_id")
      .agg(count(lit(1)).as("removed_segs"))
    val kept = words
      .withColumn("seg", expr(s"(pos - 1) div $BoilerSegWords"))
      .join(drop, Seq("doc_id", "seg"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_words"),
        array_join(
          transform(array_sort(collect_list(struct($"pos", $"w"))),
            x => x("w")), " ").as("trimmed_text"))
    Tables(spark, dir, "documents").select($"doc_id")
      .join(kept, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"kept_words", lit(0L)).as("kept_words"),
        coalesce($"removed_segs", lit(0L)).as("removed_segs"),
        coalesce($"trimmed_text", lit("")).as("trimmed_text"))
  }

  /** Serialized bloom over a history corpus's CONFIRMED boilerplate
    * segments — the `spanGramBloom` treatment for the line-dedup
    * family: the filter holds only segments already seen in ≥
    * `BoilerMinDocs` docs (bounded by boilerplate volume, far smaller
    * than an all-grams filter), no false negatives by construction, so
    * an ingest stage can flag template-bearing docs statelessly and
    * the exact batch pipeline confirms later.
    */
  def boilerplateBloom(spark: SparkSession, history: DataFrame,
      fpp: Double = 0.001): Array[Byte] = {
    import spark.implicits._
    val words = history
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos0", "w")))
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"w")
    val segs = words
      .withColumn("seg", expr(s"(pos - 1) div $BoilerSegWords"))
      .groupBy("doc_id", "seg")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"pos", $"w"))),
          x => x("w")), " ").as("seg_text"))
    val hot = segs.groupBy("seg_text")
      .agg(countDistinct("doc_id").as("nd")).where($"nd" >= BoilerMinDocs)
      .select("seg_text")
    val expected = math.max(hot.count(), 1000L)
    RuntimeFilter.buildBloom(hot, "seg_text", expected, fpp)
  }

  val lineBoilerplateSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |         generate_subscripts(string_split(text,' '),1) AS pos
       |  FROM documents),
       |segs AS (
       |  SELECT doc_id, (pos - 1) // $BoilerSegWords AS seg,
       |         string_agg(w, ' ' ORDER BY pos) AS seg_text
       |  FROM words GROUP BY doc_id, (pos - 1) // $BoilerSegWords),
       |hot AS (SELECT seg_text FROM segs GROUP BY seg_text
       |        HAVING count(DISTINCT doc_id) >= $BoilerMinDocs),
       |drop_segs AS (SELECT doc_id, seg FROM segs
       |              WHERE seg_text IN (SELECT seg_text FROM hot)),
       |removed AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS removed_segs
       |            FROM drop_segs GROUP BY doc_id),
       |kept AS (SELECT w.doc_id,
       |                CAST(count(*) AS BIGINT) AS kept_words,
       |                string_agg(w.w, ' ' ORDER BY w.pos) AS trimmed_text
       |         FROM words w ANTI JOIN drop_segs d
       |           ON w.doc_id = d.doc_id
       |          AND (w.pos - 1) // $BoilerSegWords = d.seg
       |         GROUP BY w.doc_id)
       |SELECT d.doc_id,
       |       COALESCE(k.kept_words, 0) AS kept_words,
       |       COALESCE(r.removed_segs, 0) AS removed_segs,
       |       COALESCE(k.trimmed_text, '') AS trimmed_text
       |FROM documents d
       |LEFT JOIN kept k ON d.doc_id = k.doc_id
       |LEFT JOIN removed r ON d.doc_id = r.doc_id""".stripMargin

  // ------------------------------------------------- threshold sweep

  /** Dedup-threshold sensitivity report: for each candidate Jaccard
    * cutoff ≥ the LSH family's 0.8 design point, how many pairs
    * survive, how many documents they touch, and the surviving pairs'
    * mean similarity — the one-page readout a pipeline owner reads
    * before committing to a threshold (0.80 vs 0.95 can differ by an
    * order of magnitude in removed volume). Rides `dedup_minhash_lsh`'s
    * verified pair frame, so the sweep costs one extra pass over a
    * PAIR-sized frame, not a corpus re-shingle; only cutoffs at or
    * above the LSH design threshold are offered, keeping every count
    * exact (below it, banded recall is no longer a superset).
    *
    * Means accumulate the 6-dp-rounded jaccards as DECIMAL(10,6) — the
    * exact-sum-then-one-divide recipe — so both engines agree despite
    * float addition being order-sensitive.
    */
  private val SweepThresholds = Seq("0.80", "0.85", "0.90", "0.95")

  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(spark, dir)
    val th = explode(array(SweepThresholds.map(t =>
      lit(t).cast("double")): _*)).as("threshold")
    val s = pairs.select(col("doc_a"), col("doc_b"), col("jaccard"), th)
      .where(col("jaccard") >= col("threshold"))
      .localCheckpoint() // two aggregates read it; pairs-sized, tiny
    val agg = s.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("jaccard").cast("decimal(10,6)")).as("sj"))
      .select(col("threshold"), col("n_pairs"),
        round(col("sj").cast("double") / col("n_pairs"), 6)
          .as("mean_jaccard"))
    val docs = s
      .select(col("threshold"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy(col("threshold"))
      .agg(countDistinct(col("doc")).as("n_docs"))
    agg.join(docs, "threshold")
      .select(col("threshold"), col("n_pairs"), col("n_docs"),
        col("mean_jaccard"))
  }

  val thresholdSweepSql: String = {
    val list = SweepThresholds.map(t => s"CAST($t AS DOUBLE)").mkString(", ")
    s"""WITH p AS ($minhashLshSql),
       |th AS (SELECT unnest([$list]) AS threshold),
       |s AS (
       |  SELECT th.threshold, p.doc_a, p.doc_b, p.jaccard
       |  FROM p CROSS JOIN th WHERE p.jaccard >= th.threshold),
       |agg AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
       |         round(CAST(sum(CAST(jaccard AS DECIMAL(10,6))) AS DOUBLE)
       |               / count(*), 6) AS mean_jaccard
       |  FROM s GROUP BY 1),
       |docs AS (
       |  SELECT threshold, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
       |  FROM (SELECT threshold, unnest([doc_a, doc_b]) AS doc FROM s)
       |  GROUP BY 1)
       |SELECT a.threshold, a.n_pairs, d.n_docs, a.mean_jaccard
       |FROM agg a JOIN docs d USING (threshold)""".stripMargin
  }

  /** What a training pipeline actually DOES with near-dup clusters:
    * per-document sampling weights that downweight duplicate families
    * instead of hard-dropping them (the "keep one copy, or keep all at
    * 1/k weight" recipe — total sampled mass per cluster stays one
    * document regardless of how many mirrors the crawl caught).
    * Every document gets a row: cluster members carry their
    * `dedup_clusters` label and 10⁶ div size micro-weight (integer
    * floor division — deterministic, and the per-cluster mass
    * Σ weights ≤ 10⁶ is auditable in integers); non-clustered docs are
    * singletons at full weight. One broadcast-sized join against the
    * cluster frame (pair-graph-bounded, tiny next to the corpus) and
    * one |clusters|-row reduce for sizes — the corpus never shuffles.
    */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val cl = clusters(spark, dir)
    val sizes = cl.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val labeled = cl.join(sizes, "canonical_id")
    Tables(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(labeled), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        expr("1000000 div coalesce(cluster_size, 1)").as("weight_micro"))
  }

  val dedupWeightsSql: String =
    s"""WITH RECURSIVE pairs AS (
       |${minhashLshSql}
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |), walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |), cl AS (
       |  SELECT u AS doc_id, min(x) AS canonical_id FROM walk GROUP BY u
       |), sizes AS (
       |  SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM cl GROUP BY 1
       |)
       |SELECT d.doc_id,
       |       COALESCE(cl.canonical_id, d.doc_id) AS canonical_id,
       |       COALESCE(s.cluster_size, 1) AS cluster_size,
       |       1000000 // COALESCE(s.cluster_size, 1) AS weight_micro
       |FROM documents d
       |LEFT JOIN cl ON cl.doc_id = d.doc_id
       |LEFT JOIN sizes s ON s.canonical_id = cl.canonical_id""".stripMargin

  /** The LSH family's S-curve design table: for the SHIPPED banding
    * (16 bands × 4 rows), the collision probability
    * P(candidate | similarity s) = 1 − (1 − s⁴)¹⁶ on a 0.05 similarity
    * grid — the tuning table every MinHash deployment reads to pick
    * its banding (where the curve crosses ½ is the family's effective
    * threshold; the 0.8 design point should sit on the steep flank).
    * Published math (Leskovec/Rajaraman/Ullman ch. 3) evaluated over
    * THIS engine's actual constants, so the table documents the
    * deployed family, not a textbook abstraction.
    *
    * Determinism: s = i/20 exact; the powers are FIXED squaring chains
    * (s²→s⁴; t²→t⁴→t⁸→t¹⁶) — identical IEEE sequences both engines,
    * no libm pow anywhere. 20-row compute-only frame.
    */
  def lshCurve(spark: SparkSession, dir: String): DataFrame = {
    val s = col("id").cast("double") / lit(20.0)
    val s2 = s * s
    val s4 = s2 * s2
    val t = lit(1.0) - s4
    val t2 = t * t
    val t4 = t2 * t2
    val t8 = t4 * t4
    val t16 = t8 * t8
    spark.range(1, 21)
      .select(round(s, 2).as("similarity"),
        lit(Bands).as("bands"), lit(RowsPerBand).as("rows_per_band"),
        round(lit(1.0) - t16, 6).as("p_candidate"))
  }

  val lshCurveSql: String =
    s"""SELECT round(s, 2) AS similarity,
       |       $Bands AS bands, $RowsPerBand AS rows_per_band,
       |       round(1.0 - t16, 6) AS p_candidate
       |FROM (
       |  SELECT s, ((t2 * t2) * (t2 * t2)) * ((t2 * t2) * (t2 * t2)) AS t16
       |  FROM (
       |    SELECT s, t * t AS t2
       |    FROM (
       |      SELECT s, 1.0 - (s * s) * (s * s) AS t
       |      FROM (SELECT CAST(i AS DOUBLE) / 20.0 AS s
       |            FROM generate_series(1, 20) AS g(i)))))""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("dedup_lsh_curve", lshCurve _, Some(lshCurveSql)),
    Op("curate_dedup_weights", dedupWeights _, Some(dedupWeightsSql)),
    Op("dedup_threshold_sweep", thresholdSweep _, Some(thresholdSweepSql)),
    Op("dedup_line_boilerplate", lineBoilerplate _, Some(lineBoilerplateSql)),
    Op("dedup_cross_spans", crossSpans _, Some(crossSpansSql)),
    Op("dedup_span_incremental", spanIncremental _, Some(spanIncrementalSql)),
    Op("dedup_span_trim", spanTrim _, Some(spanTrimSql)),
    Op("dedup_edit_pairs", editPairs _, Some(editPairsSql)),
    Op("dedup_exact", exact _, Some(exactSql)),
    Op("dedup_report", report _, Some(reportSql)),
    Op("dedup_repeated_ngrams", repeatedNgrams _, Some(repeatedNgramsSql)),
    Op("dedup_keep_best", keepBest _, Some(keepBestSql)),
    Op("dedup_incremental", incremental _, Some(incrementalSql)),
    Op("dedup_clusters", clusters _, Some(clustersSql)),
    Op("dedup_minhash_lsh", minhashLsh _, Some(minhashLshSql)),
    Op("dedup_minhash_incremental", minhashIncremental _,
      Some(minhashIncrementalSql)),
    Op("dedup_ngram_jaccard", ngramJaccard _, Some(ngramJaccardSql)),
    Op("dedup_source_overlap", sourceOverlap _, Some(sourceOverlapSql)),
    Op("dedup_containment", containment _, Some(containmentSql)),
    Op("dedup_simhash", simhash _, None),
    Op("dedup_simhash_check", simhashCheck _, Some(simhashCheckSql)),
    Op("dedup_simhash_pairs", simhashPairs _, None),
    Op("dedup_simhash_pairs_check", simhashPairsCheck _,
      Some(simhashPairsCheckSql)),
  )
}
