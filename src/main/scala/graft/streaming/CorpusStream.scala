package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus preparation — the continuous-ingest twins of the
  * batch curation operators (`graft.operators.Curation`): documents
  * arrive as a stream (file drop, CDC topic) and leave as training-ready
  * assignments without ever re-scanning the accumulated corpus.
  */
object CorpusStream {

  final case class Doc(doc_id: Long, shard: Int, tokens: Long)
  final case class PackAssign(shard: Int, doc_id: Long, pack_id: Long,
      pack_offset: Long)

  /** Streaming Gopher admission gate: the batch rule-set applied to
    * documents ON ARRIVAL — `Curation.gopherMetrics` is a stateless
    * projection, so the SAME function body serves both engines' modes
    * (zero streaming state; parity with batch is by construction and
    * pinned in StreamingSpec). This is the filter a continuous-ingest
    * pipeline runs before anything stateful sees the document.
    */
  def gopherStream(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Curation.gopherMetrics(docs)

  /** Streaming deflate-ratio admission gate: the compression-quality
    * signal (`text_compress_ratio`) computed ON ARRIVAL — a stateless
    * native-expression projection (the `gopherStream` pattern), so the
    * SAME function body serves batch and stream and parity is by
    * construction. This is the cheap first gate a continuous-ingest
    * pipeline runs: repetitive/templated payloads flag before any
    * stateful stage pays for them.
    */
  def deflateGateStream(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.operators.TextAnalysis.compressCols(docs)

  /** Streaming BM25 postings ingest — the retrieval index maintained
    * continuously: arriving (doc_id, text) micro-batches tokenize to
    * postings (per-document, so batch postings compute from the batch
    * alone) and APPEND to the persisted index snapshot. Because
    * postings are additive and corpus stats derive from the postings
    * frame (`Retrieval.bm25Rank`), the served index after any prefix
    * of batches EQUALS the rebuild over those documents — the
    * insert ≡ rebuild identity, continuously.
    *
    * Exactly-once under restart: the `annMaintainStream` marker
    * discipline — batch id's snapshot derives from id−1's IMMUTABLE
    * snapshot (never a mutable pointer), the per-batch marker is
    * written LAST, a replayed batch re-derives the same bytes and a
    * marked batch is skipped outright.
    */
  def bm25IngestStream(spark: org.apache.spark.sql.SparkSession,
      store: graft.sources.SnapshotStore, baseTs: String,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val marker = f"b$batchId%06d"
        if (!store.isProcessed("bm25_ingest", marker)) {
          val prevTs =
            if (batchId == 0) baseTs else f"${baseTs}_b${batchId - 1}%06d"
          val prev = store
            .readTableSnapshot(spark, "bm25_postings", prevTs)
            .select("doc_id", "term", "tf", "dl")
          val np = graft.operators.Retrieval.postingsFromText(batch)
          store.writeTableSnapshot(prev.unionByName(np),
            "bm25_postings", s"${baseTs}_$marker")
          store.writeArtifact("bm25_ingest", marker, Array.emptyByteArray)
        }
        ()
    }

  /** Streaming frontier admission + scoring: discovered URLs arrive as a
    * stream, each is robots-gated and priority-scored ON ARRIVAL —
    * exactly the batch `crawl_frontier_rank` chain minus its per-domain
    * rank window (a real frontier's ordering lives in the fetch
    * scheduler's priority queue, not the scorer). Every stage is either
    * a stateless projection (`withDomain`, the score arithmetic) or a
    * stream-static broadcast join against the engine's own served
    * dimension frames (rule arrays, domain rank, crawl delays) — zero
    * streaming state, so batch parity is by construction and pinned in
    * StreamingSpec. Input: any streaming frame with (doc_id, url).
    */
  def frontierStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      urls: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val pages = graft.operators.Domains.withDomain(urls)
      .select(col("doc_id"), col("registered_domain"),
        regexp_replace(col("url"), "^[a-z]+://[^/]+", "").as("path"))
    val admitted = graft.operators.Domains
      .admissionCols(pages, graft.operators.Domains.ruleArrays(spark, dir))
      .where(col("allowed"))
      .select(col("doc_id"), col("registered_domain"), col("path"))
    graft.operators.HtmlExtract.frontierScore(admitted,
      graft.operators.HtmlExtract.servedDomainRank(spark, dir),
      graft.operators.Domains.crawlDelays(spark, dir))
  }

  /** Streaming ANN ingest: embeddings arrive as a stream and leave with
    * their IVF cell and PQ codes assigned ON ARRIVAL against the
    * engine's own SERVED index artifacts (`servedIvfIndex`/`servedPq`) —
    * the continuous form of the batch insert step (`ivfInsertStep` /
    * `pqInsertStep`): a real embedding store assigns each arriving
    * vector immediately and folds the assignments into the next index
    * snapshot at compaction time. The centroid/codebook frames are
    * bounded by contract (16 / 512 rows) and enter the plan as LITERAL
    * arrays, so the whole operator is one stateless codegen'd
    * projection — no stream state, no watermark, batch parity by
    * construction (pinned row-for-row in StreamingSpec against the
    * batch assignment paths). Input: any streaming frame with
    * (vec_id, embedding).
    */
  def annIngestStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      embs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (cents, book) =
      graft.operators.Similarity.servedArtifactRows(spark, dir)
    graft.operators.Similarity.annIngestCols(embs, cents, book)
  }

  /** Streaming sitemap discovery: fetched sitemap BODIES arrive as a
    * stream of (sm_domain, xml) and leave as scope-validated,
    * robots-gated URL/child-sitemap rows ON ARRIVAL — the continuous
    * form of `crawl_sitemap_urls`, sharing its frame-in/frame-out core
    * (`Domains.sitemapCols`): regex block extraction is a stateless
    * projection and the admission gate is a stream-static broadcast
    * join against the engine's parsed rule arrays — zero streaming
    * state, batch parity by construction (pinned in StreamingSpec).
    */
  def sitemapStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      sitemaps: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Domains.sitemapCols(sitemaps,
      graft.operators.Domains.ruleArrays(spark, dir))

  /** The full streaming index-maintenance LOOP — landing stream →
    * micro-batch insert into the snapshot store → drift gate →
    * rebuild rotation — composing `Similarity.maintainStep` behind a
    * `foreachBatch` seam (the `snapshotSink` discipline applied to ANN
    * maintenance). Each micro-batch extends the served IVF cells and PQ
    * codes batch-proportionally when the drift gate is calm, and
    * rotates to a full rebuild exactly when the frozen geometry stops
    * fitting; readers always resolve the current index through
    * `annServingState`, so the rotation is invisible to them — the
    * snapshot-pointer discipline.
    *
    * EXACTLY-ONCE under restart, with zero coordination beyond the
    * store itself: the per-batch pointer artifact `ann_maintain/b<id>`
    * is the completion marker (written AFTER the step's snapshots —
    * marker-last, O3), and the pre-step state is read from batch id−1's
    * IMMUTABLE marker, never from the mutable `latest` pointer — a
    * replayed micro-batch therefore re-derives the same (base, serving,
    * next) triple and overwrites the same snapshot directories with the
    * same bytes, and a batch whose marker exists is skipped outright.
    * Structured Streaming replays micro-batches in id order from its
    * offset log, so marker id−1 always exists when id runs. The store's
    * maintenance lineage is tied to the query's checkpoint lineage:
    * reusing a store with a FRESH checkpoint restarts batch ids at 0
    * and must use a fresh store root (same contract as any
    * `foreachBatch` sink keyed by batch id).
    *
    * Scale: per calm batch, cost is the insert steps' batch-
    * proportional arithmetic plus the merged-snapshot write (the
    * lakehouse-MERGE economics documented at `upsertTableSnapshot`);
    * the corpus-proportional rebuild runs exactly when the gate fires.
    * Input: any streaming frame with (vec_id, embedding); `baseTs`
    * names a base index built by `Similarity.buildIncBase` in `store`.
    */
  def annMaintainStream(spark: org.apache.spark.sql.SparkSession,
      store: graft.sources.SnapshotStore, baseTs: String,
      embs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val marker = f"b$batchId%06d"
        if (!store.isProcessed("ann_maintain", marker)) {
          val (prevServing, prevBase) =
            annMaintainState(store, baseTs, batchId - 1)
          val nextTs = s"${baseTs}_$marker"
          val (serving, retrained) = graft.operators.Similarity
            .maintainStep(spark, store, batch, prevBase, prevServing, nextTs)
          // on rotation the rebuilt snapshot becomes the drift BASELINE
          // too: its training-time quantization error is what the next
          // batch's error ratio must be judged against
          val newBase = if (retrained) serving else prevBase
          store.writeArtifact("ann_maintain", marker,
            s"$serving\n$newBase"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }

  /** (serving ts, drift-baseline ts) after micro-batch `batchId` — the
    * immutable per-batch pointer the loop reads its own pre-state from;
    * `batchId` < 0 resolves to the built base.
    */
  private[graft] def annMaintainState(store: graft.sources.SnapshotStore,
      baseTs: String, batchId: Long): (String, String) =
    if (batchId < 0) (baseTs, baseTs)
    else {
      val s = store
        .readArtifactString("ann_maintain", f"b$batchId%06d").split("\n")
      (s(0), s(1))
    }

  /** The snapshot pair the maintenance loop CURRENTLY serves (mutable
    * `latest` pointer; falls back to the base when no batch landed yet)
    * — what a search path resolves before reading `ivf_cells`/`pq_codes`.
    */
  def annServingState(store: graft.sources.SnapshotStore,
      baseTs: String): (String, String) =
    if (!store.isProcessed("ann_maintain", "latest")) (baseTs, baseTs)
    else {
      val s = store.readArtifactString("ann_maintain", "latest").split("\n")
      (s(0), s(1))
    }

  /** Streaming greedy sequence packing — `Curation.pack`'s running
    * prefix sum carried as stream state instead of a window: each shard
    * keeps ONE number (its cumulative token total) and every arriving
    * document is assigned the pack its prefix starts in
    * (`cum_before div budget`, the same greedy rule as the batch twin —
    * a document never waits for a "better" bin, so assignment is online
    * by construction and identical to the batch result for the same
    * per-shard arrival order).
    *
    * State: exactly one long per shard — O(|shards|) total, independent
    * of stream length; no watermark needed for boundedness. The
    * micro-batch slice is applied in (doc_id) order so a batch's
    * assignments are deterministic regardless of upstream partition
    * race; cross-batch determinism is the source's ordering contract
    * (file sources replay in offset order under checkpointing, which is
    * what makes recovery exactly-once here: a replayed slice re-derives
    * the same prefix sums from the restored state).
    */
  def packStream(docs: Dataset[Doc], budget: Long): Dataset[PackAssign] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, PackAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[Doc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val packId = cum / budget
            val assign = PackAssign(shard, d.doc_id, packId, cum % budget)
            cum += d.tokens
            assign
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Ingest-time span-contamination flagging — the STREAMING front of
    * the cross-span family: each arriving document's 8-word grams are
    * generated as a pure array projection (`slice` over the split
    * array — no window functions, which streaming frames cannot run)
    * and tested against a BLOOM of the history corpus's gram index
    * (`Dedup.spanGramBloom`). Stateless: the bitmap rides the plan as
    * a constant binary literal, so the stage is a codegen'd per-row
    * filter with no streaming state and no stream-static join shuffle.
    *
    * Contract: NO FALSE NEGATIVES (bloom guarantee) — every document
    * sharing a full gram with history is flagged; the fpp share of
    * clean docs flags spuriously and the exact batch pipeline
    * (`dedup_span_incremental`) adjudicates. This is the triage shape
    * ingest needs: drop/route on arrival, settle exactly later.
    */
  /** Ingest-time boilerplate flag — the `spanFlagStream` treatment for
    * the line-dedup family: tumbling `BoilerSegWords`-word segments of
    * each arriving doc probe a broadcast bloom of the history corpus's
    * CONFIRMED boilerplate segments (`Dedup.boilerplateBloom`).
    * Stateless; no false negatives, so an unflagged doc is guaranteed
    * boilerplate-free w.r.t. the filter's snapshot, and flags are
    * confirmed later by the exact batch op (`dedup_line_boilerplate`).
    */
  def boilerFlagStream(docs: org.apache.spark.sql.DataFrame,
      boilerBloom: Array[Byte]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val n = graft.operators.Dedup.BoilerSegWords
    val ws = split(col("text"), " ")
    val segArr = when(size(ws) >= 1,
      transform(sequence(lit(0), expr(s"(size(split(text, ' ')) - 1) div $n")),
        i => array_join(slice(ws, i * n + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"),
      size(segArr).as("n_segs"),
      size(filter(segArr,
        s => graft.operators.RuntimeFilter.bloomPredicate(boilerBloom, s)))
        .as("n_flagged"))
      .withColumn("flagged", col("n_flagged") > 0)
  }

  /** Streaming near-dup CANDIDATE gate: arriving documents are
    * shingled and minhash-banded by the SAME native kernels as the
    * batch family (`WordShingleHashes` → `MinHashBands`, stateless,
    * whole-stage codegen — identical hashes, so persisted artifacts
    * apply verbatim), then stream-static inner-joined against the
    * PERSISTED band-bucket index: each output row is an (arriving
    * doc, historical anchor, band) collision. No watermark and no
    * stream state — the static side is the bounded stored index
    * (≤ `LshBucketCap` anchors per bucket), and the exact-Jaccard
    * confirm stays a batch step, the candidates-only discipline the
    * batch `dedup_minhash_incremental` admit path uses.
    */
  def nearDupCandidateStream(docs: org.apache.spark.sql.DataFrame,
      bandIndex: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ShingleHash
    val banded = docs
      .select(col("doc_id"),
        ShingleHash.wordShingleHashes(col("text")).as("shingles"))
      .where(col("shingles").isNotNull) // kernel nulls under 3 words
      .select(col("doc_id"),
        posexplode(ShingleHash.minhashBands(col("shingles"))))
      .toDF("doc_id", "band", "bucket")
    banded.join(
        bandIndex.select(col("doc_id").as("anchor_id"),
          col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("anchor_id") =!= col("doc_id"))
      .select("doc_id", "anchor_id", "band", "bucket")
  }

  def spanFlagStream(docs: org.apache.spark.sql.DataFrame,
      historyBloom: Array[Byte]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val n = graft.operators.Dedup.SpanGram
    val ws = split(col("text"), " ")
    // sequence(0, size-n) would run DESCENDING for short docs (Spark
    // infers step -1) — guard them to an empty gram array instead.
    val gramArr = when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"),
      size(gramArr).as("n_grams"),
      size(filter(gramArr,
        g => graft.operators.RuntimeFilter.bloomPredicate(historyBloom, g)))
        .as("n_flagged"))
      .withColumn("flagged", col("n_flagged") > 0)
  }
}
