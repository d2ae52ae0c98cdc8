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
}
