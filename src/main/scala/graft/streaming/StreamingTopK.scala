package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TopKAgg

/** Continuous frequent-items tracking — the streaming twin of the batch
  * `agg_approx_topk_bound` Misra-Gries gate (SURVEY §2.13 "sketches at
  * scale"; the reference has no sketch surface at all). A token/URL/
  * user-id firehose wants "what is hot right now" without a groupBy
  * whose state is linear in distinct keys; this keeps AT MOST `m`
  * counters per shard no matter how many distinct items flow through.
  *
  * The summary fold is the SAME kernel as the batch gate — literally
  * `TopKAgg.reduce` on the identical `Buf` — so the streaming path
  * cannot drift from the batch semantics (the StreamingAnn/StreamingDedup
  * kernel-sharing discipline). Items are routed to `shards` state rows by
  * a hash of the VALUE, so each distinct item lives in exactly one
  * shard's summary: the global estimate for an item is its (single)
  * shard's estimate, the MG bounds hold per shard against the shard's own
  * arrival count (est ≤ exact; exact − est ≤ N_shard/(m+1) — TIGHTER than
  * one global summary, since N_shard ≈ N/shards), and the global
  * candidate set is the concatenation of shard summaries, no cross-shard
  * merge arithmetic needed.
  *
  * Scale shape: state is ≤ m (key, count) pairs per shard — bounded by
  * configuration, not volume; each micro-batch does one local fold over
  * its own rows after one shuffle on the shard key. Emission is the
  * per-shard summary each trigger (Update mode), so a downstream
  * dashboard reads `shards` rows per trigger, never the corpus.
  *
  * Determinism: arrivals fold in `itemId` order within each group call,
  * so a replay that presents the same items in the same micro-batch
  * splits yields bit-identical summaries — and because Misra-Gries is a
  * LEFT FOLD, streaming the corpus through any batch splits in itemId
  * order equals the one-shot batch fold (pinned in StreamingSpec).
  */
object StreamingTopK {

  case class Item(itemId: Long, item: String)

  /** Per-shard Misra-Gries state: the batch `Buf` plus the shard's total
    * arrival count (the `N` of the error bound N/(m+1)). */
  case class ShardState(keys: Array[String], counts: Array[Long], n: Long)

  case class ShardSummary(shard: Int, item: String, est: Long, shardN: Long)

  def shardOf(item: String, shards: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(item), shards)

  /** Works on a streaming OR batch Dataset[Item] (mapGroupsWithState runs
    * one-shot in batch mode) — one definition, two modes. Each output row
    * is one surviving counter of one shard's summary as of this trigger. */
  def summarize(items: Dataset[Item], m: Int, shards: Int)
      : Dataset[ShardSummary] = {
    val spark = items.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(m)
    items.groupByKey(i => shardOf(i.item, shards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[Item], state: GroupState[ShardState]) => {
          val st = state.getOption.getOrElse(ShardState(Array.empty, Array.empty, 0L))
          var buf = TopKAgg.Buf(st.keys, st.counts)
          var n = st.n
          for (i <- it.toSeq.sortBy(_.itemId)) {
            buf = agg.reduce(buf, i.item)
            n += 1
          }
          state.update(ShardState(buf.keys, buf.counts, n))
          buf.keys.iterator.zip(buf.counts.iterator)
            .map { case (k, c) => ShardSummary(shard, k, c, n) }
        })
  }
}
