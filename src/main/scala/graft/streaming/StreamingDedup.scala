package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming exact deduplication — the continuous-ingest counterpart of
 * [[graft.textops.Dedup.exact]] for a crawl feed (the reference is
 * batch-only; a 100 TB deployment ingests continuously and must drop
 * re-crawled/re-hosted identical texts before they hit the model build).
 *
 * Two shapes, both keyed by md5(text) like the batch operator:
 *
 *  - [[dropDupStream]]: Spark-native stateful `dropDuplicates` /
 *    `dropDuplicatesWithinWatermark` — emits only first-seen texts.
 *    The watermarked variant is REQUIRED on an unbounded feed: the
 *    content-hash key space grows with the corpus, and the watermark
 *    lets the state store evict hashes older than the lateness bound
 *    (a re-crawl farther apart than the watermark re-emits — the
 *    standard recall/state trade-off, stated here rather than hidden).
 *
 *  - [[canonicalStream]]: keeps EVERY row but marks it with the
 *    canonical (first-seen) doc id per content hash via
 *    mapGroupsWithState — the streaming analogue of the batch
 *    operator's (doc_id, canonical_id, content_hash) contract, for
 *    sinks that want dup lineage instead of silence. Arrival order
 *    replaces the batch min(doc_id) as the canonical choice; within
 *    one micro-batch the smallest doc_id wins, so a single-batch
 *    replay matches the batch operator exactly.
 */
object StreamingDedup {

  final case class Doc(doc_id: Long, warc_ts: java.sql.Timestamp, text: String)
  final case class DedupedDoc(doc_id: Long, content_hash: String,
                              canonical_id: Long, is_duplicate: Boolean)

  /** First-seen texts only. `watermark = Some((eventTimeCol, bound))`
    * switches to watermark-evicted state (unbounded feeds); `None`
    * keeps all-time state (bounded replays/backfills only). */
  def dropDupStream(docs: DataFrame, textCol: String = "text",
                    watermark: Option[(String, String)] = None): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col(textCol)))
    watermark match {
      case Some((tsCol, bound)) =>
        hashed.withWatermark(tsCol, bound)
          .dropDuplicatesWithinWatermark("content_hash")
      case None =>
        hashed.dropDuplicates("content_hash")
    }
  }

  /** Every row, marked with its canonical first-seen doc id. State is one
    * long per distinct content hash; all-time by design (dup lineage
    * needs the full map — shard the stream by hash range if the
    * dictionary outgrows one state store). */
  def canonicalStream(docs: Dataset[Doc]): Dataset[DedupedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .map(d => (d.doc_id, graft.util.TextUtil.md5Hex(d.text)))
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupedDoc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (hash: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          // within a micro-batch the smallest doc_id is canonical, so a
          // one-batch replay reproduces the batch operator's min() choice
          val ids = it.map(_._1).toArray.sorted
          val canonical = state.getOption.getOrElse {
            val c = ids.head
            state.update(c)
            c
          }
          ids.iterator.map(id => DedupedDoc(id, hash, canonical, id != canonical))
      }
  }
}
