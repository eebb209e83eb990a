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
  final case class NearDupHit(doc_id: Long, canonical_id: Long,
                              band: Int, bucket: Long)

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

  /**
   * Streaming NEAR-dup candidates — the continuous-ingest counterpart of
   * [[graft.textops.Dedup.minhashCandidatePairs]]. Uses the SAME banded
   * minhash computation as the batch operator ([[graft.textops.Dedup
   * .minhashBands]]: FNV-1a shingles → k splitmix64 permutations →
   * xxhash64 band buckets — map-only, streaming-safe), then keys the
   * band stream by (band, bucket) and keeps ONE long of state per
   * bucket: the first-seen (canonical) doc id. Each later doc hitting
   * the bucket emits a (doc_id, canonical_id, band, bucket) hit.
   *
   * Scale shape vs batch: the batch operator pairs ALL docs within a
   * bucket (quadratic per bucket — hence its maxBucketSize cap +
   * observed drop metric); the stream pairs each arrival with the
   * canonical only, so emission is LINEAR in arrivals and needs no cap.
   * The trade-off is pair coverage: batch emits the full clique, the
   * stream emits the star centered on the first-seen doc — exactly the
   * edges a first-seen-wins dedup policy consumes. Within one
   * micro-batch the smallest doc_id is canonical, so a single-batch
   * replay makes {doc | hit} equal the batch decision set
   * {doc | doc shares a bucket with a smaller doc} band-for-band
   * (asserted by StreamingDedupSpec).
   *
   * A doc matching in m bands emits m hits; per-doc reduction (distinct
   * doc_id, or groupBy doc_id for the strongest canonical) is the
   * consumer's choice — a second stateful distinct here would double
   * state for a policy decision the sink owns. State is one long per
   * distinct (band, bucket) ≈ bands × distinct-docs: on an unbounded
   * feed, shard by bucket range or re-key epoch-by-epoch, same as the
   * exact-dedup lineage note above.
   */
  def nearDupCandidateStream(docs: DataFrame,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             bands: Int = 8, rows: Int = 4,
                             shingleSize: Int = 3): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.textops.Dedup
      .minhashBands(docs, idCol, textCol, bands, rows, shingleSize)
      .select(col("doc").cast("long"), col("band").cast("int"),
        col("bucket").cast("long"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Long, NearDupHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case ((band, bucket), it, state) =>
          val ids = it.map(_._1).toArray.sorted
          val canonical = state.getOption.getOrElse {
            val c = ids.head
            state.update(c)
            c
          }
          ids.iterator.filter(_ != canonical)
            .map(id => NearDupHit(id, canonical, band, bucket))
      }
  }
}
