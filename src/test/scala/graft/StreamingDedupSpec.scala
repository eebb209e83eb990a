package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

/** Streaming exact dedup: first-seen emission and canonical marking must
  * agree with the batch operator's per-hash semantics across
  * micro-batches. */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val batch1 = Seq(
    Doc(1L, ts(0), "alpha beta gamma"),
    Doc(2L, ts(1), "delta epsilon"),
    Doc(3L, ts(2), "alpha beta gamma")) // dup of 1 within the batch
  private val batch2 = Seq(
    Doc(4L, ts(3), "delta epsilon"),    // dup of 2 across batches
    Doc(5L, ts(4), "zeta eta"))

  test("dropDupStream emits each distinct text once across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    stream.addData(batch1)
    val q = graft.streaming.StreamingAnnotate.startMemorySink(
      StreamingDedup.dropDupStream(stream.toDF()),
      "dedup_sink", org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable()
    stream.addData(batch2)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dedup_sink").select("doc_id").as[Long].collect().toSet
    // 3 (same batch as 1) and 4 (later batch than 2) are dropped
    assert(kept === Set(1L, 2L, 5L))
  }

  test("canonicalStream marks duplicates with the first-seen canonical id") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    stream.addData(batch1)
    val q = graft.streaming.StreamingAnnotate.startMemorySink(
      StreamingDedup.canonicalStream(stream.toDS()).toDF(),
      "canon_sink", org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable()
    stream.addData(batch2)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("canon_sink")
      .select("doc_id", "canonical_id", "is_duplicate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows === Set(
      (1L, 1L, false), (2L, 2L, false), (3L, 1L, true),
      (4L, 2L, true), (5L, 5L, false)))
    // every row is preserved (lineage, not silence)
    assert(rows.size === 5)
  }

  // Near-dup corpus: two exact-dup families (all 8 bands collide), two
  // high-overlap variants (some bands collide), and unrelated texts.
  private def ndDoc(id: Long, text: String) = Doc(id, ts(id.toInt), text)
  private val ndBatch1 = Seq(
    ndDoc(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    ndDoc(2L, "the quick brown fox jumps over the lazy dog near the river bank"),
    ndDoc(3L, "the quick brown fox jumps over the lazy dog near the river shore"),
    ndDoc(4L, "completely unrelated text about spark structured streaming state"),
    ndDoc(5L, "another disjoint document mentioning knowledge graph construction"))
  private val ndBatch2 = Seq(
    ndDoc(6L, "the quick brown fox jumps over the lazy dog near the river bank"),
    ndDoc(7L, "fresh content that matches nothing that was streamed before now"))

  test("nearDupCandidateStream: single-batch replay matches the batch band decision") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    stream.addData(ndBatch1)
    val q = graft.streaming.StreamingAnnotate.startMemorySink(
      StreamingDedup.nearDupCandidateStream(stream.toDF()).toDF(),
      "neardup_sink", org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardup_sink")
      .select("doc_id", "canonical_id", "band", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    // expected: same banding, star on min(doc) per (band, bucket)
    val banded = graft.textops.Dedup.minhashBands(ndBatch1.toDF())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = banded.groupBy { case (_, b, k) => (b, k) }.values
      .filter(_.length >= 2)
      .flatMap { grp =>
        val min = grp.map(_._1).min
        grp.collect { case (d, b, k) if d != min => (d, min, b, k) }
      }.toSet
    assert(expected.nonEmpty) // exact dups guarantee collisions
    assert(got === expected)
    // the exact-dup pair must collide in EVERY band
    assert(got.count { case (d, c, _, _) => d == 2L && c == 1L } === 8)
  }

  test("nearDupCandidateStream: cross-batch hits use the first-seen canonical") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    stream.addData(ndBatch1)
    val q = graft.streaming.StreamingAnnotate.startMemorySink(
      StreamingDedup.nearDupCandidateStream(stream.toDF()).toDF(),
      "neardup_sink2", org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable()
    stream.addData(ndBatch2)
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardup_sink2")
      .select("doc_id", "canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 6 re-crawls text first seen as doc 1 (all bands → canonical 1 only)
    assert(got.filter(_._1 == 6L) === Set((6L, 1L)))
    // 7 matches nothing
    assert(!got.exists(_._1 == 7L))
  }

  test("canonicalStream hash matches the batch operator's md5 keying") {
    import spark.implicits._
    val txt = "alpha beta gamma"
    val sparkMd5 = Seq(txt).toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text")).head().getString(0)
    assert(graft.util.TextUtil.md5Hex(txt) === sparkMd5)
  }
}
