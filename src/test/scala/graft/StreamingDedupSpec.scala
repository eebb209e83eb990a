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

  test("canonicalStream hash matches the batch operator's md5 keying") {
    import spark.implicits._
    val txt = "alpha beta gamma"
    val sparkMd5 = Seq(txt).toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text")).head().getString(0)
    assert(graft.util.TextUtil.md5Hex(txt) === sparkMd5)
  }
}
