package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.WebPage
import graft.sources.SyntheticCorpus
import graft.spot.Spotter
import graft.streaming.StreamingAnnotate

/** Structured-Streaming ingest path: spots per micro-batch, event-time
  * windowed counts with watermark, and mapGroupsWithState running stats. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def model = SparkEntry.model(spark)

  test("streaming spots equal batch spots on the same pages") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val pages = SyntheticCorpus.webPages(spark, 20).collect()
    val bc = spark.sparkContext.broadcast(Spotter.buildAutomaton(model.surfaceForms))

    val stream = MemoryStream[WebPage]
    stream.addData(pages.take(10).toSeq)
    val q = StreamingAnnotate.startMemorySink(
      StreamingAnnotate.spotStream(stream.toDS(), bc).toDF(),
      "spots_sink", org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable()
    stream.addData(pages.drop(10).toSeq) // second micro-batch
    q.processAllAvailable()
    val streamed = spark.table("spots_sink")
      .select("url", "para_idx", "offset", "sf").collect().toSet
    q.stop()

    val batch = Spotter.spots(
      graft.extract.Extractor.paragraphs(
        graft.extract.Extractor.extracted(SyntheticCorpus.webPages(spark, 20))), bc)
      .toDF().select("url", "para_idx", "offset", "sf").collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming annotation equals batch annotation on the same pages") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val m = model
    val pages = SyntheticCorpus.webPages(spark, 12).collect()

    val sink = scala.collection.mutable.ArrayBuffer[(String, Int, Int, String)]()
    val stream = MemoryStream[graft.model.WebPage]
    stream.addData(pages.take(6).toSeq)
    val q = StreamingAnnotate.annotateStream(stream.toDS(), m) { (best, _) =>
      sink ++= best.select("url", "para_idx", "offset", "uri").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      ()
    }
    q.processAllAvailable()
    stream.addData(pages.drop(6).toSeq) // second micro-batch
    q.processAllAvailable()
    q.stop()

    val batch = graft.disambig.Disambiguator.best(
      graft.pipeline.Annotate.scoredOn(spark, m,
        graft.extract.Extractor.paragraphs(
          graft.extract.Extractor.extracted(SyntheticCorpus.webPages(spark, 12)))))
      .select("url", "para_idx", "offset", "uri").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(sink.toSet === batch)
    assert(sink.nonEmpty)
    assert(sink.size === sink.toSet.size) // micro-batches don't overlap
  }

  test("streaming triples equal batch mention triples on the same pages") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val m = model
    val pages = SyntheticCorpus.webPages(spark, 12).collect()
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, String, Double)]()
    val stream = MemoryStream[graft.model.WebPage]
    stream.addData(pages.take(6).toSeq)
    val q = StreamingAnnotate.tripleStream(stream.toDS(), m) { (t, _) =>
      sink ++= t.select("subj", "pred", "obj", "score").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      ()
    }
    q.processAllAvailable()
    stream.addData(pages.drop(6).toSeq)
    q.processAllAvailable()
    q.stop()

    val batch = graft.triples.Triples.mentions(
      graft.pipeline.Annotate.annotationsFrom(spark,
        graft.pipeline.Annotate.scoredOn(spark, m,
          graft.extract.Extractor.paragraphs(
            graft.extract.Extractor.extracted(SyntheticCorpus.webPages(spark, 12))))))
      .toDF().select("subj", "pred", "obj", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(sink.toSet === batch)
    assert(sink.nonEmpty)
    assert(sink.forall(_._2 == graft.triples.Triples.MentionsPred))
  }

  test("windowed counts with watermark and running url state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val pages = SyntheticCorpus.webPages(spark, 10).collect()
    val bc = spark.sparkContext.broadcast(Spotter.buildAutomaton(model.surfaceForms))

    val s1 = MemoryStream[WebPage]
    s1.addData(pages.toSeq)
    val wq = StreamingAnnotate.startMemorySink(
      StreamingAnnotate.windowedSpotCounts(
        StreamingAnnotate.spotStream(s1.toDS(), bc), "1 hour", "2 hours"),
      "windowed_sink")
    wq.processAllAvailable(); wq.stop()
    val windowed = spark.table("windowed_sink")
    assert(windowed.count() > 0)
    assert(windowed.columns.toSet === Set("window", "sf", "n_spots"))

    val s2 = MemoryStream[WebPage]
    s2.addData(pages.take(5).toSeq)
    val uq = StreamingAnnotate.startMemorySink(
      StreamingAnnotate.runningUrlStats(
        StreamingAnnotate.spotStream(s2.toDS(), bc)).toDF(),
      "urlstats_sink")
    uq.processAllAvailable()
    s2.addData(pages.take(5).toSeq) // same urls again → counts double
    uq.processAllAvailable(); uq.stop()
    val stats = spark.table("urlstats_sink")
      .groupBy("url").max("n_spots", "n_batches").collect()
    assert(stats.forall(_.getLong(2) === 2L)) // every url saw 2 batches
  }
}
