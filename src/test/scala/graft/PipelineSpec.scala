package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline
import graft.sources.{OccurrenceTsv, SyntheticCorpus}

/** Checkpoint/resume idempotence (north rule) + the S7 TSV interchange
  * format + eval corpus readers. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("stage commit: second run skips recompute; invalidate forces rerun") {
    val root = Files.createTempDirectory("graft_stages").toString
    var computations = 0
    def computed() = {
      computations += 1
      SyntheticCorpus.webPages(spark, 10).toDF()
        .select("url", "lang")
    }
    val a = Pipeline.stage(spark, s"$root/pages")(computed())
    assert(computations === 1 && Pipeline.isCommitted(s"$root/pages"))
    val b = Pipeline.stage(spark, s"$root/pages")(computed())
    assert(computations === 1) // skipped: read back from committed parquet
    assert(a.collect().toSet === b.collect().toSet)
    // commit marker carries lineage counters
    val marker = Files.readString(java.nio.file.Paths.get(s"$root/pages/_graft_commit.json"))
    assert(marker.contains("\"rows\":10") && marker.contains("partitions"))
    Pipeline.invalidate(s"$root/pages")
    Pipeline.stage(spark, s"$root/pages")(computed())
    assert(computations === 2)
  }

  test("resume mid-pipeline: downstream rebuilt from committed upstream, identical rows") {
    val root = Files.createTempDirectory("graft_resume").toString
    def upstream() = SyntheticCorpus.webPages(spark, 15).toDF().select("url", "text")
    def downstream(up: org.apache.spark.sql.DataFrame) =
      up.select(col("url"), length(col("text")).as("n"))

    val up1 = Pipeline.stage(spark, s"$root/up")(upstream())
    val down1 = Pipeline.stage(spark, s"$root/down")(downstream(up1)).collect().toSet
    // simulate a failed downstream stage: wipe its commit, keep upstream
    Pipeline.invalidate(s"$root/down")
    val up2 = Pipeline.stage(spark, s"$root/up")(upstream()) // skipped (committed)
    val down2 = Pipeline.stage(spark, s"$root/down")(downstream(up2)).collect().toSet
    assert(down1 === down2)
  }

  test("S7 occurrence TSV roundtrip preserves rows") {
    import spark.implicits._
    val lines = Seq(
      "doc1-p1l1\tUnited_States\tUSA\tThe USA congress met.\t4",
      "doc1-p1l2\tMercury_(planet)\tMercury\tMercury orbits the sun.\t0\tDBpedia:Planet")
    val df = OccurrenceTsv.fromStrings(spark, lines)
    assert(df.count() === 2)
    val r = df.filter(col("id") === "doc1-p1l2").head()
    assert(r.getAs[String]("uri") === "Mercury_(planet)")
    assert(r.getAs[Int]("offset") === 0)
    assert(r.getAs[String]("types") === "DBpedia:Planet")

    val dir = Files.createTempDirectory("graft_tsv").toString + "/occs"
    OccurrenceTsv.write(df, dir)
    val back = OccurrenceTsv.read(spark, dir)
    assert(back.select("id", "uri", "sf", "context", "offset").collect().toSet ===
      df.select("id", "uri", "sf", "context", "offset").collect().toSet)
  }

  test("corpus reader: offset integrity invariant (TestCorpora.scala:30-40)") {
    val docs = Seq(
      "mw:doc1" -> Seq(
        "The [[United States|USA]] congress met in [[Washington,_D.C.|Washington]] today.",
        "Both [[Mercury (planet)|Mercury]] and [[Java (island)|Java]] were discussed."))
    val (gold, text) = graft.eval.Corpora.fromMarkupParagraphs(spark, docs)
    assert(gold.count() === 4)
    val joined = gold.join(text, Seq("url", "para_idx")).collect()
    joined.foreach { r =>
      val t = r.getAs[String]("para_text")
      val sf = r.getAs[String]("sf")
      val off = r.getAs[Int]("offset")
      assert(t.substring(off, off + sf.length) === sf) // the reference's invariant
    }
  }
}
