package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/**
 * Golden regression: the annotate pipeline over the deterministic
 * 120-doc fixture must reproduce the committed outputs
 * (src/test/resources/golden/, regenerated only deliberately via
 * graft.GoldenGen). Decisions compared exactly; scores to 5 decimals.
 */
class GoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def golden(name: String): List[String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$name"), "UTF-8")
    try src.getLines().toList finally src.close()
  }

  test("top1 annotations match golden (decisions exact, scores to 5dp)") {
    val live = disambig.Disambiguator.best(SparkEntry.scored(spark))
      .select(col("url"), col("para_idx"), col("offset"), col("sf"), col("uri"),
        format_number(col("similarity_score"), 5).as("sim5"))
      .orderBy("url", "para_idx", "offset")
      .collect()
      .map(r => s"${r.getString(0)}\t${r.getInt(1)}\t${r.getInt(2)}\t${r.getString(3)}\t${r.getString(4)}\t${r.getString(5)}")
      .toList
    val gold = golden("top1.tsv")
    assert(live.size === gold.size)
    val mismatches = live.zip(gold).zipWithIndex.collect {
      case ((a, b), i) if a != b => s"line ${i + 1}:\n  live: $a\n  gold: $b"
    }
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))
  }

  test("triple multiset matches golden") {
    val live = pipeline.Annotate
      .triplesFrom(spark, SparkEntry.model(spark), SparkEntry.scored(spark))
      .toDF()
      .groupBy("subj", "pred", "obj").agg(count(lit(1)).as("n"))
      .orderBy("subj", "pred", "obj")
      .collect()
      .map(r => s"${r.getString(0)}\t${r.getString(1)}\t${r.getString(2)}\t${r.getLong(3)}")
      .toList
    assert(live === golden("triples.tsv"))
  }
}
