package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/**
 * Golden regression: the annotate pipeline over the deterministic
 * 120-doc fixture must reproduce the committed outputs
 * (src/test/resources/golden/, regenerated only deliberately via
 * graft.GoldenGen). Rendering logic is shared with the generator
 * (GoldenGen.top1Rows/tripleRows) so the two can never desynchronize.
 */
class GoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def golden(name: String): List[String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$name"), "UTF-8")
    try src.getLines().toList finally src.close()
  }

  test("top1 annotations match golden (decisions exact, scores to 5dp)") {
    val live = GoldenGen.top1Rows(spark).toList
    val gold = golden("top1.tsv")
    assert(live.size === gold.size)
    val mismatches = live.zip(gold).zipWithIndex.collect {
      case ((a, b), i) if a != b => s"line ${i + 1}:\n  live: $a\n  gold: $b"
    }
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))
  }

  test("triple multiset matches golden") {
    assert(GoldenGen.tripleRows(spark).toList === golden("triples.tsv"))
  }
}
