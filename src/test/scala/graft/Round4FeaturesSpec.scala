package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.AnnotationRow
import graft.triples.Serializers

/** Round-4 hardening: spliceLinks clamps malformed spans (ADVICE r3 —
  * an overlapping or out-of-range offset must not turn into a
  * negative-length substr that silently drops paragraph text). */
class Round4FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val ns = "http://dbpedia.org/resource/"

  test("HTML splice survives overlapping spans without dropping text") {
    import spark.implicits._
    // second span starts INSIDE the first (post-resolveOverlaps input
    // never does this; the splice must stay total anyway)
    val anns = Seq(
      AnnotationRow("u1", 1, 0, "ABCDE", "A", 1L, Seq(), 0.1, 0.1, 0.1),
      AnnotationRow("u1", 1, 3, "DEF", "D", 1L, Seq(), 0.1, 0.1, 0.1)).toDF()
    val paras = Seq(("u1", 1, "ABCDEFGH")).toDF("url", "para_idx", "para_text")
    val doc = Serializers.toHtml(anns, paras).head().getString(2)
    // both links render (overlap gap clamps to empty, never negative)
    assert(doc.contains(s"""<a href="${ns}A" title="${ns}A" target="_blank">ABCDE</a>"""))
    assert(doc.contains(s"""<a href="${ns}D" title="${ns}D" target="_blank">DEF</a>"""))
    // the tail after the furthest span end is preserved
    assert(doc.contains("DEF</a>GH"))
  }

  test("HTML splice survives an out-of-range offset without dropping text") {
    import spark.implicits._
    val anns = Seq(
      AnnotationRow("u2", 1, 100, "X", "X", 1L, Seq(), 0.1, 0.1, 0.1)).toDF()
    val paras = Seq(("u2", 1, "short text")).toDF("url", "para_idx", "para_text")
    val doc = Serializers.toHtml(anns, paras).head().getString(2)
    // the full paragraph text still renders; the phantom link lands after it
    assert(doc.contains("short text"))
    assert(doc.contains(s"""short text<a href="${ns}X""""))
  }
}
