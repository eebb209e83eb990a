package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.WikiPageParser

/**
 * Gold-corpus readers in the reference's evaluation formats:
 *
 *  - MilneWitten-style: paragraphs carrying inline `[[uri|sf]]` links
 *    (eval/src/main/scala/org/dbpedia/spotlight/corpus/
 *    MilneWittenCorpus.scala:48-87 parses the same link syntax out of
 *    `<p>` blocks) — re-parsed through OUR extractor so offsets line up
 *    with the annotate path exactly (the reference does the same with
 *    WikipediaHeldoutCorpus, index/.../io/WikipediaHeldoutCorpus.scala:18-56);
 *  - heldout lines: one MediaWiki paragraph per line;
 *  - occurrence TSV via [[graft.sources.OccurrenceTsv]].
 *
 * Output schema matches the pipeline's gold: (url, para_idx, uri, sf, offset).
 */
object Corpora {

  /** Parse link-annotated paragraphs (doc_id → markup lines) into gold
   *  occurrences + the plain paragraph text the annotator sees. */
  def fromMarkupParagraphs(spark: SparkSession,
                           docs: Seq[(String, Seq[String])]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = docs.flatMap { case (docId, paras) =>
      paras.zipWithIndex.map { case (p, i) =>
        (docId, i + 1, WikiPageParser.parseParagraph(p))
      }
    }
    val gold = parsed.flatMap { case (docId, idx, para) =>
      para.links.map(l => (docId, idx, l.uri, l.sf, l.offset))
    }.toDF("url", "para_idx", "uri", "sf", "offset")
    val text = parsed.map { case (docId, idx, para) => (docId, idx, para.text) }
      .toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  /** Heldout format: one markup paragraph per line, url derived from the
   *  line number (WikipediaHeldoutCorpus semantics). */
  def fromHeldoutLines(spark: SparkSession, lines: Seq[String]): (DataFrame, DataFrame) =
    fromMarkupParagraphs(spark,
      lines.zipWithIndex.map { case (l, i) => (s"heldout:$i", Seq(l)) })
}
