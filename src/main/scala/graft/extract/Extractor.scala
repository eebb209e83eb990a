package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{OccurrenceRow, ParagraphRow, WebPage}

/**
 * Spark stages of text extraction (S1-S6): web_pages → extracted text →
 * paragraphs → link occurrences. All map-only (narrow) stages; the only
 * shuffles in the whole model build happen later in the groupBy
 * aggregations. Filters/column pruning on web_pages push down to the
 * parquet scan because these are plain Dataset transforms.
 */
object Extractor {

  /** Byte-identical extracted text per url (the input_hint invariant).
   *  UDF-wrapped pure function; one call per page keeps the codegen
   *  boundary coarse (SURVEY.md §4). */
  val extractTextUdf = udf((markup: String) => WikiPageParser.extractText(markup))

  /** web_pages → (url, text) with text re-derived from the raw html
   *  markup. Pages that are redirects or disambiguations are excluded
   *  from the annotate path, as in the reference
   *  (WikiOccurrenceSource.scala:103-105). */
  def extracted(pages: Dataset[WebPage]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("markup", decode($"html", "UTF-8"))
      .filter(!markupIsRedirect($"markup") && !markupIsDisambig($"markup", $"url"))
      .select($"url", extractTextUdf($"markup").as("text"))
  }

  private def markupIsRedirect(markup: org.apache.spark.sql.Column) =
    lower(trim(markup)).startsWith("#redirect")

  private def markupIsDisambig(markup: org.apache.spark.sql.Column,
                               url: org.apache.spark.sql.Column) =
    lower(markup).contains("{{disambig") || url.endsWith("(disambiguation)")

  /** S3: paragraph split → (url, para_idx, para_text); 1-based index as in
   *  the reference's `-p<n>` id scheme (WikiOccurrenceSource.scala:108-110). */
  def paragraphs(extracted: DataFrame): Dataset[ParagraphRow] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.as[(String, String)].flatMap { case (url, text) =>
      text.split("\n\n").iterator.zipWithIndex.collect {
        case (p, i) if p.trim.nonEmpty => ParagraphRow(url, i + 1, p)
      }
    }
  }

  /** S4 (+S5/S6 weights): link occurrences straight from raw pages.
   *  flatMap on the typed Dataset — a generator, not a driver loop. */
  def occurrences(pages: Dataset[WebPage]): Dataset[OccurrenceRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { page =>
      val markup = new String(page.html, "UTF-8")
      if (WikiPageParser.isRedirect(markup)) Iterator.empty
      else {
        val isDisambig = WikiPageParser.isDisambiguation(markup, page.url)
        val weight = if (isDisambig) 10 else 1 // AllOccurrenceSource.scala:83-108
        val provenance = if (isDisambig) "Disambiguation" else "Wikipedia"
        val paras = WikiPageParser.parsePage(markup)
        paras.iterator.zipWithIndex.flatMap { case (para, pIdx) =>
          para.links.iterator.zipWithIndex.map { case (l, lIdx) =>
            OccurrenceRow(
              id = s"${page.url}-p${pIdx + 1}l${lIdx + 1}",
              url = page.url,
              para_idx = pIdx + 1,
              uri = l.uri,
              sf = graft.util.TextUtil.normalizeApostrophe(l.sf),
              offset = l.offset,
              para_text = para.text,
              weight = weight,
              provenance = provenance)
          }
        }
      }
    }
  }
}
