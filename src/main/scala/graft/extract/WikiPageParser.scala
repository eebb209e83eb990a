package graft.extract

import scala.collection.mutable.ListBuffer
import graft.util.TextUtil

/**
 * Minimal deterministic wiki-page parser: paragraph splitting and
 * internal-link occurrence extraction over text already cleaned by
 * [[WikiMarkup.stripEverything]] (which preserves only `[[...]]` links).
 *
 * Semantics reproduce the reference's occurrence source
 * (/root/reference index/src/main/scala/org/dbpedia/spotlight/io/
 * WikiOccurrenceSource.scala:35,128-168):
 *  - paragraphs split on the regex `(\n|<br/>)(tag)?(\n|<br/>)+`
 *  - per paragraph, walk text and link nodes, accumulating plain text;
 *    each Main-namespace link yields (dest_uri_encoded, surface_form, offset)
 *  - surface form cleanup: keep last `|` segment, trim, drop trailing
 *    ` (...)`, drop leading `The ` / `A `
 *  - final paragraph text: all whitespace flattened to single spaces,
 *    smart apostrophes normalized (model/Text.scala:27)
 */
object WikiPageParser {

  /** Paragraph-break regex (WikiOccurrenceSource.scala:35). */
  val SplitParagraphs = """(\n|(<br\s?/?>))(</?\w+?\s?/?>)?(\n|(<br\s?/?>))+"""

  private val LinkRe = """\[\[([^\[\]]*?)\]\]""".r
  private val NonMainPrefixes =
    Set("category", "file", "image", "wikipedia", "template", "help", "talk", "user", "portal")

  /** Link-target segment before the first `|`. `"|".split('|')` is an
   *  EMPTY array in Scala/Java — a bare `[[|]]` in crawl garbage made a
   *  naive `.head` throw and would kill the whole job (RobustnessSpec). */
  private def firstSegment(inner: String): String = {
    val i = inner.indexOf('|')
    if (i < 0) inner else inner.substring(0, i)
  }

  final case class Link(uri: String, sf: String, offset: Int)
  final case class Paragraph(text: String, links: List[Link])

  def isRedirect(source: String): Boolean =
    source.trim.toLowerCase.startsWith("#redirect")

  /** Redirect target title of a `#REDIRECT [[X]]` page, if any. */
  def redirectTarget(source: String): Option[String] =
    if (!isRedirect(source)) None
    else LinkRe.findFirstMatchIn(source)
      .map(m => TextUtil.wikiEncode(firstSegment(m.group(1))))

  def isDisambiguation(source: String, title: String): Boolean =
    title.endsWith("(disambiguation)") ||
      source.toLowerCase.contains("{{disambig")

  /** Split cleaned page text into paragraphs (empty ones dropped, as the
   *  reference's node splitter produces no empty paragraphs). */
  def splitParagraphs(cleaned: String): List[String] =
    cleaned.split(SplitParagraphs).toList.map(_.trim).filter(_.nonEmpty)

  /** Walk one paragraph's markup: accumulate plain text, resolve links.
   *  Mirrors WikiOccurrenceSource.getOccurrences:128-168. */
  def parseParagraph(para: String): Paragraph = {
    val sb = new StringBuilder
    val links = ListBuffer[Link]()
    var pos = 0
    for (m <- LinkRe.findAllMatchIn(para)) {
      sb.append(para.substring(pos, m.start))
      val inner = m.group(1)
      val dest = firstSegment(inner)
      val offset = sb.length
      // label = segment after the LAST pipe (stripMultiPipe), then cleanup
      var sf = WikiMarkup.stripMultiPipe(inner)
      sf = sf.trim.replaceAll(""" \(.+?\)$""", "").replaceAll("""^(The|A) """, "")
      sb.append(sf)
      val colon = dest.indexOf(':')
      val isMain = colon < 0 || !NonMainPrefixes.contains(dest.substring(0, colon).toLowerCase)
      if (isMain && sf.nonEmpty && dest.trim.nonEmpty)
        links += Link(TextUtil.wikiEncode(dest), sf, offset)
      pos = m.end
    }
    sb.append(para.substring(pos))
    // Text instance normalization: \s → " " then ’ → '
    val text = TextUtil.normalizeApostrophe(sb.toString.replaceAll("""\s""", " "))
    Paragraph(text, links.toList)
  }

  /** Full extraction of a page: cleaned text → paragraphs with links. */
  def parsePage(markup: String): List[Paragraph] =
    splitParagraphs(WikiMarkup.stripEverything(markup)).map(parseParagraph)

  /** The byte-identical extracted text of a page: paragraphs joined by
   *  `\n\n` after link resolution (the plain-text view the annotate path
   *  spots over; invariant target of BASELINE.json input_hint). */
  def extractText(markup: String): String =
    parsePage(markup).map(_.text).mkString("\n\n")
}
