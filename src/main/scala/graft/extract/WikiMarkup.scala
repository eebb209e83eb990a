package graft.extract

import java.util.regex.Pattern

/**
 * Wiki/HTML markup stripping — the byte-identical text-extraction
 * contract of the pipeline (BASELINE.json input_hint).
 *
 * Semantics reproduce the reference extractor pass-for-pass
 * (/root/reference core/src/main/scala/org/dbpedia/spotlight/string/
 * WikiMarkupStripper.scala:35-192): HTML unescape, drop
 * see-also/references/further-reading/external-links sections, magic
 * words, bold/italic/heading markers, leading bullets, comments,
 * `<ref>` footnotes, remaining HTML tags, then collapse 3+ newlines.
 * Pass ORDER matters and is part of the contract.
 *
 * All functions are pure and deterministic; they run inside a Scala UDF
 * / typed flatMap on executors (map-only stage, no shuffle).
 */
object WikiMarkup {

  /** Full strip: markup → plain text with only [[...]] links retained.
   *  (reference stripEverything, WikiMarkupStripper.scala:35-50) */
  def stripEverything(markup: String): String = {
    var s = unescapeHtml(markup)
    s = stripSection(s, "see also")
    s = stripSection(s, "references")
    s = stripSection(s, "further reading")
    s = stripSection(s, "external links")
    s = stripMagicWords(s)
    s = stripFormatting(s)
    s = stripBullets(s)
    s = stripHtml(s)
    s = stripExcessNewlines(s)
    s
  }

  /** HTML entity unescape (named HTML4 set + numeric), equivalent to the
   *  commons StringEscapeUtils.unescapeHtml call in the reference. */
  def unescapeHtml(s: String): String =
    org.apache.commons.text.StringEscapeUtils.unescapeHtml4(s)

  /** Removes `== Section ==` header + content for the named section.
   *  Two-pass algorithm as in the reference (WikiMarkupStripper.scala:94-117):
   *  first sections terminated by the next same-level heading, then
   *  sections terminated by a blank line. */
  def stripSection(markup: String, sectionName: String): String = {
    val p1 = Pattern.compile(
      "(={2,})\\s*" + Pattern.quote(sectionName) + "\\s*\\1.*?([^=]\\1[^=])",
      Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    val m1 = p1.matcher(markup)
    val sb1 = new java.lang.StringBuilder
    var last = 0
    while (m1.find()) {
      sb1.append(markup, last, m1.start())
      sb1.append(m1.group(2))
      last = m1.end()
    }
    sb1.append(markup, last, markup.length)
    val mid = sb1.toString

    val p2 = Pattern.compile(
      "(={2,})\\s*" + Pattern.quote(sectionName) + "\\s*\\1\\W*.*?\n\n",
      Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    val m2 = p2.matcher(mid)
    val sb2 = new java.lang.StringBuilder
    last = 0
    while (m2.find()) {
      sb2.append(mid, last, m2.start())
      last = m2.end() - 2 // keep the terminating blank line
    }
    sb2.append(mid, last, mid.length)
    sb2.toString
  }

  /** `__NOTOC__`-style magic words (WikiMarkupStripper.scala:140-142). */
  def stripMagicWords(markup: String): String =
    markup.replaceAll("""\_\_(\p{Upper}+\_\_)""", "")

  /** Bold/italic quotes, heading `==`, leading indent colons
   *  (WikiMarkupStripper.scala:149-154). */
  def stripFormatting(markup: String): String = {
    var s = markup.replaceAll("""'{2,}""", "")
    s = s.replaceAll("""={2,}""", "")
    s = s.replaceAll("""\n:+""", "\n")
    s
  }

  /** Leading `*` bullets incl. decoration up to the first word/link char
   *  (WikiMarkupStripper.scala:183-185). */
  def stripBullets(markup: String): String =
    markup.replaceAll("""\n\*+[^\w\[]*""", "\n")

  /** `<ref>` footnotes, both self-closing and paired
   *  (WikiMarkupStripper.scala:124-129). */
  def stripRefs(markup: String): String = {
    var s = markup.replaceAll("""<ref\\\\>""", "")
    s = s.replaceAll("""(?s)<ref>(.*?)</ref>""", "")
    s = s.replaceAll("""(?s)<ref\s(.*?)>(.*?)</ref>""", "")
    s
  }

  /** HTML comments, refs, then any remaining tags; tag *content* is kept
   *  (WikiMarkupStripper.scala:166-170). */
  def stripHtml(markup: String): String = {
    var s = markup.replaceAll("""(?s)\<\!\-\-(.*?)\-\-\>""", "")
    s = stripRefs(s)
    s = s.replaceAll("""<([^>]*?)>""", "")
    s
  }

  /** Collapse 3+ newlines to exactly two (WikiMarkupStripper.scala:174-176). */
  def stripExcessNewlines(markup: String): String =
    markup.replaceAll("""\n{3,}""", "\n\n")

  /** Multi-pipe link labels keep only the last segment
   *  (WikiMarkupStripper.scala:156-159). */
  def stripMultiPipe(markup: String): String =
    markup.replaceAll("""^.*\|""", "")
}
