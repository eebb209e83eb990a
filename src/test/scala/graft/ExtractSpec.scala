package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{WikiMarkup, WikiPageParser}
import graft.util.TextUtil

/** Golden tests for the byte-identical extraction contract
 *  (semantics of WikiMarkupStripper.scala:35-192 + WikiOccurrenceSource
 *  .getOccurrences:128-168 — FIXTURES.md §2). */
class ExtractSpec extends AnyFunSuite {

  test("html unescape") {
    assert(WikiMarkup.unescapeHtml("Fish &amp; Chips &lt;b&gt;") === "Fish & Chips <b>")
  }

  test("strip section terminated by next heading keeps the heading") {
    val in = "Intro text.\n== See also ==\njunk line\n a== History ==b\nreal."
    val out = WikiMarkup.stripSection(in, "see also")
    assert(!out.contains("junk"))
    assert(out.contains("== History =="))
    assert(out.contains("real."))
  }

  test("strip section terminated by blank line") {
    val in = "Intro.\n\n== References ==\nsome ref\nmore ref\n\nTail."
    val out = WikiMarkup.stripSection(in, "references")
    assert(!out.contains("some ref"))
    assert(out.contains("Tail."))
    assert(out.contains("Intro."))
  }

  test("magic words, formatting, bullets, html, refs, comments") {
    assert(WikiMarkup.stripMagicWords("__NOTOC__text") === "text")
    assert(WikiMarkup.stripFormatting("'''bold''' and ''it''") === "bold and it")
    assert(WikiMarkup.stripFormatting("a\n:indented") === "a\nindented")
    assert(WikiMarkup.stripBullets("x\n* item one") === "x\nitem one")
    assert(WikiMarkup.stripHtml("a<!-- hidden -->b") === "ab")
    assert(WikiMarkup.stripHtml("a<ref>foot</ref>b") === "ab")
    assert(WikiMarkup.stripHtml("""a<ref name="x">foot</ref>b""") === "ab")
    assert(WikiMarkup.stripHtml("a<div>b</div>c") === "abc")
    assert(WikiMarkup.stripExcessNewlines("a\n\n\n\nb") === "a\n\nb")
    assert(WikiMarkup.stripMultiPipe("A|B|C") === "C")
  }

  test("deterministic: f(x) == f(x)") {
    val m = "__TOC__ '''Hello''' <ref>x</ref> [[A|B]] &amp; more\n\n\n\nEnd"
    assert(WikiMarkup.stripEverything(m) === WikiMarkup.stripEverything(m))
  }

  test("paragraph link extraction: offsets, multi-pipe, parenthetical, leading article") {
    val para = "The [[Mercury (planet)|Mercury]] planet and [[Java (island)]] plus [[X|Y|The Zed (thing)]]."
    val p = WikiPageParser.parseParagraph(para)
    // [[Java (island)]] label = "Java (island)" → parenthetical stripped → "Java"
    // [[X|Y|The Zed (thing)]] label = "The Zed (thing)" → "Zed"
    assert(p.links.map(_.uri) === List("Mercury_(planet)", "Java_(island)", "X"))
    assert(p.links.map(_.sf) === List("Mercury", "Java", "Zed"))
    p.links.foreach { l =>
      assert(p.text.substring(l.offset, l.offset + l.sf.length) === l.sf) // offset integrity
    }
    assert(!p.text.contains("[["))
  }

  test("whitespace flattened, smart apostrophe normalized (Text.scala:27)") {
    val p = WikiPageParser.parseParagraph("It’s a\ttab and [[A]] here")
    assert(p.text === "It's a tab and A here")
  }

  test("category links excluded from occurrences but text kept") {
    val p = WikiPageParser.parseParagraph("See [[Category:Things|stuff]] and [[Real Page]]")
    assert(p.links.map(_.uri) === List("Real_Page"))
    assert(p.text === "See stuff and Real Page")
  }

  test("redirect and disambiguation detection") {
    assert(WikiPageParser.isRedirect("#REDIRECT [[Other Page]]"))
    assert(WikiPageParser.redirectTarget("#redirect [[Other Page]]") === Some("Other_Page"))
    assert(WikiPageParser.isDisambiguation("{{disambig}}", "x"))
    assert(WikiPageParser.isDisambiguation("", "Mercury (disambiguation)"))
  }

  test("wiki encode/decode round trip") {
    assert(TextUtil.wikiEncode("Mercury (planet)") === "Mercury_(planet)")
    assert(TextUtil.wikiDecode("Mercury_(planet)") === "Mercury (planet)")
    assert(TextUtil.wikiEncode("A  B") === "A_B")
  }

  test("sf normalization (MemorySurfaceFormStore.scala:40-41)") {
    assert(TextUtil.sfNormalize("The United-States") === "/united states")
    assert(TextUtil.sfNormalize("USA") === "/usa")
  }

  test("full page extraction is stable and strips everything") {
    val markup = "__NOTOC__\n'''Intro''' with [[Mercury (planet)|Mercury]]<ref>note</ref>.\n\nSecond &amp; para.\n\n== See also ==\n* [[Topic 10]]\n\nTail."
    val text = WikiPageParser.extractText(markup)
    assert(text === "Intro with Mercury.\n\nSecond & para.\n\nTail.")
  }

  test("synthetic corpus carries no VT/FF (extraction-oracle whitespace guard)") {
    // The DuckDB extraction oracles (p_extracted / p_occurrences) model
    // Java trim with a space/TAB/LF/CR set and RE2's \s (which excludes
    // \u000B) — both diverge from Java on vertical tab and form feed.
    // The divergence is harmless only while the corpus never emits those
    // two chars; this pins that invariant so a fixture change fails HERE
    // with a message instead of as an opaque driver hash mismatch.
    val spark = GraftSession.local(2)
    import org.apache.spark.sql.functions._
    val bad = graft.sources.SyntheticCorpus.webPages(spark, 120)
      .select(decode(col("html"), "UTF-8").as("m"))
      .filter(col("m").contains("\u000B") || col("m").contains("\u000C"))
      .count()
    assert(bad === 0L, "synthetic markup contains VT/FF; the extraction " +
      "oracles' whitespace model no longer matches Java trim/\\s semantics")
  }
}
