package graft.util

import java.text.BreakIterator
import java.util.Locale
import scala.collection.mutable.ArrayBuffer
import graft.model.Tok

/**
 * Scalar text functions shared by extraction, model build and annotate.
 * Semantics ported from the reference (cited per function); all pure and
 * deterministic so they can run as codegen-bounded UDFs.
 */
object TextUtil {

  /** Smart-apostrophe normalization applied to every text / surface form
   *  (reference: model/Text.scala:27, model/SurfaceForm.scala:36). */
  def normalizeApostrophe(s: String): String = s.replace('’', '\'')

  /** Collapse runs of whitespace/underscores to a single space and trim
   *  (reference: DBpedia WikiUtil.cleanSpace used by SurfaceForm/DBpediaResource). */
  def cleanSpace(s: String): String =
    s.replaceAll("[\\s_]+", " ").trim

  /** Wiki-encode a page title into a URI fragment: cleaned spaces become
   *  underscores, characters outside the MediaWiki-safe set are
   *  percent-encoded (reference: DBpediaResource.scala:33-35 via WikiUtil.wikiEncode). */
  def wikiEncode(title: String): String = {
    val cleaned = cleanSpace(title).replace(' ', '_')
    val sb = new StringBuilder(cleaned.length)
    cleaned.foreach { c =>
      if (c.isLetterOrDigit || "_-.~!$&'()*+,;=:@/".indexOf(c) >= 0) sb.append(c)
      else {
        val bytes = c.toString.getBytes("UTF-8")
        bytes.foreach(b => sb.append(f"%%${b & 0xff}%02X")): Unit
      }
    }
    sb.toString
  }

  /** Inverse of [[wikiEncode]] for title-derived surface forms
   *  (reference: ExtractCandidateMap.scala:172-243 uses wikiDecode on URIs). */
  def wikiDecode(uri: String): String = {
    val decoded = java.net.URLDecoder.decode(uri, "UTF-8")
    cleanSpace(decoded.replace('_', ' '))
  }

  /** Articles dropped by surface-form normalization
   *  (reference: MemorySurfaceFormStore.scala:38). */
  val SfStopWords: Set[String] = Set("the", "an", "a")

  /** Normalized surface-form key used as candidate-lookup fallback
   *  (reference: MemorySurfaceFormStore.normalize, :40-41). */
  def sfNormalize(sf: String): String =
    "/" + sf.replaceAll("[\\p{Punct}]+", " ").toLowerCase
      .split(" ").filter(w => !SfStopWords.contains(w)).mkString(" ")

  /** English stopword list used to mark STOPWORD tokens (reference ships
   *  per-language stopword files; tokenizer marks them,
   *  db/tokenize/LanguageIndependentTokenizer.scala:36-40). */
  val StopWords: Set[String] = Set(
    "a", "an", "the", "and", "or", "but", "of", "in", "on", "at", "to",
    "for", "with", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "being", "it", "its", "this", "that", "these", "those", "he",
    "she", "they", "them", "his", "her", "their", "we", "you", "i", "not",
    "no", "so", "if", "then", "than", "too", "very", "can", "will", "just",
    "into", "over", "after", "before", "between", "out", "up", "down",
    "about", "against", "during", "through", "above", "below", "again",
    "further", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "only", "own", "same", "s", "t", "do", "does", "did", "have",
    "has", "had", "having", "what", "which", "who", "whom", "am", "also")

  /** Locale-based BreakIterator word tokenization, skipping spans that
   *  start with whitespace — semantics of the reference's
   *  LanguageIndependentTokenizer (db/tokenize/LanguageIndependentTokenizer.scala:85-104).
   *  Stemmer is identity (the reference's default `Stemmer()` when no
   *  Snowball model is configured, CreateSpotlightModel.scala:223-224). */
  def tokenize(text: String): Array[Tok] = {
    val it = BreakIterator.getWordInstance(Locale.ENGLISH)
    it.setText(text)
    val out = new ArrayBuffer[Tok](text.length / 5 + 4)
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      if (!Character.isWhitespace(text.charAt(start))) {
        val tok = text.substring(start, end)
        out += Tok(tok, start, StopWords.contains(tok.toLowerCase(Locale.ENGLISH)))
      }
      start = end
      end = it.next()
    }
    out.toArray
  }

  /** True if the token carries content for context scoring: at least one
   *  letter or digit (filters pure punctuation spans that BreakIterator
   *  emits; the reference's Pig token_counts likewise analyzer-filtered
   *  punctuation before counting). */
  def isWordToken(t: String): Boolean = t.exists(_.isLetterOrDigit)

  /** Tokenizer stemmer hook (T3). The reference selects a per-language
   *  Snowball stemmer at model-creation time and threads it through every
   *  tokenization (CreateSpotlightModel.scala:223-224, db/model/
   *  Stemmer.scala); `IdentityStemmer` is its no-model default and
   *  [[PorterStemmer.stem]] the English path. The SAME stemmer must be
   *  used at model-build and annotate time or token ids won't line up. */
  type Stemmer = String => String
  val IdentityStemmer: Stemmer = identity[String] _

  /** Content tokens of a text, lowercased then stemmed: the token stream
   *  used for both entity-context building (A4) and query histograms (D1).
   *  Stopwords and punctuation are excluded consistently on both sides,
   *  so generative scores stay comparable. */
  def contentTokens(text: String, stem: Stemmer): Array[String] =
    tokenize(text).collect { case t if !t.is_stop && isWordToken(t.token) =>
      stem(t.token.toLowerCase(Locale.ENGLISH)) }

  def contentTokens(text: String): Array[String] =
    contentTokens(text, IdentityStemmer)

  /** Lowercase MD5 hex — the same value Spark's `md5()` column function
   *  produces, for typed paths that key by content hash outside column
   *  algebra (streaming dedup state, multimodal payload ids). */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def md5Hex(s: String): String =
    md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Shared single-window sentinel for texts that fit one context window. */
  private[graft] val SingleWindow: Array[Int] = Array(0)

  /** Char-offset starts of maxTokens-sized context windows over a token
   *  stream (D1 MAX_CONTEXT = 250, reference DBTwoStepDisambiguator.scala:71):
   *  window w starts at the offset of token w·maxTokens; the first start
   *  is clamped to 0 so every char belongs to a window. Returns
   *  [[SingleWindow]] when the text fits one window. */
  def windowStarts(toks: Array[Tok], maxTokens: Int): Array[Int] =
    if (toks.length <= maxTokens) SingleWindow
    else {
      val s = toks.grouped(maxTokens).map(_.head.offset).toArray
      s(0) = 0
      s
    }

  /** Sentence-aligned context-window starts — the reference's ACTUAL
   *  window placement (DBTwoStepDisambiguator.bestK, core/.../db/
   *  DBTwoStepDisambiguator.scala:89-118), behind the
   *  `sentenceAlignedWindows` config flag. Semantics replicated exactly:
   *
   *   - the oversize gate counts SENTENCES, not tokens
   *     (`sentences.size <= MAX_CONTEXT` → one window — a reference
   *     quirk kept as-is for parity);
   *   - past the gate, whole sentences accumulate into the current
   *     window until it holds ≥ maxTokens tokens, THEN the window
   *     closes — windows are sentence-aligned and may overshoot the
   *     cap; the final partial window flushes without adding a cut.
   *
   *  Sentences come from `BreakIterator.getSentenceInstance`, the same
   *  segmenter the reference's LanguageIndependentTokenizer uses to tag
   *  `end-of-sentence` (db/tokenize/LanguageIndependentTokenizer.scala:
   *  41-42, 83-84). Returns char-offset window starts consumable by
   *  [[windowOf]], `starts(0) = 0`. */
  def sentenceWindowStarts(text: String, maxTokens: Int): Array[Int] = {
    val si = BreakIterator.getSentenceInstance(Locale.ENGLISH)
    si.setText(text)
    val sentEnds = new ArrayBuffer[Int]()
    si.first()
    var e = si.next()
    while (e != BreakIterator.DONE) { sentEnds += e; e = si.next() }
    if (sentEnds.length <= maxTokens) return SingleWindow
    val toks = tokenize(text)
    val starts = new ArrayBuffer[Int](4)
    starts += 0
    var ti = 0
    var winTokens = 0
    var i = 0
    while (i < sentEnds.length) {
      val se = sentEnds(i)
      while (ti < toks.length && toks(ti).offset < se) { winTokens += 1; ti += 1 }
      if (winTokens >= maxTokens && i != sentEnds.length - 1) {
        starts += se // next window opens at the next sentence's first char
        winTokens = 0
      }
      i += 1
    }
    if (starts.length == 1) SingleWindow else starts.toArray
  }

  /** The window starts for a paragraph under either placement mode —
   *  the one entry point [[graft.spot.Spotter.spots]] and
   *  [[graft.disambig.Disambiguator.docTokenHistogram]] share so spot
   *  tagging and histogram keying can never disagree. Token-aligned
   *  (default) keeps the char-length fast path: a text of ≤ maxTokens
   *  CHARS cannot hold more than maxTokens tokens, so it skips the
   *  tokenize entirely. */
  def contextWindowStarts(text: String, maxTokens: Int,
                          sentenceAligned: Boolean): Array[Int] =
    if (sentenceAligned) sentenceWindowStarts(text, maxTokens)
    else if (text.length <= maxTokens) SingleWindow
    else windowStarts(tokenize(text), maxTokens)

  /** Window index of a char offset: the last window start ≤ offset
   *  (binary search; starts is ascending with starts(0) = 0). */
  def windowOf(starts: Array[Int], offset: Int): Int = {
    var lo = 0
    var hi = starts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= offset) lo = mid else hi = mid - 1
    }
    lo
  }
}
