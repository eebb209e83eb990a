package graft.util

/**
 * T3: English stemming for the tokenizer's stemmer hook. The reference
 * wraps the Tartarus Snowball library behind its Stemmer trait
 * (/root/reference core/src/main/scala/org/dbpedia/spotlight/db/stem/
 * SnowballStemmer.scala:6-18, selected per-language in
 * CreateSpotlightModel.scala:223-224); that library is not available
 * offline, so this is a from-scratch implementation of the published
 * Porter (1980) algorithm — the Snowball "english" ancestor — written
 * directly from the algorithm definition.
 *
 * Pure and allocation-light (one char buffer per call) so it can run
 * inside per-partition token loops without GC pressure.
 */
object PorterStemmer {

  /** Stem `token`; mirrors the reference's lowercase-first contract
   *  (SnowballStemmer.scala:13). Tokens shorter than 3 chars are returned
   *  unchanged (Porter's k <= 1 guard). */
  def stem(token: String): String = {
    val w = token.toLowerCase(java.util.Locale.ENGLISH)
    if (w.length < 3 || !w.forall(c => c >= 'a' && c <= 'z')) return w
    val b = w.toCharArray
    var k = b.length - 1 // index of last char of current word

    // consonant test: aeiou are vowels; y is a consonant iff at position 0
    // or preceded by a vowel
    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    // m(): number of consonant-vowel sequences in [0, j]
    def measure(j: Int): Int = {
      var n = 0; var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      while (i <= j) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1
      }
      n
    }

    def vowelInStem(j: Int): Boolean = (0 to j).exists(i => !cons(i))

    def doubleC(j: Int): Boolean = j >= 1 && b(j) == b(j - 1) && cons(j)

    // cvc at i: consonant-vowel-consonant where the final consonant is
    // not w, x or y (enables the "-e restore" rule, e.g. hop(e))
    def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    def endsWith(s: String): Boolean = {
      val l = s.length
      k + 1 >= l && (0 until l).forall(i => b(k - l + 1 + i) == s(i))
    }

    // replace the matched suffix `s` (already verified) with `t`
    def setTo(s: String, t: String): Unit = {
      val j = k - s.length
      var i = 0
      while (i < t.length) { b(j + 1 + i) = t(i); i += 1 }
      k = j + t.length
    }

    // ---- step 1a: plurals
    if (endsWith("sses")) setTo("sses", "ss")
    else if (endsWith("ies")) setTo("ies", "i")
    else if (!endsWith("ss") && endsWith("s")) setTo("s", "")

    // ---- step 1b: -ed / -ing
    var extraEIZ = false
    if (endsWith("eed")) {
      if (measure(k - 3) > 0) setTo("eed", "ee")
    } else if (endsWith("ed") && vowelInStem(k - 2)) {
      setTo("ed", ""); extraEIZ = true
    } else if (endsWith("ing") && vowelInStem(k - 3)) {
      setTo("ing", ""); extraEIZ = true
    }
    if (extraEIZ) {
      if (endsWith("at")) setTo("at", "ate")
      else if (endsWith("bl")) setTo("bl", "ble")
      else if (endsWith("iz")) setTo("iz", "ize")
      else if (doubleC(k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1
      else if (measure(k) == 1 && cvc(k)) { k += 1; b(k) = 'e' }
    }

    // ---- step 1c: y → i when the stem has a vowel
    if (endsWith("y") && vowelInStem(k - 1)) b(k) = 'i'

    // ---- step 2: double suffixes, m > 0 (first match wins, as in Porter)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (s, _) => endsWith(s) }.foreach { case (s, t) =>
      if (measure(k - s.length) > 0) setTo(s, t)
    }

    // ---- step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (s, _) => endsWith(s) }.foreach { case (s, t) =>
      if (measure(k - s.length) > 0) setTo(s, t)
    }

    // ---- step 4: drop suffix when m > 1; (s|t)ion keeps the s/t stem
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(endsWith).foreach { s =>
      val j = k - s.length
      val ionOk = s != "ion" || (j >= 0 && (b(j) == 's' || b(j) == 't'))
      if (ionOk && measure(j) > 1) setTo(s, "")
    }

    // ---- step 5a: final -e
    if (b(k) == 'e') {
      val m = measure(k - 1)
      if (m > 1 || (m == 1 && !cvc(k - 1))) k -= 1
    }
    // ---- step 5b: -ll → -l when m > 1
    if (b(k) == 'l' && doubleC(k) && measure(k - 1) > 1) k -= 1

    new String(b, 0, k + 1)
  }
}
