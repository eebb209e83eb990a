package graft.spot

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * From-scratch serializable Aho-Corasick automaton, built once on the
 * driver from the surface-form dictionary and broadcast to executors —
 * spotting is then a map-only stage (no shuffle).
 *
 * Match semantics reproduce the reference's dictionary spotter
 * (/root/reference core/src/main/scala/org/dbpedia/spotlight/spot/
 * ahocorasick/AhoCorasickSpotter.scala:35-186):
 *  - optional case folding at the character level (builder `_.toLower`)
 *  - `findAll` emits every dictionary hit (overlap mode)
 *  - `findNonOverlapping` reproduces the spotter's filter (:118-153):
 *    sort by (start asc, length desc), keep matches that are
 *    word-boundary-aligned on both sides and strictly to the right of the
 *    previously kept chunk (leftmost-longest, ≥1 char gap).
 *
 * Storage: flat arrays + per-node sorted char/next arrays, compact enough
 * to broadcast (the node table is linear in total dictionary characters).
 */
final class AhoCorasick private (
    val caseSensitive: Boolean,
    // CSR-style transition table: node i's edges are chars(edgeStart(i) until edgeStart(i+1))
    edgeStart: Array[Int],
    chars: Array[Char],
    next: Array[Int],
    fail: Array[Int],
    // dictionary-hit lengths per node, CSR as well (ends of patterns)
    outStart: Array[Int],
    outLen: Array[Int]) extends Serializable {

  @inline private def fold(c: Char): Char = if (caseSensitive) c else Character.toLowerCase(c)

  @inline private def step(fromNode: Int, c: Char): Int = {
    var node = fromNode
    while (true) {
      val g = goTo(node, c)
      if (g >= 0) return g
      if (node == 0) return 0
      node = fail(node)
    }
    0
  }

  @inline private def goTo(node: Int, c: Char): Int = {
    var lo = edgeStart(node)
    var hi = edgeStart(node + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = chars(mid)
      if (mc == c) return next(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** All dictionary matches in `text` (overlap mode). */
  def findAll(text: String): Seq[AhoCorasick.Match] = {
    val out = new ArrayBuffer[AhoCorasick.Match]()
    var node = 0
    var i = 0
    while (i < text.length) {
      node = step(node, fold(text.charAt(i)))
      var k = outStart(node)
      val kEnd = outStart(node + 1)
      while (k < kEnd) {
        val len = outLen(k)
        out += AhoCorasick.Match(i - len + 1, len)
        k += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** Word-boundary chars of the reference spotter's filter pattern
   *  `\s|\n|\t|[,.:;¿?¡!()\-'"]` (AhoCorasickSpotter.scala:35). */
  @inline private def isBoundary(c: Char): Boolean =
    Character.isWhitespace(c) || ",.:;¿?¡!()-'\"".indexOf(c) >= 0

  /** All word-boundary-aligned matches, overlaps allowed — used for the
   *  A1 raw total counts of each surface form over all text. */
  def findAllAligned(text: String): Seq[AhoCorasick.Match] =
    findAll(text).filter { m =>
      (m.start == 0 || isBoundary(text.charAt(m.start - 1))) &&
        (m.end >= text.length || isBoundary(text.charAt(m.end)))
    }

  /** Non-overlap mode: the reference's leftmost-longest word-aligned
   *  greedy filter (AhoCorasickSpotter.filter:118-153). */
  def findNonOverlapping(text: String): Seq[AhoCorasick.Match] = {
    val all = findAll(text).toArray
    // (start asc, length desc) — StartLengthOrdering in the reference
    java.util.Arrays.sort(all, Ordering.by((m: AhoCorasick.Match) => (m.start, -m.length)))
    val kept = new ArrayBuffer[AhoCorasick.Match]()
    var lastEnd = -1 // exclusive end of last kept chunk
    var i = 0
    while (i < all.length) {
      val m = all(i)
      val leftOk = m.start == 0 || isBoundary(text.charAt(m.start - 1))
      val rightOk = m.end >= text.length || isBoundary(text.charAt(m.end))
      if (leftOk && rightOk && (lastEnd == -1 || lastEnd < m.start)) {
        kept += m
        lastEnd = m.end
      }
      i += 1
    }
    kept.toSeq
  }
}

object AhoCorasick {

  final case class Match(start: Int, length: Int) {
    def end: Int = start + length // exclusive
  }

  /** Build from dictionary strings (driver-side; single pass trie + BFS
   *  failure links, then compaction into flat arrays). */
  def build(patterns: IterableOnce[String], caseSensitive: Boolean): AhoCorasick = {
    // mutable trie
    val edges = new ArrayBuffer[mutable.TreeMap[Char, Int]]()
    val outs = new ArrayBuffer[List[Int]]()
    def newNode(): Int = { edges += mutable.TreeMap.empty[Char, Int]; outs += Nil; edges.length - 1 }
    newNode() // root = 0

    val it = patterns.iterator
    while (it.hasNext) {
      val raw = it.next()
      if (raw != null && raw.nonEmpty) {
        val p = if (caseSensitive) raw else raw.toLowerCase
        var node = 0
        var i = 0
        while (i < p.length) {
          val c = p.charAt(i)
          node = edges(node).getOrElseUpdate(c, newNode())
          i += 1
        }
        if (!outs(node).contains(p.length)) outs(node) ::= p.length
      }
    }

    val n = edges.length
    val fail = new Array[Int](n)
    // BFS for failure links; merge output sets along failure chain
    val queue = mutable.Queue[Int]()
    edges(0).foreach { case (_, v) => fail(v) = 0; queue.enqueue(v) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      edges(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !edges(f).contains(c)) f = fail(f)
        fail(v) = if (edges(f).contains(c) && edges(f)(c) != v) edges(f)(c) else 0
        outs(v) = (outs(v) ++ outs(fail(v))).distinct
        queue.enqueue(v)
      }
    }

    // compact to CSR arrays
    val edgeStart = new Array[Int](n + 1)
    val outStart = new Array[Int](n + 1)
    var eTot = 0; var oTot = 0
    var i = 0
    while (i < n) {
      edgeStart(i) = eTot; outStart(i) = oTot
      eTot += edges(i).size; oTot += outs(i).size
      i += 1
    }
    edgeStart(n) = eTot; outStart(n) = oTot
    val chars = new Array[Char](eTot)
    val next = new Array[Int](eTot)
    val outLen = new Array[Int](oTot)
    i = 0
    var e = 0; var o = 0
    while (i < n) {
      edges(i).foreach { case (c, v) => chars(e) = c; next(e) = v; e += 1 }
      outs(i).sorted.foreach { l => outLen(o) = l; o += 1 }
      i += 1
    }
    new AhoCorasick(caseSensitive, edgeStart, chars, next, fail, outStart, outLen)
  }
}
