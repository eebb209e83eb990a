package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora. Each variant is a
 * distinct shuffle shape:
 *
 *  - exact: one hash-groupBy on md5(text) — map-side combinable;
 *  - MinHash+LSH: shingle → k minhashes → b bands → groupBy band bucket
 *    → pairs within buckets (the classic near-dup join that avoids the
 *    quadratic cross join; bucket sizes bound the blow-up);
 *  - SimHash: 64-bit signature, bucket on 4×16-bit chunks (hamming ≤3
 *    candidates share ≥1 chunk by pigeonhole);
 *  - n-gram Jaccard: exact verification on LSH candidate pairs only;
 *  - embedding cosine: brute-force within LSH-bucketed candidates (see
 *    Similarity for the ANN path).
 */
object Dedup {

  /** Exact duplicate groups: canonical doc = min(doc_id) per md5(text).
   *  Returns (doc_id, canonical_id, content_hash). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("content_hash").orderBy(col(idCol))
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .select(col(idCol), col("canonical_id"), col("content_hash"))
  }

  /** Word shingles of size n as a deduplicated array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** k MinHash values per document: min over shingles of
   *  xxhash64(shingle, seed_i) — all column expressions, codegen'd. */
  def minhashSignature(text: Column, k: Int = 32, shingleSize: Int = 3): Column =
    transform(sequence(lit(0), lit(k - 1)), seed =>
      array_min(transform(shingles(text, shingleSize), s => xxhash64(s, seed))))

  /** LSH candidate pairs from banded minhash signatures:
   *  b bands × r rows (k = b·r); docs sharing any band bucket pair up.
   *  Returns distinct (doc_a, doc_b) with doc_a < doc_b. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text",
                            bands: Int = 8, rows: Int = 4,
                            shingleSize: Int = 3): DataFrame = {
    val k = bands * rows
    val sig = docs.select(col(idCol).as("doc"),
      minhashSignature(col(textCol), k, shingleSize).as("sig"))
    val banded = sig.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("doc").as("doc_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc").as("doc_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate verification.
   *  `pairs(doc_a, doc_b)` joined back to texts; similarity =
   *  |A∩B| / |A∪B| over shingle sets. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleSize).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-duplicate clusters: LSH candidates verified by Jaccard ≥ t,
   *  canonical = min doc id per connected pair (single-hop union — full
   *  connected components would iterate, not needed for dedup policy). */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.8,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cand = minhashCandidatePairs(docs, idCol, textCol)
    ngramJaccard(cand, docs, idCol, textCol).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from whitespace tokens: per-bit sign aggregation of
   *  FNV-1a-64 token hashes. Deterministic Scala UDF — the 64-way bit
   *  unroll as pure column algebra would blow up codegen for no gain;
   *  the UDF is one coarse call per document (map-only). */
  val simhash64Udf = udf { (text: String) =>
    val counts = new Array[Int](64)
    if (text != null) {
      text.toLowerCase.trim.split("\\s+").foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h = (h ^ t.charAt(i)) * 0x100000001b3L; i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash64(text: Column): Column = simhash64Udf(text)

  /** SimHash near-dup candidates: bucket by each of four 16-bit chunks —
   *  any pair within hamming distance 3 shares at least one chunk. */
  def simhashCandidatePairs(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val sig = docs.select(col(idCol).as("doc"), simhash64(col(textCol)).as("sig"))
    val chunked = sig.select(col("doc"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "bucket")
    val l = chunked.select(col("chunk"), col("bucket"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("bucket"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hammingDistance64(col("sig_a"), col("sig_b")))
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** Popcount of xor — hamming distance of two 64-bit signatures. */
  def hammingDistance64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
