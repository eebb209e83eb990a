package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 *
 *  - brute-force cosine top-k: the exact baseline — a cross join bounded
 *    by a query-side limit, dot products in column algebra
 *    (`zip_with`/`aggregate`, codegen'd, no UDF);
 *  - LSH-bucketed ANN: random-hyperplane sign bits from deterministic
 *    per-dimension hash weights → bucket join → exact re-rank within
 *    buckets. The scale path: shuffle is bounded by bucket sizes instead
 *    of |Q|×|C|.
 *
 * Embedding-cosine near-dup detection reuses the same primitives with
 * threshold instead of top-k.
 */
object Similarity {

  /** Σ aᵢ·bᵢ as a column expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /**
   * Exact top-k cosine neighbors for each query vector.
   * `queries`/`corpus`: (id, vec). The corpus side streams; per-query
   * top-k via window rank. Queries are broadcast when small.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("q_vec"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic random-hyperplane sign bit i for a vector: sign of
   *  Σ_d vec[d]·w(i,d) with w(i,d) = a fixed hash of (i,d) mapped to
   *  ±[0,1). No model state, identical across runs/executors. */
  private def hyperplaneBit(vec: Column, bit: Int, dims: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), lit(dims - 1)),
        (v, d) => v * (pmod(xxhash64(d, lit(bit)), lit(100000L)).cast("double") / 50000.0d - 1.0d)),
      lit(0.0d), (acc, v) => acc + v)
    when(proj > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
  }

  /** nBits-bit LSH bucket key per vector. */
  def lshKey(vec: Column, nBits: Int, dims: Int): Column =
    (0 until nBits).map(hyperplaneBit(vec, _, dims)).reduce((a, b) => a.bitwiseOR(b))

  /**
   * ANN via hyperplane-LSH buckets: candidates share a bucket key (plus
   * the query's single-bit-flip probes when `multiProbe`), exact cosine
   * re-rank within candidates. Recall grows with probes; shuffle volume
   * is Σ bucket² instead of |Q|·|C|.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = 12, dims: Int = 64, multiProbe: Boolean = true,
              maxBucketSize: Int = 10000): DataFrame = {
    val c = Dedup.boundBuckets(
      corpus.select(col("id").as("neighbor_id"), col("vec").as("c_vec"),
        lshKey(col("vec"), nBits, dims).as("bucket")),
      Seq("bucket"), maxBucketSize, "ann-lsh corpus")
    val qBase = queries.select(col("id").as("query_id"), col("vec").as("q_vec"),
      lshKey(col("vec"), nBits, dims).as("key0"))
    val q =
      if (!multiProbe) qBase.withColumn("bucket", col("key0")).drop("key0")
      else qBase.withColumn("bucket",
          explode(array((col("key0") +: (0 until nBits).map(b =>
            col("key0").bitwiseXOR(lit(1L << b)))): _*)))
        .drop("key0")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, using the
   *  LSH buckets to avoid the quadratic join. */
  def cosineNearDuplicates(vecs: DataFrame, threshold: Double = 0.95,
                           nBits: Int = 10, dims: Int = 64,
                           maxBucketSize: Int = 2000): DataFrame = {
    val b = Dedup.boundBuckets(
      vecs.select(col("id"), col("vec"), lshKey(col("vec"), nBits, dims).as("bucket")),
      Seq("bucket"), maxBucketSize, "cosine-near-dup")
    val l = b.select(col("bucket"), col("id").as("doc_a"), col("vec").as("vec_a"))
    val r = b.select(col("bucket"), col("id").as("doc_b"), col("vec").as("vec_b"))
    l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine").distinct()
  }
}
