package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.textops.{Dedup, Multimodal, Similarity, TextStats}

/**
 * Training-data pipeline operators over the driver's documents/embeddings
 * tables: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
 * embedding-cosine), similarity search (brute-force + LSH ANN), text
 * analysis (token counts, quality, lang-ID, fingerprints) and the
 * multimodal binary-column plumbing.
 *
 * DuckDB oracles where the arithmetic is portable (md5, double-cast dot
 * products, regexp token splits); custom-hash operators (xxhash64
 * minhash/simhash, hyperplane LSH) get rows-only checks with their
 * value-level behavior asserted in TextOpsSpec.
 */
object TextOpsQueries {

  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String) = s.read.parquet(s"$d/embeddings.parquet")

  /** float[] → double[] so Spark and DuckDB compute bit-identical dots. */
  private def vecsD(s: SparkSession, d: String): DataFrame =
    embs(s, d).select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- text analysis ----------------------------------------------------
    "t_token_counts" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))),

    "t_doc_stats" -> ((s, d) => TextStats.documentStats(docs(s, d))),

    "t_lang_id" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextStats.langIdUdf(col("text")).getField("_1").as("lang_pred"),
        round(TextStats.langIdUdf(col("text")).getField("_2"), 6).as("lang_score"))),

    "t_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), TextStats.fingerprintUdf(col("text")).as("fingerprint"))),

    // -- dedup -------------------------------------------------------------
    "t_exact_dedup" -> ((s, d) => Dedup.exact(docs(s, d))),

    "t_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidatePairs(docs(s, d), bands = 8, rows = 4)),

    "t_near_dups" -> ((s, d) =>
      Dedup.nearDuplicates(docs(s, d), threshold = 0.5)),

    "t_simhash_pairs" -> ((s, d) =>
      Dedup.simhashCandidatePairs(docs(s, d)).filter(col("hamming") <= 16)),

    "t_embedding_near_dups" -> ((s, d) =>
      // synthetic embeddings are near-orthogonal; 0.25 exercises the
      // LSH-bucketed pair path with a non-empty result at small SF
      Similarity.cosineNearDuplicates(
        vecsD(s, d), threshold = 0.25, nBits = 4, dims = 64)),

    // -- similarity search ---------------------------------------------------
    "t_ann_bruteforce" -> ((s, d) => {
      val v = vecsD(s, d)
      Similarity.bruteForceTopK(v.filter(col("id") < 16), v, k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
    }),

    "t_ann_lsh" -> ((s, d) => {
      val v = vecsD(s, d)
      Similarity.lshTopK(v.filter(col("id") < 16), v, k = 5, nBits = 10, dims = 64)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    "t_embedding_norms" -> ((s, d) =>
      vecsD(s, d).select(col("id").as("vec_id"),
        round(Similarity.l2norm(col("vec")), 6).as("l2"))),

    // -- multimodal plumbing ---------------------------------------------------
    "t_media_features" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.syntheticMedia(s, embs(s, d).select("vec_id"), "vec_id")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"), col("sha"))
    }),

    "t_media_frames" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(s, embs(s, d).select("vec_id"), "vec_id")
      Multimodal.sampleFrames(media).select("media_id", "frame_idx")
    }))

  def oracleSql: Map[String, String] = Map(
    "t_token_counts" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                length(text) AS n_chars
         FROM documents""",
    "t_exact_dedup" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
                md5(text) AS content_hash
         FROM documents""",
    "t_ann_bruteforce" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                    FROM embeddings)
         SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_sum(list_transform(list_zip(q.vec, c.vec), p -> p[1]*p[2])) /
                  (sqrt(list_sum(list_transform(q.vec, x -> x*x))) *
                   sqrt(list_sum(list_transform(c.vec, x -> x*x)))) AS cosine,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_sum(list_transform(list_zip(q.vec, c.vec), p -> p[1]*p[2])) /
                             (sqrt(list_sum(list_transform(q.vec, x -> x*x))) *
                              sqrt(list_sum(list_transform(c.vec, x -> x*x)))) DESC,
                             c.vec_id) AS rank
           FROM v q, v c
           WHERE q.vec_id < 16 AND q.vec_id <> c.vec_id)
         WHERE rank <= 5""",
    "t_embedding_norms" ->
      """SELECT vec_id,
                round(sqrt(list_sum(list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x*x))), 6) AS l2
         FROM embeddings""")
}
