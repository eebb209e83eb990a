package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline:
 * token counting, quality scoring, language ID, document fingerprinting.
 * All column-expression based (whole-stage codegen) except the explicit
 * UDF cases; every function is a narrow map over the documents table.
 */
object TextStats {

  /** Whitespace token count (split on runs of whitespace). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: splits on whitespace AND letter/digit/punct
   *  boundaries — a cheap proxy for tokenizer load estimation. */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "\\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\\d)|(?<=\\d)(?=[A-Za-z])"))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Distinct-word ratio — near-0 for degenerate repetition. */
  def distinctWordRatio(text: Column): Column =
    size(array_distinct(split(lower(trim(text)), "\\s+"))).cast("double") /
      greatest(size(split(trim(text), "\\s+")), lit(1)).cast("double")

  /** Stopword ratio over whitespace tokens (English list). */
  def stopwordRatio(text: Column): Column = {
    val stops = graft.util.TextUtil.StopWords.toArray
    val toks = split(lower(trim(text)), "\\s+")
    size(array_intersect(toks, lit(stops))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
    // note: array_intersect dedups; use filter for exact multiplicity
  }

  /** Exact stopword token fraction (multiplicity preserved). */
  def stopwordFraction(text: Column): Column = {
    val stops = graft.util.TextUtil.StopWords.toArray
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => array_contains(lit(stops), t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1] — heuristics in the spirit of
   *  C4/Gopher-style filters: penalize very short docs, heavy
   *  punctuation, low lexical diversity. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5, lit(1.0))
    val diversity = distinctWordRatio(text)
    round((lenScore * 0.4 + punctPenalty * 0.3 + diversity * 0.3), 6)
  }

  /** n-gram-heuristic language ID over a tiny per-language profile of
   *  frequent function words — deterministic UDF, returns (lang, score).
   *  At 100 TB this is a map-only stage; profiles are compiled in. */
  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Set("el", "la", "los", "y", "es", "de", "que", "en", "un", "por"),
    "it" -> Set("il", "la", "che", "e", "di", "un", "per", "con", "del", "sono"))

  val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) ("und", 0.0)
    else {
      val toks = text.toLowerCase.split("\\s+").take(512)
      // deterministic tie-break (score desc, lang asc) — Map iteration
      // order would otherwise make ties build-dependent and un-oracle-able
      val (best, score) = langProfiles.toSeq.map { case (lang, words) =>
        lang -> toks.count(words.contains).toDouble / math.max(toks.length, 1)
      }.sortBy { case (lang, sc) => (-sc, lang) }.head
      if (score == 0.0) ("und", 0.0) else (best, score)
    }
  }

  /** 64-bit polynomial rolling-hash fingerprint of the full document
   *  (deterministic; base 1099511628211 — FNV prime). Kept as the
   *  UDF reference implementation; [[fingerprint]] is the native
   *  codegen'd Catalyst expression with identical semantics (equality
   *  asserted in Round2FeaturesSpec). */
  val fingerprintUdf = udf((text: String) => graft.functions.FnvFingerprint.hash(text))

  /** Native-expression fingerprint — stays inside whole-stage codegen
   *  (graft.functions.FnvFingerprint). */
  def fingerprint(c: Column): Column = graft.functions.GraftFunctions.fnvFingerprint(c)

  /** Gopher-style repetition quality metrics — COUNT-BASED VARIANTS of
    * the n-gram family in Rae et al. 2021 §A1.1 (the published
    * pretraining-data repetition filters). The paper's n-gram metrics
    * are CHARACTER-coverage fractions (characters inside duplicated /
    * top n-grams over total characters); these compute occurrence-count
    * fractions over token n-grams instead, so the paper's published
    * thresholds (e.g. 0.2 for top-2-gram) do NOT transfer to these
    * values — calibrate cutoffs on these statistics directly. The
    * line-level variants degenerate on single-line web text, and what
    * the family detects (boilerplate loops, generated spam) shows up in
    * token n-gram counts at least as strongly:
    *
    *  - `dup_token_frac`: fraction of whitespace tokens occurring more
    *    than once in the doc (all members of a duplicate group count);
    *  - `top_bigram_frac`: occurrences of the most frequent word bigram
    *    / total bigrams;
    *  - `dup_trigram_frac`: fraction of word trigrams occurring more
    *    than once.
    *
    * Pure column algebra, ONE scan + two shuffles for all three orders:
    * a single explode emits (order, gram) rows for n = 1..3, one
    * groupBy(doc, order, gram) counts them, one conditional-aggregate
    * groupBy(doc) folds the fractions — all map-side combinable, no
    * UDF, whole-stage codegen throughout. Empty tokens from
    * leading/trailing non-space whitespace (trim strips only 0x20;
    * split keeps boundary empties) are dropped so a trailing newline
    * cannot dilute the fractions with a phantom token. The DuckDB
    * oracle re-derives it exactly (round(…,6), fractions 0.0 when the
    * doc is shorter than the n-gram order). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      array_remove(split(lower(trim(col(textCol))), "\\s+"), "").as("t"))
    val grams = toks.select(col("doc_id"), explode(expr(
      """flatten(transform(array(1, 2, 3), n ->
           transform(if(size(t) >= n, sequence(1, size(t) - n + 1), array()),
             i -> struct(n AS ord, concat_ws(' ', slice(t, i, n)) AS gram))))"""
    )).as("g"))
      .select(col("doc_id"), col("g.ord").as("ord"), col("g.gram").as("gram"))
    val aggs = grams.groupBy("doc_id", "ord", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        (sum(when(col("ord") === 1 && col("c") > 1, col("c")).otherwise(0L))
          .cast("double") / sum(when(col("ord") === 1, col("c"))))
          .as("dup_token_frac"),
        (max(when(col("ord") === 2, col("c"))).cast("double") /
          sum(when(col("ord") === 2, col("c")))).as("top_bigram_frac"),
        (sum(when(col("ord") === 3 && col("c") > 1, col("c")).otherwise(0L))
          .cast("double") / sum(when(col("ord") === 3, col("c"))))
          .as("dup_trigram_frac"))
    docs.select(col(idCol).as("doc_id"))
      .join(aggs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("dup_token_frac"), lit(0.0)), 6).as("dup_token_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"),
        round(coalesce(col("dup_trigram_frac"), lit(0.0)), 6).as("dup_trigram_frac"))
  }

  /** Gopher §A1.1 CHARACTER-fraction n-gram repetition metrics (Rae et
    * al. 2021, Table A1) — the companion to [[repetitionStats]]'s
    * count-based variants, computing the fractions the paper's published
    * thresholds actually apply to (top-2/3/4-gram ≤ 0.20/0.18/0.16,
    * dup-5..10-gram ≤ 0.15/0.14/0.13/0.12/0.11/0.10):
    *
    *  - `top_{2,3,4}gram_char_frac`: characters inside occurrences of
    *    the single most frequent word n-gram / total token characters
    *    (occurrence count × n-gram char length; ties broken count desc
    *    then gram asc so the statistic is deterministic and
    *    oracle-checkable — the paper leaves ties unspecified);
    *  - `dup_{5..10}gram_char_frac`: characters inside ANY occurrence of
    *    a word n-gram appearing more than once, each character counted
    *    ONCE (the paper's "taking care not to count characters twice"),
    *    realized as the set union of duplicated-gram token spans —
    *    order-independent, unlike the greedy left-to-right scan some
    *    public reimplementations use, and therefore re-derivable
    *    relationally by the DuckDB oracle.
    *
    * Character space is token characters (whitespace excluded): the
    * denominator is Σ len(token) and every numerator lives in the same
    * space, so the fractions are insensitive to inter-token whitespace
    * runs. Scale shape: ONE explode emits (ord, pos, gram) rows for all
    * nine orders (~9× token volume — the inherent cost of the paper's
    * filter family), one groupBy counts grams, duplicate-span coverage
    * is explode + distinct + join on (doc, pos) — every stage map-side
    * combinable, no UDF. BMP caveat as t_fingerprint: Spark length() is
    * UTF-16 units, DuckDB's is codepoints; testdata is ASCII. */
  def repetitionCharStats(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val toks = docs.select(col(idCol).as("doc_id"),
      array_remove(split(lower(trim(col(textCol))), "\\s+"), "").as("t"))
    val totals = toks.select(col("doc_id"),
      aggregate(col("t"), lit(0L), (a, x) => a + length(x)).as("total_chars"))
    val grams = toks.select(col("doc_id"), explode(expr(
      s"""flatten(transform(array(${(topNs ++ dupNs).mkString(", ")}), n ->
           transform(if(size(t) >= n, sequence(0, size(t) - n), array()),
             i -> struct(n AS ord, i AS pos, concat_ws(' ', slice(t, i + 1, n)) AS gram))))"""
    )).as("g"))
      .select(col("doc_id"), col("g.ord").as("ord"), col("g.pos").as("pos"),
        col("g.gram").as("gram"))
    val counts = grams.groupBy("doc_id", "ord", "gram").agg(count(lit(1)).as("c"))
    // top n-gram chars = occurrences × gram char length; a space-joined
    // gram of order n holds length(gram) - (n - 1) token characters
    val top = counts.filter(col("ord") <= 4)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id", "ord").orderBy(col("c").desc, col("gram"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("ord"),
        (col("c") * (length(col("gram")) - (col("ord") - lit(1))))
          .cast("double").as("num"))
    // dup n-grams: union of token-index spans of duplicated grams →
    // distinct covered positions → sum of those tokens' char lengths
    val tokLens = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), length(col("tok")).as("len"))
    val covered = grams.filter(col("ord") >= 5)
      .join(counts.filter(col("ord") >= 5 && col("c") > 1)
        .select("doc_id", "ord", "gram"), Seq("doc_id", "ord", "gram"))
      .select(col("doc_id"), col("ord"),
        explode(sequence(col("pos"), col("pos") + col("ord") - 1)).as("pos"))
      .distinct()
      .join(tokLens, Seq("doc_id", "pos"))
      .groupBy("doc_id", "ord").agg(sum("len").cast("double").as("num"))
    val aggCols = (topNs ++ dupNs).map(n =>
      max(when(col("ord") === n, col("num"))).as(s"num_$n"))
    val nums = top.unionByName(covered).groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
    def fracName(n: Int) =
      if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"))
      .join(nums, Seq("doc_id"), "left")
      .select(col("doc_id") +: (topNs ++ dupNs).map(n =>
        round(coalesce(col(s"num_$n"), lit(0.0)) /
          greatest(col("total_chars"), lit(1L)).cast("double"), 6)
          .as(fracName(n))): _*)
  }

  /** All stats in one pass over documents(doc_id, text, ...). */
  def documentStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      length(col("text")).as("n_chars"),
      round(punctRatio(col("text")), 6).as("punct_ratio"),
      round(stopwordFraction(col("text")), 6).as("stopword_fraction"),
      round(distinctWordRatio(col("text")), 6).as("distinct_word_ratio"),
      qualityScore(col("text")).as("quality_score"),
      langIdUdf(col("text")).getField("_1").as("lang_pred"),
      fingerprint(col("text")).as("fingerprint"))
}
