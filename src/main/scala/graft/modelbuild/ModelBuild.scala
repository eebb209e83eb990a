package graft.modelbuild

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model._
import graft.util.TextUtil

/**
 * Model-build aggregations (SURVEY.md §2.7, A1-A10): the offline count
 * stores of the reference — surface forms, resources, candidate map,
 * token dictionary, entity contexts — expressed as groupBy/agg dataflows
 * with deterministic dense IDs and explicit skew handling.
 *
 * Scale design:
 *  - every aggregation is a map-side-combinable sum (partial agg free);
 *    the head-surface-form skew case additionally goes through
 *    [[saltedSum]] (two-phase salt → final) per the north rule;
 *  - dense IDs come from `row_number() over (order by name)` — stable
 *    across runs and parallelism (SURVEY.md §7.4(6)), never
 *    monotonically_increasing_id;
 *  - model tables are written sorted/bucketed by their join key
 *    downstream (Pipeline) so annotate-time joins avoid re-shuffles.
 */
object ModelBuild {

  val sfNormalizeUdf = udf((sf: String) => TextUtil.sfNormalize(sf))

  /**
   * Deterministic dense 1-based IDs by global order of `orderCol`,
   * WITHOUT a single-partition global window (which would funnel the
   * whole dictionary through one task at 100 TB): range-partition by the
   * key, rank within each sorted partition, then add cumulative partition
   * offsets (a tiny broadcast — one row per partition). IDs depend only
   * on the global key order, not on where range boundaries fall, so any
   * parallelism yields identical IDs (SURVEY.md §7.4(6)). Keys must be
   * distinct (callers pass post-groupBy dimension tables).
   */
  def denseIds(df: DataFrame, orderCol: String, idName: String): DataFrame = {
    val n = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val withRn = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_pid").orderBy(orderCol)).cast("long"))
      .persist() // pin partition boundaries: offsets below must see the same layout
    val offsets = withRn.groupBy("_pid").agg(max("_rn").as("_cnt"))
      .withColumn("_off", coalesce(
        sum("_cnt").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    val cut = withRn.join(broadcast(offsets), Seq("_pid"))
      .withColumn(idName, (col("_off") + col("_rn")).cast("int"))
      .drop("_pid", "_rn", "_off")
    // Materialize + truncate lineage so the pinned intermediate can be
    // freed immediately (otherwise each denseIds call leaks one cached
    // copy of the dimension table for the session's lifetime). When the
    // caller configured a reliable checkpoint dir (Runner points it at
    // the stage root it owns), cut there — executor-local blocks
    // (localCheckpoint) disappear with a lost executor, which at
    // 100×-dictionary deployment scale means recomputing the dimension
    // mid-job; the local variant remains the single-JVM fallback
    // (VERDICT r3 item 8).
    val out =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) cut.checkpoint(true)
      else cut.localCheckpoint(true)
    withRn.unpersist()
    out
  }

  /** Two-phase salted aggregation: pre-aggregate on (keys, salt) then
   *  final on keys. Breaks reducer hot keys ("USA") into `buckets`
   *  sub-keys; deterministic salt from a caller-provided column. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                saltFrom: Column, buckets: Int = 64): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(value).as("_partial"))
    partial.groupBy(keys.map(col): _*).agg(sum("_partial").as("cnt"))
  }

  // ---- A8: redirect transitive closure --------------------------------

  /**
   * Iterative self-join to fixpoint with cycle guard — semantics of the
   * reference's getEndOfChainURI (/root/reference index/.../db/
   * WikipediaToDBpediaClosure.scala:106-116): follow the chain until no
   * next hop or the next hop was already visited (cycles stop at the
   * last new node). Chains are short (≤ ~8 hops), so the driver loop
   * runs a handful of tiny broadcast joins.
   */
  def redirectClosure(redirects: DataFrame): DataFrame = {
    val edges = redirects.select(col("subj").as("e_from"), col("obj").as("e_to"))
      .dropDuplicates("e_from")
      .cache()
    var cur = edges.select(
      col("e_from").as("from"), col("e_to").as("to"),
      array(col("e_from"), col("e_to")).as("path"))
    var prev: DataFrame = null
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 16) {
      val stepped = cur.join(broadcast(edges), cur("to") === edges("e_from"), "left")
        .withColumn("next",
          when(col("e_to").isNull || array_contains(col("path"), col("e_to")), lit(null))
            .otherwise(col("e_to")))
        .select(
          col("from"),
          coalesce(col("next"), col("to")).as("to"),
          when(col("next").isNull, col("path"))
            .otherwise(array_union(col("path"), array(col("next")))).as("path"),
          col("next").isNotNull.as("moved"))
        .cache()
      changed = stepped.filter(col("moved")).count()
      // the new iterate is materialized: drop the previous one so repeated
      // model builds in a long session don't accumulate ≤16 cached frames
      if (prev != null) prev.unpersist()
      prev = stepped
      cur = stepped.drop("moved")
      iter += 1
    }
    // Truncate lineage (the final plan nests `iter` joins) and free the
    // last iterate + the edges dim — callers cache the returned closure.
    val out = cur.select(col("from"), col("to")).localCheckpoint(true)
    if (prev != null) prev.unpersist()
    edges.unpersist()
    out
  }

  /** Map a URI column through the redirect closure (left join + coalesce;
   *  closure is a small dim → broadcast). */
  def resolveRedirects(df: DataFrame, uriCol: String, closure: DataFrame): DataFrame =
    df.join(broadcast(closure.withColumnRenamed("from", "_rc_from")
        .withColumnRenamed("to", "_rc_to")),
        df(uriCol) === col("_rc_from"), "left")
      .withColumn(uriCol, coalesce(col("_rc_to"), col(uriCol)))
      .drop("_rc_from", "_rc_to")

  /** Resolve redirects and drop occurrences of disambiguation-page URIs
   *  (reference: WikipediaToDBpediaClosure.wikipediaToDBpediaURI throws on
   *  disambiguation resources, :100-104; CandidateMapSource drops them). */
  def resolvedOccurrences(occs: Dataset[OccurrenceRow], closure: DataFrame,
                          disambigUris: DataFrame): DataFrame =
    resolveRedirects(occs.toDF(), "uri", closure)
      .join(broadcast(disambigUris.select(col("subj").as("_dis_uri"))),
        col("uri") === col("_dis_uri"), "left_anti")

  // ---- A1: surface forms ----------------------------------------------

  /**
   * sfAndTotalCounts: per surface form, the weighted count of
   * link-anchored (annotated) occurrences plus the raw string total count
   * (−1 = unknown, which the reference maps to annotationProbability 1.0,
   * model/SurfaceForm.scala:51-61). Head-sf skew → salted two-phase agg.
   */
  def surfaceForms(occs: Dataset[OccurrenceRow],
                   totalCounts: Option[DataFrame]): Dataset[SurfaceFormRow] = {
    val spark = occs.sparkSession
    import spark.implicits._
    val annotated = saltedSum(occs.toDF(), Seq("sf"), col("weight"), col("url"))
      .withColumnRenamed("cnt", "annotated_count")
    val withTotals = totalCounts match {
      case Some(tc) => annotated
        .join(tc.select(col("sf"), col("total_count")), Seq("sf"), "left")
        .withColumn("total_count", coalesce(col("total_count"), lit(-1L)))
      case None => annotated.withColumn("total_count", lit(-1L))
    }
    denseIds(withTotals, "sf", "sf_id")
      .withColumn("sf_normalized", sfNormalizeUdf(col("sf")))
      .select("sf_id", "sf", "sf_normalized", "annotated_count", "total_count")
      .as[SurfaceFormRow]
  }

  // ---- A2 (+S10): resources --------------------------------------------

  /** uriCounts after redirect resolution, + types from instance_types. */
  def resources(resolvedOccs: DataFrame, instanceTypes: DataFrame): Dataset[ResourceRow] = {
    val spark = resolvedOccs.sparkSession
    import spark.implicits._
    val support = saltedSum(resolvedOccs, Seq("uri"), col("weight"), col("url"))
      .withColumnRenamed("cnt", "support")
    val types = instanceTypes
      .groupBy(col("subj").as("uri"))
      .agg(sort_array(collect_set(col("obj"))).as("types"))
    denseIds(
      support
        .join(broadcast(types), Seq("uri"), "left")
        .withColumn("types", coalesce(col("types"), array().cast("array<string>"))),
      "uri", "res_id")
      .select("res_id", "uri", "support", "types")
      .as[ResourceRow]
  }

  // ---- A3: candidate map -----------------------------------------------

  /** pairCounts keyed by (sf_id, res_id) — the salted/bucketed sf→URI map. */
  def candidates(resolvedOccs: DataFrame,
                 sfs: Dataset[SurfaceFormRow],
                 res: Dataset[ResourceRow]): Dataset[CandidateRow] = {
    val spark = resolvedOccs.sparkSession
    import spark.implicits._
    saltedSum(resolvedOccs, Seq("sf", "uri"), col("weight"), col("url"))
      .join(broadcast(sfs.select("sf_id", "sf")), Seq("sf"))
      .join(broadcast(res.select(col("res_id"), col("uri"))), Seq("uri"))
      .select(col("sf_id"), col("res_id"), col("cnt").as("cooc_count"))
      .as[CandidateRow]
  }

  // ---- A5 (+S13): token dictionary --------------------------------------

  /** The raw content-token stream the dictionary counts: paragraph text
   *  tokens plus one token stream per surface form (reference:
   *  TokenSource.scala:35-70). Shared by [[tokenTypes]] and the
   *  `p_token_stream` sidecar emission so the DuckDB oracle re-derives
   *  the dictionary from EXACTLY the stream it was built on. */
  def tokenStream(paragraphs: Dataset[ParagraphRow],
                  sfs: Dataset[SurfaceFormRow],
                  stem: TextUtil.Stemmer = TextUtil.IdentityStemmer): DataFrame = {
    val spark = paragraphs.sparkSession
    import spark.implicits._
    paragraphs.flatMap(p => TextUtil.contentTokens(p.para_text, stem)).toDF("token")
      .union(sfs.flatMap(r => TextUtil.contentTokens(r.sf, stem)).toDF("token"))
  }

  /** Global token counts over all paragraph text, plus +1 per token of
   *  each surface form (reference: TokenSource.scala:35-70). */
  def tokenTypes(paragraphs: Dataset[ParagraphRow],
                 sfs: Dataset[SurfaceFormRow],
                 stem: TextUtil.Stemmer = TextUtil.IdentityStemmer): Dataset[TokenTypeRow] = {
    val spark = paragraphs.sparkSession
    import spark.implicits._
    denseIds(
      tokenStream(paragraphs, sfs, stem)
        .groupBy("token").agg(count(lit(1)).as("count")),
      "token", "token_id")
      .select("token_id", "token", "count")
      .as[TokenTypeRow]
  }

  // ---- D12: context narrowing -------------------------------------------

  /** Crop context to ≤ maxWords whitespace words around the offset
   *  (reference: string/ContextExtractor.scala:28-107, applied at
   *  model-build time via ContextNarrowFilter). */
  def narrowContext(text: String, offset: Int, maxWords: Int): String = {
    if (text.isEmpty) return text
    val words = text.split(" ")
    if (words.length <= maxWords) return text
    // locate the word index containing the offset
    var acc = 0
    var wIdx = 0
    var i = 0
    while (i < words.length && acc <= offset) { wIdx = i; acc += words(i).length + 1; i += 1 }
    val half = maxWords / 2
    val lo = math.max(0, wIdx - half)
    val hi = math.min(words.length, lo + maxWords)
    words.slice(math.max(0, hi - maxWords), hi).mkString(" ")
  }

  // ---- A4: entity contexts (the inverted index) --------------------------

  /**
   * tokenCounts per (resource, token): tokenize each occurrence's
   * (narrowed) context, explode, dictionary-encode, sum. This DataFrame
   * IS the token→entity posting list that replaces the reference's
   * Lucene CONTEXT index (north star; MemoryContextStore.scala:20-57).
   */
  def entityContexts(resolvedOccs: DataFrame,
                     res: Dataset[ResourceRow],
                     tokens: Dataset[TokenTypeRow],
                     maxContextWords: Int = 200,
                     stem: TextUtil.Stemmer = TextUtil.IdentityStemmer): Dataset[EntityContextRow] = {
    val spark = resolvedOccs.sparkSession
    import spark.implicits._
    val tokenized = resolvedOccs
      .select(col("uri"), col("para_text"), col("offset"), col("weight"))
      .as[(String, String, Int, Int)]
      .flatMap { case (uri, text, offset, weight) =>
        TextUtil.contentTokens(narrowContext(text, offset, maxContextWords), stem)
          .map(t => (uri, t, weight.toLong))
      }
      .toDF("uri", "token", "w")
    tokenized
      .groupBy("uri", "token").agg(sum("w").as("count"))
      .join(broadcast(res.select("res_id", "uri")), Seq("uri"))
      .join(broadcast(tokens.select("token_id", "token")), Seq("token"))
      .select("res_id", "token_id", "count")
      .as[EntityContextRow]
  }

  // ---- A7: ngram total-count correction ----------------------------------

  /**
   * Longest-annotation assumption (reference: MemoryStoreIndexer.scala:
   * 69-109): when a surface form is a contiguous sub-ngram of a longer
   * annotated surface form, the longer form's annotated occurrences were
   * also counted as raw-string matches of the sub-ngram; subtract them
   * from the sub-ngram's total_count so its annotationProbability is not
   * deflated. total_count is clamped at annotated_count (a form seen
   * annotated k times was seen at least k times). Self-join via an
   * exploded sub-ngram table — distributed, no driver loop.
   */
  def ngramTotalCorrection(sfs: Dataset[SurfaceFormRow]): Dataset[SurfaceFormRow] = {
    val spark = sfs.sparkSession
    import spark.implicits._
    val subNgrams = sfs.flatMap { r =>
      val toks = r.sf.split(" ")
      if (toks.length <= 1) Iterator.empty
      else (for {
        len <- (1 until toks.length).iterator
        start <- (0 to toks.length - len).iterator
      } yield (toks.slice(start, start + len).mkString(" "), r.annotated_count)).iterator
    }.toDF("sf", "containing_annotated")
    val corrections = subNgrams.groupBy("sf")
      .agg(sum("containing_annotated").as("_corr"))
    sfs.toDF()
      .join(corrections, Seq("sf"), "left")
      .withColumn("total_count",
        when(col("total_count") > 0L,
          greatest(col("total_count") - coalesce(col("_corr"), lit(0L)),
            col("annotated_count")))
          .otherwise(col("total_count")))
      .drop("_corr")
      .select("sf_id", "sf", "sf_normalized", "annotated_count", "total_count")
      .as[SurfaceFormRow]
  }

  // ---- R6: deterministic train/test split ---------------------------------

  /** Occurrence dedup / corpus split (reference: index/.../lucene/index/
   *  SplitTrainTest.scala, io/DatasetSplitter.java) — hash-based so the
   *  assignment is stable across runs and parallelism, unlike randomSplit.
   *  The bucket hash is md5-derived (first 60 bits) rather than xxhash64:
   *  equally uniform, but reproducible by any ANSI engine
   *  (`('0x'||substring(md5(id),1,15))::BIGINT % buckets` in DuckDB), so
   *  the split itself is oracle-checkable. */
  def hashSplit(df: DataFrame, idCol: String, testFraction: Double,
                buckets: Int = 1000): (DataFrame, DataFrame) = {
    val b = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
    val cut = (testFraction * buckets).toLong
    (df.filter(b >= cut), df.filter(b < cut))
  }

  // ---- A9/A10: concept URIs and title surface forms ----------------------

  /** Concept URIs = all target URIs minus redirects and disambiguations,
   *  with URI sanity rules (reference: ExtractCandidateMap.scala:62-118). */
  def conceptUris(allUris: DataFrame, redirects: DataFrame, disambigs: DataFrame): DataFrame =
    allUris.select(col("uri"))
      .join(broadcast(redirects.select(col("subj").as("uri"))), Seq("uri"), "left_anti")
      .join(broadcast(disambigs.select(col("subj").as("uri"))), Seq("uri"), "left_anti")
      .filter(!col("uri").contains("/") && !col("uri").contains("%23") &&
        col("uri").rlike("[A-Za-z]"))

  /** A10: surface forms derived from page titles / redirects / disambig
   *  titles: wiki-decode the URI, strip the trailing parenthetical;
   *  sanity rules length ≤ 50, has a letter, not percent-escape junk,
   *  not a bare stopword (reference: ExtractCandidateMap.scala:172-243). */
  def titleSurfaceForms(uris: DataFrame): DataFrame = {
    val decodeUdf = udf((uri: String) =>
      TextUtil.wikiDecode(uri).replaceAll(""" \(.+?\)$""", ""))
    uris
      .filter(!col("uri").rlike("%[0-9A-Fa-f]{2}")) // escape-sequence titles skipped
      .select(col("uri"), decodeUdf(col("uri")).as("sf"))
      .filter(length(col("sf")) <= 50 &&
        col("sf").rlike("[A-Za-z]") &&
        !lower(col("sf")).isin(TextUtil.SfStopWords.toSeq: _*))
      .distinct()
  }

  /** Model totals broadcast into scoring expressions (A6). */
  final case class Totals(
      totalAnnotated: Long,
      totalOccurrence: Long,
      totalSupport: Long,
      totalTokenCount: Long,
      vocabularySize: Long)

  def totals(sfs: Dataset[SurfaceFormRow], res: Dataset[ResourceRow],
             tokens: Dataset[TokenTypeRow]): Totals = {
    val sfAgg = sfs.agg(sum("annotated_count"), sum(when(col("total_count") > 0, col("total_count")).otherwise(0L))).head()
    val supAgg = res.agg(sum("support")).head()
    val tokAgg = tokens.agg(sum("count"), count(lit(1))).head()
    Totals(sfAgg.getLong(0), sfAgg.getLong(1), supAgg.getLong(0), tokAgg.getLong(0), tokAgg.getLong(1))
  }
}
