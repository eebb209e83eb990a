package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.extract.Extractor
import graft.modelbuild.ModelBuild
import graft.disambig.Disambiguator
import graft.filter.AnnotationFilters
import graft.sources.{NTriples, SyntheticCorpus}
import graft.spot.Spotter
import graft.triples.Triples

/**
 * End-to-end facade: model build over a web_pages corpus, then the
 * flagship annotate path (§3.1 restatement in SURVEY.md) —
 * web_pages → extract → paragraphs → spots → candidates → scored →
 * annotations → filters → triples.
 *
 * Holds the intermediate model tables so tests, SparkEntry.queries,
 * Verify and Bench can expose any stage as a DataFrame.
 */
final case class Model(
    paragraphs: Dataset[ParagraphRow],
    occurrences: Dataset[OccurrenceRow],
    closure: DataFrame,
    surfaceForms: Dataset[SurfaceFormRow],
    resources: Dataset[ResourceRow],
    candidates: Dataset[CandidateRow],
    tokenTypes: Dataset[TokenTypeRow],
    entityContexts: Dataset[EntityContextRow],
    totals: ModelBuild.Totals)

object Annotate {

  /** Build all model tables from a corpus + graph dumps. Caches the dims
   *  (they are re-used by several downstream joins). */
  def buildModel(spark: SparkSession,
                 pages: Dataset[WebPage],
                 redirectsNt: Seq[String],
                 disambiguationsNt: Seq[String],
                 instanceTypesNt: Seq[String],
                 withTotalCounts: Boolean = true): Model = {
    import spark.implicits._
    val ns = "http://dbpedia.org/resource/"

    val redirects = NTriples.stripNamespace(NTriples.fromStrings(spark, redirectsNt), ns)
    val disambigs = NTriples.stripNamespace(NTriples.fromStrings(spark, disambiguationsNt), ns)
    val instanceTypes = NTriples.stripNamespace(NTriples.fromStrings(spark, instanceTypesNt), ns)
      .withColumn("obj", regexp_replace(
        regexp_replace(col("obj"), "http://dbpedia.org/ontology/", "DBpedia:"),
        "http://schema.org/", "Schema:"))

    // pages feeds both the text-extraction path and the link-occurrence
    // path; cache so the (expensive) markup parse isn't run twice
    pages.cache()
    val extracted = Extractor.extracted(pages)
    val paragraphs = Extractor.paragraphs(extracted).cache()
    val occurrences = Extractor.occurrences(pages).cache()
    // Materialize both parsed dependents, then drop the raw-HTML cache:
    // repeated model builds in one long-lived session must not accumulate
    // cached page bytes (they are never read again past this point).
    paragraphs.count(); occurrences.count()
    pages.unpersist()

    val closure = ModelBuild.redirectClosure(redirects).cache()
    val resolved = ModelBuild.resolvedOccurrences(occurrences, closure, disambigs).cache()

    // first pass without raw totals (needed to build the full dictionary)
    val sfsAnnotatedOnly = ModelBuild.surfaceForms(occurrences, None)
    val sfs = (if (withTotalCounts) {
      val fullDict = Spotter.buildAutomaton(sfsAnnotatedOnly, minAnnotationProbability = 0.0)
      val bc = spark.sparkContext.broadcast(fullDict)
      val tc = Spotter.totalCounts(paragraphs, bc)
      // A7: longest-annotation correction — annotated occurrences of a
      // longer sf also raw-matched its sub-ngrams; remove that inflation
      // so annotationProbability isn't deflated for nested forms
      // (reference: MemoryStoreIndexer.scala:69-109). The pre-correction
      // table is cached: the correction self-joins it, and without the
      // cache each side would re-run the whole totalCounts spotting chain.
      val sfsWithTotals = ModelBuild.surfaceForms(occurrences, Some(tc)).cache()
      val corrected = ModelBuild.ngramTotalCorrection(sfsWithTotals).cache()
      // materialize the corrected table, then drop the intermediate:
      // repeated model builds in one long-lived session must not
      // accumulate cached pre-correction sf tables
      corrected.count()
      sfsWithTotals.unpersist()
      corrected
    } else sfsAnnotatedOnly.cache())

    val resources = ModelBuild.resources(resolved, instanceTypes).cache()
    val candidates = ModelBuild.candidates(resolved, sfs, resources).cache()
    val tokenTypes = ModelBuild.tokenTypes(paragraphs, sfs).cache()
    val entityContexts = ModelBuild.entityContexts(resolved, resources, tokenTypes).cache()
    val totals = ModelBuild.totals(sfs, resources, tokenTypes)

    Model(paragraphs, occurrences, closure, sfs, resources, candidates,
      tokenTypes, entityContexts, totals)
  }

  /** The annotate path over the model's own paragraphs (or any other
   *  paragraph set): spots → candidates → scored. */
  def scored(spark: SparkSession, m: Model,
             cfg: Disambiguator.Config = Disambiguator.Config()): DataFrame = {
    val bc = spark.sparkContext.broadcast(Spotter.buildAutomaton(m.surfaceForms))
    val raw = Spotter.spots(m.paragraphs, bc)
    scoredFromGated(spark, m, Spotter.gatedSpots(raw, m.surfaceForms), cfg)
  }

  /**
   * D1 MAX_CONTEXT (= 250, DBTwoStepDisambiguator.scala:71): the
   * reference slices a paragraph whose token stream exceeds the cap
   * into ~250-token windows and disambiguates each occurrence against
   * its own window's tokens (bestK:89-117). The Spark-native
   * equivalent: RE-PARAGRAPH oversized texts into token windows before
   * scoring — every downstream stage is keyed per (url, para_idx), so
   * window-local scoring falls out with no change to the dataflow.
   * Paragraphs at or under the cap pass through untouched (which covers
   * every bundled corpus — behavior change applies only to oversized
   * crawl text, where it bounds the context join: without the cap a
   * megabyte-long spam paragraph multiplies its full token histogram
   * into EVERY candidate of every spot it contains).
   *
   * Window para_idx = original·1000 + window (1-based); window texts
   * are contiguous substrings whose concatenation is the original, so
   * offsets stay window-relative and anchored.
   */
  def windowParagraphs(paragraphs: Dataset[ParagraphRow],
                       maxTokens: Int = 250): Dataset[ParagraphRow] = {
    val spark = paragraphs.sparkSession
    import spark.implicits._
    paragraphs.flatMap { p =>
      val toks = graft.util.TextUtil.tokenize(p.para_text)
      if (toks.length <= maxTokens) Iterator.single(p)
      else {
        val starts = toks.grouped(maxTokens).map(_.head.offset).toArray
        starts(0) = 0
        val ends = starts.drop(1) :+ p.para_text.length
        starts.indices.iterator.map { w =>
          ParagraphRow(p.url, p.para_idx * 1000 + w + 1,
            p.para_text.substring(starts(w), ends(w)))
        }
      }
    }
  }

  /** The served-request path: annotate an ARBITRARY paragraph set against
   *  a built model (the reference's SpotlightInterface.annotate on posted
   *  text, rest/.../SpotlightInterface.java:120-160 — spot, gate,
   *  candidates, score — but batched over a Dataset instead of one
   *  request at a time). Used by the gold-corpus eval path. */
  def scoredOn(spark: SparkSession, m: Model, paragraphs: Dataset[ParagraphRow],
               cfg: Disambiguator.Config = Disambiguator.Config(),
               automaton: Option[org.apache.spark.broadcast.Broadcast[graft.spot.AhoCorasick]] = None,
               maxContextTokens: Int = 250)
      : DataFrame = {
    // callers annotating repeatedly (streaming micro-batches) pass the
    // prebuilt broadcast so the driver-side automaton build runs once
    val bc = automaton.getOrElse(
      spark.sparkContext.broadcast(Spotter.buildAutomaton(m.surfaceForms)))
    val windowed = windowParagraphs(paragraphs, maxContextTokens)
    val gated = Spotter.gatedSpots(Spotter.spots(windowed, bc), m.surfaceForms)
    val spotCands = Disambiguator.spotCandidates(gated, m.surfaceForms, m.candidates, cfg)
    val docTokens = Disambiguator.docTokenHistogram(windowed, m.tokenTypes)
    Disambiguator.scored(spotCands, docTokens, m.entityContexts, m.resources, m.totals, cfg)
  }

  /** Same, from an already-computed (possibly cached) gated-spots table —
   *  avoids rebuilding/broadcasting the automaton and re-running the
   *  spot stage when the caller holds it. */
  def scoredFromGated(spark: SparkSession, m: Model, gated: DataFrame,
                      cfg: Disambiguator.Config = Disambiguator.Config()): DataFrame = {
    val spotCands = Disambiguator.spotCandidates(gated, m.surfaceForms, m.candidates, cfg)
    val docTokens = Disambiguator.docTokenHistogram(m.paragraphs, m.tokenTypes)
    Disambiguator.scored(spotCands, docTokens, m.entityContexts, m.resources, m.totals, cfg)
  }

  /** Filtered best-per-spot annotations from an already-computed scored
   *  DataFrame (callers holding a cached `scored` avoid re-running the
   *  join DAG). */
  def annotationsFrom(spark: SparkSession, scoredDf: DataFrame,
                      conf: Double = 0.1, minSupport: Long = 10,
                      simThresholds: Seq[Double] = Nil): Dataset[AnnotationRow] = {
    import spark.implicits._
    val best = Disambiguator.best(scoredDf).as[AnnotationRow]
    AnnotationFilters.standardChain(best, conf, minSupport, simThresholds)
  }

  /** Filtered best-per-spot annotations (server defaults). */
  def annotations(spark: SparkSession, m: Model,
                  conf: Double = 0.1, minSupport: Long = 10): Dataset[AnnotationRow] =
    annotationsFrom(spark, scored(spark, m), conf, minSupport)

  /** Full output graph. */
  def triples(spark: SparkSession, m: Model): Dataset[TripleRow] =
    Triples.all(annotations(spark, m), m.resources, m.closure)

  /** Full output graph from a cached scored DataFrame. */
  def triplesFrom(spark: SparkSession, m: Model, scoredDf: DataFrame): Dataset[TripleRow] =
    Triples.all(annotationsFrom(spark, scoredDf), m.resources, m.closure)

  /** Convenience: model over the synthetic corpus at a given size. */
  def syntheticModel(spark: SparkSession, nDocs: Long, withTotalCounts: Boolean = true): Model =
    buildModel(spark,
      SyntheticCorpus.webPages(spark, nDocs),
      SyntheticCorpus.redirectsNt,
      SyntheticCorpus.disambiguationsNt,
      SyntheticCorpus.instanceTypesNt,
      withTotalCounts)
}
