package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.disambig.Disambiguator
import graft.filter.AnnotationFilters
import graft.pipeline.Annotate
import graft.sources.{NTriples, SyntheticCorpus}
import graft.triples.Triples

/**
 * KG-pipeline stage queries over the deterministic synthetic corpus
 * (FIXTURES.md §1). UDF/driver-structure-driven stages — extraction,
 * spotting, scoring — are not ANSI-expressible, so these get the
 * driver's rows-only check; their value-level correctness is asserted by
 * the ScalaTest golden/e2e suites (ExtractSpec, EndToEndSpec).
 */
object PipelineQueries {

  private def m(s: SparkSession) = SparkEntry.model(s)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_extracted" -> ((s, _) => {
      graft.extract.Extractor.extracted(SyntheticCorpus.webPages(s, 120))
    }),
    "p_paragraphs" -> ((s, _) => m(s).paragraphs.toDF()),
    "p_occurrences" -> ((s, _) => m(s).occurrences.toDF().drop("para_text")),
    "p_redirect_closure" -> ((s, _) => m(s).closure),
    "p_surface_forms" -> ((s, _) => m(s).surfaceForms.toDF()),
    "p_resources" -> ((s, _) => m(s).resources.toDF()),
    "p_candidates" -> ((s, _) => m(s).candidates.toDF()),
    "p_token_types" -> ((s, _) => m(s).tokenTypes.toDF()),
    "p_entity_contexts" -> ((s, _) => m(s).entityContexts.toDF()),
    "p_spots" -> ((s, _) => {
      val mm = m(s)
      val bc = s.sparkContext.broadcast(graft.spot.Spotter.buildAutomaton(mm.surfaceForms))
      graft.spot.Spotter.gatedSpots(graft.spot.Spotter.spots(mm.paragraphs, bc), mm.surfaceForms)
    }),
    "p_scored" -> ((s, _) => Annotate.scored(s, m(s)).drop("types", "path")),
    "p_top1" -> ((s, _) => Disambiguator.best(Annotate.scored(s, m(s))).drop("types")),
    "p_annotations" -> ((s, _) => {
      import s.implicits._
      Annotate.annotations(s, m(s)).toDF().drop("types")
    }),
    "p_baseline_disambig" -> ((s, _) => {
      val mm = m(s)
      val bc = s.sparkContext.broadcast(graft.spot.Spotter.buildAutomaton(mm.surfaceForms))
      val gated = graft.spot.Spotter.gatedSpots(graft.spot.Spotter.spots(mm.paragraphs, bc), mm.surfaceForms)
      val sc = Disambiguator.spotCandidates(gated, mm.surfaceForms, mm.candidates)
      Disambiguator.baseline(sc, mm.resources).drop("types")
    }),
    "p_triples" -> ((s, _) => Annotate.triples(s, m(s)).toDF()),
    "p_ntriples_parse" -> ((s, _) =>
      NTriples.fromStrings(s, SyntheticCorpus.redirectsNt ++
        SyntheticCorpus.disambiguationsNt ++ SyntheticCorpus.instanceTypesNt)),
    "p_eval_gate" -> ((s, _) => {
      // single-row P/R + accuracy summary — the ≥0.95 gate, queryable
      val mm = m(s)
      val disambigs = NTriples.stripNamespace(
        NTriples.fromStrings(s, SyntheticCorpus.disambiguationsNt),
        "http://dbpedia.org/resource/")
      val gold = graft.modelbuild.ModelBuild.resolvedOccurrences(
        mm.occurrences.filter(col("provenance") === "Wikipedia"), mm.closure, disambigs)
      val scored = Annotate.scored(s, mm)
      val sm = graft.eval.Evaluator.spotting(gold,
        scored.select("url", "para_idx", "offset", "sf").distinct())
      val dm = graft.eval.Evaluator.disambiguation(gold, scored)
      import s.implicits._
      Seq((sm.recall, sm.precision, dm.accuracy, dm.mrr, dm.total))
        .toDF("spot_recall", "spot_precision", "disambig_accuracy", "mrr", "gold_spots")
    }))
}
