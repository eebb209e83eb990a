package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S16: annotation output formats. The reference's REST OutputManager
 * emits XML/JSON with the attribute set (URI, support, types,
 * surfaceForm, offset, similarityScore, percentageOfSecondRank)
 * (/root/reference rest/src/main/java/org/dbpedia/spotlight/web/rest/
 * OutputManager.java:125-133); here the same record set is produced as
 * columnar JSON/TSV — declarative `to_json(struct(...))`, codegen'd, so
 * serialization stays a narrow map stage writable straight to
 * json/text sinks.
 */
object Serializers {

  /** Spotlight-JSON-shaped record per annotation (one line per mention):
   *  `{"@URI":..., "@support":..., "@types":"A,B", "@surfaceForm":...,
   *    "@offset":..., "@similarityScore":..., "@percentageOfSecondRank":...}` */
  def toSpotlightJson(annotations: DataFrame): DataFrame =
    annotations.select(
      col("url"),
      to_json(struct(
        col("uri").as("@URI"),
        col("support").as("@support"),
        concat_ws(",", col("types")).as("@types"),
        col("sf").as("@surfaceForm"),
        col("offset").as("@offset"),
        col("similarity_score").as("@similarityScore"),
        col("percentage_of_second_rank").as("@percentageOfSecondRank")
      )).as("json"))

  /** The reference's occurrence-TSV line per annotation (S7 format). */
  def toTsvLines(annotations: DataFrame): DataFrame =
    annotations.select(
      col("url"),
      concat_ws("\t",
        concat(col("url"), lit("-p"), col("para_idx"), lit("o"), col("offset")),
        col("uri"), col("sf"), lit(""), col("offset").cast("string")).as("line"))

  /** Predicate shorthands → absolute IRIs (N-Triples requires IRIs; a
   *  bare `<mentions>` would be rejected by conformant RDF parsers). */
  private val predIri: Map[String, String] = Map(
    Triples.MentionsPred -> "http://purl.org/dc/terms/references",
    Triples.TypePred -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    Triples.RedirectPred -> "http://dbpedia.org/ontology/wikiPageRedirects",
    Triples.SameAsPred -> "http://www.w3.org/2002/07/owl#sameAs")

  /** Type-ID prefixes → ontology namespaces (types are classes, not
   *  resources — wrapping them in /resource/ would be wrong). */
  private def iri(c: org.apache.spark.sql.Column,
                  resourceNs: String): org.apache.spark.sql.Column =
    when(c.startsWith("http"), c)
      .when(c.startsWith("DBpedia:"),
        concat(lit("http://dbpedia.org/ontology/"), regexp_replace(c, "^DBpedia:", "")))
      .when(c.startsWith("Schema:"),
        concat(lit("http://schema.org/"), regexp_replace(c, "^Schema:", "")))
      .otherwise(concat(lit(resourceNs), c))

  /** N-Triples lines for the output graph tables: predicates mapped to
   *  absolute IRIs, subjects/objects wrapped in the DBpedia resource
   *  namespace unless already IRIs or ontology-class IDs. */
  def toNTriples(triples: DataFrame,
                 ns: String = "http://dbpedia.org/resource/"): DataFrame = {
    val predCol = predIri.foldLeft(col("pred")) { case (acc, (k, v)) =>
      when(col("pred") === k, lit(v)).otherwise(acc)
    }
    triples.select(concat(
      lit("<"), iri(col("subj"), ns),
      lit("> <"), when(predCol.startsWith("http"), predCol).otherwise(concat(lit(ns), predCol)),
      lit("> <"), iri(col("obj"), ns),
      lit("> .")).as("line"))
  }
}
