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

  /** N-Triples lines for the output graph tables (subj/pred/obj wrapped
   *  in the DBpedia namespaces). */
  def toNTriples(triples: DataFrame,
                 ns: String = "http://dbpedia.org/resource/"): DataFrame =
    triples.select(concat(
      lit("<"),
      when(col("subj").startsWith("http"), col("subj")).otherwise(concat(lit(ns), col("subj"))),
      lit("> <"), col("pred"), lit("> <"),
      when(col("obj").startsWith("http"), col("obj")).otherwise(concat(lit(ns), col("obj"))),
      lit("> .")).as("line"))
}
