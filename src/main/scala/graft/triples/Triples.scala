package graft.triples

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{AnnotationRow, ResourceRow, TripleRow}

/**
 * Canonical (subj, pred, obj) graph emitters (SURVEY.md §1.3): the
 * final KG tables materialized as partitioned parquet.
 */
object Triples {

  val MentionsPred = "mentions"
  val TypePred = "rdf:type"
  val RedirectPred = "redirectsTo"
  val SameAsPred = "sameAs"

  /** page-mentions-entity edges with score qualifier. */
  def mentions(annotations: Dataset[AnnotationRow]): Dataset[TripleRow] = {
    val spark = annotations.sparkSession
    import spark.implicits._
    annotations.map(a =>
      TripleRow(a.url, MentionsPred, a.uri, a.url, a.similarity_score))
  }

  /** entity-type edges from the resource store's types array. */
  def entityTypes(res: Dataset[ResourceRow]): Dataset[TripleRow] = {
    val spark = res.sparkSession
    import spark.implicits._
    res.flatMap(r => r.types.map(t => TripleRow(r.uri, TypePred, t, "", 1.0)))
  }

  /** redirectsTo edges straight from the transitive closure, and sameAs
   *  edges for each (from, endOfChain) pair — the closure output of
   *  ExtractCandidateMap.saveRedirectsTransitiveClosure
   *  (index/.../util/ExtractCandidateMap.scala:122-161). */
  def redirects(closure: DataFrame): Dataset[TripleRow] = {
    val spark = closure.sparkSession
    import spark.implicits._
    closure.select(col("from"), col("to")).as[(String, String)]
      .flatMap { case (f, t) =>
        Seq(TripleRow(f, RedirectPred, t, "", 1.0), TripleRow(f, SameAsPred, t, "", 1.0))
      }
  }

  def all(annotations: Dataset[AnnotationRow], res: Dataset[ResourceRow],
          closure: DataFrame): Dataset[TripleRow] =
    mentions(annotations)
      .unionByName(entityTypes(res))
      .unionByName(redirects(closure))
}
