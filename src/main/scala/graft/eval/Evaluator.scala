package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Spotting P/R and disambiguation accuracy/MRR over gold vs predicted
 * annotation DataFrames — the EvalSpotter / EvaluateParagraphDisambiguator
 * contingency arithmetic (eval/.../EvalSpotter.scala:113-135;
 * EvaluateParagraphDisambiguator.scala:44-114) as joins + aggregates.
 */
object Evaluator {

  final case class SpottingMetrics(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** One-pass contingency table: a single full-outer join + conditional
   *  aggregates instead of three separate semi/anti count jobs — at scale
   *  that is one shuffle of each side rather than three. */
  private def contingency(gold: DataFrame, predicted: DataFrame,
                          keys: Seq[String]): SpottingMetrics = {
    val g = gold.select(keys.map(col): _*).distinct().withColumn("_g", lit(1))
    val p = predicted.select(keys.map(col): _*).distinct().withColumn("_p", lit(1))
    val row = g.join(p, keys, "full_outer").agg(
      sum(when(col("_g").isNotNull && col("_p").isNotNull, 1L).otherwise(0L)).as("tp"),
      sum(when(col("_g").isNull, 1L).otherwise(0L)).as("fp"),
      sum(when(col("_p").isNull, 1L).otherwise(0L)).as("fn")).head()
    def l(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    SpottingMetrics(l(0), l(1), l(2))
  }

  /** Spot-level set equality on (url, para_idx, offset, sf) — the
   *  SurfaceFormOccurrence.equals key (model/SurfaceFormOccurrence.scala:36-52). */
  def spotting(gold: DataFrame, predicted: DataFrame): SpottingMetrics =
    contingency(gold, predicted, Seq("url", "para_idx", "offset", "sf"))

  final case class DisambigMetrics(total: Long, correct: Long, notFound: Long, mrr: Double) {
    def accuracy: Double = if (total == 0) 0.0 else correct.toDouble / total
  }

  /** Disambiguation vs gold: rank of the gold URI in the per-spot
   *  prediction list (DisambiguationResult.rank, eval/.../model/
   *  DisambiguationResult.scala:8-33); accuracy = rank 1, MRR over found. */
  def disambiguation(gold: DataFrame, scoredPredictions: DataFrame): DisambigMetrics = {
    val keys = Seq("url", "para_idx", "offset")
    val g = gold.select((keys.map(col) :+ col("uri").as("gold_uri")): _*).distinct()
    val joined = g.join(
      scoredPredictions.select((keys.map(col) :+ col("uri") :+ col("rank")): _*),
      keys, "left")
    val perSpot = joined
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("uri") === col("gold_uri"), col("rank"))).as("gold_rank"))
    val agg = perSpot.agg(
      count(lit(1)).as("total"),
      sum(when(col("gold_rank") === 1, 1L).otherwise(0L)).as("correct"),
      sum(when(col("gold_rank").isNull, 1L).otherwise(0L)).as("notFound"),
      sum(when(col("gold_rank").isNotNull, lit(1.0) / col("gold_rank")).otherwise(0.0)).as("rr")
    ).head()
    val total = agg.getLong(0)
    DisambigMetrics(total, agg.getLong(1), agg.getLong(2),
      if (total == 0) 0.0 else agg.getDouble(3) / total)
  }

  /** End-to-end annotation P/R: match on (url, para_idx, offset, uri). */
  def annotation(gold: DataFrame, predicted: DataFrame): SpottingMetrics =
    contingency(gold, predicted, Seq("url", "para_idx", "offset", "uri"))
}
