package graft.disambig

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * D5: the reference's score-mixture family as column expressions over
 * the feature columns produced by the scored dataflow
 * (P(s|e) = log candidate prior, P(c|e) = context score,
 * P(e) = log resource prior; /root/reference core/src/main/scala/org/
 * dbpedia/spotlight/disambiguate/mixtures/).
 *
 * Each mixture is one `withColumn` expression — swapping the similarity
 * definition never changes the dataflow shape (SURVEY.md §2.5 D5).
 */
object Mixtures {

  /** UnweightedMixture (default): sum of the log features
   *  (UnweightedMixture.scala:12-19). */
  def unweighted(pSgE: Column, ctx: Column, pE: Column): Column =
    pSgE + ctx + pE

  /** LinearRegressionFeatureMixture: weighted sum + offset
   *  (LinearRegressionFeatureMixture.scala:15-22). */
  def linearRegressionFeatures(pSgE: Column, ctx: Column, pE: Column,
                               wSgE: Double, wCtx: Double, wE: Double,
                               offset: Double): Column =
    pSgE * wSgE + ctx * wCtx + pE * wE + lit(offset)

  /** LinearRegressionMixture: the reference's hard-coded 2-feature fit
   *  `1234.3989·prior + 0.9968·ctx − 0.0275`
   *  (LinearRegressionMixture.scala:46-60; prior here is the raw
   *  normalized prior, not its log). */
  def linearRegression(prior: Column, ctx: Column): Column =
    prior * 1234.3989 + ctx * 0.9968 - 0.0275

  /** FaderMixture: prior-vs-context interpolation with weight w
   *  (FaderMixture: score = w·prior + (1−w)·ctxNorm). */
  def fader(prior: Column, ctxNorm: Column, w: Double): Column =
    prior * w + ctxNorm * (1 - w)

  /** OnlySimScoreMixture: context score alone
   *  (OnlySimScoreMixture.scala). */
  def onlySimScore(ctx: Column): Column = ctx
}
