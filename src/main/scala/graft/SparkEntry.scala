package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Annotate

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `entry` runs the flagship minimum slice (SURVEY.md §7.2): synthetic
 * corpus → model build → annotate → page-mentions-entity triples.
 *
 * `queries` exposes one DataFrame per implemented operator family; where
 * the operator is ANSI-expressible over the driver's parquet tables the
 * matching `oracleSql` entry lets DuckDB cross-check values; pipeline
 * stages over the synthetic corpus are deterministic but UDF-driven, so
 * they get the rows-only check.
 */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val m = Annotate.syntheticModel(spark, nDocs = 30, withTotalCounts = false)
    Annotate.triples(spark, m).toDF()
  }

  // Lazily built shared model per (session, size) so each query entry
  // doesn't rebuild the corpus model from scratch.
  @volatile private var cachedModel: Option[(SparkSession, graft.pipeline.Model)] = None
  private[graft] def model(spark: SparkSession): graft.pipeline.Model = synchronized {
    cachedModel match {
      case Some((s, m)) if s eq spark => m
      case _ =>
        val m = Annotate.syntheticModel(spark, nDocs = 120)
        cachedModel = Some((spark, m))
        m
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ RelationalQueries.queries ++ TextOpsQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TextOpsQueries.oracleSql
}
