package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * N-Triples line parser (S8): `<s> <p> <o> .` lines → (subj, pred, obj),
 * brackets stripped, `#` comment lines skipped — semantics of the
 * reference's NTripleSource (/root/reference core/src/main/scala/org/
 * dbpedia/spotlight/io/NTripleSource.scala:12-48).
 *
 * Declarative regexp_extract so Catalyst keeps it in whole-stage codegen.
 */
object NTriples {

  private val LineRe = """^\s*<([^>]+)>\s+<([^>]+)>\s+<([^>]+)>\s*\.\s*$"""

  def parse(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.toDF("line")
      .filter(!$"line".startsWith("#") && length(trim($"line")) > 0)
      .select(
        regexp_extract($"line", LineRe, 1).as("subj"),
        regexp_extract($"line", LineRe, 2).as("pred"),
        regexp_extract($"line", LineRe, 3).as("obj"))
      .filter($"subj" =!= "")
  }

  /** Strip a namespace prefix from subj/obj, as the reference's closure
   *  loader does (WikipediaToDBpediaClosure.scala:33-52). */
  def stripNamespace(df: DataFrame, namespace: String): DataFrame =
    df.select(
      regexp_replace(col("subj"), java.util.regex.Pattern.quote(namespace), "").as("subj"),
      col("pred"),
      regexp_replace(col("obj"), java.util.regex.Pattern.quote(namespace), "").as("obj"))

  def fromStrings(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    parse(spark.createDataset(lines))
  }
}
