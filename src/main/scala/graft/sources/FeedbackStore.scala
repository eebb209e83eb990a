package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.OccurrenceRow

/**
 * The reference's user-feedback store — the last named reference
 * behavior without a Spark counterpart (VERDICT r4 item 4):
 * `CSVFeedbackStore.add` appends one TSV line per feedback event
 *   `doc_url \t feedback \t uri \t surface_form \t text \t offset \t systems`
 * (/root/reference core/src/main/scala/org/dbpedia/spotlight/io/
 * FeedbackStore.scala:12-22), and the REST surface substitutes
 * `http://spotlight.dbpedia.org/id/<text.hashCode>` when the caller
 * sends no usable doc_url (rest/.../resources/Feedback.java:82-86).
 *
 * Spark-first re-expression: the store is an append-only table —
 * parquet `mode("append")` (each feedback batch lands as new files, no
 * rewrite, exactly the semantics of appending lines to a CSV but
 * partition-parallel), with the reference's TSV as the interchange
 * format and a union path back into the S7 occurrence stream: rows
 * judged `correct` become training occurrences (provenance = user
 * annotation), which is what the store exists for — feeding user
 * corrections back into the next model build.
 */
object FeedbackStore {

  val schema = "doc_url STRING, feedback STRING, uri STRING, " +
    "surface_form STRING, text STRING, offset INT, systems STRING"

  private val FallbackPrefix = "http://spotlight.dbpedia.org/id/"

  /** Parse reference-format TSV lines. Short lines / non-numeric
   *  offsets are dropped like the other corpus readers (one bad row
   *  must not fail a feed). Rows with an EMPTY doc_url get the REST
   *  resource's deterministic fallback id from Java's `String.hashCode`
   *  of the text (Feedback.java:85 — full MalformedURLException parity
   *  is that HTTP layer's concern, not the store's). */
  def fromStrings(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(lines)
      .flatMap { l =>
        val f = l.split("\t", -1)
        if (f.length < 7) None
        else f(5).trim.toIntOption.map { off =>
          val docUrl =
            if (f(0).nonEmpty) f(0) else FallbackPrefix + f(4).hashCode
          (docUrl, f(1), f(2), f(3), f(4), off, f(6))
        }
      }
      .toDF("doc_url", "feedback", "uri", "surface_form", "text", "offset", "systems")
  }

  /** One TSV line per row — byte-identical to CSVFeedbackStore.add's
   *  mkString("\t") column order. */
  def toTsvLines(df: DataFrame): DataFrame =
    df.select(concat_ws("\t",
      col("doc_url"), col("feedback"), col("uri"), col("surface_form"),
      col("text"), col("offset"), col("systems")).as("line"))

  /** Append a feedback batch to the store table (append-only: new
   *  parquet files, no rewrite — safe under concurrent annotators,
   *  same as N processes appending to a shared CSV but per-partition
   *  parallel). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The union path back into the model build: `correct` feedback
   *  becomes S7-shaped occurrences (id, uri, sf, context, offset,
   *  types) ready to union with the wiki-extracted stream before
   *  sfAndTotalCounts/pairCounts — the reference's stated purpose for
   *  the store (user corrections feed the next model). */
  def toOccurrences(feedback: DataFrame): DataFrame =
    feedback.filter(col("feedback") === "correct")
      .select(
        concat(col("doc_url"), lit("-f"), col("offset")).as("id"),
        col("uri"),
        col("surface_form").as("sf"),
        col("text").as("context"),
        col("offset"),
        lit(null).cast("string").as("types"))

  /** The rebuild bridge: the S7-shaped correct rows as full
   *  [[OccurrenceRow]]s, ready to union with the wiki-extracted
   *  occurrence stream before `ModelBuild.surfaceForms` /
   *  `resolvedOccurrences` — user feedback is one more occurrence
   *  source, weighted like a normal annotation (weight 1) and tagged
   *  `provenance = Annotation` (the reference's enum value for
   *  user-contributed occurrences, core/.../model/Provenance.scala:26). */
  def toOccurrenceRows(feedback: DataFrame): Dataset[OccurrenceRow] = {
    val spark = feedback.sparkSession
    import spark.implicits._
    feedback.filter(col("feedback") === "correct")
      .select(
        concat(col("doc_url"), lit("-f"), col("offset")).as("id"),
        col("doc_url").as("url"),
        lit(0).as("para_idx"),
        col("uri"),
        col("surface_form").as("sf"),
        col("offset"),
        col("text").as("para_text"),
        lit(1).as("weight"),
        lit("Annotation").as("provenance"))
      .as[OccurrenceRow]
  }

  /** Deterministic synthetic feedback feed over the synthetic-corpus
   *  entity vocabulary: mixes correct/incorrect verdicts, single- and
   *  multi-system attributions, and empty doc_urls (exercising the
   *  hashCode fallback). */
  def syntheticFeedbackLines: Seq[String] = {
    val ents = SyntheticCorpus.entities
    (0 until 40).map { i =>
      val e = ents(i % ents.length)
      val sf = e.surfaceForms(i % e.surfaceForms.length)
      val text = s"feedback context $i mentions $sf near ${e.ctx(i % e.ctx.length)}"
      val docUrl = if (i % 5 == 4) "" else s"http://example.org/doc/${i % 7}"
      val verdict = if (i % 3 == 0) "incorrect" else "correct"
      val systems =
        if (i % 2 == 0) "spotlight_statistical"
        else "spotlight_lucene spotlight_statistical"
      Seq(docUrl, verdict, e.uri, sf, text, (i * 7 % 120).toString, systems)
        .mkString("\t")
    }
  }
}
