package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S7: the reference's occurrence TSV interchange format —
 * `id \t uri \t surface_form \t context_text \t offset (\t types)` —
 * written by DBpediaResourceOccurrence.toTsvString (/root/reference
 * core/src/main/scala/org/dbpedia/spotlight/model/
 * DBpediaResourceOccurrence.scala:91-93) and read back by
 * AnnotatedTextSource.fromOccurrencesFile (core/.../io/
 * AnnotatedTextSource.scala:50). Spark-side: a plain csv read/write with
 * tab separator; gzip arrives free via the codec option.
 */
object OccurrenceTsv {

  val schema = "id STRING, uri STRING, sf STRING, context STRING, offset INT, types STRING"

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("quote", "")          // the reference never quotes
      .schema(schema)
      .csv(path)

  /** Parse in-memory TSV lines (test fixtures / golden corpora).
   *  Malformed records (short lines, non-numeric offsets) are dropped,
   *  not thrown — one bad row must not fail a corpus read. */
  def fromStrings(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(lines)
      .flatMap { l =>
        val f = l.split("\t", -1)
        if (f.length < 5) None
        else f(4).trim.toIntOption.map(off =>
          (f(0), f(1), f(2), f(3), off, if (f.length > 5) f(5) else null))
      }
      .toDF("id", "uri", "sf", "context", "offset", "types")
  }

  def write(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    // The reference's toTsvString collapses whitespace before writing
    // (DBpediaResourceOccurrence.scala:91-93) — with quoting disabled, an
    // embedded tab/newline in context would otherwise corrupt the TSV on
    // roundtrip. `read` accordingly assumes single-line records.
    val w = df
      .withColumn("context", regexp_replace(col("context"), "\\s+", " "))
      .select("id", "uri", "sf", "context", "offset")
      .write.mode("overwrite").option("sep", "\t").option("quote", "")
    (if (gzip) w.option("codec", "gzip") else w).csv(path)
  }
}
