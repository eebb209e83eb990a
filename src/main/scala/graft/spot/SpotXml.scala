package graft.spot

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * P9: the `/disambiguate` endpoint's spots-as-XML input adapter
 * (reference: core/src/main/scala/org/dbpedia/spotlight/spot/
 * SpotXmlParser.scala:9-36) — parses
 * `<annotation text="..."><surfaceForm name="..." offset="..."/>...</annotation>`
 * into (text, sf, offset) rows. Regex-based like the fixture formats;
 * used to feed pre-spotted test corpora into the disambiguation stage.
 */
object SpotXml {

  private val TextRe = """(?s)<annotation\s+text="(.*?)"\s*>""".r
  private val SfRe = """<surfaceForm\s+name="(.*?)"\s+offset="(\d+)"\s*/?>""".r

  final case class ParsedSpot(text: String, sf: String, offset: Int)

  def parse(xml: String): Seq[ParsedSpot] = {
    val text = TextRe.findFirstMatchIn(xml).map(m => unescape(m.group(1))).getOrElse("")
    SfRe.findAllMatchIn(xml).flatMap { m =>
      // \d+ admits digit runs beyond Int.MaxValue; a malformed request
      // must drop the spot, not throw NumberFormatException
      m.group(2).toIntOption.map(off => ParsedSpot(text, unescape(m.group(1)), off))
    }.toSeq
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  /** Batch adapter: (doc_id, xml) pairs → spots DataFrame keyed like the
   *  pipeline's (url, para_idx=1, offset, sf). */
  def toSpots(spark: SparkSession, docs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    docs.flatMap { case (id, xml) =>
      parse(xml).map(p => (id, 1, p.offset, p.sf, p.text))
    }.toDF("url", "para_idx", "offset", "sf", "para_text")
  }
}
