package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random
import graft.model.WebPage
import graft.extract.WikiPageParser
import graft.util.TextUtil

/**
 * Deterministic synthetic Common-Crawl-style corpus over a closed entity
 * universe (FIXTURES.md §1): pages of wiki-markup with `[[Uri|sf]]` links
 * embedded in filler sentences whose vocabulary is distinctive per URI,
 * so context disambiguation is learnable from the corpus itself.
 *
 * Page content is a pure function of (seed, pageIdx) — generation is
 * distributed via `spark.range(n).map` and identical at any parallelism,
 * which is also what makes checkpoint resume idempotent (SURVEY.md §7.4(5)).
 *
 * Scale-up story: at 10^12 documents the same generator shape (pure
 * row-index function) partitions trivially; nothing here is driver-bound.
 */
object SyntheticCorpus {

  final case class Entity(
      uri: String,
      surfaceForms: List[String],
      ctx: List[String],
      types: List[String])

  // ---- the closed universe (fixed, scale-independent) -----------------

  private val fillerVocab: Vector[String] = Vector(
    "system", "history", "report", "study", "region", "people", "group",
    "work", "life", "time", "year", "place", "part", "number", "form",
    "house", "water", "world", "school", "family", "power", "city",
    "music", "film", "book", "game", "road", "river", "island", "village")

  val entities: Vector[Entity] = {
    val handcrafted = Vector(
      Entity("Mercury_(planet)", List("Mercury"),
        List("planet", "orbit", "solar", "astronomy", "telescope", "crater"),
        List("DBpedia:Planet", "Schema:Thing")),
      Entity("Mercury_(element)", List("Mercury", "quicksilver"),
        List("metal", "liquid", "toxic", "thermometer", "chemistry", "amalgam"),
        List("DBpedia:ChemicalElement")),
      Entity("Apache_Spark", List("Spark", "Apache Spark"),
        List("cluster", "computing", "dataframe", "shuffle", "executor", "catalyst"),
        List("DBpedia:Software", "Schema:SoftwareApplication")),
      Entity("United_States", List("USA", "United States", "America"),
        List("federal", "congress", "washington", "states", "nation", "government"),
        List("DBpedia:Country", "Schema:Country")),
      Entity("Java_(island)", List("Java"),
        List("indonesia", "volcano", "jakarta", "tropical", "archipelago", "rice"),
        List("DBpedia:Island", "Schema:Place")),
      Entity("Java_(programming_language)", List("Java"),
        List("bytecode", "compiler", "jvm", "class", "object", "runtime"),
        List("DBpedia:ProgrammingLanguage")))
    val generated = (handcrafted.length until 40).map { i =>
      val base = (0 until 4).map(j => fillerVocab((i * 5 + j * 7) % fillerVocab.length))
      Entity(s"Topic_$i", List(s"Topic $i"),
        (base :+ s"marker$i").toList,
        if (i % 2 == 0) List("DBpedia:Topic") else Nil)
    }
    handcrafted ++ generated
  }

  private val entityByUri: Map[String, Entity] = entities.map(e => e.uri -> e).toMap

  /** Redirect edges incl. a 3-hop chain and a 2-cycle (FIXTURES.md §5). */
  val redirects: Vector[(String, String)] = Vector(
    "USA_(country)" -> "United_States",
    "The_States" -> "USA_(country)",
    "Quicksilver_metal" -> "Mercury_(element)",
    "Chain_1" -> "Chain_2",
    "Chain_2" -> "Chain_3",
    "Chain_3" -> "Topic_10",
    "Loop_A" -> "Loop_B",
    "Loop_B" -> "Loop_A",
    "Murica" -> "United_States")

  val disambiguationPages: Vector[String] = Vector("Mercury_(disambiguation)")

  private val ns = "http://dbpedia.org/resource/"

  def redirectsNt: Seq[String] =
    redirects.map { case (f, t) =>
      s"<$ns$f> <http://dbpedia.org/ontology/wikiPageRedirects> <$ns$t> ."
    }

  def disambiguationsNt: Seq[String] =
    disambiguationPages.map { d =>
      s"<$ns$d> <http://dbpedia.org/ontology/wikiPageDisambiguates> <${ns}Mercury_(planet)> ."
    }

  def instanceTypesNt: Seq[String] =
    entities.flatMap(e => e.types.map { t =>
      val full = t match {
        case s if s.startsWith("DBpedia:") => "http://dbpedia.org/ontology/" + s.stripPrefix("DBpedia:")
        case s if s.startsWith("Schema:") => "http://schema.org/" + s.stripPrefix("Schema:")
        case s => s
      }
      s"<$ns${e.uri}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <$full> ."
    })

  // ---- page generation -------------------------------------------------

  private def sentence(rnd: Random, e: Entity, sf: String, link: Boolean): String = {
    val c1 = e.ctx(rnd.nextInt(e.ctx.length))
    val c2 = e.ctx(rnd.nextInt(e.ctx.length))
    val c3 = e.ctx(rnd.nextInt(e.ctx.length))
    val f1 = fillerVocab(rnd.nextInt(fillerVocab.length))
    val target = if (link) s"[[${e.uri.replace('_', ' ')}|$sf]]" else sf
    rnd.nextInt(3) match {
      case 0 => s"The $f1 of $target is described through $c1 and $c2 studies."
      case 1 => s"Researchers note that $target relates to $c1, $c2 and $c3."
      case _ => s"In many a $f1, $target remains central to $c1 and $c3 research."
    }
  }

  /** Deterministic markup for content page `idx` (idx ≥ 0). */
  def pageMarkup(seed: Long, idx: Long): (String, String) = {
    val rnd = new Random(seed * 1000003L + idx)
    val main = entities((idx % entities.length).toInt)
    val nParas = 2 + (idx % 3).toInt
    val paras = (0 until nParas).map { p =>
      val nSent = 3 + rnd.nextInt(2)
      val sents = (0 until nSent).map { s =>
        // every other (page,para,sent) slot links an entity; context words
        // always come from the linked entity so disambiguation is learnable
        val e = entities(((idx * 7 + p * 3 + s) % entities.length).toInt)
        val sf = e.surfaceForms(rnd.nextInt(e.surfaceForms.length))
        sentence(rnd, e, sf, link = s % 2 == 0)
      }
      // skew fixture: the "USA" head surface form in ~half the paragraphs
      val skew = if ((idx + p) % 2 == 0)
        " The [[United States|USA]] congress issued a federal report in washington." else ""
      sents.mkString(" ") + skew
    }
    var markup = paras.mkString("\n\n")
    // decorate deterministically to exercise the extractor contract
    if (idx % 5 == 0) markup = "__NOTOC__\n" + markup
    if (idx % 4 == 0) markup = markup.replaceFirst("The", "'''The'''")
    if (idx % 6 == 0) markup += "\n\nSome notes<ref>ignored footnote</ref> remain &amp; persist."
    if (idx % 7 == 0) markup += "\n<!-- hidden comment -->"
    if (idx % 3 == 0)
      markup += "\n\n== See also ==\n* [[Topic 10]]\n* other things\n\nClosing remark."
    val title = main.uri + "__page_" + idx
    (title, markup)
  }

  /** The `web_pages` input table (BASELINE.json input_hint shape). */
  def webPages(spark: SparkSession, nDocs: Long, seed: Long = 42L): Dataset[WebPage] = {
    import spark.implicits._
    val baseTs = 1700000000000L
    spark.range(nDocs).map { idx =>
      val (title, markup) = pageMarkup(seed, idx)
      WebPage(
        url = s"http://crawl.test/wiki/$title",
        warc_ts = new Timestamp(baseTs + idx * 1000L),
        html = markup.getBytes("UTF-8"),
        text = WikiPageParser.extractText(markup),
        lang = "en")
    }
  }

  /** Title-derived surface form of a URI (reference:
   *  ExtractCandidateMap.scala:172-243 title decode). */
  def titleSf(uri: String): String =
    TextUtil.wikiDecode(uri).replaceAll(""" \(.+?\)$""", "")
}
