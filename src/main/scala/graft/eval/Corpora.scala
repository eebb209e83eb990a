package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.WikiPageParser

/**
 * Gold-corpus readers in the reference's evaluation formats:
 *
 *  - MilneWitten-style: paragraphs carrying inline `[[uri|sf]]` links
 *    (eval/src/main/scala/org/dbpedia/spotlight/corpus/
 *    MilneWittenCorpus.scala:48-87 parses the same link syntax out of
 *    `<p>` blocks) — re-parsed through OUR extractor so offsets line up
 *    with the annotate path exactly (the reference does the same with
 *    WikipediaHeldoutCorpus, index/.../io/WikipediaHeldoutCorpus.scala:18-56);
 *  - heldout lines: one MediaWiki paragraph per line;
 *  - occurrence TSV via [[graft.sources.OccurrenceTsv]].
 *
 * Output schema matches the pipeline's gold: (url, para_idx, uri, sf, offset).
 */
object Corpora {

  /** Parse link-annotated paragraphs (doc_id → markup lines) into gold
   *  occurrences + the plain paragraph text the annotator sees. */
  def fromMarkupParagraphs(spark: SparkSession,
                           docs: Seq[(String, Seq[String])]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = docs.flatMap { case (docId, paras) =>
      paras.zipWithIndex.map { case (p, i) =>
        (docId, i + 1, WikiPageParser.parseParagraph(p))
      }
    }
    val gold = parsed.flatMap { case (docId, idx, para) =>
      para.links.map(l => (docId, idx, l.uri, l.sf, l.offset))
    }.toDF("url", "para_idx", "uri", "sf", "offset")
    val text = parsed.map { case (docId, idx, para) => (docId, idx, para.text) }
      .toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  /** Heldout format: one markup paragraph per line, url derived from the
   *  line number (WikipediaHeldoutCorpus semantics). */
  def fromHeldoutLines(spark: SparkSession, lines: Seq[String]): (DataFrame, DataFrame) =
    fromMarkupParagraphs(spark,
      lines.zipWithIndex.map { case (l, i) => (s"heldout:$i", Seq(l)) })

  // ---- MilneWitten (Wikify) .htm corpus ------------------------------------

  private val WikiLink = """\[\[(.*?)\]\]""".r

  /** Parse one MilneWitten paragraph: `[[uri|sf|confidence]]` links
   *  (2- and 3-field forms) embedded in plain text; returns
   *  (links(uri, sf, confidence, offset-in-clean-text), cleanText) —
   *  the offset arithmetic of MilneWittenCorpus.parse
   *  (eval/.../corpus/MilneWittenCorpus.scala:48-87) without its
   *  accumulated-difference bookkeeping (building the clean text
   *  directly gives the same offsets). */
  private[eval] def parseMilneWittenParagraph(p: String)
      : (Seq[(String, String, Double, Int)], String) = {
    val sb = new StringBuilder
    val links = Vector.newBuilder[(String, String, Double, Int)]
    var last = 0
    WikiLink.findAllMatchIn(p).foreach { m =>
      sb.append(p.substring(last, m.start))
      val parts = m.group(1).split('|')
      // degenerate links are dropped, not thrown on: "|".split('|') is an
      // EMPTY array, and a malformed confidence field falls back to 1.0 —
      // the drop-malformed-input policy of the other corpus readers
      if (parts.nonEmpty && parts(0).nonEmpty) {
        val sf = if (parts.length > 1 && parts(1).nonEmpty) parts(1) else parts(0)
        val conf = if (parts.length > 2) parts(2).toDoubleOption.getOrElse(1.0) else 1.0
        links += ((parts(0), sf, conf, sb.length))
        sb.append(sf): Unit
      }
      last = m.end
    }
    sb.append(p.substring(last))
    (links.result(), sb.toString)
  }

  /** MilneWitten corpus from (docTitle → paragraph texts). Gold carries
   *  the per-link confidence column the 3-field form encodes. */
  def fromMilneWittenParagraphs(spark: SparkSession,
                                docs: Seq[(String, Seq[String])]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = docs.flatMap { case (title, paras) =>
      paras.zipWithIndex.map { case (p, i) =>
        val (links, clean) = parseMilneWittenParagraph(p.trim)
        (title, i + 1, links, clean)
      }
    }
    val gold = parsed.flatMap { case (title, idx, links, _) =>
      links.map { case (uri, sf, conf, off) => (title, idx, uri, sf, off, conf) }
    }.toDF("url", "para_idx", "uri", "sf", "offset", "confidence")
    val text = parsed.map { case (title, idx, _, clean) => (title, idx, clean) }
      .toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  /** MilneWitten corpus from its on-disk layout: a directory of `.htm`
   *  files, document title from `<title>`, one record per `<p>`
   *  (MilneWittenCorpus.fromDirectory:89-94). Files parse in parallel;
   *  per-file XHTML parsing is bounded by document size. */
  def fromMilneWittenDirectory(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = spark.sparkContext.wholeTextFiles(s"$dir/*.htm")
      .flatMap { case (_, content) =>
        val doc = scala.xml.parsing.XhtmlParser(scala.io.Source.fromString(content))
        val title = (doc \\ "title").text
        (doc \\ "p").map(_.text.trim).zipWithIndex.map { case (p, i) =>
          val (links, clean) = parseMilneWittenParagraph(p)
          (title, i + 1, links, clean)
        }
      }.cache()
    val gold = parsed.flatMap { case (title, idx, links, _) =>
      links.map { case (uri, sf, conf, off) => (title, idx, uri, sf, off, conf) }
    }.toDF("url", "para_idx", "uri", "sf", "offset", "confidence")
    val text = parsed.map { case (title, idx, _, clean) => (title, idx, clean) }
      .toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  // ---- KBP entity-linking corpus -------------------------------------------

  /** KBP knowledge-base entities from one KB XML document:
   *  `<entity id="E123" wiki_title="...">` → (kb_id, uri) with the title
   *  wiki-encoded (KBPCorpus.kbFromDirectory:72-104 — its dense-array
   *  index arithmetic exists only to emulate a map lookup; a keyed join
   *  carries the same information relationally). */
  def kbpKbFromXml(spark: SparkSession, xml: String): DataFrame = {
    import spark.implicits._
    val root = scala.xml.XML.loadString(xml)
    (root \ "entity").flatMap { e =>
      val id = e.attribute("id").map(_.text).getOrElse("")
      val title = e.attribute("wiki_title").map(_.text).getOrElse("")
      if (id.isEmpty || title.isEmpty) None
      else Some((id, graft.util.TextUtil.wikiEncode(title)))
    }.toDF("kb_id", "uri")
  }

  /** SGM newswire/web-blog text → paragraphs: `<P>` (news) and `<POST>`
   *  (blogs) elements, newlines collapsed (KBPCorpus.parseNews:147-155,
   *  parseWebBlog:158-166). */
  def kbpSgmParagraphs(sgm: String): Seq[String] = {
    val root = scala.xml.XML.loadString(sgm)
    val ps = (root \\ "P") ++ (root \\ "POST")
    ps.map(_.text.replace("\n", " ").trim).filter(_.nonEmpty)
  }

  /**
   * KBP gold: entity-linking queries (`<query id><name><docid>`) joined
   * to the answers tab (qid → kb node id; `NIL*` answers dropped, as the
   * reference does, KBPCorpus.foreach:113-118) and the KB (kb_id → uri),
   * then anchored in the source paragraphs — one occurrence per
   * paragraph containing the query name, at its first offset
   * (`locate`-based, matching the reference's per-paragraph occurrence).
   * `paragraphs` = (url=docid, para_idx, para_text).
   */
  def kbpGold(spark: SparkSession, queriesXml: String, answerLines: Seq[String],
              kb: DataFrame, paragraphs: DataFrame): DataFrame = {
    import spark.implicits._
    val fixed = queriesXml.replaceAll("(?i)encoding=\"utf8\"", "encoding=\"utf-8\"")
    val queries = (scala.xml.XML.loadString(fixed) \ "query").map { q =>
      ((q \ "@id").text, (q \ "name").text, (q \ "docid").text)
    }.toDF("qid", "sf", "url")
    val answers = answerLines.map(_.split("\t")).collect {
      case arr if arr.length >= 2 => (arr(0), arr(1))
    }.toDF("qid", "kb_id")
    queries
      .join(answers.filter(!col("kb_id").startsWith("NIL")), Seq("qid"))
      .join(kb, Seq("kb_id"))
      .join(paragraphs, Seq("url"))
      .withColumn("offset", expr("locate(sf, para_text) - 1"))
      .filter(col("offset") >= 0) // locate = 0 → sf absent from paragraph
      .select("url", "para_idx", "uri", "sf", "offset")
  }

  // ---- PREDOSE -------------------------------------------------------------

  private val PredoseOccLine = """^(\d+)\t(\d+)\t(.+?)\t(\S+)$""".r

  /** PREDOSE corpus: a text line followed by `start \t end \t label \t
   *  uri` occurrence lines, blank line between paragraphs
   *  (eval/.../corpus/PredoseCorpus.scala:15-60; url is the reference's
   *  name+text-hashCode id). */
  def fromPredoseLines(spark: SparkSession, lines: Seq[String]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = Vector.newBuilder[(String, String, Vector[(String, String, Int)])]
    var id = ""; var text = ""; var occs = Vector.empty[(String, String, Int)]
    def flush(): Unit = {
      if (id.nonEmpty) docs += ((id, text, occs))
      id = ""; text = ""; occs = Vector.empty
    }
    lines.foreach {
      case "" => flush()
      case PredoseOccLine(start, _, label, uri) =>
        occs :+= ((uri, label, start.toInt))
      case line =>
        id = "PREDOSE" + line.hashCode.toString; text = line
    }
    flush()
    val parsed = docs.result()
    val gold = parsed.flatMap { case (u, _, os) =>
      os.map { case (uri, sf, off) => (u, 1, uri, sf, off) }
    }.toDF("url", "para_idx", "uri", "sf", "offset")
    val textDf = parsed.map { case (u, t, _) => (u, 1, t) }
      .toDF("url", "para_idx", "para_text")
    (gold, textDf)
  }

  // ---- small-context transform ---------------------------------------------

  /**
   * SmallContextOccurrences: rewrite ANY gold corpus so each occurrence
   * gets its own ~10-word-either-side context paragraph
   * (eval/.../corpus/SmallContextOccurrencesCorpus.scala:18-31, same
   * split arithmetic). Differences from the reference, both deliberate:
   * the derived url appends the offset as well as the uri (the
   * reference's id+uri collides when a uri occurs twice), and the gold
   * offset is RECOMPUTED against the small context (the reference keeps
   * the original-text offset, which no longer indexes the emitted
   * paragraph — its eval never reads it back).
   */
  def smallContext(spark: SparkSession, gold: DataFrame,
                   text: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    val joined = gold.join(text, Seq("url", "para_idx"))
      .select("url", "para_idx", "uri", "sf", "offset", "para_text")
      .as[(String, Int, String, String, Int, String)]
    val rows = joined.map { case (url, idx, uri, sf, off, t) =>
      val (l, r) = t.splitAt(off)
      val left = l.split(" ").takeRight(10).mkString(" ")
      val leftCtx = if (left.isEmpty) "" else left + " "
      val small = leftCtx + r.split(" ", 12).take(11).mkString(" ")
      (s"$url-$uri-$off", idx, uri, sf, leftCtx.length, small)
    }.toDF("url", "para_idx", "uri", "sf", "offset", "para_text").cache()
    (rows.select("url", "para_idx", "uri", "sf", "offset"),
      rows.select("url", "para_idx", "para_text"))
  }

  // ---- AIDA / CoNLL-YAGO ---------------------------------------------------

  /** The AIDA corpus NIL marker (eval/.../corpus/AidaCorpus.scala:78). */
  val ConllNilUri = "--NME--"

  private val ConllDocMarker = """^-DOCSTART- \((\d+)(.+)\)""".r
  private val ConllTokenLine = """^(\S+)\t(\S+)\t(.+)\t(\S+)\t(\S+)$""".r

  private final case class ConllDoc(url: String, text: String,
                                    gold: Seq[(String, String, Int)])

  /** Parse one CoNLL/AIDA-format document stream: `-DOCSTART- (id label)`
   *  markers, token lines `token \t bioTag \t surfaceForm \t uri \t type`,
   *  bare lines as plain tokens. Detokenization and BIO offset arithmetic
   *  follow the reference exactly (AidaCorpus.scala:23-72): the gold
   *  offset is the reconstructed-text length when the B token arrives,
   *  and the tokens `'s : , ! .` re-attach to the previous token by
   *  deleting the separating space. */
  private def parseConllDocs(lines: Iterator[String]): Iterator[ConllDoc] = {
    var docId = ""; var docLabel = ""
    var toks = Vector.empty[(String, String, String, String)] // token, bio, sf, uri
    def finish(): Option[ConllDoc] = {
      if (docId.isEmpty) return None
      val sb = new StringBuilder
      val gold = Vector.newBuilder[(String, String, Int)]
      toks.foreach { case (token, bio, sf, uri) =>
        if (bio == "B") gold += ((uri, sf, sb.length))
        if (Set("'s", ":", ",", "!", ".").contains(token) && sb.nonEmpty)
          sb.deleteCharAt(sb.length - 1)
        sb.append(token).append(' '): Unit
      }
      Some(ConllDoc(s"${docId}_$docLabel", sb.toString.trim, gold.result()))
    }
    val out = Vector.newBuilder[ConllDoc]
    lines.foreach {
      case ConllDocMarker(id, label) =>
        finish().foreach(out += _)
        docId = id; docLabel = label.trim.replaceAll(" ", "_"); toks = Vector.empty
      case ConllTokenLine(token, bio, sf, uri, _) =>
        toks :+= ((token, bio, sf, uri))
      case line =>
        toks :+= ((line.trim, "", "", ""))
    }
    finish().foreach(out += _)
    out.result().iterator
  }

  /** AIDA/CoNLL corpus from in-memory lines (fixtures). Returns
   *  (gold, text) in the pipeline's shape; NIL mentions keep uri
   *  [[ConllNilUri]] — filter them for linking metrics, keep them for
   *  spotting metrics. One paragraph per document (the corpus has no
   *  paragraph structure). */
  def fromConllLines(spark: SparkSession, lines: Seq[String]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = parseConllDocs(lines.iterator).toSeq
    val gold = docs.flatMap(d => d.gold.map { case (uri, sf, off) => (d.url, 1, uri, sf, off) })
      .toDF("url", "para_idx", "uri", "sf", "offset")
    val text = docs.map(d => (d.url, 1, d.text)).toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  /** AIDA/CoNLL corpus from files. Document boundaries span lines, so
   *  parsing is per-file (wholeTextFiles) — eval corpora are
   *  dimension-sized (single-digit MBs per file), and many files still
   *  parse in parallel. */
  def fromConllFiles(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseConllDocs(content.linesIterator) }
    val gold = docs.flatMap(d => d.gold.map { case (uri, sf, off) => (d.url, 1, uri, sf, off) })
      .toDF("url", "para_idx", "uri", "sf", "offset")
    val text = docs.map(d => (d.url, 1, d.text)).toDF("url", "para_idx", "para_text")
    (gold, text)
  }

  // ---- CSAW ----------------------------------------------------------------

  /** CSAW corpus (eval/.../corpus/CSAWCorpus.scala:14-51): raw document
   *  texts plus a flat annotation XML of (docName, wikiName, offset,
   *  length) records. The surface form is recovered relationally —
   *  `substring(text, offset+1, length)` after joining annotations to
   *  texts — instead of the reference's per-record in-memory substring. */
  def fromCsawXml(spark: SparkSession, texts: DataFrame,
                  annotationsXml: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val xml = scala.xml.XML.loadString(annotationsXml)
    val anns = (xml \ "annotation").flatMap { a =>
      val wikiName = (a \ "wikiName").text
      if (wikiName.isEmpty) None // unlinkable mentions carry no gold uri
      else Some(((a \ "docName").text, wikiName,
        (a \ "offset").text.trim.toInt, (a \ "length").text.trim.toInt))
    }
    val annDf = anns.toDF("url", "uri", "offset", "len")
    val gold = annDf
      .join(texts.select(col("url"), col("para_text")), Seq("url"))
      .select(col("url"), lit(1).as("para_idx"), col("uri"),
        expr("substring(para_text, offset + 1, len)").as("sf"), col("offset"))
    (gold, texts.select(col("url"), lit(1).as("para_idx"), col("para_text")))
  }

  /** CSAW corpus from its on-disk layout: `crawledDocs/` +
   *  `CSAW_Annotations.xml` (CSAWCorpus.fromDirectory:43-51, including
   *  its excluded housekeeping files). */
  def fromCsawDirectory(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val excluded = Set("CZdata1", "docPaths.txt", "13Oct08_allUrls.txt.txt")
    val texts = spark.sparkContext.wholeTextFiles(s"$dir/crawledDocs/*")
      .map { case (path, content) => (path.split('/').last, content) }
      .filter { case (name, _) => !name.startsWith(".") && !excluded.contains(name) }
      .toDF("url", "para_text")
    val xml = String.join("\n",
      spark.read.textFile(s"$dir/CSAW_Annotations.xml").collectAsList())
    fromCsawXml(spark, texts, xml)
  }
}
