package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S16: annotation output formats. The reference's REST OutputManager
 * emits XML/JSON with the attribute set (URI, support, types,
 * surfaceForm, offset, similarityScore, percentageOfSecondRank)
 * (/root/reference rest/src/main/java/org/dbpedia/spotlight/web/rest/
 * OutputManager.java:125-133); here the same record set is produced as
 * columnar JSON/TSV — declarative `to_json(struct(...))`, codegen'd, so
 * serialization stays a narrow map stage writable straight to
 * json/text sinks.
 */
object Serializers {

  /** Spotlight-JSON-shaped record per annotation (one line per mention):
   *  `{"@URI":..., "@support":..., "@types":"A,B", "@surfaceForm":...,
   *    "@offset":..., "@similarityScore":..., "@percentageOfSecondRank":...}` */
  def toSpotlightJson(annotations: DataFrame): DataFrame =
    annotations.select(
      col("url"),
      to_json(struct(
        col("uri").as("@URI"),
        col("support").as("@support"),
        concat_ws(",", col("types")).as("@types"),
        col("sf").as("@surfaceForm"),
        col("offset").as("@offset"),
        col("similarity_score").as("@similarityScore"),
        col("percentage_of_second_rank").as("@percentageOfSecondRank")
      )).as("json"))

  /** The reference's occurrence-TSV line per annotation (S7 format). */
  def toTsvLines(annotations: DataFrame): DataFrame =
    annotations.select(
      col("url"),
      concat_ws("\t",
        concat(col("url"), lit("-p"), col("para_idx"), lit("o"), col("offset")),
        col("uri"), col("sf"), lit(""), col("offset").cast("string")).as("line"))

  /** XML attribute-value escaping as column algebra (&  < > " ' —
   *  ampersand first). */
  private def xmlEsc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(replace(replace(replace(replace(c.cast("string"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;")),
      lit("\""), lit("&quot;")), lit("'"), lit("&apos;"))

  /** S16 XML: the REST server's annotate document — an `<Annotation>`
   *  element carrying the request text + parameters, wrapping one
   *  `<Resource .../>` per annotation with the attribute set of
   *  OutputManager.getResourcesXml (rest/.../OutputManager.java:116-141,
   *  makeXML:78-110). One document per (url, para_idx) — the pipeline's
   *  request unit — assembled with collect_list over per-annotation
   *  fragments (bounded by annotations-per-paragraph, the same list the
   *  reference buffers per request). */
  def toSpotlightXml(annotations: DataFrame, paragraphs: DataFrame,
                     confidence: Double = 0.1, support: Long = 10): DataFrame = {
    val frag = resourceFrag
    annotations
      .select(col("url"), col("para_idx"), col("offset").as("_off"), frag.as("_frag"))
      .groupBy("url", "para_idx")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_off"), col("_frag")))),
        s => s.getField("_frag")), "").as("_resources"))
      .join(paragraphs.select(col("url"), col("para_idx"), col("para_text")),
        Seq("url", "para_idx"), "right")
      .select(col("url"), col("para_idx"), concat(
        lit("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<Annotation text=\""),
        xmlEsc(col("para_text")),
        lit(s"""" confidence="$confidence" support="$support">"""),
        when(col("_resources").isNull, lit(""))
          .otherwise(concat(lit("<Resources>"), col("_resources"), lit("</Resources>"))),
        lit("</Annotation>")).as("xml"))
  }

  /** Per-candidate `<Resource .../>` fragment (shared by the annotate
   *  and candidates XML documents). */
  private def resourceFrag: org.apache.spark.sql.Column = concat(
    lit("<Resource URI=\""), xmlEsc(col("uri")),
    lit("\" support=\""), col("support"),
    lit("\" types=\""), xmlEsc(concat_ws(",", col("types"))),
    lit("\" surfaceForm=\""), xmlEsc(col("sf")),
    lit("\" offset=\""), col("offset"),
    lit("\" similarityScore=\""), col("similarity_score"),
    lit("\" percentageOfSecondRank=\""), col("percentage_of_second_rank"),
    lit("\"/>"))

  /** S16 candidates XML: the `/candidates` endpoint's document — every
   *  spot with its FULL ranked candidate list, not just best-1
   *  (OutputManager.makeCandidatesXML, rest/.../OutputManager.java:143-191).
   *  Input is the scored DataFrame (rank ≤ k per spot). Nesting is the
   *  sane `<SurfaceForm><Resources>…</Resources></SurfaceForm>` tree —
   *  the reference's SAX attribute reuse emits Resources as siblings
   *  with accumulated attributes (a long-standing quirk of that code);
   *  the information content (per-sf ranked candidates with the full
   *  attribute set) is identical. Two bounded collect_lists: candidates
   *  per spot (≤ k), spots per paragraph. */
  def toCandidatesXml(scored: DataFrame, paragraphs: DataFrame,
                      confidence: Double = 0.1, support: Long = 10): DataFrame = {
    val perSpot = scored
      .select(col("url"), col("para_idx"), col("offset"), col("sf"),
        col("rank"), resourceFrag.as("_frag"))
      .groupBy("url", "para_idx", "offset", "sf")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("rank"), col("_frag")))),
        s => s.getField("_frag")), "").as("_resources"))
      .select(col("url"), col("para_idx"), col("offset").as("_off"), concat(
        lit("<SurfaceForm surfaceForm=\""), xmlEsc(col("sf")),
        lit("\" offset=\""), col("_off"),
        lit("\" visibility=\"true\"><Resources>"), col("_resources"),
        lit("</Resources></SurfaceForm>")).as("_sfElem"))
    perSpot
      .groupBy("url", "para_idx")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_off"), col("_sfElem")))),
        s => s.getField("_sfElem")), "").as("_sfs"))
      .join(paragraphs.select(col("url"), col("para_idx"), col("para_text")),
        Seq("url", "para_idx"), "right")
      .select(col("url"), col("para_idx"), concat(
        lit("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<Annotation text=\""),
        xmlEsc(col("para_text")),
        lit(s"""" confidence="$confidence" support="$support">"""),
        when(col("_sfs").isNull, lit(""))
          .otherwise(concat(lit("<SurfaceForms>"), col("_sfs"), lit("</SurfaceForms>"))),
        lit("</Annotation>")).as("xml"))
  }

  /** N-Triples/Turtle string-literal escaping (backslash first). */
  private def ntEsc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(replace(replace(replace(c.cast("string"),
      lit("\\"), lit("\\\\")), lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n")), lit("\r"), lit("\\r"))

  /** S16 NIF: NLP Interchange Format 2.0 output — a `nif:Context` bean
   *  per paragraph plus one `nif:Phrase` bean per annotation anchored to
   *  it, in N-Triples serialization (the reference builds the same two
   *  bean shapes and renders via NIFManager.getNTriples,
   *  rest/.../NIFOutputFormatter.scala:43-84). One triple line per row —
   *  a narrow map/union writable straight to a text sink. */
  def toNif(annotations: DataFrame, paragraphs: DataFrame,
            prefix: String = "http://spotlight.dbpedia.org/annotate",
            resourceNs: String = "http://dbpedia.org/resource/"): DataFrame = {
    val nif = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
    val itsrdf = "http://www.w3.org/2005/11/its/rdf#"
    val xsdInt = "^^<http://www.w3.org/2001/XMLSchema#nonNegativeInteger>"
    def ctxUri(len: org.apache.spark.sql.Column) = concat(
      lit(s"<$prefix/"), col("url"), lit("/"), col("para_idx"),
      lit("#char=0,"), len, lit(">"))
    val ctx = paragraphs.select(
      ctxUri(length(col("para_text"))).as("_s"),
      col("para_text"), length(col("para_text")).as("_len"))
    val ctxTriples = ctx.select(explode(array(
      concat(col("_s"), lit(s" <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${nif}Context> .")),
      concat(col("_s"), lit(s" <${nif}beginIndex> \"0\"$xsdInt .")),
      concat(col("_s"), lit(s" <${nif}endIndex> \""), col("_len"), lit(s"\"$xsdInt .")),
      concat(col("_s"), lit(s" <${nif}isString> \""), ntEsc(col("para_text")), lit("\" ."))
    )).as("line"))
    val endOff = col("offset") + length(col("sf"))
    val phrase = annotations
      .join(paragraphs.select(col("url"), col("para_idx"),
        length(col("para_text")).as("_plen")), Seq("url", "para_idx"))
      .select(concat(lit(s"<$prefix/"), col("url"), lit("/"), col("para_idx"),
        lit("#char="), col("offset"), lit(","), endOff, lit(">")).as("_s"),
        ctxUri(col("_plen")).as("_ctx"), col("sf"), col("offset"), endOff.as("_end"), col("uri"))
    val phraseTriples = phrase.select(explode(array(
      concat(col("_s"), lit(s" <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${nif}Phrase> .")),
      concat(col("_s"), lit(s" <${nif}beginIndex> \""), col("offset"), lit(s"\"$xsdInt .")),
      concat(col("_s"), lit(s" <${nif}endIndex> \""), col("_end"), lit(s"\"$xsdInt .")),
      concat(col("_s"), lit(s" <${nif}anchorOf> \""), ntEsc(col("sf")), lit("\" .")),
      concat(col("_s"), lit(s" <${nif}referenceContext> "), col("_ctx"), lit(" .")),
      concat(col("_s"), lit(s" <${itsrdf}taIdentRef> <"),
        when(col("uri").startsWith("http"), col("uri"))
          .otherwise(concat(lit(resourceNs), col("uri"))), lit("> ."))
    )).as("line"))
    ctxTriples.unionByName(phraseTriples)
  }

  /** Splice per-annotation link markup into the paragraph text: the
   *  annotations of a document, sorted by offset, replace their surface
   *  form span with `linkCol`'s markup — the column-algebra equivalent of
   *  OutputManager.makeWebRepresentation's offset-tracking splice loop
   *  (rest/.../OutputManager.java:251-269), done as ONE `aggregate`
   *  higher-order function over the sorted list so the whole document
   *  renders inside whole-stage codegen (no UDF, no driver loop).
   *  Returns (url, para_idx, content) with `\n` already `<br/>`-ized. */
  private def spliceLinks(annotations: DataFrame, paragraphs: DataFrame,
                          linkCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.Column
    val frags = annotations
      .select(col("url"), col("para_idx"),
        struct(col("offset"), length(col("sf")).as("sflen"), linkCol.as("link")).as("_f"))
      .groupBy("url", "para_idx")
      .agg(sort_array(collect_list(col("_f"))).as("_fs"))
    frags
      .join(paragraphs.select(col("url"), col("para_idx"), col("para_text")),
        Seq("url", "para_idx"), "right")
      .select(col("url"), col("para_idx"),
        replace(
          when(col("_fs").isNull, col("para_text")).otherwise(
            // fold: acc = (chars consumed, rendered prefix); each step
            // copies the gap before the spot then the link markup.
            // Inputs are post-resolveOverlaps annotations (sorted,
            // in-range, non-overlapping); the greatest() clamps keep a
            // malformed span (overlap / out-of-range offset) from turning
            // into a negative-length substr that silently drops text —
            // the overlapping spot renders with an empty gap instead,
            // and pos only ever advances.
            aggregate(col("_fs"),
              struct(lit(0).as("pos"), lit("").as("acc")),
              (acc: Column, x: Column) => struct(
                greatest(acc.getField("pos"),
                  x.getField("offset") + x.getField("sflen")).as("pos"),
                concat(acc.getField("acc"),
                  col("para_text").substr(acc.getField("pos") + 1,
                    greatest(lit(0), x.getField("offset") - acc.getField("pos"))),
                  x.getField("link")).as("acc")),
              acc => concat(acc.getField("acc"),
                col("para_text").substr(acc.getField("pos") + 1,
                  greatest(lit(0),
                    length(col("para_text")) - acc.getField("pos")))))),
          lit("\n"), lit("<br/>")).as("content"))
  }

  private val HtmlMain =
    "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\" \"http://www.w3.org/TR/html4/loose.dtd\">\n" +
    "<html>\n<head>\n<title>DBpedia Spotlight annotation</title>\n" +
    "<meta http-equiv=\"Content-type\" content=\"text/html;charset=UTF-8\">\n" +
    "</head>\n<body>\n<div>\n"
  private val RdfaMain =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
    "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML+RDFa 1.0//EN\" \"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd\">\n" +
    "<html xmlns=\"http://www.w3.org/1999/xhtml\" xmlns:lexvo=\"http://lexvo.org/ontology#\" " +
    "xmlns:dbpedia=\"http://dbpedia.org/resource/\" xmlns:dbpo=\"http://dbpedia.org/ontology/\">\n" +
    "<head>\n<title>DBpedia Spotlight annotation</title>\n</head>\n<body>\n<div>\n"
  private val MainEnd = "\n</div>\n</body>\n</html>"

  /** S16 HTML: the `/annotate` text/html representation — the paragraph
   *  text with each annotation spliced in as
   *  `<a href="uri" title="uri" target="_blank">sf</a>`, wrapped in the
   *  reference's HTML skeleton (HTMLFormatter, OutputManager.java:279-292;
   *  splice loop :251-269). One document per (url, para_idx). */
  def toHtml(annotations: DataFrame, paragraphs: DataFrame,
             resourceNs: String = "http://dbpedia.org/resource/"): DataFrame = {
    val full = iri(col("uri"), resourceNs)
    val link = concat(lit("<a href=\""), full, lit("\" title=\""), full,
      lit("\" target=\"_blank\">"), col("sf"), lit("</a>"))
    spliceLinks(annotations, paragraphs, link)
      .select(col("url"), col("para_idx"),
        concat(lit(HtmlMain), col("content"), lit(MainEnd)).as("html"))
  }

  /** S16 RDFa: same splice with semantic attributes — untyped resources
   *  get `<a about href title target>`, typed ones
   *  `<a about typeof href title>` with the most specific type's full
   *  IRI (RDFaFormatter, OutputManager.java:294-325; the reference takes
   *  the LAST type of the store's list — ours are sort_array'd, so "last"
   *  is the lexicographically greatest, a deterministic refinement of the
   *  reference's store order). */
  def toRdfa(annotations: DataFrame, paragraphs: DataFrame,
             resourceNs: String = "http://dbpedia.org/resource/"): DataFrame = {
    val full = iri(col("uri"), resourceNs)
    val mostSpecific = iri(element_at(col("types"), -1), resourceNs)
    val link = when(coalesce(size(col("types")), lit(0)) <= 0,
        concat(lit("<a about=\""), full, lit("\" href=\""), full,
          lit("\" title=\""), full, lit("\" target=\"_blank\" >"), col("sf"), lit("</a>")))
      .otherwise(
        concat(lit("<a about=\""), full, lit("\" typeof=\""), mostSpecific,
          lit("\" href=\""), full, lit("\" title=\""), full, lit("\">"),
          col("sf"), lit("</a>")))
    spliceLinks(annotations, paragraphs, link)
      .select(col("url"), col("para_idx"),
        concat(lit(RdfaMain), col("content"), lit(MainEnd)).as("html"))
  }

  /** Predicate shorthands → absolute IRIs (N-Triples requires IRIs; a
   *  bare `<mentions>` would be rejected by conformant RDF parsers). */
  private val predIri: Map[String, String] = Map(
    Triples.MentionsPred -> "http://purl.org/dc/terms/references",
    Triples.TypePred -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    Triples.RedirectPred -> "http://dbpedia.org/ontology/wikiPageRedirects",
    Triples.SameAsPred -> "http://www.w3.org/2002/07/owl#sameAs")

  /** Type-ID prefixes → ontology namespaces (types are classes, not
   *  resources — wrapping them in /resource/ would be wrong). */
  private def iri(c: org.apache.spark.sql.Column,
                  resourceNs: String): org.apache.spark.sql.Column =
    when(c.startsWith("http"), c)
      .when(c.startsWith("DBpedia:"),
        concat(lit("http://dbpedia.org/ontology/"), regexp_replace(c, "^DBpedia:", "")))
      .when(c.startsWith("Schema:"),
        concat(lit("http://schema.org/"), regexp_replace(c, "^Schema:", "")))
      .otherwise(concat(lit(resourceNs), c))

  /** N-Triples lines for the output graph tables: predicates mapped to
   *  absolute IRIs, subjects/objects wrapped in the DBpedia resource
   *  namespace unless already IRIs or ontology-class IDs. */
  def toNTriples(triples: DataFrame,
                 ns: String = "http://dbpedia.org/resource/"): DataFrame = {
    val predCol = predIri.foldLeft(col("pred")) { case (acc, (k, v)) =>
      when(col("pred") === k, lit(v)).otherwise(acc)
    }
    triples.select(concat(
      lit("<"), iri(col("subj"), ns),
      lit("> <"), when(predCol.startsWith("http"), predCol).otherwise(concat(lit(ns), predCol)),
      lit("> <"), iri(col("obj"), ns),
      lit("> .")).as("line"))
  }
}
