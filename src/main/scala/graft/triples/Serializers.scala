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
