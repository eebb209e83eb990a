package graft.eval

/**
 * Deterministic in-repo sample corpora in the reference's gold formats,
 * mirroring how the reference bundles AnnotateDatasetFixture for its own
 * tests (eval/.../AidaCorpus.scala:93-99 documents the line format the
 * AIDA fixture follows). Used by the driver-visible corpus-reader
 * queries and the reader round-trip specs.
 */
object CorpusFixtures {

  /** AIDA/CoNLL-format lines: two documents, BIO-tagged mentions, one
   *  NIL (`--NME--`), and punctuation tokens exercising the reference's
   *  detokenization re-attachment. */
  val conllLines: Seq[String] = Seq(
    "-DOCSTART- (1 EU rejects)",
    "EU\tB\tEU\tEuropean_Union\tORGANIZATION",
    "rejects",
    "German\tB\tGerman\tGermany\tMISC",
    "call",
    "to",
    "boycott",
    "British\tB\tBritish\tUnited_Kingdom\tMISC",
    "lamb",
    ".",
    "-DOCSTART- (2 Rare Hendrix)",
    "Rare",
    "Hendrix\tB\tHendrix\t--NME--\tPERSON",
    "song",
    "'s",
    "value",
    ",",
    "said",
    "Peter\tB\tPeter Hobbs\tPeter_Hobbs\tPERSON",
    "Hobbs\tI\tPeter Hobbs\tPeter_Hobbs\tPERSON",
    ".")

  /** AIDA/CoNLL-format documents over the SYNTHETIC-CORPUS entity
   *  universe (sources/SyntheticCorpus.entities), so the annotate path
   *  can be evaluated end-to-end on an AIDA-format input: each document
   *  carries one gold mention plus that entity's distinctive context
   *  vocabulary — including both Mercury senses, which only context
   *  disambiguation can separate. */
  val conllSyntheticLines: Seq[String] = Seq(
    "-DOCSTART- (10 spark doc)",
    "The",
    "Apache\tB\tApache Spark\tApache_Spark\tORGANIZATION",
    "Spark\tI\tApache Spark\tApache_Spark\tORGANIZATION",
    "cluster",
    "computing",
    "dataframe",
    "shuffle",
    "executor",
    "catalyst",
    ".",
    "-DOCSTART- (11 planet doc)",
    "Mercury\tB\tMercury\tMercury_(planet)\tMISC",
    "planet",
    "orbit",
    "solar",
    "astronomy",
    "telescope",
    "crater",
    ".",
    "-DOCSTART- (12 element doc)",
    "Mercury\tB\tMercury\tMercury_(element)\tMISC",
    "metal",
    "liquid",
    "toxic",
    "thermometer",
    "chemistry",
    "amalgam",
    ".",
    "-DOCSTART- (13 usa doc)",
    "USA\tB\tUSA\tUnited_States\tLOCATION",
    "federal",
    "congress",
    "washington",
    "states",
    "nation",
    "government",
    ".")

  /** MilneWitten-format documents: paragraphs carrying 2- and 3-field
   *  `[[uri|sf|confidence]]` links. */
  val milneWittenDocs: Seq[(String, Seq[String])] = Seq(
    ("Doc One", Seq(
      "The [[European_Union|EU|0.9]] met in [[Brussels]] today.",
      "No links in this paragraph.")),
    ("Doc Two", Seq(
      "[[Jimi_Hendrix|Hendrix]] played his [[Electric_guitar|guitar|0.4]].")))

  /** KBP-format fixture: queries XML + answers tab + KB XML + source
   *  paragraphs (one newswire-style doc). */
  val kbpQueriesXml: String =
    """<?xml version="1.0" encoding="UTF8"?>
      |<kbpentlink>
      |  <query id="EL1"><name>Mercury</name><docid>DOC_A</docid></query>
      |  <query id="EL2"><name>Hendrix</name><docid>DOC_A</docid></query>
      |  <query id="EL3"><name>Nowhere</name><docid>DOC_A</docid></query>
      |</kbpentlink>""".stripMargin

  val kbpAnswerLines: Seq[String] = Seq(
    "EL1\tE7", "EL2\tNIL0001", "EL3\tE9")

  val kbpKbXml: String =
    """<knowledge_base>
      |  <entity id="E7" wiki_title="Mercury (planet)"/>
      |  <entity id="E9" wiki_title="Nowhere Town"/>
      |</knowledge_base>""".stripMargin

  val kbpSgm: String =
    """<DOC><DOCID>DOC_A</DOCID><BODY><TEXT>
      |<P>Mercury is the
      |closest planet.</P>
      |<P>Hendrix played in London while Mercury rose.</P>
      |</TEXT></BODY></DOC>""".stripMargin

  /** PREDOSE-format lines: text line + `start \t end \t label \t uri`
   *  occurrence lines, blank-line-separated paragraphs. */
  val predoseLines: Seq[String] = Seq(
    "You did take klonopin and oxycodone at some dose.",
    "13\t21\tklonopin\thttp://dbpedia.org/resource/Clonazepam",
    "26\t35\toxycodone\thttp://dbpedia.org/resource/Oxycodone",
    "",
    "The reason is unclear.",
    "4\t10\treason\thttp://knoesis.org/ontology/predose#reason")

  /** CSAW-format annotation XML + matching raw document texts. */
  val csawDocs: Seq[(String, String)] = Seq(
    ("doc_alpha.txt", "The European Union met in Brussels today."),
    ("doc_beta.txt", "Jimi Hendrix played in London."))

  val csawXml: String =
    """<annotations>
      |  <annotation>
      |    <docName>doc_alpha.txt</docName>
      |    <wikiName>European_Union</wikiName>
      |    <offset>4</offset>
      |    <length>14</length>
      |  </annotation>
      |  <annotation>
      |    <docName>doc_alpha.txt</docName>
      |    <wikiName>Brussels</wikiName>
      |    <offset>26</offset>
      |    <length>8</length>
      |  </annotation>
      |  <annotation>
      |    <docName>doc_beta.txt</docName>
      |    <wikiName>Jimi_Hendrix</wikiName>
      |    <offset>0</offset>
      |    <length>12</length>
      |  </annotation>
      |  <annotation>
      |    <docName>doc_beta.txt</docName>
      |    <wikiName></wikiName>
      |    <offset>23</offset>
      |    <length>6</length>
      |  </annotation>
      |</annotations>""".stripMargin
}
