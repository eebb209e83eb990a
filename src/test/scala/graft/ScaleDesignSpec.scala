package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.modelbuild.ModelBuild

/**
 * Scale-design evidence (SURVEY.md §4, §7.4(2)): the skew fixture must
 * not funnel a hot key through one reducer, bucketed model tables must
 * join without re-shuffling the bucketed side, and the C4 retry path
 * resolves variant surface forms.
 */
class ScaleDesignSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("salted aggregation splits the hot key across reducers") {
    import spark.implicits._
    // 50k rows of one hot key ("USA"-style) + a small tail
    val hot = spark.range(50000).select(
      lit("USA").as("sf"), lit(1L).as("weight"),
      concat(lit("url"), col("id")).as("url"))
    val tail = spark.range(500).select(
      concat(lit("sf"), col("id")).as("sf"), lit(1L).as("weight"),
      concat(lit("u"), col("id")).as("url"))
    val occs = hot.unionByName(tail)

    // the partial (salted) stage must spread USA over many sub-keys:
    // reproduce the partial aggregation and count distinct salts used
    val partial = occs
      .withColumn("_salt", pmod(xxhash64(col("url")), lit(64)))
      .groupBy("sf", "_salt").agg(sum("weight").as("w"))
    val saltsForHot = partial.filter(col("sf") === "USA").count()
    assert(saltsForHot >= 32, s"hot key spread over only $saltsForHot salts")
    // max partial-group size is bounded far below the hot-key total
    val maxGroup = partial.agg(max("w")).head().getLong(0)
    assert(maxGroup <= 50000 / 16, s"one salted group still holds $maxGroup rows")

    // and the final result is exact
    val total = ModelBuild.saltedSum(occs.toDF(), Seq("sf"), col("weight"), col("url"))
      .filter(col("sf") === "USA").head().getLong(1)
    assert(total === 50000L)
  }

  test("bucketed model tables join without exchanging the bucketed side") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS cand_bucketed")
    // scrub any orphaned location from a previous JVM (DROP above only
    // removes what the current catalog knows about)
    val loc = new java.io.File("/tmp/graft-warehouse/cand_bucketed")
    if (loc.exists()) {
      java.nio.file.Files.walk(loc.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
    val cands = (1 to 1000).map(i => (i % 100, i, i.toLong))
      .toDF("sf_id", "res_id", "cooc_count")
    graft.pipeline.Pipeline.writeBucketed(cands, "cand_bucketed", "sf_id", 8)

    // force a shuffle join (with broadcast allowed the planner broadcasts
    // the tiny probe side and bucketing is moot); the point at scale is a
    // big-big join where the bucketed side must not re-shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val spots = (1 to 50).map(i => (i, s"sf$i")).toDF("sf_id", "sf")
      val joined = spark.table("cand_bucketed").join(spots, Seq("sf_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // exactly one Exchange — the non-bucketed probe side; the bucketed
      // candidates scan feeds the join shuffle-free
      val exchanges = "(?m)^\\s*[+:]?[- ]*Exchange hashpartitioning"
        .r.findAllIn(plan).length
      assert(exchanges === 1, s"expected 1 exchange (probe side only):\n$plan")
      assert(joined.count() === 500) // 50 sf_ids × 10 candidates each
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("C4 retry resolves variant surface forms when enabled") {
    import spark.implicits._
    // plural "Cars" is NOT caught by T4 normalization ("/cars" != "/car");
    // only the C4 variant retry ("Cars" → "Car") can resolve it
    val sfs = Seq(
      graft.model.SurfaceFormRow(1, "Car", "/car", 10L, 20L)).toDS()
    val cands = Seq(graft.model.CandidateRow(1, 7, 10L)).toDS()
    val spots = Seq(("u", 1, 0, "Cars", 1.0))
      .toDF("url", "para_idx", "offset", "sf", "spot_prob")
    val off = graft.disambig.Disambiguator.spotCandidates(
      spots, sfs, cands, graft.disambig.Disambiguator.Config())
    assert(off.count() === 0)
    val on = graft.disambig.Disambiguator.spotCandidates(
      spots, sfs, cands,
      graft.disambig.Disambiguator.Config(morphologicalRetry = true))
    val row = on.head()
    assert(on.count() === 1)
    assert(row.getAs[Int]("res_id") === 7)
    assert(row.getAs[String]("sf") === "Cars") // original sf preserved
  }

  test("lm quality joins hash, url canonicalization stays in codegen") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    // the only nested-loop allowed is the hinted 1-row totals broadcast;
    // the vocabulary join must never degrade to a cartesian product
    val lmPlan = graft.textops.LmQuality.crossEntropy(docs)
      .queryExecution.executedPlan.toString
    assert(!lmPlan.contains("CartesianProduct"), "LM scoring plans a cartesian product")
    // canonicalization is pure column algebra, no UDF, no shuffle: the
    // regexp stages codegen ("*(n)" spans); the param filter/sort are
    // higher-order Catalyst expressions (interpreted, still one Project).
    // (a local Seq relation would be constant-folded away entirely —
    // plan over a range leaf so the expression pipeline is visible)
    val uPlan = graft.textops.UrlNormalize
      .syntheticUrls(spark.range(4).select(col("id").as("doc_id")))
      .withColumn("canonical_url",
        graft.textops.UrlNormalize.canonicalize(col("url")))
      .queryExecution.executedPlan.toString
    assert(uPlan.contains("*(1)"), "url construction fell out of codegen")
    assert(!uPlan.contains("ScalaUDF") && !uPlan.contains("BatchEvalPython"),
      "url canonicalization left column algebra")
    assert(!uPlan.contains("Exchange"), "url canonicalization is not map-only")
  }

  test("connected-components star rounds are join-based, no cartesian, no arrays") {
    import spark.implicits._
    val edges = Seq.tabulate(200)(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
      .select(col("a").as("src"), col("b").as("dst"))
    for ((name, step) <- Seq(
        "largeStar" -> graft.textops.ConnectedComponents.largeStar(edges),
        "smallStar" -> graft.textops.ConnectedComponents.smallStar(edges))) {
      val plan = step.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
        s"$name materializes per-node neighbor arrays")
    }
  }
}
