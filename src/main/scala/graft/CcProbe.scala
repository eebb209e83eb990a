package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling evidence for the connected-components operator alone (the
 * dedup-canonicalization stage): run large-star/small-star over a
 * deterministic synthetic edge list at two local parallelism levels
 * (same ScalingBench protocol: identical input, identical shuffle
 * partitioning at both levels, warmup discarded, best-of reported,
 * counters required identical across EVERY run at both levels).
 *
 * The synthetic graph stresses the algorithm where single-hop policies
 * break and where skew hits: chain blocks (worst-case diameter forces
 * the O(log n) alternation to do real work) plus star blocks (one
 * high-degree hub per star block exercises the groupBy-min/join skew
 * path). Deterministic by construction — no RNG; see [[edges]] for the
 * exact shape.
 *
 * Usage: runMain graft.CcProbe [nEdges] [small] [large] [runs] [shufflePartitions] [span]
 * Prints one JSON line per (level, run) plus a summary with efficiency.
 */
object CcProbe {

  /** nEdges edges in span-edge blocks over disjoint (span+1)-node
    * ranges: block b holds nodes [b*(span+1), b*(span+1)+span]. Every
    * 10th block is a STAR (all span edges from the block head — a
    * span-degree hub, the skew path); the rest are CHAINS (edge j of
    * the block is (base+j, base+j+1) — worst diameter, forces the
    * large/small-star alternation to do real work). Components =
    * ceil(nEdges/span) exactly; mapped nodes = components*(span+1) when
    * span divides nEdges — checkable arithmetic, asserted in main. */
  private def edges(spark: SparkSession, nEdges: Long, span: Long) = {
    val base = floor(col("id") / span).cast("long") * (span + 1)
    val j = col("id") % span
    spark.range(nEdges).select(
      when(floor(col("id") / span).cast("long") % 10 === 0, base).otherwise(base + j).as("src"),
      (base + j + 1).as("dst"))
  }

  private def runOnce(cpus: Int, nEdges: Long, shufflePartitions: Int,
                      span: Long): (Double, Long, Long) = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions)
      .appName(s"graft-cc-$cpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val cc = graft.textops.ConnectedComponents
        .connectedComponents(edges(spark, nEdges, span), "src", "dst")
      // exact countDistinct, not approx: the component count is part of
      // the published evidence and must match the block arithmetic
      val row = cc.agg(count(lit(1)), countDistinct(col("component"))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, row.getLong(0), row.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(2000000L)
    val small = args.lift(1).map(_.toInt).getOrElse(2)
    val large = args.lift(2).map(_.toInt).getOrElse(8)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val parts = args.lift(4).map(_.toInt).getOrElse(64)
    // block span = cluster diameter: 1000 is the adversarial long-chain
    // case; ~20 models realistic near-dup clusters (converges in ~6
    // rounds instead of ~11)
    val span = args.lift(5).map(_.toLong).getOrElse(1000L)
    val allCounters = Vector.newBuilder[(Long, Long)]
    def level(cpus: Int): Double = {
      runOnce(cpus, nEdges, parts, span) // discarded warmup (JIT, code cache)
      (1 to runs).map { r =>
        val (s, nodes, comps) = runOnce(cpus, nEdges, parts, span)
        allCounters += ((nodes, comps))
        println(f"""{"level":$cpus,"run":$r,"sec":$s%.1f,"nodes":$nodes,"components":$comps}""")
        s
      }.min
    }
    val sSmall = level(small)
    val sLarge = level(large)
    // ScalingBench's determinism gate: every run at both levels must
    // produce the same counters, and they must match the block
    // arithmetic — a nondeterministic (e.g. unconverged) run would
    // invalidate the throughput comparison
    val counters = allCounters.result()
    require(counters.distinct.size == 1,
      s"nondeterministic counters across runs: ${counters.distinct}")
    val expectedComps = (nEdges + span - 1) / span
    require(counters.head._2 == expectedComps,
      s"components ${counters.head._2} != block arithmetic $expectedComps")
    // node-count side of the block arithmetic (exact only when span
    // divides nEdges — a ragged last block has fewer than span+1 nodes)
    if (nEdges % span == 0)
      require(counters.head._1 == expectedComps * (span + 1),
        s"nodes ${counters.head._1} != block arithmetic ${expectedComps * (span + 1)}")
    val speedup = sSmall / sLarge
    val eff = speedup / (large.toDouble / small)
    println(f"""{"metric":"cc_scaling","edges":$nEdges,"span":$span,"small":$small,"large":$large,"sec_small":$sSmall%.1f,"sec_large":$sLarge%.1f,"edges_per_sec_small":${nEdges / sSmall}%.0f,"edges_per_sec_large":${nEdges / sLarge}%.0f,"efficiency":$eff%.3f,"nodes":${counters.head._1},"components":${counters.head._2},"counters_identical":true}""")
  }
}
