package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling evidence for the connected-components operator alone (the
 * dedup-canonicalization stage): run large-star/small-star over a
 * deterministic synthetic edge list at two local parallelism levels
 * (same ScalingBench protocol: identical input, identical shuffle
 * partitioning at both levels, warmup discarded, best-of reported).
 *
 * The synthetic graph stresses the algorithm where single-hop policies
 * break and where skew hits: long chains (worst-case diameter forces
 * the O(log n) alternation to do real work) plus star hubs (one
 * high-degree node per block exercises the groupBy-min/join skew path).
 * Deterministic by construction — no RNG: edge i of block b is
 * (b*span+i, b*span+i+1) for chains; hubs connect b*span to each chain
 * midpoint.
 *
 * Usage: runMain graft.CcProbe [nEdges] [small] [large] [runs] [shufflePartitions]
 * Prints one JSON line per (level, run) plus a summary with efficiency.
 */
object CcProbe {

  /** nEdges edges in 1000-edge blocks over disjoint 1001-node ranges:
    * block b holds nodes [b*1001, b*1001+1000]. Every 10th block is a
    * STAR (all edges from the block head — a 1000-degree hub, the skew
    * path); the rest are CHAINS (edge j is (base+j, base+j+1) — worst
    * diameter, forces the large/small-star alternation to do real
    * work). Components = number of blocks, checkable arithmetic. */
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
      val row = cc.agg(count(lit(1)), approx_count_distinct(col("component"))).head()
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
    def level(cpus: Int): (Double, Long, Long) = {
      runOnce(cpus, nEdges, parts, span) // discarded warmup (JIT, code cache)
      val all = (1 to runs).map { r =>
        val (s, nodes, comps) = runOnce(cpus, nEdges, parts, span)
        println(f"""{"level":$cpus,"run":$r,"sec":$s%.1f,"nodes":$nodes,"components":$comps}""")
        (s, nodes, comps)
      }
      all.minBy(_._1)
    }
    val (sSmall, nodesS, compsS) = level(small)
    val (sLarge, nodesL, compsL) = level(large)
    val speedup = sSmall / sLarge
    val eff = speedup / (large.toDouble / small)
    println(f"""{"metric":"cc_scaling","edges":$nEdges,"span":$span,"small":$small,"large":$large,"sec_small":$sSmall%.1f,"sec_large":$sLarge%.1f,"edges_per_sec_small":${nEdges / sSmall}%.0f,"edges_per_sec_large":${nEdges / sLarge}%.0f,"efficiency":$eff%.3f,"counters_identical":${nodesS == nodesL && compsS == compsL}}""")
  }
}
