package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected graph — the centrality
  * score a corpus pipeline uses to pick the canonical document of a
  * near-dup cluster or weight inter-linked sources.
  *
  * Engine-portable by construction: the per-vertex neighbor sum is the
  * one place a double aggregate would depend on partition merge order,
  * so each contribution quantizes to a LONG (`floor(c·1e12 + 0.5)`)
  * before aggregation — integer sums are associative, bit-identical
  * under any partitioning, and exactly replayable in another engine
  * (the q67 quantized-means trick). De-scaling happens once per vertex
  * after the sum.
  *
  * Semantics: simplified PageRank — teleport term (1−d)/N for every
  * vertex, no dangling-mass redistribution (isolated vertices keep the
  * teleport term only, edge mass conserves within the linked subgraph).
  * `iters` is a fixed small constant: rankings stabilize in a few
  * rounds and a fixed count keeps the operator a pure dataflow (no
  * driver-side convergence loop).
  *
  * Scale shape: per iteration, one join edges⋈(degrees, ranks) + one
  * aggregate — O(|V|+|E|) rows shuffled, nothing ever materializes a
  * neighborhood list. The plan grows linearly in `iters`; beyond ~5
  * iterations localCheckpoint each round (the [[graft.dedup.Components]]
  * pattern) to keep the planner flat.
  */
object PageRank {

  /** @param edges    two-column frame of undirected edges
    * @param vertices one-column frame of ALL vertex ids (isolated
    *                 vertices receive the teleport term)
    * @return (idCol, "rank") — quantized-portable PageRank after `iters`
    *         rounds
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               vertices: DataFrame, idCol: String,
               damping: Double = 0.85, iters: Int = 2): DataFrame = {
    // one scalar job; N then rides every plan as a literal (same shape as
    // the bloom build: a bounded driver fetch, not a data loop)
    val n = vertices.count().toDouble
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = vertices.select(col(idCol).as("id"), lit(1.0 / n).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = sym
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          floor(col("rank") / col("deg").cast("double") * lit(damping) * lit(1e12) + lit(0.5))
            .as("cq"))
      val sums = contrib.groupBy("id").agg(sum(col("cq")).as("sq"))
      ranks = vertices.select(col(idCol).as("id"))
        .join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n)
            + coalesce(col("sq"), lit(0L)).cast("double") / lit(1e12)).as("rank"))
    }
    ranks.select(col("id").as(idCol), col("rank"))
  }
}
