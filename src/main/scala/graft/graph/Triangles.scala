package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by degree-ordered edge orientation (the
  * node-iterator++ / Cohen MapReduce construction) — the graph-shape
  * diagnostic of a near-dup or co-occurrence graph (triangle-dense
  * components are duplicate families, not chains of borderline pairs).
  *
  * Construction: orient every undirected edge from its (degree, id)-
  * smaller endpoint to the larger; then every triangle has exactly ONE
  * vertex with two outgoing edges in it (its order-smallest), so counting
  * = join wedges (pairs of out-edges at one vertex) with the oriented
  * edge that closes them. Each triangle is produced exactly once, no
  * dedup pass.
  *
  * Scale: the whole point of the orientation is the out-degree bound —
  * a hub of degree d has its edges pointed INTO it by almost all
  * neighbors (out-degree after orientation is O(√|E|) for any graph), so
  * the wedge self-join explodes on no vertex. Everything is equi-joins
  * and aggregations; no vertex ever holds its full neighborhood in one
  * row. Assumes vertex ids and degrees fit 31 bits (the order key packs
  * (degree, id) into one long).
  */
object Triangles {

  /** `edges`: undirected edge list; rows with a==b (self-loops) and
    * duplicate/reversed pairs are normalized away. Returns one row:
    * (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // e is read four ways (degrees, orientation, node/edge counts) and
    // oriented three (both wedge sides + the closing probe) — checkpoint
    // each once or the caller's whole edge build re-executes per use
    // (measured 5.7s → 1.5s on the q148 rare-gram edge build).
    val (e, eBlocks) = graft.dedup.Checkpoints.tracked(edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct())
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    // total-order key: (degree, id) packed into one long
    val ka = col("da") * lit(1L << 32) + col("a")
    val kb = col("db") * lit(1L << 32) + col("b")
    val (oriented, orientedBlocks) = graft.dedup.Checkpoints.tracked(withDeg.select(
      when(ka < kb, col("a")).otherwise(col("b")).as("src"),
      when(ka < kb, col("b")).otherwise(col("a")).as("dst"),
      greatest(ka, kb).as("kdst")))
    // wedges at the order-smallest vertex: out-neighbor pairs (v, w), v before w
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.kdst") < col("e2.kdst"))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    // the closing edge is oriented v→w because kv < kw; one wedge per
    // distinct apex, so a plain inner join counts each triangle once
    val closed = wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val nNodes = e.select(explode(array(col("a"), col("b"))).as("v")).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nTris  = closed.agg(count(lit(1)).as("n_triangles"))
    val out = graft.dedup.Checkpoints.output(
      nNodes.crossJoin(nEdges).crossJoin(nTris))
    graft.dedup.Checkpoints.release(eBlocks)
    graft.dedup.Checkpoints.release(orientedBlocks)
    out
  }
}
