package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a candidate-pair graph — the
  * transitive-closure step that turns near-dup PAIRS into dedup CLUSTERS.
  *
  * Pairs alone under-dedup: if A~B and B~C but A!~C (similarity is not
  * transitive, and LSH banding needn't surface every edge of a clique),
  * dropping `doc_b` of each pair can still keep two documents of the same
  * cluster. The fix every production dedup pipeline ships is components:
  * label each doc with min(doc id) over its connected component and keep
  * one representative per label.
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  *   propagate:  label(v) <- min(label(v), min over neighbors u of label(u))
  *   jump:       label(v) <- label(label(v))
  * Both steps preserve the invariant that label(v) is the id of a vertex in
  * v's component and never increase it, so the fixpoint is the component
  * minimum. Propagation alone needs O(diameter) rounds; the jump step
  * roughly halves remaining path length per round, giving O(log n) rounds
  * on chain-shaped components (the worst case for boilerplate-heavy
  * corpora where doc i edges to doc i+1).
  *
  * Scale shape: per round, one shuffle join edges⋈labels + one min
  * aggregate + one self-join — every structure is O(|V| + |E|), nothing
  * ever materializes a component member list or the pair space. Each
  * round's labels are `localCheckpoint`ed: persist alone is NOT enough
  * here, because the jump step references the propagate frame twice and
  * the change-count references two rounds — the analyzed logical plan
  * would grow ~4× per round (exponential; OOMs the planner by round ~8).
  * Checkpointing truncates lineage so every round plans against a flat
  * scan. On a real cluster prefer reliable checkpointing
  * (`sc.setCheckpointDir` + `checkpoint()`) for executor-loss tolerance;
  * the algorithm is unchanged.
  */
object Components {

  /** Edge rows below which the single-task union-find path engages:
    * 2M (Long, Long) rows plus the hash-map state is a few hundred MB in
    * one task — comfortably under an executor's working memory, and far
    * above any healthy near-dup graph at the corpus sizes a single
    * executor would see. At 100 TB a denser graph simply takes the
    * pointer-jumping path.
    */
  val DefaultSmallGraphEdges: Long = 1L << 21

  /** Single-task min-id union-find over a small edge list: one
    * mapPartitions task builds parent pointers with path compression and
    * union-by-min (attach the larger root under the smaller), so every
    * final root IS its component's minimum vertex id — the same labels
    * the pointer-jumping fixpoint converges to. Emits labels for
    * edge-incident vertices; isolated vertices attach by the same
    * anti-join as the iterative path.
    */
  private def smallGraphComponents(edges: DataFrame, srcCol: String,
                                   dstCol: String, vertices: DataFrame,
                                   idCol: String): DataFrame = {
    import edges.sparkSession.implicits._
    // null endpoints: the iterative path drops them naturally (joins skip
    // null keys); the typed decode here would NPE — filter to match
    val labels = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a)
          val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(v => (v, find(v)))
      }
      .toDF("id", "label")
    val isolated = vertices.select(col(idCol).as("id"))
      .join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    labels.union(isolated)
      .select(col("id").as(idCol), col("label").as("component"))
  }

  /** Connected components of the undirected graph given by `edges`.
    *
    * @param edges    two-column frame of undirected edges (self-loops fine)
    * @param srcCol   edge source column in `edges`
    * @param dstCol   edge destination column in `edges`
    * @param vertices one-column frame of ALL vertex ids (a superset of the
    *                 edge endpoints — isolated vertices become singleton
    *                 components labelled by themselves)
    * @param idCol    vertex id column in `vertices`
    * @param maxIters convergence guard; propagation+jumping converges in
    *                 O(log n) rounds so the default is generous
    * @param smallGraphEdges edge-count gate below which the closure runs
    *                 as ONE executor-side union-find task instead of
    *                 pointer-jumping rounds (see below); lower to 0 to
    *                 force the iterative path (specs do)
    * @return (idCol, "component") — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          vertices: DataFrame, idCol: String,
                          maxIters: Int = 25,
                          smallGraphEdges: Long = DefaultSmallGraphEdges): DataFrame = {
    // Small-graph fast path: every pointer-jumping round pays fixed cost
    // (a fresh plan, a codegen compile, a checkpoint job, a convergence
    // count) that dwarfs the data work when the edge set is tiny — the
    // common case for a near-dup graph, whose size tracks dup DENSITY,
    // not corpus size (measured: 256 edges at sf0.1 cost ~1s of pure
    // round overhead). When the edges fit comfortably in one task's
    // memory, run min-id union-find in a single `mapPartitions` task —
    // the same runtime-size-adaptation AQE applies when it coalesces a
    // small shuffle to one partition, and an EXECUTOR-side task, not a
    // driver collect. Union-by-min keeps each root the component minimum,
    // so the output is bit-identical to the iterative fixpoint (pinned by
    // ComponentsSpec on random graphs against the forced loop). The gate
    // needs an edge count: every caller hands a checkpointed/persisted
    // pair frame, so the count is block-local, and the loop path would
    // pay an equivalent scan in round 1 anyway. Long ids only (the
    // engine-wide doc_id type); any other key type takes the loop.
    val smallPathOk = smallGraphEdges > 0 &&
      edges.schema(srcCol).dataType == org.apache.spark.sql.types.LongType &&
      edges.schema(dstCol).dataType == org.apache.spark.sql.types.LongType
    if (smallPathOk && edges.count() <= smallGraphEdges)
      return smallGraphComponents(edges, srcCol, dstCol, vertices, idCol)
    // Vertices touching no edge are singleton components by DEFINITION —
    // their label never moves, so carrying them through the iteration
    // only inflates every per-round shuffle. The loop runs over
    // EDGE-INCIDENT vertices only (at corpus scale the near-dup graph
    // touches a small fraction of documents, so rounds cost O(|E|), not
    // O(|V| + |E|)); isolated vertices re-attach as self-labelled rows
    // after convergence, via one anti-join that never enters the loop.
    val endpoints = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Symmetrized edges plus a self-loop per active vertex: with
    // self-loops, the propagate join alone covers every vertex AND its own
    // current label, so the loop body needs no union with the label frame
    // (unioning a checkpointed frame with its own derivative also trips
    // Catalyst's Union constraint rewrite on the shared attribute ids).
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .union(endpoints.select(col("id").as("src"), col("id").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint truncates lineage to a LogicalRDD over the persisted
    // internal-row RDD; collecting that RDD from the returned frame's OWN
    // plan identifies exactly the blocks backing it. (Diffing
    // sc.getPersistentRDDs around the call — the previous implementation —
    // captures RDDs persisted by CONCURRENT jobs on the shared context into
    // the diff, and release() would later unpersist a stranger's
    // non-recomputable checkpoint blocks.) Tracking lets each round free
    // its predecessor's blocks explicitly instead of leaving O(rounds)
    // checkpointed frames to the ContextCleaner.
    def checkpointTracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) =
      Checkpoints.tracked(df)
    def release(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
      Checkpoints.release(rdds)

    var (labels, labelIds) = checkpointTracked(
      endpoints.select(col("id"), col("id").as("label")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // propagate: min over own label (via self-loop) and neighbors' labels
      val prop = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("label"))
      // jump: adopt the label of the vertex the label points at. Labels
      // always name live vertices (min of vertex ids), so the join is a
      // left join only as belt-and-braces. The self-join reads `prop`
      // twice, but both sides canonicalize to the SAME shuffle subtree, so
      // ReuseExchange materializes the propagate shuffle once (pinned in
      // ComponentsSpec) — no second checkpoint needed to dedup the work.
      val jumped = prop.as("a")
        .join(prop.select(col("id").as("pid"), col("label").as("plabel")),
              col("a.label") === col("pid"), "left")
        .select(col("a.id").as("id"),
                coalesce(col("plabel"), col("a.label")).as("label"))
      // One checkpoint per round, with the PREVIOUS round's label carried
      // alongside: the convergence count then scans the already-persisted
      // blocks (no join job), so each round costs exactly one
      // materializing job plus a block-local count — not the three jobs
      // (propagate checkpoint, jump checkpoint, count-join) of the naive
      // structure, whose fixed job overhead dominated on fast rounds.
      val (next, nextIds) = checkpointTracked(jumped
        .join(labels.select(col("id"), col("label").as("prev")), Seq("id")))
      val changed = next.filter(col("label") =!= col("prev")).count()
      // `next` is materialized; the previous round's labels can never be
      // referenced again — free their blocks
      release(labelIds)
      labels = next.select("id", "label")
      labelIds = nextIds
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: labels NOT converged after $maxIters rounds — " +
        "component ids may be non-minimal; raise maxIters")
    endpoints.unpersist()
    // Singletons: every vertex the edge set never touched labels itself.
    // The anti-join probes the final (checkpointed — flat scan, no
    // recompute) label frame, so the full vertex frame streams through
    // once against a small build side, unshuffled under AQE.
    val isolated = vertices.select(col(idCol).as("id"))
      .join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    labels.select("id", "label").union(isolated)
      .select(col("id").as(idCol), col("label").as("component"))
  }
}
