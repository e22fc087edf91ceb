package graft

import org.apache.spark.sql.functions._
import graft.dedup.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find reference. */
  private def ufComponents(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress fully, then label = min of component (find gives the
    // min root because unions always point the larger root at the smaller)
    vertices.map(v => v -> find(v)).toMap
  }

  private def run(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = vertices.toDF("doc_id")
    val e = edges.toDF("doc_a", "doc_b")
    Components.connectedComponents(e, "doc_a", "doc_b", v, "doc_id")
      .as[(Long, Long)].collect().toMap
  }

  test("chain graph (worst case for plain propagation) labels to the min") {
    val vs = (1L to 40L)
    val es = (1L until 40L).map(i => (i, i + 1))
    assert(run(vs, es) == ufComponents(vs, es))
  }

  test("mixed graph: cliques, chains, singletons, self-loops") {
    val vs = (1L to 30L)
    val es = Seq(
      (2L, 5L), (5L, 9L), (2L, 9L),            // triangle
      (11L, 12L), (12L, 13L), (13L, 14L),      // chain
      (20L, 20L),                              // self-loop singleton
      (25L, 30L)                               // pair
    )
    val got = run(vs, es)
    assert(got == ufComponents(vs, es))
    assert(got(1L) == 1L && got(3L) == 3L)     // isolated vertices stay themselves
    assert(got(9L) == 2L && got(14L) == 11L && got(30L) == 25L)
  }

  test("jump self-join reuses the propagate shuffle (ReusedExchange)") {
    // One round's plan: propagate (join+min-agg) feeds BOTH sides of the
    // pointer-jump self-join. Both sides canonicalize to the same exchange
    // subtree, so the physical plan must materialize the propagate shuffle
    // once and reuse it — the property that let Components drop its second
    // per-round checkpoint. Reproduce the round-body shape and pin it.
    val labels = (1L to 50L).toDF("id").select(col("id"), col("id").as("label")).localCheckpoint()
    val e = (1L until 50L).map(i => (i, i + 1)).toDF("src", "dst")
    val sym = e.union(e.select(col("dst"), col("src")))
    val prop = sym
      .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
      .select(col("dst").as("id"), col("label"))
      .groupBy("id").agg(min("label").as("label"))
    val jumped = prop.as("a")
      .join(prop.select(col("id").as("pid"), col("label").as("plabel")),
            col("a.label") === col("pid"), "left")
    jumped.collect() // AQE stage reuse is only visible in the FINAL plan
    val plan = jumped.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("reuses"),
      s"expected the jump self-join to reuse the propagate exchange:\n$plan")
    labels.unpersist()
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 60
      val vs = (1L to n.toLong)
      val es = Seq.fill(45)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
      assert(run(vs, es) == ufComponents(vs, es))
    }
  }

  test("single-task union-find path and forced pointer-jumping path agree") {
    // smallGraphEdges = 0 forces the iterative rounds; the default takes
    // the one-task union-find. Labels must be identical — both contracts
    // say component = min reachable vertex id.
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 80
      val vs = (1L to n.toLong)
      val es = Seq.fill(60)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
      val v = vs.toDF("doc_id")
      val e = es.toDF("doc_a", "doc_b")
      val small = Components.connectedComponents(e, "doc_a", "doc_b", v, "doc_id")
        .as[(Long, Long)].collect().toMap
      val loop = Components.connectedComponents(e, "doc_a", "doc_b", v, "doc_id",
          smallGraphEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(small == loop, s"trial $trial: paths diverge")
      assert(small == ufComponents(vs, es), s"trial $trial: vs reference")
    }
  }

  test("non-long edge keys always take the pointer-jumping path") {
    // ids as strings: the union-find path requires LongType, so this
    // exercises the loop under the DEFAULT gate — a type regression here
    // would throw in the small path's typed Dataset cast
    val v = Seq("a", "b", "c", "d").toDF("doc_id")
    val e = Seq(("a", "b"), ("c", "c")).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(e, "doc_a", "doc_b", v, "doc_id")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "d"))
  }
}
