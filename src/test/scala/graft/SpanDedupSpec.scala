package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** q167 span dedup: planted-fixture semantics pins for
  * [[graft.dedup.Dedup.spanDedup]] — cross-doc duplicated 8-token spans
  * excised, interval union merged into maximal islands, within-doc
  * repeats and sub-window docs untouched, clean text reassembled in
  * token order. The DuckDB oracle proves the same semantics at the
  * driver gate (q167 green at sf0.001/0.01/0.1); these tests pin the
  * boundary cases a corpus-shaped fixture can't isolate.
  */
class SpanDedupSpec extends SparkSpec {

  // tokens t1..tN, deterministic and collision-free
  private def toks(ids: Range): String = ids.map(i => s"t$i").mkString(" ")

  private def run(docs: Seq[(Long, String)], w: Int = 8, minDocs: Int = 2) = {
    import spark.implicits._
    Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w, minDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))))
      .toMap
  }

  test("shared 8-token run is excised from both docs; flanks survive") {
    // docs 1 and 2 share exactly tokens s1..s8; flanks are unique per doc
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val d1 = s"${toks(1 to 10)} $shared ${toks(11 to 20)}"
    val d2 = s"${toks(21 to 30)} $shared ${toks(31 to 40)}"
    val out = run(Seq((1L, d1), (2L, d2)))
    val (n1, sp1, rm1, fr1, txt1) = out(1L)
    assert(n1 == 28 && sp1 == 1 && rm1 == 8)
    assert(math.abs(fr1 - 8.0 / 28.0) < 1e-15)
    assert(txt1 == s"${toks(1 to 10)} ${toks(11 to 20)}")
    val (_, sp2, rm2, _, txt2) = out(2L)
    assert(sp2 == 1 && rm2 == 8 && txt2 == s"${toks(21 to 30)} ${toks(31 to 40)}")
  }

  test("overlapping windows of a longer shared run merge into ONE span") {
    // a 12-token shared run = 5 marked window starts, one island, 12 removed
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val out = run(Seq((1L, s"${toks(1 to 5)} $shared ${toks(6 to 10)}"),
                      (2L, s"$shared ${toks(11 to 30)}")))
    val (_, sp1, rm1, _, txt1) = out(1L)
    assert(sp1 == 1 && rm1 == 12 && txt1 == s"${toks(1 to 5)} ${toks(6 to 10)}")
    val (_, sp2, rm2, _, _) = out(2L)
    assert(sp2 == 1 && rm2 == 12)
  }

  test("two separated shared runs = two spans; gap tokens survive") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val out = run(Seq((1L, s"$a ${toks(1 to 9)} $b"),
                      (2L, s"$a ${toks(101 to 109)} $b")))
    val (_, sp, rm, _, txt) = out(1L)
    assert(sp == 2 && rm == 16 && txt == toks(1 to 9))
  }

  test("within-doc repetition alone never triggers (cross-doc only)") {
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val out = run(Seq((1L, s"$rep ${toks(1 to 4)} $rep"), // repeats inside doc 1 only
                      (2L, toks(201 to 230))))
    val (_, sp, rm, _, _) = out(1L)
    assert(sp == 0 && rm == 0)
  }

  test("identical docs below the window size are untouched; identical long docs fully removed") {
    val shortTxt = toks(1 to 5) // 5 tokens < w=8
    val longTxt = toks(501 to 520) // 20 tokens, exact dup across docs
    val out = run(Seq((1L, shortTxt), (2L, shortTxt), (3L, longTxt), (4L, longTxt)))
    assert(out(1L)._2 == 0 && out(1L)._5 == shortTxt)
    val (n3, sp3, rm3, fr3, txt3) = out(3L)
    assert(n3 == 20 && sp3 == 1 && rm3 == 20 && fr3 == 1.0 && txt3 == "")
  }

  test("minDocs = 3 takes the count_distinct path: 2-doc grams survive, 3-doc grams go") {
    val pair = (1 to 8).map(i => s"p$i").mkString(" ")   // in docs 1, 2 only
    val triple = (1 to 8).map(i => s"q$i").mkString(" ") // in docs 1, 2, 3
    val out = run(Seq(
      (1L, s"$pair ${toks(1 to 9)} $triple"),
      (2L, s"$pair ${toks(101 to 109)} $triple"),
      (3L, s"${toks(201 to 209)} $triple")), minDocs = 3)
    val (_, sp1, rm1, _, txt1) = out(1L)
    assert(sp1 == 1 && rm1 == 8 && txt1 == s"$pair ${toks(1 to 9)}")
    val (_, sp3, rm3, _, _) = out(3L)
    assert(sp3 == 1 && rm3 == 8)
  }

  test("clean text normalizes whitespace but preserves token order exactly") {
    // no duplication anywhere: output = space-rejoined lowered tokens
    val out = run(Seq((1L, "  Alpha\tBETA  gamma\n delta "), (2L, toks(301 to 320))))
    val (n, sp, _, _, txt) = out(1L)
    assert(n == 4 && sp == 0 && txt == "alpha beta gamma delta")
  }

  test("q167 plan shape: marks ride a semi-join, every window is doc_id-partitioned") {
    // the spans frame is an eager output checkpoint, so the gram pass
    // executes inside the checkpoint's execution — capture every
    // execution of the run through a QueryExecutionListener (the q150
    // plan-pin pattern from Round13Spec)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.queries.QueryCatalog.spanDedupQuery(spark, sf).collect()
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      def all = plans.asScala.mkString("\n===\n")
      while (!all.contains("LeftSemi") && System.nanoTime < deadline) Thread.sleep(100)
      val captured = all
      assert(captured.contains("LeftSemi"),
        s"dup-gram mark must plan as a semi-join somewhere in the run:\n${captured.take(2000)}")
      // every window spec in the whole run must lead with doc_id (the
      // islands window — doc-granular groups, the dual-shape rule's
      // bounded case); nothing may window the corpus un-keyed
      val specs = "windowspecdefinition\\([^)]*".r.findAllIn(captured).toSeq
      assert(specs.nonEmpty && specs.forall(_.contains("doc_id")),
        s"non-doc_id window spec in the run:\n${specs.filterNot(_.contains("doc_id")).mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }
}
