package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueryCatalog => Q}

/** BPE-to-target-vocab (q94) semantics beyond the oracle replay: the
  * loop-control contract (stop at |vocab| = target, cap at maxMerges,
  * degenerate targets) and the structural invariants of the merge
  * table a tokenizer would ship.
  */
class TokenizerSpec extends SparkSpec {

  test("bpeVocab stops exactly at the target vocab size") {
    val rows = Q.bpeVocab(spark, sf).orderBy("step").collect()
    assert(rows.nonEmpty, "expected at least one merge at the default target")
    // dense steps 1..M, vocab grows by exactly 1 per merge
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("step") == i + 1, s"steps not dense at $i")
    }
    val base = rows.head.getAs[Long]("vocab_size_after") - 1
    rows.foreach { r =>
      assert(r.getAs[Long]("vocab_size_after") == base + r.getAs[Int]("step"))
    }
    // stopped AT the target (32), not past it — and reached it, since
    // the cap (10) exceeds target − base
    assert(rows.last.getAs[Long]("vocab_size_after") == 32L)
  }

  test("bpeVocab: merged token is the concatenation of its pair, counts positive") {
    Q.bpeVocab(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("pair_a") + r.getAs[String]("pair_b"))
      assert(r.getAs[Long]("pair_count") > 0L)
    }
  }

  test("bpeVocab: target at or below the base charset yields no merges") {
    assert(Q.bpeVocab(spark, sf, targetVocab = 10).count() == 0L)
  }

  test("bpeVocab: maxMerges caps an unreachable target") {
    val rows = Q.bpeVocab(spark, sf, targetVocab = 1000, maxMerges = 3)
      .orderBy("step").collect()
    assert(rows.length == 3, s"expected the cap, got ${rows.length}")
    assert(rows.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3))
  }

  test("bpeVocab prefix agrees with q92's two merges") {
    // q92 reports merge1/merge2 on its top-frequency rows; q94's first
    // two steps must be the same pairs (same corpus, same tie-breaks)
    val m92 = Q.bpeMerges(spark, sf).select("merge1", "merge2").head()
    val m94 = Q.bpeVocab(spark, sf).orderBy("step").select("merged").take(2)
    assert(m94(0).getString(0) == m92.getString(0), "first merge differs from q92")
    assert(m94(1).getString(0) == m92.getString(1), "second merge differs from q92")
  }

  test("bpeEncodeCorpus: encoding is lossless (symbols concatenate back to chars) and compresses") {
    val rows = Q.bpeEncodeCorpus(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // merges only glue adjacent symbols: total chars are invariant and
      // the symbol count can only shrink, never below one per word
      assert(ns <= nc, s"doc ${r.getLong(0)}: more symbols than chars")
      assert(ns >= nw, s"doc ${r.getLong(0)}: fewer symbols than words")
      assert(r.getDouble(4) == nc.toDouble / ns.toDouble)
    }
    // 8 merges on this corpus must actually compress somewhere
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)), "no doc compressed at all")
  }
}
