package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueryCatalog => Q}
import graft.sim.Similarity

/** Properties of the round-5 operators (q61-q68). The oracle pins engine
  * parity; these pin the semantics a consumer relies on — coverage,
  * determinism, boundary behavior, and the exactness claims the
  * portability contract rests on.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("propsExtract: both JSON parse paths agree, counts cover every event") {
    val rows = Q.propsExtract(spark, sf)
      .select("n", "parse_agree").as[(Long, Boolean)].collect()
    assert(rows.forall(_._2), "get_json_object and from_json disagreed")
    val total = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_._1).sum == total, "per-type counts must partition the table")
  }

  test("ngramCounts: top-100 ordered, doc freq bounded by occurrences") {
    val rows = Q.ngramCounts(spark, sf)
      .select("gram", "n_occurrences", "n_docs").as[(String, Long, Long)].collect()
    assert(rows.length <= 100)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq, "not sorted by count desc")
    rows.foreach { case (g, occ, docs) =>
      assert(docs >= 1 && docs <= occ, s"gram '$g': n_docs $docs vs n_occurrences $occ")
    }
  }

  test("ngramCounts plans as TakeOrderedAndProject (no global sort)") {
    val plan = Q.ngramCounts(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-K operator, got:\n$plan")
  }

  test("valueHistogram: buckets partition the table, bounds tile the range") {
    val rows = Q.valueHistogram(spark, sf)
      .select("bucket", "bucket_lo", "bucket_hi", "n")
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    val total = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_._4).sum == total, "bucket counts must partition the table")
    rows.foreach { case (b, lo, hi, _) =>
      assert(b >= 0 && b < 20)
      assert(lo < hi, s"bucket $b: empty range [$lo, $hi)")
    }
    rows.sliding(2).foreach {
      case Array((b1, _, hi1, _), (b2, lo2, _, _)) if b2 == b1 + 1 =>
        assert(math.abs(hi1 - lo2) < 1e-9, s"buckets $b1/$b2 bounds don't tile")
      case _ => ()
    }
  }

  test("session_window boundary: an event exactly gap-after MERGES; gap+1 splits") {
    // pins the semantics the q64 oracle mirrors (is_new when diff > 1800):
    // windows touching at the boundary merge. A=t0, B=t0+1800s (merges with
    // A), C=B+1801s (new session). merge-at-boundary => sizes {2,1};
    // split-at-boundary would give {1,1,1}. A real 1800s gap in sf0.1
    // disambiguated this the hard way (oracle ROWS off by one).
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 7L, "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 01:00:01"), 7L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect().sorted
    assert(sessions.toSeq == Seq(1L, 2L),
      s"expected sessions {A,B} and {C} (exact-gap merges, gap+1 splits), got $sessions")
  }

  test("sessionWindows covers every event; end = last event + gap") {
    val out = Q.sessionWindows(spark, sf)
      .select("n_events", "session_start", "session_end")
      .as[(Long, String, String)].collect()
    val total = graft.io.Tables.events(spark, sf).count()
    assert(out.map(_._1).sum == total, "session event counts must partition the table")
    out.foreach { case (_, st, en) =>
      assert(st < en, "session_end must trail session_start by at least the gap")
    }
  }

  test("saltedJoinAgg equals the plain-join aggregate row-for-row") {
    val li = graft.io.Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = graft.io.Tables.table(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    val plain = li.join(o, "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        graft.ops.CoreOps.sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_revenue"))
      .orderBy("o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    val salted = Q.saltedJoinAgg(spark, sf).as[(String, Long, Double)].collect().toSeq
    assert(salted == plain, "salting changed join semantics")
  }

  test("weightedSample: deterministic, u < keep_prob, higher quality keeps more") {
    val a = Q.weightedSample(spark, sf).as[(Long, Double, Double, Double)].collect().toSeq
    val b = Q.weightedSample(spark, sf).as[(Long, Double, Double, Double)].collect().toSeq
    assert(a == b, "re-run changed the sample")
    a.foreach { case (_, q, u, p) =>
      assert(q >= 0.0 && q <= 1.0)
      assert(p == 0.2 + 0.6 * q)
      assert(u >= 0.0 && u < p)
    }
  }

  test("labelCentroids: every label has all 64 dims; mean matches a local replay") {
    val rows = Q.labelCentroids(spark, sf)
      .select("label", "dim", "n_vecs", "centroid")
      .as[(Int, Int, Long, Double)].collect()
    val byLabel = rows.groupBy(_._1)
    byLabel.foreach { case (l, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to 64), s"label $l missing dims")
      assert(g.map(_._3).distinct.length == 1, s"label $l inconsistent n_vecs")
    }
    // bit-exact local replay of the quantized mean for one label, dim 1
    val l0 = byLabel.keys.min
    val vecs = graft.io.Tables.table(spark, sf, "embeddings")
      .filter(col("label") === l0)
      .select(element_at(col("embedding"), 1).cast("double"))
      .as[Double].collect()
    val expect = vecs.map(x => math.floor(x * 1e6 + 0.5)).sum / (1e6 * vecs.length)
    val got = rows.find(r => r._1 == l0 && r._2 == 1).get._4
    assert(got == expect, s"label $l0 dim 1: $got != $expect (quantized mean must be exact)")
  }

  test("quantized k-means: k centroids of full dimension, partition-order independent") {
    val emb = graft.io.Tables.table(spark, sf, "embeddings")
    val c1 = Similarity.kmeansCentroids(emb, dim = 64, k = 10, iters = 1, quantizedMeans = true)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val c2 = Similarity.kmeansCentroids(emb.repartition(7), dim = 64, k = 10, iters = 1,
        quantizedMeans = true)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(c1.map(_._1) == c2.map(_._1))
    assert(c1.forall(_._2.length == 64))
    // THE portability claim: repartitioning must not move a single bit
    assert(c1 == c2, "quantized means changed under repartitioning")
  }

  test("oovRate: fractions in [0,1], tokens partition the stream, vocab covers top terms") {
    val rows = Q.oovRate(spark, sf)
      .select("doc_id", "n_tokens", "n_oov", "oov_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 500)
    rows.foreach { case (id, n, oov, f) =>
      assert(oov >= 0 && oov <= n, s"doc $id: n_oov outside [0, n_tokens]")
      assert(f == oov.toDouble / n.toDouble, s"doc $id: oov_frac not the exact division")
    }
    // 16-of-31 vocab over near-uniform frequencies: OOV must be non-trivial
    assert(rows.exists(_._3 > 0), "no OOV at all — vocab cutoff not exercised")
    assert(rows.exists(r => r._3 < r._2), "everything OOV — vocab join broken")
  }

  test("evaluateAll matches per-table evaluate and runAll collects every failure") {
    import graft.checks._
    val docs = graft.io.Tables.table(spark, sf, "documents")
    val li   = graft.io.Tables.table(spark, sf, "lineitem")
    val suites = Seq(
      docs -> Seq[Check](NoMissing("doc_id"), NoDuplicates("doc_id")),
      li   -> Seq[Check](NoMissing("l_orderkey"), MinAtLeast("l_quantity", 1.0)))
    val concurrent = CheckSuite.evaluateAll(suites)
    val sequential = suites.map { case (df, cs) => CheckSuite.evaluate(df, cs) }
    assert(concurrent == sequential, "concurrent evaluation changed results")
    // runAll aggregates failures ACROSS tables into one exception
    val failing = Seq(
      docs -> Seq[Check](NoFailedRows("all_docs", lit(true))),
      li   -> Seq[Check](NoFailedRows("all_lines", lit(true))))
    val ex = intercept[CheckFailedException](CheckSuite.runAll(failing))
    assert(ex.failures.map(_.check).toSet ==
      Set("failed_rows[all_docs]", "failed_rows[all_lines]"))
  }

  test("kmeansCentroids early exit: moveTol=inf stops after one round, result = iters=1") {
    val emb = graft.io.Tables.table(spark, sf, "embeddings")
    val one = Similarity.kmeansCentroids(emb, dim = 64, k = 10, iters = 1,
        quantizedMeans = true)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    // a huge tolerance declares convergence after round 1 even with iters=5
    val early = Similarity.kmeansCentroids(emb, dim = 64, k = 10, iters = 5,
        quantizedMeans = true, moveTol = Some(Double.MaxValue))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(early == one, "early exit must stop after the first round")
  }

  test("quotaSample: exactly min(quota, stratum size) per source, deterministic") {
    val rows = Q.quotaSample(spark, sf)
      .select("doc_id", "source", "rk").as[(Long, String, Int)].collect()
    val sizes = graft.io.Tables.table(spark, sf, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (src, g) =>
      val expect = math.min(20L, sizes(src))
      assert(g.length == expect, s"source $src: ${g.length} != $expect")
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"source $src ranks not contiguous")
    }
    val again = Q.quotaSample(spark, sf)
      .select("doc_id", "source", "rk").as[(Long, String, Int)].collect()
    assert(rows.sortBy(r => (r._2, r._3)).toSeq == again.sortBy(r => (r._2, r._3)).toSeq)
  }

  test("rangeFrameCounts: trailing-hour counts match a brute-force replay for one user") {
    val rows = Q.rangeFrameCounts(spark, sf)
      .select("user_id", "event_id", "ts_s", "n_last_hour")
      .as[(Long, Long, String, Long)].collect()
    val u = rows.map(_._1).min
    val evs = rows.filter(_._1 == u).map(r => (r._2, java.sql.Timestamp.valueOf(r._3).getTime / 1000, r._4))
    evs.foreach { case (id, ep, n) =>
      val expect = evs.count { case (_, ep2, _) => ep2 >= ep - 3599 && ep2 <= ep }
      assert(n == expect, s"user $u event $id: $n != $expect")
    }
  }

  test("debounceEvents: kept events are >= 60s after their predecessor, firsts survive") {
    val kept = Q.debounceEvents(spark, sf)
      .select("user_id", "event_type", "ts_s").as[(Long, String, String)].collect()
      .groupBy(r => (r._1, r._2))
    val all = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), date_trunc("second", col("ts")).cast("long").as("ep"), col("event_id"))
      .as[(Long, String, Long, Long)].collect().groupBy(r => (r._1, r._2))
    assert(kept.keySet == all.keySet, "every (user, type) group must keep at least its first event")
    // no kept PREDECESSOR pair violates the gap (the filter is vs the raw
    // predecessor, so kept-to-kept gaps can only be larger)
    kept.values.foreach { g =>
      val eps = g.map(r => java.sql.Timestamp.valueOf(r._3).getTime / 1000).sorted
      eps.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= 60, s"kept events $a,$b closer than the debounce gap")
        case _ => ()
      }
    }
  }

  test("revenueShare: shares sum to 1 within each flag and overall") {
    val rows = Q.revenueShare(spark, sf)
      .select("l_returnflag", "revenue", "share_of_flag", "share_of_total")
      .as[(String, Double, Double, Double)].collect()
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "grand-total shares must sum to 1")
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._3).sum - 1.0) < 1e-9, "per-flag shares must sum to 1")
    }
    rows.foreach { case (_, rev, sf_, st) =>
      assert(rev > 0 && sf_ > 0 && sf_ <= 1.0 && st > 0 && st <= 1.0)
    }
  }

  test("ivfTrainedTopK: 5 contiguous ranks per query, deterministic") {
    val out = Q.ivfTrainedTopK(spark, sf)
      .select("query_id", "rank").as[(Long, Int)].collect()
    out.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length), s"query $q ranks not contiguous")
      assert(g.length <= 5)
    }
    val again = Q.ivfTrainedTopK(spark, sf)
      .select("query_id", "rank").as[(Long, Int)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
