package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueryCatalog => Q}
import graft.functions.BloomFilters

/** Properties of the round-6 operators (q78-q83). The oracle pins engine
  * parity; these pin the semantics a consumer relies on — interval
  * tiling, fill completeness, the bloom no-false-negative guarantee,
  * numerical agreement with naive reference computations, and the
  * reconstruction contracts.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ---- q78 SCD2 -----------------------------------------------------------

  test("scd2Snapshot: intervals tile, one open row per user, states change") {
    val rows = Q.scd2Snapshot(spark, sf)
      .select("user_id", "state", "version", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Int, String, Option[String], Boolean)].collect()
      .groupBy(_._1)
    rows.foreach { case (uid, hist0) =>
      val hist = hist0.sortBy(_._3)
      assert(hist.map(_._3).toSeq == (1 to hist.length), s"user $uid: versions not dense")
      assert(hist.count(_._6) == 1 && hist.last._6, s"user $uid: open row must be the last version")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid: v${a._3} valid_to != v${b._3} valid_from")
          assert(a._2 != b._2, s"user $uid: consecutive versions share state ${a._2}")
        case _ => ()
      }
      assert(hist.last._5.isEmpty, s"user $uid: current row must have NULL valid_to")
    }
  }

  test("scd2Snapshot compresses: row count = state changes, not events") {
    val nEvents = graft.io.Tables.events(spark, sf).count()
    val nRows = Q.scd2Snapshot(spark, sf).count()
    assert(nRows < nEvents, s"snapshot ($nRows) should be smaller than the event log ($nEvents)")
  }

  // ---- q79 gap fill -------------------------------------------------------

  test("gapFill: per-user days contiguous, fill is last observed value") {
    val rows = Q.gapFill(spark, sf)
      .select("user_id", "day_s", "day_value", "filled_value", "is_gap")
      .as[(Long, String, Option[Double], Option[Double], Boolean)].collect()
      .groupBy(_._1)
    rows.foreach { case (uid, days0) =>
      val days = days0.sortBy(_._2)
      // contiguous: n rows == span between first and last day
      val d0 = java.time.LocalDate.parse(days.head._2)
      val d1 = java.time.LocalDate.parse(days.last._2)
      assert(days.length == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1,
        s"user $uid: spine has holes")
      assert(!days.head._5, s"user $uid: first spine day must be an active day")
      var lastSeen: Option[Double] = None
      days.foreach { case (_, d, dv, fv, gap) =>
        assert(gap == dv.isEmpty, s"user $uid $d: is_gap mislabeled")
        if (dv.isDefined) lastSeen = dv
        assert(fv == lastSeen, s"user $uid $d: filled_value not last observed")
      }
    }
  }

  // ---- q80 bloom ----------------------------------------------------------

  test("BloomFilters: zero false negatives; bounded false-positive rate") {
    val members = (0 until 2000).map(i => s"member_$i").toDF("k")
    val bytes = BloomFilters.build(members, col("k"), expectedItems = 10000, numBits = 1 << 17)
    val fn = members.filter(!BloomFilters.mightContain(bytes, col("k"))).count()
    assert(fn == 0, s"bloom filter produced $fn false negatives")
    val others = (0 until 20000).map(i => s"other_$i").toDF("k")
    val fp = others.filter(BloomFilters.mightContain(bytes, col("k"))).count()
    assert(fp < 1000, s"false-positive rate ${fp / 20000.0} above 5% design bound")
  }

  test("bloomDecontamination: contract holds and flags are deterministic") {
    val rows = Q.bloomDecontamination(spark, sf)
      .select("doc_id", "exact_contaminated", "bloom_ok")
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "bloom_ok must hold on every row (no false negatives)")
    val again = Q.bloomDecontamination(spark, sf)
      .select("doc_id", "exact_contaminated", "bloom_ok")
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "rerun must be identical")
  }

  // ---- q81 correlation ----------------------------------------------------

  test("corrProfile: agrees with naive double computation, values in [-1,1]") {
    val rows = Q.corrProfile(spark, sf)
      .select("col_x", "col_y", "n", "corr").as[(String, String, Long, Double)].collect()
    assert(rows.length == 3)
    val li = graft.io.Tables.table(spark, sf, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount")
      .as[(Double, Double, Double)].collect()
    def naive(xs: Array[Double], ys: Array[Double]): Double = {
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / (math.sqrt(vx) * math.sqrt(vy))
    }
    val byPair = rows.map(r => (r._1, r._2) -> r._4).toMap
    val q = li.map(_._1); val p = li.map(_._2); val d = li.map(_._3)
    assert(math.abs(byPair(("l_quantity", "l_extendedprice")) - naive(q, p)) < 1e-9)
    assert(math.abs(byPair(("l_quantity", "l_discount")) - naive(q, d)) < 1e-9)
    assert(math.abs(byPair(("l_extendedprice", "l_discount")) - naive(p, d)) < 1e-9)
    rows.foreach(r => assert(r._4 >= -1.0 && r._4 <= 1.0))
    rows.foreach(r => assert(r._3 == li.length))
  }

  // ---- q82 boilerplate ----------------------------------------------------

  test("boilerplateStrip: chunk accounting, untouched docs round-trip") {
    val out = Q.boilerplateStrip(spark, sf)
      .select("doc_id", "clean_text", "n_chunks_kept", "n_chunks_dropped")
      .as[(Long, String, Long, Long)].collect()
    val docs = graft.io.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.length == docs.size, "one output row per document")
    out.foreach { case (id, clean, kept, dropped) =>
      val words = docs(id).trim.split("\\s+")
      val total = (words.length - 1) / 10 + 1
      assert(kept + dropped == total, s"doc $id: chunk accounting broken")
      if (dropped == 0)
        assert(clean == words.mkString(" "), s"doc $id: untouched doc must round-trip")
      else
        assert(clean.isEmpty || docs(id).contains(clean.split("\\s+").head),
          s"doc $id: kept text must come from the doc")
    }
    assert(out.exists(_._4 == 0), "fixture should contain untouched docs")
  }

  // ---- q85 dataset mixture --------------------------------------------------

  test("sourceMixture: rate 1.0 passes through, 2.5x repeats 2-3x, 0.5x halves") {
    val out = Q.sourceMixture(spark, sf)
      .select("doc_id", "source", "rate", "rep").as[(Long, String, Double, Int)].collect()
    val bySrc = out.groupBy(_._2)
    val origCounts = graft.io.Tables.table(spark, sf, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    origCounts.foreach { case (src, n) =>
      val rows = bySrc.getOrElse(src, Array.empty)
      val m = src.drop(3).toInt % 3
      m match {
        case 0 => // 0.5x: strict subset, single copies
          assert(rows.length < n && rows.forall(_._4 == 1), s"$src: expected down-sample")
        case 1 => // 1.0x: exact pass-through
          assert(rows.length == n && rows.forall(_._4 == 1), s"$src: expected pass-through")
        case _ => // 2.5x: every doc 2 or 3 copies, dense rep indices
          val perDoc = rows.groupBy(_._1).values.map(_.map(_._4).sorted.toSeq)
          assert(perDoc.forall(r => r == (1 to r.length) && (r.length == 2 || r.length == 3)),
            s"$src: expected 2-3 dense copies per doc")
          assert(rows.length > 2 * n && rows.length < 3 * n, s"$src: got ${rows.length} of $n docs")
      }
    }
  }

  // ---- q86 pagerank ---------------------------------------------------------

  test("pagerank: matches a naive driver replay; isolated docs at teleport rank") {
    val out = Q.pagerankDocs(spark, sf)
      .select("doc_id", "rank").as[(Long, Double)].collect().toMap
    val pairs = Q.minhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val n = out.size.toDouble
    // naive replay with the same quantization
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    var r = out.keys.map(_ -> 1.0 / n).toMap
    (1 to 2).foreach { _ =>
      val sums = sym.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
        math.floor(r(src) / deg(src) * 0.85 * 1e12 + 0.5).toLong
      }.sum).toMap
      r = out.keys.map(id => id -> ((1.0 - 0.85) / n + sums.getOrElse(id, 0L).toDouble / 1e12)).toMap
    }
    out.foreach { case (id, rank) =>
      assert(rank == r(id), s"doc $id: $rank != naive ${r(id)}")
    }
    val teleport = (1.0 - 0.85) / n
    val linked = sym.map(_._1).toSet
    out.foreach { case (id, rank) =>
      if (linked.contains(id)) assert(rank > teleport, s"linked doc $id at teleport rank")
      else assert(rank == teleport, s"isolated doc $id off the teleport rank")
    }
  }

  // ---- q88 point-in-time join -----------------------------------------------

  test("pitEnrichment: every event tagged; state matches its own type off tie-seconds") {
    val rows = Q.pitEnrichment(spark, sf)
      .select("event_id", "user_id", "ts_s", "state", "version")
      .as[(Long, Long, String, String, Int)].collect()
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .as[(Long, Long, String, String)].collect()
    assert(rows.length == ev.length, "every event must be enriched")
    assert(rows.forall(r => r._4 != null && r._5 >= 1), "no event may miss its state")
    // off tie-seconds the in-force state IS the event's own type (a change
    // in the same second can overtake — right-before-left tie order)
    val evByKey = ev.map(e => e._1 -> e).toMap
    val secondsWithManyEvents = ev.groupBy(e => (e._2, e._4)).filter(_._2.length > 1).keySet
    var checked = 0
    rows.foreach { r =>
      val e = evByKey(r._1)
      if (!secondsWithManyEvents.contains((e._2, e._4))) {
        assert(r._4 == e._3, s"event ${r._1}: state ${r._4} != own type ${e._3}")
        checked += 1
      }
    }
    assert(checked > rows.length / 2, "tie-seconds should be the minority")
    // versions never decrease along each user's timeline
    rows.groupBy(_._2).values.foreach { urows =>
      val ordered = urows.sortBy(r => (r._3, r._1))
      assert(ordered.map(_._5).toSeq == ordered.map(_._5).sorted.toSeq,
        "state version must be non-decreasing in event time")
    }
  }

  // ---- q89 incremental ingest -----------------------------------------------

  test("incrementalCandidatePairs: exact recall of the full self-join's cross slice") {
    val docs = graft.io.Tables.table(spark, sf, "documents")
    val existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val incr = graft.dedup.Dedup.incrementalCandidatePairs(existing, incoming, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // full self-join pairs restricted to (existing, incoming) in either slot
    val full = Q.minhashPairs(spark, sf).as[(Long, Long)].collect()
    val crossFromFull = full.flatMap { case (a, b) =>
      (a % 5, b % 5) match {
        case (0, x) if x != 0 => Some((b, a)) // a incoming, b existing
        case (x, 0) if x != 0 => Some((a, b)) // a existing, b incoming
        case _                => None
      }
    }.toSet
    assert(incr == crossFromFull,
      s"incremental path lost/invented candidates: ${incr.diff(crossFromFull).take(3)} / ${crossFromFull.diff(incr).take(3)}")
    // and it never forms existing x existing or incoming x incoming pairs
    assert(incr.forall { case (e, i) => e % 5 != 0 && i % 5 == 0 })
  }

  test("incrementalIngest: flags consistent, kept = neither flag") {
    val rows = Q.incrementalIngest(spark, sf)
      .select("doc_id", "exact_dup", "near_dup", "kept")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._1 % 5 == 0))
    rows.foreach { case (id, ex, near, kept) =>
      assert(kept == (!ex && !near), s"doc $id: kept flag inconsistent")
    }
  }

  // ---- q92 BPE merges --------------------------------------------------------

  test("bpeMerges: symbols reconstruct the word, merges shrink symbol counts") {
    val rows = Q.bpeMerges(spark, sf)
      .select("tok", "freq", "symbols", "n_symbols", "merge1", "merge2")
      .as[(String, Long, String, Int, String, String)].collect()
    assert(rows.length == 15)
    val (m1, m2) = (rows.head._5, rows.head._6)
    assert(m1.length >= 2 && m2.length >= 2 && m1 != m2)
    rows.foreach { case (tok, _, symbols, n, r1, r2) =>
      assert(symbols.split('|').mkString == tok, s"'$tok': symbols don't reconstruct")
      assert(n <= tok.length && n >= 1)
      assert(r1 == m1 && r2 == m2, "merges are global, identical on every row")
      // no un-merged adjacency of merge1's pair may survive in any word
      assert(!symbols.split('|').sliding(2).exists(p =>
        p.length == 2 && p(0) + p(1) == m1 && p(0) == m1.substring(0, p(0).length)
          && m2 != m1), s"'$tok': unapplied merge1 adjacency")
    }
  }

  test("greedy-left merge fold: 'aaa' with pair (a,a) gives [aa, a], not [a, aa]") {
    // pins the fold semantics q92's oracle replays: a freshly merged
    // symbol does NOT immediately re-merge with the next element
    val df = Seq("aaa", "aaaa", "banana").toDF("tok")
      .withColumn("sym", transform(sequence(lit(1), length(col("tok"))),
        i => col("tok").substr(i, lit(1))))
      .withColumn("merged", aggregate(col("sym"), array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0
            && element_at(acc, -1) === lit("a") && x === lit("a"),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit("aa"))))
          .otherwise(concat(acc, array(x)))))
      .select("tok", "merged").as[(String, Seq[String])].collect().toMap
    assert(df("aaa") == Seq("aa", "a"))
    assert(df("aaaa") == Seq("aa", "aa"))
    assert(df("banana") == Seq("b", "a", "n", "a", "n", "a"))
  }

  // ---- q83 int8 quantization ----------------------------------------------

  test("int8Quant: bound holds, range saturated by the max element") {
    val rows = Q.int8Quant(spark, sf)
      .select("vec_id", "n_dims", "max_abs", "q_min", "q_max", "sum_abs_err", "err_bound_ok")
      .as[(Long, Int, Double, Int, Int, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, d, maxAbs, qMin, qMax, err, ok) =>
      assert(ok, s"vec $id: error bound violated")
      assert(qMin >= -127 && qMax <= 127, s"vec $id: q range out of int8")
      assert(err >= 0.0 && err <= d * maxAbs / 254.0 + 1e-9, s"vec $id: err $err above d*maxAbs/254")
      // the max-|x| element quantizes to exactly +/-127
      assert(qMax == 127 || qMin == -127, s"vec $id: scale must saturate one end")
    }
  }
}
