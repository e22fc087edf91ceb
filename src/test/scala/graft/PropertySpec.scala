package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.CoreOps._

/** Property-based invariants (SURVEY.md §5.3) — plain ScalaCheck generators
  * sampled with fixed seeds (scalatest-scalacheck bridge isn't in the
  * offline cache; deterministic seeds beat it for reproducibility anyway).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val token = Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length < 12)

  test("surrogateKey: distinct inputs ⇒ distinct keys (no observed collisions)") {
    for (pairs <- samples(Gen.listOfN(30, Gen.zip(token, token)), 5)) {
      val distinctPairs = pairs.distinct
      val keys = distinctPairs.toDF("a", "b")
        .select(surrogateKey(col("a"), col("b")).as("k"))
        .collect().map(_.getString(0))
      assert(keys.distinct.length == distinctPairs.length)
    }
  }

  test("sumMoney: invariant under repartitioning (associativity)") {
    for (cents <- samples(Gen.listOfN(50, Gen.chooseNum(-10000L, 10000L)), 5)) {
      val df = cents.map(_ / 100.0).toDF("v")
      val a  = df.agg(sumMoney(col("v"))).head().getDouble(0)
      val b  = df.repartition(7).agg(sumMoney(col("v"))).head().getDouble(0)
      assert(a == b)
    }
  }

  test("topK result is always a prefix of the total order") {
    for (xs <- samples(Gen.listOfN(40, Gen.chooseNum(0, 1000)), 5)) {
      val df = xs.zipWithIndex.toDF("v", "id")
      val k = math.min(5, xs.length)
      val got = topK(df, k, desc("v"), asc("id")).collect().map(r => (r.getInt(0), r.getInt(1)))
      val expect = xs.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(k)
      assert(got.toSeq == expect)
    }
  }

  test("dedupKeepLatest output keys are unique and drawn from input") {
    for (rows <- samples(Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100))), 5)) {
      val df  = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i) }.toDF("g", "v", "id")
      val out = dedupKeepLatest(df, Seq("g"), Seq(desc("v"), desc("id")))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      assert(out.map(_._1).distinct.length == out.length, "one row per key")
      assert(out.length == rows.map(_._1).distinct.length, "every key survives")
      val best = rows.zipWithIndex.groupBy(_._1._1).map { case (g, rs) =>
        val (v, i) = rs.map { case ((_, v), i) => (v, i) }.maxBy(identity)
        (g, v, i)
      }.toSet
      assert(out.toSet == best)
    }
  }

  test("scd2Snapshot on random change streams: tiling, dense versions, change compression") {
    val gen = for {
      n    <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 30L), Gen.oneOf("a", "b", "c")))
    } yield rows
    for ((rows, caseIdx) <- samples(gen, 8).zipWithIndex) {
      def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
      val df = rows.zipWithIndex.map { case ((k, s, st), i) => (k, ts(s), st, i.toLong) }
        .toDF("k", "ts", "st", "tie")
      val out = scd2Snapshot(df, "k", "st", "ts", "tie")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
          r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
        .groupBy(_._1)
      // reference: per key, sort by (ts, tie), count state changes
      val ref = rows.zipWithIndex
        .map { case ((k, s, st), i) => (k, s, st, i) }
        .groupBy(_._1).view.mapValues { ks =>
          val ordered = ks.sortBy(r => (r._2, r._4)).map(_._3)
          ordered.foldLeft(List.empty[String]) {
            case (acc, st) if acc.headOption.contains(st) => acc
            case (acc, st) => st :: acc
          }.reverse
        }.toMap
      out.foreach { case (k, hist0) =>
        val hist = hist0.sortBy(_._3)
        assert(hist.map(_._2).toSeq == ref(k), s"case $caseIdx key $k: wrong state sequence")
        assert(hist.map(_._3).toSeq == (1 to hist.length), s"case $caseIdx key $k: versions not dense")
        assert(hist.count(_._6) == 1 && hist.last._6 && hist.last._5.isEmpty)
        hist.sliding(2).foreach {
          case Array(a, b) => assert(a._5.contains(b._4), s"case $caseIdx key $k: intervals don't tile")
          case _           => ()
        }
      }
      assert(out.keySet == ref.keySet)
    }
  }

  test("gapFillDaily on random series: contiguous spine, LOCF fill, exact day sums") {
    val gen = for {
      n    <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 20), Gen.chooseNum(-10000L, 10000L)))
    } yield rows
    for ((rows, caseIdx) <- samples(gen, 8).zipWithIndex) {
      def ts(day: Int) = new java.sql.Timestamp(1700000000000L + day * 86400000L)
      val df = rows.map { case (k, d, cents) => (k, ts(d), cents / 100.0) }.toDF("k", "ts", "v")
      val out = gapFillDaily(df, "k", "ts", "v")
        .collect()
        .map(r => (r.getInt(0), r.getDate(1).toString,
          Option(r.getDecimal(2)).map(_.doubleValue), Option(r.getDecimal(3)).map(_.doubleValue), r.getBoolean(4)))
        .groupBy(_._1)
      val refDaily = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).sum / 100.0).toMap
      out.foreach { case (k, days0) =>
        val days = days0.sortBy(_._2)
        val activeDays = rows.filter(_._1 == k).map(_._2)
        assert(days.length == activeDays.max - activeDays.min + 1,
          s"case $caseIdx key $k: spine not contiguous first-to-last active day")
        var lastSeen: Option[Double] = None
        days.zipWithIndex.foreach { case ((_, _, dv, fv, gap), di) =>
          assert(gap == dv.isEmpty)
          dv.foreach { v =>
            val day = activeDays.min + di
            assert(v == refDaily((k, day)), s"case $caseIdx key $k day $day: sum $v != ${refDaily((k, day))}")
          }
          if (dv.isDefined) lastSeen = dv
          assert(fv == lastSeen, s"case $caseIdx key $k: LOCF broke")
        }
      }
      assert(out.keySet == rows.map(_._1).toSet)
    }
  }

  test("zvalue2: injective on the grid, monotone per axis (locality order)") {
    for (pairs <- samples(Gen.listOfN(60, Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L))), 5)) {
      val df = pairs.toDF("a", "b")
        .select(col("a"), col("b"), graft.io.ZOrder.zvalue2(col("a"), col("b"), 8).as("z"))
      val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      // injective: distinct (a,b) -> distinct z
      assert(rows.toMap.size == pairs.distinct.length)
      // monotone in a with b fixed, and vice versa (morton order property)
      rows.groupBy(_._1._2).values.foreach { g =>
        val sorted = g.sortBy(_._1._1)
        assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq, "z not monotone in a")
      }
      rows.groupBy(_._1._1).values.foreach { g =>
        val sorted = g.sortBy(_._1._2)
        assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq, "z not monotone in b")
      }
    }
  }

  test("asofJoin matches the brute-force reference on random data") {
    val gen = for {
      nL <- Gen.choose(1, 25)
      nR <- Gen.choose(0, 25)
      ls <- Gen.listOfN(nL, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
      rs <- Gen.listOfN(nR, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield (ls, rs)
    for (((ls, rs), caseIdx) <- samples(gen, 8).zipWithIndex) {
      def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
      val left = ls.zipWithIndex.map { case ((k, s), i) => (i.toLong, k, t(s)) }
        .toDF("event_id", "k", "lts")
      val right = rs.zipWithIndex.map { case ((k, s), i) => (1000L + i, k, t(s)) }
        .toDF("rid", "k", "rts")
      val out = asofJoin(left, right, "k", "lts", "rts", "rid", Seq("rid"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // reference: latest rts <= lts on the key; ties by greatest rid
      val rSeq = rs.zipWithIndex.map { case ((k, s), i) => (1000L + i, k, s) }
      val expect = ls.zipWithIndex.map { case ((k, s), i) =>
        val cands = rSeq.filter(r => r._2 == k && r._3 <= s)
        i.toLong -> (if (cands.isEmpty) -1L
                     else cands.maxBy(r => (r._3, r._1))._1)
      }.toMap
      assert(out == expect, s"case $caseIdx: $out vs $expect")
    }
  }

  test("spanDedup == plain-Scala reference on random tiny-vocab corpora (w = 3 and 8)") {
    // tiny vocabulary forces heavy cross-doc duplication: chained
    // islands, whole-doc removals, and windows meeting doc boundaries —
    // the cases the hand fixtures in SpanDedupSpec can only sample
    def reference(docs: Seq[(Long, String)], w: Int) = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
      val wins = toks.toSeq.flatMap { case (id, t) =>
        if (t.length >= w)
          t.sliding(w).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }.toSeq
        else Seq.empty }
      val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val marked = wins.filter(x => dup(x._3))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      docs.map { case (id, _) =>
        val t = toks(id)
        val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
        for (p <- marked.getOrElse(id, Seq.empty)) {
          if (spans.nonEmpty && p <= spans.last._2 + 1) {
            val (s0, e0) = spans.remove(spans.size - 1)
            spans += ((s0, math.max(e0, p + w - 1)))
          } else spans += ((p, p + w - 1))
        }
        val removed = spans.flatMap { case (s0, e0) => s0 to e0 }.toSet
        val kept = t.zipWithIndex.collect { case (tok, i) if !removed(i + 1) => tok }
        id -> ((t.length.toLong, spans.size.toLong, removed.size.toLong,
                removed.size.toDouble / t.length, kept.mkString(" ")))
      }.toMap
    }
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (w <- Seq(3, 8); (texts, caseIdx) <- samples(Gen.listOfN(6, doc), 4).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val got = graft.dedup.Dedup
        .spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))))
        .toMap
      assert(got == reference(docs, w), s"w=$w case $caseIdx diverges from reference")
    }
  }

  test("importanceSelection == plain-Scala reference on random mixed-source corpora") {
    // replicates the full semantics — shingles(2) short-doc convention,
    // md5-prefix bucket ids mod 1024, add-one-smoothed cross-multiplied
    // leaning, instance-fraction score — in ~25 lines of plain Scala
    def md5bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    def reference(docs: Seq[(Long, String, String)]) = {
      val grams = docs.flatMap { case (id, src, text) =>
        val t = text.trim.toLowerCase.split("\\s+").toSeq
        val gs = if (t.length < 2) Seq(t.mkString(" "))
                 else t.sliding(2).map(_.mkString(" ")).toSeq
        gs.map(g => (id, src, md5bucket(g)))
      }
      val byBucket = grams.groupBy(_._3)
      val tc = byBucket.view.mapValues(_.count(_._2 == "src0")).toMap
      val rc = byBucket.view.mapValues(_.count(_._2 != "src0")).toMap
      val T = tc.values.sum.toLong; val R = rc.values.sum.toLong
      val leans = byBucket.keySet.map { b =>
        b -> (BigInt(tc(b) + 1) * BigInt(R + 1024) > BigInt(rc(b) + 1) * BigInt(T + 1024))
      }.toMap
      grams.filter(_._2 != "src0").groupBy(g => (g._1, g._2)).map { case ((id, src), gs) =>
        val n = gs.size.toLong
        val l = gs.count(g => leans(g._3)).toLong
        id -> ((src, n, l, l.toDouble / n, l.toDouble / n > 0.5))
      }
    }
    val word = Gen.oneOf("red", "blue", "green", "gold")
    val src = Gen.oneOf("src0", "src1", "src2", "src3")
    val doc = for {
      n <- Gen.chooseNum(1, 15); ws <- Gen.listOfN(n, word); s0 <- src
    } yield (s0, ws.mkString(" "))
    for ((rows, caseIdx) <- samples(Gen.listOfN(8, doc)
           .suchThat(ds => ds.exists(_._1 == "src0") && ds.exists(_._1 != "src0")), 4)
           .zipWithIndex) {
      val docs = rows.zipWithIndex.map { case ((s0, t), i) => ((i + 1).toLong, s0, t) }
      val dir = java.nio.file.Files.createTempDirectory(s"q168prop$caseIdx").toString
      docs.toDF("doc_id", "source", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.queries.QueryCatalog.importanceSelection(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
        .toMap
      assert(got == reference(docs), s"case $caseIdx diverges from reference")
    }
  }
}
