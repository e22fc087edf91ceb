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
}
