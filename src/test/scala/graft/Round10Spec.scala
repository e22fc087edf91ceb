package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Round-10 items: the dense fixture that saturates the ONE-level
  * PPJoin+ suffix bound (the parked r9 question "does a second level
  * show?") and the second recursion level it motivated.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  /** The engine's n=1 gram identity: xxhash64 of the token, then the
    * window fold of that single hash (GramHashes with n = 1). */
  private def gramHash(t: String): Long = {
    val u = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(u, 42L)
  }

  /** K adversarial pairs that SATURATE the depth-1 bound: half-aligned,
    * quarter-misaligned token distributions. Filler tokens are shared by
    * all A-docs (resp. B-docs), so their document frequency is K and the
    * per-pair `shared_i` bridge token (df = 2) sorts FIRST in the global
    * (df, th) order and lands in both prefixes. In filler hash-rank
    * space: A = laLow ∪ laHigh ∪ haLow ∪ haHigh, B = lb ∪ hb laid out as
    *   [laLow | lb | laHigh]  [haLow | hb | haHigh]
    * so HALF of B sits below A's median (depth-1 bound stays ≈ full) but
    * B's halves hug the TOPS of A's quarter ranges (each depth-2 part
    * bound collapses to ~half). With h = 12: depth-1 bound 24 ≥ α = 17
    * survives, depth-2 bound 14 < 17 prunes — while the true Jaccard is
    * 1/(4h+1), far below the 1/2 threshold.
    */
  private def denseFixture(k: Int, h: Int) = {
    require(h % 4 == 0)
    val sorted = (0 until 8 * h).map(i => s"p$i").sortBy(gramHash).take(4 * h)
    val laLow  = sorted.slice(0, h / 2)
    val lb     = sorted.slice(h / 2, 3 * h / 2)
    val laHigh = sorted.slice(3 * h / 2, 2 * h)
    val haLow  = sorted.slice(2 * h, 5 * h / 2)
    val hb     = sorted.slice(5 * h / 2, 7 * h / 2)
    val haHigh = sorted.slice(7 * h / 2, 4 * h)
    (0 until k).flatMap { i =>
      val sh = s"shared$i"
      Seq((2L * i + 1, (sh +: (laLow ++ laHigh ++ haLow ++ haHigh)).mkString(" ")),
          (2L * i + 2, (sh +: (lb ++ hb)).mkString(" ")))
    }.toDF("doc_id", "text")
  }

  test("dense fixture saturates depth 1; depth 2 prunes exactly the adversarial pairs") {
    val k = 8
    val docs = denseFixture(k, h = 12)
    val (c1, _, _, b1) = Dedup.prefixCandidates(docs, "doc_id", "text", 1, 2,
      shingleN = 1, suffixFilter = true, suffixDepth = 1)
    val n1 = c1.count()
    val (c2, _, _, b2) = Dedup.prefixCandidates(docs, "doc_id", "text", 1, 2,
      shingleN = 1, suffixFilter = true, suffixDepth = 2)
    val n2 = c2.count()
    graft.dedup.Checkpoints.release(b1)
    graft.dedup.Checkpoints.release(b2)
    // depth-1 candidates: every A-A and B-B near-dup pair (identical
    // filler sets, J ≈ 0.92) plus the k adversarial A-B pairs the
    // one-level bound cannot see; depth 2 removes EXACTLY those k
    val trueDups = 2L * (k * (k - 1) / 2)
    assert(n1 == trueDups + k,
      s"depth-1 must keep the $k adversarial pairs: got $n1, want ${trueDups + k}")
    assert(n2 == trueDups,
      s"depth-2 must prune exactly the $k adversarial pairs: got $n2, want $trueDups")
    info(s"candidates: depth1=$n1, depth2=$n2 (dropped ${n1 - n2} of $k adversarial)")
  }

  test("depth-2 suffix filter is lossless across random corpora (three seeds)") {
    for (seed <- Seq(5, 17, 29)) {
      val rng = new scala.util.Random(seed)
      val docs = (1 to 50).flatMap { b =>
        val base = (1 to 20).map(_ => s"w${rng.nextInt(40)}").toVector
        Seq((2L * b, base.mkString(" ")),
            (2L * b + 1, base.updated(rng.nextInt(base.size), s"w${rng.nextInt(40)}").mkString(" ")))
      }.toDF("doc_id", "text")
      val off = Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2, shingleN = 1,
          suffixFilter = false)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val d2 = Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2, shingleN = 1,
          suffixFilter = true, suffixDepth = 2)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(d2 == off, s"seed $seed: depth-2 lost or invented pairs " +
        s"(d2=${d2.size} off=${off.size})")
    }
  }

  test("depth 2 subsumes depth 1 on the Zipf corpus (candidates only shrink, pairs identical)") {
    val rng = new scala.util.Random(11)
    val vocabSize = 60
    def zipfWord(): String = {
      val z = (1 to vocabSize).map(1.0 / _).sum
      var u = rng.nextDouble() * z; var r = 1
      while (u > 1.0 / r && r < vocabSize) { u -= 1.0 / r; r += 1 }
      s"w$r"
    }
    val docs = (0 until 40).flatMap { b =>
      val baseWords = (1 to 28).map(_ => zipfWord()).toVector
      (0 until 3).map { v =>
        val w = (0 until v * 2).foldLeft(baseWords)((acc, _) =>
          acc.updated(rng.nextInt(acc.size), zipfWord()))
        ((b * 3 + v + 1).toLong, w.mkString(" "))
      }
    }.toDF("doc_id", "text")
    val (c1, _, _, b1) = Dedup.prefixCandidates(docs, "doc_id", "text", 1, 2,
      shingleN = 3, suffixFilter = true, suffixDepth = 1)
    val n1 = c1.count()
    val (c2, _, _, b2) = Dedup.prefixCandidates(docs, "doc_id", "text", 1, 2,
      shingleN = 3, suffixFilter = true, suffixDepth = 2)
    val n2 = c2.count()
    graft.dedup.Checkpoints.release(b1)
    graft.dedup.Checkpoints.release(b2)
    assert(n2 <= n1, s"depth 2 must subsume depth 1: $n2 > $n1")
    val p1 = Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2, shingleN = 3,
        suffixFilter = true, suffixDepth = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val p2 = Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2, shingleN = 3,
        suffixFilter = true, suffixDepth = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p1 == p2, "verified output must be depth-invariant")
    info(s"Zipf candidates: depth1=$n1, depth2=$n2 " +
      f"(${100.0 * (n1 - n2) / math.max(n1, 1)}%.1f%% further pruned)")
  }
}
