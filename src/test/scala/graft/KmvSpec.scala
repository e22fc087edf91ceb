package graft

import org.apache.spark.sql.functions._
import graft.functions.{KmvState, KmvDistinct}
import graft.functions.KmvDistinct.kmv_distinct

/** The KMV distinct sketch's defining property — the summary is a pure
  * function of the input SET — plus the estimator's accuracy and the
  * exact-below-k degeneration.
  *
  * "Pure function of the set" is what lets q117's oracle match the
  * ESTIMATE bit-exact (vs q59's HLL, where only the error contract
  * crosses engines): k-smallest-distinct doesn't depend on arrival
  * order, duplication, partitioning, or merge shape. The spec asserts
  * that literally: identical structs under 1/4/16/32 partitions and
  * under duplicated input.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val Norm = KmvState.Norm

  /** 52-bit uniform hash of an int id via md5, the q117 convention. */
  private def h52(i: Int): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .take(7).map(b => f"$b%02x").mkString.take(13), 16)

  test("sketch is a pure function of the input set: partitioning and duplication invariant") {
    val ids = (0 until 5000).map(h52)
    val expected = {
      val s = new KmvState(64)
      ids.foreach(s.add)
      (s.size, s.kthHash, s.estimate)
    }
    for (parts <- Seq(1, 4, 16, 32); dup <- Seq(1, 3)) {
      val df = Seq.fill(dup)(ids).flatten.toDF("h").repartition(parts)
      val row = df.agg(kmv_distinct(col("h"), 64).as("kmv")).head().getStruct(0)
      assert((row.getInt(0), row.getLong(1), row.getDouble(2)) == expected,
        s"parts=$parts dup=$dup: sketch not set-pure")
    }
  }

  test("fewer distinct than k: exact count, null kth hash") {
    val ids = (0 until 40).map(h52)
    val df = (ids ++ ids).toDF("h")
    val row = df.agg(kmv_distinct(col("h"), 64).as("kmv")).head().getStruct(0)
    assert(row.getInt(0) == 40 && row.isNullAt(1) && row.getDouble(2) == 40.0)
  }

  test("estimator accuracy: rel err within 5/sqrt(k-2) on random 52-bit hashes") {
    // md5 hashes of sequential ids are as uniform as the estimator assumes
    for ((n, k) <- Seq((20000, 256), (5000, 64), (100000, 1024))) {
      val s = new KmvState(k)
      (0 until n).map(h52).foreach(s.add)
      val err = math.abs(s.estimate - n) / n
      assert(err <= 5.0 / math.sqrt(k - 2.0), s"n=$n k=$k err=$err")
    }
  }

  test("estimate formula is exactly (k-1)/(kth/2^52) — the oracle's two IEEE ops") {
    val s = new KmvState(16)
    (0 until 1000).map(h52).foreach(s.add)
    assert(s.estimate == 15.0 / (s.kthHash.toDouble / Norm))
  }

  test("serialization round-trips the full state") {
    val s = new KmvState(32)
    (0 until 500).map(h52).foreach(s.add)
    val back = KmvState.fromBytes(s.toBytes)
    assert(back.k == 32 && back.size == s.size &&
      back.kthHash == s.kthHash && back.estimate == s.estimate)
  }

  test("SQL surface: kmv_distinct registered and callable") {
    graft.functions.GraftFunctions.register(spark)
    (0 until 2000).map(h52).toDF("h").createOrReplaceTempView("kmv_in")
    val est = spark.sql("SELECT kmv_distinct(h, 128).est FROM kmv_in").head().getDouble(0)
    assert(math.abs(est - 2000) / 2000.0 < 0.5, s"est=$est")
  }

  test("merge keeps the k smallest across states (manual mergeWith)") {
    val a = new KmvState(8)
    val b = new KmvState(8)
    (0 until 100 by 2).map(h52).foreach(a.add)
    (1 until 100 by 2).map(h52).foreach(b.add)
    a.mergeWith(b)
    val all = (0 until 100).map(h52).sorted.take(8)
    val got = {
      val it = a.toBytes
      KmvState.fromBytes(it)
    }
    assert(got.size == 8 && got.kthHash == all.last)
  }
}
