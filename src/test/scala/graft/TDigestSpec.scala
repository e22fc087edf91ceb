package graft

import org.apache.spark.sql.functions._
import graft.functions.{TDigest, TDigestPercentiles}

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private def rankError(values: Array[Double], estimate: Double, p: Double): Double = {
    val n = values.length
    val below = values.count(_ < estimate)
    val atOrBelow = values.count(_ <= estimate)
    val target = p * n
    // distance from the target rank to the estimate's true rank interval
    math.max(0.0, math.max(below + 1 - target, target - atOrBelow)) / n
  }

  test("local digest: rank error within 6/compression on uniform, normal-ish and skewed data") {
    val rng = new scala.util.Random(42)
    val dists = Seq(
      "uniform" -> Array.fill(50000)(rng.nextDouble() * 100),
      "gauss"   -> Array.fill(50000)(rng.nextGaussian() * 10 + 50),
      "skewed"  -> Array.fill(50000)(math.exp(rng.nextGaussian() * 2)), // lognormal
      "heavy-dup" -> Array.fill(50000)(math.floor(rng.nextDouble() * 5)) // 5 distinct values
    )
    for ((name, xs) <- dists; comp <- Seq(100, 200)) {
      val d = new TDigest(comp)
      xs.foreach(d.add)
      for (p <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val err = rankError(xs, d.quantile(p), p)
        assert(err <= 6.0 / comp, s"$name comp=$comp p=$p: rank error $err")
      }
    }
  }

  test("merge preserves the error bound and total weight (simulated 32 partitions)") {
    val rng = new scala.util.Random(7)
    val xs = Array.fill(64000)(math.exp(rng.nextGaussian()))
    val parts = xs.grouped(2000).toSeq
    val digests = parts.map { chunk => val d = new TDigest(200); chunk.foreach(d.add); d }
    val merged = digests.reduce { (a, b) => a.mergeWith(b); a }
    assert(merged.totalWeight == xs.length.toDouble)
    for (p <- Seq(0.01, 0.5, 0.99)) {
      val err = rankError(xs, merged.quantile(p), p)
      assert(err <= 6.0 / 200, s"merged p=$p: rank error $err")
    }
  }

  test("serialization round-trips: identical quantiles after toBytes/fromBytes") {
    val d = new TDigest(100)
    (1 to 10000).foreach(i => d.add(i.toDouble))
    val back = TDigest.fromBytes(d.toBytes)
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      assert(d.quantile(p) == back.quantile(p), s"p=$p drifted through serialization")
    assert(back.totalWeight == d.totalWeight)
  }

  test("empty and single-value digests") {
    val e = new TDigest(100)
    assert(e.isEmpty && e.quantile(0.5).isNaN)
    val one = new TDigest(100)
    one.add(42.0)
    assert(one.quantile(0.0) == 42.0 && one.quantile(0.5) == 42.0 && one.quantile(1.0) == 42.0)
  }

  test("aggregate: Column and SQL surfaces agree with each other and honor the contract") {
    graft.functions.GraftFunctions.register(spark)
    val li = graft.io.Tables.table(spark, sf, "lineitem")
    val viaSql = li.groupBy("l_returnflag")
      .agg(expr("t_digest_percentiles(l_quantity, array(0.5D), 200)").as("q"))
      .select(col("l_returnflag"), element_at(col("q"), 1).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaCol = li.groupBy("l_returnflag")
      .agg(TDigestPercentiles.t_digest_percentiles(col("l_quantity"), Seq(0.5), 200).as("q"))
      .select(col("l_returnflag"), element_at(col("q"), 1).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql.keySet == viaCol.keySet)
    // same plan shape, same data, same partitioning => identical estimates
    viaSql.foreach { case (k, v) => assert(v == viaCol(k), s"flag $k: SQL vs Column drift") }
    // contract against the exact values per group
    val exact = li.select("l_returnflag", "l_quantity")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    viaSql.foreach { case (flag, est) =>
      val err = rankError(exact(flag), est, 0.5)
      assert(err <= 6.0 / 200, s"flag $flag: rank error $err")
    }
  }

  test("nulls are ignored; all-null group yields null") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)
    ).toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(expr("t_digest_percentiles(v, array(0.5D), 100)").as("q"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a").isDefined)
    assert(rows("b").isEmpty, "all-null group must aggregate to null")
  }
}
