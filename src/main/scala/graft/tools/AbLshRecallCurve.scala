package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: measure the LSH escape's RECALL against the banding
  * curve on a corpus built to sit exactly where the contract bites — the
  * borderline band the q142 corpus has no pair mass in (the honest
  * caveat in tools/bench_r15/AB_SSJOIN_ESCAPE.txt: recall 1.0000 there
  * is a property of that corpus's similarity distribution, not of the
  * escape).
  *
  * Corpus: `pairsPerLevel` PLANTED doc pairs at each exact Jaccard level
  * s ∈ {1/2, 11/20, 3/5, 7/10}. Each pair is two docs of equal token
  * count m sharing exactly i tokens with i/(2m−i) = s held in integers
  * (m=60,i=40 → 0.50; m=62,i=44 → 0.55; m=60,i=45 → 0.60; m=68,i=56 →
  * 0.70); every token string is namespaced to its (level, pair, side),
  * so cross-pair Jaccard is 0 and the planted pairs are EXACTLY the
  * ground truth at threshold 1/2 (verified against the exact join each
  * run). shingleN=1: the verified sets are the word sets themselves, so
  * the planted similarity is exact by construction.
  *
  * For each rowsPerBand r (b = 32/r bands at the native minhash_sig
  * ceiling k=32), per level the tool prints measured recall (true
  * positives only — false positives are subtracted AND required to be
  * zero), the banding-curve prediction 1−(1−s^r)^b, the binomial
  * standard error at n=pairsPerLevel, and the z-score of the gap.
  * Round16Spec pins the same construction at one level in-suite.
  *
  *   runMain graft.tools.AbLshRecallCurve [pairsPerLevel] [rList]
  */
object AbLshRecallCurve {

  /** (s as a fraction string, tokens per doc, shared tokens). */
  val Levels: Seq[(Double, Int, Int)] = Seq(
    (0.50, 60, 40), (0.55, 62, 44), (0.60, 60, 45), (0.70, 68, 56))

  /** Deterministic planted corpus: ids encode (level, pair, side) as
    * level·10^7 + pair·10 + side, so the expected pair list is
    * (id_a = base, id_b = base+1) for every planted pair. */
  def plantedDocs(spark: SparkSession, pairsPerLevel: Int): DataFrame = {
    val rows = for {
      (li, (s, m, share)) <- Levels.zipWithIndex.map(_.swap)
      p <- 0 until pairsPerLevel
      side <- 0 to 1
    } yield {
      require(math.abs(share.toDouble / (2 * m - share) - s) < 1e-12,
        s"level $s: i/(2m-i) must equal s exactly")
      val shared = (0 until share).map(j => s"L${li}p${p}s$j")
      val own = (0 until (m - share)).map(j => s"L${li}p${p}x${side}d$j")
      (li.toLong * 10000000L + p.toLong * 10L + side,
        (shared ++ own).mkString(" "))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(32)
  }

  def predictedRecall(s: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  def main(args: Array[String]): Unit = {
    val pairsPerLevel = args.headOption.map(_.toInt).getOrElse(1000)
    val rList = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(4, 2, 1))
    val threads = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = plantedDocs(spark, pairsPerLevel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[recall] corpus: ${docs.count()} docs, " +
      s"${Levels.size} levels x $pairsPerLevel planted pairs, shingleN=1")

    // ground truth: the exact join must find EXACTLY the planted pairs
    val exact = graft.dedup.Dedup.ssJoinPairsAuto(docs, "doc_id", "text",
      1, 2, shingleN = 1, force = Some(graft.dedup.Dedup.ExactSsJoin))
      .select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected = Levels.size.toLong * pairsPerLevel
    val nExact = exact.count()
    require(nExact == expected,
      s"exact join must recover exactly the planted pairs: $nExact != $expected")
    // level of a pair = doc_a / 10^7 (ids encode it)
    def byLevel(pairs: DataFrame): Map[Int, Long] =
      pairs.groupBy((col("doc_a") / 10000000L).cast("int").as("lvl"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

    for (r <- rList) {
      val b = 32 / r
      val lsh = graft.dedup.Dedup.ssJoinPairsAuto(docs, "doc_id", "text",
        1, 2, shingleN = 1, force = Some(graft.dedup.Dedup.LshSsJoin),
        lshRowsPerBand = r).select("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val falsePos = lsh.exceptAll(exact).count()
      require(falsePos == 0L,
        s"precision-1 contract violated at r=$r: $falsePos false positives")
      val found = byLevel(lsh.intersect(exact))
      for (((s, _, _), li) <- Levels.zipWithIndex) {
        val n = found.getOrElse(li, 0L)
        val meas = n.toDouble / pairsPerLevel
        val pred = predictedRecall(s, r, b)
        val se = math.sqrt(math.max(pred * (1 - pred), 1e-12) / pairsPerLevel)
        val z = (meas - pred) / math.max(se, 1e-12)
        println(f"[recall] s=$s%.2f r=$r b=$b measured=$meas%.4f " +
          f"predicted=$pred%.4f n=$n/$pairsPerLevel se=$se%.4f z=$z%+.2f")
      }
      lsh.unpersist()
    }
    exact.unpersist(); docs.unpersist()
    spark.stop()
  }
}
