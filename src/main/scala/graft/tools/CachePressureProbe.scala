package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r8 item 3: q89_incremental_ingest spiked in 3 of 7 r8
  * continuation runs — the only repeat offender. Hypothesis to rule out:
  * storage-pool pressure from the session caches evicting q89's
  * execution memory. This probe PRIMES every session cache (one consumer
  * of each, none released), prints the storage pool's live block usage,
  * then runs q89 six times and reports the median — the
  * BENCH_STUDY_r07 discipline applied to the one flagged query.
  *
  * Run: `sbt 'runMain graft.tools.CachePressureProbe [sfDir]'`
  */
object CachePressureProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    def noop(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // one consumer per session cache, no releases — worst-case residency
    val primers = Seq(
      "q02_dim_customer",        // star
      "q44_decontamination",     // splitGrams
      "q19_minhash_pairs",       // candidatePairs
      "q54_dedup_clusters",      // components
      "q32_clean_corpus",        // corpus
      "q148_triangle_census",    // rareGramEdges
      "q68_ivf_trained",         // trainedCentroids
      "q125_pq_trained")         // pqIndex (trained)
    primers.foreach { q =>
      val t0 = System.nanoTime()
      noop(q)
      println(f"[prime] $q ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(s"[caches] live entries=${graft.util.SessionScoped.totalEntries}")
    val storage = spark.sparkContext.getRDDStorageInfo
    val totalMem = storage.map(_.memSize).sum
    println(f"[storage] cached_rdds=${storage.length} mem=${totalMem / 1e6}%.1f MB " +
      f"disk=${storage.map(_.diskSize).sum / 1e6}%.1f MB")
    spark.sparkContext.getExecutorMemoryStatus.foreach { case (id, (max, free)) =>
      println(f"[storage] executor=$id max=${max / 1e6}%.1f MB free=${free / 1e6}%.1f MB")
    }

    val times = (1 to 6).map { i =>
      val t0 = System.nanoTime()
      noop("q89_incremental_ingest")
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q89] run$i ${s}%.2fs")
      s
    }
    val med = times.sorted.apply(times.size / 2)
    println(f"[q89] median=${med}%.2fs min=${times.min}%.2fs max=${times.max}%.2fs")
    spark.stop()
  }
}
