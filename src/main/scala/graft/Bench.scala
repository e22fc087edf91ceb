package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Official numbers run at most local[16] even when the harness offers
    // more cores. This box (Firecracker microVM kernel) has a rotating
    // single-task straggler: one task per ~N stalls 5-10s of wall clock
    // with zero guest-visible CPU contention and gc ~1s — host-side
    // scheduling, not our code. Measured A/B, 3 full sf0.1 runs each,
    // same box, same session caches (medians; "deviant" = a query whose
    // max/min across the runs exceeds 2x):
    //   local[32]               totals 331.6/193.4/152.5  median 193.4s, 23 deviant
    //   local[32]+speculation   totals 327.2/277.9/236.3  median 277.9s, 40 deviant
    //   local[16]               totals 144.8/181.2/128.8  median 144.8s, 14 deviant
    // Speculation LOSES: the duplicate copies add load but the stall is
    // host-side wall-clock, so the re-launched copy stalls just as often.
    // Fewer concurrent threads both lowers the stall hit-rate and shrinks
    // the per-stall damage. Override: SPARK_GRAFT_BENCH_MAX_THREADS.
    val maxThreads = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt
    val threads = math.min(cpus, maxThreads)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has TIMESTAMP(NANOS); read as long, converted in io.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local[32] with 128 GiB: 10MB default starves obvious broadcasts
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet-footer paths so the first timed
    // query doesn't absorb session startup (~5-7s otherwise)
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    // r19: the r18 operator-JIT warmup block (bb7feb8) is REVERTED. Its
    // claimed -40s came from a cross-window comparison; the honest
    // same-window interleaved 3v3 on/off A/B this round
    // (tools/bench_r19/before/ vs tools/bench_r19/warmup_off/, same
    // binary, env-toggled) could not reproduce it: per-query median-sum
    // 215.9s (on) vs 205.3s (off) — OFF faster — while the min-sum says
    // the opposite (179.9 vs 185.6). Two failed reproductions (the final
    // r18 gate's 1.02x and this one) mean the block's effect is not
    // distinguishable from window noise on this box, so the harness goes
    // back to minimal per the r18 VERDICT (item 2).
    // Time a materializing action: the noop sink consumes every output row
    // in full, so projection work is NOT column-pruned away the way it is
    // under count() (Catalyst prunes all columns for a bare count, turning
    // projection-heavy queries into near-empty scans — the r1 bench lie).
    // Sorted (q01..q93) so shared-materialization cost lands on the query
    // that owns it: q02-q05 fill their dim caches, q06 fills the fact, the
    // report queries then read the cache — not on whichever star consumer
    // HashMap iteration happens to put first. Sorted order also drives the
    // session-cache lifecycle: after the LAST consumer of each cache, its
    // blocks are released (QueryCatalog.cacheReleaseAfter) so the storage
    // pool doesn't evict execution memory for the tail queries — the
    // round-5 judge-reproduced 4-12x q80/q81 tail slowdown.
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    }
    val gc0 = gcMillis
    val wall0 = System.nanoTime()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_BENCH_ONLY=q54_dedup_clusters,q100_containment_dups,...
    // runs a comma-named subset — the sf1 scale-validation harness;
    // shared-cache cost then lands on the subset's first sorted consumer.
    // Tokens are EXACT names (Verify's filter semantics — a bare "q16"
    // prefix would also select q160-q169); a trailing `*` opts into
    // prefix matching explicitly (`q142*`). Empty tokens from stray
    // commas are dropped, so "q31," never silently runs the full suite.
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    def selected(name: String): Boolean = only.forall(_.exists(tok =>
      if (tok.endsWith("*")) name.startsWith(tok.dropRight(1)) else name == tok))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failing query must NOT pass silently as a fast time: record the
      // error per query and exit nonzero at the end.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.queries.QueryCatalog.cacheReleaseAfter.get(name)
        .foreach(_.foreach(release => release(spark, sfDir)))
      // the query's result is fully consumed: drop its output-checkpoint
      // blocks now instead of leaving them to ContextCleaner GC
      graft.dedup.Checkpoints.releaseOutputs()
      name -> sec
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // value = sum of sequential per-query wall times (comparable across
    // rounds). gc_sec/wall_sec are diagnostics: gc_sec ≫ 0 or
    // wall_sec ≫ value means the run was GC-bound / box-contended and the
    // per-query numbers carry that noise.
    val diag = s""""wall_sec":${(System.nanoTime() - wall0) / 1e9},"gc_sec":${(gcMillis - gc0) / 1e3}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$diag,"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Full result also lands in a file: the driver's BENCH_r*.json keeps
    // only a truncated stdout tail, which lost q01-q32 in round 5.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
