package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: print [[graft.ops.ShapeDispatch]]'s probe statistics
  * and resulting shape choice for EVERY dial at each given SF directory
  * — the on-the-record receipt that the dispatcher picks the window
  * shape at gate SFs and crosses to the ranged shape where the
  * committed A/Bs measured the crossovers.
  *
  *   runMain graft.tools.ShapeChoice <sfDir> [<sfDir> ...]
  *
  * Dials, with the exact stats frame each driver query dispatches on:
  *  - rank (q53/q170): lineitem by l_returnflag, rows-per-group cutover
  *  - equidepth (q129/q171): same grouping, same cutover (the histogram's
  *    rank pass IS the rank dial)
  *  - percentile (q36/q166): max per-group approx-distinct over BOTH
  *    value columns (l_quantity, l_extendedprice), distinct cutover
  *  - topk (q137/q172): the per-(flag, part) revenue AGGREGATE frame —
  *    the dial sees parts-per-flag, which grows with the part table,
  *    not the fact table
  */
object ShapeChoice {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sd = graft.ops.ShapeDispatch
    for (dir <- dirs) {
      val li = graft.io.Tables.table(spark, dir, "lineitem")

      val rank = sd.probeStats(li.select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"))
      println(s"[shape:rank] dir=$dir rows=${rank.rows} groups=${rank.groups} " +
        s"maxRowsPerGroup=${rank.maxRowsPerGroup} " +
        s"cutover=${sd.DefaultRowsPerGroupCutover} " +
        s"choice=${sd.decideByRows(rank, sd.DefaultRowsPerGroupCutover)}")

      println(s"[shape:equidepth] dir=$dir rows=${rank.rows} groups=${rank.groups} " +
        s"maxRowsPerGroup=${rank.maxRowsPerGroup} " +
        s"cutover=${sd.DefaultRowsPerGroupCutover} " +
        s"choice=${sd.decideByRows(rank, sd.DefaultRowsPerGroupCutover)}")

      val pct = sd.probeStatsMulti(
        li.select("l_returnflag", "l_quantity", "l_extendedprice"),
        Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"))
      println(s"[shape:percentile] dir=$dir rows=${pct.rows} groups=${pct.groups} " +
        s"maxDistinctPerGroup=${pct.maxDistinctPerGroup} " +
        s"distinctBound=${pct.distinctBound} " +
        s"cutover=${sd.DefaultDistinctPerGroupCutover} " +
        s"choice=${sd.decideByDistinct(pct, sd.DefaultDistinctPerGroupCutover)}")

      val rev = li.groupBy("l_returnflag", "l_partkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
      val topk = sd.probeStats(rev, Seq("l_returnflag"))
      println(s"[shape:topk] dir=$dir rows=${topk.rows} groups=${topk.groups} " +
        s"maxRowsPerGroup=${topk.maxRowsPerGroup} " +
        s"cutover=${sd.DefaultTopKRowsPerGroupCutover} " + // r16: topk's own dial
        s"choice=${sd.decideByRows(topk, sd.DefaultTopKRowsPerGroupCutover)}")

      // ssjoin dial (q142's construction): the pair-space estimate
      // ssJoinPairsAuto decides on, priced for the shape the exact
      // verify would take, against a representative opt-in escape
      // threshold (the default warn level). The receipt shows where the
      // exact join's candidate shuffle enters the pair-bound regime.
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val (_, stoks, prefix, blocks) = graft.dedup.Dedup.prefixCandidates(
        docs, "doc_id", "text", 1, 2, shingleN = 3,
        suffixFilter = false, suffixDepth = 1)
      val vp = graft.dedup.Dedup.planVerify(stoks, prefix, None)
      graft.dedup.Checkpoints.release(blocks)
      val escape = graft.dedup.Dedup.DefaultPairShuffleWarnBytes
      val ssChoice = if (vp.estShuffle > escape) "LshSsJoin" else "ExactSsJoin"
      println(f"[shape:ssjoin] dir=$dir estPairs=${vp.estPairs}%.4g " +
        f"avgTokensPerDoc=${vp.avgSz}%.1f broadcastShape=${vp.takeBroadcast} " +
        f"estShuffleBytes=${vp.estShuffle}%.4g escapeBytesIfOptedIn=$escape " +
        s"choice=$ssChoice")
    }
    spark.stop()
  }
}
