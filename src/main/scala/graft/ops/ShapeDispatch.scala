package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stat-driven selection between graft's bit-identical DUAL SHAPES —
  * the round-14 productization of what SCALE.md previously documented
  * as manual dials:
  *
  *  1. ranking family — [[CoreOps.windowRankFunctions]] (one exchange,
  *     each group through one task's sort) vs
  *     [[CoreOps.groupedRankFunctions]] (range partition + bookkeeping
  *     broadcast; flat per-task work at any group size, pays a
  *     checkpoint). Committed A/B (tools/bench_r13/AB_q53_forms.txt):
  *     crossover at ~2M rows/group, window 4-6× growth above it.
  *  2. percentiles — the buffering `percentile(...)` aggregate (one
  *     (distinct value → count) entry per group in ONE task at merge,
  *     ~50 B each) vs [[CoreOps.rankedPercentiles]] (order statistics,
  *     no group-sized buffer). The q36 rule: buffer while max distinct
  *     values per group ≲ 10⁷ (≈ 500 MB single-task state).
  *  3. top-k per group — the row_number window filter vs the
  *     `topk_structs` bounded heap (≤ k rows of aggregation state per
  *     group at every node of the partial/merge tree).
  *
  * Selection inputs, in priority order:
  *  - an explicit per-call override (`force`) — the old manual dial;
  *  - the session conf `spark.graft.shape.force` = `window` | `ranged`
  *    (one global switch for A/Bs and regression hunts);
  *  - catalog/CBO statistics when the optimized plan carries a row
  *    count and distinct counts for the group columns (ANALYZE'd
  *    tables; zero probe cost). Catalog stats see AVERAGES, not skew —
  *    so the dials trust them only when decisive under
  *    `spark.graft.shape.catalogSkewHeadroom` ([[trustCatalog]]): an
  *    average within headroom× below the cutover falls through to the
  *    exact probe instead of silently window-shaping a skewed table;
  *  - else ONE probe aggregation: `groupBy(group).count()` reduced to
  *    (rows, groups, max rows per group) — a map-side-combined hash
  *    aggregate plus a bookkeeping-sized second stage, scale-safe at
  *    any corpus size and exact on the statistic that actually
  *    matters (the LARGEST group, which is what straggles).
  *
  * Both sides of every dial are bit-identical (Round12/13/14Spec pins
  * + the q36/q166 and q53/q170 driver-query pairs under shared DuckDB
  * oracles), so dispatch can never change values — only plan shape.
  */
object ShapeDispatch {

  sealed trait Shape
  /** many small groups: plain window / buffering aggregate. */
  case object WindowShape extends Shape
  /** few huge groups: ranged ranks / order-statistic percentiles / heap. */
  case object RangedShape extends Shape

  /** Group-cardinality statistics driving the dispatch. `maxRowsPerGroup`
    * is exact from the probe, an average (rows/groups, rounded up) from
    * catalog stats; `maxDistinctPerGroup` additionally bounds the
    * percentile buffer (Long.MaxValue = unknown → fall back to
    * maxRowsPerGroup, which always bounds it from above).
    */
  final case class GroupStats(rows: Long, groups: Long,
                              maxRowsPerGroup: Long,
                              maxDistinctPerGroup: Long,
                              source: String) {
    def distinctBound: Long =
      math.min(maxDistinctPerGroup, maxRowsPerGroup)
  }

  /** rows-per-group cutover for the ranking/top-k dials — default from
    * the committed 3-scale q53 A/B (crossover at sf1 ≈ 2M rows/group). */
  val RowsPerGroupCutoverKey = "spark.graft.shape.rowsPerGroupCutover"
  val DefaultRowsPerGroupCutover: Long = 2L * 1000 * 1000

  /** distinct-values-per-group cutover for the percentile dial — the
    * q36 Scaladoc rule (~50 B per distinct value of single-task
    * aggregation buffer at merge: 10⁷ ≈ 500 MB, the practical ceiling). */
  val DistinctPerGroupCutoverKey = "spark.graft.shape.distinctPerGroupCutover"
  val DefaultDistinctPerGroupCutover: Long = 10L * 1000 * 1000

  /** Session-wide override: "window" | "ranged" (anything else ignored). */
  val ForceKey = "spark.graft.shape.force"

  /** Catalog stats see AVERAGES, not skew — their maxRowsPerGroup is
    * ⌈rows/groups⌉. The r14 ADVICE scenario: an ANALYZE'd table with one
    * dominant group averages below the cutover, auto-picks WindowShape,
    * and recreates the single-task giant-group sort the dispatcher
    * exists to prevent — silently, and ONLY on ANALYZE'd tables. The
    * guard: trust the catalog only when its answer would survive this
    * much multiplicative skew on the window side (estimate × headroom
    * still under the cutover), or when it already mandates the ranged
    * shape (an average above the cutover means the max is above it too —
    * skew only strengthens that verdict). In the undecided band the
    * exact probe runs, same as on un-ANALYZE'd tables. */
  val CatalogSkewHeadroomKey = "spark.graft.shape.catalogSkewHeadroom"
  val DefaultCatalogSkewHeadroom: Long = 10L

  /** The ranking/top-k predicate, pure and spec-testable: the ranged
    * shape exactly when the largest group outruns the cutover. */
  def decideByRows(stats: GroupStats, cutover: Long): Shape =
    if (stats.maxRowsPerGroup > cutover) RangedShape else WindowShape

  /** The percentile predicate: the buffering aggregate is safe while
    * the largest group's DISTINCT value count fits one task's buffer. */
  def decideByDistinct(stats: GroupStats, cutover: Long): Shape =
    if (stats.distinctBound > cutover) RangedShape else WindowShape

  /** The catalog-trust predicate (pure, spec-pinned): a skew-blind
    * average `statValue` is decisive when it already exceeds the
    * cutover (max ≥ average, so the ranged verdict can only be right)
    * or sits at least `headroom`× below it (the window verdict survives
    * headroom-fold skew). Anywhere in between → probe. */
  def trustCatalog(statValue: Long, cutover: Long, headroom: Long): Boolean =
    statValue > cutover || statValue <= cutover / math.max(headroom, 1L)

  private def confLong(df: DataFrame, key: String, dflt: Long): Long =
    df.sparkSession.conf.getOption(key).map(_.toLong).getOrElse(dflt)

  private def confForce(df: DataFrame): Option[Shape] =
    df.sparkSession.conf.getOption(ForceKey).flatMap {
      case "window" => Some(WindowShape)
      case "ranged" => Some(RangedShape)
      case _        => None
    }

  /** Catalog/CBO statistics, when the optimized plan carries them:
    * rowCount plus a distinct count for EVERY group column (missing
    * any → None → probe). groups = min(∏ distinct, rows) — the
    * standard independence estimate; maxRowsPerGroup = ⌈rows/groups⌉
    * (an average: catalog stats cannot see skew — documented trade).
    * maxDistinctPerGroup for a value column is bounded by that
    * column's GLOBAL distinct count when present.
    */
  def catalogStats(df: DataFrame, groupCols: Seq[String],
                   valueCol: Option[String] = None): Option[GroupStats] =
    catalogStatsMulti(df, groupCols, valueCol.toSeq)

  /** [[catalogStats]] over several value columns at once (the q36 shape:
    * one percentile call spanning l_quantity AND l_extendedprice). The
    * distinct bound is the MAX over the columns' global distinct counts
    * — the worst single-column buffer governs — and collapses to
    * unknown (Long.MaxValue) if ANY column lacks catalog stats, since
    * the unknown column might be the worst one. */
  def catalogStatsMulti(df: DataFrame, groupCols: Seq[String],
                        valueCols: Seq[String]): Option[GroupStats] = {
    val st = df.queryExecution.optimizedPlan.stats
    val byName = st.attributeStats.toSeq
      .map { case (attr, cs) => attr.name -> cs }.toMap
    for {
      rc <- st.rowCount
      if rc > 0
      distincts <- {
        val ds = groupCols.map(c => byName.get(c).flatMap(_.distinctCount))
        if (ds.forall(_.isDefined)) Some(ds.map(_.get)) else None
      }
    } yield {
      val prod = distincts.product.max(BigInt(1))
      val groups = prod.min(rc)
      val maxPer = ((rc + groups - 1) / groups).toLong
      val vDistincts = valueCols
        .map(v => byName.get(v).flatMap(_.distinctCount).map(_.toLong))
      val vDistinct =
        if (vDistincts.isEmpty || vDistincts.exists(_.isEmpty)) Long.MaxValue
        else vDistincts.flatten.max
      GroupStats(rc.toLong, groups.toLong, maxPer, vDistinct, "catalog")
    }
  }

  /** ONE probe pass: per-group counts (hash aggregate, map-side
    * combined) reduced to (rows, groups, max rows per group) — and,
    * when `valueCol` is given, the max per-group
    * `approx_count_distinct(value)` (±2%, HLL state per group), the
    * exact statistic the percentile dial needs. Cost: one
    * column-pruned scan + a bookkeeping-sized second stage — the
    * insurance premium against shipping a 33 TB group into one task.
    */
  def probeStats(df: DataFrame, groupCols: Seq[String],
                 valueCol: Option[String] = None): GroupStats =
    probeStatsMulti(df, groupCols, valueCol.toSeq)

  /** [[probeStats]] over several value columns: per group the probe
    * takes the worst column's approx-distinct (still ONE aggregation
    * pass — the HLL sketches ride the same hash aggregate). */
  def probeStatsMulti(df: DataFrame, groupCols: Seq[String],
                      valueCols: Seq[String]): GroupStats = {
    val dCol = valueCols.map(v => approx_count_distinct(col(v))) match {
      case Seq()    => lit(0L)
      case Seq(one) => one
      case many     => greatest(many: _*)
    }
    val per = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), dCol.as("__d"))
    val r = per.agg(sum(col("__n")), count(lit(1)), max(col("__n")),
      max(col("__d"))).head()
    GroupStats(
      rows = if (r.isNullAt(0)) 0L else r.getLong(0),
      groups = r.getLong(1),
      maxRowsPerGroup = if (r.isNullAt(2)) 0L else r.getLong(2),
      maxDistinctPerGroup =
        if (valueCols.isEmpty || r.isNullAt(3)) Long.MaxValue else r.getLong(3),
      source = "probe")
  }

  /** Catalog stats when complete, else the probe — UNGUARDED: trusts a
    * complete catalog unconditionally. The auto dials go through
    * [[guardedStats]] instead, which only trusts the catalog's
    * skew-blind averages when they are decisive either way. */
  def groupStats(df: DataFrame, groupCols: Seq[String],
                 valueCol: Option[String] = None): GroupStats =
    catalogStats(df, groupCols, valueCol)
      .getOrElse(probeStats(df, groupCols, valueCol))

  /** The stats source the auto dials use: catalog stats ONLY when
    * [[trustCatalog]] holds for the statistic the dial decides on
    * (rows-per-group, or the distinct bound when `byDistinct`),
    * else the exact probe. Headroom from
    * `spark.graft.shape.catalogSkewHeadroom` (default 10×). */
  def guardedStats(df: DataFrame, groupCols: Seq[String],
                   valueCols: Seq[String], cutover: Long,
                   byDistinct: Boolean): GroupStats = {
    val headroom = confLong(df, CatalogSkewHeadroomKey, DefaultCatalogSkewHeadroom)
    catalogStatsMulti(df, groupCols, valueCols) match {
      case Some(cs) if trustCatalog(
          if (byDistinct) cs.distinctBound else cs.maxRowsPerGroup,
          cutover, headroom) => cs
      case _ => probeStatsMulti(df, groupCols, valueCols)
    }
  }

  private def choose(df: DataFrame, force: Option[Shape],
                     decideFrom: GroupStats => Shape,
                     stats: => GroupStats): Shape =
    force.orElse(confForce(df)).getOrElse(decideFrom(stats))

  // ---- dial 1: the ranking family ------------------------------------------

  /** [[CoreOps.groupedRankFunctions]] with the shape CHOSEN by the
    * engine: `windowRankFunctions` when every group fits a task,
    * the ranged bookkeeping form when the largest group outruns
    * `spark.graft.shape.rowsPerGroupCutover` (default 2M — the
    * committed q53 crossover). Identical output columns and values
    * either way (spec-pinned); `force`/conf override for callers who
    * know their distribution.
    */
  def rankFunctionsAuto(df: DataFrame, groupCols: Seq[String],
                        peerCols: Seq[String], tieCols: Seq[String],
                        peersUnique: Boolean = false,
                        numPartitions: Int = 0,
                        stats: Option[GroupStats] = None,
                        force: Option[Shape] = None): DataFrame = {
    val cut = confLong(df, RowsPerGroupCutoverKey, DefaultRowsPerGroupCutover)
    choose(df, force, decideByRows(_, cut),
        stats.getOrElse(guardedStats(df, groupCols, Nil, cut,
          byDistinct = false))) match {
      case WindowShape =>
        CoreOps.windowRankFunctions(df, groupCols, peerCols, tieCols)
      case RangedShape =>
        CoreOps.groupedRankFunctions(df, groupCols, peerCols, tieCols,
          peersUnique, numPartitions)
    }
  }

  // ---- dial 2: exact per-group percentiles ---------------------------------

  /** The buffering side of the percentile dial, as
    * [[CoreOps.rankedPercentiles]]' exact contract: one row per group
    * with ≥ 1 non-null value (the aggregate's null row for an all-null
    * group is dropped — the ranked form emits no row there), outputs
    * double. Bit-identical to the ranked form (Round12Spec pins the
    * interpolation arithmetic on q36's shape).
    */
  def bufferPercentiles(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, ps: Seq[Double],
                        outCols: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outCols.length,
      "one output column name per percentile")
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(ps.head)).as(outCols.head),
        ps.tail.zip(outCols.tail).map { case (p, o) =>
          percentile(col(valueCol), lit(p)).as(o) }: _*)
      .filter(col(outCols.head).isNotNull)
  }

  /** Exact per-group percentiles with the shape CHOSEN by the engine:
    * the buffering aggregate while the largest group's distinct-value
    * count fits one task's merge buffer
    * (`spark.graft.shape.distinctPerGroupCutover`, default 10⁷ — the
    * q36 rule), else [[CoreOps.rankedPercentiles]]. The probe measures
    * max per-group `approx_count_distinct(value)` directly; catalog
    * stats bound it by the value column's global distinct count.
    */
  def percentilesAuto(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, ps: Seq[Double],
                      outCols: Seq[String],
                      stats: Option[GroupStats] = None,
                      force: Option[Shape] = None): DataFrame =
    percentilesAutoMulti(df, groupCols,
      Seq(PercentileSpec(valueCol, ps, outCols)), stats, force)

  /** One value column's percentile requests for [[percentilesAutoMulti]]. */
  final case class PercentileSpec(valueCol: String, ps: Seq[Double],
                                  outCols: Seq[String]) {
    require(ps.nonEmpty && ps.length == outCols.length,
      "one output column name per percentile")
  }

  /** [[percentilesAuto]] spanning SEVERAL value columns under one
    * decision (the q36 shape: quantity p50/p90 + price p99 in one
    * call). Window shape: ONE buffering aggregate computes every
    * requested percentile in a single pass — q36's historical plan.
    * Ranged shape: one [[CoreOps.rankedPercentiles]] pass per value
    * column, inner-joined on the group keys — q166's plan. Contract
    * either way: one row per group with ≥ 1 non-null value in EVERY
    * value column (the buffer form drops the aggregate's null outputs;
    * the ranked form's inner join drops the same groups — a group
    * all-null in one column has no order statistics there).
    * The probe measures the WORST column's per-group distinct count,
    * still in one aggregation pass.
    */
  def percentilesAutoMulti(df: DataFrame, groupCols: Seq[String],
                           specs: Seq[PercentileSpec],
                           stats: Option[GroupStats] = None,
                           force: Option[Shape] = None): DataFrame = {
    require(specs.nonEmpty, "at least one percentile spec")
    val cut = confLong(df, DistinctPerGroupCutoverKey,
      DefaultDistinctPerGroupCutover)
    choose(df, force, decideByDistinct(_, cut),
        stats.getOrElse(guardedStats(df, groupCols, specs.map(_.valueCol),
          cut, byDistinct = true))) match {
      case WindowShape =>
        val aggs = specs.flatMap(sp => sp.ps.zip(sp.outCols).map {
          case (p, o) => percentile(col(sp.valueCol), lit(p)).as(o) })
        val keep = specs.map(sp => col(sp.outCols.head).isNotNull)
          .reduce(_ && _)
        df.groupBy(groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
          .filter(keep)
      case RangedShape =>
        specs.map(sp => CoreOps.rankedPercentiles(df, groupCols,
            sp.valueCol, sp.ps, sp.outCols))
          .reduce((a, b) => a.join(b, groupCols))
    }
  }

  /** [[CoreOps.equiDepthHistogram]] with `rangedRanks` CHOSEN by the
    * engine — the same rows-per-group predicate as the ranking dial
    * (the histogram's rank pass is exactly that dial: a per-group
    * window sort vs groupedRowNumber). Output bit-identical either way
    * (Round12Spec pins the two forms on q129's shape).
    */
  def equiDepthHistogramAuto(df: DataFrame, groupCols: Seq[String],
                             valueCol: String, tieCols: Seq[String],
                             buckets: Int,
                             stats: Option[GroupStats] = None,
                             force: Option[Shape] = None): DataFrame = {
    val cut = confLong(df, RowsPerGroupCutoverKey, DefaultRowsPerGroupCutover)
    val shape = choose(df, force, decideByRows(_, cut),
      stats.getOrElse(guardedStats(df, groupCols, Nil, cut,
        byDistinct = false)))
    CoreOps.equiDepthHistogram(df, groupCols, valueCol, tieCols, buckets,
      rangedRanks = shape == RangedShape)
  }

  // ---- dial 3: top-k per group ---------------------------------------------

  /** Top-k rows per group by `orderCols` ascending (encode DESC by
    * negating/inverting the column upstream — the q71 convention),
    * with the shape CHOSEN by the engine:
    *
    *  - window `row_number() ≤ k` when groups are small (one exchange,
    *    group-sized sorts);
    *  - the `topk_structs` bounded heap when the largest group outruns
    *    the rows-per-group cutover: ≤ k rows of aggregation state per
    *    group at every node, never a group-sized sort.
    *
    * Output: the input columns + `rnCol` (int, 1-based). Identical
    * multisets whenever (orderCols) is a total order within each group
    * — with ties both forms carry row_number's declared
    * nondeterminism (the TopKRewrite contract, stated not hidden).
    */
  def topKPerGroupAuto(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[String], k: Int,
                       rnCol: String = "rn",
                       stats: Option[GroupStats] = None,
                       force: Option[Shape] = None): DataFrame = {
    require(k > 0, "k must be positive")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(rnCol),
      s"topKPerGroupAuto: input already carries $rnCol")
    // a group column is constant within its group — ordering by it is
    // meaningless, and the ranged shape's packed struct would collide
    // with the group key on restore. Reject it in BOTH shapes so the
    // two can never diverge structurally on this edge (r14 ADVICE).
    require(orderCols.intersect(groupCols).isEmpty,
      s"topKPerGroupAuto: orderCols ${orderCols.mkString(",")} must not " +
        s"overlap groupCols ${groupCols.mkString(",")}")
    val cut = confLong(df, RowsPerGroupCutoverKey, DefaultRowsPerGroupCutover)
    choose(df, force, decideByRows(_, cut),
        stats.getOrElse(guardedStats(df, groupCols, Nil, cut,
          byDistinct = false))) match {
      case WindowShape =>
        val w = Window.partitionBy(groupCols.map(col): _*)
          .orderBy(orderCols.map(c => asc(c)): _*)
        df.withColumn(rnCol, row_number().over(w)).filter(col(rnCol) <= k)
      case RangedShape =>
        // struct field order encodes the sort (structs compare
        // field-by-field): (order…, rest…) ascending == the window's
        // ORDER BY; payload columns ride along and are restored after
        val rest = df.columns.filterNot(groupCols.contains).toSeq
        val packed = df.groupBy(groupCols.map(col): _*)
          .agg(graft.functions.TopKStructs.topk_structs(
            struct((orderCols ++ rest.filterNot(orderCols.contains))
              .map(col): _*), k).as("__tk"))
        val restAll = orderCols ++ rest.filterNot(orderCols.contains)
        packed
          .select(groupCols.map(col) :+ posexplode(col("__tk")): _*)
          .select(groupCols.map(col) ++
            restAll.map(c => col(s"col.$c").as(c)) :+
            (col("pos") + 1).cast("int").as(rnCol): _*)
          // restore the input column order
          .select(df.columns.toSeq.map(col) :+ col(rnCol): _*)
    }
  }
}
