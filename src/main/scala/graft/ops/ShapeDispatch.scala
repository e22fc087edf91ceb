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

  /** rows-per-group cutover for the TOP-K dial specifically. The top-k
    * heap has no exchange, no checkpoint and ≤ k rows of state per
    * group at every node — structurally cheaper than the ranked rank
    * shape whose 2M constant it used to borrow — and the r16 boundary
    * receipt (tools/bench_r16/AB_TOPK_BOUNDARY.txt: 4 groups, k=10,
    * 1M/2M/4M/8M rows per group, after the TopKBuffer copy-gate fix)
    * measures the heap at parity at 1M and 2.4–3.1× faster from 2M up
    * while the window form grows with group size. Default 1M: strict
    * `>` keeps small-group frames on the one-exchange window sort,
    * engages the heap from the first scale where it measurably wins. */
  val TopKRowsPerGroupCutoverKey = "spark.graft.shape.topkRowsPerGroupCutover"
  val DefaultTopKRowsPerGroupCutover: Long = 1000L * 1000

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

  /** Conf: memoize [[guardedStats]]' probe result per (session, input
    * plan, group/value columns) — default ON, "false" disables. The
    * probe is a full column-pruned scan; without the memo every auto
    * dial invocation on the same input re-pays it (the r15 sf10 cell
    * measured ~13s of a 41s query — real money at 100×). File
    * overwrites under an unchanged plan invalidate STRUCTURALLY since
    * r17 ([[inputFingerprint]] is part of the key); "false" remains
    * the blanket opt-out, and [[invalidateStats]] the surgical one (a
    * stale entry can only mis-pick the SHAPE — both sides of every
    * dial are bit-identical, so values never change). */
  val StatsCacheKey = "spark.graft.shape.statsCache"

  /** Probe memo, keyed by the ANALYZED plan's canonical semantic hash +
    * the file-leaf fingerprint ([[inputFingerprint]] — overwrites
    * re-probe structurally) + the probed columns, session-scoped (the
    * star/PQ-index lifecycle: entries die with the session, evicted by
    * the context listener). A semantic-hash collision would serve
    * another input's stats — the blast radius is a wrong plan SHAPE,
    * never a wrong value (the dual-shape contract), the same trust
    * level the dials already extend to catalog averages. */
  private val statsCache =
    graft.util.SessionScoped.cache[GroupStats]("shapeStats", _ => ())

  /** Probe invocations since JVM start (spec surface: Round16Spec pins
    * that a second auto-dial call on the same input runs ZERO probes). */
  private[graft] val probeInvocations = new java.util.concurrent.atomic.AtomicLong

  private def statsCacheOn(df: DataFrame): Boolean =
    // case-insensitive like Spark's own boolean confs (r17 ADVICE:
    // exact-lowercase-only was a compat regression vs `.toBoolean`);
    // still fails loud on anything that isn't a boolean spelling
    df.sparkSession.conf.getOption(StatsCacheKey).map(_.toLowerCase) match {
      case None | Some("true") => true
      case Some("false")       => false
      case Some(other) => throw new IllegalArgumentException(
        s"$StatsCacheKey must be 'true' or 'false', got '$other'")
    }

  /** Fingerprint of the plan's file-source leaves: per leaf the file
    * count, total bytes, max modificationTime and a hash of the file
    * paths — all read from the FileIndex's ALREADY-CACHED listing (the
    * plan paid it at analysis; this is a driver-side fold over file
    * statuses, no filesystem calls). Folding this into [[statsCacheKey]]
    * makes the memo's staleness STRUCTURAL (r16 VERDICT advisory #1):
    * overwriting the input files under a semantically unchanged plan
    * changes the fingerprint (new part-file UUIDs at minimum), so the
    * next auto-dial call re-probes instead of serving stale stats.
    * Non-file leaves (in-memory relations, streaming sources)
    * contribute nothing — their stats cannot go stale under the same
    * plan. The "no filesystem calls" claim is enforced structurally
    * (r17 ADVICE): only PartitioningAwareFileIndex (whose `allFiles()`
    * serves the cached listing paid at analysis) is fingerprinted;
    * any other FileIndex subtype (e.g. CatalogFileIndex, which would
    * run a full partition listing per call) contributes a constant —
    * those callers get the pre-r17 behavior (memo keyed on plan
    * semantics only, `invalidateStats()` for overwrites). Paths are
    * hashed order-insensitively (r17 ADVICE: listing order is not a
    * staleness signal; a re-list in a different order must not
    * re-probe). The residual caveat is Spark's own: a caller reusing
    * the SAME DataFrame object across an overwrite reads through its
    * cached FileIndex listing (stale scan AND stale fingerprint) until
    * `spark.catalog.refreshByPath` — an engine-wide Spark contract,
    * not a memo one. */
  private[graft] def inputFingerprint(df: DataFrame): String = {
    import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}
    def fpOf(idx: FileIndex): String = idx match {
      case p: PartitioningAwareFileIndex =>
        val fs = p.allFiles()
        val mt = if (fs.isEmpty) 0L else fs.iterator.map(_.getModificationTime).max
        val ph = scala.util.hashing.MurmurHash3.unorderedHash(
          fs.iterator.map(_.getPath.toString))
        s"${fs.size}:${fs.iterator.map(_.getLen).sum}:$mt:$ph"
      case _ => "nocache" // no cached listing: never pay a live list per memo lookup
    }
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => fpOf(h.location)
        case _                   => ""
      }
      case d: DataSourceV2Relation => d.table match {
        case ft: FileTable => fpOf(ft.fileIndex)
        case _             => ""
      }
    }.filter(_.nonEmpty).mkString(";")
  }

  private[graft] def statsCacheKey(df: DataFrame, groupCols: Seq[String],
                                   valueCols: Seq[String]): String =
    s"${df.queryExecution.analyzed.semanticHash()}|f=${inputFingerprint(df)}" +
      s"|g=${groupCols.mkString(",")}|v=${valueCols.mkString(",")}"

  /** Drop the memoized probe entry for exactly this (input plan,
    * columns) — the surgical alternative to `statsCache=false` for a
    * caller who mutated an input mid-session and wants ONE entry gone
    * instead of the memo off globally (r16 ADVICE). A no-op when no
    * entry exists. File overwrites are already invalidated structurally
    * by [[inputFingerprint]]; this covers the rest (e.g. an appended
    * in-place mutation the caller knows about before re-reading). */
  def invalidateStats(df: DataFrame, groupCols: Seq[String],
                      valueCols: Seq[String] = Nil): Unit =
    statsCache.invalidate(df.sparkSession,
      statsCacheKey(df, groupCols, valueCols))

  /** The stats source the auto dials use: catalog stats ONLY when
    * [[trustCatalog]] holds for the statistic the dial decides on
    * (rows-per-group, or the distinct bound when `byDistinct`),
    * else the exact probe — memoized per (session, plan, columns)
    * unless `spark.graft.shape.statsCache=false`. Headroom from
    * `spark.graft.shape.catalogSkewHeadroom` (default 10×). */
  def guardedStats(df: DataFrame, groupCols: Seq[String],
                   valueCols: Seq[String], cutover: Long,
                   byDistinct: Boolean): GroupStats = {
    val headroom = confLong(df, CatalogSkewHeadroomKey, DefaultCatalogSkewHeadroom)
    catalogStatsMulti(df, groupCols, valueCols) match {
      case Some(cs) if trustCatalog(
          if (byDistinct) cs.distinctBound else cs.maxRowsPerGroup,
          cutover, headroom) => cs
      case _ =>
        def probed = { probeInvocations.incrementAndGet()
          probeStatsMulti(df, groupCols, valueCols) }
        if (statsCacheOn(df))
          statsCache.getOrElseUpdate(df.sparkSession,
            statsCacheKey(df, groupCols, valueCols))(probed)
        else probed
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
    // fail loud like CoreOps.rankedPercentiles' own require: an
    // out-of-range p would put __pos outside [0, n-1], miss both
    // rank-lookup joins, null the pivoted column and silently drop
    // every group through the keep filter (r16 ADVICE)
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentiles in [0,1]: $ps")
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
        // one rankedPercentiles pass per value column + join — MEASURED
        // as the right default (r16): each pass's scan is column-pruned,
        // so the per-column "duplicated upstream" costs ~nothing on
        // columnar inputs, and the melted one-exchange alternative
        // ([[rankedPercentilesFused]]) moves the same shuffle bytes
        // (+6%) and the same scan bytes (+8%) while only halving the
        // job count (tools/bench_r16/AB_MULTIPCT_FUSION.txt). Callers
        // whose INPUT LINEAGE is expensive per evaluation (heavy
        // compute, non-prunable row-oriented checkpoints) should call
        // the fused form directly — it evaluates that lineage once.
        // The reduce-join is NULL-SAFE on the group keys (r16 ADVICE):
        // a USING join drops null-key groups, but groupBy keeps them —
        // both sibling shapes (buffered aggregate, fused melt) emit the
        // null-key group, so the per-column form must too.
        specs.map(sp => CoreOps.rankedPercentiles(df, groupCols,
            sp.valueCol, sp.ps, sp.outCols))
          .reduce { (a, b) =>
            val r = b.select(groupCols.map(c => col(c).as(s"__rg_$c")) ++
              b.columns.filterNot(groupCols.contains).map(col): _*)
            val cond = groupCols.map(c => a(c) <=> r(s"__rg_$c")).reduce(_ && _)
            a.join(r, cond).drop(groupCols.map(c => s"__rg_$c"): _*)
          }
    }
  }

  /** The ranged percentile shape over SEVERAL value columns in ONE
    * ranked pass: the value columns MELT into (group…, __spec, __v)
    * long form — numSpecs× the rows, two narrow columns — and a single
    * [[CoreOps.groupedRowNumberAndTotals]] pass keyed by (group…, spec)
    * ranks them all: one range exchange, one bookkeeping aggregate, one
    * broadcast rank-lookup chain, and — the property that matters — the
    * INPUT LINEAGE evaluated once instead of once per column.
    *
    * NOT the dial's default, on the record (r16,
    * tools/bench_r16/AB_MULTIPCT_FUSION.txt): the r15 advisory's
    * premise was that the per-column form "pays one full ranked pass
    * per value column", but on columnar inputs each of those passes is
    * COLUMN-PRUNED — measured at sf1, the q166 shape reads 2,401 MB
    * under the per-column form vs 2,592 MB melted and shuffles 149 vs
    * 158 MB, so this form moves slightly MORE data and only halves the
    * job count (26 → 13). Reach for it when the shared upstream is
    * genuinely expensive per evaluation — heavy per-row compute, a
    * non-prunable row-oriented materialization — where "lineage × once"
    * beats "pruned scan × numSpecs". MEASURED r17 on a sha2-chain
    * upstream feeding both value columns: the fused form costs 0.50×
    * the per-column join's executor CPU (44.2 vs 88.4 min cpuSec, 14
    * vs 28 jobs, the heavy base read once vs twice —
    * tools/bench_r17/AB_MULTIPCT_FUSION_HEAVY.txt).
    *
    * Values are bit-identical to the per-column form (same
    * cast-to-double, same per-(group,spec) rank order statistics, same
    * `Percentile.getPercentile` interpolation arithmetic — the ranks of
    * column A are computed within its own __spec slice, so melting
    * cannot mix columns), and the keep-filter reproduces the inner
    * join's semantics: a group all-null in ANY column has no order
    * statistics there and drops. Round16Spec pins fused ≡ joined ≡
    * buffered on skewed + null-bearing fixtures.
    */
  def rankedPercentilesFused(df: DataFrame, groupCols: Seq[String],
                             specs: Seq[PercentileSpec]): DataFrame = {
    require(specs.sizeIs >= 2, "fused form needs >= 2 specs (use rankedPercentiles)")
    val allOut = specs.flatMap(_.outCols)
    require(allOut.distinct.sizeIs == allOut.size,
      s"output column names must be unique across specs: $allOut")
    // melt: one row per (input row, spec), nulls dropped per slice —
    // exactly the per-column form's pre-rank null filter
    val meltArr = array(specs.zipWithIndex.map { case (sp, i) =>
      struct(lit(i).as("__spec"), col(sp.valueCol).cast("double").as("__v")) }: _*)
    val melted = df
      .select(groupCols.map(col) :+ explode(meltArr).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.__spec").as("__spec") :+
        col("__e.__v").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val gs = groupCols :+ "__spec"
    val (ranked, totals) = CoreOps.groupedRowNumberAndTotals(melted, gs,
      Seq("__v"), rankCol = "__rk", nCol = "__n")
    // per-(group, spec) targets: explode THAT spec's (p, out) list,
    // selected from an array-of-arrays literal by the spec index
    val perSpec = element_at(
      array(specs.map(sp => array(sp.ps.zip(sp.outCols).map { case (p, o) =>
        struct(lit(p).as("__p"), lit(o).as("__out")) }: _*)): _*),
      col("__spec") + 1)
    val targets = totals
      .select(gs.map(col) :+ col("__n") :+ explode(perSpec).as("__e"): _*)
      .select(gs.map(col) :+ col("__n") :+ col("__e.__p").as("__p") :+
        col("__e.__out").as("__out"): _*)
      .withColumn("__pos", (col("__n") - lit(1L)) * col("__p"))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    // targets are |groups|·|specs|·|ps| rows — broadcast side by
    // construction; each attach is a broadcast hash filter-join over
    // the ONE ranked stream (the rankedPercentiles shape, shared here)
    def attach(t: DataFrame, rank0: String, as: String): DataFrame = {
      val r = ranked.select(gs.map(c => col(c).as(s"__r_$c")) :+
        col("__rk").as("__r_rk") :+ col("__v").as(as): _*)
      val cond = gs.map(c => t(c) <=> r(s"__r_$c"))
        .foldLeft(t(rank0) + lit(1L) === r("__r_rk"))(_ && _)
      r.join(broadcast(t), cond)
        .drop("__r_rk")
        .drop(gs.map(c => s"__r_$c"): _*)
    }
    val withLo = attach(targets, "__lo", "__loVal")
    val both = attach(withLo, "__hi", "__hiVal")
    val interp = when(col("__lo") === col("__hi"), col("__loVal"))
      .otherwise((col("__hi") - col("__pos")) * col("__loVal") +
                 (col("__pos") - col("__lo")) * col("__hiVal"))
    val vals = both.withColumn("__val", interp)
    val keep = specs.map(sp => col(sp.outCols.head).isNotNull).reduce(_ && _)
    vals.groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__out") === allOut.head, col("__val"))).as(allOut.head),
        allOut.tail.map(o =>
          max(when(col("__out") === o, col("__val"))).as(o)): _*)
      .filter(keep)
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
    *    `spark.graft.shape.topkRowsPerGroupCutover` (default 1M — the
    *    r16 boundary receipt, this dial's OWN constant since r16: the
    *    heap measured 2.4–3.1× faster from 2M rows/group up once the
    *    copy-gate fix landed, and it has no checkpoint to amortize):
    *    ≤ k rows of aggregation state per group at every node, never a
    *    group-sized sort. The auto decision additionally refuses to
    *    heap a k above `spark.graft.topk.maxK` (the TopKRewrite line:
    *    O(k) inserts and groups×k state stop being "bounded" there —
    *    WindowExec's spillable sort is the safe shape); a forced shape
    *    is the caller's own sizing and bypasses the guard.
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
    val cut = confLong(df, TopKRowsPerGroupCutoverKey,
      DefaultTopKRowsPerGroupCutover)
    // the AUTO decision never heaps a huge k (O(k) insert, groups×k
    // state — the same line TopKRewrite draws); an explicit force is the
    // caller's own sizing and is honored either way. k > maxK decides
    // WindowShape unconditionally, so short-circuit BEFORE touching
    // stats — a cold memo would otherwise pay a full probe scan whose
    // result is predetermined to be ignored (r16 ADVICE).
    val maxK = confLong(df, graft.plans.TopKRewrite.MaxKKey,
      graft.plans.TopKRewrite.DefaultMaxK.toLong)
    (force.orElse(confForce(df)).getOrElse {
      if (k > maxK) WindowShape
      else decideByRows(stats.getOrElse(guardedStats(df, groupCols, Nil,
        cut, byDistinct = false)), cut)
    }) match {
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
