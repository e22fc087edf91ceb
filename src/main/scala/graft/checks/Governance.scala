package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance operators beside [[CheckSuite.kAnonymity]]: the
  * erasure-request impact plan (GDPR right-to-be-forgotten cascade) and
  * the referential-integrity orphan audit. Both are count reports built
  * from semi/anti joins — the key sets flow down the foreign-key chain,
  * the fact tables are never shuffled beyond one key join each, and the
  * outputs are O(tables), so they run as cheap pre-flight gates before
  * the actual delete/repair jobs.
  */
object Governance {

  /** Erasure cascade impact: starting from a root key set (the erasure
    * requests), follow the foreign-key chain and count the rows each
    * table would lose. `levels` = (tableName, df, fkCol matching the
    * PREVIOUS level's keys, pkCol exported to the NEXT level), in chain
    * order. Returns (table_name, n_rows) — the plan a deletion job (or
    * [[graft.ops.CoreOps.mergeInto]] with delete rows) executes.
    */
  def cascadeImpact(rootName: String, rootKeys: DataFrame,
                    levels: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(rootKeys.columns.length == 1, "rootKeys must be a single key column")
    var keys = rootKeys.toDF("__k").distinct()
    val counts = Seq.newBuilder[DataFrame]
    counts += keys.agg(count(lit(1)).as("n_rows"))
      .select(lit(rootName).as("table_name"), col("n_rows"))
    levels.foreach { case (name, df, fkCol, pkCol) =>
      val affected = df.join(keys, df(fkCol) === col("__k"), "left_semi")
      counts += affected.agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"))
      keys = affected.select(col(pkCol).as("__k")).distinct()
    }
    counts.result().reduce(_ unionByName _)
  }

  /** Referential-integrity audit: for each declared (child —fk→ parent)
    * relation, count child rows whose non-null foreign key has no parent
    * (orphans — a broken star schema the inner joins of the transform
    * layer would silently DROP, which is why the audit runs first).
    * Returns (relation, n_orphans); 0 everywhere is the healthy state.
    */
  def orphanCounts(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk)).filter(col(fk).isNotNull)
        .join(parent.select(col(pk).as("__pk")), col(fk) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_orphans"))
    }.reduce(_ unionByName _)

  /** Column profiler: per named column, the ingest-time shape report —
    * row count, null count, exact distinct count, and the MODE (most
    * frequent non-null value, ties broken by smallest value) with its
    * frequency. The one-melt design: every (column, value) pair rides a
    * single explode into ONE grouped count (values stringified so
    * heterogeneous columns share the frame), and all four metrics
    * re-aggregate from that counts frame — one data shuffle total for
    * any number of profiled columns, vs one scan per metric per column
    * in the naive profiler.
    *
    * Mode tie-break is argmax-then-min: max count per column, equi-join
    * back, min value among the tied — three shuffle-bounded aggregations
    * over the (already tiny) counts frame, no window, no single-partition
    * sort, deterministic in any engine. Scale: the counts frame is
    * Σ|distinct values|, the only frame after the one data pass.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("val"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.val").as("val"))
    val counts = pairs.groupBy("col_name", "val").agg(count(lit(1)).as("n"))
    val base = counts.groupBy("col_name").agg(
      sum(col("n")).as("n_rows"),
      coalesce(sum(when(col("val").isNull, col("n"))), lit(0L)).as("n_nulls"),
      count(when(col("val").isNotNull, lit(1))).as("n_distinct"))
    val nonNull = counts.filter(col("val").isNotNull)
    val top = nonNull.select(col("col_name").as("__cn"), col("n"))
      .groupBy("__cn").agg(max(col("n")).as("mode_n"))
    val mode = nonNull.join(top,
        col("col_name") === col("__cn") && col("n") === col("mode_n"))
      .groupBy("col_name", "mode_n").agg(min(col("val")).as("mode_val"))
    base.join(mode, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("mode_val"), col("mode_n"))
  }
}
