package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** N-D Z-order (Morton) clustering — the multi-column generalization of
  * [[Tables.overwriteSorted]]: interleave the bits of min/max-scaled
  * columns and range-partition + sort on the interleaved key. Every
  * output file then covers a small bounding BOX in column space, so
  * parquet footer min/max stats prune files and row groups for range
  * predicates on ANY participating column — single-column sort only
  * skips on the sort column (IoSpec asserts the contrast).
  *
  * BIT DILUTION bounds how far this stretches: a morton key over N
  * columns cuts each dimension into ~F^(1/N) slices across F files, so
  * the per-file span on each column is ~F^(-1/N) of its range. N=2 at
  * F=8 files: ~0.35 per column. N=3: ~0.5. N ≥ log₂F: ~1.0 — no
  * skipping left anywhere; a hierarchical sort would at least keep the
  * lead column tight. Choose z-order for the 2-3 columns the query mix
  * actually ranges over, hierarchical sort when one column dominates
  * (IoSpec's 3-column layout contrast measures exactly this; SCALE.md
  * records the numbers).
  *
  * The z-value is pure `functions._` bit arithmetic (shiftright/and/
  * shiftleft/or, statically unrolled per bit) — whole-stage codegen'd,
  * no UDF. Scaling needs one global min/max stats job (2N scalars).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of N non-negative longs:
    * column j's bit i lands at position i·N + (N−1−j) — column 0 owns
    * the most-significant bit of each round. N·bits ≤ 63.
    */
  def zvalueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1, "zvalueN needs at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc0, (c, j)) =>
      (0 until bits).foldLeft(acc0) { (acc, i) =>
        acc.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j)))
      }
    }
  }

  /** 2-column morton key (a's bit i at 2i+1, b's at 2i). */
  def zvalue2(a: Column, b: Column, bits: Int = 16): Column =
    zvalueN(Seq(a, b), bits)

  /** Min/max-scale a numeric column to [0, 2^bits) as LONG. A constant
    * column (hi == lo) collapses to 0 — every row in one z-slice.
    */
  private def scaled(c: Column, lo: Double, hi: Double, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else {
      val buckets = (1L << bits).toDouble
      least(floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets)),
        lit(buckets - 1)).cast("long")
    }

  /** Write `df` z-ordered on `cols`: one stats job for the global
    * min/max of every column, then morton key → range partition →
    * sort-within → drop the key. `partitions` files (± skew in the z
    * distribution). `bits` ≤ 0 picks the widest per-column width that
    * fits 63 key bits, capped at 16.
    */
  def overwriteZOrdered(df: DataFrame, path: String, cols: Seq[String],
                        partitions: Int, bits: Int): Unit = {
    // Two jobs read `df` (stats, then the write): persist so a costly or
    // non-deterministic upstream evaluates once and both jobs see the SAME
    // rows — stats disagreeing with the written data would skew or
    // degenerate the z-layout. (Best-effort snapshot: an evicted block
    // recomputes; pass a checkpointed frame for a hard guarantee.)
    val mat = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeZOrdered(mat, path, cols, partitions,
      if (bits > 0) bits else math.min(16, 63 / cols.length))
    finally { mat.unpersist(); () }
  }

  /** 2-column compatibility entry point. */
  def overwriteZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                        partitions: Int, bits: Int = 16): Unit =
    overwriteZOrdered(df, path, Seq(colA, colB), partitions, bits)

  private def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                            partitions: Int, bits: Int): Unit = {
    val r = df.agg(
      cols.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
      cols.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*).head()
    // null stats (empty frame / all-null column) degrade to a constant
    // z-slice — the write still succeeds with whatever rows exist
    def d(i: Int): Double = r.get(i) match {
      case n: java.lang.Number => n.doubleValue
      case _                   => 0.0
    }
    val z = zvalueN(
      cols.zipWithIndex.map { case (c, j) =>
        scaled(col(c), d(2 * j), d(2 * j + 1), bits)
      }, bits)
    df.withColumn("__zorder", z)
      .repartitionByRange(partitions, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
