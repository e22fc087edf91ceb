package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** 2-D Z-order (Morton) clustering — the multi-column generalization of
  * [[Tables.overwriteSorted]]: interleave the bits of two min/max-scaled
  * columns and range-partition + sort on the interleaved key. Every
  * output file then covers a small bounding BOX in (colA, colB) space,
  * so parquet footer min/max stats prune files and row groups for range
  * predicates on EITHER column — single-column sort only skips on the
  * sort column (IoSpec asserts the contrast). At 100 TB this is the
  * layout that serves both "by order" and "by part" scans off one copy
  * of the data.
  *
  * The z-value is pure `functions._` bit arithmetic (shiftright/and/
  * shiftleft/or, statically unrolled per bit) — whole-stage codegen'd,
  * no UDF. Scaling needs one global min/max stats job (4 scalars).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * a's bit i lands at position 2i+1, b's at 2i. `bits` ≤ 31.
    */
  def zvalue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

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

  /** Write `df` z-ordered on (colA, colB): one stats job for the global
    * min/max, then morton key → range partition → sort-within → drop the
    * key. `partitions` files (± skew in the z distribution).
    */
  def overwriteZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                        partitions: Int, bits: Int = 16): Unit = {
    // Two jobs read `df` (stats, then the write): persist so a costly or
    // non-deterministic upstream evaluates once and both jobs see the SAME
    // rows — stats disagreeing with the written data would skew or
    // degenerate the z-layout. (Best-effort snapshot: an evicted block
    // recomputes; pass a checkpointed frame for a hard guarantee.)
    val mat = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeZOrdered(mat, path, colA, colB, partitions, bits)
    finally { mat.unpersist(); () }
  }

  private def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                            partitions: Int, bits: Int): Unit = {
    val r = df.agg(min(col(colA)), max(col(colA)), min(col(colB)), max(col(colB))).head()
    // null stats (empty frame / all-null column) degrade to a constant
    // z-slice — the write still succeeds with whatever rows exist
    def d(i: Int): Double = r.get(i) match {
      case n: java.lang.Number => n.doubleValue
      case _                   => 0.0
    }
    val z = zvalue2(
      scaled(col(colA), d(0), d(1), bits),
      scaled(col(colB), d(2), d(3), bits), bits)
    df.withColumn("__zorder", z)
      .repartitionByRange(partitions, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
