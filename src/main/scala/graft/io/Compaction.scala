package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse `OPTIMIZE` scheduling
  * step: given a file listing (one row per file with its size), group
  * contiguous files into rewrite bins of ~`targetBytes` so each
  * compaction task writes one right-sized output file. Planning is pure
  * metadata work: the input is the file LISTING, never the data.
  *
  * Packing rule: within each partition group, files in id order are
  * assigned `bin = cumulative-size-before-this-file DIV targetBytes` —
  * the standard streaming first-fit that every engine replays
  * identically (integer arithmetic only). A bin may overflow by at most
  * one file, the usual compaction contract (a file is never split).
  *
  * Scale: the window partitions by the GROUP column (a partition
  * directory compacts independently), so each cumulative sum is
  * group-sized; listings are O(files), not O(rows).
  */
object Compaction {

  def plan(files: DataFrame, groupCol: String, idCol: String,
           sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(groupCol).orderBy(asc(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before DIV ${targetBytes}L").cast("int"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_bytes"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
  }
}
