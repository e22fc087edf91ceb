package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column-API surface over Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same pair the
  * optimizer injects for runtime row-group filtering). Spark exposes them
  * in SQL form internally but not on `functions._`, so this bridges them
  * for the decontamination / blocklist scale path: build the filter over
  * the SMALL side once, ship ~numBits/8 bytes to every task as a literal,
  * and scan the BIG side without shuffling it.
  *
  * The filter argument of `mightContain` must be foldable, so the build
  * side necessarily materializes on the driver — a deliberate single-row
  * fetch of a bounded (numBits/8-byte) value, the broadcast-small-side
  * pattern, not a driver-side data loop.
  */
object BloomFilters {

  /** Aggregate expression: bloom filter over xxhash64 of `c` (any type —
    * hashed to a stable 64-bit key first, so the filter never stores raw
    * values). Returns the serialized filter as one BINARY value.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftShim.column(new BloomFilterAggregate(
      GraftShim.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Build the filter over `df`'s `keyCol` and return its serialized bytes.
    * One aggregation job + a single-row driver fetch. Returns NULL when
    * `df` has no rows (Spark's BloomFilterAggregate yields null over zero
    * input) — [[mightContain]] treats that as the empty set.
    */
  def build(df: DataFrame, keyCol: Column, expectedItems: Long, numBits: Long): Array[Byte] =
    df.agg(bloomAgg(keyCol, expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]]("bf")

  /** Probe: true if `c` MIGHT be in the filter (no false negatives; false
    * positives at the filter's design rate). `bytes` rides the plan as a
    * literal — Catalyst broadcasts it with the task binary. A null
    * `bytes` (empty build side) matches nothing.
    */
  def mightContain(bytes: Array[Byte], c: Column): Column =
    if (bytes == null) lit(false)
    else GraftShim.column(BloomFilterMightContain(
      Literal(bytes), GraftShim.expression(xxhash64(c))))
}
