package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKStructs

/** Round-11 additions: the generic bounded-heap top-k aggregate
  * (topk_structs) behind the doc_ngrams TVF, and the skylineND merge
  * guard-rail.
  */
class Round11Spec extends SparkSpec {

  test("topk_structs == sort-limit on longs, across partitions and merges") {
    val df = spark.range(0, 100000, 1, 32)
      .select((col("id") * 2654435761L % 99991L).as("v"))
    val got = df.select(TopKStructs.topk_structs(col("v"), 25).as("arr"))
      .select(explode(col("arr")).as("v")).collect().map(_.getLong(0)).toSeq
    val want = df.orderBy("v").limit(25).collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("topk_structs struct field order encodes the sort (count DESC, name ASC)") {
    import spark.implicits._
    val df = Seq(("b", 5L), ("a", 5L), ("c", 9L), ("d", 1L), ("e", 9L))
      .toDF("name", "cnt").repartition(4)
    val got = df
      .select(TopKStructs.topk_structs(
        struct((-col("cnt")).as("neg"), col("name"), col("cnt")), 3).as("arr"))
      .select(explode(col("arr")).as("s"))
      .select(col("s.name"), col("s.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("c", 9L), ("e", 9L), ("a", 5L)))
  }

  test("topk_structs keeps at most k entries per buffer and skips nulls") {
    import spark.implicits._
    val df = Seq[java.lang.Long](3L, null, 1L, 2L, null, 0L).toDF("v").repartition(3)
    val got = df.select(TopKStructs.topk_structs(col("v"), 2).as("arr"))
      .head.getSeq[Long](0)
    assert(got == Seq(0L, 1L))
    // fewer rows than k: all non-null rows, ascending
    val small = Seq(7L, 4L).toDF("v")
      .select(TopKStructs.topk_structs(col("v"), 10).as("arr")).head.getSeq[Long](0)
    assert(small == Seq(4L, 7L))
  }
}
