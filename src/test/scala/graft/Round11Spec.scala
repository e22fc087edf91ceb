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

  test("skylineND two-level merge guard (adversarial all-frontier fixture) " +
       "equals the single-merge path") {
    import graft.ops.CoreOps
    // anti-correlated dims: x + y constant ⇒ EVERY point is on the
    // frontier — the worst case for the single-task merge. A tiny
    // maxMergeRows forces the range-blocked re-prune; the frontier set
    // must be identical to the default path's (which Round8Spec pins
    // against brute force).
    val df = spark.range(0, 2000, 1, 8)
      .selectExpr("id", "cast(id as double) as x",
        "cast(1999 - id as double) as y",
        "cast(pmod(id * 37, 101) as double) as z")
    val guarded = CoreOps.skylineND(df, "id", Seq("x", "y"), Seq("z"),
        maxMergeRows = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val default = CoreOps.skylineND(df, "id", Seq("x", "y"), Seq("z"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(guarded == default)
    assert(guarded.size == 2000, "anti-correlated fixture must keep every point")
    // mixed fixture: some dominated points, guard still exact
    val mixed = spark.range(0, 3000, 1, 8)
      .selectExpr("id", "cast(pmod(id * 7919, 997) as double) as x",
        "cast(pmod(id * 104729, 991) as double) as y",
        "cast(pmod(id * 31, 983) as double) as z")
    val g2 = CoreOps.skylineND(mixed, "id", Seq("x", "y"), Seq("z"),
        maxMergeRows = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val d2 = CoreOps.skylineND(mixed, "id", Seq("x", "y"), Seq("z"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(g2 == d2 && g2.size < 3000)
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
