package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GramHashes

/** The fused native gram-hash loop must be BIT-IDENTICAL to the
  * transform/arrays_zip/xxhash64(struct) composition it replaced — the
  * exactness contract in [[graft.functions.GramHashes]]'s scaladoc.
  * Checked under both evaluation paths (whole-stage codegen on and off)
  * across window sizes, token counts around the short-doc boundary, and
  * a real corpus slice.
  */
class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r10 composed form, kept verbatim as the reference. */
  private def composedGramHashes(tokens: Column, n: Int): Column = {
    val th = transform(tokens, t => xxhash64(t))
    def windowLen = size(th) - (n - 1)
    val shifted = (0 until n).map(k => slice(th, lit(k + 1), windowLen))
    val hashed = transform(arrays_zip(shifted: _*), s => xxhash64(s))
    when(size(th) < n, array(xxhash64(th))).otherwise(hashed)
  }

  private def check(df: org.apache.spark.sql.DataFrame, n: Int): Unit =
    Seq("true", "false").foreach { cg =>
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      try {
        val bad = df
          .select(GramHashes.gram_hashes(col("t"), n).as("native"),
            composedGramHashes(col("t"), n).as("composed"))
          .filter(not(col("native") === col("composed")))
          .count()
        assert(bad == 0L, s"n=$n codegen=$cg: $bad rows diverge")
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }

  test("gram_hashes is bit-identical to the composed form on random token arrays") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      val len = rng.nextInt(20) // 0..19 crosses every short-doc boundary
      Tuple1(Array.fill(len)(s"w${rng.nextInt(30)}"))
    } :+ Tuple1(Array("héllo", "wörld", "日本語", "∑", "x")) // multibyte UTF-8
    val df = rows.toDF("t")
    Seq(1, 2, 3, 5, 8).foreach(n => check(df, n))
  }

  test("gram_hashes matches the composed form on the sf0.001 documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.text.TextOps.tokens(lower(col("text"))).as("t"))
    Seq(3, 8).foreach(n => check(docs, n))
  }

  test("gram_hashes of an empty token array is the whole-array hash singleton") {
    val out = Seq(Tuple1(Array.empty[String])).toDF("t")
      .select(GramHashes.gram_hashes(col("t"), 8).as("g"),
        array(xxhash64(col("t"))).as("ref"))
      .collect().head
    assert(out.getSeq[Long](0) == out.getSeq[Long](1))
  }
}
