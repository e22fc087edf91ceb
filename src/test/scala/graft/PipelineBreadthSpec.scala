package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueryCatalog => Q}

/** Semantics of the round-3 training-pipeline breadth operators
  * (q55-q60). The oracle pins engine parity; these pin the PROPERTIES a
  * consumer relies on (coverage, budgets, determinism, bounds).
  */
class PipelineBreadthSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs covers every token: stride-aligned starts, exact tails") {
    val chunks = Q.chunkDocs(spark, sf)
      .select("doc_id", "chunk_idx", "n_chunk_tokens").as[(Long, Int, Int)]
      .collect().groupBy(_._1)
    val nTokens = Q.packSequences(spark, sf)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    chunks.foreach { case (docId, cs) =>
      val byIdx = cs.sortBy(_._2)
      // contiguous chunk indices from 0
      assert(byIdx.map(_._2).toSeq == byIdx.indices.toSeq, s"doc $docId gap")
      val n = math.max(nTokens(docId), 1L)
      // each chunk's length is exactly the clamped window at its start
      byIdx.foreach { case (_, idx, len) =>
        val start = 1L + 48L * idx
        assert(len == math.min(64L, n - start + 1), s"doc $docId chunk $idx")
      }
      // the start grid reaches the end of the token stream: the last start
      // is within one stride of n, so the final tokens are covered
      val lastStart = 1L + 48L * byIdx.last._2
      assert(lastStart <= n && n - lastStart < 48, s"doc $docId tail mismatch")
    }
  }

  test("packSequences: offsets inside the budget, packs contiguous per source") {
    val rows = Q.packSequences(spark, sf)
      .select("source", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.foreach { case (_, _, _, _, off) =>
      assert(off >= 0 && off < 2048, "pack_offset outside [0, budget)")
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      // pack ids never decrease in doc order, never skip more than the
      // largest doc spans
      sorted.sliding(2).foreach {
        case Array((_, _, _, p1, _), (_, _, n2, p2, _)) =>
          assert(p2 >= p1)
        case _ => ()
      }
      // offset equals running token count mod budget boundary arithmetic
      val cum = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(cum).foreach { case ((_, _, _, pid, off), before) =>
        assert(pid == before / 2048 && off == before - (before / 2048) * 2048)
      }
    }
  }

  test("stratifiedSample is deterministic and respects per-stratum bounds") {
    val a = Q.stratifiedSample(spark, sf).as[(Long, String, Double, Double)].collect().sortBy(_._1)
    val b = Q.stratifiedSample(spark, sf).as[(Long, String, Double, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "re-run changed the sample")
    a.foreach { case (_, source, u, rate) =>
      assert(u >= 0.0 && u < 1.0)
      assert(u < rate)
      val expected = if (Set("src0", "src1", "src2")(source)) 0.25 else 0.75
      assert(rate == expected)
    }
  }

  test("approxDistinctContract holds at test scale") {
    val rows = Q.approxDistinctContract(spark, sf)
      .select("sketch_ok").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }

  test("editDistancePairs: zero distance exactly for identical candidate texts") {
    val docs = graft.io.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val pairs = Q.editDistancePairs(spark, sf)
      .select("doc_a", "doc_b", "edit_dist", "edit_frac")
      .as[(Long, Long, Int, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d, f) =>
      assert(d >= 0 && f >= 0.0 && f <= 1.0)
      assert((d == 0) == (docs(a) == docs(b)), s"pair ($a,$b)")
    }
  }

  test("unpivot emits one row per (flag, metric) with matching wide values") {
    val long = Q.unpivotMetrics(spark, sf)
      .as[(String, String, Double)].collect()
    val flags = long.map(_._1).distinct
    assert(long.length == flags.length * 3)
    val byKey = long.map { case (f, m, v) => (f, m) -> v }.toMap
    val wide = graft.io.Tables.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.ops.CoreOps.sumMoney(col("l_quantity")).as("sum_qty"))
      .as[(String, Double)].collect()
    wide.foreach { case (f, q) => assert(byKey((f, "sum_qty")) == q) }
  }

  test("connectedComponents releases superseded checkpoint blocks") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val v = (1L to 200L).toDF("doc_id")
    val e = (1L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = graft.dedup.Components
      .connectedComponents(e, "doc_a", "doc_b", v, "doc_id")
    out.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // a 199-edge chain runs ~8 rounds × 2 checkpoints; only the FINAL
    // labels frame may remain
    assert(after - before <= 1, s"leaked ${after - before} persisted RDDs")
  }

  test("SQL-registered graft functions reject bad static args clearly") {
    graft.functions.GraftFunctions.register(spark)
    // BIGINT literal works (numeric conversion, not a blind Int cast)
    val ok = spark.sql("SELECT min_window_hash('hello world hello', CAST(8 AS BIGINT)) h")
      .as[Long].head()
    assert(ok != 0L)
    val err = intercept[Exception] {
      spark.sql("SELECT t.x, min_window_hash('abc', t.x) FROM VALUES (4) t(x)").collect()
    }
    assert(err.getMessage.contains("constant integer") ||
           Option(err.getCause).exists(_.getMessage.contains("constant integer")))
  }
}
