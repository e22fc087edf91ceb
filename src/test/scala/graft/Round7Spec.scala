package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueryCatalog => Q}
import graft.sim.Similarity

/** Properties of the round-7 operators (q103-q105). The oracle pins engine
  * parity; these pin semantics against naive driver-side replays — the
  * bigram score against a hash-map language model, SemDeDup's kept/dup
  * partition against an exhaustive within-cell check, and the trained
  * classifier against the least-squares optimality conditions.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ---- q103 bigram predictability ----------------------------------------

  private def naiveBigramScores(): Map[Long, (Long, Double)] = {
    val texts = graft.io.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val docBigrams = texts.map { case (id, text) =>
      val t = text.toLowerCase.trim.split("\\s+").toSeq
      id -> t.zip(t.drop(1))
    }.toMap
    val pairCnt = docBigrams.values.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val headCnt = docBigrams.values.flatten
      .groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    docBigrams.collect { case (id, bgs) if bgs.nonEmpty =>
      val sp = bgs.map(pairCnt).sum
      val sh = bgs.map(b => headCnt(b._1)).sum
      id -> (bgs.size.toLong, sp.toDouble / sh.toDouble)
    }
  }

  test("bigramPredictability: score matches a hash-map bigram LM replay") {
    val out = Q.bigramPredictability(spark, sf)
      .select("doc_id", "n_bigrams", "predictability")
      .as[(Long, Long, Option[Double])].collect()
    val naive = naiveBigramScores()
    assert(out.nonEmpty)
    out.foreach { case (id, n, pred) =>
      naive.get(id) match {
        case Some((nN, pN)) =>
          assert(n == nN, s"doc $id: n_bigrams $n != naive $nN")
          assert(pred.contains(pN), s"doc $id: predictability $pred != naive $pN")
        case None =>
          assert(n == 0L && pred.isEmpty, s"doc $id: unscorable doc must be null-scored")
      }
    }
  }

  test("bigramPredictability: buckets are rank-thirds with doc_id tiebreak") {
    val out = Q.bigramPredictability(spark, sf)
      .select("doc_id", "predictability", "ppl_bucket")
      .as[(Long, Option[Double], Option[String])].collect()
    val scored = out.collect { case (id, Some(p), Some(b)) => (id, p, b) }
    val n = scored.length
    // every scored doc gets exactly one bucket; unscored docs get none
    assert(out.forall { case (_, p, b) => p.isDefined == b.isDefined })
    val ranked = scored.sortBy { case (id, p, _) => (-p, id) }
    ranked.zipWithIndex.foreach { case ((id, _, b), i) =>
      val rn = i + 1L
      val expect = if (rn * 3 <= n) "head" else if (rn * 3 <= n * 2L) "middle" else "tail"
      assert(b == expect, s"doc $id rank $rn/$n: bucket $b != $expect")
    }
    // thirds differ by at most one doc
    val sizes = scored.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1,
      s"bucket sizes $sizes not a balanced third-cut")
  }

  // ---- q104 SemDeDup ------------------------------------------------------

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("semanticDedup: kept/dup partition matches exhaustive within-cell check") {
    val out = Q.semanticDedup(spark, sf)
      .select("vec_id", "cell", "dup_of", "is_semantic_dup")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    val vecs = graft.io.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0) 0.0 else d / n
    }
    assert(out.map(_._1).distinct.length == vecs.size, "one row per corpus vector")
    assert(out.exists(_._4) && out.exists(!_._4), "both kept and dup classes present")
    out.groupBy(_._2).foreach { case (cell, members) =>
      val ids = members.map(_._1).sorted
      members.foreach { case (id, _, dupOf, isDup) =>
        val lowerSimilar = ids.filter(o => o < id && round4(cos(vecs(o), vecs(id))) >= 0.35)
        assert(isDup == lowerSimilar.nonEmpty,
          s"vec $id in cell $cell: flag $isDup but lower similar = $lowerSimilar")
        assert(dupOf == lowerSimilar.headOption,
          s"vec $id: dup_of $dupOf != min similar lower id ${lowerSimilar.headOption}")
      }
    }
  }

  test("semanticDedup: cells are nearest trained centroid (tie-break by cid)") {
    val emb = graft.io.Tables.table(spark, sf, "embeddings")
    val cents = Similarity.kmeansCentroids(emb, dim = 64, k = 10, iters = 1,
      quantizedMeans = true)
      .as[(Long, Seq[Double])].collect().map { case (c, v) => c -> v.toArray }
    val out = Q.semanticDedup(spark, sf).select("vec_id", "cell")
      .as[(Long, Long)].collect().toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) 0.0 else d / n
    }
    vecs.foreach { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.head._1
      assert(out(id) == best, s"vec $id: cell ${out(id)} != nearest centroid $best")
    }
  }

  // ---- q105 trained quality classifier ------------------------------------

  test("qualityClassifier: weights satisfy the least-squares normal equations") {
    val row = Q.qualityClassifier(spark, sf).collect().head
    val (w0, w1, w2) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    val feats = graft.io.Tables.table(spark, sf, "documents").select(
        graft.text.TextOps.tokenCount(col("text")).cast("long").as("x1"),
        graft.text.TextOps.stopwordCount(col("text")).cast("long").as("x2"),
        when(graft.text.TextOps.qualityScore(col("text")) >= 0.8, 1L).otherwise(0L).as("y"))
      .as[(Long, Long, Long)].collect()
    // residual orthogonal to each design column: Σr = Σr·x1 = Σr·x2 = 0
    val res = feats.map { case (x1, x2, y) => (x1, x2, y - (w0 + w1 * x1 + w2 * x2)) }
    val scale = feats.length.toDouble
    assert(math.abs(res.map(_._3).sum) / scale < 1e-9, "Σ residual != 0")
    assert(math.abs(res.map(r => r._3 * r._1).sum) / scale < 1e-6, "Σ residual·x1 != 0")
    assert(math.abs(res.map(r => r._3 * r._2).sum) / scale < 1e-6, "Σ residual·x2 != 0")
  }

  test("qualityClassifier: confusion counts consistent and better than majority") {
    val row = Q.qualityClassifier(spark, sf)
      .select("n_docs", "tp", "fp", "tn", "fn", "accuracy").collect().head
    val (n, tp, fp, tn, fn) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4))
    assert(tp + fp + tn + fn == n, "confusion cells must partition the corpus")
    assert(row.getDouble(5) == (tp + tn).toDouble / n.toDouble)
    val majority = math.max(tp + fn, fp + tn).toDouble / n.toDouble
    assert(row.getDouble(5) > majority,
      s"student accuracy ${row.getDouble(5)} no better than majority class $majority")
  }
}
