package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Double-precision linear least squares over a DataFrame — the documented
  * scale path of q105's exact-decimal student (QueryCatalog.scala): the
  * decimal(38) Cramer solve is bit-exact-replayable but saturates around
  * d≈3-4 features and ~1e7 docs × (1e4 tokens)²; this trainer gives up
  * bit-exact replay (doubles, not decimals) and in exchange handles any
  * d and any corpus size the aggregation itself can:
  *
  *  - ONE map-side-combined aggregation pass accumulates the Gram sums
  *    Σxᵢxⱼ, Σxᵢy, Σxᵢ, Σy, n — (d+1)(d+2)/2 doubles of state total,
  *    independent of corpus size (the q105 pattern, generalized);
  *  - the driver CENTERS the sums algebraically (Σxᵢxⱼ − nμᵢμⱼ), which
  *    conditions the system as mean-scaling would without a second pass,
  *    and solves the d×d slope system by Gaussian elimination with
  *    partial pivoting — O(d³) on d doubles, trivial for any d the Gram
  *    pass can carry;
  *  - the intercept recovers as μ_y − Σwᵢμᵢ.
  *
  * Training cost at 100 TB = one scan; scoring broadcasts d+1 doubles
  * into the consumer's own scan ([[predicted]]).
  */
object LeastSquares {

  /** Fitted model: `weights(0)` is the intercept, `weights(i)` the
    * coefficient of `featureCols(i-1)`. */
  final case class Model(featureCols: Seq[String], weights: Array[Double]) {
    /** The linear score as a column expression over the feature columns. */
    def score: Column =
      featureCols.zipWithIndex.foldLeft(lit(weights(0))) {
        case (acc, (c, i)) => acc + col(c).cast("double") * lit(weights(i + 1))
      }
  }

  /** Train y ≈ w₀ + Σ wᵢ·xᵢ by normal equations (see object doc). Feature
    * and label columns must be numeric; rows with nulls are the caller's
    * concern (filter or impute first). Throws on a singular system
    * (collinear features) rather than returning garbage.
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String): Model = {
    val d = featureCols.size
    require(d >= 1, "at least one feature")
    val x: Seq[Column] = featureCols.map(c => col(c).cast("double"))
    val y = col(labelCol).cast("double")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("n"), sum(y).as("sy")) ++
        x.zipWithIndex.map { case (xi, i) => sum(xi).as(s"s$i") } ++
        x.zipWithIndex.map { case (xi, i) => sum(xi * y).as(s"sy$i") } ++
        (for { i <- 0 until d; j <- i until d }
          yield sum(x(i) * x(j)).as(s"s${i}_$j"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g(name: String): Double = row.getAs[Double](name)

    val n = g("n")
    require(n > 0, "empty input")
    val mu = (0 until d).map(i => g(s"s$i") / n)
    val muY = g("sy") / n
    // centered normal equations: A w = b with A_ij = Σxᵢxⱼ − nμᵢμⱼ
    val a = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      g(s"s${lo}_$hi") - n * mu(i) * mu(j)
    }
    val b = Array.tabulate(d)(i => g(s"sy$i") - n * mu(i) * muY)

    // Gaussian elimination with partial pivoting (in-place on copies)
    val m = a.map(_.clone())
    val v = b.clone()
    for (k <- 0 until d) {
      val p = (k until d).maxBy(r => math.abs(m(r)(k)))
      require(math.abs(m(p)(k)) > 1e-12 * n,
        s"singular system at column $k (collinear features?)")
      if (p != k) { val t = m(p); m(p) = m(k); m(k) = t
                    val tv = v(p); v(p) = v(k); v(k) = tv }
      for (r <- k + 1 until d) {
        val f = m(r)(k) / m(k)(k)
        for (c <- k until d) m(r)(c) -= f * m(k)(c)
        v(r) -= f * v(k)
      }
    }
    val w = new Array[Double](d)
    for (k <- d - 1 to 0 by -1) {
      var s = v(k)
      for (c <- k + 1 until d) s -= m(k)(c) * w(c)
      w(k) = s / m(k)(k)
    }
    val intercept = muY - (0 until d).map(i => w(i) * mu(i)).sum
    Model(featureCols, (intercept +: w.toVector).toArray)
  }

  /** Score a frame with a fitted model: adds `prediction` (the linear
    * score) — d+1 literal doubles riding the consumer's scan. */
  def predicted(df: DataFrame, model: Model): DataFrame =
    df.withColumn("prediction", model.score)
}
