package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT minhash_sig(shingles, 16) ...")` works alongside the
  * Column API — the same dual surface Spark's own functions expose.
  */
object GraftFunctions {

  /** Register all graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_sig(shingles, k)")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        MinHashSig(exprs.head, k)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64(tokens)")
        SimHash64(exprs.head)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_window_hash",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "min_window_hash(text, window)")
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        MinWindowHash(exprs.head, w)
      },
      "scala_udf")
  }
}
