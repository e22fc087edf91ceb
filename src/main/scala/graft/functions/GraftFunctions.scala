package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT minhash_sig(shingles, 16) ...")` works alongside the
  * Column API — the same dual surface Spark's own functions expose.
  */
object GraftFunctions {

  /** Extract a static Int argument from a SQL call site. Accepts any
    * FOLDABLE integral expression (INT/BIGINT/SMALLINT/TINYINT literals or
    * constant arithmetic over them); rejects non-foldable or non-integral
    * arguments with a clear error instead of the ClassCastException /
    * undefined eval(null) a blind cast produces.
    */
  private def staticIntArg(e: Expression, fn: String, arg: String): Int = {
    import org.apache.spark.sql.types._
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: `$arg` must be a constant integer, got non-foldable ${e.sql}")
    e.dataType match {
      case IntegerType | LongType | ShortType | ByteType =>
        e.eval(null) match {
          case null =>
            throw new IllegalArgumentException(s"$fn: `$arg` must not be NULL")
          case v: java.lang.Number if v.longValue.isValidInt => v.intValue
          case v =>
            throw new IllegalArgumentException(
              s"$fn: `$arg` out of Int range: $v")
        }
      case dt =>
        throw new IllegalArgumentException(
          s"$fn: `$arg` must be an integer type, got ${dt.sql}")
    }
  }

  /** Register all graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_sig(shingles, k)")
        MinHashSig(exprs.head, staticIntArg(exprs(1), "minhash_sig", "k"))
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
        MinWindowHash(exprs.head, staticIntArg(exprs(1), "min_window_hash", "window"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "heavy_hitters(item, k)")
        HeavyHitters(exprs.head, staticIntArg(exprs(1), "heavy_hitters", "k"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "space_saving",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "space_saving(item, k)")
        SpaceSaving(exprs.head, staticIntArg(exprs(1), "space_saving", "k"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_structs",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "topk_structs(value, k)")
        // k stays an Expression: inside a SQL-UDF body it is an OUTER
        // parameter reference at CREATE-time analysis, only becoming a
        // literal when the call site inlines the argument — TopKStructs
        // defers the constant check to first use (see its scaladoc)
        TopKStructs(exprs.head, exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix52",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "md5_prefix52(str)")
        Md5Prefix52(exprs.head)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "kmv_distinct(hash52, k)")
        KmvDistinct(exprs.head, staticIntArg(exprs(1), "kmv_distinct", "k"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "t_digest_percentiles",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "t_digest_percentiles(value, array(percentages...), compression)")
        val ps = exprs(1) match {
          case e if e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
            e.eval(null) match {
              case null => throw new IllegalArgumentException(
                "t_digest_percentiles: percentages must not be NULL")
              case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
                val et = e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
                arr.toObjectArray(et).map(_.asInstanceOf[Number].doubleValue()).toSeq
            }
          case other => throw new IllegalArgumentException(
            s"t_digest_percentiles: percentages must be a constant array, got ${other.sql}")
        }
        TDigestPercentiles(exprs.head, ps,
          staticIntArg(exprs(2), "t_digest_percentiles", "compression"))
      },
      "scala_udf")
  }
}
