package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_count_less_from(arr, from, v)` — in an ASCENDING-sorted
  * `array<long>`, the number of elements at 1-based position ≥ `from`
  * whose value is < `v`: one O(log n) binary search per row, codegen'd.
  *
  * This is the probe primitive of the PPJoin+ suffix filter (Xiao et
  * al., "Efficient Similarity Joins for Near-Duplicate Detection",
  * TODS 2011 §4.2): partitioning a candidate pair's token windows at a
  * pivot bounds their overlap without materializing an intersection.
  * A higher-order `size(filter(...))` probe would walk the whole array
  * interpreted — O(n) per pair and outside codegen — exactly the cost
  * the filter exists to avoid.
  *
  * Contract: `arr` sorted ascending (the per-doc global-token-rank
  * arrays), `from` ≥ 1; out-of-range `from` clamps to the array bounds.
  */
case class SortedCountLessFrom(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), IntegerType, LongType)
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(arrAny: Any, fromAny: Any, vAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = vAny.asInstanceOf[Long]
    var lo = math.max(fromAny.asInstanceOf[Int] - 1, 0)
    val start = math.min(lo, n)
    lo = start
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) < v) lo = mid + 1 else hi = mid
    }
    lo - start
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, from, v) => {
      val n = ctx.freshName("n")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val start = ctx.freshName("start")
      s"""
         |int $n = $arr.numElements();
         |int $lo = java.lang.Math.max($from - 1, 0);
         |int $start = java.lang.Math.min($lo, $n);
         |$lo = $start;
         |int $hi = $n;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getLong($mid) < $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo - $start;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): SortedCountLessFrom =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedSearch {
  /** Count of elements at 1-based position ≥ `from` with value < `v` in
    * an ascending `array<long>` column. */
  def sorted_count_less_from(arr: Column, from: Column, v: Column): Column =
    GraftShim.column(SortedCountLessFrom(
      GraftShim.expression(arr), GraftShim.expression(from), GraftShim.expression(v)))
}
