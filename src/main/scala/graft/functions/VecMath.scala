package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic over `array<double>` columns — the hot inner
  * loop of every pairwise similarity path (cosine scoring, k-means
  * assignment, PQ sub-distances, exact re-rank).
  *
  * Why an Expression and not composition (the [[MinHashSig]] rationale):
  *   - `zip_with` + `aggregate` are CodegenFallback — every pair
  *     evaluation leaves whole-stage codegen, allocates the zipped array
  *     and walks the lambda tree interpreted (~µs/row on dim 64).
  *   - expanding to `element_at` arithmetic stays declarative but
  *     generates ~2·dim bounds-checked accesses in ONE un-splittable
  *     generated method — past HotSpot's huge-method threshold the whole
  *     stage runs as interpreted bytecode, measured SLOWER than the HOF
  *     walk (the r9 q104 regression).
  * This expression generates a ~5-line counted loop — small enough to
  * JIT, branch-free, no allocation.
  *
  * Exactness contract: the loop accumulates LEFT-TO-RIGHT from +0.0 —
  * the identical IEEE fold as `aggregate(zip_with(a, b, (x, y) => x*y),
  * 0.0, _+_)` and as the DuckDB oracle's `list_reduce` replay, so scores
  * are bit-identical to both. Inputs must be equal-length dense arrays
  * (no null elements) — the embedding-column invariant; length mismatch
  * folds over the shorter prefix rather than nulling out.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the override type is inferred
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ − bᵢ)² with the same left-to-right fold contract as [[VecDot]]. */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  /** Dot product of two array<double> columns — native loop, exact
    * left-to-right IEEE fold. */
  def vec_dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Squared L2 distance of two array<double> columns — native loop,
    * exact left-to-right IEEE fold. */
  def vec_l2sq(a: Column, b: Column): Column =
    GraftShim.column(VecL2Sq(GraftShim.expression(a), GraftShim.expression(b)))
}
