package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed n-gram identities of a token array in ONE native pass — the
  * fused form of `transform(tokens, xxhash64)` → `slice`×n →
  * `arrays_zip` → `transform(_, xxhash64)` that
  * [[graft.dedup.Dedup.shingleHashes]] previously composed.
  *
  * Why an Expression (the [[VecMath]] rationale): the composed pipeline
  * is the gram-table build's dominant cost — `transform`/`arrays_zip`
  * are CodegenFallback HOFs, so every document allocates n shifted array
  * views plus one struct row per window and walks the lambda tree
  * interpreted (measured 1.25s of the 1.45s sf0.1 gram8 corpus pass;
  * the fused loop runs the same pass in ~0.3s). Here: one long[] of
  * token hashes, then one chained-hash loop per window — no
  * intermediate arrays, no structs, branch-free inner loop.
  *
  * Exactness contract — output values are BIT-IDENTICAL to the composed
  * form, not merely equivalent: Spark's `xxhash64(e₁..eₖ)` folds
  * XXH64.hashLong/hashUTF8String left-to-right from seed 42 across
  * children, struct fields and array elements alike, so
  *   - token hash  = hashUTF8String(tok, 42)          (= xxhash64(tok))
  *   - gram hash   = fold hashLong over the n token hashes from seed 42
  *                                   (= xxhash64(struct(h₁..hₙ)))
  *   - short doc (< n tokens) = fold over ALL token hashes from 42
  *                                   (= xxhash64(token-hash array)),
  * the [[graft.dedup.Dedup.shingles]] short-doc convention. A null
  * token leaves the fold's accumulator unchanged (Spark's null-skip
  * hash convention); unreachable under whitespace tokenization.
  * GramHashesSpec pins equality against the composed form per corpus.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram_hashes: n=$n must be >= 1")

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => super.checkInputDataTypes()
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"gram_hashes expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      th(i) = if (arr.isNullAt(i)) 42L
              else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val m = if (t < n) 1 else t - n + 1
    val w = if (t < n) t else n
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var k = 0
      while (k < w) { h = XXH64.hashLong(th(i + k), h); k += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val t = ctx.freshName("t")
      val th = ctx.freshName("th")
      val m = ctx.freshName("m")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $t = $a.numElements();
         |long[] $th = new long[$t];
         |for (int $i = 0; $i < $t; $i++) {
         |  $th[$i] = $a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |int $m = $t < $n ? 1 : $t - $n + 1;
         |int $w = $t < $n ? $t : $n;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  for (int $k = 0; $k < $w; $k++) {
         |    $h = $xxh.hashLong($th[$i + $k], $h);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  /** Column wrapper: tokens array<string> → array<long> of n-gram hashes. */
  def gram_hashes(tokens: Column, n: Int): Column =
    GraftShim.column(GramHashes(GraftShim.expression(tokens), n))
}
