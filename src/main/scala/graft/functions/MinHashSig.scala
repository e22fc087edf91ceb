package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftShim

/** MinHash signature as a native Catalyst expression: for each of k hash
  * functions h_i(s) = md5(i + "|" + s), the lexicographic minimum hex digest
  * over the input shingle array — in ONE pass per row, with shingle bytes
  * converted once and digests compared as raw bytes.
  *
  * Exists for throughput, not semantics: the identical computation composed
  * from built-ins (k × array_min(transform(sh, md5(...)))) evaluates the
  * interpreted higher-order-function tree k times per row and measured ~6×
  * slower at 5k docs. Semantics stay digit-for-digit identical to the
  * DuckDB oracle's `list_min(list_transform(sh, x -> md5(i || '|' || x)))`
  * (lowercase hex; hex lexicographic order == unsigned byte order).
  *
  * CodegenFallback is deliberate: the per-row work (k·|shingles| digests)
  * dwarfs codegen's per-row dispatch savings, and the fallback keeps the
  * expression inside any surrounding whole-stage-codegen projection.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val shingleBytes = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      shingleBytes(j) = arr.getUTF8String(j).getBytes
      j += 1
    }
    val md   = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Any](k)
    var i = 0
    while (i < k) {
      val prefix = (i.toString + "|").getBytes(StandardCharsets.UTF_8)
      var best: Array[Byte] = null
      j = 0
      while (j < n) {
        md.reset()
        md.update(prefix)
        md.update(shingleBytes(j))
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        j += 1
      }
      mins(i) = if (best == null) null else UTF8String.fromString(hex(best))
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column wrapper: shingles array<string> → array<string> of k minima. */
  def minhash_sig(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles), k))
}
