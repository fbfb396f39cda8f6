package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Single-pass sketch kernels for the dedup operators.
  *
  * Composing these from built-ins (explode → 32–64 conditional aggregate
  * columns → reassemble) works but generates enormous codegen classes and
  * an unnecessary shuffle; one custom expression per sketch keeps the
  * whole computation a narrow per-row map inside whole-stage codegen —
  * the shape that scales to 10^9 documents (bench: dedup_simhash went
  * from 12.3 s to sub-second at sf0.1 after this change). */
object SketchImpl {
  /** 64-bit SimHash over a token array: bit b is the sign of the sum of
    * ±1 votes from each token's xxhash64 bit b. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** k-permutation MinHash signature: element j is the minimum over the
    * set of xxhash64(token, seed = j). Empty/all-null input → MaxValue
    * sentinels (callers treat such docs as having no signature). */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** simhash64(array<string>) → long, codegen via a static call. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SketchImpl.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** minhash_sig(array<string>, k) → array<long>, codegen via static call. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SketchImpl.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchImpl.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object SketchExpressions {
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def minhash_sig(c: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))
}
