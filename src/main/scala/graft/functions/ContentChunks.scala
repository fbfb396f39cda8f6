package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split text at positions where the rolling
  * hash of the trailing `window` bytes hits `hash & mask == 0` — the
  * Rabin-style boundary rule used by dedup-friendly chunkers. Boundaries
  * depend only on local content, so identical passages chunk identically
  * regardless of their position in a document — which is what makes
  * chunk-level dedup work across shifted/edited copies at corpus scale.
  *
  * Single-pass per row, codegen via static call; min/max chunk lengths
  * bound the output (mask 0x3F → ~64-byte mean chunks).
  */
object ChunkImpl {
  val Window = 8
  val MinChunk = 16
  val MaxChunk = 256

  /** 31^Window, the coefficient of the byte leaving the rolling window */
  private val OutCoeff: Long = {
    var p = 1L
    var i = 0
    while (i < Window) { p *= 31L; i += 1 }
    p
  }

  def chunks(s: UTF8String, mask: Long): GenericArrayData = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var h = 0L // rolling hash of the trailing `Window` bytes — depends
               // ONLY on local content, never on chunk/document position
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + (bytes(i) & 0xffL)
      if (i >= Window) h -= (bytes(i - Window) & 0xffL) * OutCoeff
      val len = i - start + 1
      if (len >= MinChunk && ((h & mask) == 0L || len >= MaxChunk)) {
        // never cut inside a multi-byte codepoint: advance the boundary
        // past UTF-8 continuation bytes (0b10xxxxxx) so every chunk is
        // valid text. ASCII input is untouched (no continuation bytes),
        // and the rolling hash keeps running over the skipped bytes, so
        // boundaries stay content-defined.
        var end = i + 1
        while (end < bytes.length && (bytes(end) & 0xC0) == 0x80) {
          h = h * 31L + (bytes(end) & 0xffL)
          if (end >= Window) h -= (bytes(end - Window) & 0xffL) * OutCoeff
          end += 1
        }
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, end))
        start = end
        i = end - 1 // loop increment brings i to `end`
      }
      i += 1
    }
    if (start < bytes.length)
      out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, bytes.length))
    new GenericArrayData(out.toArray)
  }
}

case class ContentChunks(child: Expression, mask: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"content_chunks requires STRING input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ChunkImpl.chunks(input.asInstanceOf[UTF8String], mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkImpl.chunks($c, ${mask}L)")
  override protected def withNewChildInternal(newChild: Expression): ContentChunks =
    copy(child = newChild)
}

object ContentChunks {
  /** mean chunk size ≈ mask+1 bytes (default 63 → ~64B). */
  def content_chunks(c: Column, mask: Long = 0x3FL): Column =
    Bridge.column(ContentChunks(Bridge.expression(c), mask))
}
