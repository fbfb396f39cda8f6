package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the repo-wide engine-portable hash idiom
  * `conv(substring(md5(x), 1, n), 16, 10)` — the construction every
  * sketch/bucket/sampling operator uses BECAUSE a SQL oracle can
  * reproduce it bit-for-bit (`('0x' || substr(md5(x), 1, n))::BIGINT`
  * in DuckDB).
  *
  * The composed built-in form pays, per row: a fresh MessageDigest
  * (commons-codec `md5Hex` calls `getInstance` each invocation), a
  * 32-char hex UTF8String, a substring allocation, and `conv`'s
  * string-parse back to a long. Round-14 measurement (guide §1 bisect,
  * sf0.1): `stat_bootstrap_ci`'s 64-replica `u` column alone accounted
  * for ~80% of the query's 4.8 s — the md5 evaluation, not the explode
  * or the aggregate. These expressions compute the IDENTICAL value
  * straight from the digest bytes: one thread-local MessageDigest, no
  * hex string, no substring, no conv parse, whole-stage-codegen'd via
  * the same static-call pattern as [[SketchImpl]]. HashExpressionsSpec
  * pins value-equality against the built-in composition on strings,
  * binary, and every nibble width the repo uses (4, 8, 10, 15).
  *
  * Oracle impact: NONE — the DuckDB side keeps the substr(md5(...))
  * SQL; only the Spark-side evaluation strategy changes. */
object HashImpl {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The first `nibbles` hex chars of md5(bytes), parsed as an unsigned
    * base-16 integer — exactly `conv(substring(md5(x), 1, nibbles), 16,
    * 10)` for nibbles ≤ 15 (always non-negative, fits a long). */
  def md5Prefix(bytes: Array[Byte], nibbles: Int): Long = {
    val d = mdLocal.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = dig(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  def md5PrefixUtf8(s: UTF8String, nibbles: Int): Long =
    md5Prefix(s.getBytes, nibbles)

  /** Poisson(1) CDF thresholds scaled to the md5-derived 2³²-range
    * uniform, tail capped at w = 7 — the [[graft.operators.Stats]]
    * bootstrap weight table (one definition; the SQL oracle mirrors the
    * same constants). */
  private val PoissonThresholds: Array[Long] = Array(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L)

  private def poissonWeight(u: Long): Long = {
    var w = 0
    while (w < 7 && u >= PoissonThresholds(w)) w += 1
    w.toLong
  }

  /** All `replicas` Poisson-bootstrap weights of one row in a single
    * pass: weight b = the threshold bucket of
    * `conv(substring(md5(concat(id, ':', b)), 1, 8), 16, 10)` — the
    * exact per-(row, replica) uniform [[graft.operators.Stats.bootstrapCi]]
    * documents — computed from digest bytes with one shared
    * MessageDigest and zero per-replica string/array garbage. */
  def bootstrapWeights(id: UTF8String, replicas: Int): ArrayData = {
    val d = mdLocal.get()
    val idb = id.getBytes
    val out = new Array[Long](replicas)
    var b = 0
    while (b < replicas) {
      d.reset()
      d.update(idb)
      d.update(':'.toByte)
      // ascii digits of b — identical bytes to cast(b as string)
      val bs = java.lang.Integer.toString(b)
      var i = 0
      while (i < bs.length) { d.update(bs.charAt(i).toByte); i += 1 }
      val dig = d.digest()
      val u = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      out(b) = poissonWeight(u)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** md5_prefix64(string|binary, nibbles) → long, codegen via static call.
  * Value-identical to `conv(substring(md5(x), 1, nibbles), 16, 10)
  * :: bigint` (HashExpressionsSpec pins it). */
case class Md5Prefix(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles > 0 && nibbles <= 15,
    s"md5_prefix64 supports 1..15 hex chars (60 bits), got $nibbles")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires STRING or BINARY, got $other")
  }
  private def isString = child.dataType == StringType
  override def nullSafeEval(input: Any): Any =
    if (isString) HashImpl.md5PrefixUtf8(input.asInstanceOf[UTF8String], nibbles)
    else HashImpl.md5Prefix(input.asInstanceOf[Array[Byte]], nibbles)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.md5PrefixUtf8($c, $nibbles)")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.md5Prefix($c, $nibbles)")
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

/** bootstrap_weights(idString, replicas) → array<long> of the Poisson(1)
  * replica weights (tail-capped at 7) — the fused per-row form of
  * `explode(sequence(0, B-1))` + md5/conv/when-chain. */
case class BootstrapWeights(child: Expression, replicas: Int)
    extends UnaryExpression {
  require(replicas >= 2 && replicas <= 4096,
    s"bootstrap_weights supports 2..4096 replicas, got $replicas")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bootstrap_weights requires STRING, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    HashImpl.bootstrapWeights(input.asInstanceOf[UTF8String], replicas)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.bootstrapWeights($c, $replicas)")
  override protected def withNewChildInternal(newChild: Expression): BootstrapWeights =
    copy(child = newChild)
}

object HashFunctions {
  def md5_prefix64(c: Column, nibbles: Int): Column =
    Bridge.column(Md5Prefix(Bridge.expression(c), nibbles))
  def bootstrap_weights(c: Column, replicas: Int): Column =
    Bridge.column(BootstrapWeights(Bridge.expression(c), replicas))
}
