package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a native Catalyst aggregate
  * (`TypedImperativeAggregate`): a bounded summary of at most `k`
  * (item, count) counters per aggregation buffer, updated in O(1)
  * amortized and merged with the standard summary-merge (combine, then
  * subtract the (k+1)-th largest count and drop non-positives).
  *
  * Scale contract: the buffer is O(k) regardless of input cardinality —
  * the distributed heavy-hitters shape that a plain `groupBy(count)`
  * cannot give on a 10⁹-key column without shuffling every key. Each
  * surviving counter undercounts its item by at most n/(k+1); any item
  * with true frequency above n/(k+1) is guaranteed present. When the
  * column's distinct count is ≤ k the sketch never decrements and the
  * result is EXACT — that regime is what the DuckDB oracle checks; the
  * approximate regime is property-tested in `MisraGriesSpec`.
  *
  * Output: `array<struct<item:string, cnt:long>>` sorted by
  * (cnt desc, item asc) for deterministic comparison. */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k > 0 && k <= 65536, "capacity must be in (0, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires STRING input, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None => // decrement-all step: no counter for s, summary full
          buf.keysIterator.toArray.foreach { key =>
            val c = buf(key) - 1
            if (c <= 0) buf.remove(key) else buf(key) = c
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1(s) = b1.getOrElse(s, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive counters
      val threshold = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      b1.keysIterator.toArray.foreach { key =>
        val c = b1(key) - threshold
        if (c <= 0) b1.remove(key) else b1(key) = c
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray
      .sortBy { case (s, c) => (-c, s) }
      .map { case (s, c) =>
        InternalRow(UTF8String.fromString(s), c): Any
      })

  // length-prefixed UTF-8, not writeUTF: writeUTF throws for items whose
  // encoding exceeds 64 KB (long lines, base64 blobs) — a tracked item
  // that large would crash the partial-aggregate shuffle
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Column-API entry: `heavy_hitters(col, k)` aggregate. */
  def heavy_hitters(c: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())
}
