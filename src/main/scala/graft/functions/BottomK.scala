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

/** Bottom-k (KMV) distinct sampling as a native Catalyst aggregate:
  * keep the `k` DISTINCT items with the smallest deterministic
  * 60-bit md5-derived keys. The classic order-independent sketch —
  * a deterministic uniform sample over the distinct values that is
  * mergeable (union, keep k smallest), so partial aggregation runs
  * map-side with O(k) state per buffer where a sort-based sample
  * would shuffle every row. Uses:
  *  - per-group content samples ("show me 8 example payloads per
  *    source") with no full-group sort;
  *  - bottom-k sketches compare across tables: |A∩B| estimation via
  *    key overlap (the KMV/theta-sketch construction);
  *  - the k-th smallest key estimates distinct count ((k−1)·2⁶⁰/kth).
  *
  * DETERMINISM makes it oracle-checkable: the key is the first 15 hex
  * chars of md5(item) parsed as a BIGINT — bit-identical to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` — so an exact SQL oracle
  * can rank by the same key. Duplicate inputs collapse (same item →
  * same key): this samples the distinct domain, not row frequency —
  * [[MisraGries]] is the frequency-weighted counterpart.
  *
  * Output: `array<struct<item:string, key:long>>` ascending by
  * (key, item) — the key rides along for rank-interval audits.
  *
  * Tie-break on equal keys compares items as UTF8String — i.e. raw
  * UTF-8 bytes — matching DuckDB's binary collation. (Java String
  * compareTo is UTF-16 code-unit order, which disagrees beyond the
  * BMP: supplementary chars sort via surrogates 0xD800-0xDFFF, below
  * 0xE000-0xFFFF chars, while their UTF-8 bytes sort above.) */
case class BottomK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[(Long, UTF8String), Unit]] {
  require(k > 0 && k <= 65536, "capacity must be in (0, 65536]")
  import BottomK.entryOrdering

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottom_k requires STRING input, got $other")
  }

  override def createAggregationBuffer(): mutable.TreeMap[(Long, UTF8String), Unit] =
    mutable.TreeMap.empty[(Long, UTF8String), Unit]

  private def insert(buf: mutable.TreeMap[(Long, UTF8String), Unit],
      key: Long, item: UTF8String): Unit = {
    buf.update((key, item), ())
    if (buf.size > k) buf.remove(buf.lastKey): Unit
  }

  override def update(buf: mutable.TreeMap[(Long, UTF8String), Unit],
      input: InternalRow): mutable.TreeMap[(Long, UTF8String), Unit] = {
    val v = child.eval(input)
    if (v != null) {
      // clone: eval's UTF8String may be backed by a reused row buffer
      val s = v.asInstanceOf[UTF8String].clone()
      insert(buf, BottomK.key(s.getBytes), s)
    }
    buf
  }

  override def merge(b1: mutable.TreeMap[(Long, UTF8String), Unit],
      b2: mutable.TreeMap[(Long, UTF8String), Unit]): mutable.TreeMap[(Long, UTF8String), Unit] = {
    b2.foreachEntry { case ((key, item), _) => insert(b1, key, item) }
    b1
  }

  override def eval(buf: mutable.TreeMap[(Long, UTF8String), Unit]): Any =
    new GenericArrayData(buf.keysIterator
      .map { case (key, item) => InternalRow(item, key): Any }.toArray)

  // length-prefixed UTF-8 (same rationale as MisraGries: writeUTF
  // caps at 64 KB per item)
  override def serialize(buf: mutable.TreeMap[(Long, UTF8String), Unit]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { case ((key, item), _) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(key)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[(Long, UTF8String), Unit] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update((in.readLong(), UTF8String.fromBytes(b)), ())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren.head)
}

object BottomK {
  /** (key, item) order with BINARY item tie-break: UTF8String
    * compareTo is unsigned byte comparison — the collation DuckDB
    * applies to text, so a 60-bit key collision between distinct
    * items resolves identically in both engines. */
  implicit val entryOrdering: Ordering[(Long, UTF8String)] =
    Ordering.Tuple2(Ordering.Long, Ordering.comparatorToOrdering(
      java.util.Comparator.naturalOrder[UTF8String]()))

  /** 60-bit sampling key: first 15 hex chars of md5(UTF-8 bytes) —
    * the DuckDB-replicable construction (`('0x' || substr(md5(x), 1,
    * 15))::BIGINT`), non-negative so integer comparisons match. */
  def key(s: String): Long =
    key(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def key(utf8: Array[Byte]): Long =
    // first 15 hex chars = 60 bits — the shared fused kernel (reused
    // thread-local MessageDigest instead of getInstance per row)
    HashImpl.md5Prefix(utf8, 15)

  /** Column-API entry: `bottom_k(col, k)` aggregate. */
  def bottom_k(c: Column, k: Int): Column =
    Bridge.column(BottomK(Bridge.expression(c), k).toAggregateExpression())
}
