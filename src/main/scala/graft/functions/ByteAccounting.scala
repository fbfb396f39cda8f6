package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Record/byte totals as a typed `Aggregator` — the `Dataset` twin of the
  * accumulator-based accounting in `copy.DataCopier` (reference A2/A3:
  * ConversionResult.java:8-16 + ConverterUtils.java:118-152, string
  * values counted at UTF-8 byte length).
  *
  * Usage: `ds.select(ByteAccounting.toColumn)` on a Dataset[String], or
  * `udaf(ByteAccounting)` to register for DataFrame/SQL use. Aggregators
  * get Catalyst's partial/final split for free — map-side combine on
  * every partition, one merged struct at the end.
  */
final case class CopyStats(records: Long, bytes: Long)

object ByteAccounting extends Aggregator[String, CopyStats, CopyStats] {
  override def zero: CopyStats = CopyStats(0L, 0L)
  override def reduce(b: CopyStats, value: String): CopyStats =
    CopyStats(b.records + 1,
      b.bytes + (if (value == null) 0L else value.getBytes("UTF-8").length.toLong))
  override def merge(a: CopyStats, b: CopyStats): CopyStats =
    CopyStats(a.records + b.records, a.bytes + b.bytes)
  override def finish(r: CopyStats): CopyStats = r
  override def bufferEncoder: Encoder[CopyStats] = Encoders.product[CopyStats]
  override def outputEncoder: Encoder[CopyStats] = Encoders.product[CopyStats]
}
