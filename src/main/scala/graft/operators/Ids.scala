package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe contiguous global ID assignment (0-based, dense, ordered
  * by `orderCols`) — the pipeline primitive behind stable sample
  * indexing, shard addressing, and resumable exports.
  *
  * The naive form — `row_number()` over an unpartitioned window — sorts
  * the whole table on ONE task, which is exactly the o2/o3 bound this
  * library documents as semantics-only. This operator produces the same
  * numbering distributed:
  *
  *  1. range-repartition by `orderCols` (sampled boundaries, the same
  *     machinery as a distributed ORDER BY — no single-task sort);
  *  2. rank within each range partition (`row_number` partitioned by
  *     `spark_partition_id()`);
  *  3. per-partition row counts → cumulative offsets (one row per
  *     partition — metadata-sized) broadcast back and added.
  *
  * Total cost: two shuffles of the data (range + pid hash) plus a
  * metadata aggregation; every stage is fully parallel, so the plan
  * survives a 100× scale-up where the global window would not.
  *
  * Output is deterministic when `orderCols` is a total order (unique
  * key); with duplicate keys the numbering of ties follows partition
  * arrival order, like any distributed sort. */
object Ids {

  def contiguous(df: DataFrame, orderCols: Seq[String],
      idName: String = "rid", numPartitions: Int = 0): DataFrame =
    // dense rank = inclusive running count − 1: one shared
    // implementation of the subtle distributed scaffold
    cumulativeSum(df, orderCols.map(col), lit(1L), idName, numPartitions)
      .withColumn(idName, col(idName) - 1)

  /** The distributed running SUM of `weight` in `orderBy` order —
    * the generalization [[contiguous]] is the weight-1 case of:
    * range-repartition on the sort expressions, per-partition running
    * sums, per-partition TOTALS (one row each — metadata) prefix-summed
    * and broadcast back. No single-task global window; survives the
    * same 100× scale-up. `orderBy` may carry direction (`col.desc`)
    * and must be a total order for a deterministic result. Output:
    * input columns plus `sumName` = inclusive running sum. The
    * primitive behind "take items in priority order until a budget is
    * hit" ([[Curation.tokenBudgetSelect]]): the kept prefix in sort
    * order is exactly `sumName <= budget`. */
  def cumulativeSum(df: DataFrame, orderBy: Seq[Column], weight: Column,
      sumName: String = "cum", numPartitions: Int = 0): DataFrame = {
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(np, orderBy: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", weight.cast("long"))
    val local = ranged.withColumn("_local",
      sum("_w").over(Window.partitionBy("_pid").orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = ranged.groupBy("_pid").agg(sum("_w").as("_n"))
      .withColumn("_offset",
        coalesce(sum("_n").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), "_pid")
      .withColumn(sumName, col("_offset") + col("_local"))
      .drop("_pid", "_w", "_local", "_offset")
  }
}
