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
      idName: String = "rid", numPartitions: Int = 0): DataFrame = {
    val cols: Seq[Column] = orderCols.map(col)
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(np, cols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.withColumn("_local",
      row_number().over(Window.partitionBy("_pid").orderBy(cols: _*)))
    // one row per partition: the tiny window here is metadata, not data
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum("_n").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), "_pid")
      .withColumn(idName, col("_offset") + col("_local") - 1)
      .drop("_pid", "_local", "_offset")
  }
}
