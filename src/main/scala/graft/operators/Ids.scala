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
    * order is exactly `sumName <= budget`. A NULL weight counts as 0
    * (the row keeps the previous running total) — made explicit with a
    * coalesce so a null-weighted row can never silently skew the sum
    * differently in the per-partition vs offset stages. */
  def cumulativeSum(df: DataFrame, orderBy: Seq[Column], weight: Column,
      sumName: String = "cum", numPartitions: Int = 0,
      totalName: Option[String] = None): DataFrame = {
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(np, orderBy: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", coalesce(weight.cast("long"), lit(0L)))
    val local = ranged.withColumn("_local",
      sum("_w").over(Window.partitionBy("_pid").orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the offsets table is ONE ROW PER SHUFFLE PARTITION — metadata-
    // sized, so its prefix-sum legitimately runs on one task. The
    // constant partition key (pmod(_pid, 1) ≡ 0; a bare literal would
    // be stripped by EliminateWindowPartitions) says so EXPLICITLY:
    // same execution as an unpartitioned window, minus the WindowExec
    // single-partition warning that would be noise here and signal
    // anywhere else. Constant-keyed windows are reserved for provably
    // bounded inputs like this one — the PlanSpec sweep flags every
    // foldable-partitioned window and whitelists only the
    // `_pid`-ordered shape. `totalName` rides the same tiny table
    // (grand total of _w), so callers that need n (ntile, keyset
    // steps) avoid a second scan of `df`.
    val woPid = Window.partitionBy(pmod(col("_pid"), lit(1))).orderBy("_pid")
    val offsets0 = ranged.groupBy("_pid").agg(sum("_w").as("_n"))
      .withColumn("_offset",
        coalesce(sum("_n").over(woPid
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = totalName match {
      case Some(t) => offsets0
        .withColumn(t, sum("_n").over(woPid.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("_pid"), col("_offset"), col(t))
      case None => offsets0.select("_pid", "_offset")
    }
    local.join(broadcast(offsets), "_pid")
      .withColumn(sumName, col("_offset") + col("_local"))
      .drop("_pid", "_w", "_local", "_offset")
  }

  /** Exact `NTILE(tiles)` in `orderBy` order, distributed: the tile of
    * each row is a closed-form function of its [[cumulativeSum]]
    * ordinal and the row total (SQL-standard sizing — the first
    * `n mod tiles` tiles get the extra row), so the result is
    * bit-identical to `ntile(t).over(Window.orderBy(...))` with no
    * single-task window and no second scan of `df` (the total rides
    * the metadata-sized offsets table). Output: input columns plus
    * `tileName` (1-based, LongType). `orderBy` must be a total order
    * for a deterministic assignment. */
  def ntileExact(df: DataFrame, orderBy: Seq[Column], tiles: Int,
      tileName: String = "tile"): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    cumulativeSum(df, orderBy, lit(1L), "__rn", totalName = Some("__n"))
      .withColumn(tileName, expr(
        s"""CASE WHEN __rn <= (__n % $tiles) * (__n div $tiles + 1)
           |     THEN (__rn - 1) div (__n div $tiles + 1) + 1
           |     ELSE (__n % $tiles)
           |          + (__rn - (__n % $tiles) * (__n div $tiles + 1) - 1)
           |            div greatest(__n div $tiles, 1) + 1 END""".stripMargin)
        .cast("long"))
      .drop("__rn", "__n")
  }
}
