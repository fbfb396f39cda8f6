package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the load-boundary invariant that broke round 6: `events.ts`
  * must surface from `Tables.apply` as LongType epoch NANOS regardless
  * of the fixture's physical parquet encoding (timestamp[ns] read as
  * raw long via `nanosAsLong`, or timestamp[us] read as TIMESTAMP_NTZ
  * and normalized by `Tables.normalizeTs`). All 19 downstream
  * `ts div …` sites depend on this. */
class FixtureSchemaSpec extends SparkTestBase {

  test("events.ts loads as LongType nanos from the driver fixture") {
    val ev = Tables(spark, sfDir, "events")
    assert(ev.schema("ts").dataType === LongType,
      s"events.ts must load as LongType nanos, got ${ev.schema("ts").dataType}")
    // values are epoch nanos: all within [2000-01-01, 2100-01-01) and
    // µs-aligned (both fixture encodings carry at most µs precision)
    val Row(lo: Long, hi: Long, misaligned: Long) = ev.agg(
      min("ts"), max("ts"),
      sum(when(col("ts") % 1000L =!= 0L, 1L).otherwise(0L))).head()
    assert(lo >= 946684800L * 1000000000L, s"min ts $lo predates 2000-01-01")
    assert(hi < 4102444800L * 1000000000L, s"max ts $hi past 2100-01-01")
    assert(misaligned === 0L, "ts values must be whole microseconds")
  }

  test("normalizeTs is the identity on an already-long ts") {
    import spark.implicits._
    val df = Seq((1L, 1700000000000000000L)).toDF("event_id", "ts")
    assert(Tables.normalizeTs(df).schema("ts").dataType === LongType)
    assert(Tables.normalizeTs(df).head().getLong(1) === 1700000000000000000L)
  }

  test("normalizeTs converts TIMESTAMP_NTZ micros to epoch nanos") {
    import spark.implicits._
    // 2023-11-14T22:13:20.123456 UTC = 1700000000.123456 epoch seconds
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts",
        expr("make_timestamp_ntz(2023, 11, 14, 22, 13, 20.123456)"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.head().getLong(1) === 1700000000123456000L)
  }

  test("normalizeTs converts TIMESTAMP (LTZ) micros to epoch nanos") {
    import spark.implicits._
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", expr("timestamp_micros(1700000000123456)"))
    assert(df.schema("ts").dataType === TimestampType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.head().getLong(1) === 1700000000123456000L)
  }

  test("tables with no ts column pass through untouched") {
    val li = Tables(spark, sfDir, "lineitem")
    assert(!li.schema.fieldNames.contains("ts"))
    assert(li.count() > 0)
  }
}
