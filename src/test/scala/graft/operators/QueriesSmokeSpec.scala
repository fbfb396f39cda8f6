package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Guards the driver contract: every registered query must run and
  * return rows at sf0.001 (queries without an oracle get a rows-only
  * check from the driver — empty output would fail it), and every
  * oracle key must refer to a registered query. */
class QueriesSmokeSpec extends SparkTestBase {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without a query: $unknown")
  }

  test("every query returns >0 rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("no query emits top-level ARRAY/MAP columns (driver canonicalizer sorts rows by all columns)") {
    // The driver's pandas checker sorts result rows by every column;
    // array/map cells are unhashable there and crash the gate (r8's
    // only red row, agg_bottomk_sample pre-reshape). Struct columns
    // would equally defeat the row sort. Registered queries must emit
    // scalar columns only — posexplode collection outputs to rows.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"non-scalar output columns: $offenders")
  }

  test("output column names are unique per query (driver sorts by name)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      assert(cols.distinct.length == cols.length, s"$name: duplicate columns $cols")
    }
  }
}
