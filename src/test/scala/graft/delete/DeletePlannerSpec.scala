package graft.delete

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class DeletePlannerSpec extends SparkTestBase {

  test("exact split points + range predicates form a disjoint cover") {
    val orders = Tables(spark, sfDir, "orders")
    val splits = DeletePlanner.splitPoints(orders, Seq("o_orderkey"), 4)
    assert(splits.size == 3)
    val preds = DeletePlanner.rangePredicates(Seq("o_orderkey"), splits)
    assert(preds.size == 4)
    // evaluating the generated SQL ranges partitions every row exactly once
    val counts = preds.map(p => orders.filter(expr(p)).count())
    assert(counts.sum == orders.count())
    assert(counts.forall(_ > 0))
  }

  test("approxQuantile split points cover all rows within ~1% balance") {
    val orders = Tables(spark, sfDir, "orders")
    val splits = DeletePlanner.splitPointsApprox(orders, "o_orderkey", 8)
    assert(splits.nonEmpty && splits.size <= 7)
    val preds = DeletePlanner.rangePredicates(Seq("o_orderkey"), splits)
    val counts = preds.map(p => orders.filter(expr(p)).count())
    assert(counts.sum == orders.count()) // cover, no overlap
    // balanced-ish: no worker owns more than 3x the even share
    val even = orders.count().toDouble / preds.size
    assert(counts.max <= even * 3, s"unbalanced: $counts")
  }

  test("composite-PK range predicates are parseable and cover lineitem") {
    val li = Tables(spark, sfDir, "lineitem")
    val splits = DeletePlanner.splitPoints(li, Seq("l_orderkey", "l_linenumber"), 4)
    val preds = DeletePlanner.rangePredicates(Seq("l_orderkey", "l_linenumber"), splits)
    val counts = preds.map(p => li.filter(expr(p)).count())
    assert(counts.sum == li.count())
  }

  test("range predicates render temporal PK literals as JDBC escapes " +
      "and reject unsupported types") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:30:45.5")
    val d = java.sql.Date.valueOf("2024-03-01")
    val preds = DeletePlanner.rangePredicates(
      Seq("created_at", "day", "id"),
      Seq(Seq(ts, d, java.lang.Long.valueOf(7L))))
    assert(preds.size == 2)
    assert(preds.head.contains("{ts '2024-03-01 12:30:45.5'}"))
    assert(preds.head.contains("{d '2024-03-01'}"))
    assert(preds.head.contains("id < 7"))
    // a bare toString would silently produce broken SQL — reject instead
    intercept[IllegalArgumentException] {
      DeletePlanner.rangePredicates(Seq("pk"),
        Seq(Seq(new java.math.BigInteger("1").toByteArray)))
    }
  }
}
