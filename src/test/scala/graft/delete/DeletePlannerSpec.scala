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

  test("sampled composite-PK split tuples: exact disjoint cover, <=5% " +
      "range-size skew, no global sort or full-table shuffle in the plan") {
    val li = Tables(spark, sfDir, "lineitem")
    val pk = Seq("l_orderkey", "l_linenumber")
    val n = li.count()
    val workers = 8
    val splits = DeletePlanner.splitPointsApproxTuples(li, pk, workers)
    assert(splits.nonEmpty && splits.size <= workers - 1)
    // coverage is EXACT regardless of boundary placement (half-open
    // lexicographic ranges)
    val preds = DeletePlanner.rangePredicates(pk, splits)
    val counts = preds.map(p => li.filter(expr(p)).count())
    assert(counts.sum == n, s"cover broken: $counts vs $n")
    // balance: every worker within 5% of the even share (10k-sample
    // rank error is O(1/sqrt(10000)) ~ 1% per boundary; seeded rand
    // keeps this deterministic)
    val even = n.toDouble / preds.size
    assert(counts.max <= even * 1.05 && counts.min >= even * 0.95,
      s"skew > 5%: $counts (even share $even)")
    // scale shape: the sample is a TakeOrdered (per-partition heap +
    // driver merge of sampleSize rows) — never a global range sort of
    // the table
    val samplePlan = li.select(pk.map(col): _*)
      .orderBy(rand(42L)).limit(10000)
      .queryExecution.executedPlan.toString
    assert(samplePlan.contains("TakeOrderedAndProject"),
      s"sample not a bounded top-k:\n$samplePlan")
    assert(!samplePlan.contains("Exchange rangepartitioning"),
      s"sample plan global-sorts the table:\n$samplePlan")
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
