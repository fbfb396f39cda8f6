package graft.copy

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** X2/X3 formulas + partition-range algebra — reference
  * ConverterUtils.java:25-40, GenericJdbcTableWorker.java:42-72.
  * Property-style checks use a seeded Random (deterministic). */
class CopyPlannerSpec extends AnyFunSuite {

  test("rows-per-commit honors the byte budget") {
    // 1.5MB budget / 150-byte rows = 10000, capped by mutations 20000/5 = 4000
    assert(CopyPlanner.rowsPerCommit(150, 4, 1, 1500000L) == 4000L)
    // tiny rows, 1 column: byte budget huge → mutation cap 20000
    assert(CopyPlanner.rowsPerCommit(10, 1, 0, 1500000L) == 20000L)
  }

  test("rows-per-commit floor of 100 (reference constant)") {
    assert(CopyPlanner.rowsPerCommit(10000000L, 2, 0, 1500000L) == 100L)
  }

  test("rows-per-commit 20k mutation cap divides by cols+indexes") {
    assert(CopyPlanner.rowsPerCommit(1, 10, 10, Long.MaxValue / 4) == 1000L)
  }

  test("worker count formula: min(total/batch + 1, max)") {
    assert(CopyPlanner.workerCount(0, 10000, 10) == 1)
    assert(CopyPlanner.workerCount(25000, 10000, 10) == 3)
    assert(CopyPlanner.workerCount(1000000, 10000, 10) == 10)
  }

  test("offset ranges: disjoint ordered cover of [0, total), 500 random cases") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val total = rnd.nextLong(1000001L)
      val workers = 1 + rnd.nextInt(64)
      val ranges = CopyPlanner.offsetRanges(total, workers)
      assert(ranges.map(_.numRecords).sum == total)
      ranges.foldLeft(0L) { (expectBegin, r) =>
        assert(r.beginOffset == expectBegin); r.beginOffset + r.numRecords
      }
      assert(ranges.forall(_.numRecords > 0))
      assert(ranges.size <= workers)
    }
  }

  test("lexicographic range predicate matches tuple order (exhaustive 2-col domain)") {
    val domain = for (a <- 0 to 4; b <- 0 to 4) yield (a, b)
    val ord = Ordering[(Int, Int)]
    for (lo <- domain; hi <- domain if ord.lteq(lo, hi)) {
      // evaluate our predicate's algebra in memory against tuple order
      domain.foreach { t =>
        val predSays =
          (t._1 > lo._1 || (t._1 == lo._1 && t._2 >= lo._2)) &&
            (t._1 < hi._1 || (t._1 == hi._1 && t._2 <= hi._2))
        val tupleOrder = ord.gteq(t, lo) && ord.lteq(t, hi)
        assert(predSays == tupleOrder, s"tuple $t lo=$lo hi=$hi")
      }
    }
    // and the generated SQL references both bounds
    val sql = CopyPlanner.lexRangePredicate(Seq("a", "b"), Seq(1, 2), Seq(3, 4))
    assert(sql ==
      "((a > 1) OR (a = 1 AND b >= 2)) AND ((a < 3) OR (a = 3 AND b <= 4))")
  }

  test("string PK values are SQL-quoted with escaping") {
    val sql = CopyPlanner.lexRangePredicate(Seq("k"), Seq("o'brien"), Seq("z"))
    assert(sql.contains("'o''brien'"))
  }

  test("jdbc partition options cover inclusive max") {
    val opts = CopyPlanner.jdbcPartitionOptions("id", 1, 100, 8)
    assert(opts("lowerBound") == "1")
    assert(opts("upperBound") == "101") // exclusive upper in Spark JDBC
    assert(opts("numPartitions") == "8")
  }
}
