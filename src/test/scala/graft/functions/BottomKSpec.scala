package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The KMV bottom-k sketch's contract: distinct sampling (duplicates
  * collapse), exact agreement with the brute-force k-smallest-keys
  * answer, and merge correctness across partition layouts — the
  * property that makes map-side partial aggregation legal. */
class BottomKSpec extends SparkTestBase {

  private def brute(items: Seq[String], k: Int): Seq[(String, Long)] =
    items.distinct.map(s => (BottomK.key(s), s)).sorted.take(k)
      .map { case (key, item) => (item, key) }

  test("bottom_k == brute-force k smallest keys over the distinct domain") {
    import spark.implicits._
    val items = (0 until 500).map(i => s"item-${i % 200}") // heavy dupes
    val got = items.toDF("s")
      .select(BottomK.bottom_k(col("s"), 16))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == brute(items, 16))
    assert(got.size == 16)
  }

  test("merge across partition layouts is layout-independent") {
    import spark.implicits._
    val items = (0 until 300).map(i => s"doc $i payload")
    val answers = Seq(1, 3, 7, 32).map { parts =>
      items.toDF("s").repartition(parts)
        .select(BottomK.bottom_k(col("s"), 10))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
    }
    assert(answers.distinct.size == 1, "layout changed the sample")
    assert(answers.head == brute(items, 10))
  }

  test("per-group sampling: each group's sample is its own domain's") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"g${i % 4}", s"v$i")).toDF("g", "s")
    val rows = df.groupBy("g").agg(BottomK.bottom_k(col("s"), 5).as("bk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1))))
      .toMap
    for (g <- 0 until 4) {
      val mine = (0 until 100).filter(_ % 4 == g).map(i => s"v$i")
      assert(rows(s"g$g") == brute(mine, 5), s"group g$g sample wrong")
    }
  }

  test("fewer distinct values than k returns them all; nulls skipped") {
    import spark.implicits._
    val got = Seq(Some("x"), None, Some("y"), Some("x"))
      .toDF("s").select(BottomK.bottom_k(col("s"), 8))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toSet
    assert(got == Set("x", "y"))
  }
}
