package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The Misra–Gries aggregate's two regimes: exact when distinct ≤ k,
  * and error-bounded (undercount ≤ n/(k+1), guaranteed presence of any
  * item with frequency > n/(k+1)) when the summary saturates. */
class MisraGriesSpec extends SparkTestBase {

  private def hh(dfKeys: Seq[String], k: Int): Map[String, Long] = {
    import spark.implicits._
    dfKeys.toDF("key").repartition(8)
      .agg(MisraGries.heavy_hitters(col("key"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact when distinct count fits the capacity, across partitions") {
    val keys = Seq.tabulate(5000)(i => s"k${i % 7}")
    val got = hh(keys, k = 16)
    val expected = keys.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    assert(got == expected)
  }

  test("saturated regime: hot key present, undercount bounded by n/(k+1)") {
    // 60% one hot key, the rest spread over 500 cold keys
    val n = 10000
    val keys = Seq.tabulate(n)(i => if (i % 5 < 3) "hot" else s"cold${i % 500}")
    val k = 8
    val got = hh(keys, k)
    val trueHot = keys.count(_ == "hot").toLong
    assert(got.contains("hot"), s"hot key lost: $got")
    assert(got.size <= k)
    // merge of per-partition summaries keeps the classic MG bound
    assert(got("hot") <= trueHot)
    assert(trueHot - got("hot") <= n.toLong / (k + 1),
      s"undercount ${trueHot - got("hot")} exceeds ${n / (k + 1)}")
  }

  test("serialization round-trips the buffer") {
    val agg = MisraGries(org.apache.spark.sql.graftbridge.Bridge
      .expression(col("x")), 4)
    val buf = agg.createAggregationBuffer()
    buf("a") = 3L; buf("b") = 1L
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("serialization survives items beyond writeUTF's 64 KB limit " +
      "and non-ASCII keys") {
    val agg = MisraGries(org.apache.spark.sql.graftbridge.Bridge
      .expression(col("x")), 4)
    val buf = agg.createAggregationBuffer()
    buf("x" * 100000) = 7L        // > 65535 bytes in UTF-8
    buf("键值🔥" * 10000) = 2L    // multi-byte, > 64 KB encoded
    buf("small") = 1L
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }
}
