package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Brute-force cross-checks for the oriented-wedge graph queries — the
  * SQL oracles prove engine agreement; these prove the shared algebra
  * (degree-ordered orientation, wedge join) equals the naive
  * definition on the fixture. */
class GraphSpec extends SparkTestBase {

  private def edges(): Set[(Long, Long)] =
    GraphQueries.coPurchaseEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("graph_triangle_count equals naive per-node triangle enumeration") {
    val und = edges()
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (u, v) <- und
      w <- adj(u) if w > v && adj(v).contains(w)
    } { naive(u) += 1; naive(v) += 1; naive(w) += 1 }
    val got = SparkEntry.queries("graph_triangle_count")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got == naive.toMap, s"per-node mismatch; nodes=${nodes.size}")
    // every triangle counted exactly once per corner → total divisible by 3
    assert(got.values.sum % 3 == 0)
  }

  test("graph_jaccard_topk: scores match set-algebra jaccard; ordering is " +
      "the declared (jacc desc, a, b) total order") {
    val und = edges()
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val rows = SparkEntry.queries("graph_jaccard_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == 20)
    rows.foreach { case (a, b, inter, da, db, jm) =>
      val expInter = (adj(a) & adj(b)).size
      assert(inter == expInter && da == adj(a).size && db == adj(b).size,
        s"pair ($a,$b): inter/deg mismatch")
      assert(jm == inter * 1000000L / (da + db - inter))
    }
    val key = rows.map { case (a, b, _, _, _, jm) => (-jm, a, b) }
    assert(key.sameElements(key.sorted), "not in (jacc desc, a, b) order")
  }

  test("graph_kcore equals naive 3-round peel") {
    val und = edges()
    var adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    for (_ <- 1 to 3) {
      val alive = adj.filter(_._2.size >= 3).keySet
      adj = adj.collect { case (n, nbrs) if alive(n) =>
        n -> nbrs.filter(alive)
      }.filter(_._2.nonEmpty).toMap
    }
    val naive = adj.map { case (n, nbrs) => n -> nbrs.size.toLong }
    val got = SparkEntry.queries("graph_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, "peel mismatch vs naive")
    assert(got.nonEmpty)
  }

  test("graph_label_propagation equals naive synchronous LPA") {
    val und = edges()
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val freq = nbrs.toSeq.map(labels).groupBy(identity)
          .map { case (l, o) => (l, o.size) }
        // most frequent neighbor label, smallest label on ties
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = SparkEntry.queries("graph_label_propagation")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got == labels, "sync-LPA mismatch vs naive")
    // communities are non-trivial: fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }
}
