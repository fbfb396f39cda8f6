package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the customer↔supplier trade graph derived from
  * the TPC-H fixtures — the iterative join+aggregate pattern (PageRank)
  * that web-scale data curation uses for source-quality signals
  * (harmonic/PageRank centrality over the link graph is a standard
  * quality prior for web-crawl training corpora).
  *
  * Graph: node per customer (id = custkey·2) and supplier (id =
  * suppkey·2+1); a symmetric directed edge pair (c↔s) per trading
  * relationship, weighted by lineitem count. Edges build from one
  * orders⋈lineitem join + one aggregate, then are persisted and shared
  * by every graph query (same memoization shape as
  * [[SimilarityQueries.sharedStages]]).
  *
  * PageRank runs a FIXED number of unrolled iterations (3) in integer
  * fixed-point micro-units: ranks start at 1e6; each edge contributes
  * `r(src)·w div outw(src)` (BIGINT floor division — deterministic on
  * both engines, unlike a float sum whose aggregation order drifts);
  * damping is `150000 + (850000·in) div 1e6`. Every per-term value is
  * exact BIGINT, so the DuckDB oracle hash-matches bit-for-bit.
  *
  * 100 TB shape: each iteration is one equi-join of the edge table with
  * the (much smaller) rank table on `src` plus one aggregate keyed by
  * `dst` — both shuffles on the same graph keys, no global collect, no
  * float reduction. Rounds are fixed (power iteration converges
  * geometrically; production runs ~10–20 rounds or a convergence probe
  * like [[Dedup]]'s pointer-jumped CC). Overflow envelope: the binding
  * bound is PER-NODE in-mass, not node count — floor division only
  * loses mass (each edge term rounds down, so totals are ≤ N·1e6, never
  * conserved exactly), but a hub node can still absorb nearly ALL of
  * it, and `850000·in_q` wraps once one node's in-mass `in_q` exceeds
  * ~1.08e13 micro-units — i.e. a hub drawing the full mass of ~10^7
  * nodes, regardless of graph size. Past that, cap per-node in-mass
  * (clip before damping) or widen the damping arithmetic to
  * DECIMAL(38,0)/HUGEINT the way vec_whiten's variance term does.
  */
object GraphQueries {

  /** Weighted symmetric edge list `(src, dst, w, outw)`, persisted once
    * per (session, dir). `outw` (the source node's total outgoing
    * weight) is folded in at build time so the per-iteration plan is
    * exactly one join + one aggregate. */
  private val edgeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    edgeCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    edgeCache.getOrElseUpdate((s, dir), {
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .agg(count(lit(1)).as("w"))
      val edges = pairs
        .select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"), col("w"))
        .unionAll(pairs.select((col("supp") * 2 + 1).as("src"),
          (col("cust") * 2).as("dst"), col("w")))
      val outW = edges.groupBy(col("src").as("ow_src")).agg(sum("w").as("outw"))
      edges.join(outW, col("src") === col("ow_src")).drop("ow_src").persist()
    })
  }

  /** One damped power-iteration step over the prepared edge list. */
  private def prStep(edges: DataFrame, ranks: DataFrame): DataFrame =
    edges.join(ranks, col("src") === col("node"))
      .select(col("dst"), expr("(r_q * w) div outw").as("c_q"))
      .groupBy(col("dst").as("node"))
      .agg(sum("c_q").as("in_q"))
      .select(col("node"),
        (lit(150000L) + expr("(850000 * in_q) div 1000000")).as("r_q"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 3 unrolled damped PageRank iterations in exact fixed-point.
    // Every node has out-edges (symmetric construction), so there is no
    // dangling-mass term to redistribute.
    "graph_pagerank" -> { (s, dir) =>
      val edges = tradeEdges(s, dir)
      val r0 = edges.select(col("src").as("node")).distinct()
        .withColumn("r_q", lit(1000000L))
      prStep(edges, prStep(edges, prStep(edges, r0)))
    },
    // Degree distribution of the trade graph — the shape check run
    // before any iterative algorithm (hub detection feeds the salting /
    // cap decisions every skew guard in this repo uses). Distinct
    // neighbor count per node, then a histogram over degrees.
    "graph_degree_stats" -> { (s, dir) =>
      tradeEdges(s, dir)
        .groupBy("src").agg(count(lit(1)).as("degree"),
          sum("w").as("strength"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"),
          sum("strength").as("total_strength"))
    })

  private val edgeCtes =
    """pairs AS (
      | SELECT o_custkey AS cust, l_suppkey AS supp, COUNT(*) AS w
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | GROUP BY 1, 2),
      |edges AS (
      | SELECT cust * 2 AS src, supp * 2 + 1 AS dst, w FROM pairs
      | UNION ALL
      | SELECT supp * 2 + 1 AS src, cust * 2 AS dst, w FROM pairs),
      |ew AS (
      | SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw
      | FROM edges)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH $edgeCtes,
        |r0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r_q
        |       FROM edges),
        |i1 AS (
        | SELECT dst AS node,
        |  CAST(150000 + (850000 * SUM((r_q * w) // outw)) // 1000000
        |       AS BIGINT) AS r_q
        | FROM ew JOIN r0 ON r0.node = ew.src GROUP BY dst),
        |i2 AS (
        | SELECT dst AS node,
        |  CAST(150000 + (850000 * SUM((r_q * w) // outw)) // 1000000
        |       AS BIGINT) AS r_q
        | FROM ew JOIN i1 ON i1.node = ew.src GROUP BY dst),
        |i3 AS (
        | SELECT dst AS node,
        |  CAST(150000 + (850000 * SUM((r_q * w) // outw)) // 1000000
        |       AS BIGINT) AS r_q
        | FROM ew JOIN i2 ON i2.node = ew.src GROUP BY dst)
        |SELECT node, r_q FROM i3""".stripMargin,
    "graph_degree_stats" ->
      s"""WITH $edgeCtes
        |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        | CAST(SUM(strength) AS BIGINT) AS total_strength
        |FROM (
        | SELECT src, COUNT(*) AS degree, SUM(w) AS strength
        | FROM ew GROUP BY src) t
        |GROUP BY degree""".stripMargin)
}
