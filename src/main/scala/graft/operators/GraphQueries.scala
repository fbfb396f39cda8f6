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

  /** Memoize-and-persist one shared graph stage — lifecycle rules
    * (dead-session eviction, release) live in [[StageCaches]]. */
  private def memo(cache: StageCaches.Cache[DataFrame], s: SparkSession,
      dir: String)(build: => DataFrame): DataFrame =
    StageCaches.memo(cache, s, dir)(build.persist())(_.unpersist(blocking = true))

  private val caches = Seq(
    () => edgeCache, () => coCache, () => adjCache, () => oriCache)

  /** Drop this session's persisted graph stages (edges, co-purchase,
    * adjacency, orientation) — the [[Similarity.releaseStages]]
    * counterpart for long-lived sessions that touch many fixture
    * dirs. */
  def releaseStages(s: SparkSession): Unit =
    caches.foreach(c =>
      StageCaches.release(c(), s)(_.unpersist(blocking = true)))

  /** Weighted symmetric edge list `(src, dst, w, outw)`, persisted once
    * per (session, dir). `outw` (the source node's total outgoing
    * weight) is folded in at build time so the per-iteration plan is
    * exactly one join + one aggregate. */
  private val edgeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def tradeEdges(s: SparkSession, dir: String): DataFrame =
    memo(edgeCache, s, dir) {
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
      edges.join(outW, col("src") === col("ow_src")).drop("ow_src")
    }

  /** Unweighted supplier co-purchase graph, kNN-SPARSIFIED: supplier
    * pairs co-appearing in ≥3 distinct orders, then each node keeps
    * only its 20 strongest neighbors (by co-occurrence weight, id
    * tie-break) and the union of the per-node top lists is undirected.
    * Two bounds make this hold at 100 TB, both standard for production
    * co-occurrence/similarity graphs:
    *  - pair generation is keyed by `l_orderkey`, so fan-out is
    *    bounded per order by its distinct-supplier count (≤7 in TPC-H;
    *    a general corpus caps or salts heavy groups the way [[Dedup]]
    *    caps LSH buckets) — never all-pairs over suppliers;
    *  - the top-20 kNN cap bounds every node's degree (≤40 after the
    *    symmetric union), so downstream wedge joins (triangles,
    *    Jaccard) are O(n·k²) regardless of how dense co-occurrence
    *    gets as data grows — without the cap, mean degree grows with
    *    orders-per-supplier-pair and the wedge stage super-linears.
    * The per-node top-k window partitions by node (never a global
    * window). Persisted per (session, dir) and shared by the triangle
    * and Jaccard queries. */
  private val coCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    memo(coCache, s, dir) {
      // pair generation: collect each order's distinct supplier set
      // (bounded per order) and explode the in-row combinations — one
      // shuffle on l_orderkey instead of a distinct + self-join chain;
      // the per-group set is where a general corpus would cap/salt.
      val pairs = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("sps"))
        .select(explode(expr(
          """flatten(transform(sps, (x, i) ->
            |  transform(slice(sps, i + 2, size(sps)), y ->
            |    struct(x AS u, y AS v))))""".stripMargin)).as("p"))
        .select(col("p.u"), col("p.v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 3)
      val sym = pairs.select(col("u").as("node"), col("v").as("nbr"), col("w"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nbr"), col("w")))
      val topk = sym.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("node")
            .orderBy(col("w").desc, col("nbr"))))
        .filter(col("rn") <= 20)
      topk.select(least(col("node"), col("nbr")).as("u"),
          greatest(col("node"), col("nbr")).as("v"))
        .distinct()
    }

  /** Symmetric adjacency (node, nbr) of [[coPurchaseEdges]], persisted:
    * the Jaccard wedge join scans it twice and the degree table derives
    * from it, so materializing once keeps each graph query's plan at
    * two joins over cached scans instead of re-deriving the whole
    * build chain per self-join branch. */
  private val adjCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def coAdj(s: SparkSession, dir: String): DataFrame =
    memo(adjCache, s, dir) {
      val und = coPurchaseEdges(s, dir)
      und.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
    }

  /** Degree-ordered oriented edges `(src, dst, ddeg)` of the
    * co-purchase graph, persisted: the triangle query references this
    * table THREE times (both wedge legs + the closing edge), and
    * without materialization each self-join branch would re-run the
    * whole orientation chain — the difference between a 2-join plan
    * over a cached scan and a 175-operator plan that recomputes the
    * build 3×. Orientation: from the (degree, id)-smaller endpoint to
    * the larger; `ddeg` rides along so wedge generation can compare
    * (ddeg, dst) lexicographically with no node relabeling pass. */
  private val oriCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def orientedEdges(s: SparkSession, dir: String): DataFrame =
    memo(oriCache, s, dir) {
      val und = coPurchaseEdges(s, dir)
      val deg = coAdj(s, dir).groupBy("node").agg(count(lit(1)).as("d"))
      und
        .join(deg.select(col("node").as("du_n"), col("d").as("du")), col("u") === col("du_n"))
        .join(deg.select(col("node").as("dv_n"), col("d").as("dv")), col("v") === col("dv_n"))
        .select(
          when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("src"),
          when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("dst"),
          when(col("du") <= col("dv"), col("dv")).otherwise(col("du")).as("ddeg"))
    }

  /** Nation-derived fixture graph for the CONVERGENCE-driven query
    * variants ([[GraphIterate]]): an 8-node path 0—1—…—7 whose head is
    * thickened to a K4 (all pairs of {0,1,2,3} connected) plus a
    * DISJOINT K4 on {20..23}. `nation` is a fixed 25-row dimension at
    * EVERY scale factor, so this graph — and each operator's
    * convergence round count — is identical at sf0.001 and sf0.1;
    * that is what lets an UNROLLED SQL oracle stay exact at every
    * scale (a data-dependent graph would converge at different round
    * counts per sf and no fixed SQL could match all of them).
    * Measured fixpoints, all well away from the fixed-round demos' 3:
    * k-core(2) peels the path tail in 5 rounds (both K4s survive, the
    * path interior does NOT — degree-2 nodes die once the tail
    * unravels), sync LPA stabilizes in 6 rounds (two communities,
    * labels 0 and 20), and integer PageRank first reaches L1 delta
    * <= 20000 µ-units at round 18 (its exact-zero fixpoint never
    * arrives — floor division leaves a period-2 limit cycle with
    * delta 11, which is why [[GraphIterate.pageRankConverged]] takes
    * an epsilon at all). */
  private[graft] def fixtureUnd(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir, "nation").select(col("n_nationkey").cast("long").as("k"))
    val path = n.filter(col("k") < 7)
      .select(col("k").as("u"), (col("k") + 1).as("v"))
    val head = n.filter(col("k") < 4)
    val k4a = head.as("a").join(head.as("b"),
        col("a.k") < col("b.k") && col("b.k") =!= col("a.k") + 1)
      .select(col("a.k").as("u"), col("b.k").as("v"))
    val tailC = n.filter(col("k").between(20, 23))
    val k4b = tailC.as("a").join(tailC.as("b"), col("a.k") < col("b.k"))
      .select(col("a.k").as("u"), col("b.k").as("v"))
    path.unionAll(k4a).unionAll(k4b)
  }

  private[graft] def fixtureAdj(s: SparkSession, dir: String): DataFrame = {
    val und = fixtureUnd(s, dir)
    und.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
  }

  /** Fixture graph in the `tradeEdges` shape (src, dst, w, outw),
    * unweighted (w = 1, outw = degree). */
  private[graft] def fixtureEdges(s: SparkSession, dir: String): DataFrame = {
    val sym = fixtureAdj(s, dir)
      .select(col("node").as("src"), col("nbr").as("dst"), lit(1L).as("w"))
    val outW = sym.groupBy(col("src").as("ow_src")).agg(sum("w").as("outw"))
    sym.join(outW, col("src") === col("ow_src")).drop("ow_src")
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
    },
    // Per-node triangle counts over the co-purchase graph via DEGREE-
    // ORDERED ORIENTATION — the standard wedge-bounding trick: orient
    // every undirected edge from the (degree, id)-smaller endpoint to
    // the larger, so the wedge self-join's fan-out per node is its
    // ORIENTED out-degree (O(√m) on power-law graphs, vs the raw hub
    // degree an unoriented wedge join would pay). Each triangle is
    // generated exactly once (its unique (deg,id)-minimal apex), then
    // exploded to its three corners for per-node counts. No windows,
    // no relabeling pass: the orientation comparator carries the
    // destination degree on each edge and compares (ddeg, dst)
    // lexicographically, so everything is equi-joins + one aggregate.
    "graph_triangle_count" -> { (s, dir) =>
      // und has u<v, so on a degree tie the id order breaks the
      // orientation (see orientedEdges); the query itself is exactly
      // two equi-joins over the persisted oriented table.
      val oriented = orientedEdges(s, dir)
      val e1 = oriented.as("e1"); val e2 = oriented.as("e2"); val e3 = oriented.as("e3")
      val wedges = e1.join(e2, col("e1.src") === col("e2.src") &&
        (col("e1.ddeg") < col("e2.ddeg") ||
          (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
      val tri = wedges.join(e3,
          col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
        .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
    },
    // Community detection: synchronous label propagation (LPA), 3
    // unrolled rounds over the co-purchase adjacency. Every node
    // starts labeled with its own id; each round it adopts the most
    // frequent label among its neighbors, smallest label breaking
    // ties — that tie-break makes SYNCHRONOUS LPA fully deterministic
    // (the classic async formulation resolves ties randomly and is
    // irreproducible by design; sync + total-order tie-break is the
    // standard batch variant, and what makes a DuckDB oracle
    // possible). Per round: one equi-join of adjacency with the label
    // table + two hash aggregates — the argmax is max(struct(count,
    // -label)), ONE aggregate, not a per-node window. 100 TB shape:
    // label table is node-sized (≪ edges), every shuffle keys on
    // node/neighbor ids, rounds are fixed; the kNN-sparsified graph
    // bounds neighbor fan-in at 40, so the count table is ≤ 40·|V|.
    "graph_label_propagation" -> { (s, dir) =>
      val adj = coAdj(s, dir)
      def step(labels: DataFrame): DataFrame =
        adj.join(labels.select(col("node").as("lnode"), col("community")),
            col("nbr") === col("lnode"))
          .groupBy("node", "community").agg(count(lit(1)).as("c"))
          .groupBy("node")
          .agg(max(struct(col("c"), (-col("community")).as("nc"))).as("m"))
          .select(col("node"), (-col("m.nc")).as("community"))
      val l0 = adj.select("node").distinct()
        .withColumn("community", col("node"))
      step(step(step(l0)))
    },
    // k-core peeling (k=3, 3 unrolled rounds): repeatedly drop nodes
    // with degree < k and the edges they carry — the standard
    // density-core extraction (spam/bot rings and tight communities
    // survive peeling; tendrils don't). Each round is one degree
    // aggregate + two semi-shaped equi-joins filtering the adjacency
    // to surviving endpoints; rounds are fixed like graph_pagerank
    // (full peeling iterates to a fixpoint — a convergence probe adds
    // rounds, not a new plan shape). Output: surviving nodes with
    // their degree inside the 3-peeled subgraph.
    "graph_kcore" -> { (s, dir) =>
      // Each round's input must be MATERIALIZED: peel references it
      // twice (degree aggregate AND edge filter), so a lazy chain
      // re-derives round n-1 inside every branch of round n — measured
      // 7 s vs ~1 s at sf0.1. Round 1 reads the memoized coAdj (already
      // persisted — checkpointing it again would store a duplicate copy
      // of the biggest frame); only the two INTERMEDIATE peel outputs
      // localCheckpoint, and those are edge-list-sized and shrinking.
      // Lifecycle: the per-call checkpoint blocks are transient — freed
      // by Spark's ContextCleaner when the frames are collected, not by
      // releaseStages (which owns the shared memo caches); see
      // GraftSession.release's scaladoc.
      def peel(adj: DataFrame): DataFrame = {
        val alive = adj.groupBy("node").agg(count(lit(1)).as("d"))
          .filter(col("d") >= 3).select("node")
        adj.join(alive, "node")
          .join(alive.withColumnRenamed("node", "nbr"), "nbr")
          .select("node", "nbr")
      }
      val r1 = peel(coAdj(s, dir)).localCheckpoint()
      val r2 = peel(r1).localCheckpoint()
      peel(r2).groupBy("node").agg(count(lit(1)).as("degree"))
    },
    // Link prediction: top-20 supplier pairs by neighbor-set Jaccard.
    // Common-neighbor counts come from one wedge join on the shared
    // neighbor (fan-out deg(n)² per neighbor — production would
    // degree-orient or cap hubs exactly like the triangle query; the
    // support-thresholded graph keeps it bounded here), then one join
    // to the degree table and integer cross-multiplied Jaccard
    // (inter·10⁶ div union) so the oracle hash-matches bit-for-bit.
    // Deterministic top-20: ORDER BY (jacc_micro DESC, a, b) is a
    // total order → TakeOrderedAndProject, no global sort.
    // CONVERGENCE-driven twins of the three iterative demos above,
    // over the scale-independent nation fixture graph (fixtureUnd
    // scaladoc). Each runs GraphIterate's probe-driven loop — the
    // production form: rounds come from the data, not a constant.
    // GraphIterateSpec asserts the measured round counts (5/6/18, all
    // != 3), proving the loop really is probe-terminated.
    "graph_kcore_fixpoint" -> { (s, dir) =>
      GraphIterate.kCoreFixpoint(fixtureAdj(s, dir), 2)._1
        .groupBy("node").agg(count(lit(1)).as("degree"))
    },
    "graph_lpa_fixpoint" -> { (s, dir) =>
      GraphIterate.labelPropFixpoint(fixtureAdj(s, dir))._1
    },
    "graph_pagerank_fixpoint" -> { (s, dir) =>
      GraphIterate.pageRankConverged(fixtureEdges(s, dir), epsMicro = 20000L)._1
    },
    // BFS/SSSP to fixpoint from node 0 over the fixture graph (round
    // 12): distances cover exactly the source's component (the 20–23
    // clique is unreachable and absent — reachability is part of the
    // contract). The oracle is a DuckDB recursive CTE with a distance
    // cap (bounded (node,dist) product) collapsed by MIN; the engine's
    // probe-driven loop must land on the identical integer table.
    "graph_sssp_fixpoint" -> { (s, dir) =>
      GraphIterate.ssspFixpoint(fixtureAdj(s, dir), source = 0L)._1
    },
    // thin wrapper since round 13: the wedge-join Jaccard top-k is the
    // callable GraphAnalytics.jaccardTopK entry point
    "graph_jaccard_topk" -> { (s, dir) =>
      GraphAnalytics.jaccardTopK(coAdj(s, dir), k = 20)
    },

    // HITS hubs & authorities on the BIPARTITE trade graph — the
    // natural fit: customers only point at suppliers, so customers are
    // pure hubs and suppliers pure authorities (the source-quality /
    // content-quality split a crawl-curation pipeline scores). Two
    // unrolled rounds in integer fixed-point: start every hub at 1e6;
    // each round is one equi-join + one aggregate per direction, and
    // the L1 normalization is `score_raw·1e6 div Σraw` (BIGINT floor
    // division — deterministic, no float reduction). Overflow envelope:
    // raw·1e6 ≤ 1e12·1e6 at sf0.1; at 10⁹-edge scale widen the
    // normalization products to DECIMAL(38,0) (the vec_whiten pattern).
    // Same per-round plan shape as graph_pagerank — shuffles keyed on
    // the graph keys, no collect.
    // thin wrapper since round 13: the two-round fixed-point HITS (with
    // its per-round localCheckpoint pin — the normalizations reference
    // each raw table twice and the recomputes would compound ~2³
    // without it) is the callable GraphAnalytics.hits entry point; the
    // customer→supplier direction filter stays query-side.
    "graph_hits" -> { (s, dir) =>
      GraphAnalytics.hits(tradeEdges(s, dir).where(col("src") % 2 === 0))
    },

    // Modularity of the nation partition over the weighted trade graph —
    // the community-quality score a curation pipeline computes to decide
    // whether a clustering (here: the natural nation communities; in
    // production: LPA/CC output) explains the link structure.
    // Q = Σ_c [intra_c/W − (D_c/W)²] with W = total DIRECTED weight
    // (2m), intra_c = directed weight inside community c, D_c = weighted
    // out-degree mass of c. Per-community contribution rows in integer
    // micro-units: every input to the one double expression is an exact
    // BIGINT (intra·W − D_c², both ≤ W² ≈ 2^42 at sf0.1), so the
    // quantized contribution is bit-identical on both engines; at 10⁹+
    // edges widen the products to DECIMAL(38,0) as vec_whiten does.
    // Shape: the shared persisted edge stage joined twice to the
    // node→nation map (a DIMENSION-sized broadcast: |customer|+|supplier|
    // rows), one community-keyed aggregate — no new corpus shuffle.
    // thin wrapper since round 13: the per-community modularity
    // contributions are the callable GraphAnalytics.modularity entry
    // point; the nation partition map (dimension-sized, broadcast by
    // the library) stays query-side.
    "graph_modularity" -> { (s, dir) =>
      val nc = Tables(s, dir, "customer")
        .select((col("c_custkey") * 2).as("node"), col("c_nationkey").as("comm"))
        .unionAll(Tables(s, dir, "supplier")
          .select((col("s_suppkey") * 2 + 1).as("node"),
            col("s_nationkey").as("comm")))
      GraphAnalytics.modularity(tradeEdges(s, dir), nc)
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

  private val coCtes =
    """ord_supp AS (
      | SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sp FROM lineitem),
      |pairs AS (
      | SELECT a.sp AS u, b.sp AS v, COUNT(*) AS w
      | FROM ord_supp a JOIN ord_supp b ON a.ok = b.ok AND a.sp < b.sp
      | GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |sadj AS (SELECT u AS node, v AS nbr, w FROM pairs
      |         UNION ALL SELECT v, u, w FROM pairs),
      |und AS (
      | SELECT DISTINCT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v
      | FROM (SELECT node, nbr,
      |        ROW_NUMBER() OVER (PARTITION BY node
      |          ORDER BY w DESC, nbr) AS rn
      |       FROM sadj) t WHERE rn <= 20),
      |adj AS (SELECT u AS node, v AS nbr FROM und
      |        UNION ALL SELECT v, u FROM und),
      |deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY 1)""".stripMargin

  /** Fixture-graph CTEs (see [[fixtureUnd]]) shared by the fixpoint
    * oracles. `fa0` is the symmetric adjacency; `fix_ew` the
    * (src, dst, w, outw) edge shape. */
  private val fixCtes =
    """fix_und AS (
      | SELECT CAST(n_nationkey AS BIGINT) AS u,
      |        CAST(n_nationkey + 1 AS BIGINT) AS v
      | FROM nation WHERE n_nationkey < 7
      | UNION ALL
      | SELECT CAST(a.n_nationkey AS BIGINT), CAST(b.n_nationkey AS BIGINT)
      | FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
      |   AND b.n_nationkey <> a.n_nationkey + 1
      | WHERE a.n_nationkey < 4 AND b.n_nationkey < 4
      | UNION ALL
      | SELECT CAST(a.n_nationkey AS BIGINT), CAST(b.n_nationkey AS BIGINT)
      | FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
      | WHERE a.n_nationkey BETWEEN 20 AND 23
      |   AND b.n_nationkey BETWEEN 20 AND 23),
      |fa0 AS MATERIALIZED (SELECT u AS node, v AS nbr FROM fix_und
      |        UNION ALL SELECT v, u FROM fix_und),
      |fix_ew AS (SELECT node AS src, nbr AS dst, CAST(1 AS BIGINT) AS w,
      |           COUNT(*) OVER (PARTITION BY node) AS outw FROM fa0)"""
      .stripMargin

  /** The unrolled-SQL convergence oracles: the engine iterates to a
    * probe-driven fixpoint; the oracle unrolls a FIXED round count
    * chosen from the fixture's measured behavior. For the idempotent
    * fixpoints (k-core, LPA) the unroll is convergence + slack —
    * extra rounds are no-ops, so the oracle equals the fixpoint
    * whatever round the engine stopped at. PageRank never goes
    * idempotent (limit cycle), so its unroll must be EXACTLY the
    * round at which the engine's delta probe first fires (18 at
    * eps = 20000) — GraphIterateSpec pins that count so fixture or
    * epsilon drift breaks a test before it breaks the oracle gate. */
  // AS MATERIALIZED is load-bearing: DuckDB inlines CTEs by default,
  // and each peel round references the previous round THREE times
  // (the adjacency scan + both endpoint semijoins), so an inlined
  // 8-round unroll expands into 3^8 ≈ 6.5k scans of the base parquet
  // — enough to exhaust the process fd limit before it's even slow.
  // Materializing each round keeps the oracle linear in rounds.
  private def kcorePeelsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""fd$i AS MATERIALIZED (
         | SELECT node FROM fa${i - 1} GROUP BY node HAVING COUNT(*) >= 2),
         |fa$i AS MATERIALIZED (
         | SELECT x.node, x.nbr FROM fa${i - 1} x
         | JOIN fd$i n ON n.node = x.node JOIN fd$i m ON m.node = x.nbr)"""
        .stripMargin
    }.mkString(",\n")

  private def lpaRoundsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""fl$i AS (
         | SELECT node, community FROM (
         |  SELECT a.node, l.community,
         |   ROW_NUMBER() OVER (PARTITION BY a.node
         |     ORDER BY COUNT(*) DESC, l.community) AS rn
         |  FROM fa0 a JOIN fl${i - 1} l ON l.node = a.nbr
         |  GROUP BY a.node, l.community) t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private def prRoundsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""fi$i AS (
         | SELECT dst AS node,
         |  CAST(150000 + (850000::HUGEINT *
         |    SUM((CAST(r_q AS HUGEINT) * w) // outw)) // 1000000
         |   AS BIGINT) AS r_q
         | FROM fix_ew JOIN fi${i - 1} ON fi${i - 1}.node = fix_ew.src
         | GROUP BY dst)""".stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "graph_kcore_fixpoint" ->
      s"""WITH $fixCtes,
        |${kcorePeelsSql(8)}
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        |FROM fa8 GROUP BY node""".stripMargin,
    "graph_lpa_fixpoint" ->
      s"""WITH $fixCtes,
        |fl0 AS (SELECT DISTINCT node, node AS community FROM fa0),
        |${lpaRoundsSql(8)}
        |SELECT node, CAST(community AS BIGINT) AS community FROM fl8"""
        .stripMargin,
    "graph_pagerank_fixpoint" ->
      s"""WITH $fixCtes,
        |fi0 AS (SELECT DISTINCT node, CAST(1000000 AS BIGINT) AS r_q
        |        FROM fa0),
        |${prRoundsSql(18)}
        |SELECT node, r_q FROM fi18""".stripMargin,
    // recursive BFS: the (node, dist) product is bounded by the 50-hop
    // cap (≫ the fixture eccentricity), UNION dedups per level, MIN
    // collapses to shortest — identical to the engine's relax fixpoint
    "graph_sssp_fixpoint" ->
      s"""WITH RECURSIVE $fixCtes,
        |bfs AS (
        | SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
        | UNION
        | SELECT a.nbr, b.dist + 1
        | FROM bfs b JOIN fa0 a ON a.node = b.node
        | WHERE b.dist < 50)
        |SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node""".stripMargin,
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
        |GROUP BY degree""".stripMargin,
    "graph_triangle_count" ->
      s"""WITH $coCtes,
        |wdeg AS (
        | SELECT u, v, du.d AS du, dv.d AS dv
        | FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
        |ori AS (
        | SELECT CASE WHEN du <= dv THEN u ELSE v END AS src,
        |        CASE WHEN du <= dv THEN v ELSE u END AS dst,
        |        CASE WHEN du <= dv THEN dv ELSE du END AS ddeg
        | FROM wdeg),
        |tri AS (
        | SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        | FROM ori e1
        | JOIN ori e2 ON e1.src = e2.src
        |  AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
        | JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM (SELECT a AS node FROM tri
        |      UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri) corners
        |GROUP BY node""".stripMargin,
    "graph_kcore" ->
      s"""WITH $coCtes,
        |d1 AS (SELECT node FROM adj GROUP BY node HAVING COUNT(*) >= 3),
        |a1 AS (SELECT x.node, x.nbr FROM adj x
        |       JOIN d1 n ON n.node = x.node JOIN d1 m ON m.node = x.nbr),
        |d2 AS (SELECT node FROM a1 GROUP BY node HAVING COUNT(*) >= 3),
        |a2 AS (SELECT x.node, x.nbr FROM a1 x
        |       JOIN d2 n ON n.node = x.node JOIN d2 m ON m.node = x.nbr),
        |d3 AS (SELECT node FROM a2 GROUP BY node HAVING COUNT(*) >= 3),
        |a3 AS (SELECT x.node, x.nbr FROM a2 x
        |       JOIN d3 n ON n.node = x.node JOIN d3 m ON m.node = x.nbr)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        |FROM a3 GROUP BY node""".stripMargin,
    "graph_label_propagation" ->
      s"""WITH $coCtes,
        |l0 AS (SELECT DISTINCT node, node AS community FROM adj),
        |l1 AS (
        | SELECT node, community FROM (
        |  SELECT a.node, l.community,
        |   ROW_NUMBER() OVER (PARTITION BY a.node
        |     ORDER BY COUNT(*) DESC, l.community) AS rn
        |  FROM adj a JOIN l0 l ON l.node = a.nbr
        |  GROUP BY a.node, l.community) t WHERE rn = 1),
        |l2 AS (
        | SELECT node, community FROM (
        |  SELECT a.node, l.community,
        |   ROW_NUMBER() OVER (PARTITION BY a.node
        |     ORDER BY COUNT(*) DESC, l.community) AS rn
        |  FROM adj a JOIN l1 l ON l.node = a.nbr
        |  GROUP BY a.node, l.community) t WHERE rn = 1),
        |l3 AS (
        | SELECT node, community FROM (
        |  SELECT a.node, l.community,
        |   ROW_NUMBER() OVER (PARTITION BY a.node
        |     ORDER BY COUNT(*) DESC, l.community) AS rn
        |  FROM adj a JOIN l2 l ON l.node = a.nbr
        |  GROUP BY a.node, l.community) t WHERE rn = 1)
        |SELECT node, CAST(community AS BIGINT) AS community FROM l3"""
        .stripMargin,
    "graph_jaccard_topk" ->
      s"""WITH $coCtes,
        |common AS (
        | SELECT x.node AS a, y.node AS b, COUNT(*) AS inter
        | FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        | GROUP BY 1, 2)
        |SELECT a, b, CAST(inter AS BIGINT) AS inter,
        | CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
        | CAST(inter * 1000000 // (da.d + db.d - inter) AS BIGINT) AS jacc_micro
        |FROM common JOIN deg da ON da.node = a JOIN deg db ON db.node = b
        |ORDER BY jacc_micro DESC, a, b LIMIT 20""".stripMargin,
    "graph_hits" ->
      s"""WITH $edgeCtes,
        |de AS (SELECT src, dst, w FROM edges WHERE src % 2 = 0),
        |a1raw AS (
        | SELECT dst, SUM(w) * 1000000 AS araw FROM de GROUP BY 1),
        |a1t AS (SELECT SUM(araw) AS at FROM a1raw),
        |a1 AS (SELECT dst, araw * 1000000 // at AS a FROM a1raw, a1t),
        |h1raw AS (
        | SELECT de.src, SUM(a1.a * de.w) AS hraw
        | FROM de JOIN a1 ON a1.dst = de.dst GROUP BY 1),
        |h1t AS (SELECT SUM(hraw) AS ht FROM h1raw),
        |h1 AS (SELECT src, hraw * 1000000 // ht AS h FROM h1raw, h1t),
        |a2raw AS (
        | SELECT de.dst, SUM(h1.h * de.w) AS araw2
        | FROM de JOIN h1 ON h1.src = de.src GROUP BY 1),
        |a2t AS (SELECT SUM(araw2) AS at2 FROM a2raw),
        |a2 AS (SELECT dst, araw2 * 1000000 // at2 AS a2 FROM a2raw, a2t)
        |SELECT src AS node, CAST(h AS BIGINT) AS score_micro,
        | 'hub' AS kind FROM h1
        |UNION ALL
        |SELECT dst, CAST(a2 AS BIGINT), 'authority' FROM a2""".stripMargin,
    "graph_modularity" ->
      s"""WITH $edgeCtes,
        |nc AS (
        | SELECT c_custkey * 2 AS node, c_nationkey AS comm FROM customer
        | UNION ALL
        | SELECT s_suppkey * 2 + 1 AS node, s_nationkey AS comm FROM supplier),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM edges),
        |per AS (
        | SELECT ns.comm AS community,
        |  CAST(SUM(e.w) AS BIGINT) AS d_c,
        |  CAST(SUM(CASE WHEN ns.comm = nd.comm THEN e.w ELSE 0 END)
        |       AS BIGINT) AS intra_w
        | FROM edges e
        | JOIN nc ns ON ns.node = e.src
        | JOIN nc nd ON nd.node = e.dst
        | GROUP BY 1)
        |SELECT community, d_c, intra_w, w_total,
        | CAST(FLOOR(CAST(intra_w * w_total - d_c * d_c AS DOUBLE)
        |   / (CAST(w_total AS DOUBLE) * CAST(w_total AS DOUBLE))
        |   * 1e6 + 0.5) AS BIGINT) AS q_contrib_micro
        |FROM per, tot""".stripMargin)
}
