package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions._

/** User-facing similarity-search library: DataFrame in → DataFrame out,
  * no fixture coupling. Column contract (documented rather than
  * parameterized so the call sites stay readable): query sides carry
  * `(query_id, va)`, corpus sides `(neighbor_id, vb)` with the vector
  * columns as `array<double>`. All cosine/dot arithmetic runs through
  * the fused codegen kernels (`CosineSim` / `DotProduct`), bit-identical
  * to the SQL folds the DuckDB oracles use.
  *
  * Scale design: the exact path broadcasts the (small) query batch so
  * the corpus is scanned once and never shuffled; the approximate paths
  * replace the cartesian with bucket equi-joins (hyperplane LSH tables,
  * IVF centroid buckets). The registered `SimilarityQueries` entries are
  * thin wrappers over these with the driver fixture's parameters. */
object Similarity {

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("cos", cosine_sim(col("va"), col("vb")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Exact cosine top-k: broadcast the query batch across the corpus
    * scan, rank per query. The corpus side is never shuffled — the
    * brute-force shape that holds at "small query batch × huge corpus". */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topK(corpus.crossJoin(broadcast(queries)), k)

  /** Random-hyperplane LSH top-k: `tables` hash tables of `bits` sign
    * bits each (one-pass `HyperplaneBuckets`, deterministic sign table);
    * candidates share a bucket in ≥ 1 table, then exact cosine ranks the
    * candidates. Recall depends on the table/bit trade; the bucket
    * equi-join replaces the corpus×corpus cartesian. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      tables: Int, bits: Int, dim: Int, k: Int): DataFrame = {
    def buckets(df: DataFrame, id: String, vec: String) =
      df.select(col(id), posexplode(hyperplane_buckets(col(vec), tables, bits, dim)))
        .select(col(id), col("pos").as("tbl"), col("col").as("bucket"))
    val q = buckets(queries, "query_id", "va")
    val c = buckets(corpus, "neighbor_id", "vb")
    // dedupe candidate id-pairs first, then join the vectors back —
    // avoids hashing array columns through the distinct.
    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    topK(cand
      .join(broadcast(queries), Seq("query_id"))
      .join(corpus, Seq("neighbor_id")), k)
  }

  /** Mean centroid per label with squared norms, `decimals`-rounded so
    * both engines score from identical inputs. Input `(label, v)`;
    * output `(c_label, c, cnorm2)`. */
  def meanCentroids(vectors: DataFrame, decimals: Int = 4): DataFrame =
    vectors
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("col")), decimals).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dm"))
      .select(col("label").as("c_label"), expr("transform(dm, s -> s.m)").as("c"))
      .withColumn("cnorm2", expr("aggregate(c, 0D, (a, x) -> a + x * x)"))

  /** IVF coarse quantizer: each vector `(vec_id, v)` → nearest centroid
    * by L2 (argmin over |c|² − 2·v·c; |v|² is constant per vector).
    * Centroids broadcast (small). Output `(vec_id, centroid)`. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignN(vectors, centroids, 1).drop("probe_rank")

  /** Multi-probe IVF assignment: each vector's `nprobe` nearest
    * centroids with their probe rank. Queries probe several adjacent
    * buckets to recover the recall lost at bucket boundaries, at a
    * bounded extra cost (nprobe × bucket size) — the corpus itself
    * stays single-assigned. */
  def ivfAssignN(vectors: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val w = Window.partitionBy("vec_id").orderBy(col("score"), col("c_label"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("score", col("cnorm2") - lit(2) *
        dot_product(col("v"), col("c")))
      .withColumn("probe_rank", row_number().over(w).cast("long"))
      .filter(col("probe_rank") <= nprobe)
      .select(col("vec_id"), col("c_label").as("centroid"), col("probe_rank"))
  }

  /** IVF search: probe only the query's centroid bucket, exact top-k
    * within it. Query side `(query_id, va, centroid)`, corpus side
    * `(neighbor_id, vb, centroid)` — both pre-assigned via [[ivfAssign]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topK(corpus.join(broadcast(queries), Seq("centroid")), k)

  /** Product-quantization code assignment — the storage scale path past
    * int8: `v` splits into `blocks` equal sub-vectors, each assigned to
    * its nearest sub-centroid by L2 (argmin over |c|² − 2·v·c per
    * block), so a vector stores as `blocks` small codes instead of
    * `dim` floats. The codebook (centroids × blocks sub-slices) is
    * broadcast; the corpus is scanned once with a narrow explode —
    * no shuffle of the vectors beyond the per-(vec, block) argmin
    * window on already-colocated rows.
    *
    * Input: `vectors` as `(vec_id, v)`, `centroids` as `(c_label, c)`
    * (e.g. from [[meanCentroids]]). Output: `(vec_id, block, code)`. */
  def pqAssign(vectors: DataFrame, centroids: DataFrame,
      blocks: Int, dim: Int): DataFrame = {
    require(dim % blocks == 0, s"dim ($dim) must split evenly into $blocks blocks")
    val d = dim / blocks
    def subSlices(vecCol: String, out: String): Column = explode(expr(
      s"transform(sequence(0, ${blocks - 1}), " +
        s"b -> struct(cast(b as bigint) as block, slice($vecCol, b * $d + 1, $d) as $out))"))
    val vb = vectors
      .select(col("vec_id"), subSlices("v", "vb").as("e"))
      .select(col("vec_id"), col("e.block").as("block"), col("e.vb").as("vb"))
    val cb = centroids
      .select(col("c_label"), subSlices("c", "cb").as("e"))
      .select(col("c_label"), col("e.block").as("block"), col("e.cb").as("cb"))
      .withColumn("cbnorm2", expr("aggregate(cb, 0D, (a, x) -> a + x * x)"))
    val w = Window.partitionBy("vec_id", "block").orderBy(col("score"), col("c_label"))
    vb.join(broadcast(cb), "block")
      .withColumn("score", col("cbnorm2") - lit(2) * dot_product(col("vb"), col("cb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("block"), col("c_label").as("code"))
  }

  /** PQ asymmetric-distance search (ADC): the corpus is represented ONLY
    * by its PQ codes (from [[pqAssign]]); each query precomputes a
    * per-(block, code) distance table against the codebook, the tiny
    * table broadcasts, and corpus codes join it — so the 10⁹-vector scan
    * touches no floats, just a code equi-join and an integer sum.
    *
    * Distances are quantized to integers (`floor(d·10⁹ + 0.5)`) BEFORE
    * the per-vector sum so the 4-way addition is order-free and
    * deterministic on any engine — float sums over an unordered group
    * would differ in the last ulp run to run.
    *
    * Input: `queries` as `(query_id, va)`, `codes` as
    * `(neighbor_id, block, code)`, `centroids` as `(c_label, c)`.
    * Output: `(query_id, neighbor_id, rnk)` — top-k by approximate L2. */
  def pqTopK(queries: DataFrame, codes: DataFrame, centroids: DataFrame,
      blocks: Int, dim: Int, k: Int): DataFrame = {
    require(dim % blocks == 0, s"dim ($dim) must split evenly into $blocks blocks")
    val d = dim / blocks
    val cb = centroids
      .select(col("c_label"), explode(expr(
        s"transform(sequence(0, ${blocks - 1}), " +
          s"b -> struct(cast(b as bigint) as block, slice(c, b * $d + 1, $d) as cb))")).as("e"))
      .select(col("c_label").as("code"), col("e.block").as("block"), col("e.cb").as("cb"))
      .withColumn("cbnorm2", expr("aggregate(cb, 0D, (a, x) -> a + x * x)"))
    val lut = queries.crossJoin(broadcast(cb))
      .withColumn("qb", expr(s"slice(va, block * $d + 1, $d)"))
      .withColumn("dist",
        expr("aggregate(qb, 0D, (a, x) -> a + x * x)") +
          col("cbnorm2") - lit(2) * dot_product(col("qb"), col("cb")))
      .select(col("query_id"), col("block"), col("code"),
        expr("cast(floor(dist * 1e9 + 0.5d) as bigint)").as("dist_i"))
    val w = Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    codes.join(broadcast(lut), Seq("block", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("dist_i").as("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** IVF + PQ — the trillion-vector layout: the corpus is bucketed by
    * coarse centroid ([[ivfAssign]]) AND stored as PQ codes
    * ([[pqAssign]]); a query probes only its own centroid bucket and
    * scores candidates by the broadcast ADC distance table, so the scan
    * touches neither foreign buckets nor raw floats. Same integer-
    * quantized order-free distance sums as [[pqTopK]].
    *
    * Input: `queries` as `(query_id, va, centroid)`, `codes` as
    * `(neighbor_id, block, code, centroid)` — both pre-assigned.
    * Output: `(query_id, neighbor_id, rnk)`. */
  def ivfPqTopK(queries: DataFrame, codes: DataFrame, centroids: DataFrame,
      blocks: Int, dim: Int, k: Int): DataFrame = {
    require(dim % blocks == 0, s"dim ($dim) must split evenly into $blocks blocks")
    val d = dim / blocks
    val cb = centroids
      .select(col("c_label"), explode(expr(
        s"transform(sequence(0, ${blocks - 1}), " +
          s"b -> struct(cast(b as bigint) as block, slice(c, b * $d + 1, $d) as cb))")).as("e"))
      .select(col("c_label").as("code"), col("e.block").as("block"), col("e.cb").as("cb"))
      .withColumn("cbnorm2", expr("aggregate(cb, 0D, (a, x) -> a + x * x)"))
    val lut = queries.select(col("query_id"), col("va"), col("centroid").as("qc"))
      .crossJoin(broadcast(cb))
      .withColumn("qb", expr(s"slice(va, block * $d + 1, $d)"))
      .withColumn("dist",
        expr("aggregate(qb, 0D, (a, x) -> a + x * x)") +
          col("cbnorm2") - lit(2) * dot_product(col("qb"), col("cb")))
      .select(col("query_id"), col("qc"), col("block"), col("code"),
        expr("cast(floor(dist * 1e9 + 0.5d) as bigint)").as("dist_i"))
    val w = Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    codes.join(broadcast(lut), Seq("block", "code"))
      .filter(col("centroid") === col("qc")) // bucket probe
      .groupBy("query_id", "neighbor_id")
      .agg(sum("dist_i").as("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }
}
