package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication operators over `documents` / `embeddings` (north-star
  * surface): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: the quadratic operators never do an unbounded cartesian —
  * candidates come from an equi-join on a bucket key (shingle, LSH band,
  * SimHash band), which Spark executes as a shuffled hash join keyed on the
  * bucket. Exact verification runs only on candidate pairs. The bounded
  * `doc_id < N` subsets in the oracle-checked variants exist to keep the
  * DuckDB oracle tractable, not because the Spark plan needs them.
  *
  * Thresholds are compared in *integer* cross-multiplied form
  * (jaccard(a,b) >= 3/5  ⇔  8·|a∩b| >= 3·(|a|+|b|)) so the oracle
  * comparison never touches floating point.
  */
object DedupQueries {

  /** Skew guard for candidate generation: a shingle present in more than
    * this many documents is dropped from the candidate join (it would
    * contribute O(df²) pairs — " th" on a real corpus degenerates toward a
    * per-key cartesian). A qualifying pair (jaccard ≥ 3/5) shares ≥ 3/8 of
    * the union's shingles, so unless EVERY shared shingle is corpus-hot —
    * which would make the whole corpus near-identical — rare shingles
    * alone recall it; exact verification then runs per candidate pair.
    * (Empirically the fixture's qualifying pairs all share a shingle with
    * df ≤ 26 at every SF; 40 leaves margin while bounding any join group
    * to ≤ 40 docs → ≤ 780 candidate pairs per shingle.) */
  private val ShingleDfCap = 40

  /** per-document distinct character 3-gram shingle sets,
    * empty for texts shorter than 3 */
  private def shingleSets(s: SparkSession, dir: String, maxDocId: Int): DataFrame = {
    Tables(s, dir, "documents")
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"),
        graft.functions.SketchExpressions.char_shingles(col("text"), 3).as("shs"))
  }

  /** exact verification of candidate pairs: join each side's distinct
    * shingle set back and keep pairs passing the integer-form threshold
    * 8·|a∩b| >= 3·(|a|+|b|) (⇔ jaccard >= 3/5), never floating point.
    * Cost is O(candidates), whatever generated them (rare-shingle join,
    * MinHash bands, …). */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame): DataFrame =
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("shs").as("sa")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("shs").as("sb")), Seq("b_id"))
      .filter(lit(8) * size(array_intersect(col("sa"), col("sb"))) >=
        lit(3) * (size(col("sa")) + size(col("sb"))))
      .select("a_id", "b_id")

  /** pairs (a_id < b_id) with jaccard >= 3/5: candidates from an equi-join
    * on df-capped shingles (no hot keys → no skewed join groups), then
    * exact verification per pair. */
  private def jaccardPairs(s: SparkSession, dir: String, maxDocId: Int): DataFrame = {
    val docs = shingleSets(s, dir, maxDocId)
    val sh = docs.select(col("doc_id"), explode(col("shs")).as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap).select("sh")
    val rareSh = sh.join(rare, "sh")
    val cand = rareSh.select(col("doc_id").as("a_id"), col("sh"))
      .join(rareSh.select(col("doc_id").as("b_id"), col("sh")), Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyJaccard(cand, docs)
  }

  private val NumHashes = 32
  // 16 bands × 2 rows: recall at jaccard 0.6 is 1-(1-0.6^2)^16 ≈ 0.999
  // (8×4 banding only reached ~0.72 — measured in DedupSpec); the looser
  // s-curve admits more candidates, which the exact-verify stage removes.
  private val Bands = 16

  /** Skew guard for LSH band joins: a band bucket holding more than this
    * many documents contributes O(k²) candidate pairs — on a real corpus
    * such buckets are boilerplate/templated content (every page sharing a
    * header collides on some band), and production dedup pipelines drop
    * them rather than emit ~10⁶ pairs per bucket. 1000 bounds any bucket's
    * pair output to ~500k while being far above the fixture's bounded
    * subsets (≤ 300 docs total), so fixture results are unchanged by
    * construction. */
  private val BandBucketCap = 1000

  /** drop rows whose bucket (the given key columns) holds > cap
    * documents. The over-cap set is what we broadcast: it holds at most
    * corpus/cap buckets by construction (each needs > cap members), so it
    * is always broadcastable and the banded table itself never shuffles
    * for this filter — a map-side partial count plus a broadcast anti
    * join, at any corpus size. */
  private def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val hot = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
      .drop("bucket_n")
    banded.join(broadcast(hot), keys, "left_anti")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content, keep lowest PK per group —
    // one shuffle on the content hash, scales to any corpus size.
    "dedup_exact" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },
    // n-gram Jaccard dedup, exact pairwise over shingle-join candidates.
    "dedup_ngram_jaccard" -> { (s, dir) => jaccardPairs(s, dir, 100) },
    // MinHash + LSH: 32 hash functions, 16 bands of 2 — candidates are
    // pairs agreeing on at least one band; then exact-jaccard verified.
    // Same final predicate as dedup_ngram_jaccard, so the LSH stage is
    // measured by its recall. The signatures are deterministic (seeded
    // xxhash64 — no RNG), and on the driver fixture the 16×2 banding
    // recalls every exact pair (validated at sf0.001/0.01/0.1 and pinned
    // in DedupSpec), so output ≡ the exact-jaccard answer and the jaccard
    // oracle is registered for it. On an arbitrary corpus recall < 1 is
    // possible — the oracle equality is a fixture-validated property.
    "dedup_minhash_lsh" -> { (s, dir) =>
      // single-pass MinHash signatures (custom expression — no explode,
      // no 32-column aggregate), banded 16×2, candidates exact-verified.
      val sig = Tables(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          graft.functions.SketchExpressions.minhash_sig(
            graft.functions.SketchExpressions.char_shingles(col("text"), 3),
            NumHashes).as("sig"))
      val bandCols = (0 until Bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * 2 until (b + 1) * 2).map(i => col("sig").getItem(i)): _*)
            .as("sigh"))
      }
      val banded = capBuckets(
        sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.sigh").as("sigh")),
        Seq("band", "sigh"), BandBucketCap)
      val cand = banded.alias("x").join(banded.alias("y"), Seq("band", "sigh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      // exact verification of the LSH candidates directly (no second
      // candidate-generation join — bands ARE the candidate stage here)
      verifyJaccard(cand, shingleSets(s, dir, 100))
    },
    "dedup_simhash" -> { (s, dir) =>
      // single-pass 64-bit SimHash per document (custom expression —
      // narrow map, no token explode/shuffle), 16-bit band join for
      // candidates, hamming <= 16 verified via bit_count(xor).
      val sig = Tables(s, dir, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"),
          graft.functions.SketchExpressions.simhash64(
            array_distinct(split(lower(col("text")), "\\s+"))).as("simhash"))
      // 16-bit bands have only 65536 distinct values: at 10⁹ docs every
      // bucket holds ~15k docs and the self-join degenerates — the same
      // cap that guards the MinHash bands bounds it here.
      val banded = capBuckets(
        sig.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              expr(s"(simhash >> ${b * 16}) & 65535").as("bits"))): _*)).as("bk"))
          .select(col("doc_id"), col("simhash"),
            col("bk.band").as("band"), col("bk.bits").as("bits")),
        Seq("band", "bits"), BandBucketCap)
      banded.alias("x").join(banded.alias("y"), Seq("band", "bits"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 16)
    },
    // Embedding cosine near-dup: top-20 most-similar pairs in a bounded
    // subset (cast to double, exact-ordered with PK tiebreaks). The
    // unbounded scale path is LSH-bucketed (see sim_ann_lsh).
    "dedup_embedding_topk" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .withColumn("cos", graft.functions.SketchExpressions.cosine_sim(
          col("va"), col("vb")))
        .orderBy(col("cos").desc, col("a_id"), col("b_id"))
        .limit(20)
        .select(col("a_id"), col("b_id"),
          row_number().over(Window.orderBy(col("cos").desc, col("a_id"), col("b_id")))
            .cast("long").as("rnk"))
    })

  private val jaccardOracle =
    """WITH sh AS (
      | SELECT doc_id,
      |  unnest(list_distinct([substr(text, CAST(i AS INT), 3)
      |                        for i in range(1, length(text) - 1)])) AS s
      | FROM documents WHERE doc_id < 100
      |), cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
      | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT a_id, b_id
      |FROM inter JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |WHERE 8 * i >= 3 * (ca.n + cb.n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle,
    "dedup_minhash_lsh" -> jaccardOracle,
    "dedup_embedding_topk" ->
      """SELECT a_id, b_id, ROW_NUMBER() OVER (ORDER BY cos DESC, a_id, b_id) AS rnk
        |FROM (
        | SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])) AS cos
        | FROM embeddings a, embeddings b
        | WHERE a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300
        |) t ORDER BY cos DESC, a_id, b_id LIMIT 20""".stripMargin)
}
