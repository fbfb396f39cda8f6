package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line with total seconds
  * plus per-query seconds for the headline set. The driver only keeps the
  * tail of stdout, so the stdout JSON is kept small enough (~1 KB) to
  * survive intact and parse; the full per-query breakdown goes to stderr
  * and to target/bench_full.json for round-over-round analysis.
  * Each query is fully materialized via a noop-format write (count()
  * would let Spark skip computing projected columns).
  *
  * Methodology: each query runs SPARK_GRAFT_BENCH_K times (default 3)
  * and reports the MINIMUM — PERF.md documents a 108–270 s ambient
  * spread for the identical binary under host load, so single-pass
  * numbers made round-over-round deltas noise; min-of-k is the standard
  * way to estimate the load-free cost. The first-pass sum is kept
  * alongside (`pass1_total`) for continuity with BENCH_r01–r03. */
object Bench {

  /** representative slice across scans/joins/aggs/windows/dedup/ANN/text */
  private val headline = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "q10_returned_revenue", "q18_large_orders", "sql_q6_forecast_revenue",
    "win_running_total", "o2_offset_pagination", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "sim_topk_bruteforce",
    "sim_ann_lsh", "sim_ann_ivf", "text_langid", "text_chunk_dedup",
    "vec_centroids", "mm_frame_sample", "asof_merge_join", "dedup_semantic",
    "dedup_keep_best", "sim_recall_at_k", "cur_epoch_mix")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/parquet-reader init lands here
    // instead of inflating the alphabetically-first query's slot
    try SparkEntry.queries("q14_promo_share")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // malformed K falls back to the default instead of aborting the
    // whole bench before any query has run
    val k = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_K")
      .flatMap(_.toIntOption).getOrElse(3))
    def timeOnce(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // (name, min-of-k, first-pass) — the k passes per query run
    // back-to-back so each query's min sees the same ambient load window
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to k).map(_ => timeOnce(name, fn))
      (name, times.min, times.head)
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def json(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pass1Total = results.map(_._3).sum
    val head = results.collect { case (n, m, _) if headline.contains(n) => n -> m }
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
      s""","n_queries":${results.size},"k":$k,"pass1_total":${fmt(pass1Total)}""" +
      s""","queries":${json(head)},"sf":"$sfDir"}"""
    // full breakdown: stderr + file (NOT stdout — keeps the parsed line small)
    System.err.println(s"[bench] full min-of-$k: ${json(results.map(r => r._1 -> r._2))}")
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("bench_full.json"),
        s"""{"total":${fmt(total)},"k":$k,"pass1_total":${fmt(pass1Total)},""" +
          s""""queries":${json(results.map(r => r._1 -> r._2))},""" +
          s""""queries_pass1":${json(results.map(r => r._1 -> r._3))},"sf":"$sfDir"}""")
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
