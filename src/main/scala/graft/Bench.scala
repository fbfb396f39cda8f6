package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line whose `queries` map
  * carries the FULL per-query min-of-k breakdown (r4 shipped only a
  * ~23-query headline slice there, which made round-over-round diffs
  * manual — the full map is ~4.5 KB, well within a stdout line). The
  * same breakdown also lands in target/bench_full.json (with first-pass
  * times alongside) as the file-shaped artifact. Nothing else prints to
  * stdout, and the former stderr copy of the map is gone, so the line
  * is the last thing the process emits.
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
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
      s""","n_queries":${results.size},"k":$k,"pass1_total":${fmt(pass1Total)}""" +
      s""","queries":${json(results.map(r => r._1 -> r._2))},"sf":"$sfDir"}"""
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
