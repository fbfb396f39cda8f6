package graft
import org.apache.spark.sql.SparkSession
/** Dev-only ordering/cache-pressure probe: run the named queries IN THE
  * GIVEN ORDER (k passes each, min/median/max) inside one session and
  * print the session's persisted-block footprint after every query —
  * the tool for "is query B slow because query A left state behind?"
  * experiments (the vec_norms / vec_pca_power_iter question from the
  * round-5/6 bench). Args: query names; env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_K as in Bench. Not part of the
  * library surface. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val k = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_K")
      .flatMap(_.toIntOption).getOrElse(3))
    val spark = GraftSession.configure(SparkSession.builder()
      .master(GraftSession.masterFor(cpus))
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(cpus))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // standard self-describing header — floor_report.py lifts this line
    // into the artifact's _meta so BENCH_floor carries the same
    // master/mode/git_sha/classes_md5 provenance as every other artifact
    println(s"[meta] ${RunMeta.json(spark, sfDir)}")
    // same untimed warmup as Bench
    try SparkEntry.queries("q14_promo_share")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def cacheFootprint(): String = {
      val rdds = spark.sparkContext.getPersistentRDDs.values.toSeq
      val info = spark.sparkContext.getRDDStorageInfo
      val mem = info.map(_.memSize).sum
      s"persistedRDDs=${rdds.size} storedBlocks=${info.map(_.numCachedPartitions).sum} mem=${mem / 1024 / 1024}MB"
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to k).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median (mean of the middle pair at even k — same formula
      // as Bench.median, not the upper middle element)
      val med = if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      println(f"[probe] $name%-24s min=${times.head}%.3f med=$med%.3f max=${times.last}%.3f | ${cacheFootprint()}")
    }
    spark.stop()
  }
}
