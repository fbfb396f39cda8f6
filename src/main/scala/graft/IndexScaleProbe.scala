package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Similarity, SimilarityQueries}

/** Index-lifecycle scale probe (round 10): builds a persisted ANN index
  * over `SPARK_GRAFT_SF_DIR`'s embeddings with `Similarity.buildIndex`
  * and NO k argument — the adaptive-quantizer default a user gets — then
  * times `sim_ann_ivf` served from the saved index
  * (`spark.graft.ann.indexDir`) vs trained in-session. Run against the
  * ScaleUp-rotated corpora to produce the scaling entries PERF.md
  * records for the default-built index path.
  *
  * args: indexDir [rebuild]  — reuses an existing index unless
  * `rebuild` is passed (build time is reported only when built here).
  *
  * Prints ONE JSON line:
  * {"n_vectors":N,"n_centroids":K,"imbalance":X,"build_sec":B,
  *  "serve_sec":S,"train_sec":T}
  * Dev tooling, not library surface. */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val indexDir = args.headOption.getOrElse("target/annindex")
    val rebuild = args.contains("rebuild")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val vecs = Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (stats, buildSec) =
      if (rebuild || !Similarity.pathExists(spark, s"$indexDir/centroids.parquet"))
        secs(Similarity.buildIndex(vecs, indexDir))
      else (Similarity.indexStats(spark, indexDir), 0.0)

    def run(s: SparkSession): Double = {
      val (_, t) = secs {
        SparkEntry.queries("sim_ann_ivf")(s, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      Similarity.releaseStages(s)
      t
    }
    // served: fresh session pinned to the saved index (shared stages
    // come straight off parquet — zero training in the plan)
    val served = spark.newSession()
    served.conf.set("spark.graft.ann.indexDir", indexDir)
    val warmup = run(served) // parquet-reader/codegen init
    val serveSec = run(served)
    // trained: same query with no index conf — the in-session path
    val trained = spark.newSession()
    val trainSec = run(trained)
    println(s"""{"n_vectors":${stats.nVectors},""" +
      s""""n_centroids":${stats.nCentroids},""" +
      s""""imbalance":${BigDecimal(stats.imbalance)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""build_sec":${BigDecimal(buildSec).setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""warmup_sec":${BigDecimal(warmup).setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""serve_sec":${BigDecimal(serveSec).setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""train_sec":${BigDecimal(trainSec).setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
