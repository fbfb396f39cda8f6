package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Measured-recall floors for the approximate candidate stages (the
  * r8 verdict ask: numbers, not s-curve arguments). Ground truth is
  * exact all-pairs on the bounded sf0.001 fixture via
  * [[Recall]]; the 10× rotated-corpus numbers live in PERF.md
  * (lsh 0.9994; ivf probe1/2/4 = 0.23/0.62/0.99 at tau 0.3, 0.92 at
  * the 0.8 near-dup bar). Floors here sit under the measured fixture
  * values (lsh 0.9998, ivf probe4 0.9815) with margin for hash/seed
  * changes to fail loudly rather than drift silently. */
class RecallSpec extends SparkTestBase {

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
  private lazy val cent = Similarity.meanCentroids(
    Tables(spark, sfDir, "embeddings")
      .select(col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v")))

  test("minhash-LSH candidate recall >= 0.99 vs exact Jaccard (deployed 32x16 banding)") {
    val r = Recall.lshCandidateRecall(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, num = 3, den = 8).collect()(0)
    assert(r.getLong(1) > 0, "fixture must contain true near-dup pairs")
    assert(!r.isNullAt(4) && r.getDouble(4) >= 0.99,
      s"LSH recall ${r.getDouble(4)} below floor (truth=${r.getLong(1)}, " +
        s"hit=${r.getLong(3)})")
  }

  test("IVF multi-probe dial: recall rises with nprobe, probe4 >= 0.9") {
    val Seq(r1, r4) = Seq(1, 4).map { p =>
      Recall.ivfCandidateRecall(vecs,
        Similarity.ivfAssignN(vecs, cent, p), tau = 0.3).collect()(0)
    }
    assert(r1.getLong(1) > 0, "fixture must contain true cosine>=0.3 pairs")
    val (rec1, rec4) = (r1.getDouble(4), r4.getDouble(4))
    assert(rec4 > rec1,
      s"multi-probe must add recall: probe1=$rec1 probe4=$rec4")
    assert(rec4 >= 0.9, s"probe4 recall $rec4 below floor")
    // single-bucket SemDeDup at a loose tau is PARTIAL by design —
    // pin the measured regime so a silent behavior change (e.g. the
    // assignment degenerating to one bucket, recall -> 1.0) fails
    assert(rec1 < 0.5,
      s"probe1 recall $rec1 looks degenerate — bucket structure collapsed?")
  }

  test("all-pairs ground truth refuses an unbounded stratum") {
    val big = spark.range(Recall.maxStratum + 1L)
      .select(col("id").as("doc_id"), lit("x").as("text"))
    val e = intercept[IllegalArgumentException] {
      Recall.lshCandidateRecall(big, "doc_id", "text")
    }
    assert(e.getMessage.contains("stratum"))
  }
}
