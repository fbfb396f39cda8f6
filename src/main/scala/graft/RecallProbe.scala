package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Recall

/** Recall-audit main: measures candidate-stage recall of the two
  * approximate dedup pipelines against exact ground truth on a bounded
  * stratum of SPARK_GRAFT_SF_DIR — run it against the ScaleUp-rotated
  * corpus so the numbers reflect decorrelated content, not the tiny
  * fixture whose construction makes recall 1.0 trivially.
  *
  * Strata: documents with doc_id % docMod == 0 (docMod from args(0)),
  * embeddings with vec_id % vecMod == 0 (vecMod from args(1)); defaults
  * chosen so a 10× sf0.1 corpus lands ≈ 2–3k rows per stratum, inside
  * Recall.maxStratum.
  *
  * Prints ONE JSON line:
  * {"lsh":{n_docs,n_truth,n_cand,n_hit,recall},"ivf":{...}} — recorded
  * in PERF.md per round. Dev tooling, not library surface. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val docMod = args.headOption.flatMap(_.toIntOption).getOrElse(23)
    val vecMod = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(7)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % docMod === 0)
    // same parameters the registered dedup_minhash_lsh deploys
    val lsh = Recall.lshCandidateRecall(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, num = 3, den = 8).collect()(0)

    val vecs = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") % vecMod === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    // deployed coarse quantizer: label-mean centroids over the FULL
    // corpus (what sharedStages trains), assignment restricted to the
    // stratum by the join inside ivfCandidateRecall
    val cent = graft.operators.Similarity.meanCentroids(
      Tables(spark, sfDir, "embeddings")
        .select(col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v")))
      .persist()
    // the recall/cost dial: nprobe=1 is dedup_semantic as deployed
    // (single-bucket SemDeDup); 2 and 4 measure what multi-probe
    // assignment buys back at bucket boundaries. tau=0.3 is the
    // deployed threshold (loose — many moderate-similarity pairs
    // straddle buckets); tau=0.8 is the near-duplicate regime where
    // true pairs are geometrically close and bucketing should hold.
    val ivfByProbe = Seq(1, 2, 4).map { p =>
      val assign = graft.operators.Similarity.ivfAssignN(vecs, cent, p)
      p -> Recall.ivfCandidateRecall(vecs, assign, tau = 0.3).collect()(0)
    }
    val ivfNearDup = Recall.ivfCandidateRecall(vecs,
      graft.operators.Similarity.ivfAssignN(vecs, cent, 1), tau = 0.8)
      .collect()(0)
    cent.unpersist(false)

    def j(r: org.apache.spark.sql.Row): String = {
      val rec = if (r.isNullAt(4)) "null" else f"${r.getDouble(4)}%.4f"
      s"""{"n_docs":${r.getLong(0)},"n_truth":${r.getLong(1)},""" +
        s""""n_cand":${r.getLong(2)},"n_hit":${r.getLong(3)},"recall":$rec}"""
    }
    val probes = ivfByProbe.map { case (p, r) => s""""probe$p":${j(r)}""" }
      .mkString(",")
    println(s"""{"sf_dir":"$sfDir","doc_mod":$docMod,"vec_mod":$vecMod,""" +
      s""""lsh":${j(lsh)},"ivf_tau03":{$probes},""" +
      s""""ivf_tau08_probe1":${j(ivfNearDup)}}""")
    spark.stop()
  }
}
