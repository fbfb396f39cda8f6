package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase}

/** Train-once / search-forever: a saved ANN index reloads in a fresh
  * session with bit-identical results and no trace of the training
  * pipeline in the search plans. */
class IndexPersistenceSpec extends SparkTestBase {

  test("saveIndex → loadIndex round-trips centroids, assignment, and " +
      "codebook bit-exactly") {
    val dir = Files.createTempDirectory("graft-index").toString
    val (cent, assign) = SimilarityQueries.sharedStages(spark, sfDir)
    val cb = Similarity.pqCodebook(cent, blocks = 4, dim = 64)
    Similarity.saveIndex(dir, cent, assign, Some(cb))
    val (cent2, assign2) = Similarity.loadIndex(spark, dir)
    val cb2 = Similarity.loadPqCodebook(spark, dir)
    // exact equality both directions — doubles round-trip through parquet
    assert(cent2.except(cent).isEmpty && cent.except(cent2).isEmpty)
    assert(assign2.except(assign).isEmpty && assign.except(assign2).isEmpty)
    assert(cb2.except(cb).isEmpty && cb.except(cb2).isEmpty)
  }

  test("a fresh session with spark.graft.ann.indexDir set searches off the " +
      "saved index: bit-identical sim_ann_ivf, zero aggregates or explodes " +
      "in the plan") {
    val dir = Files.createTempDirectory("graft-index").toString
    val (cent, assign) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, assign)
    val baseline = SparkEntry.queries("sim_ann_ivf")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString())

    val fresh = spark.newSession()
    fresh.conf.set("spark.graft.ann.indexDir", dir)
    try {
      val df = SparkEntry.queries("sim_ann_ivf")(fresh, sfDir)
      val plan = df.queryExecution.executedPlan
      // the training pipeline must be entirely absent: no centroid
      // aggregate, no posexplode — the stages come straight off parquet
      assert(plan.collectWithSubqueries {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }.isEmpty, s"aggregate survived the index load:\n$plan")
      assert(plan.collectWithSubqueries {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, s"explode survived the index load:\n$plan")
      val got = df.collect().map(_.toSeq).sortBy(_.toString())
      assert(got.length == baseline.length && got.sameElements(baseline),
        "reloaded index changed search results")
    } finally {
      graft.GraftSession.release(fresh)
      fresh.conf.unset("spark.graft.ann.indexDir")
    }
  }

  test("a bad spark.graft.ann.indexDir fails with an actionable message, " +
      "not a raw path error") {
    val fresh = spark.newSession()
    fresh.conf.set("spark.graft.ann.indexDir", "/nonexistent/graft-idx")
    try {
      val e = intercept[IllegalArgumentException] {
        SimilarityQueries.sharedStages(fresh, sfDir)
      }
      assert(e.getMessage.contains("indexDir") &&
        e.getMessage.contains("saveIndex"), s"unhelpful: ${e.getMessage}")
    } finally fresh.conf.unset("spark.graft.ann.indexDir")
  }

  test("streaming ingest: foreachBatch → appendToIndex across micro-batches " +
      "equals the batch rebuild (the documented steady-state path)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    val first = vecs.filter(col("vec_id") < 300)
    Similarity.saveIndex(dir, cent, Similarity.ivfAssign(first, cent))
    val late = vecs.filter(col("vec_id") >= 300)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = stream.toDF().toDF("vec_id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendToIndex(batch, dir)
      }
      .start()
    try {
      stream.addData(late.take(100).toSeq: _*)
      q.processAllAvailable()
      stream.addData(late.drop(100).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val (_, assign) = Similarity.loadIndex(spark, dir)
    val full = Similarity.ivfAssign(vecs, cent)
    assert(assign.count() == vecs.count())
    assert(assign.except(full).isEmpty && full.except(assign).isEmpty,
      "streamed appends diverged from the batch rebuild")
  }

  test("searchIndex: the one-call serve path equals the hand-composed " +
      "assign + bucket-probe search") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, assign) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, assign)
    val q = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val got = Similarity.searchIndex(q, vecs, dir, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hand-composed reference: shared-stage assignment + bucket probe
    val v = vecs.join(assign, "vec_id")
    val qq = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("centroid"))
    val cc = v.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("centroid"))
    val want = Similarity.ivfTopK(qq, cc, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"searchIndex diverged: ${got.size} vs ${want.size}")
  }

  test("searchIndex nprobe: multi-probe recall dominates single-probe " +
      "(the serve-time recall knob)") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, assign) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, assign)
    val q = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val corpus = vecs.filter(col("vec_id") >= 10)
    val truth = Similarity.bruteForceTopK(q,
        corpus.select(col("vec_id").as("neighbor_id"), col("v").as("vb")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(n: Int): Int = Similarity.searchIndex(q, corpus, dir, 3, n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count(truth.contains)
    val r1 = recall(1); val r2 = recall(2)
    assert(r2 >= r1, s"probe2 recall $r2 < probe1 recall $r1")
  }

  test("appendToIndex: incremental ingest equals a from-scratch rebuild " +
      "of the union, with the saved label type preserved") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val first = vecs.filter(col("vec_id") < 400)
    val late = vecs.filter(col("vec_id") >= 400)
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, Similarity.ivfAssign(first, cent))
    Similarity.appendToIndex(late, dir)
    val (_, assign) = Similarity.loadIndex(spark, dir)
    val full = Similarity.ivfAssign(vecs, cent)
    assert(assign.count() == vecs.count())
    assert(assign.except(full).isEmpty && full.except(assign).isEmpty,
      "incremental assignment diverged from the from-scratch rebuild")
    // label type unchanged by the append (no schema poisoning)
    assert(assign.schema("centroid").dataType ==
      full.schema("centroid").dataType)
  }

  test("removeFromIndex: tombstoned ids vanish from load and search; " +
      "survivors' search is bit-identical to an index never containing them") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, Similarity.ivfAssign(vecs, cent))
    val dead = vecs.filter(col("vec_id") % 7 === 0).select("vec_id")
    Similarity.removeFromIndex(dead, dir)
    val survivors = vecs.filter(col("vec_id") % 7 =!= 0)
    val (_, assign) = Similarity.loadIndex(spark, dir)
    assert(assign.count() == survivors.count())
    assert(assign.join(dead, "vec_id").count() == 0)
    // search over the tombstoned index == search over an index built
    // from the survivors only (the delete semantics contract)
    val q = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val got = Similarity.searchIndex(q, survivors, dir, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cleanDir = Files.createTempDirectory("graft-index").toString
    Similarity.saveIndex(cleanDir, cent, Similarity.ivfAssign(survivors, cent))
    val want = Similarity.searchIndex(q, survivors, cleanDir, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "tombstoned search diverged from clean rebuild")
  }

  test("compactIndex folds tombstones in: same live rows, tombstone file " +
      "gone, delete-then-readd works after compaction") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, Similarity.ivfAssign(vecs, cent))
    val dead = vecs.filter(col("vec_id") < 50).select("vec_id")
    Similarity.removeFromIndex(dead, dir)
    val (_, before) = Similarity.loadIndex(spark, dir)
    val beforeRows = before.collect().map(_.toSeq).toSet
    Similarity.compactIndex(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists())
    val (_, after) = Similarity.loadIndex(spark, dir)
    assert(after.collect().map(_.toSeq).toSet == beforeRows,
      "compaction changed the live row set")
    // re-adding a previously deleted id is visible again post-compaction
    Similarity.appendToIndex(vecs.filter(col("vec_id") < 50), dir)
    val (_, readded) = Similarity.loadIndex(spark, dir)
    assert(readded.count() == vecs.count())
  }

  /** 24 000 vectors in 12 well-separated clusters (dim 8) — the same
    * above-threshold corpus shape as `AdaptiveQuantizerSpec`, but as a
    * `(vec_id, v)` frame for the library index lifecycle. */
  private def corpus24k = spark.range(24000)
    .select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 7), j ->
             |  (id % 12) * 10.0d + ((id * 31 + j * 7) % 5) * 0.01d
             |  + if(j = cast(id % 12 as int) % 8, 3.0d, 0.0d))"""
        .stripMargin).as("v"))

  test("buildIndex with NO k argument defaults to the adaptive quantizer: " +
      "a 24k-vector index trains k = n/2000 with bounded bucket skew") {
    // the round-9 100× lesson applied to the path users build persisted
    // indexes with: a default-built index must be structurally unable
    // to recreate the super-linear fixed-k bug
    val dir = Files.createTempDirectory("graft-index").toString
    val stats = Similarity.buildIndex(corpus24k, dir)
    assert(stats.nVectors == 24000L)
    assert(stats.nCentroids == 12L,
      s"expected adaptive k = 24000/2000 = 12, got ${stats.nCentroids}")
    // the AdaptiveQuantizerSpec contract: every bucket within 3× of the
    // even share, or the quantizer degenerated into a hot bucket
    assert(stats.imbalance <= 3.0,
      s"hottest bucket is ${stats.imbalance}x the even share")
    // and the artifact serves: every probe returns its full top-k
    val q = corpus24k.filter(col("vec_id") % 4000 === 1)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val hits = Similarity.searchIndex(q, corpus24k, dir, k = 3)
      .groupBy("query_id").count().collect()
    assert(hits.length == 6 && hits.forall(_.getLong(1) == 3L))
  }

  test("maintainIndex grows the quantizer to the adaptive k when the " +
      "corpus has outgrown the saved centroid count") {
    // an index built under-provisioned (k=4 over 24k vectors — mean
    // bucket 6000, 3× the target) must come out of a retrain at the
    // adaptive k = 12, not frozen at its stale k — otherwise appends
    // re-create the fixed-k super-linear bug one maintenance cycle at
    // a time
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = corpus24k
    val small = Similarity.trainCoarseQuantizer(vecs, k = 4, maxIter = 1,
      tol = 0.0)
    // scrambled assignment forces the recall dip → retrain path (the
    // established trigger from the drift test above)
    val scrambled = Similarity.ivfAssign(vecs, small)
      .selectExpr("vec_id",
        "cast((centroid + 1 + vec_id % 3) % 4 as bigint) AS centroid")
    Similarity.saveIndex(dir, small, scrambled)
    val q = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val report = Similarity.maintainIndex(q, vecs, dir, k = 3,
      recallTarget = 0.9, sampleSize = 8, maxIter = 2)
    assert(report.retrained, "outgrown index was not retrained")
    val after = Similarity.indexStats(spark, dir)
    assert(after.nCentroids == 12L,
      s"retrain kept the stale k: ${after.nCentroids} centroids, " +
        "expected adaptive 12")
    assert(after.imbalance <= 3.0,
      s"post-growth skew unbounded: ${after.imbalance}")
  }

  test("maintainIndex: healthy index untouched; drifted index retrains " +
      "warm and recovers recall") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val trained = Similarity.trainCoarseQuantizer(vecs, k = 8, maxIter = 2,
      tol = 0.0)
    Similarity.saveIndex(dir, trained, Similarity.ivfAssign(vecs, trained))
    val q = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    // healthy: a permissive target leaves every artifact untouched
    val centMtime = new java.io.File(s"$dir/centroids.parquet").lastModified()
    val healthy = Similarity.maintainIndex(q, vecs, dir, k = 3,
      recallTarget = 0.05, sampleSize = 8)
    assert(!healthy.retrained && healthy.recallAfter == healthy.recallBefore)
    assert(new java.io.File(s"$dir/centroids.parquet").lastModified() == centMtime)
    // drift: scramble the stored assignment (corpus rows in the wrong
    // buckets — what accumulated appends/deletes do to a stale
    // quantizer, in exaggerated form) so the probed bucket misses the
    // true neighbors, then demand high recall — the pass must detect,
    // retrain warm (recomputing the assignment), and measurably recover
    val scrambled = Similarity.ivfAssign(vecs, trained)
      .selectExpr("vec_id",
        "cast((centroid + 1 + vec_id % 7) % 8 as bigint) AS centroid")
    Similarity.saveIndex(dir, trained, scrambled)
    val report = Similarity.maintainIndex(q, vecs, dir, k = 3,
      recallTarget = 0.9, sampleSize = 8, maxIter = 3)
    assert(report.retrained, "drifted index was not retrained")
    assert(report.recallAfter >= report.recallBefore,
      s"retrain regressed recall: ${report.recallBefore} → ${report.recallAfter}")
    // the rewritten artifact pair is internally consistent
    val (cent2, assign2) = Similarity.loadIndex(spark, dir)
    val reassigned = Similarity.ivfAssign(vecs, cent2)
    assert(reassigned.except(assign2).isEmpty &&
      assign2.except(reassigned).isEmpty)
    assert(cent2.count() == 8)
  }

  test("maintainIndex retrain never resurrects tombstoned ids, even when " +
      "the caller passes the original unfiltered corpus") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val trained = Similarity.trainCoarseQuantizer(vecs, k = 8, maxIter = 2,
      tol = 0.0)
    // scrambled assignment forces the recall dip → retrain path
    val scrambled = Similarity.ivfAssign(vecs, trained)
      .selectExpr("vec_id",
        "cast((centroid + 1 + vec_id % 7) % 8 as bigint) AS centroid")
    Similarity.saveIndex(dir, trained, scrambled)
    val dead = vecs.filter(col("vec_id") % 5 === 0).select("vec_id")
    val nDead = dead.count()
    Similarity.removeFromIndex(dead, dir)
    val q = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val report = Similarity.maintainIndex(q, vecs, dir, k = 3,
      recallTarget = 0.9, sampleSize = 8, maxIter = 2)
    assert(report.retrained, "scrambled index was not retrained")
    val (_, assign) = Similarity.loadIndex(spark, dir)
    assert(assign.join(dead, "vec_id").count() == 0,
      "retrain resurrected tombstoned ids")
    assert(assign.count() == vecs.count() - nDead)
    // compaction ran inside the retrain: tombstone file folded away
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists())
  }

  test("indexStats: totals, bucket spread, and tombstone count reflect " +
      "deletes; empty buckets count as zero") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val nVecs = vecs.count()
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, Similarity.ivfAssign(vecs, cent))
    val s0 = Similarity.indexStats(spark, dir)
    assert(s0.nVectors == nVecs && s0.nCentroids == cent.count() &&
      s0.nTombstones == 0)
    assert(s0.minBucket <= s0.medianBucket && s0.medianBucket <= s0.maxBucket)
    assert(s0.imbalance >= 1.0, s"imbalance ${s0.imbalance} < 1")
    val dead = vecs.filter(col("vec_id") % 3 === 0).select("vec_id")
    Similarity.removeFromIndex(dead, dir)
    val s1 = Similarity.indexStats(spark, dir)
    assert(s1.nVectors == nVecs - dead.count())
    assert(s1.nTombstones == dead.count())
  }

  test("trainCoarseQuantizer output saves and reloads as a working index " +
      "(the no-labels path end to end)") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val trained = Similarity.trainCoarseQuantizer(vecs, k = 8, maxIter = 2,
      tol = 0.0)
    val assign = Similarity.ivfAssign(vecs, trained)
    Similarity.saveIndex(dir, trained, assign)
    val (cent2, assign2) = Similarity.loadIndex(spark, dir)
    // the reloaded assignment must agree with re-assigning against the
    // reloaded centroids — internal consistency of the artifact pair
    val reassigned = Similarity.ivfAssign(vecs, cent2)
    assert(reassigned.except(assign2).isEmpty &&
      assign2.except(reassigned).isEmpty)
    assert(cent2.count() == 8)
  }

  test("searchIndex probe is partition-pruned: the assignment scan carries " +
      "a PartitionFilters on centroid_b and reads only the probed buckets") {
    val dir = Files.createTempDirectory("graft-index").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, assign) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent, assign)
    // the saved layout is Hive-partitioned by bucket
    val subdirs = new java.io.File(s"$dir/assignment.parquet")
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("centroid_b=")),
      s"assignment not bucket-partitioned: ${subdirs.mkString(", ")}")
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val df = Similarity.searchIndex(q, vecs, dir, k = 3)
    val scanLines = df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("assignment"))
      .toSeq
    assert(scanLines.nonEmpty, "no assignment scan in the searchIndex plan:\n" +
      df.queryExecution.executedPlan.toString)
    scanLines.foreach { l =>
      assert(l.contains("PartitionFilters: [") && l.contains("centroid_b"),
        s"assignment scan reads all buckets (no partition filter): $l")
    }
    // and pruning bites: the probe can touch at most 5 of the k buckets
    assert(subdirs.length > 5, s"fixture too small: ${subdirs.length} buckets")
    assert(df.count() > 0)
  }

  test("serve stream survives a restart: the replayed batch is skipped (no " +
      "duplicates, answers pinned despite an index append in between), the " +
      "new batch serves off the maintained index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-index").toString
    val out = Files.createTempDirectory("graft-serve").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val (cent, _) = SimilarityQueries.sharedStages(spark, sfDir)
    Similarity.saveIndex(dir, cent,
      Similarity.ivfAssign(vecs.filter(col("vec_id") < 300), cent))
    def qRows(lo: Long, hi: Long) = vecs
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val batchA = qRows(0, 5).as[(Long, Seq[Double])].collect()
    val batchB = qRows(5, 10).as[(Long, Seq[Double])].collect()
    def drive(ck: String, feed: Array[(Long, Seq[Double])]*): Unit = {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = Similarity.searchIndexStream(
          stream.toDF().toDF("query_id", "va"), vecs, dir, k = 3)(
          graft.streaming.StreamingResultSink.idempotent(out))
        .option("checkpointLocation", ck)
        .start()
      try feed.foreach { b =>
        stream.addData(b.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
    }
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // phase 1: serve batch A, then the process "dies" (stream stopped,
    // instance discarded)
    drive(s"$ckpt/c1", batchA)
    val servedA = keys(Similarity.searchIndex(qRows(0, 5), vecs, dir, 3)).toSet
    // maintenance between the crash and the restart: the index grows
    Similarity.appendToIndex(vecs.filter(col("vec_id") >= 300), dir)
    // phase 2 (restart): at-least-once replays batch A under its old
    // batch id, then batch B arrives. A fresh checkpoint reproduces the
    // replay ids deterministically (batch 0 again).
    drive(s"$ckpt/c2", batchA, batchB)
    val servedB = keys(Similarity.searchIndex(qRows(5, 10), vecs, dir, 3)).toSet
    val got = graft.streaming.StreamingResultSink.readServed(spark, out)
    val gotKeys = keys(got)
    // no duplicates: the replay was skipped, so every (query, rank) slot
    // appears exactly once across both phases
    assert(gotKeys.length == gotKeys.distinct.length,
      s"replay duplicated results: ${gotKeys.length} rows")
    val gotA = gotKeys.filter(_._1 < 5).toSet
    val gotB = gotKeys.filter(_._1 >= 5).toSet
    // answers pinned: batch A still carries the PRE-append neighbors it
    // was originally served (re-searching now could differ — the skip,
    // not luck, guarantees this), and batch B reflects the appended index
    assert(gotA == servedA, "replayed batch A drifted from its original serve")
    assert(gotB == servedB, "batch B does not match the maintained index")
  }
}
