package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase, Tables}

/** ANN semantics for the hash/argmin-defined paths without SQL oracles. */
class SimilaritySpec extends SparkTestBase {

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, sfDir)
      .orderBy("query_id", "rnk").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSeq }

  test("ivf_assign: every vector gets exactly one centroid") {
    val out = SparkEntry.queries("ivf_assign")(spark, sfDir)
    val n = Tables(spark, sfDir, "embeddings").count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    // all 10 label-centroids are used (random data spreads assignments)
    assert(out.select("centroid").distinct().count() > 1)
  }

  test("ANN family shares ONE persisted IVF-assign stage; no centroid " +
      "aggregate is re-planned outside the cache") {
    val (c1, a1) = SimilarityQueries.sharedStages(spark, sfDir)
    val (c2, a2) = SimilarityQueries.sharedStages(spark, sfDir)
    assert((c1 eq c2) && (a1 eq a2), "sharedStages must memoize per (session, dir)")
    assert(c1.storageLevel.useMemory && a1.storageLevel.useMemory,
      "shared stages must be persisted")
    // r3 finding: sim_ann_ivf planned the posexplode centroid aggregate
    // 2-4x per query. Now the only posexplode lives inside the cached
    // stage — the query's own physical tree has NO Generate node and
    // reads the assignment via InMemoryTableScan.
    for (q <- Seq("ivf_assign", "sim_ann_ivf", "sim_ann_ivf_probe2",
        "sim_recall_at_k")) {
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      assert(plan.collectWithSubqueries {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, s"$q re-plans an explode outside the cached stage:\n$plan")
      assert(plan.toString.contains("InMemoryTableScan"),
        s"$q does not read the shared cached stage:\n$plan")
    }
  }

  test("sim_ann_ivf returns ranked neighbors from the query's bucket only") {
    val assign = SparkEntry.queries("ivf_assign")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(assign(r.getLong(0)) == assign(r.getLong(1)),
        s"neighbor from a different bucket: $r")
    }
  }

  test("multi-probe IVF recall dominates single-probe (superset candidates)") {
    val brute = topk("sim_topk_bruteforce")
    def recall(m: Map[Long, Seq[Long]]): Int = m.map { case (q, ns) =>
      brute.get(q).map(b => ns.count(b.contains)).getOrElse(0)
    }.sum
    val r1 = recall(topk("sim_ann_ivf"))
    val r2 = recall(topk("sim_ann_ivf_probe2"))
    // probing 2 buckets can only widen the candidate set, so true-top-5
    // recovery can't drop; on this fixture it strictly improves for at
    // least one query or stays equal
    assert(r2 >= r1, s"probe2 recall $r2 < probe1 recall $r1")
  }

  test("vec_kmeans_step: per-centroid means cover every assigned vector " +
      "exactly once, all dims present") {
    val out = SparkEntry.queries("vec_kmeans_step")(spark, sfDir).collect()
    val nVecs = Tables(spark, sfDir, "embeddings").count()
    val dims = out.map(_.getInt(1)).distinct
    assert(dims.length == 64 && dims.min == 0 && dims.max == 63)
    // each vector contributes one value per dim: Σ n over (centroid, dim)
    // = 64 · |corpus|, and per-dim membership sums to the corpus size
    assert(out.map(_.getLong(3)).sum == 64L * nVecs)
    val perDim = out.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(perDim.values.forall(_ == nVecs))
  }

  test("sim_recall_at_k ≡ hand-computed overlap of IVF vs brute force") {
    val brute = topk("sim_topk_bruteforce").map { case (q, ns) =>
      q -> ns.take(3).toSet // truth at k=3
    }
    val ivf = topk("sim_ann_ivf")
    val got = SparkEntry.queries("sim_recall_at_k")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == brute.keySet, "one recall row per query")
    got.foreach { case (q, (hits, truth)) =>
      assert(truth == 3L, s"query $q truth size $truth != 3")
      val expected = ivf.getOrElse(q, Seq.empty).count(brute(q).contains).toLong
      assert(hits == expected, s"query $q: got $hits hits, expected $expected")
      assert(hits >= 0L && hits <= 3L)
    }
  }

  test("lsh ANN candidates overlap brute-force top-5 (sanity recall)") {
    val brute = topk("sim_topk_bruteforce")
    val lsh = topk("sim_ann_lsh")
    // every LSH-returned neighbor list is ordered and self-free
    lsh.foreach { case (q, ns) =>
      assert(!ns.contains(q))
      assert(ns.distinct == ns)
    }
    // at least some queries recover a true top-5 neighbor (random data:
    // LSH buckets are coarse; this is a sanity floor, not a quality bar)
    val hits = lsh.count { case (q, ns) =>
      brute.get(q).exists(b => ns.exists(b.contains))
    }
    assert(hits >= 1, s"no overlap at all between LSH and brute force: $lsh")
  }

  test("PQ ADC search returns ranked, self-free neighbors with sane recall") {
    val pq = topk("sim_ann_pq")
    assert(pq.nonEmpty && pq.forall(_._2.size == 5))
    pq.foreach { case (q, ns) =>
      assert(!ns.contains(q))
      assert(ns.distinct == ns)
    }
    // codes are 4 coarse labels — like LSH this is a sanity floor: some
    // queries must recover a true top-5 neighbor
    val brute = topk("sim_topk_bruteforce")
    val hits = pq.count { case (q, ns) =>
      brute.get(q).exists(b => ns.exists(b.contains))
    }
    assert(hits >= 1, s"no overlap between PQ ADC and brute force: $pq")
  }

  test("vec_pca_power_iter ≡ plain-Scala w = Eᵀ(E·1) with identical quantization") {
    val out = SparkEntry.queries("vec_pca_power_iter")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = Tables(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble))
    val dims = vecs.head.length
    val expect = Array.fill(dims)(0L)
    vecs.foreach { v =>
      val sv = v.foldLeft(0.0)(_ + _) // same left fold as the SQL aggregate()
      var d = 0
      while (d < dims) {
        expect(d) += math.floor(sv * v(d) * 1e6 + 0.5).toLong
        d += 1
      }
    }
    assert(out.size == dims)
    (0 until dims).foreach { d =>
      assert(out(d) == ((expect(d), vecs.length.toLong)),
        s"dim $d: got ${out(d)}, want (${expect(d)}, ${vecs.length})")
    }
  }
}
