package graft.operators

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase, Tables}

class AdvancedSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val row = SparkEntry.queries("approx_distinct_parts")(spark, sfDir).collect()(0)
    val li = Tables(spark, sfDir, "lineitem")
    val exactParts = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val exactOrders = li.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    // emitted exact counts are truly exact, and the HLL++ estimates
    // cleared the 5% tolerance (the booleans the oracle hash-checks)
    assert(row.getLong(0) == exactParts)
    assert(row.getLong(1) == exactOrders)
    assert(row.getBoolean(2) && row.getBoolean(3))
    // the raw estimates themselves stay within the numeric bound
    val est = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02),
      approx_count_distinct(col("l_orderkey"), 0.02)).collect()(0)
    assert(math.abs(est.getLong(0) - exactParts).toDouble / exactParts < 0.05)
    assert(math.abs(est.getLong(1) - exactOrders).toDouble / exactOrders < 0.05)
  }

  test("approx percentiles: booleans true and raw sketch error within rank bound") {
    val rows = SparkEntry.queries("stat_percentiles_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"tolerance boolean false for ${r.getString(0)}")
    }
    // numeric bound, directly on the sketch: at accuracy 10k the GK
    // summary guarantees rank error ≤ n/10000, so the returned element's
    // exact rank must sit within that band of the target rank
    val ev = Tables(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("q_cents"))
    val est = ev.groupBy("event_type")
      .agg(expr("approx_percentile(q_cents, 0.5d, 10000)").as("ap"),
        count(lit(1)).as("n")).collect()
    est.foreach { r =>
      val (et, ap, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      // tie-robust: the returned element occupies the rank interval
      // (strictlyBelow, atOrBelow]; that interval must intersect
      // [target − eps, target + eps]
      val strictlyBelow = ev.filter(col("event_type") === et &&
        col("q_cents") < ap).count()
      val atOrBelow = ev.filter(col("event_type") === et &&
        col("q_cents") <= ap).count()
      val target = 0.5 * n
      val eps = n.toDouble / 10000 + 1
      assert(strictlyBelow <= target + eps && atOrBelow >= target - eps,
        s"$et: sketch median rank interval ($strictlyBelow, $atOrBelow] " +
          s"misses target $target ± $eps (n=$n)")
    }
  }

  test("asof join: every purchase with a prior signup gets the latest one") {
    val out = SparkEntry.queries("asof_last_signup")(spark, sfDir)
    val purchases = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
    // signup_sec never exceeds the event's own second
    assert(out.filter(col("signup_sec") > col("sec")).count() == 0)
  }

  test("typed ByteAccounting aggregator matches expression-based byte totals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val docs = Tables(spark, sfDir, "documents")
    // typed path
    val typed = docs.select(col("text")).as[String]
      .select(graft.functions.ByteAccounting.toColumn).collect()(0)
    // untyped/udaf path
    val viaUdaf = docs.select(
      udaf(graft.functions.ByteAccounting, Encoders.STRING)(col("text")))
      .collect()(0).getStruct(0)
    // expression-based reference value
    val expect = docs.agg(
      count(lit(1)).as("r"),
      sum(expr("octet_length(text)")).as("b")).collect()(0)
    assert(typed.records == expect.getLong(0) && typed.bytes == expect.getLong(1))
    assert(viaUdaf.getLong(0) == expect.getLong(0) &&
      viaUdaf.getLong(1) == expect.getLong(1))
  }

  test("q15: every returned supplier carries the global max revenue") {
    val out = SparkEntry.queries("q15_top_supplier")(spark, sfDir)
    assert(out.count() >= 1)
    assert(out.select("total_revenue").distinct().count() == 1)
  }

  test("pivot row-sums equal total order count") {
    val out = SparkEntry.queries("pivot_status_priority")(spark, sfDir)
    val total = out.agg(sum(col("n_f") + col("n_o") + col("n_p"))).collect()(0).getLong(0)
    assert(total == Tables(spark, sfDir, "orders").count())
  }

  test("retention cohorts: offset 0 equals cohort size; cells cover every (user, week)") {
    val out = SparkEntry.queries("ev_retention_cohorts")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val uw = Tables(spark, sfDir, "events")
      .select(col("user_id"), expr("ts div 604800000000000").as("week")).distinct()
    val cohorts = uw.groupBy("user_id").agg(min("week").as("cw"))
      .groupBy("cw").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cohorts.foreach { case (cw, n) =>
      assert(out((cw, 0L)) == n, s"cohort $cw offset 0: ${out.get((cw, 0L))} != $n")
    }
    assert(out.values.sum == uw.count(), "cells must partition the (user, week) pairs")
  }

  test("bigram LM: n_bigrams = tokens−1 per doc; smoothed NLL strictly positive") {
    val out = SparkEntry.queries("text_bigram_lm")(spark, sfDir)
    val want = Tables(spark, sfDir, "documents").select(col("doc_id"),
      expr("cast(greatest(size(split(lower(trim(text)), '\\\\s+')) - 1, 0) as bigint)")
        .as("want"))
    assert(out.join(want, "doc_id")
      .filter(col("n_bigrams") =!= col("want")).count() == 0)
    // add-one smoothing keeps every P(w2|w1) < 1, so every NLL term > 0
    assert(out.filter(col("n_bigrams") > 0 && col("qnll_sum") <= 0).count() == 0)
    assert(out.filter(col("n_bigrams") === 0 &&
      (col("qnll_sum") =!= 0L || col("avg_qnll") =!= 0.0)).count() == 0)
  }

  test("BM25: only docs containing query terms score; scores positive; " +
      "a hand-computed doc matches exactly") {
    val out = SparkEntry.queries("text_bm25")(spark, sfDir)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    // every scored doc has 1..5 matched terms and a positive quantized
    // score (idf > 0 because df < N for all fixture terms)
    assert(rows.values.forall { case (n, s) => n >= 1 && n <= 5 && s > 0 })
    // recount one doc by hand with the same fp op sequence
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        "filter(split(lower(trim(text)), '\\\\s+'), w -> length(w) > 0)")
        .as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val qTerms = Seq("join", "scan", "window", "merge", "query")
    val nDocs = docs.size.toLong
    val total = docs.values.map(_.size.toLong).sum
    val dfm = qTerms.map(t =>
      t -> docs.values.count(_.contains(t)).toLong).toMap
    val someDoc = rows.keys.min
    val toks = docs(someDoc)
    val expect = qTerms.flatMap { t =>
      val tf = toks.count(_ == t).toLong
      if (tf == 0) None
      else Some(math.floor(
        math.log(1.0 + (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 *
            (0.25 + 0.75 * toks.size * nDocs / total.toDouble)) *
          1e6 + 0.5).toLong)
    }
    assert(rows(someDoc) == ((expect.size.toLong, expect.sum)),
      s"doc $someDoc: got ${rows(someDoc)}, want (${expect.size}, ${expect.sum})")
  }
}
