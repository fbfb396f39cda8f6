package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase}

/** Invariants for the round-10 operator additions beyond the oracle
  * hash-match: semantic properties the DuckDB comparison can't express
  * (bloom pre-filter transparency, rank-sum symmetry, sign-matrix
  * balance, FK-graph shape). */
class Round10OpsSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("join_bloom_prefilter: pre-filtered result ≡ the plain exact join " +
      "(false positives are invisible)") {
    val got = q("join_bloom_prefilter")
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val li = graft.Tables(spark, sfDir, "lineitem")
    val o = graft.Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = li
      .select(col("l_orderkey"), col("l_returnflag"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5d) as bigint)")
          .as("rev_cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"), sum("rev_cents").as("rev_cents"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(got.toSeq == plain.toSeq)
  }

  test("join_bloom_prefilter: the bucket table is bounded at 65536 rows " +
      "regardless of build-side size") {
    val urgent = graft.Tables(spark, sfDir, "orders")
      .select(pmod(xxhash64(col("o_orderkey")), lit(65536L)).as("bucket"))
      .distinct()
    assert(urgent.count() <= 65536L)
  }

  test("stat_mannwhitney: rank-sum symmetry — 2U_even + 2U_odd = 2·na·nb") {
    val row = q("stat_mannwhitney").collect().head
    val na = row.getAs[Long]("n_even")
    val nb = row.getAs[Long]("n_odd")
    val u2even = row.getAs[Long]("u2_even")
    // recompute the odd cohort's doubled U by swapping the cohort flag
    val e = graft.Tables(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select((expr("ts div 604800000000000") % 2 =!= 0).as("even"),
        col("value"))
    val byV = e.groupBy("value").agg(
        sum(when(col("even"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("even"), 1L).otherwise(0L)).as("cb"))
      .withColumn("ct", col("ca") + col("cb"))
    val odd = Ids.cumulativeSums(byV, Seq(col("value")),
        Seq(col("ca") -> "cum_a", col("ct") -> "cum_t"),
        totals = Map("cum_a" -> "na", "cum_t" -> "nn"))
      .agg(max("na").as("na"),
        sum(col("ca") * (col("cum_t") * 2 - col("ct") + 1)).as("r2"))
      .select((col("r2") - col("na") * (col("na") + 1)).as("u2"))
      .collect().head.getAs[Long]("u2")
    assert(u2even + odd == 2L * na * nb,
      s"u2_even=$u2even u2_odd=$odd na=$na nb=$nb")
  }

  test("etl_fk_orphans: one row per FK edge, fixture graph is orphan-free, " +
      "child totals match the raw scans") {
    val rows = q("etl_fk_orphans").collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getAs[Long]("n_orphans") == 0L),
      "fixture FK graph should have no orphans")
    val byName = rows.map(r => r.getAs[String]("fk") -> r).toMap
    val li = graft.Tables(spark, sfDir, "lineitem").count()
    assert(byName("lineitem.l_orderkey->orders.o_orderkey")
      .getAs[Long]("n_child") == li)
    assert(byName("nation.n_regionkey->region.r_regionkey")
      .getAs[Long]("n_child") == 25L)
  }

  test("text_zipf_fit: slope is negative (frequency falls with rank), " +
      "gini is a valid concentration in [0, 1e6]") {
    val row = q("text_zipf_fit").collect().head
    assert(row.getAs[Long]("zipf_slope_micro") < 0L)
    val g = row.getAs[Long]("gini_micro")
    assert(g >= 0L && g <= 1000000L)
    assert(row.getAs[Long]("n_tokens") >= row.getAs[Long]("n_vocab"))
  }

  test("cur_dsir_select: target-likeness splits the corpus non-trivially " +
      "and target-source docs score higher on average") {
    val df = q("cur_dsir_select").cache()
    try {
      val sel = df.groupBy("selected").count().collect()
        .map(r => r.getAs[Int]("selected") -> r.getAs[Long]("count")).toMap
      assert(sel.getOrElse(1, 0L) > 0 && sel.getOrElse(0, 0L) > 0,
        s"degenerate selector: $sel")
      val byTgt = graft.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("source").isin("src0", "src1").as("tgt"))
        .join(df, "doc_id")
        .groupBy("tgt").agg(avg("dsir_micro").as("m"))
        .collect().map(r => r.getAs[Boolean]("tgt") -> r.getAs[Double]("m")).toMap
      assert(byTgt(true) > byTgt(false),
        s"target docs should score higher: $byTgt")
    } finally df.unpersist()
  }

  test("ev_ab_test: variant split is user-stable and exhaustive — per-user " +
      "variant is constant, and n_a + n_b = all non-null-value events") {
    val row = q("ev_ab_test").collect().head
    val total = graft.Tables(spark, sfDir, "events")
      .where(col("value").isNotNull).count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == total)
    // a user's rows all land in one variant (hash of user_id, not row)
    val mixed = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2 === 0).as("is_a"))
      .groupBy("user_id").agg(countDistinct(col("is_a")).as("nv"))
      .where(col("nv") > 1).count()
    assert(mixed == 0L)
  }

  test("vec_rand_proj: deterministic, 16 signed-sum columns, and the sign " +
      "matrix is balanced enough that projections are not degenerate") {
    val df = q("vec_rand_proj")
    assert(df.columns.toSeq == ("vec_id" +: (0 until 16).map(i => s"p$i")))
    val a = df.orderBy("vec_id").limit(5).collect().map(_.toSeq)
    val b = q("vec_rand_proj").orderBy("vec_id").limit(5).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "projection must be deterministic")
    // each output dim must vary across vectors (a constant column would
    // mean the sign row collapsed)
    val distinctCounts = df.agg(
      countDistinct(col("p0")).as("d0"), countDistinct(col("p7")).as("d7"),
      countDistinct(col("p15")).as("d15")).collect().head
    assert(distinctCounts.getAs[Long]("d0") > 1)
    assert(distinctCounts.getAs[Long]("d7") > 1)
    assert(distinctCounts.getAs[Long]("d15") > 1)
  }

  test("stat_bootstrap_ci: CI brackets both means, is non-degenerate, and " +
      "the Poisson weights average ~1 (replica sizes track the sample)") {
    val row = q("stat_bootstrap_ci").collect().head
    val mean = row.getAs[Long]("mean_micro")
    val boot = row.getAs[Long]("boot_mean_micro")
    val lo = row.getAs[Long]("ci_lo_micro")
    val hi = row.getAs[Long]("ci_hi_micro")
    assert(lo < hi, "CI must have positive width")
    assert(lo <= boot && boot <= hi, "bootstrap mean inside its own CI")
    assert(lo <= mean && mean <= hi,
      "sample mean inside the bootstrap CI on the fixture")
    // E[w] = 1: every replica's Σw must be within 4·sd(≈√N) of N
    val n = row.getAs[Long]("n_rows")
    val tol = 4 * math.sqrt(n.toDouble)
    val reps = graft.Tables(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"), explode(expr("sequence(0, 63)")).as("b"))
      .select(col("b"),
        expr("""cast(conv(substring(md5(concat(
              |  cast(event_id as string), ':', cast(b as string))), 1, 8),
              |  16, 10) as bigint)""".stripMargin).as("u"))
      .withColumn("w",
        when(col("u") < 1580030168L, 0L).when(col("u") < 3160060337L, 1L)
          .when(col("u") < 3950075421L, 2L).when(col("u") < 4213413783L, 3L)
          .when(col("u") < 4279248373L, 4L).when(col("u") < 4292415291L, 5L)
          .when(col("u") < 4294609777L, 6L).otherwise(7L))
      .groupBy("b").agg(sum("w").as("nb"))
      .agg(min("nb").as("mn"), max("nb").as("mx")).collect().head
    assert(math.abs(reps.getAs[Long]("mn") - n) <= tol,
      s"smallest replica ${reps.getAs[Long]("mn")} too far from n=$n")
    assert(math.abs(reps.getAs[Long]("mx") - n) <= tol,
      s"largest replica ${reps.getAs[Long]("mx")} too far from n=$n")
  }

  test("ev_survival_km: survival is monotone non-increasing from ≤ 1e6, " +
      "n_risk strictly decreasing from the full cohort, counts conserve") {
    val rows = q("ev_survival_km").orderBy("t_hour").collect()
    assert(rows.length > 1)
    val users = graft.Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") == users,
      "everyone is at risk at the first lifetime point")
    val surv = rows.map(_.getAs[Long]("survival_ppm"))
    assert(surv.head <= 1000000L)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a },
      "KM curve must be non-increasing")
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      "at-risk count strictly decreases at every table row")
    // every user leaves the risk set exactly once: Σ(d+c) = cohort size
    val leaves = rows.map(r =>
      r.getAs[Long]("n_churn") + r.getAs[Long]("n_censor")).sum
    assert(leaves == users)
  }

  private def hllRegisters(df: org.apache.spark.sql.DataFrame) = df
    .select(expr("""cast(conv(substring(md5(cast(event_id as string)),
          |  1, 8), 16, 10) as bigint)""".stripMargin).as("u"))
    .selectExpr("u div 16777216 as reg", "u % 16777216 as w")
    .selectExpr("reg",
      "case when w = 0 then 25L else 25L - length(bin(w)) end as rho")
    .groupBy("reg").agg(max("rho").as("rho"))

  test("agg_hll_distinct: estimate within the 3σ band of exact, and the " +
      "register table MERGES by max across disjoint shards") {
    val row = q("agg_hll_distinct").collect().head
    val exact = row.getAs[Long]("exact_distinct")
    val est = row.getAs[Long]("est_milli") / 1000.0
    assert(row.getAs[Long]("m_used") <= 256L)
    // σ = 1.04/√256 = 6.5%; 3σ = 19.5%
    assert(math.abs(est / exact - 1.0) < 0.195,
      s"HLL estimate $est vs exact $exact outside 3σ")
    // mergeability — THE property that makes the sketch shardable at
    // 100 TB: registers(all) == maxMerge(registers(even), registers(odd))
    val ev = graft.Tables(spark, sfDir, "events")
    val whole = hllRegisters(ev).orderBy("reg").collect().map(_.toSeq)
    val merged = hllRegisters(ev.where(col("event_id") % 2 === 0))
      .unionAll(hllRegisters(ev.where(col("event_id") % 2 =!= 0)))
      .groupBy("reg").agg(max("rho").as("rho"))
      .orderBy("reg").collect().map(_.toSeq)
    assert(whole.toSeq == merged.toSeq)
  }

  test("text_bpe_fertility: per-lang rollup conserves the per-doc encode " +
      "totals, and both ratios are ≥ 1 token/word resp. 1 char/token") {
    val rows = q("text_bpe_fertility").collect()
    assert(rows.length > 1)
    val enc = q("text_bpe_encode").agg(
      sum("n_words").as("w"), sum("n_tokens").as("t")).collect().head
    assert(rows.map(_.getAs[Long]("n_words")).sum == enc.getAs[Long]("w"))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == enc.getAs[Long]("t"))
    rows.foreach { r =>
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L,
        "a word is at least one token")
      assert(r.getAs[Long]("compression_ppm") >= 1000000L,
        "a token is at least one char")
    }
  }
}
