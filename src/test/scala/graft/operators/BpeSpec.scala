package graft.operators

import graft.SparkTestBase

/** Algorithmic contract of the real BPE trainer/encoder on constructed
  * corpora where the expected merges are hand-derivable; fixture-level
  * equality is the driver's oracle gate (`text_bpe_train/encode`). */
class BpeSpec extends SparkTestBase {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("repeated-pair merge is greedy left-to-right (aaaa → [aa][aa], " +
      "not [aa][a][a])") {
    val d = docs("aaaa aaa")
    val m = Bpe.train(d, rounds = 1)
    // adjacent (a,a) pairs: 3 in aaaa + 2 in aaa
    assert(m == Seq(Bpe.Merge(1, "a", "a", 5)))
    val st = Bpe.encodeStats(d, m).collect()(0)
    assert(st.getLong(1) == 2, "n_words")
    assert(st.getLong(2) == 7, "n_chars")
    // aaaa → ‹aa›‹aa› (2 tokens), aaa → ‹aa›‹a› (2 tokens)
    assert(st.getLong(3) == 4, s"n_tokens = ${st.getLong(3)}")
  }

  test("ties break to the lexicographically greatest pair — the " +
      "documented determinism contract") {
    val m = Bpe.train(docs("ab cd"), rounds = 1)
    assert(m.head.pair_left == "c" && m.head.pair_right == "d")
  }

  test("merges chain: a later merge consumes an earlier merge's token") {
    val m = Bpe.train(docs("abc abc abc ab"), rounds = 2)
    assert(m(0) == Bpe.Merge(1, "a", "b", 4))
    assert(m(1) == Bpe.Merge(2, "ab", "c", 3))
    val st = Bpe.encodeStats(docs("abc abc abc ab"), m).collect()(0)
    // three fully-fused ‹abc› + one ‹ab› = 4 tokens over 4 words
    assert(st.getLong(1) == 4 && st.getLong(3) == 4)
  }

  test("training stops early when the vocabulary runs out of pairs, " +
      "and frequency weighting counts occurrences, not distinct words") {
    assert(Bpe.train(docs("a b a b a"), rounds = 3).isEmpty)
    // 'xy' occurs 3 times across docs, 'zz' twice → (x,y) wins despite
    // (z,z) being lexicographically greater
    val m = Bpe.train(docs("xy xy zz", "xy zz"), rounds = 1)
    assert(m == Seq(Bpe.Merge(1, "x", "y", 3)))
  }

  test("early exhaustion: encodeStats still emits per-doc rows, and the " +
      "encode/fertility oracles guard the same case with LEFT JOIN b_i") {
    // vocabulary fuses in 1 merge (< rounds): the engine must not lose
    // doc rows when later rounds are no-ops
    val d = docs("ab ab", "ab")
    val m = Bpe.train(d, rounds = 8)
    assert(m.length == 1, s"expected exhaustion after 1 merge, got $m")
    val st = Bpe.encodeStats(d, m).collect()
    assert(st.length == 2, "one stats row per doc even past exhaustion")
    // oracle twin: an empty b_i once annihilated every doc row via the
    // cross join (0 rows vs the engine's one-per-doc). The d_i CTEs
    // must LEFT JOIN b_i and COALESCE back to the unchanged sym; the
    // training w_i CTEs deliberately KEEP the cross join (empty w_i ≡
    // the engine's early stop — see docCtes scaladoc).
    for (sql <- Seq(Bpe.encodeOracle(), Bpe.fertilityOracle())) {
      for (i <- 1 to Bpe.DefaultRounds)
        assert(sql.contains(s"LEFT JOIN b$i b ON TRUE"),
          s"d$i lost its exhaustion guard")
      assert(sql.contains("COALESCE(replace("), "re-encode not COALESCEd")
    }
    assert(!Bpe.trainOracle().contains("LEFT JOIN"),
      "trainOracle must keep the annihilating cross join (≡ early stop)")
  }

  test("fixture sanity: 8 deterministic merges, every merged pair's " +
      "count non-increasing in rank order ties aside") {
    val m = Bpe.train(graft.Tables(spark, sfDir, "documents"))
    assert(m.length == 8)
    assert(m.map(_.merge_rank) == (1L to 8L))
    // counts can only grow if a merge CREATES a more frequent adjacency,
    // which single-merge rounds cannot: each round's max is <= previous
    assert(m.sliding(2).forall(p => p(1).pair_count <= p(0).pair_count))
  }

  test("local/distributed parity: the driver-local fast path produces the " +
      "IDENTICAL merge table as the distributed loop on the fixture — " +
      "same counts, same tie-breaks, same early stop") {
    import org.apache.spark.sql.functions._
    val fixture = graft.Tables(spark, sfDir, "documents")
    val words = Bpe.wordFreq(fixture)
      .select(regexp_replace(col("w"), "(.)", "‹$1›").as("sym"), col("freq"))
      .localCheckpoint()
    val dist = Bpe.trainDistributed(words, rounds = 8)
    val local = Bpe.trainLocal(
      words.collect().map(r => (r.getString(0), r.getLong(1))), rounds = 8)
    assert(local == dist, s"local=$local\ndist=$dist")
    // and an exhaustion corpus stops identically on both paths
    val w2 = Bpe.wordFreq(docs("ab ab", "ab"))
      .select(regexp_replace(col("w"), "(.)", "‹$1›").as("sym"), col("freq"))
      .localCheckpoint()
    assert(Bpe.trainDistributed(w2, 8) ==
      Bpe.trainLocal(w2.collect().map(r => (r.getString(0), r.getLong(1))), 8))
  }

  test("supplementary-plane parity: the local tie-break compares UTF-8 " +
      "bytes, matching Spark's UTF8 binary order where UTF-16 diverges") {
    import org.apache.spark.sql.functions._
    // U+FFFD sorts ABOVE 😀 (U+1F600) in UTF-16 code units (fffd > d83d)
    // but BELOW it in UTF-8 bytes (ef.. < f0..) — equal-count pairs
    // (a,😀) and (a,�) force the tie-break onto exactly that edge
    val d = docs("a😀", "a�")
    val words = Bpe.wordFreq(d)
      .select(regexp_replace(col("w"), "(.)", "‹$1›").as("sym"), col("freq"))
      .localCheckpoint()
    val dist = Bpe.trainDistributed(words, rounds = 1)
    val local = Bpe.trainLocal(
      words.collect().map(r => (r.getString(0), r.getLong(1))), rounds = 1)
    assert(local == dist, s"local=$local\ndist=$dist")
    assert(local.head.pair_right == "😀",
      s"UTF-8 order picks the emoji; got ${local.head}")
  }

  test("job-count contract: a full fixture train call runs <= 5 Spark jobs " +
      "(checkpoint + bounded collect; AQE stages count as jobs) — the round-12 driver-round-trip cut") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = Bpe.train(graft.Tables(spark, sfDir, "documents"))
      assert(m.length == 8)
      // listener delivery is async — poll until the count stabilizes
      // (event loss could only LOWER the count; the contract is an
      // upper bound, so a stable reading is the honest measurement)
      var last = -1; var waited = 0
      while (waited < 5000 && counter.get() != last) {
        last = counter.get(); Thread.sleep(250); waited += 250
      }
      val jobs = counter.get()
      assert(jobs <= 5,
        s"train ran $jobs jobs — the local-vocab path should need <= 5 " +
          "(was 2R+1 ≈ 17 before the round-12 cut)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
