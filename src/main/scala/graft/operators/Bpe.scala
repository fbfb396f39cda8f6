package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL byte-pair-encoding training and encoding — the tokenizer-prep
  * step of a training-data pipeline (replacing round-8's
  * `text_tokens_bpeish` heuristic with the actual iterative pair-merge
  * algorithm: count adjacent symbol pairs, merge the most frequent,
  * repeat).
  *
  * Distributed shape (the 100 TB story):
  *  - ONE corpus scan builds the word-frequency table; every training
  *    round after that runs over the VOCABULARY (distinct words), which
  *    grows sublinearly in corpus size (Heaps' law) — at any corpus
  *    size the per-round cost is vocab-sized, and the driver only ever
  *    sees one (pair, count) row per round.
  *  - Each round is the [[GraphIterate]] probe-loop shape applied to a
  *    vocab table: aggregate (pair counts) → argmax (one `max(struct)`
  *    row to the driver) → narrow re-encode (`replace`) →
  *    `localCheckpoint` so round r+1 does not replay rounds 1..r.
  *  - Encoding applies the learned merge table as a chain of narrow
  *    per-word `replace` calls — no shuffle until the final per-doc
  *    aggregate.
  *
  * Symbol representation: a word is a STRING of bracketed symbols,
  * `‹l›‹o›‹w›` — the brackets make a literal `replace` of
  * `‹l›‹o›` → `‹lo›` EXACTLY the greedy left-to-right BPE merge:
  * matches cannot straddle symbol boundaries (every symbol is fully
  * wrapped, and `‹`/`›` cannot occur in the ASCII corpus), and
  * repeated pairs merge correctly (`‹a›‹a›‹a›‹a›` → `‹aa›‹aa›`,
  * because no separator is shared between adjacent matches — the flaw
  * of space-joined encodings). The same representation is expressible
  * in DuckDB's `replace`, which is what makes the training loop
  * oracle-exact with deterministic merge order.
  *
  * Determinism contract: the merge chosen each round is the maximum of
  * `(count, left, right)` — highest corpus count, ties to the
  * lexicographically greatest pair (binary string order; the fixture
  * is ASCII so Spark's UTF8String order and DuckDB's collation
  * agree). */
object Bpe {

  /** Bounded training rounds — both the registered queries and their
    * programmatically-unrolled DuckDB oracles derive from this one
    * constant, so the engine and the oracle cannot disagree on R. */
  val DefaultRounds = 8

  final case class Merge(merge_rank: Long, pair_left: String,
      pair_right: String, pair_count: Long)

  private val L = "‹" // ‹
  private val R = "›" // ›

  /** word → bracketed symbol string (`low` → `‹l›‹o›‹w›`). */
  private def bracketize(c: Column): Column =
    regexp_replace(c, "(.)", s"$L$$1$R")

  private def mergePat(l: String, r: String): (String, String) =
    (s"$L$l$R$L$r$R", s"$L$l$r$R")

  /** split a bracketed symbol string back into its symbol array */
  private val symsExpr = s"split(substring(sym, 2, length(sym) - 2), '$R$L')"

  /** Corpus word-frequency table — the ONE corpus-sized stage of
    * training. Whitespace pre-tokenization, empty tokens dropped. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Vocabularies at or below this row count run the merge rounds on a
    * DRIVER-LOCAL copy (round-12 job-count cut): after the one
    * corpus-sized `wordFreq` scan the vocab is Heaps-law small — at
    * sf0.1 it is ~10⁴ rows, and even a 100 TB corpus's distinct-word
    * table is millions, not billions — so the distributed loop's
    * 2R+1 driver round-trips (per-round aggregate job + checkpoint
    * job) collapse to a CONSTANT few jobs (checkpoint + bounded
    * collect — AQE counts each shuffle stage as its own job)
    * regardless of R. Host-jitter amplification scales with job
    * count (r10 pin: 23.3 s driver window vs 1.05 s floor for the
    * same work), so fewer jobs is a variance fix, not just a latency
    * fix. 200k (sym,freq) rows ≈ single-digit MB on the driver — the
    * same Heaps-law bound the r11 audit already accepts for the vocab
    * collect. Above the bound the distributed loop below is the
    * unchanged scale path. */
  val VocabLocalBound = 200000

  /** Train `rounds` BPE merges over the `text` column of `docs`.
    * Stops early if the vocabulary runs out of adjacent pairs (every
    * word fused to a single symbol). Returns merges in rank order —
    * rank 1 is the first (most frequent) merge.
    *
    * Dispatch: one corpus scan builds + materializes the vocab; a
    * Heaps-law-small vocab (≤ [[VocabLocalBound]]) trains driver-local
    * with the IDENTICAL deterministic contract (BpeSpec proves
    * local ≡ distributed on the fixture), larger vocabs run the
    * distributed per-round loop. */
  def train(docs: DataFrame, rounds: Int = DefaultRounds): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = wordFreq(docs)
      .select(bracketize(col("w")).as("sym"), col("freq"))
      .localCheckpoint()
    // size probe without a separate count job: collect at most bound+1
    // rows — fewer than bound+1 back means we hold the ENTIRE vocab
    val sample = words.limit(VocabLocalBound + 1).collect()
    if (sample.length <= VocabLocalBound)
      trainLocal(sample.map(r => (r.getString(0), r.getLong(1))), rounds)
    else trainDistributed(words, rounds)
  }

  /** split a bracketed symbol string into its symbols, driver-side —
    * the exact twin of [[symsExpr]] (drop outer brackets, split on the
    * `›‹` boundary; both brackets are single BMP chars so Java string
    * indexing matches Spark's character semantics). */
  private def splitSymsLocal(sym: String): Array[String] =
    sym.substring(1, sym.length - 1)
      .split(java.util.regex.Pattern.quote(s"$R$L"))

  /** One greedy left-to-right merge pass over a symbol array — the
    * exact semantics of the literal `replace` on the bracketed string
    * (non-overlapping, leftmost-first: `a a a a` → `aa aa`,
    * `a a a` → `aa a`). */
  private def applyMergeLocal(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** UTF-8-byte lexicographic (unsigned) string ordering — the order
    * Spark's `max(struct(cnt, l, r))` applies to StringType (UTF8String
    * binary compare). Scala's default String ordering compares UTF-16
    * code units, which DIVERGES for supplementary-plane characters
    * (U+FFFD sorts above 😀 in UTF-16 but below it in UTF-8), so the
    * local tie-break must compare the same bytes the engine does. */
  private[operators] val Utf8Ordering: Ordering[String] =
    (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      var d = 0
      while (i < n && d == 0) { d = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (d != 0) d else x.length - y.length
    }

  /** Driver-local merge rounds over a collected vocabulary. Same
    * determinism contract as the distributed loop: pair count = Σ freq
    * over ALL adjacent positions (overlaps included), argmax on
    * (count, left, right) with the tie-break comparing UTF-8 BYTES
    * ([[Utf8Ordering]]) so it matches Spark's `max(struct(cnt, l, r))`
    * UTF8 binary order on ANY input — including supplementary-plane
    * symbols, which BpeSpec's emoji parity test pins. Zero Spark
    * jobs. */
  private[operators] def trainLocal(vocab: Array[(String, Long)],
      rounds: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (sym, f) => (splitSymsLocal(sym), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), cnt) = counts.maxBy { case ((l, rr), c) => (c, l, rr) }(
          Ordering.Tuple3(Ordering.Long, Utf8Ordering, Utf8Ordering))
        merges += Merge(r.toLong, l, rr, cnt)
        words = words.map { case (syms, f) =>
          (if (syms.length >= 2) applyMergeLocal(syms, l, rr) else syms, f)
        }
        r += 1
      }
    }
    merges.toSeq
  }

  /** The distributed per-round loop — the scale path for vocabularies
    * above [[VocabLocalBound]]; kept callable for the BpeSpec parity
    * gate. `words` must already be materialized (localCheckpoint). */
  private[operators] def trainDistributed(words0: DataFrame,
      rounds: Int): Seq[Merge] = {
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = words
        .select(col("freq"), expr(symsExpr).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] as l, syms[i+1] as r))")).as("p"))
        .groupBy("p.l", "p.r").agg(sum("freq").as("cnt"))
        .agg(max(struct(col("cnt"), col("l"), col("r"))).as("b"))
        .select("b.cnt", "b.l", "b.r").collect()
      if (best.isEmpty || best(0).isNullAt(0)) done = true
      else {
        val (cnt, l, rr) =
          (best(0).getLong(0), best(0).getString(1), best(0).getString(2))
        merges += Merge(r.toLong, l, rr, cnt)
        val (pat, rep) = mergePat(l, rr)
        // narrow re-encode + localCheckpoint: round r+1's aggregate
        // reads a materialized vocab table, not a replay of rounds 1..r
        words = words
          .withColumn("sym", call_function("replace", col("sym"),
            lit(pat), lit(rep)))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** Encode `docs` with a trained merge table (rank order) and emit
    * per-doc stats: word count, char count, and the post-merge token
    * count — the numbers a token-budget planner reads. The merge chain
    * is narrow (one `replace` per rank per word); the only shuffle is
    * the final per-doc aggregate. */
  def encodeStats(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), length(col("w")).cast("long").as("wlen"),
        bracketize(col("w")).as("sym"))
    val merged = merges.sortBy(_.merge_rank).foldLeft(words) { (d, m) =>
      val (pat, rep) = mergePat(m.pair_left, m.pair_right)
      d.withColumn("sym", call_function("replace", col("sym"),
        lit(pat), lit(rep)))
    }
    merged
      .select(col("doc_id"), col("wlen"),
        size(expr(symsExpr)).cast("long").as("ntok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("wlen").as("n_chars"),
        sum("ntok").as("n_tokens"))
  }

  // -------------------------------------------------------------------
  // DuckDB oracles — the bounded training loop UNROLLED to `rounds`
  // CTE triplets (pairs → argmax → re-encode), generated from the same
  // constants the engine trains with. Mechanical generation keeps the
  // two sides structurally identical per round.
  // -------------------------------------------------------------------

  private def w0(withDoc: Boolean): String = {
    val cols = if (withDoc) "doc_id, " else ""
    val agg = if (withDoc)
      s"SELECT doc_id, length(w) AS wlen, regexp_replace(w, '(.)', '$L\\1$R', 'g') AS sym"
    else
      s"SELECT regexp_replace(w, '(.)', '$L\\1$R', 'g') AS sym, COUNT(*) AS freq"
    s"""$agg
       | FROM (SELECT ${cols}unnest(string_split_regex(text, '\\s+')) AS w
       |       FROM documents) t
       | WHERE length(w) > 0${if (withDoc) "" else " GROUP BY 1"}""".stripMargin
  }

  /** The shared training CTE chain `w0, p1, b1, w1, …, b$rounds`. */
  private def trainCtes(rounds: Int): String = {
    val sb = new StringBuilder(s"w0 AS (\n${w0(withDoc = false)})")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |p$i AS (SELECT l, r, SUM(freq) AS cnt FROM (
        | SELECT freq, syms[i] AS l, syms[i + 1] AS r FROM (
        |  SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM (
        |   SELECT freq, string_split(substr(sym, 2, length(sym) - 2), '$R$L') AS syms
        |   FROM w${i - 1}) q) z) y GROUP BY 1, 2),
        |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l DESC, r DESC LIMIT 1),
        |w$i AS (SELECT replace(sym, '$L' || b.l || '$R$L' || b.r || '$R',
        |                       '$L' || b.l || b.r || '$R') AS sym, freq
        |        FROM w${i - 1}, b$i b)""".stripMargin)
    }
    sb.toString
  }

  /** Oracle for `text_bpe_train`: the R merges in rank order. */
  def trainOracle(rounds: Int = DefaultRounds): String = {
    val union = (1 to rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS pair_left," +
        s" r AS pair_right, CAST(cnt AS BIGINT) AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${trainCtes(rounds)}\n$union"
  }

  /** The per-doc-word re-encode chain `d0 … d$rounds` (shared by
    * [[encodeOracle]] and [[fertilityOracle]]), leading-comma form so
    * it appends to [[trainCtes]].
    *
    * Exhaustion guard: each step LEFT-joins `b_i` (`ON TRUE` — b_i is
    * at most one row by its LIMIT 1) and COALESCEs the replace back to
    * the unchanged `sym`. If training fuses the whole vocabulary in
    * fewer than `rounds` merges, `b_i` is EMPTY for the remaining
    * rounds — a plain cross join would annihilate every doc row and
    * the oracle would return 0 rows while [[encodeStats]] (which stops
    * early and still emits per-doc stats) returns one row per doc.
    * The LEFT JOIN makes the empty-`b_i` round a no-op on both sides.
    * (`trainCtes`' own `w_i` keeps the cross join: an empty `b_i`
    * empties `w_i` and every later `p/b`, which exactly matches the
    * engine's early stop — no train rows for exhausted rounds.) */
  private def docCtes(rounds: Int): String = {
    val sb = new StringBuilder(s",\nd0 AS (\n${w0(withDoc = true)})")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |d$i AS (SELECT doc_id, wlen,
        |  COALESCE(replace(sym, '$L' || b.l || '$R$L' || b.r || '$R',
        |                   '$L' || b.l || b.r || '$R'), sym) AS sym
        | FROM d${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin)
    }
    sb.toString
  }

  private def perDocSelect(rounds: Int): String =
    s"""SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      | CAST(SUM(wlen) AS BIGINT) AS n_chars,
      | CAST(SUM(len(string_split(substr(sym, 2, length(sym) - 2), '$R$L')))
      |   AS BIGINT) AS n_tokens
      |FROM d$rounds GROUP BY doc_id""".stripMargin

  /** Oracle for `text_bpe_encode`: train inline, then re-encode every
    * word occurrence through the same R replaces and aggregate. */
  def encodeOracle(rounds: Int = DefaultRounds): String =
    s"WITH ${trainCtes(rounds)}${docCtes(rounds)}\n${perDocSelect(rounds)}"

  /** Oracle for `text_bpe_fertility`: the encode pipeline rolled up per
    * language — tokens-per-word (fertility) and chars-per-token
    * (compression), both exact integral ppm divisions. */
  def fertilityOracle(rounds: Int = DefaultRounds): String =
    s"""WITH ${trainCtes(rounds)}${docCtes(rounds)},
      |enc AS (
      | ${perDocSelect(rounds)})
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
      | CAST(SUM(enc.n_tokens) AS BIGINT) AS n_tokens,
      | CAST((CAST(SUM(enc.n_tokens) AS HUGEINT) * 1000000)
      |   // SUM(enc.n_words) AS BIGINT) AS fertility_ppm,
      | CAST((CAST(SUM(enc.n_chars) AS HUGEINT) * 1000000)
      |   // SUM(enc.n_tokens) AS BIGINT) AS compression_ppm
      |FROM enc JOIN documents USING (doc_id)
      |GROUP BY lang""".stripMargin
}
