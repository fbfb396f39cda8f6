package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing text-analysis library: every function is a codegen'd
  * column expression (no UDFs), so each stays a narrow per-row transform
  * inside whole-stage codegen — linear over 100 TB of documents. The
  * registered `TextQueries` entries are thin wrappers over these and are
  * DuckDB-oracle-checked.
  *
  * Related kernels live in `graft.functions`: `RollingHash.rolling_hash`
  * (64-bit polynomial hash), `ContentChunks.content_chunks`
  * (content-defined chunking), `SketchExpressions.char_shingles`. */
object TextAnalysis {

  /** whitespace token count (0 for blank text) */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: letter runs, digit runs, single other-glyphs
    * (the classes a byte-pair pre-tokenizer splits on) — the cheap
    * token-budget estimator when the real vocab isn't in the loop. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** count of characters matching a regex character class */
  def charClassCount(text: Column, classRegex: String): Column =
    (length(text) - length(regexp_replace(text, classRegex, ""))).cast("long")

  /** quality-signal struct: char/punct/digit/upper/space counts — the
    * raw ingredients of length/punctuation/casing quality ratios */
  def qualityCounts(text: Column): Column = struct(
    length(text).cast("long").as("n_chars"),
    charClassCount(text, "[.,!?;:]").as("n_punct"),
    charClassCount(text, "[0-9]").as("n_digits"),
    charClassCount(text, "[A-Z]").as("n_upper"),
    charClassCount(text, " ").as("n_spaces"))

  /** whole-word occurrence count via replace-length arithmetic over a
    * space-padded lowercase text (callers pad once and reuse) */
  def wordOccurrences(padded: Column, word: String): Column = {
    val token = s" $word "
    ((length(padded) - length(regexp_replace(padded, token, ""))) / token.length)
      .cast("long")
  }

  /** stopword-profile language score: Σ occurrences of the profile words */
  def languageScore(padded: Column, profile: Seq[String]): Column =
    profile.map(wordOccurrences(padded, _)).reduce(_ + _)

  /** the default 4-language stopword profiles (en/es/de/fr) */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "les", "des"))

  /** Full language-ID scorer (round 13 — extracted from the
    * `text_langid` lambda so a library user can classify ARBITRARY text
    * columns): argmax over the stopword profiles with LIST-ORDER
    * priority on ties (an earlier profile wins a `>=` comparison
    * against all later ones — the deterministic cascade the registered
    * query pins against its oracle), `"unk"` when no profile scores
    * positive. One narrow codegen'd expression per row, no shuffle. */
  def languageId(text: Column,
      profiles: Seq[(String, Seq[String])] = DefaultProfiles): Column = {
    require(profiles.nonEmpty, "need at least one language profile")
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = profiles.map { case (lang, words) =>
      (lang, languageScore(padded, words))
    }
    def pick(rem: List[(String, Column)]): Column = rem match {
      case (lang, s) :: Nil => when(s > 0, lang).otherwise("unk")
      case (lang, s) :: tail =>
        val rest = tail.map(_._2)
        val best = if (rest.size == 1) rest.head else greatest(rest: _*)
        when(s >= best && s > 0, lang).otherwise(pick(tail))
      case Nil => lit("unk")
    }
    pick(scored.toList)
  }

  /** MD5 content fingerprint */
  def fingerprint(text: Column): Column = md5(text)

  /** adjacent word pairs ("a b") over whitespace tokens — the unit of
    * bigram language-model statistics; empty for texts with < 2 tokens */
  def wordBigrams(text: Column): Column = {
    val t = split(lower(trim(text)), "\\s+")
    val n = size(t)
    zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Adjacent word n-grams over whitespace tokens (lowercased); empty
    * for texts with fewer than `n` tokens. Built as a zip-fold of n
    * shifted slices — NOT a `transform` over positions, whose lambda
    * would re-evaluate the regex split once per element (O(n²) regex
    * work per row); here the split is evaluated n times per row. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val t = split(lower(trim(text)), "\\s+")
    val len = greatest(size(t) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(t, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(t, lit(j + 1), len),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Per-document n-gram repetition signal (the Gopher-style "fraction
    * of duplicated n-grams" quality rule): total vs distinct n-gram
    * counts. A narrow per-row map — no shuffle, no explode. */
  def ngramRepetition(text: Column, n: Int): Column = {
    val g = wordNgrams(text, n)
    struct(size(g).cast("long").as("n_grams"),
      size(array_distinct(g)).cast("long").as("n_distinct"))
  }

  /** RE2-compatible PII patterns (no lookaround/backrefs, so Java regex,
    * RE2, and the DuckDB oracle agree byte-for-byte). */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRx = "\\b\\d{3}[- ]\\d{4}\\b"

  /** PII redaction: emails → [EMAIL], dotted quads → [IP], phone-shaped
    * digit groups → [PHONE]. A chain of codegen'd `regexp_replace`s —
    * one narrow map, linear over the corpus. Email runs first so its
    * digits can't be half-eaten by the looser numeric patterns. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRx, "[EMAIL]"), Ipv4Rx, "[IP]"), PhoneRx, "[PHONE]")

  /** per-class PII match counts (on the unredacted text) */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRx), lit(0))).cast("long")
      .as("n_emails"),
    size(regexp_extract_all(text, lit(Ipv4Rx), lit(0))).cast("long")
      .as("n_ips"),
    size(regexp_extract_all(text, lit(PhoneRx), lit(0))).cast("long")
      .as("n_phones"))

  /** Cross-document shared-passage detector: content-defined chunks
    * (Rabin-style boundaries) hashed and grouped; rows are chunk hashes
    * seen in more than one document. One narrow chunking map + one
    * shuffle on the chunk hash. */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.ContentChunks.content_chunks(col(textCol)))
          .as("chunk"))
      .groupBy(md5(col("chunk")).as("chunk_hash"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  // -------------------------------------------------------------------
  // Duplicated-substring spans (round 13): the arbitrary-boundary
  // k-token duplicate detector of training-data-dedup literature, and
  // its removal step. Registered queries `text_dup_spans` /
  // `text_dup_span_drop` are thin wrappers; LibraryApiSpec pins
  // hand-computed spans on a synthetic corpus.
  // -------------------------------------------------------------------

  /** Every k-token window (start position + the space-joined window
    * itself as the key) that occurs in >= `minDocs` DISTINCT documents.
    * Two window-keyed shuffles (groupBy + join back), never all-pairs.
    * Round 14: the key was md5(win); since the hash never leaves this
    * function (callers consume only doc_id/start), the RAW window string
    * is strictly better — no per-window digest, SHORTER shuffle keys
    * than the 32-char hex (k-token windows average ~18 chars), and
    * collision-free by construction. At 100 TB swap to xxhash64
    * (8 bytes) if key width dominates shuffle bytes — shape unchanged. */
  def dupWindows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // window ONCE (round 14, guide §2.4): the wh-keyed exchange is
    // shared by the distinct-doc aggregate and the join probe
    // (ReuseExchange), so the corpus is windowed once and the join adds
    // no exchange; the key is high-cardinality (windows are mostly
    // unique), so the raw-row shuffle carries no hot-key skew — the
    // trade that made the same pattern LOSE on zipf token keys
    // (text_tfidf_top_term note). Spread first: single-split fixture
    // scans otherwise window the corpus on one core.
    val wins = Layout.spread(docs
        .select(col(idCol).as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"),
        split(lower(trim(col("__t"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, size(toks) - $k),
             | i -> concat_ws(' ', slice(toks, i + 1, $k)))""".stripMargin))
          .as(Seq("start", "win")))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        col("win").as("wh"))
      .repartition(col("wh"))
    val dup = wins.groupBy("wh")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("wh")
    wins.join(dup.hint("merge"), "wh")
  }

  /** Maximal duplicated spans per document: adjacent duplicate window
    * starts coalesce via the sorted-runs trick (island id = start −
    * row_number over a PER-DOC window — bounded input, never global).
    * Output: (doc_id, span_start, span_end, n_windows), token-indexed
    * inclusive offsets. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("start")
    dupWindows(docs, idCol, textCol, k)
      .withColumn("isl", col("start") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min("start").as("span_start"),
        (max("start") + lit(k - 1).cast("long")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Remove every token position covered by a duplicated window and
    * rebuild each document from the surviving tokens in exact order
    * (per-doc bounded sort, never a global window). Every input doc
    * emits a row: untouched docs keep their full text, fully-covered
    * docs emit the empty string. Output: (doc_id, n_tokens, n_kept,
    * clean_text). */
  def dropDupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), posexplode(
        split(lower(trim(col(textCol))), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val covered = dupWindows(docs, idCol, textCol, k)
      .select(col("doc_id"),
        explode(expr(s"sequence(start, start + ${k - 1})")).as("pos"))
      .distinct()
    val kept = toks.join(covered.hint("merge"), Seq("doc_id", "pos"),
        "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("clean_text"))
    // both sides are corpus-sized per-doc aggregates already keyed on
    // doc_id — merge-pin so Catalyst's size ESTIMATE can never broadcast
    // the clean_text side (the PlanSpec sweep enforces this)
    toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .join(kept.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
