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
}
