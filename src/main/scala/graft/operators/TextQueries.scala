package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over the `documents` table (north-star surface:
  * token counting, quality scoring, language-ID, fingerprinting).
  *
  * Every computation is a codegen'd column expression (no UDFs), so the
  * same plan scales linearly over 100 TB of documents: narrow per-row
  * transforms, no shuffle except the final aggregate where present.
  * Outputs are integers/strings only — no float hashing hazards.
  */
object TextQueries {

  /** whole-word occurrence count via replace-length arithmetic; identical
    * algorithm on the DuckDB side for exact parity. */
  private def occ(padded: Column, w: String): Column = {
    val token = s" $w "
    (length(padded) - length(regexp_replace(padded, token, ""))) / token.length
  }.cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tokens"))
    },
    // BPE-ish subword counting: greedy longest-match over the classes a
    // byte-pair tokenizer's pre-tokenizer uses (letter runs, digit runs,
    // single other-glyphs) — the cheap token-budget estimator for corpus
    // accounting when the real vocab isn't in the loop.
    "text_tokens_bpeish" -> { (s, dir) =>
      val toks = expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_subtokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long")
          .as("n_alpha_runs"),
        size(expr("regexp_extract_all(lower(text), '[0-9]+', 0)")).cast("long")
          .as("n_digit_runs"))
    },
    "text_quality" -> { (s, dir) =>
      val t = col("text")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(t).cast("long").as("n_chars_q"),
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("long").as("n_punct"),
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long").as("n_digits"),
        (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("long").as("n_upper"),
        (length(t) - length(regexp_replace(t, " ", ""))).cast("long").as("n_spaces"))
    },
    "text_langid" -> { (s, dir) =>
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      val sEn = occ(padded, "the") + occ(padded, "and") + occ(padded, "of")
      val sEs = occ(padded, "el") + occ(padded, "la") + occ(padded, "los")
      val sDe = occ(padded, "der") + occ(padded, "und") + occ(padded, "die")
      val sFr = occ(padded, "le") + occ(padded, "les") + occ(padded, "des")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"),
        when(sEn >= greatest(sEs, sDe, sFr) && sEn > 0, "en")
          .when(sEs >= greatest(sDe, sFr) && sEs > 0, "es")
          .when(sDe >= sFr && sDe > 0, "de")
          .when(sFr > 0, "fr")
          .otherwise("unk").as("pred_lang"))
    },
    "text_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), md5(col("text")).as("fp"))
    },
    // 64-bit polynomial rolling hash via a custom codegen'd Catalyst
    // expression (graft.functions.RollingHash). No oracle: mod-2^64
    // wraparound isn't expressible in DuckDB BIGINT arithmetic; semantics
    // are pinned by RollingHashSpec instead.
    "text_rollinghash" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("rh"))
    },
    // Content-defined chunking (custom expression) + chunk-level exact
    // dedup: the cross-document shared-passage detector. Rows-only:
    // boundary rule is hash-defined; invariants pinned in ChunkSpec.
    "text_chunk_dedup" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.ContentChunks.content_chunks(col("text")))
            .as("chunk"))
        .groupBy(md5(col("chunk")).as("chunk_hash"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
    })

  /** shared SQL fragment mirroring `occ` exactly */
  private def occSql(w: String): String = {
    val token = s" $w "
    s"CAST((length(p) - length(replace(p, '$token', ''))) / ${token.length} AS BIGINT)"
  }

  val oracles: Map[String, String] = Map(
    "text_token_count" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        | END AS n_tokens
        |FROM documents""".stripMargin,
    "text_tokens_bpeish" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |  AS n_subtokens,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha_runs,
        | CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS n_digit_runs
        |FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_q,
        | CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
        | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        | CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
        | CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_spaces
        |FROM documents""".stripMargin,
    "text_langid" -> {
      val en = Seq("the", "and", "of").map(occSql).mkString(" + ")
      val es = Seq("el", "la", "los").map(occSql).mkString(" + ")
      val de = Seq("der", "und", "die").map(occSql).mkString(" + ")
      val fr = Seq("le", "les", "des").map(occSql).mkString(" + ")
      s"""SELECT doc_id, s_en, s_es, s_de, s_fr,
         | CASE WHEN s_en >= GREATEST(s_es, s_de, s_fr) AND s_en > 0 THEN 'en'
         |      WHEN s_es >= GREATEST(s_de, s_fr) AND s_es > 0 THEN 'es'
         |      WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
         |      WHEN s_fr > 0 THEN 'fr'
         |      ELSE 'unk' END AS pred_lang
         |FROM (
         | SELECT doc_id, $en AS s_en, $es AS s_es, $de AS s_de, $fr AS s_fr
         | FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents) t0
         |) t1""".stripMargin
    },
    "text_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents")
}
