package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixture-bound query registrations for the [[Curation]] library:
  * deterministic hash splits, quality gating, per-source quotas. */
object CurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic train/val/test split by content hash: per-split
    // document counts and id bounds. Identical texts share a bucket, so
    // exact duplicates cannot straddle the train/test boundary.
    "cur_hash_split" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("split", Curation.split(col("text")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
    },
    // C4-style quality gate with the default thresholds; emits passing
    // docs with their signals.
    "cur_quality_filter" -> { (s, dir) =>
      Curation.qualityFilter(Tables(s, dir, "documents"), "doc_id", "text")
    },
    // The gate's per-rule failure report — which rule rejects how many
    // docs (one corpus pass, map-side-combinable conditional counts).
    "cur_quality_report" -> { (s, dir) =>
      val t = col("text")
      Tables(s, dir, "documents").select(
          length(t).cast("long").as("nc"),
          TextAnalysis.tokenCount(t).as("nt"),
          TextAnalysis.charClassCount(t, "[.,!?;:]").as("np"))
        .agg(count(lit(1)).as("n_docs"),
          expr("count_if(nc < 300)").as("fail_min_chars"),
          expr("count_if(nt < 30)").as("fail_min_tokens"),
          expr("count_if(np * 1000 > nc * 50)").as("fail_punct"),
          expr("count_if(nc >= 300 and nt >= 30 and np * 1000 <= nc * 50)")
            .as("n_pass"))
    },
    // Source balancing: the 5 lowest-id docs per source.
    "cur_source_quota" -> { (s, dir) =>
      Curation.groupQuota(Tables(s, dir, "documents"), "doc_id", "source", 5)
        .select("source", "doc_id", "rn")
    },
    // Shard packing: ~500-token shards per source in doc_id order.
    "cur_token_shards" -> { (s, dir) =>
      Curation.tokenShards(Tables(s, dir, "documents"),
        "doc_id", "text", "source", 500L)
        .select("source", "doc_id", "n_tokens", "cum_tokens", "shard")
    },
    // Stratified downsampling: keep all of src0, 10% of src1, 50%
    // elsewhere — deterministic per-group ratios by content hash.
    "cur_stratified_sample" -> { (s, dir) =>
      Curation.stratifiedHashSample(Tables(s, dir, "documents"),
        "text", "source", Map("src0" -> 1000, "src1" -> 100), 500)
        .select("doc_id", "source")
    },
    // Exactly-k-per-source deterministic subsample — the quota twin of
    // cur_stratified_sample (that one keeps a hash FRACTION; this one
    // keeps a fixed COUNT per stratum, the "n docs per domain for the
    // eval set" op). Rows rank by a Lehmer hash of doc_id (plain BIGINT
    // arithmetic, identical on both engines) so the pick is uniform and
    // reproducible, and the ranking runs on the bounded-heap
    // TopKPerKeyExec — no per-source sort of the corpus, O(sources × k)
    // task memory (see plans/TopKPerKeyPlan.scala).
    "cur_sample_per_source" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .withColumn("h", expr("((doc_id + 1) * 48271) % 2147483647"))
        .select("source", "doc_id", "h")
      graft.plans.TopK.perKey(docs, Seq("source"),
          Seq(col("h"), col("doc_id")), k = 10, rankCol = "rn")
        .select("source", "doc_id", "rn")
    },
    // Dense 0-based global IDs in o_orderkey order, assigned WITHOUT a
    // single-task global sort (range repartition + per-partition offsets
    // — see Ids.contiguous). The oracle is the naive global window.
    "ids_contiguous" -> { (s, dir) =>
      Ids.contiguous(Tables(s, dir, "orders").select("o_orderkey"),
        Seq("o_orderkey"))
    },
    // Benchmark decontamination: docs sharing any 5-token shingle with
    // the "eval suite" (stand-in: doc_id < 50) — the pre-training leak
    // check. Benchmark shingles broadcast; the corpus never shuffles
    // before the per-doc aggregate.
    "decon_ngram_overlap" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Curation.decontaminate(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", k = 5)
    },
    // Quality-ranked token-budget selection: the best docs (by distinct
    // token count, ties by doc_id) until 20k cumulative tokens — the
    // "fill the compute budget with the best data" final curation step.
    // Distributed cumulative sum via Ids.cumulativeSum: no single-task
    // global window anywhere.
    "cur_token_budget_select" -> { (s, dir) =>
      val toks = split(lower(trim(col("text"))), "\\s+")
      Curation.tokenBudgetSelect(
        Tables(s, dir, "documents"), "doc_id",
        quality = size(array_distinct(toks)).cast("long"),
        tokens = size(toks), budget = 20000L)
    },
    // Fuzzy decontamination: training docs that are a NEAR-duplicate
    // (word-5-gram jaccard >= 1/2) of a benchmark doc (doc_id < 50) —
    // the leak class exact hashing misses and any-shingle overlap
    // over-flags. MinHash-banded candidates with the benchmark side
    // broadcast; exact integer-Jaccard verify. Fixture-validated
    // recall 1.0 for the 16x2 banding at this threshold (the
    // qualifying pairs sit at j >= 0.857, where the banding miss
    // probability is ~6e-10; next non-qualifying pair is at j = 0.015).
    "decon_fuzzy_minhash" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Curation.decontaminateFuzzy(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", k = 5)
    },
    // Exact-match decontamination up to case/whitespace: the train side
    // is docs >= 50 plus re-ingested copies of every third benchmark doc
    // (upper-cased, extra whitespace — the "lightly reformatted leak"),
    // which the normalized-hash broadcast semi join must catch.
    "decon_exact" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bench = d.filter(col("doc_id") < 50)
      val train = d.filter(col("doc_id") >= 50).select(col("doc_id"), col("text"))
        .unionAll(bench.filter(col("doc_id") % 3 === 1)
          .select((col("doc_id") + 30000L).as("doc_id"),
            concat(lit("  "), regexp_replace(upper(col("text")), " ", "  "))
              .as("text")))
      Curation.decontaminateExact(train, bench, "doc_id", "text")
    },
    // Epoch-aware mixing: src0 repeats 2.5 epochs, src1 downsamples to
    // 0.4, everything else passes through once — deterministic
    // content-hash fractions, narrow explode, no shuffle.
    "cur_epoch_mix" -> { (s, dir) =>
      Curation.epochMix(Tables(s, dir, "documents"), "doc_id", "source",
        "text", Map("src0" -> 2500, "src1" -> 400))
    },
    // Deterministic global pre-training shuffle: every doc gets a dense
    // 0-based position ordered by (content-hash, doc_id) — reproducible
    // example order with no RNG state to checkpoint, and content-keyed
    // so re-ingesting the same corpus yields the same order. Built on
    // Ids.contiguous (range repartition + per-partition offsets), so no
    // single task ever sorts the corpus — the scale-safe form of
    // "shuffle the dataset before sharding".
    // The shuffle key is SALTED ("shuffle|" prefix): plain md5(text)
    // orders hex-lexicographically, which equals numeric order of the
    // hashBucket prefix — the un-salted order would be perfectly
    // correlated with every split/sample/epoch decision in the library
    // (train docs first, fractional-epoch copies contiguous), the
    // opposite of a shuffle.
    "cur_shuffle_deterministic" -> { (s, dir) =>
      Ids.contiguous(
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat(lit("shuffle|"), col("text"))).as("h")),
        Seq("h", "doc_id"), idName = "shuffle_pos")
        .select("doc_id", "shuffle_pos")
    },
    // The one-row DATASET CARD: corpus size, source/language breadth,
    // token/char volume, exact-duplicate count and mean length — the
    // summary block a dataset release publishes and a pipeline logs
    // per snapshot. One scan, one aggregate (the distinct counts are
    // the only shuffled state); all integers, mean as integer div.
    "cur_dataset_card" -> { (s, dir) =>
      val t = col("text")
      Tables(s, dir, "documents")
        .select(col("source"), col("lang"),
          TextAnalysis.tokenCount(t).as("nt"),
          length(t).cast("long").as("nc"), md5(t).as("h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_sources"),
          countDistinct("lang").as("n_langs"),
          sum("nt").as("n_tokens"),
          sum("nc").as("n_chars"),
          (count(lit(1)) - countDistinct("h")).as("n_dup_docs"),
          expr("sum(nc) div count(1)").as("mean_chars"))
    },
    // Deterministic SOURCE-INTERLEAVED training order: round-robin the
    // sources (position 0 = first source's first doc, then every other
    // source's first doc, then the seconds, …) — the "mix sources
    // evenly through the epoch" ordering that keeps any training-run
    // prefix close to the corpus mixture, where a naive concat-by-
    // source front-loads one domain. Per-source ordinals are a
    // source-partitioned window; the GLOBAL position over (ridx,
    // source) is Ids.contiguous — the distributed-ordinal scaffold, no
    // single-task sort. Sources of unequal size drain naturally (an
    // exhausted source just stops appearing in later rounds).
    "cur_interleave_mix" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      Ids.contiguous(
        Tables(s, dir, "documents").select(col("doc_id"), col("source"))
          .withColumn("ridx", row_number().over(w).cast("long")),
        Seq("ridx", "source"), idName = "pos")
        .select("doc_id", "source", "ridx", "pos")
    },
    // Mixture audit over cur_epoch_mix: per-source docs/copies/token
    // output and the realized per-mille token share — the check that the
    // mix actually hit its target weights before tokens are burned on
    // it. Integer shares (floor per-mille), one metadata-sized aggregate
    // + a broadcast total.
    "cur_mixture_report" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      val mix = Curation.epochMix(d, "doc_id", "source", "text",
        Map("src0" -> 2500, "src1" -> 400))
      val per = mix.join(toks, "doc_id")
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_copies"),
          sum("n_tokens").as("tokens_out"))
      // the grand token total rides Ids.cumulativeSum's metadata-sized
      // offsets table (totalName) — no unpartitioned window over the
      // per-source rows and no re-execution of the mix+join+aggregate
      // subtree for a crossJoin total
      Ids.cumulativeSum(per, Seq(col("source")), col("tokens_out"),
          "__cum", totalName = Some("__tot"))
        .select(col("source"), col("n_docs"), col("n_copies"),
          col("tokens_out"),
          expr("tokens_out * 1000 div __tot").as("share_pm"))
    },
    // Sequence packing with document splitting: per-source 256-token
    // training sequences; straddling docs emit one row per covered
    // sequence with the in-doc token span.
    "cur_pack_sequences" -> { (s, dir) =>
      Curation.packSequences(Tables(s, dir, "documents"),
        "doc_id", "text", "source", 256L)
    },
    // The FULL curation pipeline as one oracle-checked composition:
    // dedup → quality gate → overlap decontamination vs the doc_id<50
    // benchmark → per-source quota (15) → hash split → train-side
    // 256-token sequence packing. Each stage is oracle-checked alone
    // elsewhere; this row proves the COMPOSITION (stage order, column
    // threading, join semantics between stages) end to end.
    "cur_pipeline_packed" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CurationPipeline.curatePacked(
        docs.filter(col("doc_id") >= 50).select("doc_id", "text", "source"),
        docs.filter(col("doc_id") < 50),
        "doc_id", "text", "source", minChars = 50, minTokens = 5,
        decontamK = 5, seqLen = 256L, decontamMode = "overlap",
        quotaPerSource = Some(15))
    },
    // Temperature-flattened domain mixing (α = 1/2) over the source
    // family (leading digit of the source id — src1 + src10..src19 form
    // one 11×-oversized family): each family keeps ~sqrt(n_d/n_max) of
    // its docs via a pure-integer content-hash predicate.
    "cur_temperature_mix" -> { (s, dir) =>
      Curation.temperatureSample(
        Tables(s, dir, "documents")
          .withColumn("domain", substring(col("source"), 4, 1)),
        "text", "domain")
        .select("doc_id", "domain", "b")
    },
    // DSIR importance selection: src0/src1 play the curated target set,
    // the whole corpus is the raw pool; docs scoring target-like
    // (dsir_micro > 0) are selected. See Curation.dsirScore for the
    // hash-bounded-vocabulary scale argument.
    "cur_dsir_select" -> { (s, dir) =>
      Curation.dsirScore(Tables(s, dir, "documents"), "doc_id", "text",
        col("source").isin("src0", "src1"))
    })

  /** the epoch-mix expansion as SQL (salted fractional-copy hash) —
    * shared by the cur_epoch_mix oracle and the mixture-report oracle so
    * the two cannot silently diverge */
  private val epochMixSql: String =
    """SELECT doc_id, source, unnest(range(n_copies)) AS copy_id FROM (
      | SELECT doc_id, source,
      |  (e - e % 1000) // 1000
      |   + CASE WHEN ('0x' || substr(md5('epoch|' || text), 1, 8))::BIGINT
      |            % 1000 < e % 1000 THEN 1 ELSE 0 END AS n_copies
      | FROM (
      |  SELECT doc_id, source, text,
      |   CASE WHEN source = 'src0' THEN 2500
      |        WHEN source = 'src1' THEN 400
      |        ELSE 1000 END AS e
      |  FROM documents) t0) t1
      |WHERE n_copies > 0""".stripMargin

  val oracles: Map[String, String] = Map(
    "cur_hash_split" ->
      """SELECT split, COUNT(*) AS n_docs,
        | MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM (
        | SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM (
        |  SELECT doc_id,
        |   ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
        |  FROM documents) t0) t1
        |GROUP BY split""".stripMargin,
    "cur_quality_report" ->
      """WITH t AS (
        | SELECT CAST(length(text) AS BIGINT) AS nc,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |  END AS nt,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |       AS BIGINT) AS np
        | FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(*) FILTER (WHERE nc < 300) AS BIGINT) AS fail_min_chars,
        | CAST(COUNT(*) FILTER (WHERE nt < 30) AS BIGINT) AS fail_min_tokens,
        | CAST(COUNT(*) FILTER (WHERE np * 1000 > nc * 50) AS BIGINT) AS fail_punct,
        | CAST(COUNT(*) FILTER (WHERE nc >= 300 AND nt >= 30
        |                         AND np * 1000 <= nc * 50) AS BIGINT) AS n_pass
        |FROM t""".stripMargin,
    "cur_quality_filter" ->
      """SELECT doc_id, n_chars_f, n_tokens, n_punct FROM (
        | SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_f,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |  END AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |       AS BIGINT) AS n_punct
        | FROM documents) t
        |WHERE n_chars_f >= 300 AND n_tokens >= 30
        |  AND n_punct * 1000 <= n_chars_f * 50""".stripMargin,
    "cur_source_quota" ->
      """SELECT source, doc_id, rn FROM (
        | SELECT source, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 5""".stripMargin,
    "cur_stratified_sample" ->
      """SELECT doc_id, source FROM (
        | SELECT doc_id, source,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000 AS b
        | FROM documents) t
        |WHERE b < CASE WHEN source = 'src0' THEN 1000
        |               WHEN source = 'src1' THEN 100
        |               ELSE 500 END""".stripMargin,
    "cur_sample_per_source" ->
      """SELECT source, doc_id, rn FROM (
        | SELECT source, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY ((doc_id + 1) * 48271) % 2147483647, doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 10""".stripMargin,
    "ids_contiguous" ->
      """SELECT o_orderkey,
        | ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
        |FROM orders""".stripMargin,
    "decon_exact" ->
      """WITH norm AS (
        | SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        | FROM documents),
        |bench AS (SELECT DISTINCT h FROM norm WHERE doc_id < 50),
        |train AS (
        | SELECT doc_id, h FROM norm WHERE doc_id >= 50
        | UNION ALL
        | SELECT doc_id + 30000,
        |  md5(trim(regexp_replace(lower('  ' ||
        |    replace(upper(text), ' ', '  ')), '\s+', ' ', 'g')))
        | FROM documents WHERE doc_id < 50 AND doc_id % 3 = 1)
        |SELECT t.doc_id, t.h AS content_hash
        |FROM train t WHERE t.h IN (SELECT h FROM bench)""".stripMargin,
    "cur_epoch_mix" -> epochMixSql,
    "cur_shuffle_deterministic" ->
      """SELECT doc_id,
        | ROW_NUMBER() OVER (ORDER BY md5('shuffle|' || text), doc_id) - 1
        |  AS shuffle_pos
        |FROM documents""".stripMargin,
    "cur_dataset_card" ->
      """WITH d AS (
        | SELECT source, lang,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |            AS BIGINT) END AS nt,
        |  CAST(length(text) AS BIGINT) AS nc, md5(text) AS h
        | FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        | CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        | CAST(SUM(nt) AS BIGINT) AS n_tokens,
        | CAST(SUM(nc) AS BIGINT) AS n_chars,
        | CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_docs,
        | CAST(SUM(nc) // COUNT(*) AS BIGINT) AS mean_chars
        |FROM d""".stripMargin,
    "cur_interleave_mix" ->
      """SELECT doc_id, source, CAST(ridx AS BIGINT) AS ridx,
        | ROW_NUMBER() OVER (ORDER BY ridx, source) - 1 AS pos
        |FROM (
        | SELECT doc_id, source,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS ridx
        | FROM documents) t""".stripMargin,
    "cur_mixture_report" ->
      s"""WITH toks AS (
        | SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
        |  END AS n_tokens
        | FROM documents),
        |mix AS (
        |$epochMixSql),
        |per AS (
        | SELECT m.source, CAST(COUNT(DISTINCT m.doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_out
        | FROM mix m JOIN toks t USING (doc_id) GROUP BY 1)
        |SELECT source, n_docs, n_copies, tokens_out,
        | CAST(tokens_out * 1000 // SUM(tokens_out) OVER () AS BIGINT)
        |  AS share_pm
        |FROM per""".stripMargin,
    // CAST back to BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, which pandas
    // renders as float64 — the driver's value hash then sees 500.0 vs 500.
    "cur_token_shards" ->
      """SELECT source, doc_id, n_tokens, cum_tokens,
        | CAST((cum_tokens - n_tokens) // 500 AS BIGINT) AS shard
        |FROM (
        | SELECT source, doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_tokens
        | FROM (
        |  SELECT source, doc_id,
        |   CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |   END AS n_tokens
        |  FROM documents) t0) t1""".stripMargin,
    "decon_ngram_overlap" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(t) < 5 THEN []
        |        ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |              || ' ' || t[i+4] for i in range(1, len(t) - 3)] END)) AS s
        | FROM (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents) t0),
        |bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 50),
        |train AS (SELECT doc_id, s FROM sh WHERE doc_id >= 50)
        |SELECT train.doc_id,
        | CAST(COUNT(DISTINCT train.s) AS BIGINT) AS n_hit_shingles,
        | CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
        |FROM train JOIN bench ON train.s = bench.s
        |GROUP BY 1""".stripMargin,
    "cur_token_budget_select" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT) AS quality,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, quality, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        | FROM t)
        |SELECT doc_id, quality, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 20000""".stripMargin,
    // Oracle = the EXACT word-5-gram jaccard answer at threshold 1/2
    // (no LSH in the oracle — the gate also proves the banding lost no
    // qualifying pair on this fixture).
    "decon_fuzzy_minhash" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(t) < 5 THEN []
        |        ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |              || ' ' || t[i+4] for i in range(1, len(t) - 3)] END)) AS s
        | FROM (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents) t0),
        |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        | SELECT t.doc_id, b.doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS i
        | FROM sh t JOIN sh b ON t.s = b.s AND t.doc_id >= 50 AND b.doc_id < 50
        | GROUP BY 1, 2)
        |SELECT inter.doc_id, bench_id, i AS n_inter,
        | ct.n AS n_train, cb.n AS n_bench
        |FROM inter
        |JOIN cnt ct ON ct.doc_id = inter.doc_id
        |JOIN cnt cb ON cb.doc_id = bench_id
        |WHERE 3 * i >= ct.n + cb.n""".stripMargin,
    "cur_pack_sequences" ->
      """SELECT source, doc_id, seq_id,
        | GREATEST(tok_start, seq_id * 256) - tok_start AS tok_from,
        | LEAST(tok_end, (seq_id + 1) * 256) - tok_start AS tok_to
        |FROM (
        | SELECT source, doc_id, tok_end - n_tokens AS tok_start, tok_end,
        |  unnest(range((tok_end - n_tokens) // 256, (tok_end - 1) // 256 + 1))
        |   AS seq_id
        | FROM (
        |  SELECT source, doc_id, n_tokens,
        |   CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS tok_end
        |  FROM (
        |   SELECT source, doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |   FROM documents) t0
        |  WHERE n_tokens > 0) t1) t2""".stripMargin,
    // the stage-oracle fragments composed in pipeline order — dedup
    // (min-id per md5), quality (50/5/50‰), overlap 5-gram decontam vs
    // doc_id<50, quota 15/source, md5 split, train-side 256 packing
    "cur_pipeline_packed" ->
      """WITH train0 AS (
        | SELECT doc_id, text, source FROM documents WHERE doc_id >= 50),
        |keep AS (
        | SELECT MIN(doc_id) AS doc_id FROM train0 GROUP BY md5(text)),
        |dd AS (SELECT t.* FROM train0 t JOIN keep USING (doc_id)),
        |q AS (
        | SELECT doc_id FROM (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
        |   CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |   END AS nt,
        |   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |        AS BIGINT) AS np
        |  FROM dd) t
        | WHERE nc >= 50 AND nt >= 5 AND np * 1000 <= nc * 50),
        |g AS (SELECT dd.* FROM dd JOIN q USING (doc_id)),
        |gsh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(t) < 5 THEN []
        |        ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |              || ' ' || t[i+4] for i in range(1, len(t) - 3)] END)) AS s
        | FROM (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM g) t0),
        |bsh AS (
        | SELECT DISTINCT s FROM (
        |  SELECT unnest(list_distinct(
        |   CASE WHEN len(t) < 5 THEN []
        |        ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |              || ' ' || t[i+4] for i in range(1, len(t) - 3)] END)) AS s
        |  FROM (
        |   SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |   FROM documents WHERE doc_id < 50) t0) t1),
        |dirty AS (SELECT DISTINCT doc_id FROM gsh JOIN bsh USING (s)),
        |clean AS (
        | SELECT g.* FROM g WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
        |quota AS (
        | SELECT doc_id, text, source FROM (
        |  SELECT clean.*,
        |   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM clean) t WHERE rn <= 15),
        |tr AS (
        | SELECT * FROM quota
        | WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 80)
        |SELECT source, doc_id, seq_id,
        | GREATEST(tok_start, seq_id * 256) - tok_start AS tok_from,
        | LEAST(tok_end, (seq_id + 1) * 256) - tok_start AS tok_to
        |FROM (
        | SELECT source, doc_id, tok_end - n_tokens AS tok_start, tok_end,
        |  unnest(range((tok_end - n_tokens) // 256, (tok_end - 1) // 256 + 1))
        |   AS seq_id
        | FROM (
        |  SELECT source, doc_id, n_tokens,
        |   CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS tok_end
        |  FROM (
        |   SELECT source, doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |   FROM tr) t0
        |  WHERE n_tokens > 0) t1) t2""".stripMargin,
    "cur_temperature_mix" ->
      """WITH d AS (
        | SELECT doc_id, text, substr(source, 4, 1) AS domain FROM documents),
        |c AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_d FROM d GROUP BY 1),
        |m AS (SELECT MAX(n_d) AS n_max FROM c)
        |SELECT doc_id, domain, b FROM (
        | SELECT d.doc_id, d.domain,
        |  ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 1000 AS b,
        |  c.n_d, m.n_max
        | FROM d JOIN c USING (domain) CROSS JOIN m) t
        |WHERE b * b * n_max < 1000000 * n_d""".stripMargin,
    // same hashed-feature counts, smoothing, and per-feature micro
    // quantization as Curation.dsirScore; docs with no tokens score 0
    "cur_dsir_select" ->
      """WITH toks AS (
        | SELECT doc_id, tgt,
        |  ('0x' || substr(md5(w), 1, 8))::BIGINT % 4096 AS bucket
        | FROM (
        |  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
        |   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents) x
        | WHERE strlen(w) > 0),
        |counts AS (
        | SELECT bucket, COUNT(*) AS cr,
        |  SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        | FROM toks GROUP BY 1),
        |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt, COUNT(*) AS nb FROM counts),
        |lam AS (
        | SELECT bucket,
        |  CAST(FLOOR(
        |    (ln((ct + 1) / CAST(nt + nb AS DOUBLE))
        |     - ln((cr + 1) / CAST(nr + nb AS DOUBLE)))
        |    * 1e6 + 0.5) AS BIGINT) AS lam_micro
        | FROM counts, tot),
        |scored AS (
        | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |  CAST(SUM(lam_micro) AS BIGINT) AS dsir_micro
        | FROM toks JOIN lam USING (bucket)
        | GROUP BY doc_id)
        |SELECT d.doc_id,
        | COALESCE(s.n_toks, 0) AS n_toks,
        | COALESCE(s.dsir_micro, 0) AS dsir_micro,
        | CAST(COALESCE(s.dsir_micro, 0) > 0 AS INT) AS selected
        |FROM documents d LEFT JOIN scored s USING (doc_id)""".stripMargin)
}
