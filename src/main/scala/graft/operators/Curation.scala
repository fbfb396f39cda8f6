package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation library: deterministic dataset splitting,
  * C4-style quality gating, and per-source quota sampling — the
  * selection passes that run between dedup and tokenization in a
  * large-corpus pipeline. All predicates are integer-exact (no RNG, no
  * floats), so every pass is reproducible across runs, engines, and
  * partitionings, and each is DuckDB-oracle-checked via the registered
  * `CurationQueries` wrappers. */
object Curation {

  /** Deterministic content-hash bucket in [0, buckets): the first 8 md5
    * hex digits as an integer. Stable across engines and re-partitioning,
    * and identical texts land in the same bucket — so exact duplicates
    * can never straddle a train/test boundary (split-leak-safe), which
    * is why content beats doc-id as the split key. */
  def hashBucket(text: Column, buckets: Int = 100): Column =
    conv(substring(md5(text), 1, 8), 16, 10).cast("long") % buckets

  /** train/val/test assignment by content-hash percentile */
  def split(text: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(text)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified deterministic sampling: keep a doc when its content-hash
    * bucket (of 1000) falls under its group's per-mille rate — exact
    * per-group downsampling ratios with no RNG, reproducible across
    * engines and partitionings. A narrow filter over one scan. */
  def stratifiedHashSample(docs: DataFrame, textCol: String,
      groupCol: String, perMilleByGroup: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val rate = perMilleByGroup.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(r)).otherwise(acc)
      }
    docs.filter(hashBucket(col(textCol), 1000) < rate)
  }

  /** C4-style quality gate: minimum length and token count, bounded
    * punctuation density (per-mille, integer cross-multiplied). Returns
    * passing docs with their signals — a narrow filter over one scan. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minChars: Int = 300, minTokens: Int = 30,
      maxPunctPerMille: Int = 50): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
        length(t).cast("long").as("n_chars_f"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        TextAnalysis.charClassCount(t, "[.,!?;:]").as("n_punct"))
      .filter(col("n_chars_f") >= minChars && col("n_tokens") >= minTokens &&
        col("n_punct") * 1000 <= col("n_chars_f") * maxPunctPerMille)
  }

  /** Per-group quota sampling: keep the k lowest-id docs per group —
    * deterministic source balancing. One shuffle keyed by the group;
    * each group's window state is bounded because rows past the quota
    * rank are dropped immediately. */
  def groupQuota(docs: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame =
    docs.withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col(idCol))).cast("long"))
      .filter(col("rn") <= k)

  /** Token-budget shard packing: assign each doc to a shard of
    * ~`tokensPerShard` whitespace tokens, per group, in id order — the
    * shard-building step before sequence packing / tokenization. A doc's
    * shard is its group's running token count *before* it, divided by
    * the budget, so shards fill to the budget then roll over. Windows
    * are per-group (one shuffle on the group key), never global — the
    * scale-safe form of "cut the corpus into ~N-token files". */
  def tokenShards(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, tokensPerShard: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(groupCol), col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      // integer `div`, not `/`: double division would round where the
      // oracle's BIGINT floor-division truncates
      .withColumn("shard",
        expr(s"(cum_tokens - n_tokens) div $tokensPerShard"))
  }
}
