package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data run
  * actually executes, built purely from the library stages so each
  * piece stays individually oracle-checked. Order matters and is the
  * standard one:
  *
  *  1. exact dedup (cheapest reduction first — one hash shuffle),
  *  2. quality gate (narrow filter),
  *  3. benchmark decontamination (broadcast anti join — drop train docs
  *     sharing a k-shingle with the eval suite),
  *  4. leak-safe content-hash split (narrow),
  *  5. fixed-length sequence packing per source over the train split.
  *
  * Each stage only shrinks or relabels — nothing re-expands until the
  * final packing explode — so the pipeline's shuffle footprint is the
  * dedup hash, the per-group packing window, and the broadcast joins'
  * metadata. Returns the packed train sequences plus a tiny per-stage
  * row-count report for pipeline observability. */
object CurationPipeline {

  final case class Report(stage: String, rows: Long)

  /** The decontamination drop-set at the chosen strictness — one id
    * column of contaminated docs. Shared by the batch pipeline and its
    * incremental twin ([[graft.streaming.StreamingCuration]]) so the
    * drop rule can't drift between them. Per-doc vs the static
    * benchmark only, so it is batch-decomposable by construction. */
  private[graft] def dirtyIds(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, decontamK: Int,
      decontamMode: String): DataFrame =
    (decontamMode match {
      case "overlap" =>
        Curation.decontaminate(docs, benchmark, idCol, textCol, decontamK)
          .select(col("doc_id").as(idCol))
      case "fuzzy" =>
        Curation.decontaminateFuzzy(docs, benchmark, idCol, textCol,
            k = decontamK)
          .select(col("doc_id").as(idCol))
      case "exact" =>
        Curation.decontaminateExact(docs, benchmark, idCol, textCol)
          .select(col(idCol))
      case other => throw new IllegalArgumentException(
        s"decontamMode must be overlap|fuzzy|exact, got '$other'")
    }).distinct()

  /** Run the full pipeline; returns (packed train sequences, report).
    *
    * `decontamMode` is the drop-rule strictness knob, ordered from
    * most to least aggressive (flagged sets nest — overlap ⊇ fuzzy ⊇
    * exact, since a near-dup shares shingles and an exact copy is a
    * jaccard-1 near-dup):
    *  - `"overlap"` (default, strictest): any shared `decontamK`-gram
    *    with the benchmark drops the doc.
    *  - `"fuzzy"`: only word-`decontamK`-gram jaccard ≥ ½
    *    near-duplicates drop ([[Curation.decontaminateFuzzy]]) — the
    *    right rule when the benchmark shares natural idioms with
    *    honest data and the overlap rule would starve the corpus.
    *    Both modes shingle at the SAME `decontamK`, which is what
    *    makes the overlap ⊇ fuzzy nesting hold for every k.
    *  - `"exact"`: only verbatim (case/whitespace-normalized) copies
    *    drop.
    *
    * `quotaPerSource` (optional) caps each source at its k lowest-id
    * clean docs ([[Curation.groupQuota]]) after decontamination, before
    * the split — deterministic source balancing so one crawl dump
    * can't dominate the mix. */
  def curate(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minChars: Int = 100,
      minTokens: Int = 10, decontamK: Int = 5,
      seqLen: Long = 256L, decontamMode: String = "overlap",
      quotaPerSource: Option[Int] = None): (DataFrame, Seq[Report]) = {
    val st = stages(docs, benchmark, idCol, textCol, sourceCol, minChars,
      minTokens, decontamK, seqLen, decontamMode, quotaPerSource)
    val report = Seq(
      Report("input", docs.count()), Report("deduped", st.deduped.count()),
      Report("quality", st.gated.count()),
      Report("decontaminated", st.clean.count()),
      Report("quota", st.quotad.count()),
      Report("train", st.train.count()),
      Report("packed_spans", st.packed.count()))
    (st.packed, report)
  }

  /** [[curate]] without the per-stage counts — the same packed-train
    * DataFrame as one lazy plan (the form a registered query or a
    * downstream pipeline composes; counting every stage forces five
    * extra jobs a production run doesn't want). */
  def curatePacked(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minChars: Int = 100,
      minTokens: Int = 10, decontamK: Int = 5,
      seqLen: Long = 256L, decontamMode: String = "overlap",
      quotaPerSource: Option[Int] = None): DataFrame =
    stages(docs, benchmark, idCol, textCol, sourceCol, minChars,
      minTokens, decontamK, seqLen, decontamMode, quotaPerSource).packed

  private final case class Stages(deduped: DataFrame, gated: DataFrame,
    clean: DataFrame, quotad: DataFrame, train: DataFrame, packed: DataFrame)

  private def stages(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minChars: Int,
      minTokens: Int, decontamK: Int, seqLen: Long, decontamMode: String,
      quotaPerSource: Option[Int]): Stages = {

    // 1. exact dedup: keep the minimum-id representative of each hash
    val keep = Dedup.exact(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    // keep/quality are one row per surviving doc — corpus-sized;
    // merge-pinned so no misestimate can broadcast them (round-9 100x)
    val deduped = docs.join(keep.hint("merge"), idCol)

    // 2. quality gate (signals recomputed per doc — narrow)
    val quality = Curation.qualityFilter(deduped, idCol, textCol,
        minChars = minChars, minTokens = minTokens)
      .select(col("doc_id").as(idCol))
    val gated = deduped.join(quality.hint("merge"), idCol)

    // 3. decontamination at the chosen strictness
    val dirty = dirtyIds(gated, benchmark, idCol, textCol, decontamK,
      decontamMode)
    val clean = gated.join(dirty, Seq(idCol), "left_anti")

    // 3b. optional per-source quota over the clean docs
    val quotad = quotaPerSource match {
      case None => clean
      case Some(k) =>
        Curation.groupQuota(clean, idCol, sourceCol, k).drop("rn")
    }

    // 4. leak-safe split; 5. pack the train split
    val split = quotad.withColumn("split", Curation.split(col(textCol)))
    val train = split.filter(col("split") === "train")
    val packed = Curation.packSequences(train, idCol, textCol, sourceCol,
      seqLen)

    Stages(deduped, gated, clean, quotad, train, packed)
  }
}
