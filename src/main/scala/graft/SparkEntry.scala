package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (name → DataFrame
  * builder) and, where the semantics are ANSI-SQL-expressible, a matching
  * DuckDB `oracles` entry. Column names are aligned on both sides because
  * the driver's comparator sorts columns by name before hashing.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracles),
      (AdvancedQueries.queries, AdvancedQueries.oracles),
      (EtlQueries.queries, EtlQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (HybridQueries.queries, HybridQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles),
      (CurationQueries.queries, CurationQueries.oracles),
      (GraphQueries.queries, GraphQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
