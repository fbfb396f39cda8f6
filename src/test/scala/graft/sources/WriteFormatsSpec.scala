package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Sink-side formats and partition layout: hive-style partitioned
  * parquet writes prune at read time (PartitionFilters, not data
  * filters), and csv/json round-trips preserve row counts. The reference
  * is JDBC-only (SURVEY §2.1); these are engine-surface extensions. */
class WriteFormatsSpec extends SparkTestBase {

  test("partitionBy write → partition-pruned read") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables(spark, sfDir, "lineitem")
      .write.partitionBy("l_returnflag").mode("overwrite")
      .parquet(s"$dir/li")
    val pruned = spark.read.parquet(s"$dir/li")
      .filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition pruning:\n$plan")
    val expected = Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "A").count()
    assert(pruned.count() == expected)
  }

  test("csv and json round-trips preserve counts and keys") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val src = Tables(spark, sfDir, "nation")
    src.write.option("header", "true").mode("overwrite").csv(s"$dir/n_csv")
    src.write.mode("overwrite").json(s"$dir/n_json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/n_csv")
    val json = spark.read.json(s"$dir/n_json")
    assert(csv.count() == src.count() && json.count() == src.count())
    assert(csv.agg(sum("n_nationkey")).collect()(0).getLong(0) ==
      src.agg(sum("n_nationkey")).collect()(0).getLong(0))
    assert(json.agg(sum("n_nationkey")).collect()(0).getLong(0) ==
      src.agg(sum("n_nationkey")).collect()(0).getLong(0))
  }
}
