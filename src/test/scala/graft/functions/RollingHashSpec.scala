package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.RollingHash.{hash, rolling_hash}

class RollingHashSpec extends SparkTestBase {

  test("expression matches the reference Scala implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "abc", "hello world", "üñïçødé ✓", "a" * 1000)
    val got = samples.toDF("s").select(rolling_hash(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == samples.map(hash))
  }

  test("known algebra: h(s) = h(prefix)*31 + last byte (incremental property)") {
    assert(hash("ab") == hash("a") * 31L + 'b'.toLong)
    assert(hash("") == 0L)
  }

  test("runs inside whole-stage codegen on the documents table") {
    val df = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), rolling_hash(col("text")).as("rh"))
    // distinct hashes on the fixture (no exact dup texts at sf0.001)
    assert(df.select("rh").distinct().count() == df.count())
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string;
    // the Project carrying rollinghash must be inside one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("rollinghash") && l.trim.startsWith("*(")),
      s"rollinghash not inside a codegen stage:\n$plan")
  }

  test("null input yields null") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(rolling_hash(col("s")).as("h")).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }
}
