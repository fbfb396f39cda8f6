package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.SketchExpressions._

/** The fused sketch kernels replace SQL-composed forms in the hot paths of
  * dedup / ANN. These tests pin bit-identity against the exact SQL
  * expressions they replaced, on real fixture data — the property the
  * DuckDB oracle compares rely on. */
class SketchKernelSpec extends SparkTestBase {

  test("char_shingles ≡ array_distinct(transform(sequence, substr)) on fixture docs") {
    val docs = Tables(spark, sfDir, "documents")
    val mismatches = docs
      .select(col("doc_id"),
        char_shingles(col("text"), 3).as("fast"),
        expr(
          """CASE WHEN length(text) >= 3
            | THEN array_distinct(transform(sequence(1, length(text) - 2),
            |      i -> substr(text, i, 3)))
            | ELSE array() END""".stripMargin).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("char_shingles edge cases: short, exact-length, repeated, multi-byte") {
    // register under a temp name to avoid clashing with extension wiring
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("char_shingles2",
      exprs => Shingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    val rows = spark.sql(
      """SELECT char_shingles2(s, 3) AS sh FROM VALUES
        | (''), ('ab'), ('abc'), ('aaaa'), ('héllo') AS t(s)""".stripMargin)
    val got = rows.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      Nil, Nil, List("abc"), List("aaa"), List("hél", "éll", "llo")))
  }

  test("dot_product and cosine_sim ≡ the SQL folds on fixture embeddings") {
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val pairs = a.crossJoin(b)
      .filter(col("a_id") < col("b_id") && col("b_id") < col("a_id") + 7)
    val mismatches = pairs
      .withColumn("dp_fast", dot_product(col("va"), col("vb")))
      .withColumn("dp_slow", expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, z) -> a + z)"))
      .withColumn("cs_fast", cosine_sim(col("va"), col("vb")))
      .withColumn("cs_slow", expr(
        """aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, z) -> acc + z)
          | / (sqrt(aggregate(va, 0D, (acc, x) -> acc + x * x))
          |  * sqrt(aggregate(vb, 0D, (acc, x) -> acc + x * x)))""".stripMargin))
      // bit-exact, not approximate: the oracle hash compare needs identity
      .filter(col("dp_fast") =!= col("dp_slow") || col("cs_fast") =!= col("cs_slow"))
      .count()
    assert(mismatches == 0)
  }

  test("cosine_sim of a zero or empty vector is 0, never NaN (NaN would " +
      "outrank every real neighbor in a descending top-k)") {
    import spark.implicits._
    val rows = Seq(
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0)),  // zero left
      (Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0)),  // zero right
      (Array.empty[Double], Array(1.0, 2.0, 3.0)))   // empty
      .toDF("va", "vb")
      .select(cosine_sim(col("va"), col("vb")).as("cs")).collect()
    rows.foreach(r => assert(r.getDouble(0) == 0.0, s"got ${r.getDouble(0)}"))
  }
}
