package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The fused md5-prefix kernels must be BIT-IDENTICAL to the composed
  * built-in forms they replace (`conv(substring(md5(x), 1, n), 16, 10)`
  * and the bootstrap explode/when-chain) — the DuckDB oracles still
  * evaluate the SQL construction, so any divergence is an instant
  * oracle failure across half the surface. */
class HashExpressionsSpec extends SparkTestBase {

  test("md5_prefix64 ≡ conv(substring(md5(string), 1, n), 16, 10) for every used width") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "Zürich ❄ emoji 🙂",
      "the quick brown fox", "0", "-17", "a" * 300).toDF("t")
    for (n <- Seq(4, 8, 10, 15)) {
      val rows = texts.select(
        HashFunctions.md5_prefix64(col("t"), n).as("fused"),
        expr(s"cast(conv(substring(md5(t), 1, $n), 16, 10) as bigint)").as("ref"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n row=$r"))
    }
  }

  test("md5_prefix64 ≡ the composed form on BINARY input") {
    import spark.implicits._
    val bins = Seq(Array[Byte](), Array[Byte](1, 2, 3),
      Array.tabulate(64)(i => (i * 7 - 128).toByte)).toDF("b")
    for (n <- Seq(4, 8)) {
      val rows = bins.select(
        HashFunctions.md5_prefix64(col("b"), n).as("fused"),
        expr(s"cast(conv(substring(md5(b), 1, $n), 16, 10) as bigint)").as("ref"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n row=$r"))
    }
  }

  test("bootstrap_weights ≡ the explode + md5/conv + Poisson when-chain") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 99999L, 123456789L, -3L).toDF("id")
    val fused = ids
      .select(col("id"), posexplode(
        HashFunctions.bootstrap_weights(col("id").cast("string"), 64))
        .as(Seq("b", "w")))
    val ref = ids
      .select(col("id"), explode(expr("sequence(0, 63)")).as("b"))
      .select(col("id"), col("b"),
        expr("""cast(conv(substring(md5(concat(
              |  cast(id as string), ':', cast(b as string))), 1, 8),
              |  16, 10) as bigint)""".stripMargin).as("u"))
      .withColumn("w",
        when(col("u") < 1580030168L, 0L)
          .when(col("u") < 3160060337L, 1L)
          .when(col("u") < 3950075421L, 2L)
          .when(col("u") < 4213413783L, 3L)
          .when(col("u") < 4279248373L, 4L)
          .when(col("u") < 4292415291L, 5L)
          .when(col("u") < 4294609777L, 6L)
          .otherwise(7L))
      .select(col("id"), col("b").cast("int").as("b"), col("w"))
    assert(fused.except(ref).isEmpty && ref.except(fused).isEmpty)
    // and the weights really vary (not all one bucket)
    assert(fused.select("w").distinct().count() > 2)
  }
}
