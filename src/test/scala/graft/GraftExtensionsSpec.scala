package graft

import graft.functions.{ContentChunks, CosineSim, DotProduct, MinHashSig, RollingHash, Shingles, SimHash64}

/** The SQL registration path. A shared test JVM can't rebuild the session
  * with `withExtensions` (getOrCreate reuses the existing one), so this
  * spec (a) exercises GraftExtensions.apply against a fresh
  * SparkSessionExtensions to prove the wiring is well-formed, and (b)
  * registers the same builders into the live session's function registry
  * and calls them from SQL text. */
class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions wiring is well-formed (count pinned in SqlSurfaceAuditSpec)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders validated below
  }

  test("GraftExtensions registers the as-of strategy and pruning rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    import org.apache.spark.sql.graftbridge.Bridge
    assert(Bridge.builtPlannerStrategies(ext, spark)
      .contains(graft.plans.AsOfJoinStrategy))
    assert(Bridge.builtPlannerStrategies(ext, spark)
      .contains(graft.plans.TopKPerKeyStrategy),
      "the heap top-k strategy must install with the extensions")
    assert(Bridge.builtOptimizerRules(ext, spark)
      .contains(graft.plans.PruneAsOfColumns))
    assert(Bridge.builtOptimizerRules(ext, spark)
      .contains(graft.plans.RewriteWindowTopK),
      "window-topk auto-rewrite must install with the extensions")
  }

  test("heavy_hitters callable from SQL as an aggregate") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("heavy_hitters",
      exprs => graft.functions.MisraGries(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    import spark.implicits._
    Seq("a", "a", "b", "a", "c").toDF("s").createOrReplaceTempView("hh_in")
    val r = spark.sql(
      "SELECT heavy_hitters(s, 8) AS hh FROM hh_in").collect()(0)
    val top = r.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getString(0) == "a" && top.head.getLong(1) == 3L)
    assert(top.map(_.getString(0)) == Seq("a", "b", "c"))
  }

  test("z_value callable from SQL ≡ the Layout.zValue Column form") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("z_value",
      exprs => GraftExtensions.zValueExpr(exprs.head, exprs(1), 16),
      "built-in")
    import spark.implicits._
    Seq((3L, 1L), (65535L, 0L)).toDF("a", "b").createOrReplaceTempView("zv_in")
    val got = spark.sql("SELECT z_value(a, b) FROM zv_in ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 0x55555555L))
  }

  test("rolling_hash / simhash64 / minhash_sig / content_chunks callable from SQL") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("content_chunks",
      exprs => ContentChunks(exprs.head,
        if (exprs.size > 1) exprs(1).eval().asInstanceOf[Number].longValue()
        else 0x3FL), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("char_shingles",
      exprs => Shingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        | simhash64(array('a','b')) AS sh,
        | minhash_sig(array('a','b'), 4) AS mh,
        | content_chunks(repeat('xy', 40)) AS cc,
        | cosine_sim(array(1D, 2D), array(2D, 4D)) AS cs,
        | dot_product(array(1D, 2D), array(3D, 4D)) AS dp,
        | char_shingles('abab', 3) AS sg""".stripMargin).collect()(0)
    assert(r.getLong(0) == RollingHash.hash("abc"))
    assert(r.getSeq[Long](2).length == 4)
    // chunks reassemble to the input (lossless cover)
    assert(r.getSeq[String](3).mkString == "xy" * 40)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12) // parallel vectors
    assert(r.getDouble(5) == 11.0)
    assert(r.getSeq[String](6) == Seq("aba", "bab"))
  }
}
