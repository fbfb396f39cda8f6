package graft

import graft.functions.{ContentChunks, MinHashSig, RollingHash, SimHash64}

/** The SQL registration path. A shared test JVM can't rebuild the session
  * with `withExtensions` (getOrCreate reuses the existing one), so this
  * spec (a) exercises GraftExtensions.apply against a fresh
  * SparkSessionExtensions to prove the wiring is well-formed, and (b)
  * registers the same builders into the live session's function registry
  * and calls them from SQL text. */
class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects four functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders validated below
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
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        | simhash64(array('a','b')) AS sh,
        | minhash_sig(array('a','b'), 4) AS mh,
        | content_chunks(repeat('xy', 40)) AS cc""".stripMargin).collect()(0)
    assert(r.getLong(0) == RollingHash.hash("abc"))
    assert(r.getSeq[Long](2).length == 4)
    // chunks reassemble to the input (lossless cover)
    assert(r.getSeq[String](3).mkString == "xy" * 40)
  }
}
