package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ContentChunks, MinHashSig, RollingHash, SimHash64}

/** `SparkSessionExtensions` hook registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT rolling_hash(text)
  * ...")` works next to the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[RollingHash].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial hash of str's UTF-8 bytes"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>, k) - k-element MinHash signature"),
      (children: Seq[Expression]) => {
        val k = children(1).eval().asInstanceOf[Number].intValue()
        MinHashSig(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("content_chunks"),
      info("content_chunks",
        "content_chunks(str[, mask]) - content-defined chunks (Rabin-style boundaries at window-hash & mask == 0)"),
      (children: Seq[Expression]) => {
        val mask = if (children.size > 1)
          children(1).eval().asInstanceOf[Number].longValue() else 0x3FL
        ContentChunks(children.head, mask)
      }))
  }
}
