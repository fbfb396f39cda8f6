package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (spark_guide: lazy val, not
  * per-test), with the same settings as Verify/Bench. Honors
  * SPARK_GRAFT_MASTER (see GraftSession.masterFor) so the key suites
  * can be driven under local-cluster[n,c,m] — real executor JVMs —
  * for the multi-process serialization gate. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(SparkSession.builder()
      .master(GraftSession.masterFor("4"))
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor("4"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
