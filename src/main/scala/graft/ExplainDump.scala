package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
/** Dev-only plan-dump main (sibling of [[PerfProbe]]): writes each named
  * query's `explain("formatted")` output to
  * `$SPARK_GRAFT_PLAN_DIR/<query>_$SPARK_GRAFT_PLAN_SUFFIX.txt` — the
  * `plans/r{N}/<q>_{before,after}.txt` evidence the optimization rounds
  * commit. Plan-build only: no jobs run beyond what plan-time requires
  * (file listing, a memoized shared stage's size estimate). Args: query
  * names; env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Not
  * part of the library surface. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "target/plans")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(GraftSession.masterFor(cpus))
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(cpus))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        println(s"[explain] FAILED $name: " +
          Option(e.getMessage).getOrElse(e.getClass.getName).take(160))
      }
    }
    spark.stop()
  }
}
