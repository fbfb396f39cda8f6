package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: dump `.explain("formatted")` for the named queries into
  * files — `runMain graft.ExplainProbe <outDir> <suffix> <q1> <q2>...`
  * writes `<outDir>/<query>_<suffix>.txt` per query (the optimization
  * rounds' plans/r{N}/ deliverable). `all` expands to every registered
  * query. Env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Not
  * part of the library surface. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainProbe <outDir> <suffix> <q>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(GraftSession.masterFor(cpus))
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(cpus))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.drop(2).sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[explain] $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
