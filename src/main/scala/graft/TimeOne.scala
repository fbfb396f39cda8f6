package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time a single registered query twice (cold + warm) at a
  * given sf dir — `runMain graft.TimeOne <query> <sfDir>`. Not part of
  * the library surface; the driver-facing benchmark is [[Bench]]. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
