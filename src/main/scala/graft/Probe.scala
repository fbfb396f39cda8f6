package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: print fixture schemas to learn how Spark 4 reads the
  * driver-generated parquet (timestamp ms/ns → TIMESTAMP vs TIMESTAMP_NTZ,
  * nanos handling). Not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("orders", "lineitem", "events", "embeddings")) {
      println(s"=== $t")
      val df = spark.read.parquet(s"$dir/$t.parquet")
      df.printSchema()
      df.show(3, 60, vertical = true)
    }
    spark.stop()
  }
}
