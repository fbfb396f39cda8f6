package graft.app

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.catalog.Catalog
import graft.config.Dialect
import graft.copy.{CopyPlanner, DataCopier}

/** The reverse conversion direction (the reference converts both ways —
  * README.md:7-8): JDBC source → parquet destination, with PK-range
  * partitioned reads planned from introspected metadata.
  *
  * Usage: ExportApp <jdbcUrl> <outDir>
  *
  * For each user table: introspect (S3–S5) → derive partition bounds
  * from the PK's min/max (the planner work the reference does with
  * COUNT(*) + offset math, done here with one bounds query) → partitioned
  * `spark.read.jdbc` → parquet write. Tables without a single numeric PK
  * fall back to an unpartitioned read (correct, just serial — the
  * composite-PK scale path is predicate partitioning via
  * CopyPlanner.lexRangePredicate).
  */
object ExportApp {
  def main(args: Array[String]): Unit = {
    val url = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val conn = DriverManager.getConnection(url)
    val specs = try {
      Catalog.listTables(conn, Dialect.Derby).map { case (schema, t) =>
        val spec = Catalog.introspectTable(conn, schema, t)
        // partition bounds for single numeric PKs: one min/max query
        val bounds = spec.primaryKey match {
          case Seq(pk) =>
            val rs = conn.createStatement()
              .executeQuery(s"SELECT MIN($pk), MAX($pk) FROM ${schema.fold(t)(s => s"$s.$t")}")
            if (rs.next() && rs.getObject(1) != null)
              Some((rs.getLong(1), rs.getLong(2)))
            else None
          case _ => None
        }
        (spec, bounds)
      }
    } finally conn.close()

    val props = new java.util.Properties()
    specs.foreach { case (spec, bounds) =>
      val df = DataCopier.readJdbc(spark, url, spec, props,
        numPartitions = cpus.toInt, pkBounds = bounds)
      val n = df.count()
      df.write.mode("overwrite").parquet(s"$outDir/${spec.name.toLowerCase}.parquet")
      println(s"[export] ${spec.name}: $n rows, " +
        s"${df.rdd.getNumPartitions} read partitions, pk=${spec.primaryKey.mkString(",")}")
    }
    spark.stop()
  }
}
