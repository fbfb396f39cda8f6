package graft.app

import java.sql.{DriverManager, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.{GraftSession, Tables}
import graft.catalog.{Catalog, ColumnSpec, TableSpec}
import graft.config.{ConvertMode, ConverterConfig, Dialect}
import graft.copy.{CopyPlanner, DataCopier}
import graft.ddl.DdlGenerator

/** The reference's `Converter.main` re-expressed (SURVEY §3.1): given a
  * source (fixture parquet dir standing in for the source database) and
  * a destination JDBC URL, run the 3-stage pipeline
  * tables → (indexes) → data with mode gates, then report totals.
  *
  * Usage: ConverterApp <sfDir> <jdbcUrl> [mode]
  *   e.g.  /root/testdata/sf0.001 "jdbc:derby:/tmp/graftdb;create=true" DropAndRecreate
  */
object ConverterApp {

  /** Spark schema → TableSpec (reverse of Catalog introspection) so the
    * DDL generator can target any dialect from a DataFrame source. */
  def specFromStruct(name: String, schema: StructType, pk: Seq[String]): TableSpec = {
    val cols = schema.fields.map { f =>
      val (jdbc, size, scale) = f.dataType match {
        case BooleanType => (Types.BOOLEAN, 0, 0)
        case LongType => (Types.BIGINT, 19, 0)
        case IntegerType => (Types.INTEGER, 10, 0)
        case ShortType | ByteType => (Types.SMALLINT, 5, 0)
        case FloatType => (Types.FLOAT, 0, 0)
        case DoubleType => (Types.DOUBLE, 0, 0)
        case d: DecimalType => (Types.DECIMAL, d.precision, d.scale)
        case StringType => (Types.VARCHAR, 4000, 0)
        case DateType => (Types.DATE, 0, 0)
        case TimestampType | TimestampNTZType => (Types.TIMESTAMP, 0, 0)
        case BinaryType => (Types.VARBINARY, 32000, 0)
        case other => throw new IllegalArgumentException(
          s"No JDBC mapping for $name.${f.name}: $other")
      }
      ColumnSpec(f.name, jdbc, size, scale, f.nullable && !pk.contains(f.name))
    }
    TableSpec(None, None, name, cols.toIndexedSeq, pk, Nil)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val url = args(1)
    val mode = if (args.length > 2) ConvertMode.parse(args(2)) else ConvertMode.SkipExisting
    val cfg = ConverterConfig(tableConvertMode = mode, dataConvertMode = mode)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // tables whose schemas are JDBC-expressible (arrays are carried as
    // zero-size opaque values by the reference and unsupported by most
    // JDBC destinations — embeddings stays parquet-only)
    val tables = Tables.names.filterNot(_ == "embeddings")
    // (l_orderkey, l_linenumber) is NOT unique in the fixture data, so
    // lineitem is effectively PK-less for a constrained destination —
    // the reference skips PK-less tables (TableConverter.java:246-250,
    // GenericJdbcTableWorker.java:32-36) and so do we.
    val enforceablePks = Tables.primaryKeys + ("lineitem" -> Seq.empty)

    // Derby: ask for DB creation via properties (a ";create=true" URL
    // attribute doesn't survive sbt's command parsing).
    val connProps = new java.util.Properties()
    if (url.startsWith("jdbc:derby:")) connProps.setProperty("create", "true")
    val conn = DriverManager.getConnection(url, connProps)
    try {
      conn.setAutoCommit(true)
      val existing = Catalog.listTables(conn, Dialect.Derby)
        .map(_._2.toUpperCase).toSet

      var totalRecords = 0L
      var totalBytes = 0L
      val t0 = System.currentTimeMillis()
      tables.foreach { t =>
        val df = Tables(spark, sfDir, t)
        val spec = specFromStruct(t, df.schema, enforceablePks(t))
        if (!spec.hasPrimaryKey) {
          println(s"[convert] $t: skipped (no primary key)")
        } else {
        // stage 1: DDL with mode gate (J2)
        val script = DdlGenerator.script(spec, Dialect.Derby, mode,
          existing.contains(t.toUpperCase), cfg) match {
          case Left(err) => throw new IllegalStateException(err)
          case Right(s) => s
        }
        val st = conn.createStatement()
        script.foreach(st.executeUpdate)
        st.close()
        val skippedExisting = script.isEmpty && existing.contains(t.toUpperCase)
        // stage 3: data copy (SkipExisting copies only into empty
        // destination tables — README.md:18)
        val destCount =
          if (!skippedExisting) 0L
          else {
            val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $t")
            rs.next(); rs.getLong(1)
          }
        if (mode == ConvertMode.SkipAll ||
            (mode == ConvertMode.SkipExisting && destCount > 0)) {
          println(s"[convert] $t: data skipped (mode=$mode, destRows=$destCount)")
        } else {
          val rpc = CopyPlanner.rowsPerCommit(spec, cfg)
          val report = DataCopier.writeJdbc(df, url, t, cfg, rpc)
          totalRecords += report.records
          totalBytes += report.bytes
          println(s"[convert] $t: ${report.records} records, ${report.bytes} bytes, " +
            s"rowsPerCommit=$rpc, ${report.elapsedMillis} ms")
        }
        }
      }
      println(s"[convert] TOTAL: $totalRecords records, $totalBytes bytes, " +
        s"${System.currentTimeMillis() - t0} ms")
    } finally conn.close()
    spark.stop()
  }
}
