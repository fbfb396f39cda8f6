package graft.app

import java.sql.{DriverManager, Types}
import java.util.concurrent.Executors
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.{GraftSession, Tables}
import graft.catalog.{Catalog, ColumnSpec, TableSpec}
import graft.config.{ConvertMode, ConverterConfig, Dialect}
import graft.copy.{CopyPlanner, DataCopier}
import graft.ddl.DdlGenerator

/** The reference's `Converter.main` re-expressed (SURVEY §3.1): given a
  * source and a destination JDBC URL, run the 3-stage pipeline
  * tables → (indexes) → data with mode gates, then report totals.
  *
  * Usage: ConverterApp <source> <destJdbcUrl> [mode] [--yes]
  *
  * `source` is either
  *  - a JDBC URL (`jdbc:…`) — the reference's real day-one flow
  *    (`SRC/Converter.java:57-58`): the source catalog is introspected
  *    (`Catalog.introspectAll` — tables, columns, PKs, secondary
  *    indexes; source discovery `SRC/data/DataCopier.java:108-126`),
  *    DDL runs against the destination, and each table is read as a
  *    PK-range-partitioned Spark scan (`DataCopier.readJdbc`) and
  *    batch-INSERTed; or
  *  - a fixture parquet directory (testing convenience) — schemas come
  *    from the parquet footers and the fixture PK/index registry.
  *
  *   e.g.  "jdbc:derby:memory:srcdb" "jdbc:derby:/tmp/graftdb" DropAndRecreate --yes
  */
object ConverterApp {

  /** Source/destination dialect from the URL scheme (the reference keys
    * the same decision off its configuration's DatabaseType). */
  private[app] def dialectFor(url: String): Dialect =
    if (url.toLowerCase.startsWith("jdbc:cloudspanner:")) Dialect.Spanner
    else if (url.toLowerCase.startsWith("jdbc:postgresql:")) Dialect.PostgreSql
    else Dialect.Derby

  /** Destructive-mode gate — the reference interactively confirms before
    * dropping objects (Converter.java:43-56,85-110); headless Spark jobs
    * can't prompt, so DropAndRecreate requires an explicit `--yes` ack and
    * aborts BEFORE any DDL runs otherwise. */
  def requireDestructiveAck(mode: ConvertMode, acked: Boolean): Either[String, Unit] =
    if (mode == ConvertMode.DropAndRecreate && !acked)
      Left("mode=DropAndRecreate drops destination tables; re-run with --yes to confirm")
    else Right(())

  /** Spark schema → TableSpec (reverse of Catalog introspection) so the
    * DDL generator can target any dialect from a DataFrame source. */
  def specFromStruct(name: String, schema: StructType, pk: Seq[String],
      indexes: Seq[graft.catalog.IndexSpec] = Nil): TableSpec = {
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
    TableSpec(None, None, name, cols.toIndexedSeq, pk, indexes)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // every failure path honors the abort contract (stderr ABORT line,
    // session stopped, exit 2) — not just argument errors: DDL-script
    // conflicts throw IllegalStateException, the JDBC layer SQLException
    try run(args, spark)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[convert] ABORT: ${e.getMessage}"); spark.stop(); sys.exit(2)
    }
    spark.stop()
  }

  /** The full pipeline against a caller-provided session (main wraps
    * this with session lifecycle + exit codes; tests call it directly). */
  def run(args: Array[String], spark: SparkSession): Unit = {
    val acked = args.contains("--yes")
    val positional = args.filterNot(_.startsWith("--"))
    if (positional.length < 2) throw new IllegalArgumentException(
      "usage: ConverterApp <sourceDirOrJdbcUrl> <destJdbcUrl> [mode] [--yes]")
    val source = positional(0)
    val url = positional(1)
    val mode = if (positional.length > 2) ConvertMode.parse(positional(2))
      else ConvertMode.SkipExisting
    requireDestructiveAck(mode, acked) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(()) => ()
    }
    val cfg = ConverterConfig(tableConvertMode = mode, dataConvertMode = mode)

    // --- source discovery: one (TableSpec, partitioned read) per table.
    val srcIsJdbc = source.toLowerCase.startsWith("jdbc:")
    val srcConn =
      if (srcIsJdbc) Some(DriverManager.getConnection(source)) else None
    // everything below runs inside the try so the source connection
    // cannot leak when introspection or the destination connect throws
    try {
    val sourceTables: Seq[(graft.catalog.TableSpec, () => org.apache.spark.sql.DataFrame)] =
      srcConn match {
        case Some(c) =>
          // the reference's real flow: introspect the live source catalog
          // (tables/columns/PKs/indexes) and read each table as a
          // PK-range-partitioned scan pushed down to the source
          Catalog.introspectAll(c, dialectFor(source)).map { spec =>
            (spec, () => DataCopier.readJdbc(spark, source, spec,
              new java.util.Properties(), cfg.maxNumberOfWorkers, None))
          }
        case None =>
          // fixture mode: schemas from parquet footers, PKs/indexes from
          // the fixture registry. Tables whose schemas aren't
          // JDBC-expressible stay parquet-only (arrays are carried as
          // zero-size opaque values by the reference and unsupported by
          // most JDBC destinations — embeddings).
          // (l_orderkey, l_linenumber) is NOT unique in the fixture data,
          // so lineitem is effectively PK-less for a constrained
          // destination — the reference skips PK-less tables
          // (TableConverter.java:246-250, GenericJdbcTableWorker.java:
          // 32-36) and so do we.
          val enforceablePks = Tables.primaryKeys + ("lineitem" -> Seq.empty)
          Tables.names.filterNot(_ == "embeddings").map { t =>
            val df = Tables(spark, source, t)
            (specFromStruct(t, df.schema, enforceablePks(t),
              Tables.indexes.getOrElse(t, Nil)), () => Tables(spark, source, t))
          }
      }

    // Destination tables are unqualified (the source schema has no
    // meaning in the destination catalog), so same-named tables from
    // different source schemas would collide on one destination table —
    // fail fast instead of interleaving their DDL/rows.
    locally {
      val dups = sourceTables.map(_._1.name.toUpperCase)
        .groupBy(identity).collect { case (n, g) if g.size > 1 => n }
      if (dups.nonEmpty) throw new IllegalArgumentException(
        "source tables collide on unqualified destination name(s): " +
          dups.mkString(", ") + " (same-named tables in different source " +
          "schemas need distinct destination names)")
    }

    // Derby: ask for DB creation via properties (a ";create=true" URL
    // attribute doesn't survive sbt's command parsing).
    val connProps = new java.util.Properties()
    if (url.startsWith("jdbc:derby:")) connProps.setProperty("create", "true")
    val destDialect = dialectFor(url)
    val conn = DriverManager.getConnection(url, connProps)
    try {
      conn.setAutoCommit(true)
      val existing = Catalog.listTables(conn, destDialect)
        .map(_._2.toUpperCase).toSet

      val t0 = System.currentTimeMillis()

      // --- phase 1 (sequential, driver-side): DDL with mode gates (J2).
      // The reference also runs DDL before any data moves
      // (Converter.java:69-83).
      final case class Plan(spec: graft.catalog.TableSpec,
          read: () => org.apache.spark.sql.DataFrame,
          copyData: Boolean, reason: String)
      // tables stage + index stage 2 run from the same spec: DdlGenerator
      // emits CREATE TABLE then CREATE INDEX per table (Converter.java:
      // 69-83 runs IndexConverter right after TableConverter), and the
      // carried indexes raise the per-row mutation count in rows-per-commit
      // (X3/A5 — each secondary index is one extra mutation per row).
      val plans = sourceTables.map { case (spec0, read) =>
        // destination tables are unqualified: the source schema (e.g.
        // Derby APP) has no meaning in the destination catalog
        val spec = spec0.copy(schema = None)
        val t = spec.name
        if (!spec.hasPrimaryKey) Plan(spec, read, copyData = false, "no primary key")
        else {
          val script = DdlGenerator.script(spec, destDialect, mode,
            existing.contains(t.toUpperCase), cfg) match {
            case Left(err) => throw new IllegalStateException(err)
            case Right(s) => s
          }
          val st = conn.createStatement()
          script.foreach(st.executeUpdate)
          st.close()
          val skippedExisting = script.isEmpty && existing.contains(t.toUpperCase)
          val destCount =
            if (!skippedExisting) 0L
            else {
              val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $t")
              rs.next(); rs.getLong(1)
            }
          if (mode == ConvertMode.SkipAll ||
              (mode == ConvertMode.SkipExisting && destCount > 0))
            Plan(spec, read, copyData = false, s"mode=$mode, destRows=$destCount")
          else Plan(spec, read, copyData = true, "")
        }
      }

      // --- phase 2: table-level fan-out (X1) — `numberOfTableWorkers`
      // concurrent per-table Spark jobs on a FAIR scheduler, the Spark
      // shape of the reference's fixed table-worker pool
      // (DataCopier.java:167-190). Failures propagate (X6 fix).
      spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")
      val pool = Executors.newFixedThreadPool(cfg.numberOfTableWorkers)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val futures = plans.map { p =>
        if (!p.copyData) Future {
          println(s"[convert] ${p.spec.name}: data skipped (${p.reason})")
          (0L, 0L)
        } else Future {
          val rpc = CopyPlanner.rowsPerCommit(p.spec, cfg)
          val df = p.read()
          val report = DataCopier.writeJdbc(df, url, p.spec.name, cfg, rpc)
          println(s"[convert] ${p.spec.name}: ${report.records} records, " +
            s"${report.bytes} bytes, rowsPerCommit=$rpc, ${report.elapsedMillis} ms")
          (report.records, report.bytes)
        }
      }
      val results = Await.result(Future.sequence(futures),
        cfg.tableWorkerMaxWaitMinutes.minutes)
      pool.shutdown()
      println(s"[convert] TOTAL: ${results.map(_._1).sum} records, " +
        s"${results.map(_._2).sum} bytes, ${System.currentTimeMillis() - t0} ms")
    } finally {
      conn.close()
    }
    } finally {
      srcConn.foreach(c => try c.close() catch { case _: Exception => })
    }
  }
}
