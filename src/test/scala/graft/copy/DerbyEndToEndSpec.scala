package graft.copy

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.catalog.Catalog
import graft.config.{ConvertMode, ConverterConfig, Dialect}
import graft.ddl.DdlGenerator
import graft.delete.{DeletePlanner, DeleteStrategy}

/** t1-style end-to-end smoke of the reference's whole 3-stage pipeline
  * (SURVEY §3.1/§7.2) against a real JDBC destination: embedded Derby
  * (in /opt/spark/jars) stands in for the destination database.
  *
  * customer (sf0.001 parquet) → introspect/DDL → commit-aware partitioned
  * copy → partitioned JDBC read-back → count + per-column checksum
  * fidelity → delete strategies.
  */
class DerbyEndToEndSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftE2E;create=true"
  private def conn() = DriverManager.getConnection(url)

  test("end-to-end: DDL → copy → read back → verify → delete") {
    val src = Tables(spark, sfDir, "customer")
    val n = src.count()
    assert(n == 150)

    // --- stage 1: DDL (driver-side, dialect-mapped) ------------------
    val c = conn()
    val st = c.createStatement()
    st.executeUpdate(
      """CREATE TABLE customer (
        | c_custkey BIGINT NOT NULL, c_name VARCHAR(64),
        | c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR(16),
        | PRIMARY KEY (c_custkey))""".stripMargin)

    // catalog introspection sees it back (S3–S5)
    val tables = Catalog.listTables(c, Dialect.Derby)
    assert(tables.map(_._2.toUpperCase).contains("CUSTOMER"))
    val spec = Catalog.introspectTable(c, Some("APP"), "CUSTOMER")
    assert(spec.primaryKey.map(_.toUpperCase) == Seq("C_CUSTKEY"))
    assert(spec.columns.size == 5)
    assert(spec.hasPrimaryKey)

    // DDL round-trip: generated DDL for the introspected spec parses
    val regen = DdlGenerator.createTable(spec, Dialect.Derby).get
    assert(regen.toUpperCase.contains("PRIMARY KEY (C_CUSTKEY)"))

    // mode gate: table exists → SkipExisting skips, Throw fails (J2)
    assert(DdlGenerator.script(spec, Dialect.Derby, ConvertMode.SkipExisting,
      existsInDestination = true) == Right(Seq.empty))
    assert(DdlGenerator.script(spec, Dialect.Derby, ConvertMode.ThrowExceptionIfExists,
      existsInDestination = true).isLeft)

    // --- stage 2: commit-aware partitioned copy (S7/X3) --------------
    val cfg = ConverterConfig(maxStatementsInOneJdbcBatch = 40)
    val report = DataCopier.copyTable(
      src.repartition(4), spec.copy(schema = None, name = "customer"), url, cfg)
    assert(report.records == n)
    assert(report.bytes > 0)

    // --- stage 3: partitioned JDBC read-back + fidelity (S1) ---------
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "1").option("upperBound", (n + 1).toString)
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == n)
    // per-column checksum fidelity (A2-style accounting, exact ints)
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum(col("c_custkey")).as("k"),
      sum(expr("crc32(c_name)")).as("nm"),
      sum(col("c_nationkey")).as("nk"),
      sum(expr("cast(c_acctbal * 100 as bigint)")).as("ab"),
      sum(expr("crc32(c_mktsegment)")).as("mk")).collect()(0)
    assert(sig(back) == sig(src))

    // JDBC source pushdown: a filter on the read-back frame must reach
    // the database as a pushed predicate, not a post-scan Spark filter
    // (at 100 TB the source prunes; Spark never sees filtered rows).
    val pushedPlan = back.filter(col("c_acctbal") > 1000.0)
      .queryExecution.executedPlan.toString
    assert(pushedPlan.contains("PushedFilters") &&
      pushedPlan.toUpperCase.contains("GREATERTHAN(C_ACCTBAL"),
      s"filter not pushed to JDBC source:\n$pushedPlan")

    // --- delete: strategy threshold + partitioned range delete (S9/X4)
    assert(DeletePlanner.decide(n, cfg) == DeleteStrategy.SingleStatement)
    assert(DeletePlanner.decide(20000, cfg).isInstanceOf[DeleteStrategy.Partitioned])

    val splits = DeletePlanner.splitPoints(src, Seq("c_custkey"), 4)
    assert(splits.size == 3)
    val ranges = DeletePlanner.rangePredicates(Seq("c_custkey"), splits)
    assert(ranges.size == 4)
    val deleted = DeletePlanner.execute(url, "customer",
      DeleteStrategy.Partitioned(ranges))
    assert(deleted == n) // ranges are a disjoint cover → every row deleted
    val left = st.executeQuery("SELECT COUNT(*) AS n FROM customer")
    left.next()
    assert(left.getInt(1) == 0)

    // single-statement path on a refilled small table
    DataCopier.copyTable(src.limit(10), spec.copy(schema = None, name = "customer"), url, cfg)
    assert(DeletePlanner.execute(url, "customer", DeleteStrategy.SingleStatement) == 10L)
    st.close(); c.close()
  }

  test("observed copy reports records and bytes without a second scan (A2)") {
    val src = graft.Tables(spark, sfDir, "customer")
    val (df, obs) = DataCopier.observed(src, "copy_metrics",
      Seq("c_name", "c_mktsegment"))
    df.write.format("noop").mode("overwrite").save()
    val row = obs.get
    assert(row("records") == 150L)
    val expectBytes = src.agg(
      sum(expr("octet_length(c_name) + octet_length(c_mktsegment)")))
      .collect()(0).getLong(0)
    assert(row("bytes") == expectBytes)
  }

  test("catalog set-algebra (J1/J2) with case-insensitive names") {
    val src = Seq((Option("APP"), "Customer"), (Option("APP"), "ORDERS"),
      (Option("APP"), "newtab"))
    val dst = Seq((Option("APP"), "CUSTOMER"), (Option("APP"), "orders"))
    assert(Catalog.tablesInBoth(src, dst).toSet == Set("Customer", "ORDERS"))
    assert(Catalog.tablesMissing(src, dst) == Seq("newtab"))
  }
}
