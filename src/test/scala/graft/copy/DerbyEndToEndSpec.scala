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

  test("composite-PK table gets a partitioned JDBC read (S2 scale path)") {
    val c = conn()
    val st = c.createStatement()
    st.executeUpdate(
      """CREATE TABLE cust_seg (
        | seg VARCHAR(16) NOT NULL, id BIGINT NOT NULL, bal DOUBLE,
        | PRIMARY KEY (seg, id))""".stripMargin)
    val src = Tables(spark, sfDir, "customer").select(
      col("c_mktsegment").as("seg"), col("c_custkey").as("id"),
      col("c_acctbal").as("bal"))
    val spec = Catalog.introspectTable(c, Some("APP"), "CUST_SEG")
    assert(spec.primaryKey.map(_.toUpperCase) == Seq("SEG", "ID"))
    DataCopier.copyTable(src, spec.copy(schema = None, name = "cust_seg"), url)

    // the read back through readJdbc must carry >1 input partition even
    // though the PK is composite — each partition is one pushed
    // lexicographic range predicate (reference gives every table
    // intra-table parallelism regardless of PK shape).
    val back = DataCopier.readJdbc(spark, url,
      spec.copy(schema = None, name = "cust_seg"),
      new java.util.Properties(), numPartitions = 4, pkBounds = None)
    assert(back.rdd.getNumPartitions == 4,
      s"expected 4 range partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() == 150)
    // fidelity: ranges must be a disjoint exact cover (no dup/lost rows)
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum(col("id")).as("k"),
      sum(expr("crc32(seg)")).as("s"),
      sum(expr("cast(bal * 100 as bigint)")).as("b")).collect()(0)
    assert(sig(back) == sig(src))
    st.close(); c.close()
  }

  test("index DDL runs in the pipeline and feeds rows-per-commit (stage 2)") {
    import graft.catalog.IndexSpec
    import graft.copy.CopyPlanner
    val c = conn()
    val st = c.createStatement()
    val src = Tables(spark, sfDir, "supplier")
    val ix = IndexSpec("idx_sup_name", Seq(("s_name", true)), unique = true)
    val spec = graft.app.ConverterApp.specFromStruct(
      "sup_ix", src.schema, Seq("s_suppkey"), Seq(ix))
    // stage 1+2: table then index DDL from one script (Converter.java:69-83)
    val script = DdlGenerator.script(spec, Dialect.Derby,
      ConvertMode.SkipExisting, existsInDestination = false) match {
      case Right(s) => s
      case Left(e) => fail(e)
    }
    assert(script.size == 2 && script(1) ==
      "CREATE UNIQUE INDEX idx_sup_name ON sup_ix (s_name)")
    script.foreach(st.executeUpdate)
    // re-introspection sees the UNIQUE index back, and the PK-backing
    // index is still correctly skipped (J3)
    val seen = Catalog.introspectTable(c, Some("APP"), "SUP_IX")
    assert(seen.indexes.exists(i =>
      i.name.equalsIgnoreCase("idx_sup_name") && i.unique &&
        i.columns.map(_._1.toUpperCase) == Seq("S_NAME")))
    assert(!seen.indexes.exists(_.columns.map(_._1.toUpperCase) == Seq("S_SUPPKEY")))
    // the carried index raises mutations-per-row: fewer rows per commit
    val without = CopyPlanner.rowsPerCommit(spec.copy(indexes = Nil),
      graft.config.ConverterConfig(batchSizeBytes = 100000000L))
    val withIx = CopyPlanner.rowsPerCommit(spec,
      graft.config.ConverterConfig(batchSizeBytes = 100000000L))
    assert(withIx < without,
      s"index must lower rowsPerCommit (with=$withIx, without=$without)")
    st.close(); c.close()
  }

  test("ConverterApp JDBC→JDBC: introspect a live Derby source, DDL + " +
      "partitioned copy to a Derby destination — zero parquet") {
    val srcUrl = "jdbc:derby:memory:graftJ2Jsrc"
    val dstUrl = "jdbc:derby:memory:graftJ2Jdst"
    // --- seed the SOURCE database: 2 PK tables (one with a secondary
    // index, one composite-PK) + 1 PK-less table the app must skip
    val sc = DriverManager.getConnection(srcUrl + ";create=true")
    try {
      val st = sc.createStatement()
      for (t <- Seq("ACCOUNTS", "LEDGER", "NOTES"))
        try st.executeUpdate(s"DROP TABLE $t") catch { case _: Exception => }
      st.executeUpdate(
        """CREATE TABLE accounts (
          | acct_id BIGINT NOT NULL, owner VARCHAR(40), balance DOUBLE,
          | PRIMARY KEY (acct_id))""".stripMargin)
      st.executeUpdate("CREATE INDEX idx_accounts_owner ON accounts (owner)")
      st.executeUpdate(
        """CREATE TABLE ledger (
          | acct_id BIGINT NOT NULL, seq INTEGER NOT NULL, amount DOUBLE,
          | PRIMARY KEY (acct_id, seq))""".stripMargin)
      st.executeUpdate("CREATE TABLE notes (txt VARCHAR(40))") // no PK
      val pa = sc.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
      for (i <- 0 until 500) {
        pa.setLong(1, i); pa.setString(2, s"owner$i"); pa.setDouble(3, i * 1.25)
        pa.addBatch()
      }
      pa.executeBatch()
      val pl = sc.prepareStatement("INSERT INTO ledger VALUES (?, ?, ?)")
      for (i <- 0 until 1200) {
        pl.setLong(1, i % 100); pl.setInt(2, i / 100); pl.setDouble(3, i * 0.5)
        pl.addBatch()
      }
      pl.executeBatch()
      st.executeUpdate("INSERT INTO notes VALUES ('skip me')")
      st.close()
    } finally sc.close()

    // --- the reference's real two-URL flow, end to end
    graft.app.ConverterApp.run(
      Array(srcUrl, dstUrl, "DropAndRecreate", "--yes"), spark)

    // --- verify the DESTINATION over JDBC only
    val dc = DriverManager.getConnection(dstUrl)
    try {
      def one(sql: String): (Long, Double) = {
        val rs = dc.createStatement().executeQuery(sql)
        rs.next(); val r = (rs.getLong(1), rs.getDouble(2)); rs.close(); r
      }
      val (na, sa) = one(
        "SELECT COUNT(*), SUM(balance) FROM accounts")
      assert(na == 500L && math.abs(sa - (0 until 500).map(_ * 1.25).sum) < 1e-6)
      val (ol, _) = one("SELECT COUNT(*), SUM(LENGTH(owner)) FROM accounts")
      assert(ol == 500L)
      val (nl, sl) = one("SELECT COUNT(*), SUM(amount) FROM ledger")
      assert(nl == 1200L && math.abs(sl - (0 until 1200).map(_ * 0.5).sum) < 1e-6)
      // the secondary index carried through stage-2 DDL
      val seen = Catalog.introspectTable(dc, Some("APP"), "ACCOUNTS")
      assert(seen.indexes.exists(i =>
        i.name.equalsIgnoreCase("idx_accounts_owner") &&
          i.columns.map(_._1.toUpperCase) == Seq("OWNER")))
      // composite PK survived
      assert(Catalog.introspectTable(dc, Some("APP"), "LEDGER")
        .primaryKey.map(_.toUpperCase) == Seq("ACCT_ID", "SEQ"))
      // the PK-less table was skipped, as the reference does
      assert(!Catalog.listTables(dc, Dialect.Derby)
        .map(_._2.toUpperCase).contains("NOTES"))
    } finally dc.close()
  }

  test("ConverterApp fails fast when two source schemas share a table name " +
      "(unqualified destination would collide)") {
    val srcUrl = "jdbc:derby:memory:graftColl;create=true"
    val sc = DriverManager.getConnection(srcUrl)
    try {
      val st = sc.createStatement()
      for (t <- Seq("S1.USERS", "S2.USERS"))
        try st.executeUpdate(s"DROP TABLE $t") catch { case _: Exception => }
      for (s <- Seq("S1", "S2")) {
        try st.executeUpdate(s"CREATE SCHEMA $s") catch { case _: Exception => }
        st.executeUpdate(
          s"CREATE TABLE $s.users (id BIGINT NOT NULL, PRIMARY KEY (id))")
        st.executeUpdate(s"INSERT INTO $s.users VALUES (1)")
      }
      st.close()
    } finally sc.close()
    val e = intercept[IllegalArgumentException] {
      graft.app.ConverterApp.run(
        Array(srcUrl, "jdbc:derby:memory:graftCollDst;create=true",
          "DropAndRecreate", "--yes"), spark)
    }
    assert(e.getMessage.contains("USERS"), e.getMessage)
  }

  test("DropAndRecreate without an explicit ack aborts before any DDL") {
    import graft.app.ConverterApp
    assert(ConverterApp.requireDestructiveAck(
      ConvertMode.DropAndRecreate, acked = false).isLeft)
    assert(ConverterApp.requireDestructiveAck(
      ConvertMode.DropAndRecreate, acked = true).isRight)
    assert(ConverterApp.requireDestructiveAck(
      ConvertMode.SkipExisting, acked = false).isRight)
  }

  test("upload worker deadline fails the copy instead of hanging (X6)") {
    val c = conn()
    c.createStatement().executeUpdate(
      "CREATE TABLE tiny_t (k BIGINT NOT NULL, PRIMARY KEY (k))")
    c.close()
    val src = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"))
    val cfg = ConverterConfig(uploadWorkerMaxWaitMinutes = 0,
      maxStatementsInOneJdbcBatch = 10)
    val ex = intercept[Throwable] {
      DataCopier.writeJdbc(src, url, "tiny_t", cfg, rowsPerCommit = 10L)
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("upload worker exceeded")),
      s"no deadline failure in: $messages")
  }

  test("catalog set-algebra (J1/J2) with case-insensitive names") {
    val src = Seq((Option("APP"), "Customer"), (Option("APP"), "ORDERS"),
      (Option("APP"), "newtab"))
    val dst = Seq((Option("APP"), "CUSTOMER"), (Option("APP"), "orders"))
    assert(Catalog.tablesInBoth(src, dst).toSet == Set("Customer", "ORDERS"))
    assert(Catalog.tablesMissing(src, dst) == Seq("newtab"))
  }
}
