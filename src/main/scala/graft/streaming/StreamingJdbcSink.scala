package graft.streaming

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import graft.config.ConverterConfig
import graft.copy.DataCopier

/** Streaming half of the JDBC sink: `writeStream.foreachBatch` over the
  * same commit-aware batched INSERT path the batch copier uses
  * (`DataCopier.writeJdbc`), made idempotent per micro-batch so a
  * restarted query that replays a batch cannot duplicate rows.
  *
  * Protocol per micro-batch (the standard exactly-once-effective JDBC
  * pattern — Structured Streaming replays a failed batch with the same
  * `batchId` and deterministic contents):
  *
  *  1. acquire the batch mutex: an UNCOMMITTED `INSERT` into
  *     `<table>_mutex (batch_id PK)` on a dedicated connection — the row
  *     lock serializes concurrent attempts of the same batch (a second
  *     attempt blocks here until the first commits or dies, so its
  *     DELETE can never interleave with the first attempt's writes);
  *  2. if `batchId` is in `<table>_ledger` the batch already committed
  *     fully — release the mutex and skip (restart replay);
  *  3. `DELETE FROM table WHERE batch_id = ?` (own connection,
  *     committed) — clears any partial write from a crashed attempt;
  *  4. distributed write via `DataCopier.writeJdbc` with a `batch_id`
  *     column stamped on every row (the destination table carries it);
  *  5. in the mutex transaction: delete the mutex row, insert the
  *     ledger row, COMMIT — the atomic commit point; rollback on any
  *     failure leaves neither row (the mutex table is empty at rest).
  *
  * Scale posture: steps 1–3/5 are driver-side; step 4 is the
  * partitioned executor write (per-task connections, reference commit
  * cadence). State is the ledger table — one row per processed batch,
  * nothing driver-resident.
  *
  * Residual assumption: executor tasks of a DEAD driver must be fenced
  * by the cluster manager (standard Spark semantics) — a still-running
  * zombie task writes outside the mutex and plain JDBC INSERT cannot
  * fence it. Driver-level races (the realistic restart/failover case)
  * are fully serialized by the mutex. */
object StreamingJdbcSink {

  def ledgerTable(table: String): String = s"${table}_ledger"
  def mutexTable(table: String): String = s"${table}_mutex"

  /** Create the ledger + mutex tables if missing (dialect-portable:
    * try + tolerate "already exists"). */
  def ensureLedger(url: String, table: String,
      connProps: Map[String, String] = Map.empty): Unit = {
    val conn = connect(url, connProps)
    try {
      Seq(ledgerTable(table), mutexTable(table)).foreach { t =>
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $t (batch_id BIGINT NOT NULL PRIMARY KEY)")
        catch { case e: java.sql.SQLException if isAlreadyExists(e) => () }
        finally st.close()
      }
    } finally conn.close()
  }

  /** Write one micro-batch idempotently (see the protocol above).
    * Returns false when the batch was already committed (replay skip),
    * true when it wrote. */
  def writeBatch(df: DataFrame, batchId: Long, url: String, table: String,
      cfg: ConverterConfig = ConverterConfig(),
      rowsPerCommit: Long = 10000L,
      connProps: Map[String, String] = Map.empty): Boolean = {
    val mconn = connect(url, connProps)
    try {
      mconn.setAutoCommit(false)
      // 1. mutex: uncommitted PK insert = exclusive per-batch lock; a
      // concurrent attempt of the same batchId blocks on this row until
      // we commit (then finds the ledger entry) or die (then proceeds).
      val mins = mconn.prepareStatement(
        s"INSERT INTO ${mutexTable(table)} (batch_id) VALUES (?)")
      mins.setLong(1, batchId)
      mins.executeUpdate(); mins.close()
      // 2. replay check, under the lock
      val chk = mconn.prepareStatement(
        s"SELECT 1 FROM ${ledgerTable(table)} WHERE batch_id = ?")
      chk.setLong(1, batchId)
      val rs = chk.executeQuery()
      val alreadyDone = rs.next()
      rs.close(); chk.close()
      if (alreadyDone) { mconn.rollback(); return false }
      // 3. clear any partial write from a crashed attempt — separate
      // committed connection (the executors' inserts in step 4 must see
      // a clean table); safe because the mutex serializes attempts.
      val dconn = connect(url, connProps)
      try {
        val del = dconn.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
        del.setLong(1, batchId)
        del.executeUpdate(); del.close()
        if (!dconn.getAutoCommit) dconn.commit()
      } finally dconn.close()
      // 4. distributed executor write
      DataCopier.writeJdbc(df.withColumn("batch_id", lit(batchId)),
        url, table, cfg, rowsPerCommit, connProps)
      // 5. atomic commit point: mutex row out, ledger row in, one COMMIT
      val mdel = mconn.prepareStatement(
        s"DELETE FROM ${mutexTable(table)} WHERE batch_id = ?")
      mdel.setLong(1, batchId)
      mdel.executeUpdate(); mdel.close()
      val lins = mconn.prepareStatement(
        s"INSERT INTO ${ledgerTable(table)} (batch_id) VALUES (?)")
      lins.setLong(1, batchId)
      lins.executeUpdate(); lins.close()
      mconn.commit()
      true
    } catch {
      case t: Throwable =>
        try mconn.rollback() catch { case _: Throwable => () }
        throw t
    } finally mconn.close()
  }

  /** CDC upsert micro-batch: key-based MERGE as distributed keyed
    * DELETE + batched INSERT, under the same mutex/ledger protocol as
    * [[writeBatch]]. The batch must hold ONE row per key (compact a
    * changelog first, e.g. the `etl_merge_latest` struct-max shape);
    * rows replace the destination rows with matching keys, other rows
    * are untouched. Idempotent per key even mid-crash: a replayed batch
    * re-deletes and re-inserts the same deterministic rows. The DELETE
    * runs distributed — each partition of the batch's key set batches
    * `DELETE ... WHERE k1=? AND ...` on its own connection — so neither
    * keys nor rows ever collect to the driver. */
  def upsertBatch(df: DataFrame, batchId: Long, url: String, table: String,
      keyCols: Seq[String], cfg: ConverterConfig = ConverterConfig(),
      rowsPerCommit: Long = 10000L,
      connProps: Map[String, String] = Map.empty): Boolean = {
    require(keyCols.nonEmpty, "upsertBatch needs at least one key column")
    val mconn = connect(url, connProps)
    try {
      mconn.setAutoCommit(false)
      val mins = mconn.prepareStatement(
        s"INSERT INTO ${mutexTable(table)} (batch_id) VALUES (?)")
      mins.setLong(1, batchId)
      mins.executeUpdate(); mins.close()
      val chk = mconn.prepareStatement(
        s"SELECT 1 FROM ${ledgerTable(table)} WHERE batch_id = ?")
      chk.setLong(1, batchId)
      val rs = chk.executeQuery()
      val alreadyDone = rs.next()
      rs.close(); chk.close()
      if (alreadyDone) { mconn.rollback(); return false }
      // distributed keyed delete (replaces writeBatch's batch_id delete)
      val deleteSql = s"DELETE FROM $table WHERE " +
        keyCols.map(k => s"$k = ?").mkString(" AND ")
      val propsSeq = connProps.toSeq
      val maxBatch = cfg.maxStatementsInOneJdbcBatch
      df.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
        .distinct()
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          if (rows.hasNext) {
            val p = new java.util.Properties()
            propsSeq.foreach { case (k, v) => p.setProperty(k, v) }
            val c = DriverManager.getConnection(url, p)
            try {
              c.setAutoCommit(false)
              val ps = c.prepareStatement(deleteSql)
              var n = 0
              rows.foreach { r =>
                keyCols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
                ps.addBatch(); n += 1
                if (n % maxBatch == 0) ps.executeBatch()
              }
              ps.executeBatch(); ps.close(); c.commit()
            } finally c.close()
          }
        }
      DataCopier.writeJdbc(df.withColumn("batch_id", lit(batchId)),
        url, table, cfg, rowsPerCommit, connProps)
      val mdel = mconn.prepareStatement(
        s"DELETE FROM ${mutexTable(table)} WHERE batch_id = ?")
      mdel.setLong(1, batchId)
      mdel.executeUpdate(); mdel.close()
      val lins = mconn.prepareStatement(
        s"INSERT INTO ${ledgerTable(table)} (batch_id) VALUES (?)")
      lins.setLong(1, batchId)
      lins.executeUpdate(); lins.close()
      mconn.commit()
      true
    } catch {
      case t: Throwable =>
        try mconn.rollback() catch { case _: Throwable => () }
        throw t
    } finally mconn.close()
  }

  /** `foreachBatch` upsert form: latest-row-per-key streams MERGE into
    * the table. */
  def upsertSink(url: String, table: String, keyCols: Seq[String],
      cfg: ConverterConfig = ConverterConfig(),
      rowsPerCommit: Long = 10000L,
      connProps: Map[String, String] = Map.empty): (DataFrame, Long) => Unit = {
    ensureLedger(url, table, connProps)
    (df, batchId) =>
      { upsertBatch(df, batchId, url, table, keyCols, cfg, rowsPerCommit, connProps); () }
  }

  /** The `foreachBatch` function:
    * {{{
    * stream.writeStream.foreachBatch(StreamingJdbcSink.sink(url, "t")).start()
    * }}} */
  def sink(url: String, table: String,
      cfg: ConverterConfig = ConverterConfig(),
      rowsPerCommit: Long = 10000L,
      connProps: Map[String, String] = Map.empty): (DataFrame, Long) => Unit = {
    ensureLedger(url, table, connProps)
    (df, batchId) => { writeBatch(df, batchId, url, table, cfg, rowsPerCommit, connProps); () }
  }

  private def connect(url: String, connProps: Map[String, String]) = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  /** Derby X0Y32, PostgreSQL 42P07, generic SQLSTATE 42xxx "object exists". */
  private def isAlreadyExists(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).exists(s => s == "X0Y32" || s == "42P07") ||
      Option(e.getMessage).exists(_.toLowerCase.contains("already exists"))
}
