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
  *  1. if `batchId` is in `<table>_ledger` the batch already committed
  *     fully — skip (restart replay);
  *  2. `DELETE FROM table WHERE batch_id = ?` — clears any partial write
  *     from a mid-batch crash, making the rewrite idempotent;
  *  3. distributed write via `DataCopier.writeJdbc` with a `batch_id`
  *     column stamped on every row (the destination table carries it);
  *  4. record `batchId` in the ledger — the commit point.
  *
  * Scale posture: steps 1/2/4 are driver-side single-statement
  * transactions; step 3 is the partitioned executor write (per-task
  * connections, reference commit cadence). State is the ledger table —
  * one row per processed batch, nothing driver-resident. */
object StreamingJdbcSink {

  def ledgerTable(table: String): String = s"${table}_ledger"

  /** Create the ledger if missing (dialect-portable: try + tolerate
    * "already exists"). */
  def ensureLedger(url: String, table: String,
      connProps: Map[String, String] = Map.empty): Unit = {
    val conn = connect(url, connProps)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE ${ledgerTable(table)} (batch_id BIGINT NOT NULL PRIMARY KEY)")
      catch { case e: java.sql.SQLException if isAlreadyExists(e) => () }
      finally st.close()
    } finally conn.close()
  }

  /** Write one micro-batch idempotently. Returns false when the batch was
    * already committed (replay skip), true when it wrote. */
  def writeBatch(df: DataFrame, batchId: Long, url: String, table: String,
      cfg: ConverterConfig = ConverterConfig(),
      rowsPerCommit: Long = 10000L,
      connProps: Map[String, String] = Map.empty): Boolean = {
    val conn = connect(url, connProps)
    val alreadyDone =
      try {
        val ps = conn.prepareStatement(
          s"SELECT 1 FROM ${ledgerTable(table)} WHERE batch_id = ?")
        ps.setLong(1, batchId)
        val rs = ps.executeQuery()
        val done = rs.next()
        rs.close(); ps.close()
        if (!done) {
          // clear any partial write from a crashed attempt of this batch
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
          del.setLong(1, batchId)
          del.executeUpdate()
          del.close()
          if (!conn.getAutoCommit) conn.commit()
        }
        done
      } finally conn.close()
    if (alreadyDone) return false

    DataCopier.writeJdbc(df.withColumn("batch_id", lit(batchId)),
      url, table, cfg, rowsPerCommit, connProps)

    val conn2 = connect(url, connProps)
    try {
      val ins = conn2.prepareStatement(
        s"INSERT INTO ${ledgerTable(table)} (batch_id) VALUES (?)")
      ins.setLong(1, batchId)
      ins.executeUpdate()
      ins.close()
      if (!conn2.getAutoCommit) conn2.commit()
    } finally conn2.close()
    true
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
