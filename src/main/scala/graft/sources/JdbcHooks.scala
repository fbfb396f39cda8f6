package graft.sources

import java.sql.Connection

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Per-connection dialect hooks shared by every JDBC-opening path
  * (the V2 partition reader, the delete/copy split-point probes). */
object JdbcHooks {

  /** Run every matching dialect's `beforeFetch` hook (the snapshot-pin
    * contract — [[SpannerDialect.beforeFetch]] pins
    * `READ_ONLY_STALENESS`) on a freshly opened connection.
    * `JdbcDialects.get` wraps multiple matches in an
    * `AggregatedDialect` that does NOT delegate `beforeFetch` — a
    * session hook would silently vanish the moment a second dialect
    * matches the URL; unwrap it (the member list is a private field,
    * hence the narrow reflective read) and invoke each member's hook.
    * Falls back to the resolved dialect's own hook if the internals
    * ever change shape. */
  def beforeFetchAll(url: String, conn: Connection,
      props: Map[String, String]): Unit = {
    val d = JdbcDialects.get(url)
    val members =
      if (d.getClass.getName == "org.apache.spark.sql.jdbc.AggregatedDialect")
        try {
          val f = d.getClass.getDeclaredField("dialects")
          f.setAccessible(true)
          f.get(d).asInstanceOf[Seq[JdbcDialect]]
        } catch { case _: Exception => Seq(d) }
      else Seq(d)
    members.foreach(_.beforeFetch(conn, props))
  }
}
