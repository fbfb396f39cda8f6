package graft.sources

import java.sql.Types
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SpannerDialectSpec extends AnyFunSuite {

  test("registers for cloudspanner URLs") {
    SpannerDialect.register()
    val d = JdbcDialects.get("jdbc:cloudspanner://localhost/projects/p/instances/i/databases/db")
    assert(d == SpannerDialect)
  }

  test("catalyst types from Spanner type names (read path)") {
    val md = new MetadataBuilder()
    assert(SpannerDialect.getCatalystType(Types.BIGINT, "INT64", 0, md).contains(LongType))
    assert(SpannerDialect.getCatalystType(Types.DOUBLE, "FLOAT64", 0, md).contains(DoubleType))
    assert(SpannerDialect.getCatalystType(Types.VARCHAR, "STRING(100)", 100, md).contains(StringType))
    assert(SpannerDialect.getCatalystType(Types.VARBINARY, "BYTES(MAX)", 0, md).contains(BinaryType))
    assert(SpannerDialect.getCatalystType(Types.NUMERIC, "NUMERIC", 38, md).contains(DecimalType(38, 9)))
  }

  test("JDBC DDL types from catalyst types (write path, reference map)") {
    assert(SpannerDialect.getJDBCType(LongType).get.databaseTypeDefinition == "INT64")
    assert(SpannerDialect.getJDBCType(IntegerType).get.databaseTypeDefinition == "INT64")
    assert(SpannerDialect.getJDBCType(DoubleType).get.databaseTypeDefinition == "FLOAT64")
    assert(SpannerDialect.getJDBCType(StringType).get.databaseTypeDefinition == "STRING(MAX)")
    assert(SpannerDialect.getJDBCType(BooleanType).get.databaseTypeDefinition == "BOOL")
    assert(SpannerDialect.getJDBCType(TimestampNTZType).get.databaseTypeDefinition == "TIMESTAMP")
  }

  test("identifier quoting and truncate semantics") {
    assert(SpannerDialect.quoteIdentifier("order") == "`order`")
    assert(SpannerDialect.getTruncateQuery("t") == "DELETE FROM t WHERE TRUE")
  }

  /** java.sql.Connection proxy recording every statement-executed SQL —
    * stands in for a partition task's connection. */
  private def recordingConnection(executed: scala.collection.mutable.Buffer[String]): java.sql.Connection = {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    lazy val stmt: java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
          case "execute" => executed += a(0).asInstanceOf[String]; java.lang.Boolean.FALSE
          case "close" => null
          case _ => null
        }
      }).asInstanceOf[java.sql.Statement]
    Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
          case "createStatement" => stmt
          case _ => null
        }
      }).asInstanceOf[java.sql.Connection]
  }

  test("beforeFetch pins a read timestamp on the partition connection (S2 snapshot)") {
    val executed = scala.collection.mutable.Buffer.empty[String]
    // Spark invokes beforeFetch once per partition task with the read
    // options — every partition's connection gets the same snapshot pin.
    SpannerDialect.beforeFetch(recordingConnection(executed),
      Map(SpannerDialect.ReadTimestampProperty -> "2026-01-01T00:00:00Z"))
    assert(executed == Seq(
      "SET READONLY = TRUE",
      "SET READ_ONLY_STALENESS = 'READ_TIMESTAMP 2026-01-01T00:00:00Z'"))
  }

  test("beforeFetch: bounded staleness variant, and no-op without the options") {
    val executed = scala.collection.mutable.Buffer.empty[String]
    SpannerDialect.beforeFetch(recordingConnection(executed),
      Map(SpannerDialect.MaxStalenessProperty -> "10"))
    assert(executed == Seq(
      "SET READONLY = TRUE",
      "SET READ_ONLY_STALENESS = 'MAX_STALENESS 10s'"))
    val none = scala.collection.mutable.Buffer.empty[String]
    SpannerDialect.beforeFetch(recordingConnection(none), Map("user" -> "x"))
    assert(none.isEmpty)
  }
}
