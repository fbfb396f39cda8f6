package graft.sources

import java.sql.{DriverManager, ResultSet}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, NullOrdering, SortDirection, SortOrder => V2SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, AggregateFunc, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.delete.DeletePlanner
import graft.types.TypeMapper

/** DataSource V2 batch read with PK-range partition planning — the
  * reference's partitioned-scan core (`SRC/data/GenericJdbcTableWorker
  * .java:42-58`, one ordered slice per worker) re-expressed in Spark's
  * modern source API instead of worker threads:
  *
  *   spark.read.format("graft-jdbc")
  *     .option("url", jdbcUrl).option("dbtable", "T")
  *     .option("pk", "a,b").option("partitions", "8").load()
  *
  *  - `planInputPartitions` probes O(partitions) boundary tuples on the
  *    source (index-served OFFSET/FETCH — no table scan) and emits one
  *    lexicographic PK-range predicate per partition, so every executor
  *    opens its own connection and reads a disjoint slice; composite
  *    PKs partition exactly like single-column ones.
  *  - `SupportsPushDownRequiredColumns`: the SELECT list is pruned to
  *    the columns Spark actually needs.
  *  - `SupportsPushDownFilters`: comparison/null filters compile into
  *    each partition's WHERE clause; unsupported ones stay in Spark.
  *
  * The schema is inferred from a zero-row probe via the shared
  * [[TypeMapper.sparkType]] JDBC mapping. */
class GraftJdbcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftJdbcSource.probeSchema(GraftJdbcOptions(options.asScala.toMap))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    GraftJdbcTable(schema, GraftJdbcOptions(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] object GraftJdbcSource {
  def probeSchema(opts: GraftJdbcOptions): StructType = {
    val conn = opts.connect()
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT * FROM ${opts.table} WHERE 1=0")
        val md = rs.getMetaData
        StructType((1 to md.getColumnCount).map { i =>
          StructField(md.getColumnName(i),
            TypeMapper.sparkType(md.getColumnType(i), md.getPrecision(i),
              md.getScale(i)),
            md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
        })
      } finally st.close()
    } finally conn.close()
  }

  /** SQL literal rendering for pushed filter values (JDBC escapes for
    * temporals, doubled quotes for strings). */
  def lit(v: Any): Option[String] = v match {
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case t: java.sql.Timestamp => Some(s"{ts '${t.toString}'}")
    case d: java.sql.Date => Some(s"{d '${d.toString}'}")
    case t: java.time.LocalDateTime =>
      Some(s"{ts '${java.sql.Timestamp.valueOf(t).toString}'}")
    case d: java.time.LocalDate => Some(s"{d '${d.toString}'}")
    case n: java.lang.Number => Some(n.toString)
    case b: java.lang.Boolean => Some(b.toString)
    case _ => None
  }

  /** Compile a Spark source filter to a WHERE fragment; None = keep it
    * in Spark. Only plain column references are compiled (no nested). */
  def compileFilter(f: Filter): Option[String] = {
    def col(name: String): Option[String] =
      if (name.contains(".")) None else Some(name)
    f match {
      case EqualTo(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c = $l"
      case GreaterThan(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c > $l"
      case GreaterThanOrEqual(a, v) =>
        for (c <- col(a); l <- lit(v)) yield s"$c >= $l"
      case LessThan(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c < $l"
      case LessThanOrEqual(a, v) =>
        for (c <- col(a); l <- lit(v)) yield s"$c <= $l"
      case IsNull(a) => col(a).map(c => s"$c IS NULL")
      case IsNotNull(a) => col(a).map(c => s"$c IS NOT NULL")
      case In(a, vs) if vs.nonEmpty =>
        val lits = vs.toSeq.map(lit)
        if (lits.exists(_.isEmpty)) None
        else col(a).map(c => s"$c IN (${lits.flatten.mkString(", ")})")
      case And(l, r) =>
        for (a <- compileFilter(l); b <- compileFilter(r)) yield s"($a AND $b)"
      case _ => None
    }
  }
}

private[sources] case class GraftJdbcOptions(raw: Map[String, String]) {
  private val m = raw.map { case (k, v) => k.toLowerCase -> v }
  val url: String = m.getOrElse("url",
    throw new IllegalArgumentException("graft-jdbc requires option 'url'"))
  val table: String = m.getOrElse("dbtable",
    throw new IllegalArgumentException("graft-jdbc requires option 'dbtable'"))
  val pk: Seq[String] = m.get("pk").toSeq
    .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
  val partitions: Int = m.get("partitions").map(_.toInt).getOrElse(1)
  val connProps: Map[String, String] =
    m.view.filterKeys(Set("user", "password")).toMap
  def connect(): java.sql.Connection = {
    val p = new Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }
}

private[sources] case class GraftJdbcTable(tableSchema: StructType,
    opts: GraftJdbcOptions) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = opts.table
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftJdbcScanBuilder(tableSchema, opts)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = GraftJdbcWrite(info.schema(), opts)
    }
}

/** Batched-INSERT sink (S7) as a V2 BatchWrite: each task opens its own
  * connection with autocommit off, batches `maxStatementsInOneJdbcBatch`
  * INSERTs (10k — the reference's batch cadence), and commits ONCE at
  * task end so a retried task rolls back cleanly via `abort()` instead
  * of leaving a half-written slice. */
private[sources] case class GraftJdbcWrite(writeSchema: StructType,
    opts: GraftJdbcOptions) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftJdbcWriterFactory(writeSchema, opts)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class GraftJdbcWriterFactory(writeSchema: StructType,
    opts: GraftJdbcOptions) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftJdbcDataWriter(writeSchema, opts)
}

private[sources] case class GraftJdbcCommitMessage(rows: Long)
  extends WriterCommitMessage

private[sources] class GraftJdbcDataWriter(writeSchema: StructType,
    opts: GraftJdbcOptions) extends DataWriter[InternalRow] {
  private val conn = opts.connect()
  conn.setAutoCommit(false)
  private val ps = {
    val cols = writeSchema.fieldNames.mkString(", ")
    val qs = writeSchema.fieldNames.map(_ => "?").mkString(", ")
    conn.prepareStatement(s"INSERT INTO ${opts.table} ($cols) VALUES ($qs)")
  }
  private val maxBatch = 10000
  private var inBatch = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < writeSchema.length) {
      val f = writeSchema.fields(i)
      if (row.isNullAt(i)) {
        ps.setNull(i + 1, java.sql.Types.NULL)
      } else f.dataType match {
        case LongType => ps.setLong(i + 1, row.getLong(i))
        case IntegerType => ps.setInt(i + 1, row.getInt(i))
        case ShortType => ps.setShort(i + 1, row.getShort(i))
        case DoubleType => ps.setDouble(i + 1, row.getDouble(i))
        case FloatType => ps.setFloat(i + 1, row.getFloat(i))
        case BooleanType => ps.setBoolean(i + 1, row.getBoolean(i))
        case StringType => ps.setString(i + 1, row.getUTF8String(i).toString)
        case d: DecimalType =>
          ps.setBigDecimal(i + 1,
            row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal)
        case TimestampType | TimestampNTZType =>
          ps.setTimestamp(i + 1, DateTimeUtils.toJavaTimestamp(row.getLong(i)))
        case DateType =>
          ps.setDate(i + 1, DateTimeUtils.toJavaDate(row.getInt(i)))
        case BinaryType => ps.setBytes(i + 1, row.getBinary(i))
        case other => throw new IllegalArgumentException(
          s"graft-jdbc cannot write column type $other")
      }
      i += 1
    }
    ps.addBatch()
    inBatch += 1; total += 1
    if (inBatch >= maxBatch) { ps.executeBatch(); inBatch = 0 }
  }

  override def commit(): WriterCommitMessage = {
    if (inBatch > 0) ps.executeBatch()
    conn.commit()
    GraftJdbcCommitMessage(total)
  }

  override def abort(): Unit =
    try conn.rollback() catch { case _: Exception => }

  override def close(): Unit = {
    try ps.close() catch { case _: Exception => }
    conn.close()
  }
}

private[sources] class GraftJdbcScanBuilder(fullSchema: StructType,
    opts: GraftJdbcOptions) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggSql: Option[(Seq[String], Seq[String], StructType)] = None
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var orderBySql: Seq[String] = Nil

  /** LIMIT n executes on the database (`FETCH FIRST n ROWS ONLY` per
    * partition query — each of the k partitions returns at most n rows
    * instead of its whole PK slice). Partial when partitioned: Spark
    * still applies the global limit over the ≤ k·n returned rows. */
  override def pushLimit(l: Int): Boolean = {
    if (aggSql.isDefined) return false // LIMIT over partial aggs is wrong
    limit = Some(l)
    true
  }
  override def isPartiallyPushed(): Boolean = opts.partitions > 1

  /** ORDER BY cols LIMIT n (top-n — the reference's keyset-pagination
    * probe shape, O1/O3) executes on the database when every sort key
    * is a plain source column of an order-unambiguous type: each
    * partition returns its own ordered top-n and Spark merges — partial,
    * same contract as pushLimit. String/binary keys are NOT pushed —
    * when fully pushed (one partition) Spark drops its own Sort and
    * trusts the database ordering, and a collation-configured database
    * can order text differently from Spark's binary UTF-8 compare,
    * silently changing which rows the top-n keeps. Identifiers are
    * quoted through the URL's JdbcDialect. */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean = {
    if (aggSql.isDefined) return false
    def orderUnambiguous(dt: DataType): Boolean = dt match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType |
           BooleanType => true
      case _ => false
    }
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(opts.url)
    val compiled = orders.toSeq.map { so =>
      (fieldOf(so.expression()), so.direction, so.nullOrdering) match {
        case (Some(f), dir, nulls) if orderUnambiguous(f.dataType) =>
          val d = if (dir == SortDirection.ASCENDING) "ASC" else "DESC"
          val n = if (nulls == NullOrdering.NULLS_FIRST) "NULLS FIRST"
                  else "NULLS LAST"
          Some(s"${dialect.quoteIdentifier(f.name)} $d $n")
        case _ => None
      }
    }
    if (compiled.exists(_.isEmpty)) return false
    orderBySql = compiled.flatten
    limit = Some(l)
    true
  }

  /** OFFSET is only correct on the database when there is a single
    * partition (a per-partition offset would drop rows per slice).
    * With a limit already pushed (`df.limit(m).offset(n)` — "first m
    * rows, then skip n"), n >= m means an empty result; the combined
    * fetch clause would be a malformed `FETCH NEXT ${m - n}`, so the
    * offset stays in Spark (which applies it over the m limited rows). */
  override def pushOffset(o: Int): Boolean = {
    if (aggSql.isDefined || opts.partitions > 1) return false
    if (limit.exists(_ <= o)) return false
    offset = Some(o)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (aggSql.isDefined) return // agg pushdown already fixed the schema
    // preserve source column order; an empty projection (count(*)) still
    // needs one column to SELECT
    val names = requiredSchema.fieldNames.toSet
    val kept = StructType(fullSchema.fields.filter(f => names.contains(f.name)))
    required = if (kept.isEmpty) StructType(fullSchema.fields.take(1)) else kept
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(f => GraftJdbcSource.compileFilter(f).isDefined)
    pushed = ok
    residual // Spark evaluates what the source can't
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def fieldOf(e: V2Expression): Option[StructField] = e match {
    case fr: NamedReference if fr.fieldNames().length == 1 =>
      fullSchema.fields.find(_.name.equalsIgnoreCase(fr.fieldNames()(0)))
    case _ => None
  }

  /** MIN/MAX/COUNT/SUM (+GROUP BY plain columns) execute on the
    * database; results come back as PARTIAL aggregates (one row per
    * group per PK-range partition) that Spark merges — so pushdown
    * composes with partition planning. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groups = agg.groupByExpressions.toSeq.map(fieldOf)
    if (groups.exists(_.isEmpty)) return false
    val aggs: Seq[Option[(String, StructField)]] =
      agg.aggregateExpressions.toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          Some(("COUNT(*)", StructField(s"agg$i", LongType)))
        case (c: Count, i) if !c.isDistinct =>
          fieldOf(c.column).map(f =>
            (s"COUNT(${f.name})", StructField(s"agg$i", LongType)))
        case (m: Min, i) =>
          fieldOf(m.column).map(f => (s"MIN(${f.name})", f.copy(name = s"agg$i")))
        case (m: Max, i) =>
          fieldOf(m.column).map(f => (s"MAX(${f.name})", f.copy(name = s"agg$i")))
        case (s: Sum, i) if !s.isDistinct =>
          fieldOf(s.column).collect {
            // widen integral sums on the DB side (Derby SUM(INT) is INT)
            case f if f.dataType == LongType || f.dataType == IntegerType =>
              (s"SUM(CAST(${f.name} AS BIGINT))", StructField(s"agg$i", LongType))
            case f if f.dataType == DoubleType =>
              (s"SUM(${f.name})", StructField(s"agg$i", DoubleType))
          }
        case _ => None
      }
    if (aggs.exists(_.isEmpty)) return false
    val gNames = groups.flatten.map(_.name)
    val gFields = groups.flatten
    aggSql = Some((gNames, aggs.flatten.map(_._1),
      StructType(gFields ++ aggs.flatten.map(_._2))))
    required = aggSql.get._3
    true
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  override def build(): Scan = GraftJdbcScan(required, pushed, opts,
    aggSql.map(a => (a._1, a._2)), limit, offset, orderBySql)
}

private[sources] case class GraftJdbcScan(required: StructType,
    pushed: Array[Filter], opts: GraftJdbcOptions,
    agg: Option[(Seq[String], Seq[String])] = None,
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    orderBy: Seq[String] = Nil) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jdbc ${opts.table} PushedFilters: [${pushed.mkString(", ")}]" +
      agg.map(a => s" PushedAggregates: [${a._2.mkString(", ")}]" +
        (if (a._1.nonEmpty) s" GroupBy: [${a._1.mkString(", ")}]" else ""))
        .getOrElse("") +
      (if (orderBy.nonEmpty) s" PushedTopN: [${orderBy.mkString(", ")}]" else "") +
      limit.map(l => s" PushedLimit: $l").getOrElse("") +
      offset.map(o => s" PushedOffset: $o").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val parts: Seq[String] =
      if (opts.pk.isEmpty || opts.partitions <= 1) Seq("1=1")
      else {
        val splits = DeletePlanner.splitPointsOffset(
          opts.url, opts.table, opts.pk, opts.partitions, opts.connProps,
          hookProps = Some(opts.raw))
        DeletePlanner.rangePredicates(opts.pk, splits)
      }
    parts.map(p => GraftJdbcInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftJdbcReaderFactory(required,
      pushed.flatMap(GraftJdbcSource.compileFilter), opts, agg, limit,
      offset, orderBy)
}

private[sources] case class GraftJdbcInputPartition(predicate: String)
  extends InputPartition

private[sources] case class GraftJdbcReaderFactory(required: StructType,
    filterSql: Array[String], opts: GraftJdbcOptions,
    agg: Option[(Seq[String], Seq[String])],
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    orderBy: Seq[String] = Nil)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftJdbcPartitionReader(required, filterSql,
      p.asInstanceOf[GraftJdbcInputPartition].predicate, opts, agg, limit,
      offset, orderBy)
}

/** Executor-side reader: one connection per partition, streaming the
  * partition's disjoint PK slice (plus pushed filters) as InternalRows.
  * Before the partition query runs, the URL's JdbcDialect `beforeFetch`
  * hook executes on THIS connection with the source options — the same
  * per-partition contract the stock JDBC source honors, so
  * `graft.readTimestamp` / `graft.maxStalenessSeconds` pin every
  * parallel slice of one table to one snapshot (SpannerDialect.
  * beforeFetch; reference pins every partitioned read —
  * SRC/data/DataCopier.java:87-106). Without it, N tasks under
  * concurrent writes can observe N different database states. */
private[sources] class GraftJdbcPartitionReader(required: StructType,
    filterSql: Array[String], predicate: String, opts: GraftJdbcOptions,
    agg: Option[(Seq[String], Seq[String])],
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    orderBy: Seq[String] = Nil)
  extends PartitionReader[InternalRow] {

  SpannerDialect.register() // idempotent; executors resolve the URL fresh
  private val conn = opts.connect()
  JdbcHooks.beforeFetchAll(opts.url, conn, opts.raw)
  private val stmt = conn.createStatement()
  private val rs: ResultSet = {
    val where = (predicate +: filterSql.toSeq).mkString("(", ") AND (", ")")
    val oby = if (orderBy.nonEmpty) s" ORDER BY ${orderBy.mkString(", ")}" else ""
    val off = offset.map(o => s" OFFSET $o ROWS").getOrElse("")
    // standard SQL:2008 fetch clause. When Spark pushes BOTH, the pushed
    // limit already includes the offset (it pushed top-(l+o) first), and
    // the contract is "first limit rows, then skip offset" — in one SQL
    // query that is OFFSET o FETCH NEXT (limit - o).
    val fetch = limit.map(l =>
      offset.fold(s" FETCH FIRST $l ROWS ONLY")(o =>
        s" FETCH NEXT ${l - o} ROWS ONLY")).getOrElse("")
    val sql = agg match {
      case Some((groups, aggExprs)) =>
        val sel = (groups ++ aggExprs).mkString(", ")
        val gby = if (groups.nonEmpty) s" GROUP BY ${groups.mkString(", ")}" else ""
        s"SELECT $sel FROM ${opts.table} WHERE $where$gby"
      case None =>
        s"SELECT ${required.fieldNames.mkString(", ")} FROM ${opts.table}" +
          s" WHERE $where$oby$off$fetch"
    }
    stmt.executeQuery(sql)
  }

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val v: Any = required.fields(i).dataType match {
        case LongType => rs.getLong(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case ShortType => rs.getShort(i + 1)
        case DoubleType => rs.getDouble(i + 1)
        case FloatType => rs.getFloat(i + 1)
        case BooleanType => rs.getBoolean(i + 1)
        case StringType => UTF8String.fromString(rs.getString(i + 1))
        case d: DecimalType =>
          val bd = rs.getBigDecimal(i + 1)
          if (bd == null) null
          else org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
        case TimestampType | TimestampNTZType =>
          val ts = rs.getTimestamp(i + 1)
          if (ts == null) null else DateTimeUtils.fromJavaTimestamp(ts)
        case DateType =>
          val dt = rs.getDate(i + 1)
          if (dt == null) null else DateTimeUtils.fromJavaDate(dt)
        case BinaryType => rs.getBytes(i + 1)
        case other => throw new IllegalArgumentException(
          s"graft-jdbc cannot read column type $other")
      }
      vals(i) = if (rs.wasNull()) null else v
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = {
    rs.close(); stmt.close(); conn.close()
  }
}
