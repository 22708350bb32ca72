package graft.sink

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("jdbc-lww")` — the network warehouse sink
  * ([[Warehouse.appendJdbc]]'s semantics, reference
  * `consumer/consumer.py:22-44` inserting into ClickHouse) as a
  * first-class DSv2 BATCH write, symmetric with the bus connector:
  * the reference's two external hops (queue, warehouse) are both
  * reachable from the engine's own write surface.
  *
  * Delivery contract — AT-LEAST-ONCE inserts into an LWW-consumed
  * table, stated in the format name: each partition writes batched
  * prepared-statement inserts inside ITS OWN transaction and commits
  * at task-commit time, so a retried/speculative task attempt can
  * re-insert its partition (exactly-once would need XA/2PC across
  * partitions, which plain JDBC cannot give without an engine-side
  * transaction coordinator). That is exactly the reference's
  * warehouse contract: ClickHouse ReplacingMergeTree collapses
  * replays by (key, version) — the LWW algebra absorbs transport
  * duplicates, the q17/q66 discipline. Writes route through the same
  * binding logic as [[Warehouse.appendJdbc]] (scalar types + date/
  * timestamp/decimal; see q276 for the gated end-to-end semantics
  * over embedded Derby).
  *
  * Options: `url` (JDBC url, required), `dbtable` (target table,
  * required), `batchSize` (statement batch, default 500). Write-only:
  * reads belong to `spark.read.jdbc` (Spark's own JDBC source, with
  * pushdown) — a read through this provider fails loudly.
  */
final class JdbcLwwProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "jdbc-lww"
  // write-only: the schema comes from the query being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "jdbc-lww is a write-only sink; read JDBC tables with spark.read.jdbc")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JdbcLwwTable(schema, new CaseInsensitiveStringMap(properties))
}

final class JdbcLwwTable(schemaIn: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  private def required(k: String): String = {
    val v = options.get(k)
    require(v != null && v.nonEmpty, s"jdbc-lww: '$k' option is required")
    v
  }
  private val url = required("url")
  private val table = required("dbtable")
  private val batchSize =
    Option(options.get("batchSize")).map(_.toInt).getOrElse(500)
  require(batchSize > 0, s"jdbc-lww: batchSize must be positive, got $batchSize")

  override def name(): String = s"jdbc-lww:$table"
  override def schema(): StructType = schemaIn
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // fail at PLAN time on a column type the binder cannot map — a
    // task-time failure would burn a cluster stage first
    info.schema().fields.foreach(f => JdbcLww.requireMappable(f.dataType, f.name))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new JdbcLwwBatchWrite(url, table, batchSize, info.schema())
      }
    }
  }
}

final class JdbcLwwBatchWrite(url: String, table: String, batchSize: Int,
                              schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    JdbcLwwWriterFactory(url, table, batchSize, schema)
  // per-partition transactions commit at task-commit time (the
  // appendJdbc contract); there is nothing left for the driver to do
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class JdbcLwwWriterFactory(url: String, table: String,
                                      batchSize: Int, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JdbcLwwDataWriter(url, table, batchSize, schema)
}

/** Executor-side writer: one connection + one prepared statement per
  * partition, inserts batched every `batchSize` rows, the partition's
  * transaction committed in commit() and rolled back in abort() — a
  * failed task leaves NO partial partition behind.
  */
final class JdbcLwwDataWriter(url: String, table: String, batchSize: Int,
                              schema: StructType) extends DataWriter[InternalRow] {
  private lazy val conn = {
    val c = java.sql.DriverManager.getConnection(url)
    c.setAutoCommit(false)
    c
  }
  private lazy val stmt = conn.prepareStatement(
    s"INSERT INTO $table VALUES (" + schema.fields.map(_ => "?").mkString(", ") + ")")
  private var pending = 0
  private var opened = false

  override def write(row: InternalRow): Unit = {
    opened = true
    var i = 0
    while (i < schema.length) {
      JdbcLww.bind(stmt, i, schema.fields(i).dataType, row)
      i += 1
    }
    stmt.addBatch()
    pending += 1
    if (pending >= batchSize) { stmt.executeBatch(); pending = 0 }
  }

  override def commit(): WriterCommitMessage = {
    if (opened) {
      if (pending > 0) stmt.executeBatch()
      conn.commit()
    }
    new WriterCommitMessage {}
  }

  override def abort(): Unit =
    if (opened) {
      try conn.rollback()
      catch { case scala.util.control.NonFatal(_) => () }
    }

  override def close(): Unit =
    if (opened) {
      try stmt.close() catch { case scala.util.control.NonFatal(_) => () }
      try conn.close() catch { case scala.util.control.NonFatal(_) => () }
    }
}

object JdbcLww {
  /** Fail-fast mappability check, mirrored from
    * [[Warehouse.createJdbcTable]]'s type surface.
    */
  def requireMappable(dt: DataType, name: String): Unit = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType | TimestampType => ()
    case _: DecimalType => ()
    case other => throw new IllegalArgumentException(
      s"jdbc-lww cannot bind column '$name' of type $other — " +
        "project to scalar columns (to_json for nested data) before writing")
  }

  /** Bind field `i` of an InternalRow onto a prepared statement —
    * Spark's internal encodings (UTF8String, epoch-day Int, epoch-
    * micros Long, Decimal) to their JDBC scalar types.
    */
  def bind(stmt: java.sql.PreparedStatement, i: Int, dt: DataType,
           row: InternalRow): Unit =
    // setObject(null) lets the driver infer the column's SQL type —
    // Derby rejects setNull(_, Types.NULL) outright
    if (row.isNullAt(i)) stmt.setObject(i + 1, null)
    else dt match {
      case LongType    => stmt.setLong(i + 1, row.getLong(i))
      case IntegerType => stmt.setInt(i + 1, row.getInt(i))
      case ShortType   => stmt.setShort(i + 1, row.getShort(i))
      case ByteType    => stmt.setByte(i + 1, row.getByte(i))
      case DoubleType  => stmt.setDouble(i + 1, row.getDouble(i))
      case FloatType   => stmt.setFloat(i + 1, row.getFloat(i))
      case BooleanType => stmt.setBoolean(i + 1, row.getBoolean(i))
      case StringType  => stmt.setString(i + 1, row.getUTF8String(i).toString)
      case DateType    => stmt.setDate(i + 1,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(row.getInt(i).toLong)))
      case TimestampType =>
        val us = row.getLong(i)
        stmt.setTimestamp(i + 1, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)))
      case d: DecimalType =>
        stmt.setBigDecimal(i + 1,
          row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal)
      case other => throw new IllegalArgumentException(
        s"jdbc-lww cannot bind type $other") // unreachable: plan-time check
    }
}
