package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the star-schema testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst sees a parquet relation it
  * can push filters and column pruning into. Dimension tables are tiny
  * relative to facts at any scale factor; operators broadcast them
  * explicitly where joined against facts.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts has shipped as BOTH parquet INT64 TIMESTAMP(NANOS) and
    * native timestamp[us] across testdata regenerations, so the loader
    * adapts to whichever physical type the footer declares instead of
    * hard-coding one:
    *
    *   - TIMESTAMP(NANOS): Spark rejects it at footer read unless
    *     `nanosAsLong` is on, so the flag is set UNCONDITIONALLY before
    *     the read — it is harmless for non-nanos files (r9 advice: the
    *     previous catch-and-retry matched on exception-message
    *     substrings, brittle across Spark versions/locales). The flag
    *     is session-wide and intentionally NOT restored — the DataFrame
    *     is lazy, so the conf must still hold at execution time (a
    *     save/restore around the read would re-break the scan when the
    *     query actually runs).
    *   - timestamp[us] without UTC adjustment: arrives as
    *     TIMESTAMP_NTZ; the session timezone is pinned to UTC
    *     (Engine.session), so casting to TIMESTAMP preserves both the
    *     wall-clock AND the instant — calendar bucketing (q51 cohorts,
    *     q72 hourly resample, q105 day buckets) is unchanged vs the
    *     nanos path.
    *   - timestamp[us] UTC-adjusted: arrives as TIMESTAMP; use as-is.
    *
    * Either way callers see the same contract: `ts` is TimestampType
    * at microsecond precision in a UTC session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other — expected " +
            "INT64 nanos, timestamp, or timestamp_ntz (see TESTDATA.md)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Named, actionable error for a testdata schema that drifted outside
    * what the loaders adapt to. Raised by [[validate]] so a regenerated
    * parquet with an incompatible physical type fails the gate with ONE
    * message naming the table/column instead of N query-level
    * `DATATYPE_MISMATCH`es.
    */
  final class SchemaContractViolation(val violations: Seq[String])
      extends RuntimeException(
        "TESTDATA SCHEMA CONTRACT VIOLATION:\n  " + violations.mkString("\n  "))

  import org.apache.spark.sql.types._

  /** Expected physical schema per table: column order + an allowed set
    * of arrival types per column. The sets span every physical variant
    * the loaders adapt to (events.ts: INT64-nanos arrives LongType /
    * timestamp[us] arrives NTZ or UTC-adjusted Timestamp), so validate
    * only fires on drift the engine genuinely cannot absorb.
    */
  private val ints: Set[DataType] = Set(IntegerType, LongType)
  private val times: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)
  private def exact(t: DataType): Set[DataType] = Set(t)
  private val contract: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq("r_regionkey" -> ints, "r_name" -> exact(StringType)),
    "nation" -> Seq("n_nationkey" -> ints, "n_name" -> exact(StringType),
      "n_regionkey" -> ints),
    "customer" -> Seq("c_custkey" -> ints, "c_name" -> exact(StringType),
      "c_nationkey" -> ints, "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq("s_suppkey" -> ints, "s_name" -> exact(StringType),
      "s_nationkey" -> ints, "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq("p_partkey" -> ints, "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> ints, "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq("o_orderkey" -> ints, "o_custkey" -> ints,
      "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> times, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq("l_orderkey" -> ints, "l_partkey" -> ints,
      "l_suppkey" -> ints, "l_linenumber" -> ints,
      "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
      "l_shipdate" -> times),
    "events" -> Seq("event_id" -> ints, "ts" -> (times + LongType),
      "user_id" -> ints, "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Seq("doc_id" -> ints, "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> ints),
    "embeddings" -> Seq("vec_id" -> ints,
      "embedding" -> Set[DataType](ArrayType(FloatType, true),
        ArrayType(FloatType, false), ArrayType(DoubleType, true),
        ArrayType(DoubleType, false)),
      "label" -> ints))

  /** Check every table under `dir` (or the named subset) against the
    * documented contract; throw ONE [[SchemaContractViolation]] listing
    * all drifted columns. Footer-only reads — no data scan, so this is
    * free even against a 100 TB warehouse directory.
    */
  def validate(s: SparkSession, dir: String,
               tables: Seq[String] = contract.map(_._1)): Unit = {
    val want = contract.toMap
    val violations = tables.flatMap { t =>
      val cols = want.getOrElse(t,
        throw new IllegalArgumentException(s"unknown table $t"))
      val loaded =
        try Right(if (t == "events") events(s, dir) else apply(s, dir, t))
        catch { case e: Exception => Left(s"$t: unreadable (${e.getMessage})") }
      loaded match {
        case Left(err) => Seq(err)
        case Right(df) =>
          val got = df.schema.fields
          val missing = cols.map(_._1).filterNot(got.map(_.name).contains)
            .map(c => s"$t.$c: missing")
          val drifted = got.flatMap { f =>
            cols.collectFirst { case (n, allowed) if n == f.name => allowed }
              .collect {
                case allowed
                    // events() normalizes ts → TimestampType before we
                    // see it; contract sets already include that form
                    if !allowed.contains(f.dataType) =>
                  s"$t.${f.name}: arrived ${f.dataType.simpleString}, " +
                    s"allowed ${allowed.map(_.simpleString).mkString("/")}"
              }
          }
          // order + unexpected-column checks, so the gate's guarantees
          // match its doc (r9 advice): operators select by name, but a
          // reordered/widened parquet still signals testdata drift worth
          // one loud line
          val extra = got.map(_.name).filterNot(cols.map(_._1).contains)
            .map(c => s"$t.$c: unexpected column")
          val expectedOrder = cols.map(_._1).filter(got.map(_.name).contains)
          val arrivedOrder = got.map(_.name).filter(cols.map(_._1).contains)
          val misordered =
            if (expectedOrder == arrivedOrder.toSeq) Nil
            else Seq(s"$t: columns arrived [${arrivedOrder.mkString(", ")}], " +
              s"contract order [${expectedOrder.mkString(", ")}]")
          missing ++ drifted ++ extra ++ misordered
      }
    }
    if (violations.nonEmpty) throw new SchemaContractViolation(violations)
  }
}
