package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import sources.CleaningCsv
import sinks.Sinks

/** Source/sink round-trips (SURVEY.md §2 #31–34) in temp dirs. */
class SourceSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("#31 CleaningCsv: comma-numerics, dash-missing, title-case repairs") {
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "scraped.csv"),
      """town,yes_votes,no_votes
        |  n. ADAMS ,"1,234",567
        |BOSTON,"45,678",–
        |""".stripMargin)
    val df = CleaningCsv.read(spark, path, CleaningCsv.Options(
      numericCols = Seq("yes_votes", "no_votes"),
      titleCaseCols = Seq("town")))
    val rows = df.orderBy("town").collect()
    assert(rows.map(_.getString(0)).sameElements(Array("Boston", "N. Adams")))
    assert(rows.map(r => Option(r.get(1))).sameElements(Array(Some(45678.0), Some(1234.0))))
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 567.0)
  }

  test("#32 ReplaceSink: second write fully replaces the first") {
    val path = tmp() + "/t"
    val nation = Tables.nation(spark, dir)
    Sinks.ReplaceSink.write(nation, path)
    Sinks.ReplaceSink.write(nation.limit(5), path)
    assert(spark.read.parquet(path).count() == 5)
  }

  test("#33 KeyedOverwriteSink: touches only the incoming keys") {
    val path = tmp() + "/t"
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
    Sinks.KeyedOverwriteSink.write(cust, path, "c_nationkey")
    val before = spark.read.parquet(path)
    val total = before.count()
    val key0 = before.filter(col("c_nationkey") === 0)
    val nKey0 = key0.count()
    // reload nation 0 with halved balances; all other nations untouched
    val reload = cust.filter(col("c_nationkey") === 0)
      .withColumn("c_acctbal", col("c_acctbal") / 2)
    Sinks.KeyedOverwriteSink.write(reload, path, "c_nationkey")
    val after = spark.read.parquet(path)
    assert(after.count() == total)
    assert(after.filter(col("c_nationkey") === 0).count() == nKey0)
    val others = after.filter(col("c_nationkey") =!= 0)
      .agg(sum("c_acctbal")).head.getDouble(0)
    val othersBefore = before.filter(col("c_nationkey") =!= 0)
      .agg(sum("c_acctbal")).head.getDouble(0)
    assert(math.abs(others - othersBefore) < 1e-6)
  }

  test("CsvSink round-trips with header; single-file mode writes one part") {
    val path = tmp() + "/t"
    val nation = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    Sinks.CsvSink.write(nation, path, singleFile = true)
    val parts = new java.io.File(path).listFiles().count(_.getName.endsWith(".csv"))
    assert(parts == 1)
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() == nation.count())
    assert(back.columns.sameElements(Array("n_nationkey", "n_name")))
  }

  test("transformPrefixed scales only the prefixed columns") {
    import operators.Relational.transformPrefixed
    val df = Tables.customer(spark, dir)
      .select(col("c_custkey"), (col("c_acctbal") / 100).as("pct_bal"),
        col("c_acctbal").as("raw_bal"))
    val out = transformPrefixed(df, "pct_")(_ * 100)
    val orig = df.select(col("c_custkey"), col("pct_bal").as("orig_pct"),
      col("raw_bal").as("orig_raw"))
    val bad = out.join(orig, "c_custkey").filter(
      abs(col("pct_bal") - col("orig_pct") * 100) > 1e-9 || // prefixed scaled
        col("raw_bal") =!= col("orig_raw"))                 // others untouched
    assert(bad.count() == 0)
  }

  test("Compaction: many small files collapse to few, data intact") {
    val path = tmp() + "/t"
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    orders.repartition(24).write.parquet(path) // fragment into 24 small files
    val before = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 20)
    val checksum = orders.agg(sum("o_totalprice")).head.getDouble(0)
    Sinks.Compaction.compact(spark, path, targetFileMB = 512)
    val after = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after <= 2, s"still $after files")
    val back = spark.read.parquet(path)
    assert(back.count() == orders.count())
    assert(math.abs(back.agg(sum("o_totalprice")).head.getDouble(0) - checksum) < 1e-6)
  }

  test("#34 PartitionedParquet: partition dirs exist, files sorted on key") {
    val path = tmp() + "/t"
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    Sinks.PartitionedParquet.write(orders, path, "o_orderstatus", Seq("o_custkey"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderstatus=")))
    // partition pruning: reading one status must scan only its dir
    val one = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(one.count() == expected)
    // within-file ordering on the sort key
    import spark.implicits._
    val aFile = new java.io.File(path, dirs.find(_.startsWith("o_orderstatus=")).get)
      .listFiles().map(_.toString).find(_.endsWith(".parquet")).get
    val keys = spark.read.parquet(aFile).select("o_custkey").as[Long].collect()
    assert(keys.sameElements(keys.sorted))
  }

  test("JsonLines: rescue column quarantines malformed lines, strict drops them") {
    import org.apache.spark.sql.types._
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "docs.jsonl"),
      """{"doc_id": 1, "text": "hello world", "score": 0.5}
        |{"doc_id": 2, "text": "second doc", "score": 1.25}
        |{not json at all
        |{"doc_id": 4, "text": "fourth", "score": null}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("score", DoubleType)))
    val rescued = sources.JsonLines.readWithRescue(spark, path, schema).cache()
    assert(rescued.count() == 4)
    val bad = rescued.filter(col(sources.JsonLines.RescueCol).isNotNull)
    assert(bad.count() == 1)
    assert(bad.head.getString(3).startsWith("{not json"))
    assert(rescued.filter(col(sources.JsonLines.RescueCol).isNull).count() == 3)
    val strict = sources.JsonLines.readStrict(spark, path, schema)
    assert(strict.count() == 3)
    assert(strict.filter(col("doc_id") === 4).head.isNullAt(2)) // real null survives
  }

  test("JsonLines: write -> readStrict round-trips the documents table") {
    val path = tmp() + "/out"
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
    sources.JsonLines.write(docs, path)
    val back = sources.JsonLines.readStrict(spark, path,
      docs.schema.asInstanceOf[org.apache.spark.sql.types.StructType])
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }
}
