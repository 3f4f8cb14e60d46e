package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import sources.Avro

/** Avro OCF source/sink round-trip against the real testdata
  * tables. */
class AvroSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    Files.createTempDirectory("graft-avro").toString

  test("round-trip preserves rows, schema names/types, and NULLs") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType),
      StructField("blob", BinaryType)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, null, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    Avro.write(df, path)
    val back = Avro.read(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => (r.getAs[Any]("id"),
      r.getAs[Any]("name"), r.getAs[Any]("score"), r.getAs[Any]("flag"),
      Option(r.getAs[Array[Byte]]("blob")).map(_.toSeq)))
    val want = rows.map(r => (r.get(0), r.get(1), r.get(2), r.get(3),
      Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq)))
    assert(got.toSet == want.toSet)
  }

  test("orders table round-trips through OCF with exact values") {
    val orders = Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS STRING) AS o_orderdate")
    val path = tmp()
    Avro.write(orders, path)
    val back = Avro.read(spark, path)
    assert(back.count() == orders.count())
    val key = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    assert(back.select(key.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSet ==
      orders.select(key.map(org.apache.spark.sql.functions.col): _*)
        .collect().toSet)
  }

  test("one part file per non-empty partition; files carry the schema") {
    import spark.implicits._
    val df = (1 to 100).toDF("n").repartition(4)
    val path = tmp()
    Avro.write(df, path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length == 4)
    // a fresh read needs no external schema
    assert(Avro.read(spark, path).as[Int].collect().sorted.toSeq ==
      (1 to 100))
  }

  test("out-of-contract types fail loudly at schema mapping") {
    import spark.implicits._
    val df = Seq((1, Seq(1, 2))).toDF("a", "xs")
    val e = intercept[IllegalArgumentException] {
      Avro.write(df, tmp())
    }
    assert(e.getMessage.contains("out of the Avro sink contract"))
  }
}
