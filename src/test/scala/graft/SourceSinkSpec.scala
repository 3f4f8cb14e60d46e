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

  test("ShardedExport: globally sorted shards, disjoint ranges, faithful manifest") {
    val path = tmp() + "/shards"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val manifest = Sinks.ShardedExport.write(docs, path, "doc_id", 4).cache()
    val rows = manifest.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).sortBy(_._1)
    // nothing lost, nothing duplicated
    assert(rows.map(_._2).sum == docs.count())
    val back = spark.read.parquet(path)
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0)
    // global order: shard i's max key < shard i+1's min key
    rows.sliding(2).foreach {
      case Array((ia, _, _, maxA), (ib, _, minB, _)) =>
        assert(maxA < minB, s"shards $ia/$ib overlap: $maxA >= $minB")
      case _ =>
    }
    // manifest describes the files: re-derive min/max from disk
    val fromDisk = back.groupBy("shard_id")
      .agg(org.apache.spark.sql.functions.min("doc_id"),
        org.apache.spark.sql.functions.max("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fromDisk.toSeq == rows.map(r => (r._1, r._3, r._4)).toSeq)
    // balance: sampled range boundaries keep shards within 4x of each other
    assert(rows.map(_._2).max <= 4 * rows.map(_._2).min.max(1L))
    // boundary determinism: identical input + layout => identical
    // manifest (RangePartitioner's reservoir is seeded per partition)
    val manifest2 = Sinks.ShardedExport.write(docs, tmp() + "/shards2", "doc_id", 4)
    assert(manifest.exceptAll(manifest2).count() == 0 &&
      manifest2.exceptAll(manifest).count() == 0)
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

  test("GeoJson: lines layout parses mixed geometries, quarantines malformed features") {
    import org.apache.spark.sql.types.StructType
    val path = tmp()
    val lines = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{"name":"pt","pop":7}}""",
      """{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[10,0],[0,10],[0,0]]]},"properties":{"name":"tri","pop":1}}""",
      """{"type":"Feature","geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[5,0],[5,5],[0,5],[0,0]]],[[[8,8],[12,8],[12,12],[8,12],[8,8]]]]},"properties":{"name":"two","pop":2}}""",
      "this is not json at all",
      """{"type":"NotAFeature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"x"}}""",
      """{"type":"Feature","geometry":{"type":"Polygon","coordinates":[3,4]},"properties":{"name":"badcoords"}}""",
      """{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]},"properties":{"name":"unsupported"}}""",
    )
    Files.writeString(java.nio.file.Path.of(path, "f.geojsonl"), lines.mkString("\n"))
    val schema = StructType.fromDDL("name string, pop int")
    val df = sources.GeoJson.readLines(spark, path, schema).cache()
    assert(df.count() == 7)
    val bad = df.filter(col(sources.GeoJson.RescueCol).isNotNull)
    assert(bad.count() == 4)
    assert(bad.filter(col("name").isNotNull || col("rings").isNotNull).count() == 0)
    val good = df.filter(col(sources.GeoJson.RescueCol).isNull)
    assert(good.count() == 3)
    // point columns
    val pt = good.filter(col("geometry_type") === "Point").head
    assert(pt.getDouble(pt.fieldIndex("px")) == 3.0 && pt.getDouble(pt.fieldIndex("py")) == 4.0)
    assert(pt.getString(pt.fieldIndex("name")) == "pt" && pt.getInt(pt.fieldIndex("pop")) == 7)
    // rings feed the exact ray cast directly
    val tri = good.filter(col("name") === "tri")
    assert(tri.filter(operators.Geo.pointInRings(col("rings"), lit(1.0), lit(1.0))).count() == 1)
    assert(tri.filter(operators.Geo.pointInRings(col("rings"), lit(8.0), lit(8.0))).count() == 0)
    val two = good.filter(col("name") === "two")
    assert(two.filter(operators.Geo.pointInRings(col("rings"), lit(9.0), lit(9.0))).count() == 1)
    assert(two.filter(operators.Geo.pointInRings(col("rings"), lit(6.5), lit(6.5))).count() == 0)
    // multipart bbox spans both squares
    val bb = two.select(operators.Geo.ringsBbox(col("rings"))).head.getStruct(0)
    assert(bb.getDouble(0) == 0.0 && bb.getDouble(2) == 12.0)
    df.unpersist()
  }

  test("GeoJson: FeatureCollection file explodes to features; junk file quarantined") {
    import org.apache.spark.sql.types.StructType
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "shapes.geojson"),
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[10,0],[0,10],[0,0]]]},"properties":{"name":"tri"}},
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"pt"}}]}""".stripMargin)
    val schema = StructType.fromDDL("name string")
    val df = sources.GeoJson.readCollection(spark, path, schema).cache()
    assert(df.count() == 2)
    assert(df.filter(col(sources.GeoJson.RescueCol).isNotNull).count() == 0)
    assert(df.select("name").collect().map(_.getString(0)).toSet == Set("tri", "pt"))
    // a file with no features array -> one quarantined row
    val path2 = tmp()
    Files.writeString(java.nio.file.Path.of(path2, "junk.geojson"), """{"hello":"world"}""")
    val df2 = sources.GeoJson.readCollection(spark, path2, schema).cache()
    assert(df2.count() == 1)
    assert(df2.filter(col(sources.GeoJson.RescueCol).isNotNull).count() == 1)
    df.unpersist(); df2.unpersist()
  }

  test("GeoJsonSink: lines round-trip source→sink→source preserves geometry and properties") {
    import org.apache.spark.sql.types.StructType
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "f.geojsonl"), Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[3.5,-4.25]},"properties":{"name":"pt","pop":7}}""",
      """{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[10.5,0],[0,10.25],[0,0]]]},"properties":{"name":"tri","pop":1}}""",
      """{"type":"Feature","geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[5,0],[5,5],[0,5],[0,0]]],[[[8,8],[12,8],[12,12],[8,12],[8,8]]]]},"properties":{"name":"two","pop":2}}""",
    ).mkString("\n"))
    val schema = StructType.fromDDL("name string, pop int")
    val first = sources.GeoJson.readLines(spark, path, schema)
      .filter(col(sources.GeoJson.RescueCol).isNull).cache()
    val out = tmp()
    sinks.GeoJsonSink.writeLines(first, out, Seq("name", "pop"))
    val second = sources.GeoJson.readLines(spark, out, schema).cache()
    assert(second.filter(col(sources.GeoJson.RescueCol).isNotNull).count() == 0)
    assert(second.count() == 3)
    def ringsByName(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Seq[Double], Seq[Double])]] =
      df.filter(col("rings").isNotNull).select("name", "rings").collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(ring =>
          (ring.getSeq[Double](0), ring.getSeq[Double](1)))
      }.toMap
    // geometry equality: ring coordinates round-trip bit-exactly
    assert(ringsByName(second) == ringsByName(first))
    val pt = second.filter(col("geometry_type") === "Point").head
    assert(pt.getDouble(pt.fieldIndex("px")) == 3.5 && pt.getDouble(pt.fieldIndex("py")) == -4.25)
    assert(second.select("name", "pop").collect().map(r => (r.getString(0), r.getInt(1))).toSet
      == Set(("pt", 7), ("tri", 1), ("two", 2)))
    // the multipolygon was ring-normalized at ingest; its export carries
    // the same rings, so containment semantics survive the round trip
    val two = second.filter(col("name") === "two")
    assert(two.filter(operators.Geo.pointInRings(col("rings"), lit(9.0), lit(9.0))).count() == 1)
    assert(two.filter(operators.Geo.pointInRings(col("rings"), lit(6.5), lit(6.5))).count() == 0)
    first.unpersist(); second.unpersist()
  }

  test("GeoJsonSink: FeatureCollection round-trip, null geometry, reproducible bytes") {
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "shapes.geojson"),
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[10,0],[0,10],[0,0]]]},"properties":{"name":"tri"}},
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"pt"}}]}""".stripMargin)
    val schema = StructType.fromDDL("name string")
    val first = sources.GeoJson.readCollection(spark, path, schema)
      .filter(col(sources.GeoJson.RescueCol).isNull).cache()
    val out = tmp()
    sinks.GeoJsonSink.writeCollection(first, out, Seq("name"))
    val second = sources.GeoJson.readCollection(spark, out, schema)
    assert(second.filter(col(sources.GeoJson.RescueCol).isNotNull).count() == 0)
    assert(second.select("name").collect().map(_.getString(0)).toSet == Set("tri", "pt"))
    // byte-reproducible artifact: a second write produces identical text
    def docText(dir: String): String = {
      val f = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-")).head
      Files.readAllLines(f.toPath).asScala.mkString("\n")
    }
    val out2 = tmp()
    sinks.GeoJsonSink.writeCollection(first, out2, Seq("name"))
    assert(docText(out) == docText(out2))
    // a geometry-less row exports as RFC 7946 "geometry": null
    val bare = first.limit(1)
      .withColumn("geometry_type", lit(null).cast("string"))
      .withColumn("px", lit(null).cast("double"))
      .withColumn("py", lit(null).cast("double"))
      .withColumn("rings", lit(null).cast(first.schema("rings").dataType))
    val out3 = tmp()
    sinks.GeoJsonSink.writeLines(bare, out3, Seq("name"))
    assert(docText(out3).contains("\"geometry\":null"))
    first.unpersist()
  }

  test("HtmlTables: header-matched extraction across files with different column orders") {
    import org.apache.spark.sql.types.StructType
    val path = tmp()
    Files.writeString(java.nio.file.Path.of(path, "a.html"),
      """<html><body><h1>Results</h1>
        |<table class="wikitable">
        |<tr><th>Town</th><th> Yes&nbsp;Votes </th><th>No Votes</th></tr>
        |<tr><td><b>N.&#39;Adams</b></td><td>1,234</td><td>567</td></tr>
        |<tr><td>Boston &amp; suburbs</td><td>45</td><td>67</td></tr>
        |<tr><td>ShortRow</td><td>1</td></tr>
        |</table>
        |<table><tr><th>other</th></tr><tr><td>x</td></tr></table>
        |</body></html>""".stripMargin)
    // second file: same columns, DIFFERENT order
    Files.writeString(java.nio.file.Path.of(path, "b.html"),
      """<table>
        |<tr><th>No votes</th><th>Town</th><th>yes votes</th></tr>
        |<tr><td>9</td><td>Salem</td><td>8</td></tr>
        |</table>""".stripMargin)
    val schema = StructType.fromDDL("`town` string, `yes votes` string, `no votes` string")
    val df = sources.HtmlTables.readTable(spark, path, schema).cache()
    val good = df.filter(col(sources.HtmlTables.RescueCol).isNull)
      .select("town", "yes votes", "no votes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(good == Set(
      ("N.'Adams", "1,234", "567"),
      ("Boston & suburbs", "45", "67"),
      ("Salem", "8", "9")))
    // quarantined: the short row, and the second table lacking the columns
    val bad = df.filter(col(sources.HtmlTables.RescueCol).isNotNull)
    assert(bad.count() == 2)
    assert(bad.filter(col("town").isNotNull).count() == 0)
    assert(bad.filter(col(sources.HtmlTables.RescueCol).contains("ShortRow")).count() == 1)
    df.unpersist()
  }

  test("ORC round-trip: schema and values survive, partition pruning works") {
    val path = tmp() + "/orc"
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_shipdate"))
    li.write.partitionBy("l_returnflag").orc(path)
    val back = spark.read.orc(path)
    assert(back.count() == li.count())
    // values: exact sum parity on the measure
    val sumIn = li.agg(sum(expr("CAST(l_quantity * 100 AS BIGINT)"))).head().getLong(0)
    val sumOut = back.agg(sum(expr("CAST(l_quantity * 100 AS BIGINT)"))).head().getLong(0)
    assert(sumIn == sumOut)
    // partition pruning: a returnflag filter must prune to one dir
    val plan = back.filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("l_returnflag") && plan.contains("Scan orc"))
    assert(back.filter(col("l_returnflag") === "R").count() ==
      li.filter(col("l_returnflag") === "R").count())
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
