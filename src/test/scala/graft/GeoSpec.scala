package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Geo

/** Geometry-lite invariants: WKT round-trip, bbox/centroid/validity
  * semantics, and grid-join parity with the naive theta join. */
class GeoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("WKT point and box round-trip through build → parse") {
    val df = Seq((3, 7), (-2, 11)).toDF("x", "y")
      .withColumn("pw", Geo.wktPoint(col("x"), col("y")))
      .withColumn("bw", Geo.wktBox(col("x"), col("y"), col("x") + 5, col("y") + 5))
    val r = df.select(
      Geo.pointX(col("pw")), Geo.pointY(col("pw")),
      Geo.bbox(col("bw")).getField("xmin"), Geo.bbox(col("bw")).getField("ymax")).collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(3.0, -2.0))
    assert(r.map(_.getDouble(1)).toSeq == Seq(7.0, 11.0))
    assert(r.map(_.getDouble(2)).toSeq == Seq(3.0, -2.0))
    assert(r.map(_.getDouble(3)).toSeq == Seq(12.0, 16.0))
  }

  test("point parse is anchored: garbage around a valid POINT yields null") {
    val df = Seq("xxPOINT (1 2)yy", "POINT (1 2) ", "POINT (1 2)").toDF("wkt")
      .select(Geo.pointX(col("wkt")).as("x"), Geo.pointY(col("wkt")).as("y"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1), s"unanchored parse: ${df(0)}")
    assert(df(1).isNullAt(0) && df(1).isNullAt(1), s"trailing junk parsed: ${df(1)}")
    assert(df(2).getDouble(0) == 1.0 && df(2).getDouble(1) == 2.0)
  }

  test("centroid of a box is its center; validity rejects malformed rings") {
    val df = Seq("POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0))").toDF("wkt")
    val c = df.select(Geo.centroid(col("wkt"))).head.getStruct(0)
    assert(c.getDouble(0) == 5.0 && c.getDouble(1) == 2.0)
    val cases = Seq(
      ("POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0))", true),
      ("POLYGON ((0 0, 10 0, 10 4, 0 4))", false), // unclosed
      ("POLYGON ((0 0, 0 0, 0 0, 0 0))", false), // degenerate extent
      ("POLYGON ((0 0, 1 1))", false), // too few vertices
      ("not wkt at all", false),
      ("POINT (3 4)", false),
    ).toDF("wkt", "expected")
    assert(cases.filter(Geo.isValidPolygon(col("wkt")) =!= col("expected")).count() == 0)
  }

  test("grid-bucketed spatial join is result-identical to the naive theta join") {
    val polys = Seq(
      (1, 0.0, 0.0, 20.0, 20.0), // spans 2x2 grid cells
      (2, 15.0, 15.0, 40.0, 18.0), // overlaps poly 1
      (3, 100.0, 100.0, 101.0, 101.0), // empty region
    ).toDF("district_id", "xmin", "ymin", "xmax", "ymax")
    val points = (0 until 500)
      .map(i => ((i * 17 % 45).toDouble, (i * 29 % 45).toDouble)).toDF("px", "py")
    val grid = Geo.gridJoin(points, polys).select("district_id", "px", "py")
    val naive = Geo.naiveJoin(points, polys).select("district_id", "px", "py")
    assert(grid.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(grid).count() == 0)
    assert(naive.count() > 0)
  }

  test("ray cast: triangle, multipart, and holed polygon beat the bbox test") {
    val tri = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
    val multi = "MULTIPOLYGON (((0 0, 10 0, 0 10, 0 0)), ((20 20, 24 20, 24 24, 20 24, 20 20)))"
    val holed = "POLYGON ((0 0, 12 0, 12 12, 0 12, 0 0), (4 4, 8 4, 8 8, 4 8, 4 4))"
    val cases = Seq(
      (tri, 1.0, 1.0, true),    // lower-left half
      (tri, 8.0, 8.0, false),   // inside bbox, above hypotenuse
      (multi, 21.0, 21.0, true),  // second part
      (multi, 15.0, 15.0, false), // bbox gap between parts
      (holed, 2.0, 2.0, true),    // ring area
      (holed, 6.0, 6.0, false),   // inside the hole
      (holed, 6.0, 2.0, true),    // below the hole
      (tri, -1.0, 5.0, false),    // left of everything
    ).toDF("wkt", "px", "py", "expected")
    val bad = cases.filter(
      Geo.pointInRings(Geo.parsedRings(col("wkt")), col("px"), col("py"))
        =!= col("expected"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("ringsBbox spans all parts of a multipolygon") {
    val multi = "MULTIPOLYGON (((0 0, 10 0, 0 10, 0 0)), ((20 20, 24 20, 24 24, 20 24, 20 20)))"
    val bb = Seq(multi).toDF("wkt")
      .select(Geo.ringsBbox(Geo.parsedRings(col("wkt")))).head.getStruct(0)
    assert(bb.getDouble(0) == 0.0 && bb.getDouble(1) == 0.0)
    assert(bb.getDouble(2) == 24.0 && bb.getDouble(3) == 24.0)
  }

  test("q55: exact counts are strictly below bbox candidates on non-rectangular shapes") {
    val df = Geo.pointInPolygon(spark, dir).cache()
    assert(df.count() == 25)
    // triangles (id%4==0) cover half their bbox: exact must be well below
    val strict = df.filter(col("n_points") < col("n_bbox_candidates"))
    assert(strict.count() >= 12, "bbox==exact on most shapes — ray cast not discriminating")
    assert(df.filter(col("n_points") > col("n_bbox_candidates")).count() == 0)
    assert(df.agg(sum("n_points")).head.getLong(0) > 0)
  }

  test("q33: one row per valid district (invalid ring filtered), overlaps counted") {
    val df = Geo.spatialJoin(spark, dir).cache()
    assert(df.count() == 24) // 25 nations minus the planted invalid ring
    assert(df.filter(col("district_id") === 13).count() == 0)
    // overlapping 13-wide boxes on a 10-grid: total point-district pairs
    // exceed the point count
    val nPoints = Tables.customer(spark, dir).count()
    assert(df.agg(sum("n_points")).head.getLong(0) > nPoints)
  }
}
