package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}

/** GeoJSON source (RFC 7946) feeding the [[graft.operators.Geo]]
  * operators — the ingestion half of the reference's shapefile branch
  * (`district_gis_etl.py:42` reads district multipolygons; here the
  * same shapes arrive as GeoJSON, the open-interchange sibling).
  *
  * Two layouts:
  *   - **GeoJSONL / GeoJSONSeq** (one Feature per line,
  *     [[readLines]]): the 100 TB path — a plain shardable text scan
  *     with per-feature quarantine, exactly like [[JsonLines]].
  *   - **FeatureCollection files** ([[readCollection]]): `wholetext`
  *     read — one record per FILE, deliberately not splittable, for
  *     reference-data-sized shape sets (a few thousand districts), the
  *     scale class the reference's shapefiles live in. Features are
  *     exploded to strings and fed to the same per-feature parser.
  *
  * Parsing is TWO-PHASE because GeoJSON coordinate nesting varies by
  * geometry type (Point [x,y], Polygon [[[x,y]]], MultiPolygon
  * [[[[x,y]]]]) so no single Spark schema fits: `get_json_object`
  * raw-extracts the geometry type and the coordinates JSON (Spark's
  * JSON reader stringifies any value under a StringType schema), then
  * `from_json` parses at the per-type depth. Point/Polygon/
  * MultiPolygon all normalize into the SAME `array<struct<xs,ys>>`
  * ring representation [[graft.operators.Geo.parsedRings]] produces
  * (points additionally get px/py), so `gridJoin` / `pointInRings` /
  * `ringsBbox` consume features directly. A feature failing ANY stage
  * — not JSON, not a Feature, unsupported/missing geometry, corrupt or
  * ragged coordinates — arrives as an all-null row with its raw text
  * in `_malformed`: the [[JsonLines.readWithRescue]] quarantine
  * contract. Everything is codegen'd expressions; no UDFs, no driver
  * parsing.
  */
object GeoJson {

  val RescueCol = "_malformed"

  private val PolyType =
    DataType.fromDDL("array<array<array<double>>>").asInstanceOf[ArrayType]
  private val MultiType =
    DataType.fromDDL("array<array<array<array<double>>>>").asInstanceOf[ArrayType]
  private val PointType = DataType.fromDDL("array<double>").asInstanceOf[ArrayType]

  /** Parse a `feature` JSON-string column into geometry + properties +
    * quarantine. Output: geometry_type, px, py, rings, the flattened
    * `propSchema` fields, `_malformed`. */
  def parseFeatures(features: DataFrame, propSchema: StructType): DataFrame = {
    val f = col("feature")
    val gtype = get_json_object(f, "$.geometry.type")
    val coords = get_json_object(f, "$.geometry.coordinates")
    val pt = from_json(coords, PointType)
    val poly = from_json(coords, PolyType)
    val multi = from_json(coords, MultiType)
    // ring depth-structural soundness: PERMISSIVE from_json can return
    // partially-null nests for ragged input; reject those outright
    def soundRings(r: Column): Column =
      r.isNotNull && forall(r, ring =>
        ring.isNotNull && size(ring) >= 1 &&
          forall(ring, p => p.isNotNull && size(p) >= 2 &&
            element_at(p, 1).isNotNull && element_at(p, 2).isNotNull))
    def ringsOf(r: Column): Column = transform(r, ring => struct(
      transform(ring, p => element_at(p, 1)).as("xs"),
      transform(ring, p => element_at(p, 2)).as("ys")))
    val ok = get_json_object(f, "$.type") === "Feature" && (
      (gtype === "Point" && pt.isNotNull && size(pt) >= 2 &&
        element_at(pt, 1).isNotNull && element_at(pt, 2).isNotNull) ||
        (gtype === "Polygon" && soundRings(poly)) ||
        (gtype === "MultiPolygon" && multi.isNotNull &&
          forall(multi, soundRings) && soundRings(flatten(multi))))
    val rings = when(gtype === "Polygon", ringsOf(poly))
      .when(gtype === "MultiPolygon", ringsOf(flatten(multi)))
    val props = from_json(get_json_object(f, "$.properties"), propSchema)
    features
      .withColumn("_ok", ok.isNotNull && ok)
      .select(
        Seq(
          when(col("_ok"), gtype).as("geometry_type"),
          when(col("_ok") && gtype === "Point", element_at(pt, 1)).as("px"),
          when(col("_ok") && gtype === "Point", element_at(pt, 2)).as("py"),
          when(col("_ok"), rings).as("rings")) ++
          propSchema.fieldNames.toSeq.map(n =>
            when(col("_ok"), props.getField(n)).as(n)) :+
          when(!col("_ok"), coalesce(f, lit("<missing feature>"))).as(RescueCol): _*)
  }

  /** GeoJSONL (one Feature per line) — the shardable scale layout. */
  def readLines(spark: SparkSession, path: String, propSchema: StructType): DataFrame =
    parseFeatures(
      spark.read.text(path).select(col("value").as("feature")), propSchema)

  /** FeatureCollection file(s): one record per file (`wholetext`),
    * features exploded into the per-feature parser. Files without a
    * features array yield a single quarantined row. */
  def readCollection(spark: SparkSession, path: String, propSchema: StructType): DataFrame = {
    val feats = spark.read.option("wholetext", "true").text(path)
      .select(explode_outer(
        from_json(get_json_object(col("value"), "$.features"),
          ArrayType(StringType))).as("feature"))
    parseFeatures(feats, propSchema)
  }
}
