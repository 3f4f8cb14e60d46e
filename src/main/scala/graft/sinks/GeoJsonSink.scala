package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoJSON sink (RFC 7946) — the write mirror of
  * [[graft.sources.GeoJson]], closing the reference's dashboard
  * hand-off: its analysis frame + geometries feed a leaflet map
  * (`dashboard/server.R:25`, `app_data.R:24-28` consume exactly this
  * artifact shape).
  *
  * Input contract is the source's OWN output schema: `geometry_type`,
  * `px`/`py` (points), `rings` as `array<struct<xs:array<double>,
  * ys:array<double>>>`, plus property columns. Two layouts:
  *   - [[writeLines]] — GeoJSONL, one Feature per line: a plain
  *     parallel text write, the 100 TB path (each task writes its
  *     shard; no driver involvement).
  *   - [[writeCollection]] — a single FeatureCollection document for
  *     reference-data-sized shape sets (the dashboard artifact; a few
  *     thousand districts). The features are aggregated into ONE row —
  *     by design NOT a scale path, same bounded-cardinality
  *     precondition as the reference's own dashboard export. Features
  *     are text-sorted so the artifact is byte-reproducible run to run.
  *
  * Feature text is assembled entirely from codegen'd string/JSON
  * expressions (`to_json`, `concat`) — no UDFs, no driver-side JSON.
  * Ring geometry round-trips bit-exactly through the source's parser
  * (`to_json` double rendering ↔ `from_json`). MultiPolygon part
  * structure is normalized to a flat ring set at INGEST
  * ([[graft.sources.GeoJson.parseFeatures]] flattens), so export emits
  * those shapes as a Polygon carrying the same rings — even-odd
  * containment semantics are identical. Rows with a NULL geometry
  * (quarantined at ingest) export as `"geometry": null`, which RFC 7946
  * §3.2 allows for unlocated features.
  */
object GeoJsonSink {

  /** Feature-string column for a row of the source schema. `props`
    * become the feature's properties object (in the given order). */
  def featureColumn(props: Seq[String]): Column = {
    val coords = transform(col("rings"), r =>
      zip_with(r.getField("xs"), r.getField("ys"), (x, y) => array(x, y)))
    val geometry =
      when(col("geometry_type") === "Point" && col("px").isNotNull && col("py").isNotNull,
        concat(lit("{\"type\":\"Point\",\"coordinates\":"),
          to_json(array(col("px"), col("py"))), lit("}")))
        .when(col("rings").isNotNull,
          concat(lit("{\"type\":\"Polygon\",\"coordinates\":"), to_json(coords), lit("}")))
    val properties =
      if (props.isEmpty) lit("{}")
      else to_json(struct(props.map(col): _*))
    concat(
      lit("{\"type\":\"Feature\",\"geometry\":"),
      coalesce(geometry, lit("null")),
      lit(",\"properties\":"), coalesce(properties, lit("{}")),
      lit("}"))
  }

  /** GeoJSONL: one Feature per line, parallel shardable text write. */
  def writeLines(df: DataFrame, path: String, props: Seq[String]): Unit =
    df.select(featureColumn(props).as("value"))
      .write.mode("overwrite").text(path)

  /** One FeatureCollection document (single text part). PRECONDITION:
    * dimension-grade feature count — the whole collection passes
    * through one aggregate row (the dashboard/reference-data shape,
    * not a corpus export; use [[writeLines]] for those). Features are
    * sorted by their serialized text for a reproducible artifact. */
  def writeCollection(df: DataFrame, path: String, props: Seq[String]): Unit =
    df.select(featureColumn(props).as("feature"))
      .agg(array_join(array_sort(collect_list("feature")), ",").as("joined"))
      .select(concat(
        lit("{\"type\":\"FeatureCollection\",\"features\":["),
        col("joined"), lit("]}")).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
}
