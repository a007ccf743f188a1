package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column functions.
  *
  * Re-expresses the reference's location pipeline
  * (src/utils/locationUtils.ts:29-53 haversine,
  * locationUtils.ts:143-154 radius filter, 129-141 distance sort).
  * The testdata tables carry no coordinates, so entities get
  * deterministic synthetic positions derived from their integer keys
  * with pure integer arithmetic — reproducible identically in the
  * DuckDB oracle.
  */
object Geo {
  /** Earth radius (km), as in locationUtils.ts:36. */
  val EarthRadiusKm = 6371.0

  /** Singapore-ish bounding box used by the synthetic geocoder. */
  private val LatBase = 1.25
  private val LonBase = 103.6

  /** Deterministic synthetic latitude from an integer key. */
  def synthLat(key: Column): Column =
    lit(LatBase) + pmod(key * 40503L, lit(1000L)).cast("double") / 1000.0 * 0.2

  /** Deterministic synthetic longitude from an integer key. */
  def synthLon(key: Column): Column =
    lit(LonBase) + pmod(key * 69427L, lit(1000L)).cast("double") / 1000.0 * 0.4

  /** Great-circle distance in km (haversine, locationUtils.ts:29-49).
    * Pure builtin math functions — stays in whole-stage codegen.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }
}
