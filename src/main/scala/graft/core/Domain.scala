package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial domain model + lat/lon <-> local-Cartesian projection.
  *
  * Reference: convml_data/sampling/domain.py:10-243 — `LocalCartesianDomain`
  * is an azimuthal tangent-plane projection centered on (lat0, lon0) with
  * extents l_zonal × l_meridional meters (convml_data/__init__.py:73-98).
  * The projection here is the standard azimuthal-equidistant formula
  * (public textbook form; the reference delegates to regridcart/cartopy).
  *
  * Everything is expressed as Catalyst Column math (codegen'd trig
  * built-ins, no UDFs): domain bounds become plain filter predicates so
  * Catalyst pushes them into scans, and the km-scale cell id doubles as a
  * spatial partitioning / bucketing key at 100 TB.
  *
  * Degree<->radian conversion uses explicit literal factors rather than
  * `radians()`/`degrees()`: Java's Math.toRadians (x/180*π) and C libm's
  * radians (x*(π/180)) differ in the last ulp, which would leak into any
  * cross-engine comparison of derived cells.
  */
final case class Domain(
    centralLat: Double,
    centralLon: Double,
    lZonal: Double,
    lMeridional: Double) {
  def xMin: Double = -lZonal / 2
  def xMax: Double = lZonal / 2
  def yMin: Double = -lMeridional / 2
  def yMax: Double = lMeridional / 2

  /** P2: bbox containment predicate on projected coords. */
  def contains(x: Column, y: Column): Column =
    x >= xMin && x <= xMax && y >= yMin && y <= yMax

  /** Tile of size `sizeM` centered at (x,y) fully inside the domain. */
  def containsTile(x: Column, y: Column, sizeM: Double): Column =
    x - sizeM / 2 >= xMin && x + sizeM / 2 <= xMax &&
      y - sizeM / 2 >= yMin && y + sizeM / 2 <= yMax
}

object DomainInference {
  import org.apache.spark.sql.DataFrame

  /** P3: largest-extent inference — aggregate projected-coordinate bounds
    * with a crop fraction (sampling/domain.py:68-160's 0.95 crop). */
  def fromData(px: DataFrame, xCol: Column, yCol: Column, crop: Double = 0.95): DataFrame =
    px.agg(
      (min(xCol) * crop).as("x_min"), (max(xCol) * crop).as("x_max"),
      (min(yCol) * crop).as("y_min"), (max(yCol) * crop).as("y_max"))

  /** P4: spherical centroid of a lat/lon point set — mean of unit vectors
    * then atan2 back to angles (sampling/domain.py:163-225
    * `_calc_latlon_center`). Pure aggregate + scalar math; the padded
    * extent (l + 2*tile_size margin, pipeline/tiles.py:138-171) is left to
    * the caller, which has the tile size. */
  def sphericalCentroid(points: DataFrame, latCol: Column, lonCol: Column): DataFrame = {
    val lat = latCol * Projection.RadPerDeg
    val lon = lonCol * Projection.RadPerDeg
    points.agg(
      avg(cos(lat) * cos(lon)).as("mx"),
      avg(cos(lat) * sin(lon)).as("my"),
      avg(sin(lat)).as("mz"))
      .select(
        (atan2(col("mz"), sqrt(col("mx") * col("mx") + col("my") * col("my")))
          * Projection.DegPerRad).as("center_lat"),
        (atan2(col("my"), col("mx")) * Projection.DegPerRad).as("center_lon"))
  }

  /** R5: ERA5 dateline wrap — lon > 180 -> lon - 360
    * (aux_fields/datasources/era5.py:66-77; no roll needed relationally). */
  def wrapLon(lon: Column): Column = when(lon > 180.0, lon - 360.0).otherwise(lon)
}

object Projection {
  val EarthRadiusM = 6371007.181
  /** π/180 as a fixed double literal (see class doc). */
  val RadPerDeg: Double = 0.017453292519943295
  val DegPerRad: Double = 57.29577951308232

  private def rad(c: Column): Column = c * RadPerDeg
  private def deg(c: Column): Column = c * DegPerRad

  /** Angular distance c from the projection center (radians). */
  private def angDist(lat: Column, lon: Column, lat0: Double, lon0: Double): Column = {
    val phi = rad(lat); val lam = rad(lon)
    val sinPhi0 = math.sin(lat0 * RadPerDeg); val cosPhi0 = math.cos(lat0 * RadPerDeg)
    acos(lit(sinPhi0) * sin(phi) + lit(cosPhi0) * cos(phi) * cos(lam - lit(lon0 * RadPerDeg)))
  }

  /** Forward azimuthal-equidistant: (lat, lon) degrees -> x meters east. */
  def projX(lat: Column, lon: Column, lat0: Double, lon0: Double): Column = {
    val phi = rad(lat); val lam = rad(lon)
    val c = angDist(lat, lon, lat0, lon0)
    val k = when(c === 0.0, lit(1.0)).otherwise(c / sin(c))
    lit(EarthRadiusM) * k * cos(phi) * sin(lam - lit(lon0 * RadPerDeg))
  }

  /** Forward azimuthal-equidistant: (lat, lon) degrees -> y meters north. */
  def projY(lat: Column, lon: Column, lat0: Double, lon0: Double): Column = {
    val phi = rad(lat); val lam = rad(lon)
    val sinPhi0 = math.sin(lat0 * RadPerDeg); val cosPhi0 = math.cos(lat0 * RadPerDeg)
    val c = angDist(lat, lon, lat0, lon0)
    val k = when(c === 0.0, lit(1.0)).otherwise(c / sin(c))
    lit(EarthRadiusM) * k * (lit(cosPhi0) * sin(phi) - lit(sinPhi0) * cos(phi) * cos(lam - lit(lon0 * RadPerDeg)))
  }

  /** Inverse: (x, y) meters -> latitude degrees. */
  def invLat(x: Column, y: Column, lat0: Double, lon0: Double): Column = {
    val rho = sqrt(x * x + y * y)
    val c = rho / EarthRadiusM
    val sinPhi0 = math.sin(lat0 * RadPerDeg); val cosPhi0 = math.cos(lat0 * RadPerDeg)
    when(rho === 0.0, lit(lat0)).otherwise(
      deg(asin(cos(c) * sinPhi0 + y * sin(c) * lit(cosPhi0) / rho)))
  }

  /** Inverse: (x, y) meters -> longitude degrees. */
  def invLon(x: Column, y: Column, lat0: Double, lon0: Double): Column = {
    val rho = sqrt(x * x + y * y)
    val c = rho / EarthRadiusM
    val sinPhi0 = math.sin(lat0 * RadPerDeg); val cosPhi0 = math.cos(lat0 * RadPerDeg)
    when(rho === 0.0, lit(lon0)).otherwise(
      lit(lon0) + deg(atan2(x * sin(c), rho * lit(cosPhi0) * cos(c) - y * lit(sinPhi0) * sin(c))))
  }

  /** Spatial bucketing key: km-scale cell id (exact `floor` on meters).
    * This is the partition/bucket column for J6-style spatial joins. */
  def cellId(coordM: Column, cellSizeM: Double): Column =
    floor(coordM / cellSizeM).cast("long")
}
