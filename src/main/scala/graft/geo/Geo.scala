package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-vector spherical geodesy as Catalyst `Column` combinators.
  *
  * Same math as the reference's Veness n-vector library
  * (/root/reference/LatLon.py, /root/reference/Vector3d.py) but built
  * entirely from `org.apache.spark.sql.functions` trig primitives so
  * every expression participates in whole-stage codegen — no UDFs.
  *
  * Points are (lat, lon) Column pairs in degrees; n-vectors are
  * transient `struct<x,y,z>` columns that Catalyst never materializes
  * unless selected.
  */
object Geo {

  /** Circular heading difference in [0, 180]
    * (reference FlightAnalysis.py:130-132).
    */
  def headingDifference(h1: Column, h2: Column): Column =
    lit(180d) - abs(abs(h1 - h2) - lit(180d))

  // ---- n-vector algebra on struct<x,y,z> (reference Vector3d.py) ----

  def vec(x: Column, y: Column, z: Column): Column =
    struct(x.as("x"), y.as("y"), z.as("z"))

  private def vx(v: Column) = v.getField("x")
  private def vy(v: Column) = v.getField("y")
  private def vz(v: Column) = v.getField("z")

  def vPlus(a: Column, b: Column): Column =
    vec(vx(a) + vx(b), vy(a) + vy(b), vz(a) + vz(b))

  def vTimes(a: Column, k: Column): Column =
    vec(vx(a) * k, vy(a) * k, vz(a) * k)

  def vDot(a: Column, b: Column): Column =
    vx(a) * vx(b) + vy(a) * vy(b) + vz(a) * vz(b)

  def vCross(a: Column, b: Column): Column = vec(
    vy(a) * vz(b) - vz(a) * vy(b),
    vz(a) * vx(b) - vx(a) * vz(b),
    vx(a) * vy(b) - vy(a) * vx(b)
  )

  def vLength(a: Column): Column = sqrt(vDot(a, a))

  def vUnit(a: Column): Column = {
    val n = vLength(a)
    // No-op on zero/unit length like GeoS.Vec.unit (and the reference
    // Vector3d.unit) so degenerate inputs give (0,0,0), not NaN.
    when(n === lit(0d) || n === lit(1d), a)
      .otherwise(vec(vx(a) / n, vy(a) / n, vz(a) / n))
  }

  /** Unsigned angle between two vectors (reference Vector3d.py:155-172). */
  def vAngleTo(a: Column, b: Column): Column =
    atan2(vLength(vCross(a, b)), vDot(a, b))

  /** Signed angle: sign taken from the sign reference vector. */
  def vAngleToSigned(a: Column, b: Column, sign: Column): Column = {
    val s = vLength(vCross(a, b))
    atan2(when(vDot(vCross(a, b), sign) < 0, -s).otherwise(s), vDot(a, b))
  }

  // ---- LatLon <-> n-vector (reference LatLon.py:51-69,246-263) ----

  /** lat/lon degrees -> unit n-vector struct<x,y,z>. */
  def toVector(lat: Column, lon: Column): Column = {
    val rLat = radians(lat)
    val rLon = radians(lon)
    vec(cos(rLat) * cos(rLon), cos(rLat) * sin(rLon), sin(rLat))
  }

  /** n-vector -> struct<lat,lon> degrees. */
  def toLatLon(v: Column): Column = struct(
    degrees(atan2(vz(v), sqrt(vx(v) * vx(v) + vy(v) * vy(v)))).as("lat"),
    degrees(atan2(vy(v), vx(v))).as("lon")
  )

  /** N-vector normal to the great circle from a point on a bearing
    * (reference LatLon.py:71-93).
    */
  def greatCircle(lat: Column, lon: Column, bearing: Column): Column = {
    val rLat = radians(lat)
    val rLon = radians(lon)
    val th = radians(bearing)
    vec(
      sin(rLon) * cos(th) - sin(rLat) * cos(rLon) * sin(th),
      -cos(rLon) * cos(th) - sin(rLat) * sin(rLon) * sin(th),
      cos(rLat) * sin(th)
    )
  }

  /** Great-circle distance, in the units of `radius`
    * (reference LatLon.py:95-117; called with R=3959 mi for the
    * approach gate, FlightAnalysis.py:5,147).
    */
  def distanceTo(lat1: Column, lon1: Column, lat2: Column, lon2: Column, radius: Column): Column =
    vAngleTo(toVector(lat1, lon1), toVector(lat2, lon2)) * radius

  /** Initial bearing from point 1 to point 2, degrees 0..360
    * (reference LatLon.py:119-143).
    */
  def bearingTo(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = toVector(lat1, lon1)
    val p2 = toVector(lat2, lon2)
    val north = vec(lit(0d), lit(0d), lit(1d))
    val c1 = vCross(p1, p2)
    val c2 = vCross(p1, north)
    pmod(degrees(vAngleToSigned(c1, c2, p1)) + lit(360d), lit(360d))
  }

  /** Midpoint of two points -> struct<lat,lon>
    * (reference LatLon.py:145-163).
    */
  def midpointTo(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    toLatLon(vUnit(vPlus(toVector(lat1, lon1), toVector(lat2, lon2))))

  /** Destination point after `distance` on `bearing` -> struct<lat,lon>
    * (reference LatLon.py:165-194).
    */
  def destinationPoint(lat: Column, lon: Column, distance: Column, bearing: Column, radius: Column): Column = {
    val delta = distance / radius
    val c = greatCircle(lat, lon, bearing)
    val p1 = toVector(lat, lon)
    val x = vTimes(p1, cos(delta))
    val y = vTimes(vCross(c, p1), sin(delta))
    toLatLon(vUnit(vPlus(x, y)))
  }

  /** Signed cross-track distance from a point to the great circle
    * through (startLat, startLon) on `bearing`; negative = left of
    * path (reference LatLon.py:196-231; called with R in feet via the
    * runway centerline, FlightAnalysis.py:6,332-345).
    */
  def crossTrackDistanceTo(
      lat: Column, lon: Column,
      startLat: Column, startLon: Column,
      bearing: Column, radius: Column): Column = {
    val p = toVector(lat, lon)
    val gc = greatCircle(startLat, startLon, bearing)
    val alpha0 = vAngleToSigned(gc, p, vCross(p, gc))
    val halfPi = lit(math.Pi / 2)
    val alpha = when(alpha0 < 0, -halfPi - alpha0).otherwise(halfPi - alpha0)
    alpha * radius
  }

  /** Two-point form of cross-track distance (reference LatLon.py:219-222). */
  def crossTrackDistanceToPath(
      lat: Column, lon: Column,
      startLat: Column, startLon: Column,
      endLat: Column, endLon: Column, radius: Column): Column = {
    val p = toVector(lat, lon)
    val gc = vCross(toVector(startLat, startLon), toVector(endLat, endLon))
    val alpha0 = vAngleToSigned(gc, p, vCross(p, gc))
    val halfPi = lit(math.Pi / 2)
    val alpha = when(alpha0 < 0, -halfPi - alpha0).otherwise(halfPi - alpha0)
    alpha * radius
  }

  /** Height above ground level: MSL altitude minus airport elevation
    * (reference FlightAnalysis.py:122,148).
    */
  def agl(mslAltitude: Column, airportAlt: Column): Column = mslAltitude - airportAlt

  /** G14: "(lat, lon)" string form of a point (reference
    * LatLon.py:42-49 `__str__`; Python `{0:5f}` = `%f`, six decimal
    * places). Java's `%f` and C printf's `%f` agree on these doubles,
    * so the DuckDB oracle replays it with `printf`.
    */
  def formatLatLon(lat: Column, lon: Column): Column =
    format_string("(%f, %f)", lat, lon)
}

/** Plain-Scala twins of [[Geo]] for use inside the typed per-flight
  * state machine (graft.approach) — identical formulas, identical
  * IEEE-754 double arithmetic order, so the two paths agree bitwise.
  */
object GeoS {
  import math._

  final case class Vec(x: Double, y: Double, z: Double) {
    def plus(v: Vec): Vec = Vec(x + v.x, y + v.y, z + v.z)
    def times(k: Double): Vec = Vec(x * k, y * k, z * k)
    def dot(v: Vec): Double = x * v.x + y * v.y + z * v.z
    def cross(v: Vec): Vec =
      Vec(y * v.z - z * v.y, z * v.x - x * v.z, x * v.y - y * v.x)
    def length: Double = sqrt(x * x + y * y + z * z)
    def unit: Vec = {
      val n = length
      if (n == 1 || n == 0) this else Vec(x / n, y / n, z / n)
    }
    def angleTo(v: Vec): Double = atan2(cross(v).length, dot(v))
    def angleTo(v: Vec, sign: Vec): Double = {
      val s0 = cross(v).length
      val s = if (cross(v).dot(sign) < 0) -s0 else s0
      atan2(s, dot(v))
    }
    def toLatLon: (Double, Double) =
      (toDegrees(atan2(z, sqrt(x * x + y * y))), toDegrees(atan2(y, x)))
  }

  def headingDifference(h1: Double, h2: Double): Double =
    180d - abs(abs(h1 - h2) - 180d)

  def toVector(lat: Double, lon: Double): Vec = {
    val rLat = toRadians(lat)
    val rLon = toRadians(lon)
    Vec(cos(rLat) * cos(rLon), cos(rLat) * sin(rLon), sin(rLat))
  }

  def greatCircle(lat: Double, lon: Double, bearing: Double): Vec = {
    val rLat = toRadians(lat)
    val rLon = toRadians(lon)
    val th = toRadians(bearing)
    Vec(
      sin(rLon) * cos(th) - sin(rLat) * cos(rLon) * sin(th),
      -cos(rLon) * cos(th) - sin(rLat) * sin(rLon) * sin(th),
      cos(rLat) * sin(th)
    )
  }

  def distanceTo(lat1: Double, lon1: Double, lat2: Double, lon2: Double, radius: Double): Double =
    toVector(lat1, lon1).angleTo(toVector(lat2, lon2)) * radius

  def bearingTo(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val p1 = toVector(lat1, lon1)
    val p2 = toVector(lat2, lon2)
    val c1 = p1.cross(p2)
    val c2 = p1.cross(Vec(0, 0, 1))
    val b = toDegrees(c1.angleTo(c2, p1))
    (b + 360) % 360
  }

  def midpointTo(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double) =
    toVector(lat1, lon1).plus(toVector(lat2, lon2)).unit.toLatLon

  def destinationPoint(lat: Double, lon: Double, distance: Double, bearing: Double, radius: Double): (Double, Double) = {
    val delta = distance / radius
    val c = greatCircle(lat, lon, bearing)
    val p1 = toVector(lat, lon)
    val x = p1.times(cos(delta))
    val y = c.cross(p1).times(sin(delta))
    x.plus(y).unit.toLatLon
  }

  def crossTrackDistanceTo(
      lat: Double, lon: Double,
      startLat: Double, startLon: Double,
      bearing: Double, radius: Double): Double = {
    val p = toVector(lat, lon)
    val gc = greatCircle(startLat, startLon, bearing)
    val a0 = gc.angleTo(p, p.cross(gc))
    val alpha = if (a0 < 0) -Pi / 2 - a0 else Pi / 2 - a0
    alpha * radius
  }

  def crossTrackDistanceToPath(
      lat: Double, lon: Double,
      startLat: Double, startLon: Double,
      endLat: Double, endLon: Double, radius: Double): Double = {
    val p = toVector(lat, lon)
    val gc = toVector(startLat, startLon).cross(toVector(endLat, endLon))
    val a0 = gc.angleTo(p, p.cross(gc))
    val alpha = if (a0 < 0) -Pi / 2 - a0 else Pi / 2 - a0
    alpha * radius
  }
}
