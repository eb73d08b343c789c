package graft.model

/** Core data model for the flight-approach analytics engine.
  *
  * Re-expresses the reference's object model (see /root/reference:
  * Airport.py:6-18, Runway.py:6-13, main.py:29-37,
  * FlightAnalysis.py:5-18,22-26) as Spark-encodable case classes.
  */

/** One 1 Hz sensor sample of a flight (reference main.py:29-37).
  * `time` is a numeric sample index, ordered ASC within a flight.
  */
final case class FlightSample(
    flight: Long,
    time: Long,
    msl_altitude: Double,
    indicated_airspeed: Double,
    vertical_airspeed: Double,
    heading: Double,
    latitude: Double,
    longitude: Double,
    pitch_attitude: Double,
    eng_1_rpm: Double
)

/** Runway dimension row (reference Runway.py:6-13).
  * `elevationFt` carries the *correct* field-elevation (the reference
  * passes CSV index 6 = latitude by mistake, main.py:181; the value is
  * never read so we store the real one).
  */
final case class Runway(
    airportCode: String,
    runwayCode: String,
    magHeading: Double,
    trueHeading: Double,
    lat: Double,
    lon: Double,
    elevationFt: Double
)

/** Airport dimension row with nested runways (reference Airport.py:6-18). */
final case class Airport(
    code: String,
    name: String,
    city: String,
    state: String,
    lat: Double,
    lon: Double,
    alt: Double,
    runways: Seq[Runway]
)

/** Exceedance thresholds (reference FlightAnalysis.py:5-18).
  * Defaults are the module-level constants; the per-aircraft override
  * table is dead code in the reference (FlightAnalysis.py:52,67-83).
  */
final case class Thresholds(
    earthRadiusMiles: Double = 3959,
    earthRadiusFeet: Double = 20900000,
    approachMinIas: Double = 55,
    approachMaxIas: Double = 75,
    approachMaxHeadingError: Double = 10,
    approachMinVsi: Double = -1000,
    approachMaxCrosstrackError: Double = 50,
    approachMinDistance: Double = 1,
    approachMinAltitudeAgl: Double = 500,
    approachFinalMaxAltitudeAgl: Double = 150,
    approachFinalMinAltitudeAgl: Double = 50,
    fullStopSpeedIndicator: Double = 35,
    touchAndGoElevationIndicator: Double = 5,
    runwaySelectionIndicator: Double = 20
)

/** A contiguous run of unstable samples inside a final-approach window
  * (reference FlightAnalysis.py:223-226,248-250): sample indices.
  */
final case class UnstableInterval(start: Long, end: Long)

/** One detected approach — the 18-column `approaches` sink row
  * (reference FlightAnalysis.py:22-26,400-421) plus the unstable
  * interval list the reference keeps in memory.
  */
final case class Approach(
    flight_id: Long,
    approach_id: Int, // 1-based within flight (FlightAnalysis.py:404)
    airport_id: String,
    runway_id: Option[String],
    approach_start: Long,
    approach_end: Long,
    landing_start: Long,
    landing_end: Long,
    landing_type: String, // stop-and-go | touch-and-go | go-around
    unstable: Int, // 1 if any unstable interval (FlightAnalysis.py:412)
    all_heading: Option[Double],
    f1_heading: Option[Double],
    all_crosstrack: Option[Double],
    f2_crosstrack: Option[Double],
    all_ias: Option[Double],
    a_ias: Option[Double],
    all_vsi: Option[Double],
    s_vsi: Option[Double],
    unstable_intervals: Seq[UnstableInterval]
)
