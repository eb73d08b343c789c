package graft.approach

import scala.collection.mutable.ArrayBuffer

import graft.geo.GeoS
import graft.model._

/** The flight-approach state machine — the one genuinely custom
  * operator in this engine (SURVEY.md §2.5 W1-W8, §2.10).
  *
  * Faithful re-encoding of the reference's sequential per-flight scan
  * (/root/reference/FlightAnalysis.py:46-330), including its
  * *documented* quirks, so golden outputs are stable:
  *   - takeoff airport detected only at sample 0 (py:120-121);
  *   - outer approach scan advances with stride 15 (py:268);
  *   - descent/final window off-by-ones: start = i-1 (py:170),
  *     end = start if the final window is empty else i-1 (py:246);
  *   - one-sample lag: inside the final window, position-derived
  *     values (cross-track, distance, hAGL) come from the *previous*
  *     sample while heading/IAS/VSI come from the current one
  *     (py:188-196 vs 238-241);
  *   - rolling-mean warm-up: touch-and-go can't fire before 6 landing
  *     samples and full-stop is checked first (py:283,288-306);
  *   - landing scan stops at n-1, not n (py:287).
  *
  * Output indices (`approach_start` etc.) are the `time` values of the
  * corresponding samples, which equal the reference's array indices
  * when `time` is the 0-based sample index.
  */
final class ApproachDetector(
    index: AirportIndex,
    th: Thresholds = Thresholds()
) extends Serializable {

  import th._

  /** Detect all approaches in one flight's time-ordered samples. */
  def detect(flightId: Long, data: IndexedSeq[FlightSample]): Seq[Approach] = {
    val n = data.length
    if (n == 0) return Nil
    val out = ArrayBuffer.empty[Approach]
    var approachId = 0

    // --- findInitialTakeOff (py:113-128) ---
    var i = 0
    val takeoffAirport = index.nearest(data(0).latitude, data(0).longitude)
    var hAGL = data(0).msl_altitude - takeoffAirport.alt
    while (hAGL < approachMinAltitudeAgl && i < n) {
      hAGL = data(i).msl_altitude - takeoffAirport.alt
      i += 1
    }

    // --- analyzeApproaches (py:134-270) ---
    while (i < n) {
      var msl = data(i).msl_altitude
      var lat = data(i).latitude
      var lon = data(i).longitude
      val airport = index.nearest(lat, lon) // re-detected per outer sample (py:146)
      var distance =
        GeoS.distanceTo(lat, lon, airport.lat, airport.lon, earthRadiusMiles)
      hAGL = msl - airport.alt

      if (distance < approachMinDistance && hAGL < approachMinAltitudeAgl) {
        approachId += 1

        // descent window: advance while 150 < hAGL < 500 (py:163-168)
        while (hAGL > approachFinalMaxAltitudeAgl &&
          hAGL < approachMinAltitudeAgl && i < n) {
          msl = data(i).msl_altitude
          hAGL = msl - airport.alt
          i += 1
        }
        val start = i - 1

        val startHdg = data(start).heading
        lat = data(start).latitude
        lon = data(start).longitude
        val runway =
          index.nearestRunway(airport, lat, lon, startHdg, runwaySelectionIndicator)

        // final-approach window (py:187-246)
        val tempRun = ArrayBuffer.empty[Long]
        val intervals = ArrayBuffer.empty[UnstableInterval]
        val f1 = ArrayBuffer.empty[Double]
        val f2 = ArrayBuffer.empty[Double]
        val aV = ArrayBuffer.empty[Double]
        val sV = ArrayBuffer.empty[Double]
        val allHdg = ArrayBuffer.empty[Double]
        val allCtr = ArrayBuffer.empty[Double]
        val allIas = ArrayBuffer.empty[Double]
        val allVsi = ArrayBuffer.empty[Double]

        while (distance < approachMinDistance &&
          hAGL <= approachFinalMaxAltitudeAgl &&
          hAGL >= approachFinalMinAltitudeAgl && i < n) {
          val hdg = data(i).heading
          val ias = data(i).indicated_airspeed
          val vsi = data(i).vertical_airspeed

          var headingError = 0d
          var crossTrack = 0d
          var condF1 = true
          var condF2 = true
          runway.foreach { r =>
            headingError = 180d - math.abs(math.abs(r.magHeading - hdg) - 180d)
            condF1 = headingError <= approachMaxHeadingError
            // note: lat/lon here lag one sample behind hdg/ias/vsi
            crossTrack = GeoS.crossTrackDistanceTo(
              lat, lon, r.lat, r.lon, r.trueHeading, earthRadiusFeet)
            condF2 = math.abs(crossTrack) <= approachMaxCrosstrackError
          }
          val condA = ias >= approachMinIas && ias <= approachMaxIas
          val condS = vsi >= approachMinVsi

          if (!(condF1 && condF2 && condA && condS)) {
            if (!condF1) f1 += headingError
            if (!condF2) f2 += crossTrack
            if (!condA) aV += ias
            if (!condS) sV += vsi
            tempRun += data(i).time
          } else if (tempRun.nonEmpty) {
            intervals += UnstableInterval(tempRun.head, tempRun.last)
            tempRun.clear()
          }

          if (runway.isDefined) {
            allHdg += headingError
            allCtr += crossTrack
          }
          allIas += ias
          allVsi += vsi

          msl = data(i).msl_altitude
          lat = data(i).latitude
          lon = data(i).longitude
          distance =
            GeoS.distanceTo(lat, lon, airport.lat, airport.lon, earthRadiusMiles)
          hAGL = msl - airport.alt
          i += 1
        }

        val end = if (start == i - 1) start else i - 1
        if (tempRun.nonEmpty)
          intervals += UnstableInterval(tempRun.head, tempRun.last)

        // --- analyzeLanding (py:272-330) ---
        val (landingEnd, fullStop, touchAndGo) = analyzeLanding(data, end, airport)
        val landingType =
          if (fullStop) "stop-and-go"
          else if (touchAndGo) "touch-and-go"
          else "go-around"

        def mean(xs: ArrayBuffer[Double]): Option[Double] =
          if (xs.isEmpty) None else Some(xs.sum / xs.length)

        out += Approach(
          flight_id = flightId,
          approach_id = approachId,
          airport_id = airport.code,
          runway_id = runway.map(_.runwayCode),
          approach_start = data(start).time,
          approach_end = data(end).time,
          landing_start = data(end).time,
          landing_end = data(landingEnd).time,
          landing_type = landingType,
          unstable = if (intervals.nonEmpty) 1 else 0,
          all_heading = mean(allHdg),
          f1_heading = mean(f1),
          all_crosstrack = mean(allCtr),
          f2_crosstrack = mean(f2),
          all_ias = mean(allIas),
          a_ias = mean(aV),
          all_vsi = mean(allVsi),
          s_vsi = mean(sV),
          unstable_intervals = intervals.toSeq
        )
        i = landingEnd
      }

      i += 15
    }
    out.toSeq
  }

  /** Landing segmentation (py:272-330). Returns (end index, fullStop,
    * touchAndGo); label precedence is applied by the caller.
    */
  private def analyzeLanding(
      data: IndexedSeq[FlightSample],
      start: Int,
      airport: Airport): (Int, Boolean, Boolean) = {
    val n = data.length
    var i = start
    var hAGL = data(i).msl_altitude - airport.alt
    val elevations = ArrayBuffer.empty[Double]
    var avgElevation = touchAndGoElevationIndicator + 1
    var fullStop = false
    var touchAndGo = false

    while (hAGL < approachMinAltitudeAgl && i < n - 1) {
      if (!fullStop) {
        val ias = data(i).indicated_airspeed
        if (ias <= fullStopSpeedIndicator) fullStop = true
        else if (avgElevation <= touchAndGoElevationIndicator) touchAndGo = true
      }
      i += 1
      hAGL = data(i).msl_altitude - airport.alt
      if (elevations.length < 5) {
        elevations += hAGL
      } else {
        elevations.remove(0)
        elevations += hAGL
        avgElevation = elevations.sum / elevations.length
      }
    }
    (i, fullStop, touchAndGo)
  }
}
