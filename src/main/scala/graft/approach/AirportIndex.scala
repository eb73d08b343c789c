package graft.approach

import graft.model.{Airport, Runway}

/** Exact L1 (degree-space) nearest-airport index.
  *
  * The reference scans all ~15k airports per queried sample
  * (FlightAnalysis.py:347-367 — argmin of |dLat|+|dLon| in raw
  * degrees). That linear scan is O(A) per sample; at 100 TB of 1 Hz
  * samples it dominates. This index buckets airports into a uniform
  * lat/lon grid and searches expanding Chebyshev rings of cells,
  * stopping once the best-so-far L1 distance can no longer be beaten
  * by any unexplored ring — exact, not approximate: any point in a
  * cell at ring k has L1 distance >= (k-1)*cellDeg from the query, so
  * after finishing ring k the result is final if best <= k*cellDeg.
  *
  * Ties are broken by insertion index (deterministic; the reference's
  * "first in dict-iteration order wins" is nondeterministic across
  * Python processes, so we pin a total order instead).
  */
final class AirportIndex(val airports: Array[Airport], cellDeg: Double = 2.0)
    extends Serializable {

  private val cells: Map[(Int, Int), Array[Int]] =
    airports.indices
      .groupBy(i => cellOf(airports(i).lat, airports(i).lon))
      .map { case (k, v) => (k, v.toArray) }

  private def cellOf(lat: Double, lon: Double): (Int, Int) =
    (math.floor(lat / cellDeg).toInt, math.floor(lon / cellDeg).toInt)

  // Occupied-cell bounding box; the per-query ring bound is the
  // Chebyshev distance from the query cell to the farthest bbox corner
  // (covers every occupied cell even when the query lies far outside
  // the grid — the round-1 span-based bound crashed on such points).
  private val (minR, maxR, minC, maxC): (Int, Int, Int, Int) = {
    if (cells.isEmpty) (0, 0, 0, 0)
    else {
      val ks = cells.keys
      (ks.map(_._1).min, ks.map(_._1).max, ks.map(_._2).min, ks.map(_._2).max)
    }
  }

  /** L1 distance in raw degrees (reference FlightAnalysis.py:355-357). */
  @inline private def l1(a: Airport, lat: Double, lon: Double): Double =
    math.abs(a.lat - lat) + math.abs(a.lon - lon)

  /** Exact nearest airport by L1 degree distance. */
  def nearest(lat: Double, lon: Double): Airport = {
    require(airports.nonEmpty, "empty airport index")
    val (cr, cc) = cellOf(lat, lon)
    // Last ring that can contain an occupied cell, from THIS query cell.
    val maxRing = math.max(
      math.max(math.abs(cr - minR), math.abs(maxR - cr)),
      math.max(math.abs(cc - minC), math.abs(maxC - cc)))
    var bestIdx = -1
    var bestDist = Double.MaxValue
    var ring = 0
    var done = false
    while (!done && ring <= maxRing) {
      // scan cells on the Chebyshev ring boundary
      var dr = -ring
      while (dr <= ring) {
        val dcs: Seq[Int] =
          if (math.abs(dr) == ring) -ring to ring
          else Seq(-ring, ring)
        dcs.foreach { dc =>
          cells.get((cr + dr, cc + dc)).foreach { idxs =>
            var j = 0
            while (j < idxs.length) {
              val idx = idxs(j)
              val d = l1(airports(idx), lat, lon)
              if (d < bestDist || (d == bestDist && idx < bestIdx)) {
                bestDist = d
                bestIdx = idx
              }
              j += 1
            }
          }
        }
        dr += 1
      }
      // Strict '<': a point in ring k+1 has L1 >= k*cellDeg, so stopping
      // only when bestDist < ring*cellDeg also rules out exact ties in
      // unexplored rings (preserves the documented lowest-index tie order).
      if (bestIdx >= 0 && bestDist < ring * cellDeg) done = true
      ring += 1
    }
    if (bestIdx < 0) nearestBrute(lat, lon) else airports(bestIdx)
  }

  /** Brute-force argmin — the reference's algorithm verbatim; used to
    * cross-check the grid index in tests.
    */
  def nearestBrute(lat: Double, lon: Double): Airport = {
    var bestIdx = 0
    var bestDist = l1(airports(0), lat, lon)
    var i = 1
    while (i < airports.length) {
      val d = l1(airports(i), lat, lon)
      if (d < bestDist) { bestDist = d; bestIdx = i }
      i += 1
    }
    airports(bestIdx)
  }

  /** Predicated nearest runway at an airport: among runways whose
    * circular heading difference to the airplane heading is within
    * `selectionDeg`, the L1-closest; None if none qualify
    * (reference FlightAnalysis.py:369-391).
    */
  def nearestRunway(
      airport: Airport,
      lat: Double,
      lon: Double,
      airplaneHdg: Double,
      selectionDeg: Double): Option[Runway] = {
    var best: Runway = null
    var bestDist = 0.0
    airport.runways.foreach { r =>
      if (180d - math.abs(math.abs(r.magHeading - airplaneHdg) - 180d) <= selectionDeg) {
        val d = math.abs(r.lat - lat) + math.abs(r.lon - lon)
        if (best == null || d < bestDist) {
          best = r
          bestDist = d
        }
      }
    }
    Option(best)
  }
}
