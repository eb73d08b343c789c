package graft.approach

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.{FlightSample, Thresholds, UnstableInterval}
import graft.sources.{Dims, FlightGen}

/** Golden tests of the approach/landing state machine over the
  * engineered [[FlightGen]] traces (SURVEY.md §5 item 3): each flavor
  * and violation encoding (flight % 3 landing type; % 5/7/11/13 =
  * A/S/F1/F2 violations) yields exact, hand-verified approach rows.
  */
class ApproachDetectorSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Materialized samples for flights 0..14 of the generator. */
  private lazy val byFlight: Map[Long, IndexedSeq[FlightSample]] = {
    import spark.implicits._
    val df = spark.range(15).toDF("flight")
    FlightGen.trace(df).as[FlightSample].collect()
      .groupBy(_.flight).map { case (f, xs) =>
        f -> xs.sortBy(_.time).toIndexedSeq
      }
  }

  private val detector =
    new ApproachDetector(new AirportIndex(Dims.syntheticAirports()))

  private def one(f: Long) = {
    val as = detector.detect(f, byFlight(f))
    assert(as.length == 1, s"flight $f expected exactly one approach")
    as.head
  }

  test("clean stop-and-go flight (3): exact golden row") {
    val a = one(3)
    assert(a.approach_id == 1)
    assert(a.airport_id == "AP04")
    assert(a.runway_id.contains("09"))
    assert(a.approach_start == 424)
    assert(a.approach_end == 479)
    assert(a.landing_start == 479)
    assert(a.landing_end == 599)
    assert(a.landing_type == "stop-and-go")
    assert(a.unstable == 0)
    assert(a.unstable_intervals.isEmpty)
    assert(a.f1_heading.isEmpty && a.f2_crosstrack.isEmpty &&
      a.a_ias.isEmpty && a.s_vsi.isEmpty)
    assert(a.all_ias.exists(v => math.abs(v - 65.0) < 1e-9))
    assert(a.all_vsi.exists(v => math.abs(v - -700.0) < 1e-9))
    assert(a.all_heading.exists(v => math.abs(v) < 1e-9))
  }

  test("touch-and-go flight (1): label + landing window") {
    val a = one(1)
    assert(a.landing_type == "touch-and-go")
    assert(a.approach_end == 479)
    // climbs out at 50 ft/sample from t=520 -> crosses 500 AGL at 530
    assert(a.landing_end == 530)
  }

  test("go-around flight (2): label + early exit of final window") {
    val a = one(2)
    assert(a.landing_type == "go-around")
    // climb starts at t=461; hAGL exceeds 150 -> window closes at 467
    assert(a.approach_end == 467)
    assert(a.landing_end == 502)
  }

  test("A-violation flight (5): IAS 80 kt burst 430-437 only") {
    val a = one(5)
    assert(a.unstable == 1)
    assert(a.a_ias.exists(v => math.abs(v - 80.0) < 1e-9))
    assert(a.f1_heading.isEmpty && a.f2_crosstrack.isEmpty && a.s_vsi.isEmpty)
    assert(a.unstable_intervals == Seq(UnstableInterval(430, 437)))
  }

  test("S-violation flight (7): VSI -1200 fpm burst 440-445") {
    val a = one(7)
    assert(a.unstable == 1)
    assert(a.s_vsi.exists(v => math.abs(v - -1200.0) < 1e-9))
    assert(a.unstable_intervals == Seq(UnstableInterval(440, 445)))
  }

  test("F1-violation flight (11): heading 105 deg burst 448-452") {
    val a = one(11)
    assert(a.unstable == 1)
    assert(a.f1_heading.exists(v => math.abs(v - 15.0) < 1e-9))
    assert(a.unstable_intervals == Seq(UnstableInterval(448, 452)))
  }

  test("F2-violation flight (13): constant cross-track offset") {
    val a = one(13)
    assert(a.unstable == 1)
    // 0.0003 deg lateral offset ~ 109 ft, beyond the 50 ft gate
    assert(a.f2_crosstrack.exists(v => math.abs(v) > 50))
    // violated on every final-window sample -> one long interval; the
    // W4 one-sample lag means the first evaluated position is t=424's
    assert(a.unstable_intervals.length == 1)
    assert(a.unstable_intervals.head.start == 425)
  }

  test("flight 0 (divisible by all): every violation list populated") {
    val a = one(0)
    assert(a.unstable == 1)
    assert(a.f1_heading.nonEmpty && a.f2_crosstrack.nonEmpty &&
      a.a_ias.nonEmpty && a.s_vsi.nonEmpty)
  }

  test("degenerate inputs: empty flight and never-airborne flight") {
    assert(detector.detect(99, IndexedSeq.empty).isEmpty)
    val taxi = (0L until 100L).map { t =>
      FlightSample(99, t, 800.0, 5.0, 0.0, 90.0, 40.0, -100.0, 0.0, 900.0)
    }
    assert(detector.detect(99, taxi).isEmpty)
  }

  test("mean semantics: empty value lists stay NULL (G13)") {
    val a = one(3)
    assert(a.a_ias.isEmpty) // no A violations -> NULL, not 0
  }
}
