package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measured shuffle volume for one action (bytes/records written to
  * and read from the shuffle system, summed over every task the
  * action ran).
  */
case class ShuffleStats(writeBytes: Long, writeRecords: Long,
    readBytes: Long, readRecords: Long)

/** Measures the ACTUAL shuffle traffic of a query, to back the plan
  * assertions in PlanSpec with numbers: a plan can look right (one
  * Exchange node) and still move the whole fact table through it.
  * ShuffleBudgetSpec pins each headline query's measured volume to
  * the budget its design claims (digests-only, pruned-fact, one data
  * shuffle), so a regression that silently widens a shuffle fails a
  * test even when the plan SHAPE is unchanged.
  *
  * Mechanics: the action runs inside a uniquely-tagged job group;
  * a listener records which stages belong to the tagged jobs and
  * sums `shuffleWriteMetrics`/`shuffleReadMetrics` over exactly
  * those stages' tasks — concurrent work on the shared session (test
  * suites run in parallel in one JVM) is not attributed. Job-group
  * properties are thread-local and Spark captures them onto AQE's
  * stage-submission threads, so adaptive stage jobs stay tagged.
  * The listener bus is asynchronous but FIFO: a job's TaskEnds
  * precede its JobEnd, and by the time the (blocking) action
  * returns, every event is already POSTED — so the poll waits until
  * the listener has seen a JobEnd for every tagged JobStart (all
  * task metrics before them are then summed) plus a stability
  * window. Undercounting must be LOUD, not a smaller number: a
  * budget test reading partial stats would pass spuriously —
  * timing out before the bus drains throws instead of returning.
  */
object ShuffleMeter {

  def measure(spark: SparkSession)(action: => Unit): ShuffleStats = {
    val tag = s"shuffle-meter-${java.util.UUID.randomUUID()}"
    val stages = ConcurrentHashMap.newKeySet[Int]()
    val taggedJobs = ConcurrentHashMap.newKeySet[Int]()
    val endedJobs = new AtomicLong
    val wb = new AtomicLong; val wr = new AtomicLong
    val rb = new AtomicLong; val rr = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (e.properties != null &&
            tag == e.properties.getProperty("spark.jobGroup.id")) {
          taggedJobs.add(e.jobId)
          e.stageIds.foreach(id => stages.add(id))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (taggedJobs.contains(e.jobId)) endedJobs.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && stages.contains(e.stageId)) {
          wb.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          wr.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          rb.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          rr.addAndGet(m.shuffleReadMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(tag, "shuffle-meter measurement",
      interruptOnCancel = false)
    try {
      action
      // all events are posted by now (the action blocks on its jobs);
      // drain: every tagged job's JobEnd processed + a quiet window
      // against the bus momentarily pausing between queued events
      def total() = wb.get + wr.get + rb.get + rr.get +
        taggedJobs.size.toLong + endedJobs.get
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var prev = -1L
      var cur = total()
      while ((taggedJobs.size.toLong != endedJobs.get || cur != prev) &&
          System.nanoTime() < deadline) {
        Thread.sleep(150)
        prev = cur
        cur = total()
      }
      if (taggedJobs.size.toLong != endedJobs.get)
        throw new IllegalStateException(
          s"listener bus did not drain: ${endedJobs.get} of " +
            s"${taggedJobs.size} tagged jobs ended — stats would " +
            "undercount, refusing to return them")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    ShuffleStats(wb.get, wr.get, rb.get, rr.get)
  }
}
