package graft.metrics

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Job-level metrics via SparkListener — the engine-grade counterpart of
  * the reference's MigrationResult counters and per-batch durations
  * (/root/reference/Models/MigrationResult.cs:38-65,84-87): records/sec,
  * task time, shuffle volume. Thread-safe accumulation (LongAdder)
  * replaces the reference's lock(result) pattern
  * (/root/reference/Services/MigrationService.cs:633-639). */
final class Metrics extends SparkListener {
  val stages = new LongAdder
  val tasks = new LongAdder
  val executorRunTimeMs = new LongAdder
  val shuffleReadBytes = new LongAdder
  val shuffleWriteBytes = new LongAdder
  val inputBytes = new LongAdder
  val spillBytes = new LongAdder
  val gcTimeMs = new LongAdder

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    stages.increment()
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      executorRunTimeMs.add(m.executorRunTime)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      inputBytes.add(m.inputMetrics.bytesRead)
      spillBytes.add(m.diskBytesSpilled)
      gcTimeMs.add(m.jvmGCTime)
    }
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = tasks.increment()

  val jobsStarted = new LongAdder
  val jobsEnded = new LongAdder
  override def onJobStart(js: SparkListenerJobStart): Unit = jobsStarted.increment()
  override def onJobEnd(je: SparkListenerJobEnd): Unit = jobsEnded.increment()

  def json: String =
    s"""{"stages":${stages.sum()},"tasks":${tasks.sum()},""" +
      s""""executorRunTimeMs":${executorRunTimeMs.sum()},""" +
      s""""shuffleReadBytes":${shuffleReadBytes.sum()},""" +
      s""""shuffleWriteBytes":${shuffleWriteBytes.sum()},""" +
      s""""inputBytes":${inputBytes.sum()},"spillBytes":${spillBytes.sum()}}"""
}

object Metrics {
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.sparkContext.addSparkListener(m)
    m
  }

  /** Input bytes read from sources by everything `f` executes — the
    * layout-v3 prune-ratio instrument (postings bytes READ by a served
    * query, before vs after clustering compaction). The listener bus is
    * asynchronous, so after `f` returns the count is polled until it
    * stays stable; bounded wait, then the best-known value. Scoped: the
    * listener detaches before returning. */
  def inputBytesDuring(spark: SparkSession)(f: => Unit): Long = {
    val m = new Metrics
    spark.sparkContext.addSparkListener(m)
    // Drained = the whole counter tuple unchanged across SEVERAL
    // consecutive polls AND no job still open (the bus is FIFO, so a
    // job's end event arrives after all its stage events — matching
    // start/end counts mean every started job's stages are counted).
    // A single quiet 100 ms gap must NOT end the wait: a hard bench
    // gate (the prune-factor floor) consumes this number, and a
    // delivery stall on a contended host would otherwise truncate it.
    def snapshot() =
      (m.inputBytes.sum(), m.stages.sum(), m.jobsStarted.sum(), m.jobsEnded.sum())
    def stable(): Long = {
      var last = snapshot()
      var quiet = 0
      var spins = 0
      while (quiet < 5 && spins < 300) {
        Thread.sleep(100)
        val cur = snapshot()
        // strictly MORE starts than ends = a job f launched is still
        // draining ('>' not '!=': a job begun before the listener
        // attached can deliver an end without its start and must not
        // wedge the wait)
        val open = cur._3 > cur._4
        quiet = if (cur == last && !open) quiet + 1 else 0
        last = cur
        spins += 1
      }
      last._1
    }
    try {
      // drain any backlog from work that PRECEDED the measurement (a
      // freshly-attached listener still receives queued events), then
      // measure the delta f produces
      val base = stable()
      f
      stable() - base
    } finally spark.sparkContext.removeSparkListener(m)
  }
}

/** Incremental progress + ETA — the reference's per-batch progress
  * events and completed-average ETA model
  * (/root/reference/Services/MigrationService.cs:524-533,657-667)
  * re-targeted at long distributed builds: after each completed unit
  * (ingest phase, segment shard) the build reports completed/total,
  * elapsed, and eta = remaining units x avg completed-unit time — so a
  * multi-hour 100 TB build reports continuously instead of going dark
  * until a phase ends. Pure functions so the line shape is spec-able;
  * emission goes to stderr (stdout stays reserved for the one-line
  * JSON results the CLI contracts promise). */
object Progress {
  /** remaining x avg(completed); NaN until the first unit lands. */
  def etaSecs(completed: Int, total: Int, elapsedSecs: Double): Double =
    if (completed <= 0) Double.NaN
    else (total - completed) * (elapsedSecs / completed)

  def line(op: String, unit: String, completed: Int, total: Int,
           elapsedSecs: Double): String = {
    val eta = etaSecs(completed, total, elapsedSecs)
    val etaS = if (eta.isNaN) "?" else f"$eta%.1fs"
    f"[progress] $op $unit $completed/$total elapsed=$elapsedSecs%.1fs eta=$etaS"
  }

  def emit(op: String, unit: String, completed: Int, total: Int,
           startNanos: Long): Unit =
    System.err.println(line(op, unit, completed, total,
      (System.nanoTime() - startNanos) / 1e9))
}
