package graft.cli

import org.apache.spark.sql.SparkSession

/** Orderly user cancellation — the reference's CancellationTokenSource
  * wiring (/root/reference/ViewModels/MainViewModel.cs:292-311: the
  * Cancel button requests cancellation, the migration loop observes the
  * token between batches, finished batches stay committed) re-targeted
  * at Spark's two cancellation surfaces:
  *
  *  - in-flight work: every CLI op tags its jobs with one job group
  *    ([[JobGroup]], interruptOnCancel=true); SIGINT cancels the group
  *    so running stages stop within a task-interrupt instead of at
  *    stage end;
  *  - future work: the driver loops ([[graft.index.SegmentBuilder.buildAll]] /
  *    `compactShards`) poll [[isRequested]] and stop LAUNCHING units.
  *
  * Committed units (shard manifests, the ingest marker) are never
  * rolled back, so a cancelled build resumes with exactly the
  * unfinished shards through the ordinary checkpoint path — the same
  * end state as a crash, reached without waiting for a whole shard job
  * to finish and without kill -9. The flag mechanics are spec-able
  * without signals; the SIGINT hook is a thin adapter over them. */
object Cancellation {
  val JobGroup = "graft-op"

  @volatile private var requested = false

  def isRequested: Boolean = requested

  /** Test hook: cancellation state is process-global. */
  private[cli] def reset(): Unit = requested = false

  /** Raise the flag and cancel the op's in-flight Spark jobs. */
  def request(spark: SparkSession): Unit = {
    requested = true
    try spark.sparkContext.cancelJobGroup(JobGroup)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Tag this thread's jobs with the cancellable group and install the
    * SIGINT handler. The handler additionally cancels ALL jobs — a CLI
    * invocation owns its JVM, and ingest's internal futures run on
    * threads that may predate the group tag. On a JVM without
    * sun.misc.Signal the flag-based path still works (driver loops
    * poll it); only the keyboard hook is lost. */
  def install(spark: SparkSession, desc: String): Unit = {
    spark.sparkContext.setJobGroup(JobGroup, desc, interruptOnCancel = true)
    try
      sun.misc.Signal.handle(new sun.misc.Signal("INT"),
        (_: sun.misc.Signal) => {
          System.err.println("[cancel] SIGINT — cancelling in-flight jobs; " +
            "committed shards stay; re-run the same command to resume")
          request(spark)
          try spark.sparkContext.cancelAllJobs()
          catch { case scala.util.control.NonFatal(_) => () }
        })
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** The driver-loop probe, passed as `cancel` into buildAll/compactShards. */
  def probe: () => Boolean = () => requested
}
