package graft.metrics

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
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
}
