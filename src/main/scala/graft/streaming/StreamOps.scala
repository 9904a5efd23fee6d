package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.index.Postings

/** Mutable session accumulator (top-level: Spark state encoders cannot
  * codegen private nested classes). */
final case class SessionState(n: Long, start: Long, last: Long)

/** Structured Streaming extensions. The reference is strictly batch
  * (SURVEY.md §2.9) — these are the incremental-ingest counterparts a
  * Spark-native engine adds: watermarked windowed aggregation, stateful
  * sessionization, and micro-batch inverted-index ingest.
  */
object StreamOps {

  /** Watermarked sliding-window event counts (works on a streaming or
    * batch events frame: ts, event_type, value). */
  def windowedEventCounts(events: DataFrame,
                          watermark: String = "10 minutes",
                          windowLen: String = "5 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class Session(user_id: Long, n_events: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, closed_reason: String)
  /** Gap-based sessionization with flatMapGroupsWithState: a session
    * closes when a later event proves a gap of more than `gapMs`
    * inactivity (with ProcessingTimeTimeout, idle sessions also close on
    * wall-clock timeout; NoTimeout keeps micro-batch tests synchronous —
    * processAllAvailable never waits on timer-driven batches). */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    val usesTimeout = timeout != GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.n, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), "timeout"))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed += Session(user, s.n, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), "gap")
                  cur = Some(SessionState(1, t, t))
                case Some(s) =>
                  cur = Some(SessionState(s.n + 1, s.start, math.max(s.last, t)))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (usesTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
        })
  }

  /** Streaming exact dedup — the incremental counterpart of
    * Dedup.exact: drop documents whose content hash was already seen
    * within the watermark horizon. State stores only (hash, ts), never
    * document payloads, and is evicted past the watermark — bounded
    * regardless of stream length (an unbounded-horizon dedup at 10^12
    * docs would need the batch pipeline's hash-agg instead). */
  def dedupStream(docs: DataFrame, contentCol: Column, tsCol: Column,
                  watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("__fp", md5(contentCol.cast("string")))
      .withColumn("__ts", tsCol.cast("timestamp"))
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp", "__ts")

  /** Micro-batch incremental index ingest: each micro-batch appends
    * docmap rows + postings through [[graft.index.SegmentBuilder.appendDocs]]
    * — the STORE'S layout (positional iff ingested so), never a
    * hand-rolled shape that could silently diverge from it. The
    * streaming counterpart of the reference's batched inserts
    * (/root/reference/Services/MigrationService.cs:454-492). Segment
    * rebuild per shard is then an incremental buildAll over the touched
    * shards. */
  def indexIngestStream(docsStream: DataFrame, idCol: Column, contentCol: Column,
                        indexDir: String, cfg: graft.config.EngineConfig,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        graft.index.SegmentBuilder.appendDocs(batch.sparkSession, batch,
          idCol, contentCol, indexDir, cfg)
        // the reference's per-batch progress event
        // (Services/MigrationService.cs:524-533); total is unknown for
        // an unbounded stream, so the line carries batch id + duration
        System.err.println(
          f"[progress] stream batch=$batchId appended in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      .start()
}
