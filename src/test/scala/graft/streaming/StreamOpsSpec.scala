package graft.streaming

import java.nio.file.Files
import scala.reflect.io.Directory

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSuite

class StreamOpsSpec extends SparkSuite {

  import spark.implicits._

  test("watermarked windowed counts over a file-backed stream equal the batch result") {
    val src = Files.createTempDirectory("stream_src_").toString
    try {
      val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      events.limit(2000).write.parquet(s"$src/b1")
      val stream = spark.readStream.schema(events.schema).parquet(s"$src/b1")
      val q = StreamOps.windowedEventCounts(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName("win_counts").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("win_counts")
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val expect = StreamOps.windowedEventCounts(events.limit(2000))
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expect)
      assert(got.nonEmpty)
    } finally new Directory(new java.io.File(src)).deleteRecursively()
  }

  test("stateful sessionization closes sessions on gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    def ev(u: Long, sec: Long) =
      StreamOps.Event(u, new java.sql.Timestamp(sec * 1000), "click")
    val out = StreamOps.sessionize(mem.toDS(), gapMs = 60000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // user 1: two sessions separated by a 10-minute gap; user 2: one
    mem.addData(ev(1, 0), ev(1, 30), ev(2, 10))
    q.processAllAvailable()
    mem.addData(ev(1, 630), ev(1, 650))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[StreamOps.Session].collect()
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1.length === 1, "the gap must have closed user 1's first session")
    assert(u1.head.n_events === 2)
    assert(u1.head.closed_reason === "gap")
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def d(id: Long, text: String, sec: Long) =
      (id, text, new java.sql.Timestamp(sec * 1000))
    val out = StreamOps.dedupStream(
      mem.toDS().toDF("doc_id", "text", "ts"), col("text"), col("ts"),
      watermark = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    mem.addData(d(1, "alpha beta", 0), d(2, "alpha beta", 5), d(3, "gamma", 10))
    q.processAllAvailable()
    mem.addData(d(4, "alpha beta", 20), d(5, "delta", 30))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("deduped").collect().map(_.getString(1)).sorted
    // "alpha beta" survives exactly once despite three arrivals
    assert(texts === Array("alpha beta", "delta", "gamma"))
  }

  test("incremental index ingest: micro-batch appends land in the store's own layout") {
    val src = Files.createTempDirectory("stream_docs_").toString
    val idx = Files.createTempDirectory("stream_idx_").toString
    val chk = Files.createTempDirectory("stream_chk_").toString
    try {
      val cfg = graft.config.EngineConfig.default
        .copy(shards = 4, buildPartitions = 4, saltTargetPostings = 1024)
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      // appends require a completed ingest (stats/docmap/qsplits exist)
      graft.index.SegmentBuilder.ingest(spark, docs.filter(col("doc_id") < 100),
        col("doc_id"), col("text"), idx, cfg)
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 250)
        .write.parquet(s"$src/batch=a")
      val stream = spark.readStream.schema(docs.schema).parquet(s"$src/*")
      val q = StreamOps.indexIngestStream(stream, col("doc_id"), col("text"),
        idx, cfg, chk)
      q.processAllAvailable()
      docs.filter(col("doc_id") >= 250).write.parquet(s"$src/batch=b")
      q.processAllAvailable()
      q.stop()
      val post = spark.read.parquet(s"$idx/postings")
      val streamed = post.select("term", "doc_id", "tf", "doclen").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val direct = graft.index.Postings.build(docs, col("doc_id"), col("text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(2))).toSet
      assert(streamed === direct)
      // layout consistency: the positional store must never accumulate
      // null position lists from appends (that would poison phrase
      // serving) and docmap must cover every appended doc
      assert(post.filter(col("positions").isNull).count() === 0)
      assert(spark.read.parquet(s"$idx/docmap").count() === docs.count())
    } finally Seq(src, idx, chk).foreach(d =>
      new Directory(new java.io.File(d)).deleteRecursively())
  }
}
