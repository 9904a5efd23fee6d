package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.config.EngineConfig

/** One posting as it leaves the salted shuffle (sorted by term, salt,
  * docId inside each build partition). */
final case class PostingRec(term: String, salt: Int, doc_id: Long, tf: Long, doclen: Long)

/** One compressed block (parquet-embedded struct). */
final case class BlockRow(first_doc: Long, n: Int, deltas: Array[Byte],
                          tfs: Array[Byte], dls: Array[Byte], max_u: Double)

/** One segment row = up to `blocksPerRow` blocks of one (term, salt) run.
  * `row_seq` orders rows within the run; `n_postings`/`max_u` are
  * row-local (query sums/maxes them per term). */
final case class SegmentRow(term: String, salt: Int, row_seq: Int,
                            n_postings: Long, first_doc: Long, last_doc: Long,
                            max_u: Double, blocks: Seq[BlockRow])

final case class ShardManifest(shard: Int, status: String, postings: Long,
                               segRows: Long, bytes: Long, seconds: Double,
                               lineage: String)

/** Distributed inverted-index build with per-partition checkpointing —
  * the engine half the reference delegates to the Elasticsearch server.
  *
  * Layout under `indexDir`:
  * {{{
  *   docmap/              (doc_id, sha, doclen [, meta…])   – identity + invariant
  *   stats/               (n, avgdl)                         – broadcast scoring stats
  *   postings/shard=S/    (term, doc_id, tf, doclen)         – stage-0 output,
  *                         partitioned by shard = pmod(xxhash64(term), shards)
  *                         so each shard build prunes to its own files
  *   segments/shard=S/    SegmentRow parquet                 – stage-1 output
  *   manifest/shard_S.json                                   – checkpoint + metrics
  * }}}
  *
  * Checkpoint/resume (north_rule): stage 1 is a driver loop over
  * independent shard jobs. Each finished shard writes an atomic
  * manifest entry carrying lineage (input + config hash) and
  * rows/bytes/seconds metrics — the Spark analogue of the reference's
  * per-batch durations/errors (/root/reference/Models/MigrationResult.cs:49-50).
  * A re-run skips shards whose manifest matches the lineage, so an
  * interrupted build resumes without recomputation; shard output is
  * deterministic, so resume yields identical segments.
  *
  * Skew (north_rule): stage 1 range-repartitions on (term, doc_id) —
  * the range partitioner's sampler places balanced boundaries, so a
  * Zipfian term splits across reducers at DOC boundaries instead of
  * landing on one. Each resulting run (salt = partition id) covers a
  * narrow contiguous doc range: the query layer treats each run as one
  * more WAND cursor AND can prune runs by doc-range when fanning a
  * query out (see Wand.Handle); [[Codec.mergeRuns]] k-way merges runs
  * back when consolidating.
  */
object SegmentBuilder {

  // --- stage 0: ingest --------------------------------------------------------

  /** docs must have columns (doc_id long, content string); extra columns
    * are carried into docmap. Writes docmap + stats + shard-partitioned
    * postings. */
  def ingest(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
             indexDir: String, cfg: EngineConfig = EngineConfig.default): Unit = {
    // Defensive partitioning: tokenization is the dominant compute and
    // must never be bottlenecked by a coarse input layout (e.g. one fat
    // parquet file => one task). Cheap relative to the analyze/explode
    // work it unlocks; a no-op when the source is already wide enough.
    val spread =
      if (docs.rdd.getNumPartitions >= cfg.buildPartitions) docs
      else docs.repartition(cfg.buildPartitions)

    // Two independent passes, submitted concurrently (they share the
    // executors; concurrency removes the serial job-submission gap).
    // Tokenizing twice is deliberately cheaper than caching exploded
    // token arrays: the columnar cache build + deserialization costs
    // far more CPU than the analyzer itself.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    // Pass 1 — docmap: identity + per-row invariant surface
    // (sha256(content) equality vs the source — BASELINE.json
    // input_hint) plus doclen, one narrow projection; then corpus stats
    // from the (tiny, columnar) docmap.
    val pass1 = Future {
      spread.select(idCol.cast("long").as("doc_id"),
          sha2(contentCol.cast("string"), 256).as("sha"),
          size(graft.analyze.CodeTokenizer.tokensColFast(contentCol)).cast("long").as("doclen"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/docmap")
      spark.read.parquet(s"$indexDir/docmap")
        .agg(count(lit(1)).as("n"), avg(col("doclen")).as("avgdl"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
    }
    // Pass 2 — postings (shuffle-free: per-doc tf inside the tokenizer
    // expression), hash-partitioned by term shard for stage-1 pruning.
    val pass2 = Future {
      Postings.build(spread, idCol, contentCol)
        .withColumn("shard", pmod(xxhash64(col("term")), lit(cfg.shards)).cast("int"))
        .write.mode(SaveMode.Overwrite).partitionBy("shard")
        .parquet(s"$indexDir/postings")
    }
    Await.result(Future.sequence(Seq(pass1, pass2)), Duration.Inf)
    // Atomic ingest-complete marker, written only after BOTH passes
    // land: a crash between stats and postings must not let a resume
    // treat the partial postings dir as a finished ingest (resume gates
    // on this marker, never on stats existence alone).
    val dir = Paths.get(indexDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve("_ingested.tmp")
    Files.writeString(tmp, lineage(spark, indexDir, cfg))
    Files.move(tmp, dir.resolve("_ingested"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** True iff a previous [[ingest]] ran to completion (both passes). */
  def ingestDone(indexDir: String): Boolean =
    Files.exists(Paths.get(indexDir, "_ingested"))

  def readStats(spark: SparkSession, indexDir: String): (Long, Double) = {
    val r = spark.read.parquet(s"$indexDir/stats").head()
    (r.getLong(0), r.getDouble(1))
  }

  // --- stage 1: per-shard segment build ----------------------------------------

  /** Blocks-per-segment-row cap: bounds row size (~blockSize*blocksPerRow
    * postings, a few hundred KB compressed) independent of term df. */
  val BlocksPerRow = 256

  /** Shard build: range-repartition on (term, doc_id) — Spark's range
    * partitioner samples the shard and places balanced boundaries, so a
    * hot (Zipfian) term splits across partitions AT DOC BOUNDARIES.
    * Every run (salt = partition id) therefore covers a narrow
    * CONTIGUOUS doc range, which is what lets the serving layer fan a
    * query out per doc-range without shipping whole hot terms to every
    * task (a hash-salted run would scatter its docs across the full
    * corpus and overlap every serve range). Reducer balance comes from
    * the sampler instead of a manual hot-term salt count; row size is
    * additionally capped at blockSize x BlocksPerRow postings. */
  def buildShard(spark: SparkSession, indexDir: String, shard: Int,
                 cfg: EngineConfig): ShardManifest = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val (_, avgdl) = readStats(spark, indexDir)
    val post = spark.read.parquet(s"$indexDir/postings")
      .filter(col("shard") === shard) // partition-pruned scan

    val postingsAcc = spark.sparkContext.longAccumulator(s"postings_$shard")
    val bytesAcc = spark.sparkContext.longAccumulator(s"bytes_$shard")
    val segRowsAcc = spark.sparkContext.longAccumulator(s"segrows_$shard")

    val blockSize = cfg.blockSize; val k1 = cfg.k1; val b = cfg.b
    val segments = post
      .select(col("term"), col("doc_id"),
        col("tf").cast("long").as("tf"), col("doclen").cast("long").as("doclen"))
      .repartitionByRange(cfg.buildPartitions, col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
      .as[(String, Long, Long, Long)]
      .mapPartitions { it =>
        // runs of one term in different partitions are doc-disjoint
        // contiguous ranges; the partition id distinguishes them
        val salt = org.apache.spark.TaskContext.getPartitionId()
        encodeRuns(it.map { case (t, d, tf, dl) => PostingRec(t, salt, d, tf, dl) },
          blockSize, BlocksPerRow, k1, b, avgdl,
          postingsAcc, bytesAcc, segRowsAcc)
      }

    segments.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/segments/shard=$shard")
    ShardManifest(shard, "done", postingsAcc.value, segRowsAcc.value, bytesAcc.value,
      (System.nanoTime() - t0) / 1e9, lineage(spark, indexDir, cfg, shard))
  }

  /** Iterator-to-iterator run encoder: never materializes a run; at most
    * one segment row (<= blockSize*blocksPerRow postings) is in flight. */
  def encodeRuns(rows: Iterator[PostingRec], blockSize: Int, blocksPerRow: Int,
                 k1: Double, b: Double, avgdl: Double,
                 postingsAcc: LongAccumulator = null,
                 bytesAcc: LongAccumulator = null,
                 segRowsAcc: LongAccumulator = null): Iterator[SegmentRow] = {
    val it = rows.buffered
    val runs = new Iterator[Iterator[SegmentRow]] {
      def hasNext: Boolean = it.hasNext
      def next(): Iterator[SegmentRow] = {
        val term = it.head.term
        val salt = it.head.salt
        val run = new Iterator[Codec.Posting] {
          def hasNext: Boolean =
            it.hasNext && it.head.term == term && it.head.salt == salt
          def next(): Codec.Posting = {
            val r = it.next()
            Codec.Posting(r.doc_id, r.tf, r.doclen)
          }
        }
        Codec.encodeRun(run, blockSize, k1, b, avgdl)
          .grouped(blocksPerRow).zipWithIndex.map { case (blocks, seq) =>
            val n = blocks.map(_.n.toLong).sum
            val bytes = blocks.map(bl =>
              bl.deltas.length + bl.tfs.length + bl.dls.length).sum.toLong
            if (postingsAcc != null) postingsAcc.add(n)
            if (bytesAcc != null) bytesAcc.add(bytes)
            if (segRowsAcc != null) segRowsAcc.add(1)
            SegmentRow(term, salt, seq, n,
              blocks.head.firstDoc, lastDoc(blocks.last), blocks.map(_.maxU).max,
              blocks.map(bl => BlockRow(bl.firstDoc, bl.n, bl.deltas, bl.tfs, bl.dls, bl.maxU)))
          }
      }
    }
    runs.flatten
  }

  private def lastDoc(b: Codec.Block): Long = {
    var d = b.firstDoc
    val r = new Codec.VLongReader(b.deltas)
    while (r.hasNext) d += r.next()
    d
  }

  // --- checkpoint manifest ------------------------------------------------------

  /** Shard checkpoint lineage: config + corpus stats (avgdl changes
    * every block's max-score metadata) + the shard's actual postings
    * file listing (names + sizes) — so an incremental postings append
    * invalidates exactly the shards it touched, nothing else. */
  def lineage(spark: SparkSession, indexDir: String, cfg: EngineConfig,
              shard: Int = -1): String = {
    val (n, avgdl) = readStats(spark, indexDir)
    val files =
      if (shard < 0) ""
      else {
        val dir = new java.io.File(s"$indexDir/postings/shard=$shard")
        Option(dir.listFiles()).map(_.filter(_.getName.endsWith(".parquet"))
          .map(f => s"${f.getName}:${f.length}").sorted.mkString(",")).getOrElse("")
      }
    val md = MessageDigest.getInstance("SHA-256")
    val s = s"$indexDir|n=$n|avgdl=$avgdl|k1=${cfg.k1}|b=${cfg.b}|bs=${cfg.blockSize}|" +
      s"shards=${cfg.shards}|salt=${cfg.saltTargetPostings}|files=$files"
    md.digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  private def manifestPath(indexDir: String, shard: Int): Path =
    Paths.get(indexDir, "manifest", s"shard_$shard.json")

  def writeManifest(indexDir: String, m: ShardManifest): Unit = {
    val dir = Paths.get(indexDir, "manifest")
    Files.createDirectories(dir)
    val json =
      s"""{"shard":${m.shard},"status":"${m.status}","postings":${m.postings},""" +
        s""""segRows":${m.segRows},"bytes":${m.bytes},"seconds":${m.seconds},""" +
        s""""lineage":"${m.lineage}"}"""
    val tmp = dir.resolve(s"shard_${m.shard}.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(indexDir, m.shard), // atomic checkpoint commit
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def manifestDone(indexDir: String, shard: Int, expectedLineage: String): Boolean = {
    val p = manifestPath(indexDir, shard)
    Files.exists(p) && {
      val s = Files.readString(p)
      s.contains("\"status\":\"done\"") && s.contains(expectedLineage)
    }
  }

  /** Driver loop: build every shard not already checkpointed with a
    * matching lineage. Returns the manifests of the shards built NOW
    * (resume evidence: an up-to-date index returns Nil).
    *
    * `concurrency` > 1 submits shard jobs concurrently (Spark schedules
    * them FIFO across the same executors) — checkpoint granularity is
    * unchanged since each shard still commits its own manifest the
    * moment it finishes; it only removes the serial job-submission gaps
    * that otherwise cap scaling. */
  def buildAll(spark: SparkSession, indexDir: String,
               cfg: EngineConfig = EngineConfig.default,
               concurrency: Int = 1): Seq[ShardManifest] = {
    val todo = (0 until cfg.shards).filterNot(s =>
      manifestDone(indexDir, s, lineage(spark, indexDir, cfg, s)))
    def runOne(shard: Int): ShardManifest = {
      val m = buildShard(spark, indexDir, shard, cfg)
      writeManifest(indexDir, m)
      m
    }
    if (concurrency <= 1 || todo.size <= 1) todo.map(runOne)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(concurrency, todo.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(todo.map(s => Future(runOne(s)))), Duration.Inf)
      finally pool.shutdown()
    }
  }
}
