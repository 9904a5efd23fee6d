package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.SegmentBuilder
import graft.metrics.Metrics

/** Benchmark main. Prints ONE JSON line:
  *  - per-query wall times for the headline operator set (sf dir from
  *    SPARK_GRAFT_SF_DIR, cores from SPARK_GRAFT_CPUS),
  *  - end-to-end indexing throughput (docs/sec) on a deterministic
  *    replicated corpus (FIXTURES.md: 200k+ docs for bench; default
  *    200 x 5000 = 1M docs — large enough that fixed job overhead stops
  *    distorting the N-vs-4N comparison), and
  *  - the north-rule scaling evidence: the SAME indexing job at
  *    local[N] and local[4N] (default 2 vs 8 — the range where this
  *    VM's vCPUs are linear; see BASELINE.md) on the SAME input, with
  *    efficiency = thr(4N) / (4 * thr(N)). Fixed shuffle partitioning
  *    (32) in both runs so only the core count varies; a warmup build
  *    precedes each measured run so JIT state is comparable; index and
  *    shuffle dirs live on tmpfs so the measurement captures the
  *    engine, not the sandbox's virtio disk.
  */
object Bench {

  /** Serving-throughput floor (queries/sec at sf0.1 on tmpfs): a WAND
    * serving regression must fail the bench as loudly as a broken query.
    * The engine measures 19-29 qps on this VM (BENCH_r02/BASELINE.md);
    * 10 sits far below the noise band but catches any structural
    * regression (index back on virtio disk, lost fan-out, per-batch
    * rebuild). Override via GRAFT_QPS_FLOOR (0 disables, e.g. on a
    * corpus where the floor is not calibrated). */
  val DefaultQpsFloor = 10.0

  def qpsFloorViolation(qps: Double, floor: Double): Option[String] =
    if (floor > 0 && qps >= 0 && qps < floor)
      Some(f"wand_queries_per_sec $qps%.1f below floor $floor%.1f")
    else None

  private val HeadlineQueries = Seq(
    "q1_agg", "q3_topk", "q_count_lineitem", "q_topk_events", "q_dedup_latest",
    "q_antijoin", "q_validation_counts", "q_warnings_top", "q_sample_head",
    "q_window_running", "q_rollup", "q_distinct", "q_set_ops",
    "q_approx_distinct", "q_sessionize", "q_ts_coercion",
    "es_json_coercion",
    "ft_postings", "ft_df", "ft_bm25_topk", "ft_bm25_conj", "ft_phrase",
    "ft_phrase_slop",
    "ft_wand_topk", "ing_docmap", "code_docmap", "code_ft_topk",
    "code_wand_topk",
    "dd_exact", "dd_minhash_lsh", "dd_cluster",
    "dd_simhash", "dd_embed_cosine", "sim_cosine_topk", "sim_batch_topk",
    "sim_ann_topk", "sim_ivf_topk",
    "txt_quality", "txt_repetition", "txt_tokens", "txt_fingerprint", "txt_langid",
    "mm_features")

  private def session(master: String, shufflePartitions: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // shuffle/spill on tmpfs: measure the engine, not /dev/vda
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic bench corpus: sf documents replicated with distinct
    * doc_ids (no external data; FIXTURES.md bench scale). The replica
    * range is the STREAMED side (32 partitions) with the small docs
    * table broadcast, so corpus generation itself is parallel — a
    * single-partition source file must never serialize the pipeline. */
  private[graft] def benchDocs(spark: SparkSession, sfDir: String, replicas: Int,
                               parts: Int = 0): DataFrame =
    // >=4 waves per core: the staged ingest runs its phases as BARRIERS
    // (tokenize -> derive), so a coarse 2-wave layout pays the full
    // straggler tail at each barrier on wide executors; finer tasks cut
    // the tail without a shuffle (range is generated, not read).
    // `parts` > 0 pins the layout (ScaleProbe A/Bs granularity).
    spark.range(0, replicas, 1,
        if (parts > 0) parts
        else math.max(32, spark.sparkContext.defaultParallelism * 4)).toDF("rep")
      .crossJoin(broadcast(spark.read.parquet(s"$sfDir/documents.parquet")))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"))

  /** One full measured index build (ingest + all shards); returns
    * (docs, seconds). */
  private def indexRun(spark: SparkSession, sfDir: String, replicas: Int): (Long, Double) = {
    val cfg = SparkEntry.IndexCfg.copy(buildPartitions = 32)
    val docs = benchDocs(spark, sfDir, replicas)
    val n = docs.count()
    // tmpfs when available: the bench measures the engine, not /dev/vda
    val tmpBase = if (new java.io.File("/dev/shm").isDirectory)
      java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
    val dir = Files.createTempDirectory(tmpBase, "graft_bench_idx_").toString
    val t0 = System.nanoTime()
    SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"), dir, cfg)
    SegmentBuilder.buildAll(spark, dir, cfg, concurrency = 4)
    val secs = (System.nanoTime() - t0) / 1e9
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    (n, secs)
  }

  /** Best-of-k measured runs after a warmup build — the VM's vCPUs are
    * time-shared, so single wall-clock samples are noisy. */
  private def scalingRun(master: String, sfDir: String, replicas: Int,
                         samples: Int): (Long, Double) = {
    val spark = session(master, 32)
    try {
      indexRun(spark, sfDir, math.max(1, replicas / 8)) // warmup (JIT, codegen)
      (1 to samples).map(_ => indexRun(spark, sfDir, replicas)).minBy(_._2)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  /** Best-of-2 per query; failures are COLLECTED AND FATAL, never
    * silently dropped from the headline total (a query that starts
    * throwing must fail the bench, not make it look faster). */
  def timeQueries(spark: SparkSession, sfDir: String, names: Seq[String],
                  queries: Map[String, (SparkSession, String) => DataFrame])
      : (Seq[(String, Double)], Seq[(String, String)]) = {
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val times = names.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      // best-of-2: single samples on time-shared vCPUs are noisy
      try name -> math.min(once(), once())
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failures += name -> e.toString.take(200)
          name -> -1.0
      }
    }
    (times, failures.toList)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val replicas = sys.env.getOrElse("GRAFT_BENCH_REPLICAS", "200").toInt

    // 1. headline operator timings at the driver-requested parallelism
    val skipQueries = sys.env.get("GRAFT_BENCH_MODE").contains("scaling")
    val spark = session(s"local[$cpus]", cpus.toInt)
    val metrics = Metrics.attach(spark)
    val queries = SparkEntry.queries
    val (results, failures) = timeQueries(spark, sfDir,
      if (skipQueries) Seq.empty[String] else HeadlineQueries.filter(queries.contains),
      queries)
    spark.stop()

    // 1b. serving throughput: repeated WAND top-10 batches against the
    // prebuilt compressed index, and repeated PHRASE batches against
    // the same index's positional postings (queries/sec each)
    val (qps, phraseQps): (Double, Double) = if (skipQueries) (-1.0, -1.0) else {
      val s2 = session(s"local[$cpus]", cpus.toInt)
      try {
        val idx = SparkEntry.ensureIndex(s2, sfDir)
        val handle = new graft.query.Wand.Handle(s2, idx, SparkEntry.IndexCfg)
        def timeReps(reps: Int, n: Int)(once: => Unit): Double = {
          once // warmup
          val t0 = System.nanoTime()
          (1 to reps).foreach(_ => once)
          reps * n / ((System.nanoTime() - t0) / 1e9)
        }
        val w = timeReps(10, SparkEntry.FtQuerySet.size) {
          handle.topK(SparkEntry.FtQuerySet).write.mode("overwrite").format("noop").save()
        }
        val p = timeReps(5, SparkEntry.PhraseQuerySet.size) {
          graft.query.BM25.phraseTopKIndexed(s2, idx, SparkEntry.PhraseQuerySet,
            SparkEntry.IndexCfg).write.mode("overwrite").format("noop").save()
        }
        (w, p)
      } finally s2.stop()
    }

    // 2. scaling evidence: same indexing job at N and 4N cores (the
    // sandbox stand-in for N vs 4N executors — see BASELINE.md). The
    // scaling corpus is 2x the headline corpus (default 2M docs): the
    // engine indexes >70k docs/s at 8 cores, so anything smaller lets
    // fixed driver overhead (job submission, manifest commits) distort
    // the N-vs-4N ratio.
    val scaleN = sys.env.getOrElse("GRAFT_SCALE_N", "2").toInt
    val scaleReplicas = sys.env.getOrElse("GRAFT_SCALE_REPLICAS",
      (replicas * 2).toString).toInt
    val (n2, s2) = scalingRun(s"local[$scaleN]", sfDir, scaleReplicas, samples = 2)
    val (n8, s8) = scalingRun(s"local[${scaleN * 4}]", sfDir, scaleReplicas, samples = 3)
    val thr2 = n2 / s2
    val thr8 = n8 / s8
    val eff = thr8 / (4.0 * thr2)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    // full JSON string escape — exception text can carry backslashes
    // (regexes), tabs, quotes; a blacklist would emit invalid JSON
    val failed = failures.map { case (k, e) => JsonUtil.q(s"$k: $e") }
      .mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""failed":$failed,""" +
        s""""indexing":{"docs":$n8,"secs":$s8,"docs_per_sec":${thr8.round}},""" +
        s""""wand_queries_per_sec":${math.rint(qps * 10) / 10},""" +
        s""""phrase_queries_per_sec":${math.rint(phraseQps * 10) / 10},""" +
        s""""scaling":{"cores_n":$scaleN,"cores_4n":${scaleN * 4},"docs_per_sec_n":${thr2.round},""" +
        s""""docs_per_sec_4n":${thr8.round},"efficiency":${math.rint(eff * 1000) / 1000}},""" +
        s""""query_metrics":${metrics.json}}""")
    // fail loud: any broken headline query fails the bench run, and so
    // does a serving-throughput regression below the floor
    val floor = sys.env.get("GRAFT_QPS_FLOOR").map(_.toDouble)
      .getOrElse(if (skipQueries) 0.0 else DefaultQpsFloor)
    qpsFloorViolation(qps, floor).foreach { msg =>
      System.err.println(s"[bench] $msg")
      sys.exit(1)
    }
    if (failures.nonEmpty) sys.exit(1)
  }
}
