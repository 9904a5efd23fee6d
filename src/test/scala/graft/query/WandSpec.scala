package graft.query

import java.nio.file.Files
import scala.reflect.io.Directory

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSuite}
import graft.config.EngineConfig
import graft.index.SegmentBuilder
import graft.oracle.NaiveBM25

/** Rank identity of the block-max WAND serving path: must equal the
  * declarative BM25 path AND the naive oracle — docIDs and bit-equal
  * scores — under aggressive skipping pressure (tiny blocks, salted hot
  * terms, duplicate-doc ties). */
class WandSpec extends SparkSuite {

  private val cfg = EngineConfig.default.copy(
    shards = 4, buildPartitions = 4, blockSize = 16, saltTargetPostings = 128)
  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  private lazy val indexDir: String = {
    val dir = Files.createTempDirectory("graft_wand_").toString
    val docs = spark.read.parquet(docsPath)
    SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"), dir, cfg)
    SegmentBuilder.buildAll(spark, dir, cfg)
    sys.addShutdownHook(new Directory(new java.io.File(dir)).deleteRecursively())
    dir
  }

  private def collectHits(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[(Long, Double)]] =
    df.collect().groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq)
      .toMap

  test("WAND == DataFrame BM25 == naive oracle on all reference queries") {
    val docsDf = spark.read.parquet(docsPath)
    val wand = collectHits(Wand.topK(spark, indexDir, SparkEntry.FtQuerySet, cfg))
    val declarative = collectHits(
      BM25.topK(spark, docsDf, col("doc_id"), col("text"), SparkEntry.FtQuerySet, cfg))
    assert(wand === declarative)
    val docsLocal = docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    for ((qid, text) <- SparkEntry.FtQuerySet) {
      val oracle = NaiveBM25.topK(docsLocal, text, cfg.topK, cfg.k1, cfg.b)
        .map(h => (h.docId, h.score))
      assert(wand.getOrElse(qid, Seq.empty) === oracle, s"q$qid <$text>")
    }
  }

  test("property: WAND == oracle on random Zipfian corpora and random queries") {
    import spark.implicits._
    val vocab = (1 to 40).map(i => s"w$i") // Zipfian-ish via quadratic skew below
    def word(seed: Long, i: Int): String = {
      val h = math.abs(graft.ops.Dedup.fnv1a64(s"$seed:$i"))
      vocab(((h % 1600) * vocab.size / 1600).toInt.min(vocab.size - 1) match {
        case x => (x * x / vocab.size) // quadratic skew -> hot low ids
      })
    }
    for (round <- 1 to 4) {
      val docs = (0L until 120L).map { id =>
        val len = 10 + (math.abs(graft.ops.Dedup.fnv1a64(s"len$round:$id")) % 50).toInt
        (id, (0 until len).map(i => word(round * 1000 + id, i)).mkString(" "))
      }
      val dir = Files.createTempDirectory(s"graft_wand_prop_$round").toString
      try {
        val c = cfg.copy(shards = 2, blockSize = 8, saltTargetPostings = 64)
        val df = docs.toDF("doc_id", "text")
        SegmentBuilder.ingest(spark, df, col("doc_id"), col("text"), dir, c)
        SegmentBuilder.buildAll(spark, dir, c)
        val queries = Seq(
          1 -> s"${word(round, 1)}",
          2 -> s"${word(round, 2)} ${word(round, 3)}",
          3 -> s"${word(round, 4)} ${word(round, 5)} ${word(round, 6)} zzznope")
        val wand = collectHits(Wand.topK(spark, dir, queries, c))
        for ((qid, text) <- queries) {
          val oracle = NaiveBM25.topK(docs, text, c.topK, c.k1, c.b)
            .map(h => (h.docId, h.score))
          assert(wand.getOrElse(qid, Seq.empty) === oracle,
            s"round $round q$qid <$text>")
        }
      } finally new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("hot term never pins its full postings in one task (bounded per-task fan-in)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wand_hot_").toString
    try {
      // one stopword-class term in EVERY doc; fan-out derives from the
      // hot df: 32768 / 4096 = 8 doc ranges
      val c = cfg.copy(shards = 2, blockSize = 16,
        saltTargetPostings = 64, serveTargetPostings = 4096)
      val nDocs = 32768L
      val docs = spark.range(0L, nDocs, 1L, 8).toDF("doc_id")
        .selectExpr("doc_id",
          "concat('hotword filler', doc_id % 97, ' pad', doc_id % 31) AS text")
      SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"), dir, c)
      SegmentBuilder.buildAll(spark, dir, c)
      val acc = spark.sparkContext.collectionAccumulator[java.lang.Long]("taskPostings")
      val handle = new Wand.Handle(spark, dir, c)
      val hits = handle.topK(Seq(1 -> "hotword"), acc).collect()
      handle.close()
      assert(hits.length === c.topK)
      // rank-identical to the oracle even under range fan-out
      val docsLocal = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val oracle = NaiveBM25.topK(docsLocal, "hotword", c.topK, c.k1, c.b)
        .map(h => (h.docId, h.score))
      val got = hits.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got === oracle)
      // the term fans out across many tasks and no task pins more than a
      // fraction of its postings (row/boundary granularity allows slack;
      // the failure mode being guarded is ONE task holding ALL of it)
      val perTask = acc.value
      assert(perTask.size >= 4, s"expected >=4 range tasks, got ${perTask.size}")
      val maxTask = perTask.toArray.map(_.asInstanceOf[java.lang.Long].longValue).max
      assert(maxTask <= nDocs / 2,
        s"a task pinned $maxTask of $nDocs hot postings — fan-out failed")
    } finally new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("per-task decode bound is an invariant: same target, two corpus sizes") {
    import spark.implicits._
    // the SAME serveTargetPostings at 4x the corpus must yield ~the same
    // per-task bound via MORE ranges — never bigger tasks
    val c = cfg.copy(shards = 2, blockSize = 16,
      saltTargetPostings = 64, serveTargetPostings = 1024)
    def run(nDocs: Long): (Int, Long) = {
      val dir = Files.createTempDirectory(s"graft_wand_inv_$nDocs").toString
      try {
        val docs = spark.range(0L, nDocs, 1L, 8).toDF("doc_id")
          .selectExpr("doc_id",
            "concat('hotword filler', doc_id % 97, ' pad', doc_id % 31) AS text")
        SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"), dir, c)
        SegmentBuilder.buildAll(spark, dir, c)
        val acc = spark.sparkContext.collectionAccumulator[java.lang.Long](s"tp$nDocs")
        val handle = new Wand.Handle(spark, dir, c)
        handle.topK(Seq(1 -> "hotword"), acc).collect()
        handle.close()
        val maxTask = acc.value.toArray
          .map(_.asInstanceOf[java.lang.Long].longValue).max
        (handle.serveRanges, maxTask)
      } finally new Directory(new java.io.File(dir)).deleteRecursively()
    }
    val (ranges1, max1) = run(4096L)
    val (ranges2, max2) = run(16384L)
    assert(ranges1 === 4 && ranges2 === 16,
      s"fan-out must grow with the corpus: got $ranges1 -> $ranges2")
    // slack 2x: boundary-overlapping rows count in both adjacent ranges
    val bound = c.serveTargetPostings * 2
    assert(max1 <= bound, s"small corpus: task pinned $max1 > $bound")
    assert(max2 <= bound, s"big corpus: task pinned $max2 > $bound — " +
      "the bound must NOT degrade with corpus growth")
  }

  test("ties break deterministically under WAND (duplicate docs)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wand_tie_").toString
    try {
      val docs = (0L until 50L)
        .map(i => (i, if (i % 2 == 0) "alpha beta gamma" else "delta epsilon zeta"))
        .toDF("doc_id", "text")
      val c = cfg.copy(shards = 2, blockSize = 8, saltTargetPostings = 16)
      SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"), dir, c)
      SegmentBuilder.buildAll(spark, dir, c)
      val hits = Wand.topK(spark, dir, Seq(1 -> "alpha zeta"), c).collect()
      val ids = hits.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      // alpha docs (even ids) all tie; zeta docs (odd) tie lower; ranks
      // must follow (score desc, docId asc)
      val docsLocal = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val oracle = NaiveBM25.topK(docsLocal, "alpha zeta", c.topK, c.k1, c.b).map(_.docId)
      assert(ids === oracle)
    } finally new Directory(new java.io.File(dir)).deleteRecursively()
  }
}
