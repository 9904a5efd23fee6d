package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSuite}

/** Plan-quality regression guards: the physical properties that make
  * the engine scale must survive refactors. */
class PlanSpec extends SparkSuite {

  test("WAND segment scan pushes the term filter into parquet and broadcasts the query side") {
    val idx = SparkEntry.ensureIndex(spark, "/root/testdata/sf0.001")
    val plan = Wand.topK(spark, idx, SparkEntry.FtQuerySet, SparkEntry.IndexCfg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"), s"term filter not pushed:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "query-terms side must broadcast")
  }

  test("declarative BM25 broadcasts query terms and prunes the docs scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = BM25.topK(spark, docs, col("doc_id"), col("text"), SparkEntry.FtQuerySet)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "postings x query-terms must broadcast")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "docs scan must prune to the two used columns")
  }

  test("postings construction plans with no shuffle exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.index.Postings.build(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"postings must be shuffle-free:\n$plan")
  }

  // Round-2 guards: no global-window top-k anywhere. A Window.orderBy
  // without partitionBy (or a per-qid window over unbounded candidates)
  // plans an `Exchange SinglePartition` — the one operator shape that
  // flatly dies at 100x corpus. None of the ranking paths may produce it.

  test("similarity top-k plans as TakeOrderedAndProject, no single-partition exchange") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = graft.ops.Similarity
      .topKPlanned(graft.ops.Similarity.cosineScored(emb, 0L), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps + driver merge:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"no single-partition exchange in similarity ranking:\n$plan")
  }

  test("BM25 ranking is a bounded top-k aggregation — no window, no single-partition exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(false, true).foreach { conj =>
      val plan = BM25.topK(spark, docs, col("doc_id"), col("text"),
        SparkEntry.FtQuerySet, conjunctive = conj)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"no single-partition exchange in BM25 ranking (conj=$conj):\n$plan")
      assert(!plan.contains("Window"),
        s"per-qid ranking must not be a window sort (conj=$conj):\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"bounded top-k aggregation expected in plan (conj=$conj):\n$plan")
    }
  }

  test("phrase path: no window rank, no single-partition exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = BM25.phraseTopK(spark, docs, col("doc_id"), col("text"),
      SparkEntry.PhraseQuerySet).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), s"phrase ranking:\n$plan")
    assert(!plan.contains("Window"), s"phrase ranking must not window-sort:\n$plan")
  }

  test("indexed phrase serving: pruned postings scan, zero corpus tokenize") {
    import graft.analyze.CodeTokenizer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan_idx_").toString
    try {
      graft.index.SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"),
        dir, SparkEntry.IndexCfg)
      val analyzed = SparkEntry.PhraseQuerySet
        .map { case (q, t) => (q, CodeTokenizer.tokenize(t).toSeq) }
        .filter(_._2.nonEmpty)
      val pruned = BM25.prunedPositionalPostings(spark, dir,
        analyzed.flatMap(_._2).distinct)
      val scanPlan = pruned.queryExecution.executedPlan.toString
      // layout v3: row-group pruning rides the fixed-width thash key
      // (files are hash-clustered); the exact term filter still guards
      // collisions post-scan
      assert(scanPlan.contains("In(thash"),
        s"thash IN (...) must reach the parquet reader (PushedFilters):\n$scanPlan")
      assert(scanPlan.contains("term#") && scanPlan.contains("INSET"),
        s"the exact term filter must remain in the plan:\n$scanPlan")
      assert(!scanPlan.toLowerCase.contains("tokenize"),
        s"a served phrase query must never tokenize the corpus:\n$scanPlan")
      // the whole candidate derivation stays on the ONE pruned scan
      val candPlan = BM25.phraseCandidatesFrom(pruned, analyzed)
        .queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllMatchIn(candPlan).size
      assert(scans == 1, s"candidates = one pruned postings scan, got $scans:\n$candPlan")
      assert(!candPlan.toLowerCase.contains("tokenize"),
        s"no corpus tokenize in indexed candidates:\n$candPlan")
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(); ()
    }
  }

  test("served phrase batch is ONE postings scan, no cache churn, no window") {
    import graft.analyze.CodeTokenizer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan_idx2_").toString
    try {
      graft.index.SegmentBuilder.ingest(spark, docs, col("doc_id"), col("text"),
        dir, SparkEntry.IndexCfg)
      // the r4 serving promise: after the handle's df warm-up, a batch
      // is one aggregation plan over ONE pruned postings scan — no
      // per-batch persist (InMemoryRelation), no checkpoint, no window
      val handle = new BM25.PhraseHandle(spark, dir, SparkEntry.IndexCfg)
      val plan = handle.topK(SparkEntry.PhraseQuerySet)
        .queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllMatchIn(plan).size
      assert(scans == 1, s"served phrase batch = one pruned scan, got $scans:\n$plan")
      assert(!plan.contains("InMemoryRelation") && !plan.contains("InMemoryTableScan"),
        s"no per-batch cache churn in the served phrase plan:\n$plan")
      assert(!plan.contains("Exchange SinglePartition") && !plan.contains("Window"),
        s"phrase serving must rank via bounded aggregation:\n$plan")
      // results identical to the one-shot indexed path
      assert(handle.topK(SparkEntry.PhraseQuerySet).collect().toSeq ===
        BM25.phraseTopKIndexed(spark, dir, SparkEntry.PhraseQuerySet,
          SparkEntry.IndexCfg).collect().toSeq)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(); ()
    }
  }

  test("batch similarity ranks via bounded aggregation — no window, no single-partition exchange") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = graft.ops.Similarity.cosineTopKBatch(emb, SparkEntry.SimQueryIds, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), s"batch sim ranking:\n$plan")
    assert(!plan.contains("Window"), s"batch sim must not window-sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"bounded top-k expected:\n$plan")
  }

  test("embed near-dup plans: exact = broadcast pair SCAN (one scan, no join, no shuffle); LSH-blocked = bucket-key shuffle join, no cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = graft.ops.Dedup.embedNearDups(emb, 0.4)
      .queryExecution.executedPlan.toString
    // r06: the exact anchor no longer materializes n^2/2 pair rows
    // through a BroadcastNestedLoopJoin — one MapPartitions pass loops
    // each stream row against the broadcast vector table and emits only
    // qualifying pairs. The pin asserts the stronger shape: a pair scan
    // with NO join operator and NO exchange anywhere in the plan.
    assert(exact.contains("MapPartitions"),
      s"exact pairs must be a broadcast pair scan (verification-scale anchor):\n$exact")
    assert(!exact.contains("Join") && !exact.contains("Exchange") &&
      !exact.contains("CartesianProduct"),
      s"the exact pair scan must not shuffle or join:\n$exact")
    val blocked = graft.ops.Dedup.embedNearDupsLsh(emb, 0.4)
      .queryExecution.executedPlan.toString
    assert(!blocked.contains("CartesianProduct") &&
      !blocked.contains("BroadcastNestedLoopJoin"),
      s"LSH-blocked pairs must join on the bucket key, never the pair space:\n$blocked")
    assert(!blocked.contains("Exchange SinglePartition"), s"blocked pairs:\n$blocked")
  }

  test("phrase candidates: ONE positional corpus pass for ALL phrases, any length mix") {
    import graft.analyze.CodeTokenizer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val analyzed = SparkEntry.PhraseQuerySet
      .map { case (q, t) => (q, CodeTokenizer.tokenize(t).toSeq) }
      .filter(_._2.nonEmpty)
    assert(analyzed.map(_._2.length).distinct.size > 1, "fixture must mix phrase lengths")
    val plan = BM25.phraseCandidates(docs, col("doc_id"), col("text"), analyzed)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllMatchIn(plan).size
    assert(scans == 1,
      s"positional candidates must be ONE corpus pass (was one per distinct length, " +
        s"and one source recheck before that), got $scans:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "the (qid, offset, term) query table must broadcast against the postings")
  }
}
