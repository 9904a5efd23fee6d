package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.CodeTokenizer
import graft.config.EngineConfig
import graft.index.Postings

/** Okapi BM25 (k1=1.2, b=0.75 — the ES 7.x default similarity the
  * reference's index would use; public knowledge) with Lucene-style
  * non-negative idf.
  *
  * Rank identity discipline (SURVEY.md §7.4 risk 1): the scalar formula
  * below is written once and mirrored OPERATION-FOR-OPERATION in the
  * Column form and the DuckDB oracle SQL, and per-document scores are
  * summed in ascending term order in all implementations, so equal
  * inputs produce bit-equal doubles everywhere.
  */
object BM25 {

  /** idf = ln(1 + (N - df + 0.5) / (df + 0.5)).
    * StrictMath.log, because Catalyst's Log expression evaluates via
    * StrictMath — keeps the oracle bit-identical to the Column path. */
  def idf(df: Long, n: Long): Double =
    StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** Per-(term, doc) weight. Association mirrors the Column/SQL forms:
    * (idf * (tf * (k1+1))) / (tf + k1 * ((1 - b) + (b * dl) / avgdl)) */
  def weight(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double,
             k1: Double = 1.2, b: Double = 0.75): Double =
    idf(df, n) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))

  /** Column form of [[weight]] given tf/dl/df columns and scalar stats. */
  def weightCol(tf: Column, dl: Column, df: Column, n: Long, avgdl: Double,
                k1: Double, b: Double): Column = {
    val idfC = log(lit(1.0) + (lit(n.toDouble) - df + lit(0.5)) / (df + lit(0.5)))
    idfC * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + (lit(b) * dl) / lit(avgdl)))
  }

  /** Term-count threshold above which [[statsAndDf]] splits into two
    * passes: one `array_contains` aggregate column per term is the
    * single-pass shape, but past a few dozen terms (prefix/fuzzy
    * expansions, MLT candidate vocabularies) the per-doc term probing
    * and the aggregate width stop paying for the saved pass. */
  private val StatsSinglePassMaxTerms = 24

  /** ONE bounded stats job computing the BM25 scoring constants
    * (N, avgdl) and per-term document frequency for a bounded term set.
    * Replaces the former three-subtree shape — a doclens-only corpus
    * tokenize for the stats plus a FULL-VOCABULARY docFreq aggregation
    * whose shuffle existed only to be inner-joined down to the query's
    * handful of terms (guide §1.2 step 1 / §2.3 "aggregate before you
    * shuffle": df for k query terms never needs the whole term space
    * shuffled; at 100 TB the vocabulary aggregation is corpus-sized).
    *
    * Exactness: n and avgdl are the same count/avg over the same
    * tokenized rows (the doclen sum is an integer < 2^53, so the double
    * sum is exact and order-independent); df(t) = number of docs whose
    * kept-token array contains t, which is by construction the number
    * of postings rows for t. Terms absent from the corpus are absent
    * from the map — the former inner join with docFreq dropped them
    * identically. Above [[StatsSinglePassMaxTerms]] the df side runs as
    * a term-pruned postings aggregation (still never full-vocabulary);
    * the values are identical either way. */
  def statsAndDf(docs: DataFrame, idCol: Column, contentCol: Column,
                 terms: Seq[String]): (Long, Double, Map[String, Long]) = {
    val ts = terms.distinct
    val tok = Postings.tokenized(docs, idCol, contentCol)
    if (ts.size <= StatsSinglePassMaxTerms) {
      val aggs = count(lit(1)).as("n") +: avg(col("doclen")).as("avgdl") +:
        ts.map(t => count(when(array_contains(col("tokens"), t), 1)))
      val row = tok.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(0)
      val avgdl = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      val dfMap = ts.zipWithIndex.flatMap { case (t, i) =>
        val c = row.getLong(2 + i)
        if (c > 0) Some(t -> c) else None
      }.toMap
      (n, avgdl, dfMap)
    } else {
      // the stats aggregate and the term-pruned df aggregate are
      // independent jobs — submit them from two driver threads so the
      // second backfills the first's straggler tail (guide §2.6)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val statsF = Future {
        tok.agg(count(lit(1)).as("n"), avg(col("doclen")).as("avgdl")).head()
      }
      val dfF = Future {
        Postings.build(docs, idCol, contentCol)
          .filter(col("term").isInCollection(ts))
          .groupBy("term").agg(count(lit(1)).as("df"))
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      }
      val r = Await.result(statsF, Duration.Inf)
      val n = r.getLong(0)
      val avgdl = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      (n, avgdl, Await.result(dfF, Duration.Inf))
    }
  }

  /** Multi-field twin of [[statsAndDf]]: every field's (n, avgdl, df)
    * comes out of ONE corpus scan (each field tokenized once inside the
    * same projection) instead of one stats job per field — the
    * multi_match/dis_max preamble. Values are identical to calling
    * [[statsAndDf]] per field (same counts, same exact integer sums). */
  def statsAndDfMulti(docs: DataFrame, idCol: Column, fields: Seq[Column],
                      terms: Seq[String]): Seq[(Long, Double, Map[String, Long])] = {
    val ts = terms.distinct
    if (ts.size > StatsSinglePassMaxTerms || fields.size == 1)
      return fields.map(f => statsAndDf(docs, idCol, f, ts))
    val tok = docs.select(fields.zipWithIndex.map { case (f, i) =>
      CodeTokenizer.tokensColFast(f).as(s"tokens_$i") }: _*)
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      fields.indices.flatMap { i =>
        avg(size(col(s"tokens_$i")).cast("long")) +:
          ts.map(t => count(when(array_contains(col(s"tokens_$i"), t), 1)))
      }
    val row = tok.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    fields.indices.map { i =>
      val base = 1 + i * (1 + ts.size)
      val avgdl = if (row.isNullAt(base)) 0.0 else row.getDouble(base)
      val dfMap = ts.zipWithIndex.flatMap { case (t, j) =>
        val c = row.getLong(base + 1 + j)
        if (c > 0) Some(t -> c) else None
      }.toMap
      (n, avgdl, dfMap)
    }
  }

  /** Empty ranked result with the [[Wand.Hit]] schema — shared early
    * return for term-less query batches. */
  private[query] def emptyHits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[Wand.Hit].toDF().orderBy("qid", "rank")
  }

  /** Top-k BM25 per query over the uncompressed postings — the
    * declarative scoring path: one bounded stats job ([[statsAndDf]]),
    * then ONE corpus pass joining the postings against the broadcast
    * (qid, term, df) literal table and one shuffle for the per-doc sum
    * (formerly three corpus tokenizes and a full-vocabulary docFreq
    * shuffle per call — guide §1.2 step 1).
    *
    * Output: (qid int, rank long, doc_id long, score double) where score
    * is summed in ascending term order (deterministic doubles) and rank
    * ties break on doc_id asc.
    */
  def topK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
           queries: Seq[(Int, String)], cfg: EngineConfig = EngineConfig.default,
           conjunctive: Boolean = false,
           statsKnown: Option[(Long, Double, Map[String, Long])] = None): DataFrame = {
    import spark.implicits._
    val analyzed = queries.map { case (qid, text) => qid -> CodeTokenizer.queryTerms(text) }
    val terms = analyzed.flatMap(_._2).distinct
    if (terms.isEmpty) return emptyHits(spark)
    val (n, avgdl, dfMap) = statsKnown.getOrElse(
      statsAndDf(docs, idCol, contentCol, terms))
    // (qid, term, n_terms, df): driver-resolved literal — broadcast side
    // of the postings join (absent terms drop here, exactly like the
    // former inner join with the docFreq table)
    val qdf = analyzed.flatMap { case (qid, ts) =>
      ts.flatMap(t => dfMap.get(t).map(df => (qid, t, ts.size, df)))
    }.toDF("qid", "term", "n_terms", "df")
    val post = Postings.build(docs, idCol, contentCol)
    val weighted = post.join(broadcast(qdf), "term")
      .withColumn("w", weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    scoreAndRank(weighted, cfg.topK, conjunctive)
  }

  /** Phrase top-k (ES match_phrase semantics at slop 0: the analyzed
    * phrase tokens must occur consecutively in order; slop > 0 relaxes
    * to ORDERED proximity with total slack <= slop — see
    * [[OrderedSpanMatchExpr]] for the exact contract). Qualifying docs
    * are scored with corpus-wide BM25 stats over the phrase's distinct
    * terms.
    *
    * Adjacency comes from POSITIONAL postings: candidates are an m-way
    * positional intersection over the query's terms only, and the SAME
    * positional build (persisted for the call) also supplies the
    * scoring postings and term df — TWO corpus tokenize passes total
    * (positional postings + the doclen/stats pass, which must see
    * zero-token docs the postings cannot carry), pruned to the phrase
    * terms by the broadcast query join, never a per-phrase-length
    * corpus rescan and never a source-text recheck of candidates (the
    * round-2 design rescanned candidate text once per distinct phrase
    * length; at 100 TB candidate text is the thing you cannot re-read).
    * The <= queries x topK result materializes eagerly so the cache can
    * be released before returning. */
  def phraseTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                 phrases: Seq[(Int, String)],
                 cfg: EngineConfig = EngineConfig.default,
                 slop: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.analyze.CodeTokenizer
    val analyzed = phrases
      .map { case (qid, text) => (qid, CodeTokenizer.tokenize(text).toSeq) }
      .filter(_._2.nonEmpty)
    if (analyzed.isEmpty)
      return spark.emptyDataset[Wand.Hit].toDF().orderBy("qid", "rank")
    val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, contentCol))
    phraseTopKOver(Postings.buildPositional(docs, idCol, contentCol),
      n, avgdl, analyzed, cfg, slop, persistInput = true)
  }

  /** Phrase top-k served from a PERSISTED index ([[graft.index.SegmentBuilder]]
    * layout v2): positions live in the shard-partitioned postings store
    * — built ONCE at ingest, exactly like ES indexes positions for text
    * fields by default (match_phrase never re-reads source text) — so a
    * phrase query is a partition- and row-group-pruned read of the
    * phrase terms' postings (shard dirs from the terms' own hash,
    * `term IN (...)` pushed to the parquet scan), never a corpus
    * tokenize. Corpus stats come from the index's stats table (computed
    * over ALL docs at ingest, including zero-token docs the postings
    * cannot carry). Same result contract as [[phraseTopK]]. */
  def phraseTopKIndexed(spark: SparkSession, indexDir: String,
                        phrases: Seq[(Int, String)],
                        cfg: EngineConfig = EngineConfig.default,
                        slop: Int = 0): DataFrame = {
    import spark.implicits._
    // empty-input early return BEFORE touching the handle: an all-empty
    // batch (stopwords/punctuation only) must stay a zero-I/O no-op —
    // handle construction reads the stats table, which on a non-index
    // path would turn "nothing to do" into an exception
    if (phrases.forall { case (_, t) => CodeTokenizer.tokenize(t).isEmpty })
      return spark.emptyDataset[Wand.Hit].toDF().orderBy("qid", "rank")
    // served through the process-level handle cache (the match_phrase
    // twin of Wand.handleFor): the one-shot path must not re-read stats
    // and re-derive per-term df on every call — warm calls over known
    // terms are ONE aggregation job. Result contract unchanged (the
    // handle computes df from the same pruned read this method used to).
    phraseHandleFor(spark, indexDir, cfg).topK(phrases, slop)
  }

  /** Process-level [[PhraseHandle]] cache. Freshness is a driver-side
    * file-listing signature over what phrase serving reads — postings +
    * stats: an append/compaction/restat lands new files and swaps the
    * handle (dropping its per-term df cache, which would otherwise go
    * stale), an untouched index reuses it with zero metadata jobs.
    * ONE handle per indexDir (config in the freshness check, not the
    * key — same bounded-cache rule as [[Wand.handleFor]]). */
  private val phraseHandleCache =
    scala.collection.concurrent.TrieMap[String, (SparkSession, EngineConfig, String, PhraseHandle)]()

  def phraseHandleFor(spark: SparkSession, indexDir: String,
                      cfg: EngineConfig = EngineConfig.default): PhraseHandle = synchronized {
    val sig = graft.index.SegmentBuilder.dirSig(s"$indexDir/postings") + "|" +
      graft.index.SegmentBuilder.dirSig(s"$indexDir/stats")
    phraseHandleCache.get(indexDir) match {
      case Some((s, c, cachedSig, h))
          if (s eq spark) && !s.sparkContext.isStopped && c == cfg && cachedSig == sig => h
      case _ =>
        val h = new PhraseHandle(spark, indexDir, cfg)
        phraseHandleCache.put(indexDir, (spark, cfg, sig, h))
        h
    }
  }

  /** The shard a term's postings land in — the DRIVER-SIDE twin of the
    * ingest writer's `pmod(xxhash64(term), shards)` (same XXH64 core,
    * same seed 42, same positive-mod), so serving can partition-prune
    * without running a Spark job. Parity is property-tested in
    * Bm25Spec. */
  def termShard(term: String, shards: Int): Int = {
    val h = termHash(term)
    (((h % shards) + shards) % shards).toInt
  }

  /** Driver-side twin of `xxhash64(term)` (same XXH64 core, seed 42) —
    * the store's thash clustering/pruning key. Parity with the writer
    * is property-tested in Bm25Spec via termShard. */
  def termHash(term: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(term), 42L)

  /** The phrase terms' positional postings, pruned at the SCAN: shard
    * directories from the terms' own hash (partition pruning, computed
    * driver-side via [[termShard]] — zero Spark jobs) and
    * `term IN (...)` pushed into the parquet reader (row-group stats +
    * dictionary pruning). This is the ONLY corpus touch a served phrase
    * query makes. The shard count comes from the index's OWN ingest
    * marker, never from a caller config — a silent mismatch would drop
    * postings from the pruned read instead of failing. */
  def prunedPositionalPostings(spark: SparkSession, indexDir: String,
                               terms: Seq[String]): DataFrame = {
    val all = spark.read.parquet(s"$indexDir/postings")
    require(all.columns.contains("positions"),
      s"$indexDir/postings has no positions column (pre-v2 layout) — re-ingest")
    require(all.columns.contains("thash"),
      s"$indexDir/postings has no thash column (pre-v3 layout) — re-ingest")
    val diskShards = graft.index.SegmentBuilder.indexShards(indexDir)
    val termShards = terms.map(termShard(_, diskShards)).distinct
    // three pruning levels, driver-computed (zero Spark jobs): shard
    // DIRECTORY pruning, thash ROW-GROUP pruning (files are
    // hash-clustered — layout v3 — so long-stats ranges are tight),
    // and the exact term filter (thash collisions are harmless)
    val hashes = terms.map(termHash)
    all.filter(col("shard").isInCollection(termShards))
      .filter(col("thash").isInCollection(hashes))
      .filter(col("term").isInCollection(terms))
      .select("term", "doc_id", "doclen", "tf", "positions")
  }

  /** Shared phrase core over a positional postings frame (full-corpus
    * build in [[phraseTopK]], which persists it; pruned index read in
    * [[phraseTopKIndexed]], which doesn't — rescanning a term-pruned
    * parquet read is cheaper than block-manager churn per batch).
    *
    * Serving shape (one aggregation, not a job chain): per-term df is
    * collected to the driver first (bounded by the QUERY's distinct
    * terms — tiny by construction), then ONE pass joins the broadcast
    * (qid, term, off, df) table against the positional postings and a
    * single groupBy(qid, doc) computes the candidate decision (all
    * offsets present + [[OrderedSpanMatchExpr]] over the gathered
    * position lists) AND the BM25 score (per-distinct-term weights
    * folded in ascending term order — bit-equal to the declarative
    * path) together. The r3 design chained candidates agg -> df agg ->
    * semi-join -> score agg -> checkpoint; at serving time those four
    * extra fixed-cost jobs were the latency, not the corpus work. */
  private def phraseTopKOver(posPostIn: DataFrame, n: Long, avgdl: Double,
                             analyzed: Seq[(Int, Seq[String])],
                             cfg: EngineConfig, slop: Int,
                             persistInput: Boolean = false): DataFrame = {
    val spark = posPostIn.sparkSession
    import spark.implicits._
    val posPost =
      if (persistInput)
        posPostIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else posPostIn
    try {
      // df restricted to the QUERY's terms before the collect — the
      // full-corpus path ([[phraseTopK]]) passes unpruned positional
      // postings, and an unfiltered groupBy-collect there would pull
      // the whole corpus vocabulary onto the driver
      val qterms = analyzed.flatMap(_._2).distinct
      val dfMap = posPost.filter(col("term").isInCollection(qterms))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ranked = phraseRankOver(posPost, n, avgdl, analyzed, cfg, slop, dfMap)
      if (persistInput) ranked.localCheckpoint(eager = true) else ranked
    } finally { if (persistInput) { posPost.unpersist() }; () }
  }

  /** The one-aggregation phrase pass given resolved per-term df (see
    * [[phraseTopKOver]] for the shape rationale). */
  private[query] def phraseRankOver(posPost: DataFrame, n: Long, avgdl: Double,
                                    analyzed: Seq[(Int, Seq[String])],
                                    cfg: EngineConfig, slop: Int,
                                    dfMap: Map[String, Long]): DataFrame = {
    val spark = posPost.sparkSession
    import spark.implicits._
    // score_me marks the FIRST offset of each distinct term: scoring
    // sums one weight per distinct term even when the phrase repeats a
    // term at several offsets
    val q = analyzed.flatMap { case (qid, ts) =>
      val seen = scala.collection.mutable.Set[String]()
      ts.zipWithIndex.map { case (t, off) =>
        (qid, t, off, ts.length, seen.add(t), dfMap.getOrElse(t, 0L))
      }
    }.toDF("qid", "term", "off", "m", "score_me", "df")
    val scored = posPost.join(broadcast(q), "term")
      .withColumn("w",
        weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("got"), first(col("m")).as("m"),
        sort_array(collect_list(struct(col("off"), col("positions")))).as("lists"),
        SumStructFieldExpr.sumField(
          sort_array(collect_list(when(col("score_me"),
            struct(col("term"), col("w"))))), 1, 2).as("score"))
      .filter(col("got") === col("m"))
      .filter(OrderedSpanMatchExpr.matches(
        transform(col("lists"), x => x.getField("positions")), lit(slop)))
    rankTopK(scored, cfg.topK)
  }

  /** Reusable phrase-serving handle — the match_phrase twin of
    * [[Wand.Handle]] (the documented serving measurement condition:
    * corpus stats read once, per-term metadata cached across batches).
    * df is computed from the LIVE positional postings the first time a
    * term is seen (one tiny pruned aggregation, <= query terms rows) and
    * cached, so a warm batch over known terms is ONE aggregation job.
    * Result contract identical to [[phraseTopKIndexed]].
    *
    * Staleness contract (same as [[Wand.Handle]]): the handle reflects
    * the index state at construction — after [[graft.index.SegmentBuilder.appendDocs]]
    * / a rebuild, construct a new handle (stats and cached df would
    * otherwise lag the appended docs). */
  final class PhraseHandle(spark: SparkSession, indexDir: String,
                           cfg: EngineConfig = EngineConfig.default) {
    import spark.implicits._
    private val (n, avgdl) = graft.index.SegmentBuilder.readStats(spark, indexDir)
    private val dfCache = scala.collection.concurrent.TrieMap[String, Long]()

    def topK(phrases: Seq[(Int, String)], slop: Int = 0): DataFrame = {
      val analyzed = phrases
        .map { case (qid, text) => (qid, CodeTokenizer.tokenize(text).toSeq) }
        .filter(_._2.nonEmpty)
      if (analyzed.isEmpty)
        return spark.emptyDataset[Wand.Hit].toDF().orderBy("qid", "rank")
      val terms = analyzed.flatMap(_._2).distinct
      val missing = terms.filterNot(dfCache.contains)
      if (missing.nonEmpty) {
        val got = prunedPositionalPostings(spark, indexDir, missing)
          .groupBy("term").agg(count(lit(1)).as("df"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        missing.foreach(t => dfCache.put(t, got.getOrElse(t, 0L)))
      }
      phraseRankOver(prunedPositionalPostings(spark, indexDir, terms),
        n, avgdl, analyzed, cfg, slop,
        terms.map(t => t -> dfCache(t)).toMap)
    }
  }

  /** Phrase candidate sets from positional postings, ALL phrases in one
    * corpus pass: the (qid, phrase-offset, term) table broadcasts
    * against the positional postings (term-pruned scan), each candidate
    * (qid, doc) gathers its per-offset position lists, and
    * [[OrderedSpanMatchExpr]] decides the match in one sweep. Duplicate
    * phrase terms are handled exactly (one position list per OFFSET).
    * Output: (qid, doc_id). */
  def phraseCandidates(docs: DataFrame, idCol: Column, contentCol: Column,
                       analyzed: Seq[(Int, Seq[String])],
                       slop: Int = 0): DataFrame =
    phraseCandidatesFrom(Postings.buildPositional(docs, idCol, contentCol),
      analyzed, slop)

  /** As [[phraseCandidates]], over an already-built positional postings
    * frame (lets [[phraseTopK]] share one persisted build between the
    * candidate and scoring branches). */
  def phraseCandidatesFrom(posPost: DataFrame,
                           analyzed: Seq[(Int, Seq[String])],
                           slop: Int = 0): DataFrame = {
    val spark = posPost.sparkSession
    import spark.implicits._
    val q = analyzed.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, off) => (qid, t, off, ts.length) }
    }.toDF("qid", "term", "off", "m")
    posPost.join(broadcast(q), "term")
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("got"), first(col("m")).as("m"),
        sort_array(collect_list(struct(col("off"), col("positions")))).as("lists"))
      // every phrase offset must be present (a doc missing any term
      // cannot match), then the ordered-span sweep decides
      .filter(col("got") === col("m"))
      .filter(OrderedSpanMatchExpr.matches(
        transform(col("lists"), x => x.getField("positions")), lit(slop)))
      .select(col("qid"), col("doc_id"))
  }

  /** Sum per-(qid, doc) weights in ascending term order, rank, take k.
    * Input needs columns (qid, doc_id, term, w) and, when `conjunctive`,
    * n_terms (docs must match every analyzed term — ES bool/must
    * semantics; OR/`match` semantics otherwise).
    *
    * Ranking is a bounded [[TopKByScore]] aggregation per qid (map-side
    * partial top-k heaps, k rows per partition per qid on the shuffle) —
    * NOT a per-qid window, which would sort every candidate of a hot
    * query inside one task (round-1 scale-killer; guarded in PlanSpec). */
  def scoreAndRank(weighted: DataFrame, k: Int, conjunctive: Boolean = false): DataFrame =
    rankTopK(scored(weighted, conjunctive), k)

  /** The pre-rank scored set (qid, doc_id, score[, matched, n_terms]) —
    * the distributed aggregation scoreAndRank ranks, exposed so cursor
    * paths (search_after) can restrict it before the bounded top-k. */
  def scored(weighted: DataFrame, conjunctive: Boolean = false): DataFrame = {
    val grouped = weighted
      .groupBy("qid", "doc_id")
      .agg(
        SumStructFieldExpr.sumField(
          sort_array(collect_list(struct(col("term"), col("w")))), 1, 2).as("score"),
        count(lit(1)).as("matched"),
        first(col("n_terms"), ignoreNulls = true).as("n_terms"))
    if (conjunctive) grouped.filter(col("matched") === col("n_terms"))
    else grouped
  }

  /** Rank (qid, doc_id, score) rows: bounded per-qid top-k aggregation
    * (map-side partial heaps, k rows per partition per qid on the
    * shuffle — never a per-qid window), rank ties broken doc_id asc. */
  def rankTopK(scores: DataFrame, k: Int): DataFrame =
    scores.groupBy("qid")
      .agg(TopKAgg.topK(k)(col("score"), col("doc_id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sd")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("sd.doc_id").as("doc_id"), col("sd.score").as("score"))
      .orderBy("qid", "rank")
}
