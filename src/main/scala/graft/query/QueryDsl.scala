package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analyze.CodeTokenizer
import graft.config.EngineConfig
import graft.index.Postings

/** The rest of the ES query DSL the reference's NEST client can issue
  * against its index (ElasticSearchPostgreSQLMigrationTool.csproj:32 —
  * NEST exposes the full query DSL, so a migration-tool user has bool /
  * prefix / fuzzy / more_like_this available today): re-expressed
  * Spark-first over the same postings pipeline and the same exact WAND
  * serving path as match/match_phrase.
  *
  * Rank-identity discipline is inherited from [[BM25]]: every scoring
  * path folds per-term weights in ascending term order, so engine and
  * DuckDB oracle produce bit-equal doubles. Where a clause does not
  * score (bool filter/must_not), the oracle adds +0.0 in place of the
  * skipped weight — adding 0.0 to a finite double is exact, so the two
  * fold shapes stay bit-equal.
  */
object QueryDsl {

  /** One ES bool query. Role semantics (ES bool query, public docs):
    * must and should clauses SCORE; filter clauses are required but
    * contribute no score; must_not excludes. minimum_should_match
    * defaults to 1 when there are no must/filter clauses, else 0; an
    * explicit `minimumShouldMatch` overrides the default (the ES knob —
    * a doc then needs >= that many distinct should terms REGARDLESS of
    * must/filter presence; a value above the should-term count matches
    * nothing, exactly as in ES).
    * Each clause string is analyzed with the standard query analyzer
    * (so "sparkFast" in must requires BOTH terms — ES match with
    * operator=and); after analysis the four role term-sets must be
    * disjoint within one query (a term in two roles would make the
    * score fold ambiguous — fail loud instead). */
  final case class BoolQuery(qid: Int, must: Seq[String] = Nil,
                             should: Seq[String] = Nil,
                             filter: Seq[String] = Nil,
                             mustNot: Seq[String] = Nil,
                             minimumShouldMatch: Option[Int] = None) {
    def analyzed: Seq[(String, String)] = {
      def terms(ss: Seq[String]) = ss.flatMap(CodeTokenizer.queryTerms).distinct
      val roled = terms(must).map(_ -> "must") ++ terms(should).map(_ -> "should") ++
        terms(filter).map(_ -> "filter") ++ terms(mustNot).map(_ -> "must_not")
      require(roled.map(_._1).distinct.size == roled.size,
        s"bool query $qid: a term appears in more than one role: $roled")
      roled
    }
    def nMust: Int = must.flatMap(CodeTokenizer.queryTerms).distinct.size
    def nFilter: Int = filter.flatMap(CodeTokenizer.queryTerms).distinct.size
    /** Effective minimum_should_match: explicit, else the ES default. */
    def msm: Int = minimumShouldMatch.getOrElse(
      if (nMust + nFilter > 0) 0 else 1)
  }

  /** ES fuzziness AUTO (public docs): exact for length <= 2, one edit
    * for 3..5, two edits above. */
  def autoFuzziness(term: String): Int =
    if (term.length <= 2) 0 else if (term.length <= 5) 1 else 2

  /** Default expansion cap for prefix/fuzzy (Lucene's
    * max_expansions default is 50). */
  val MaxExpansions = 50

  /** ES more_like_this defaults (public docs): a source-doc term is a
    * query-term candidate only if it occurs >= MltMinTf times in the
    * doc and in >= MltMinDf docs corpus-wide; the MltMaxTerms highest
    * tf*idf terms form the final disjunction. */
  val MltMinTf = 2
  val MltMinDf = 5
  val MltMaxTerms = 25

  /** Bool top-k over the corpus — one postings pass, one aggregation:
    * the broadcast (qid, term, role) table joins the postings, a single
    * groupBy(qid, doc) computes the score fold (must+should weights,
    * ascending term order) AND the per-role match counters the
    * candidate decision needs. No per-role job chain, no self-joins —
    * the role algebra rides the aggregate, so at 100 TB a bool query
    * costs exactly what a match query costs: one pruned postings join +
    * one shuffle.
    *
    * Output contract identical to [[BM25.topK]] (qid, rank, doc_id,
    * score; ties doc_id-asc). */
  def boolTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
               queries: Seq[BoolQuery],
               cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, contentCol))
    val q = queries.flatMap { bq =>
      bq.analyzed.map { case (t, role) => (bq.qid, t, role, bq.nMust, bq.nFilter, bq.msm) }
    }.toDF("qid", "term", "role", "n_must", "n_filter", "n_msm")
    val qdf = q.join(Postings.docFreq(post), "term")
    val weighted = post.join(broadcast(qdf), "term")
      .withColumn("w",
        BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    val grouped = weighted
      .groupBy("qid", "doc_id")
      .agg(
        // collect_list drops the when()'s nulls: only must/should rows
        // enter the fold, ascending term order — the oracle's
        // CASE-zero form is bit-equal (+0.0 is exact)
        aggregate(
          sort_array(collect_list(when(col("role").isin("must", "should"),
            struct(col("term"), col("w"))))),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("score"),
        count(when(col("role") === "must", 1)).as("must_got"),
        count(when(col("role") === "filter", 1)).as("filter_got"),
        count(when(col("role") === "must_not", 1)).as("not_got"),
        count(when(col("role") === "should", 1)).as("should_got"),
        first(col("n_must")).as("n_must"),
        first(col("n_filter")).as("n_filter"),
        first(col("n_msm")).as("n_msm"))
      .filter(col("must_got") === col("n_must") &&
        col("filter_got") === col("n_filter") &&
        col("not_got") === 0 &&
        col("should_got") >= col("n_msm"))
    BM25.rankTopK(grouped, cfg.topK)
  }

  /** Prefix top-k served from the segment index: each query's prefix
    * (lowercased — ES prefix queries are not analyzed) expands to the
    * lexicographically-first `maxExpansions` matching index terms via
    * the handle's cached term dictionary ([[Wand.Handle.expandPrefix]]
    * — a metadata-column scan, never posting payloads), and the
    * expanded disjunction serves through the SAME exact block-max WAND
    * path as a match query (ES rewrite=scoring_boolean: each expanded
    * term scores with its own df). An empty expansion yields zero hits
    * for that qid. */
  def prefixTopK(spark: SparkSession, indexDir: String,
                 queries: Seq[(Int, String)],
                 maxExpansions: Int = MaxExpansions,
                 cfg: EngineConfig = EngineConfig.default): DataFrame = {
    val h = Wand.handleFor(spark, indexDir, cfg)
    h.topKTerms(queries.map { case (qid, p) =>
      qid -> h.expandPrefix(p.trim.toLowerCase(java.util.Locale.ROOT), maxExpansions)
    })
  }

  /** Fuzzy top-k served from the segment index: the query term (single
    * term, lowercased — ES fuzzy queries are not analyzed) expands to
    * index terms within AUTO Levenshtein distance
    * ([[autoFuzziness]]; classic distance on both engine and oracle),
    * highest-df-first capped at `maxExpansions`
    * ([[Wand.Handle.expandFuzzy]]), served through exact WAND with each
    * expansion's own df. */
  def fuzzyTopK(spark: SparkSession, indexDir: String,
                queries: Seq[(Int, String)],
                maxExpansions: Int = MaxExpansions,
                cfg: EngineConfig = EngineConfig.default): DataFrame = {
    val h = Wand.handleFor(spark, indexDir, cfg)
    h.topKTerms(queries.map { case (qid, t0) =>
      val t = t0.trim.toLowerCase(java.util.Locale.ROOT)
      qid -> h.expandFuzzy(t, autoFuzziness(t), maxExpansions)
    })
  }

  /** Wildcard top-k served from the segment index: the pattern (`*` =
    * any sequence, `?` = one char; lowercased — ES wildcard queries are
    * not analyzed) expands against the cached term dictionary
    * ([[Wand.Handle.expandWildcard]], lexicographic-first
    * `maxExpansions`) and the expansion serves through the same exact
    * block-max WAND as match/prefix (rewrite=scoring_boolean: each term
    * scores with its own df). */
  def wildcardTopK(spark: SparkSession, indexDir: String,
                   queries: Seq[(Int, String)],
                   maxExpansions: Int = MaxExpansions,
                   cfg: EngineConfig = EngineConfig.default): DataFrame = {
    val h = Wand.handleFor(spark, indexDir, cfg)
    h.topKTerms(queries.map { case (qid, p) =>
      qid -> h.expandWildcard(p.trim.toLowerCase(java.util.Locale.ROOT), maxExpansions)
    })
  }

  /** ES search_after — deep pagination without deep sorting. The cursor
    * is the LAST hit of the previous page in the total order
    * (score desc, doc_id asc); the next page is the bounded top-k of
    * the scored set restricted to rows strictly AFTER the cursor. That
    * restriction is a broadcast of <= one (score, doc_id) pair per
    * query onto the distributed scored set, so EVERY page costs exactly
    * one bounded top-k aggregation — no global sort, no from+size
    * offset materialization (the thing ES forbids past 10k for the same
    * reason: page depth must not buy O(depth) memory). Queries without
    * a cursor entry yield no rows (a page-1 caller uses [[BM25.topK]]).
    * Scoring is bit-identical to page 1's pipeline (same term-ascending
    * fold), so cursor equality on the double score is exact. */
  def searchAfterTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                      queries: Seq[(Int, String)], cursors: Seq[(Int, Double, Long)],
                      cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, contentCol))
    val qterms = queries.flatMap { case (qid, text) =>
      val ts = CodeTokenizer.queryTerms(text)
      ts.map(t => (qid, t, ts.size))
    }.toDF("qid", "term", "n_terms")
    val qdf = qterms.join(Postings.docFreq(post), "term")
    val weighted = post.join(broadcast(qdf), "term")
      .withColumn("w",
        BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    val cur = cursors.toDF("qid", "c_score", "c_doc")
    val after = BM25.scored(weighted).join(broadcast(cur), "qid")
      .filter(col("score") < col("c_score") ||
        (col("score") === col("c_score") && col("doc_id") > col("c_doc")))
      .select("qid", "doc_id", "score")
    BM25.rankTopK(after, cfg.topK)
  }

  /** ES stats aggregation over a query's matching docs (match
    * semantics: >= 1 analyzed term): count/min/max/sum of `valueCol`
    * per query, avg derived as sum/count (both exactly-represented, so
    * the division is deterministic IEEE on engine and oracle alike).
    * One postings join + one distinct + one agg shuffle — the same
    * shape as [[termsAgg]] with a scalar reduce instead of buckets.
    *
    * Output: (qid, doc_count, min_v, max_v, sum_v, avg_v). */
  def statsAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
               queries: Seq[(Int, String)], valueCol: Column): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    docs.select(idCol.as("doc_id"), valueCol.as("v"))
      .join(matched, "doc_id")
      .groupBy("qid").agg(
        count(lit(1)).as("doc_count"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(col("v")).as("sum_v"))
      .withColumn("avg_v", col("sum_v").cast("double") / col("doc_count"))
      .orderBy("qid")
  }

  /** ES multi_match, type=best_fields (the default): the query analyzes
    * once, every field scores independently with ITS OWN statistics
    * (per-field postings, df, avgdl — exactly how ES scores each field
    * as a separate sub-query), and a doc's combined score is the MAX
    * over its per-field scores (best_fields, tie_breaker=0). One
    * postings pass per field — same asymptotics as ES, which runs one
    * term query per (field, term) — then a single union + max
    * aggregation; no field count-dependent join chain. Per-field folds
    * are term-ascending (bit-equal to the oracle); max of finite
    * doubles is exact. */
  def multiMatchTopK(spark: SparkSession, docs: DataFrame, idCol: Column,
                     fields: Seq[Column], queries: Seq[(Int, String)],
                     cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    require(fields.nonEmpty, "multi_match needs >= 1 field")
    val qterms = queries.flatMap { case (qid, text) =>
      val ts = CodeTokenizer.queryTerms(text)
      ts.map(t => (qid, t, ts.size))
    }.toDF("qid", "term", "n_terms")
    val perField = fields.map { fcol =>
      val post = Postings.build(docs, idCol, fcol)
      val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, fcol))
      val qdf = qterms.join(Postings.docFreq(post), "term")
      val weighted = post.join(broadcast(qdf), "term")
        .withColumn("w",
          BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
      BM25.scored(weighted).select("qid", "doc_id", "score")
    }
    val best = perField.reduce(_ unionByName _)
      .groupBy("qid", "doc_id").agg(max(col("score")).as("score"))
    BM25.rankTopK(best, cfg.topK)
  }

  /** ES histogram aggregation over a query's matching docs (match
    * semantics: >= 1 analyzed term): fixed-interval buckets of
    * `valueCol` with the ES default min_doc_count=0 gap fill — every
    * bucket between a query's min and max occupied key materializes,
    * empty ones at doc_count 0 (the histogram contract that makes ES
    * charts contiguous). Bucketing is one join + one agg shuffle; the
    * gap fill is a per-query sequence explode over the [min, max] key
    * span (bounded by the VALUE RANGE / interval, independent of corpus
    * size) joined back against the occupied buckets.
    *
    * Output: (qid, key, doc_count) ordered qid, key asc (the ES
    * histogram order). */
  def histogramAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                   queries: Seq[(Int, String)], valueCol: Column,
                   interval: Long): DataFrame = {
    import spark.implicits._
    require(interval > 0, s"histogram interval must be > 0, got $interval")
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    // ES floor-bucketing via exact integer arithmetic (v - pmod(v, i)
    // == floor(v/i)*i for all signed v) — no double division anywhere,
    // so bucket keys are exact at any magnitude
    val occupied = docs
      .select(idCol.as("doc_id"),
        (valueCol.cast("long") - pmod(valueCol.cast("long"), lit(interval))).as("key"))
      .join(matched, "doc_id")
      .groupBy("qid", "key").agg(count(lit(1)).as("doc_count"))
    // gap fill: [min, max] per qid is a driver-free bounded sequence
    // (span/interval keys) — ES's min_doc_count=0 default
    val span = occupied.groupBy("qid")
      .agg(min(col("key")).as("lo"), max(col("key")).as("hi"))
      .select(col("qid"),
        explode(sequence(col("lo"), col("hi"), lit(interval))).as("key"))
    span.join(occupied, Seq("qid", "key"), "left")
      .select(col("qid"), col("key"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"))
      .orderBy("qid", "key")
  }

  /** ES date_histogram aggregation (calendar_interval=day, the
    * dashboard staple) over a query's matching docs: per-day doc
    * counts with the ES min_doc_count=0 gap fill — every calendar day
    * between a query's first and last occupied day materializes (the
    * contract that makes Kibana time charts contiguous). Same shape as
    * [[histogramAgg]] with date_trunc keys and a day-step sequence for
    * the gap fill (bounded by the TIME SPAN, independent of corpus
    * size). Output: (qid, day 'yyyy-MM-dd', doc_count) ordered qid,
    * day. */
  def dateHistogramAgg(spark: SparkSession, docs: DataFrame, idCol: Column,
                       contentCol: Column, queries: Seq[(Int, String)],
                       tsCol: Column): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    val occupied = docs.select(idCol.as("doc_id"), to_date(tsCol).as("key"))
      .join(matched, "doc_id")
      .groupBy("qid", "key").agg(count(lit(1)).as("doc_count"))
    val span = occupied.groupBy("qid")
      .agg(min(col("key")).as("lo"), max(col("key")).as("hi"))
      .select(col("qid"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("key"))
    span.join(occupied, Seq("qid", "key"), "left")
      .select(col("qid"), date_format(col("key"), "yyyy-MM-dd").as("day"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"))
      .orderBy("qid", "day")
  }

  /** ES cardinality aggregation over a query's matching docs: distinct
    * count of `fieldCol`. Documented deviation: ES's cardinality is
    * HLL++-approximate by design (threshold-exact below
    * precision_threshold, default 3000 — at which scale it equals this
    * exact count); this operator is EXACT (one distinct-agg shuffle,
    * oracle-provable), and the sketch path for corpus-scale cardinality
    * is approx_count_distinct, already spec'd with error bounds
    * (`q_approx_distinct`). Output: (qid, cardinality). */
  def cardinalityAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                     queries: Seq[(Int, String)], fieldCol: Column): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    docs.select(idCol.as("doc_id"), fieldCol.as("v"))
      .join(matched, "doc_id")
      .groupBy("qid").agg(countDistinct(col("v")).as("cardinality"))
      .orderBy("qid")
  }

  /** ES sort clause (sort: [{field: desc}, {_id: asc}]) over a query's
    * matching docs — hits ranked by a FIELD, not by score (ES skips
    * scoring entirely when track_scores=false; so does this: no BM25
    * arithmetic anywhere in the plan). The ranking is the same bounded
    * per-query top-k aggregation as scored search (k rows per partition
    * on the shuffle — never a global sort), with the sort key standing
    * where the score stands; ES's total order (field desc, _id asc for
    * deterministic ties) maps to (key desc, doc_id asc).
    *
    * Output: (qid, rank, doc_id, sort_v) — sort_v the doc's field
    * value, echoed like ES's `sort` array on each hit. */
  def sortTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
               queries: Seq[(Int, String)], sortCol: Column,
               cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    // the top-k aggregator keys on a double; integral sort fields stay
    // exact through the round-trip only below 2^53 — fail loud beyond
    // (a lossy sort key would silently misrank)
    val keyed = docs.select(idCol.as("doc_id"), sortCol.cast("long").as("v"))
      .select(col("doc_id"),
        when(abs(col("v")) < lit(1L << 53), col("v").cast("double"))
          .otherwise(raise_error(format_string(
            "sortTopK: |sort value| >= 2^53 cannot round-trip a double exactly: %d",
            col("v")))).as("score"))
      .join(matched, "doc_id")
    BM25.rankTopK(keyed, cfg.topK)
      .select(col("qid"), col("rank"), col("doc_id"),
        col("score").cast("long").as("sort_v"))
  }

  /** Match top-k restricted by a structured predicate — the ES
    * bool-with-range/term-filter-context staple ("search within
    * lang + size window"). Filter context NEVER changes scores (ES
    * computes BM25 from index-wide stats regardless of filters), so
    * scoring is [[BM25.topK]]'s pipeline verbatim with the candidate
    * postings semi-joined against the docs passing the predicate
    * before aggregation. The predicate side is a column-pruned,
    * filter-pushed scan of the docs table (the parquet reader sees
    * lang/n_chars constraints); ES's equivalent is a corpus-sized
    * filter bitset — same asymptotics, declaratively. */
  def filteredTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                   queries: Seq[(Int, String)], predicate: Column,
                   cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, contentCol))
    val qterms = queries
      .flatMap { case (qid, text) =>
        val ts = CodeTokenizer.queryTerms(text)
        ts.map(t => (qid, t, ts.size))
      }.toDF("qid", "term", "n_terms")
    val qdf = qterms.join(Postings.docFreq(post), "term")
    val allowed = docs.filter(predicate).select(idCol.as("doc_id"))
    val weighted = post.join(broadcast(qdf), "term")
      .join(allowed, Seq("doc_id"), "left_semi")
      .withColumn("w",
        BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    BM25.scoreAndRank(weighted, cfg.topK)
  }

  /** ES terms aggregation (facets) over a query's matching docs: every
    * doc matching >= 1 analyzed term (match semantics) buckets by
    * `bucketCol`; the top `size` buckets per query rank by (count desc,
    * key asc) — ES's terms-agg default order with its deterministic
    * tie-break. One postings join + one distinct + one count shuffle;
    * the ranking window partitions per qid over at most the faceted
    * field's cardinality (a facet field is low-cardinality by design —
    * ES's own terms agg degrades the same way on high-cardinality
    * fields).
    *
    * Output: (qid, rank, bucket, cnt). */
  def termsAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
               queries: Seq[(Int, String)], bucketCol: Column,
               size: Int = 10): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    val bucketed = docs.select(idCol.as("doc_id"), bucketCol.as("bucket"))
      .join(matched, "doc_id")
      .groupBy("qid", "bucket").agg(count(lit(1)).as("cnt"))
    bucketed
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cnt").desc, col("bucket"))).cast("long"))
      .filter(col("rank") <= size)
      .select("qid", "rank", "bucket", "cnt")
      .orderBy("qid", "rank")
  }

  /** ES sub-aggregation tree — terms bucket with nested metrics (the
    * "group by category, metrics per group" shape that defines ES
    * analytics: `terms { field } aggs { avg, sum, min, max }`). The
    * nested metrics ride the SAME groupBy that counts the bucket —
    * an aggregation tree is one shuffle regardless of metric count,
    * never a job per sub-agg. Buckets rank (count desc, key asc), top
    * `size`; avg derives as sum/count (exact operands, deterministic
    * IEEE division — the stats-agg discipline).
    *
    * Output: (qid, rank, bucket, cnt, sum_v, avg_v). */
  def termsStatsAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                    queries: Seq[(Int, String)], bucketCol: Column, valueCol: Column,
                    size: Int = 10): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    val bucketed = docs
      .select(idCol.as("doc_id"), bucketCol.as("bucket"), valueCol.as("v"))
      .join(matched, "doc_id")
      .groupBy("qid", "bucket")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
    bucketed
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cnt").desc, col("bucket"))).cast("long"))
      .filter(col("rank") <= size)
      .withColumn("avg_v", col("sum_v").cast("double") / col("cnt"))
      .select("qid", "rank", "bucket", "cnt", "sum_v", "avg_v")
      .orderBy("qid", "rank")
  }

  /** ES percentiles aggregation over a query's matching docs — EXACT
    * formulation (documented deviation: ES uses t-digest approximation
    * by design; this is the linear-interpolation exact quantile — the
    * R-7/type-7 estimator both Spark's `percentile` and DuckDB's
    * `quantile_cont` implement, so the oracle is bit-comparable).
    * Quarter percentiles keep the interpolation fraction dyadic
    * ((n-1)*p mod 1 ∈ {0, .25, .5, .75}), so interpolated values are
    * exactly representable and render stably. The exact percentile
    * sorts WITHIN each (qid) group's value multiset — bounded by the
    * matching set; the corpus-scale approximate path is
    * approx_percentile, same plan shape.
    *
    * Output: (qid, p25, p50, p75). */
  def percentilesAgg(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                     queries: Seq[(Int, String)], valueCol: Column): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    docs.select(idCol.as("doc_id"), valueCol.as("v"))
      .join(matched, "doc_id")
      .groupBy("qid")
      .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col("qid"), col("ps").getItem(0).as("p25"),
        col("ps").getItem(1).as("p50"), col("ps").getItem(2).as("p75"))
      .orderBy("qid")
  }

  /** ES significant_terms aggregation (default-ish contract): buckets
    * of `bucketCol` whose share of the query's MATCHING set (foreground)
    * exceeds their share of the whole corpus (background), scored with
    * the ES JLH heuristic: (fgPct - bgPct) * (fgPct / bgPct) — rewards
    * both absolute lift and relative lift. Foreground counts, the
    * per-query foreground size, and the (tiny) background histogram
    * ride three bounded aggregations; the score arithmetic is the same
    * IEEE expression on engine and oracle (ratios of small ints,
    * rendered %.9f). Buckets with fgPct <= bgPct are not significant
    * (ES drops them); rank score desc, bucket asc, top `size`.
    *
    * Output: (qid, rank, bucket, fg_count, score). */
  def significantTermsAgg(spark: SparkSession, docs: DataFrame, idCol: Column,
                          contentCol: Column, queries: Seq[(Int, String)],
                          bucketCol: Column, size: Int = 10): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val q = queries.flatMap { case (qid, t) => CodeTokenizer.queryTerms(t).map(qid -> _) }
      .toDF("qid", "term")
    val matched = post.join(broadcast(q), "term")
      .select("qid", "doc_id").distinct()
    val fg = docs.select(idCol.as("doc_id"), bucketCol.as("bucket"))
      .join(matched, "doc_id")
      .groupBy("qid", "bucket").agg(count(lit(1)).as("fg_count"))
    val fgSize = matched.groupBy("qid").agg(count(lit(1)).as("fg_size"))
    val bg = docs.select(bucketCol.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("bg_count"))
    val bgSize = docs.count()
    val scored = fg
      .join(broadcast(fgSize), "qid")
      .join(broadcast(bg), "bucket")
      .withColumn("fgp", col("fg_count").cast("double") / col("fg_size"))
      .withColumn("bgp", col("bg_count").cast("double") / lit(bgSize.toDouble))
      .filter(col("fgp") > col("bgp"))
      .withColumn("score", (col("fgp") - col("bgp")) * (col("fgp") / col("bgp")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("bucket"))).cast("long"))
      .filter(col("rank") <= size)
      .select("qid", "rank", "bucket", "fg_count", "score")
      .orderBy("qid", "rank")
  }

  /** Token-level highlight window around the first match (ES
    * highlighter analogue: the plain highlighter re-analyzes the stored
    * text; fragments center on matches with matched terms wrapped in
    * <em></em>). This token-level contract is exactly mirrorable in the
    * oracle: fragment = analyzed tokens [first_match - context ..
    * first_match + context], matched tokens wrapped, space-joined.
    * Runs only over the query's top-k docs (<= queries x k rows), so
    * the interpreted higher-order lambdas cost nothing at any corpus
    * scale — the corpus-sized work stays in the ranking pass. */
  val HighlightContext = 3

  /** Top-k BM25 with highlights: (qid, rank, doc_id, score, snippet).
    * Ranking is [[BM25.topK]] verbatim; the snippet join touches only
    * the winners (broadcast of <= queries x k ids back onto the docs
    * scan — a pushed-down point lookup at scale, like ES fetching
    * stored fields for the hit page). */
  def highlightTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
                    queries: Seq[(Int, String)],
                    cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val hits = BM25.topK(spark, docs, idCol, contentCol, queries, cfg)
    val qt = queries.map { case (qid, t) =>
      (qid, CodeTokenizer.queryTerms(t))
    }.toDF("qid", "qterms")
    val src = docs.select(idCol.as("doc_id"),
      CodeTokenizer.tokensCol(contentCol).as("tokens"))
    val ctx = HighlightContext
    // the corpus-sized token scan streams against an EXPLICIT broadcast
    // of the <= queries x k hits (plus their query-term arrays): at any
    // scale the fetch phase is one broadcast hash join over the docs
    // scan, never a corpus shuffle on doc_id (spec-pinned)
    val withTok = src.join(broadcast(hits.join(broadcast(qt), "qid")), "doc_id")
    // 1-based index of the first matched token; guaranteed non-null for
    // a BM25 hit (the doc matched at least one query term)
    val firstIdx = array_min(filter(
      zip_with(col("tokens"), sequence(lit(1), size(col("tokens"))),
        (t, i) => when(array_contains(col("qterms"), t), i)),
      x => x.isNotNull))
    withTok
      .withColumn("fi", firstIdx)
      .withColumn("frag",
        slice(col("tokens"), greatest(col("fi") - ctx, lit(1)),
          // window end = fi + ctx inclusive; length adjusts when the
          // start clamps at 1
          col("fi") + ctx - greatest(col("fi") - ctx, lit(1)) + 1))
      .withColumn("snippet",
        array_join(transform(col("frag"), t =>
          when(array_contains(col("qterms"), t),
            concat(lit("<em>"), t, lit("</em>"))).otherwise(t)), " "))
      .select(col("qid"), col("rank"), col("doc_id"), col("score"), col("snippet"))
      .orderBy("qid", "rank")
  }

  /** ES match_phrase_prefix (the autocomplete staple) served from the
    * positional index: the query's last analyzed token is a PREFIX seed
    * expanded against the index term dictionary (lexicographic-first
    * `maxExpansions`, exactly [[prefixTopK]]'s expansion — ES caps the
    * same way), the leading tokens match exactly, and a doc qualifies
    * iff the exact tokens are consecutive and ANY expansion follows at
    * the next position (slop relaxes to ordered proximity, same
    * contract as match_phrase). Candidates come from the same pruned
    * positional read as phrase serving, with ONE extra pre-aggregation:
    * the expansions' position lists merge per (query, doc) into a
    * single last-offset list, so [[OrderedSpanMatchExpr]]'s
    * one-list-per-offset contract holds unchanged.
    *
    * Scoring contract (documented deviation): qualifying docs score
    * BM25 over the EXACT leading terms only — deterministic and
    * oracle-mirrorable, where ES blends the expansion set's dfs.
    * Requires >= 2 analyzed tokens (a one-token prefix query IS
    * [[prefixTopK]] — fail loud rather than silently rescore). */
  def phrasePrefixTopK(spark: SparkSession, indexDir: String,
                       queries: Seq[(Int, String)],
                       maxExpansions: Int = MaxExpansions,
                       cfg: EngineConfig = EngineConfig.default,
                       slop: Int = 0): DataFrame = {
    import spark.implicits._
    val handle = Wand.handleFor(spark, indexDir, cfg)
    val analyzed = queries.flatMap { case (qid, text) =>
      val ts = CodeTokenizer.tokenize(text).toSeq
      require(ts.size >= 2,
        s"match_phrase_prefix needs >= 2 analyzed tokens (qid $qid <$text>) — " +
          "a single-term prefix query is prefixTopK")
      val exps = handle.expandPrefix(ts.last, maxExpansions)
      if (exps.isEmpty) None else Some((qid, ts.init, exps))
    }
    if (analyzed.isEmpty)
      return spark.emptyDataset[Wand.Hit].toDF().orderBy("qid", "rank")
    val (n, avgdl) = graft.index.SegmentBuilder.readStats(spark, indexDir)
    val allTerms = analyzed.flatMap { case (_, ex, es) => ex ++ es }.distinct
    val posPost = BM25.prunedPositionalPostings(spark, indexDir, allTerms)
    // (qid, term, off, m): exact tokens at offsets 0..m-2, EVERY
    // expansion at offset m-1
    val q = analyzed.flatMap { case (qid, exact, exps) =>
      val m = exact.size + 1
      exact.zipWithIndex.map { case (t, off) => (qid, t, off, m) } ++
        exps.map(e => (qid, e, m - 1, m))
    }.toDF("qid", "term", "off", "m")
    // stage 1: merge position lists per (query, doc, offset) — several
    // expansion terms may occupy the last offset; exact offsets are
    // single-term so the merge is the identity there
    val stage1 = posPost.join(broadcast(q), "term")
      .groupBy("qid", "doc_id", "off")
      .agg(sort_array(flatten(collect_list(col("positions")))).as("pos"),
        first(col("m")).as("m"))
    val cand = stage1.groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("got"), first(col("m")).as("m"),
        sort_array(collect_list(struct(col("off"), col("pos")))).as("lists"))
      .filter(col("got") === col("m"))
      .filter(OrderedSpanMatchExpr.matches(
        transform(col("lists"), x => x.getField("pos")), lit(slop)))
      .select("qid", "doc_id")
    val exactTerms = analyzed.flatMap(_._2).distinct
    // per-term df from the same pruned read (bounded by the query's
    // exact terms — tiny by construction)
    val dfMap = posPost.filter(col("term").isInCollection(exactTerms))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sq = analyzed.flatMap { case (qid, exact, _) =>
      exact.distinct.map(t => (qid, t, dfMap.getOrElse(t, 0L)))
    }.toDF("qid", "term", "df")
    val weighted = posPost.join(broadcast(sq), "term")
      .join(cand, Seq("qid", "doc_id"), "left_semi")
      .withColumn("w",
        BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    val grouped = weighted.groupBy("qid", "doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("score"))
    BM25.rankTopK(grouped, cfg.topK)
  }

  /** more_like_this top-k: for each (qid, source doc), select the
    * [[MltMaxTerms]] highest-tf*idf source-doc terms (tf >= MltMinTf,
    * df >= MltMinDf — the ES defaults; idf is the shared BM25 idf, ties
    * term-asc), then rank the corpus by BM25 over that disjunction,
    * excluding the source doc itself.
    *
    * Everything derives from ONE postings build: the source docs' term
    * stats are postings rows filtered to the source ids (at scale: ES
    * reads the doc's term vector — here a pushed-down id filter), the
    * selection window partitions by qid (per-partition data = one doc's
    * vocabulary — bounded by doclen, never corpus-sized), and the
    * scoring join broadcasts <= queries x MltMaxTerms selected terms. */
  def mltTopK(spark: SparkSession, docs: DataFrame, idCol: Column, contentCol: Column,
              queries: Seq[(Int, Long)],
              cfg: EngineConfig = EngineConfig.default): DataFrame = {
    import spark.implicits._
    val post = Postings.build(docs, idCol, contentCol)
    val (n, avgdl) = Postings.corpusStats(Postings.doclens(docs, idCol, contentCol))
    val qsrc = queries.toDF("qid", "src_doc")
    val dfTbl = Postings.docFreq(post)
    val srcTerms = post
      .join(broadcast(qsrc), post("doc_id") === qsrc("src_doc"))
      .filter(col("tf") >= MltMinTf)
      .join(dfTbl, "term")
      .filter(col("df") >= MltMinDf)
      .withColumn("interest",
        col("tf") * log(lit(1.0) +
          (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val selected = srcTerms
      .withColumn("sel_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("interest").desc, col("term"))))
      .filter(col("sel_rank") <= MltMaxTerms)
      .select("qid", "term", "src_doc", "df")
    val weighted = post.join(broadcast(selected), "term")
      .filter(col("doc_id") =!= col("src_doc"))
      .withColumn("w",
        BM25.weightCol(col("tf"), col("doclen"), col("df"), n, avgdl, cfg.k1, cfg.b))
    val grouped = weighted
      .groupBy("qid", "doc_id")
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("term"), col("w")))),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("score"))
    BM25.rankTopK(grouped, cfg.topK)
  }
}
