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
    * defaults to 1 when there are no must/filter clauses, else 0.
    * Each clause string is analyzed with the standard query analyzer
    * (so "sparkFast" in must requires BOTH terms — ES match with
    * operator=and); after analysis the four role term-sets must be
    * disjoint within one query (a term in two roles would make the
    * score fold ambiguous — fail loud instead). */
  final case class BoolQuery(qid: Int, must: Seq[String] = Nil,
                             should: Seq[String] = Nil,
                             filter: Seq[String] = Nil,
                             mustNot: Seq[String] = Nil) {
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
      bq.analyzed.map { case (t, role) => (bq.qid, t, role, bq.nMust, bq.nFilter) }
    }.toDF("qid", "term", "role", "n_must", "n_filter")
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
        first(col("n_filter")).as("n_filter"))
      .filter(col("must_got") === col("n_must") &&
        col("filter_got") === col("n_filter") &&
        col("not_got") === 0 &&
        (col("n_must") + col("n_filter") > 0 || col("should_got") > 0))
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
    val withTok = hits.join(broadcast(qt), "qid").join(src, "doc_id")
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
