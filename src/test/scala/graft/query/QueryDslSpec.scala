package graft.query

import java.nio.file.Files
import scala.reflect.io.Directory

import graft.SparkSuite
import graft.config.EngineConfig
import graft.index.SegmentBuilder
import org.apache.spark.sql.functions._

/** Semantic contracts of the extended ES query DSL (bool / prefix /
  * fuzzy / more_like_this) — the driver oracle pins engine-vs-DuckDB
  * identity on the corpus queries; this spec pins the ROLE ALGEBRA and
  * expansion determinism on corpora crafted so the expected answer is
  * computable by hand. */
class QueryDslSpec extends SparkSuite {
  import QueryDsl._

  private val cfg = EngineConfig.default.copy(
    shards = 2, buildPartitions = 2, blockSize = 16, saltTargetPostings = 128)

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def indexOf(rows: (Long, String)*): String = {
    val dir = Files.createTempDirectory("graft_dsl_").toString
    SegmentBuilder.ingest(spark, df(rows: _*), col("doc_id"), col("text"), dir, cfg)
    SegmentBuilder.buildAll(spark, dir, cfg)
    sys.addShutdownHook(new Directory(new java.io.File(dir)).deleteRecursively())
    dir
  }

  private def hits(res: org.apache.spark.sql.DataFrame): Map[Int, Seq[(Long, Double)]] =
    res.collect().groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq)
      .toMap

  private val boolDocs = Seq(
    1L -> "alpha beta gamma",
    2L -> "alpha beta",
    3L -> "alpha delta",
    4L -> "beta delta")

  test("bool: must_not excludes, must requires, filter requires without scoring") {
    val d = df(boolDocs: _*)
    val r = hits(boolTopK(spark, d, col("doc_id"), col("text"), Seq(
      BoolQuery(1, must = Seq("alpha"), mustNot = Seq("delta")),
      BoolQuery(2, filter = Seq("alpha"), should = Seq("gamma")),
      BoolQuery(3, must = Seq("alpha", "beta")),
      BoolQuery(4, should = Seq("gamma", "delta")))))
    assert(r(1).map(_._1).toSet === Set(1L, 2L), "must alpha, not delta")
    // filter qualifies all alpha docs; only gamma scores — docs 2,3
    // qualify at score 0.0 exactly (ES filter-context semantics)
    assert(r(2).map(_._1).toSet === Set(1L, 2L, 3L))
    assert(r(2).head._1 === 1L, "the should match ranks first")
    assert(r(2).filter(_._1 != 1L).forall(_._2 === 0.0), "filter context does not score")
    assert(r(3).map(_._1).toSet === Set(1L, 2L), "multi-must is conjunctive")
    assert(r(4).map(_._1).toSet === Set(1L, 3L, 4L), "pure should: minimum_should_match=1")
  }

  test("bool: absent must empties, absent should leaves must intact, camelCase analyzes") {
    val d = df(boolDocs: _*)
    val r = boolTopK(spark, d, col("doc_id"), col("text"), Seq(
      BoolQuery(1, must = Seq("zzz"), should = Seq("alpha")),
      BoolQuery(2, must = Seq("alpha"), should = Seq("zzz")),
      BoolQuery(3, must = Seq("alphaBeta"))))
    val by = hits(r)
    assert(!by.contains(1), "absent must term -> no hits")
    assert(by(2).map(_._1).toSet === Set(1L, 2L, 3L))
    assert(by(3).map(_._1).toSet === Set(1L, 2L), "camelCase must == two required terms")
  }

  test("bool: a term in two roles fails loud; must-only is bit-equal to conjunctive match") {
    assertThrows[IllegalArgumentException](
      BoolQuery(1, must = Seq("alpha"), should = Seq("alpha")).analyzed)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaBool = hits(boolTopK(spark, docs, col("doc_id"), col("text"),
      Seq(BoolQuery(3, must = Seq("spark fast query")))))
    val viaConj = hits(BM25.topK(spark, docs, col("doc_id"), col("text"),
      Seq(3 -> "spark fast query"), conjunctive = true))
    assert(viaBool === viaConj, "ES must == match operator=and, scores bit-equal")
  }

  private lazy val fuzzyIdx = indexOf(
    1L -> "spark engine", 2L -> "spork engine", 3L -> "stark engine",
    4L -> "sparkle engine", 5L -> "span engine")

  test("fuzzy: AUTO fuzziness boundaries") {
    assert(autoFuzziness("ab") === 0)
    assert(autoFuzziness("abc") === 1)
    assert(autoFuzziness("abcde") === 1)
    assert(autoFuzziness("abcdef") === 2)
  }

  test("fuzzy: classic-Levenshtein expansion at AUTO distance, served exactly") {
    val r = hits(fuzzyTopK(spark, fuzzyIdx, Seq(1 -> "spark"), cfg = cfg))
    // d=1 neighbors of 'spark' in the corpus: spark, spork, stark —
    // sparkle (d=2) and span (d=2) stay out
    assert(r(1).map(_._1).toSet === Set(1L, 2L, 3L))
    val h = Wand.handleFor(spark, fuzzyIdx, cfg)
    assert(h.expandFuzzy("spark", 1, 50).toSet === Set("spark", "spork", "stark"))
    // highest-df first: 'engine' (df 5) leads any d=2 expansion set
    assert(h.expandFuzzy("engine", 2, 50).head === "engine")
  }

  test("prefix: lexicographic-first expansion, cap respected, served exactly") {
    val h = Wand.handleFor(spark, fuzzyIdx, cfg)
    assert(h.expandPrefix("sp", 50) === Seq("span", "spark", "sparkle", "spork"))
    assert(h.expandPrefix("sp", 2) === Seq("span", "spark"), "cap keeps the lexicographic head")
    val r = hits(prefixTopK(spark, fuzzyIdx, Seq(1 -> "SPAR", 2 -> "qqq"), cfg = cfg))
    // 'SPAR' lowercases (prefix queries are unanalyzed but case-folded):
    // spark + sparkle -> docs 1 and 4; absent prefix -> no rows
    assert(r(1).map(_._1).toSet === Set(1L, 4L))
    assert(!r.contains(2))
  }

  test("prefix serving is rank-identical to a declarative disjunction over the expansion") {
    val docs = df(fuzzyIdx2Docs: _*)
    val idx = indexOf(fuzzyIdx2Docs: _*)
    val h = Wand.handleFor(spark, idx, cfg)
    val exp = h.expandPrefix("ga", 50)
    val served = hits(prefixTopK(spark, idx, Seq(1 -> "ga"), cfg = cfg))
    val declarative = hits(BM25.topK(spark, docs, col("doc_id"), col("text"),
      Seq(1 -> exp.mkString(" ")), cfg))
    assert(served === declarative, "WAND over the expansion == declarative BM25, bit-equal")
  }

  private val fuzzyIdx2Docs = Seq(
    1L -> "gamma ray burst", 2L -> "gauge field theory", 3L -> "gamma gauge mix",
    4L -> "ray theory only")

  test("terms agg: buckets over matching docs, ES order (count desc, key asc), absent term empty") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha one", "en"), (2L, "alpha two", "en"), (3L, "alpha three", "en"),
      (4L, "alpha vier", "de"), (5L, "beta funf", "de"), (6L, "beta kaks", "aa"))
      .toDF("doc_id", "text", "lang")
    val r = termsAgg(spark, d, col("doc_id"), col("text"),
      Seq(1 -> "alpha", 2 -> "beta", 3 -> "zzz"), col("lang"))
      .collect().groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(x => (x.getString(2), x.getLong(3))).toSeq)
      .toMap
    assert(r(1) === Seq("en" -> 3L, "de" -> 1L))
    assert(r(2) === Seq("aa" -> 1L, "de" -> 1L), "count tie breaks key-asc (ES _key order)")
    assert(!r.contains(3))
  }

  test("highlight: window centers on first match, clamps at edges, wraps every matched token") {
    val d = df(
      1L -> "one two three alpha four five six seven",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "noise words only here")
    def snippets(q: String) =
      highlightTopK(spark, d, col("doc_id"), col("text"), Seq(1 -> q))
        .collect().map(r => r.getLong(2) -> r.getString(4)).toMap
    val s1 = snippets("alpha")
    assert(s1(1L) === "one two three <em>alpha</em> four five six",
      "+-3 token window around the first match")
    assert(s1(2L) === "<em>alpha</em> beta gamma delta",
      "window start clamps at the first token")
    assert(!s1.contains(3L))
    val s2 = snippets("alpha gamma")
    assert(s2(2L) === "<em>alpha</em> beta <em>gamma</em> delta",
      "every matched token in the window is wrapped")
  }

  test("mlt: tf/df thresholds select terms, source doc is excluded, absent doc yields nothing") {
    // 'widget' appears twice in doc 1 (tf>=2) and in 6 docs (df>=5);
    // 'gear' has tf 1 in doc 1 and df 2 — below both thresholds
    val rows = Seq(1L -> "widget widget gear") ++
      (2L to 6L).map(i => i -> "widget bolt") :+ (7L -> "gear bolt")
    val d = df(rows: _*)
    val r = hits(mltTopK(spark, d, col("doc_id"), col("text"),
      Seq(1 -> 1L, 2 -> 999L)))
    assert(r(1).map(_._1).toSet === (2L to 6L).toSet,
      "docs sharing the selected term, source excluded")
    assert(!r.contains(2), "absent source doc -> no hits")
  }
}
