package graft.query

import graft.SparkSuite
import graft.SparkEntry
import graft.index.Postings
import graft.oracle.NaiveBM25
import org.apache.spark.sql.functions._

/** Golden rank-identity: the Spark engine's top-k BM25 must equal the
  * independent single-machine oracle — docIDs AND scores, exactly
  * (deterministic tie-break score desc, docId asc). Mirrors the
  * reference's source-vs-sink reconciliation role
  * (/root/reference/Services/MigrationService.cs:479,633-639). */
class Bm25Spec extends SparkSuite {

  private lazy val docsDf =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val docsLocal: Seq[(Long, String)] =
    docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("top-10 rank identity vs naive oracle on all reference queries") {
    val engine = BM25.topK(spark, docsDf, col("doc_id"), col("text"),
      SparkEntry.FtQuerySet).collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap

    for ((qid, text) <- SparkEntry.FtQuerySet) {
      val expect = NaiveBM25.topK(docsLocal, text, 10).map(h => (h.docId, h.score))
      val got = engine.getOrElse(qid, Seq.empty)
      assert(got.map(_._1) === expect.map(_._1), s"docIDs differ for q$qid <$text>")
      got.zip(expect).foreach { case ((d, s), (_, es)) =>
        assert(s === es, s"score differs for q$qid doc $d (exact-double check)")
      }
    }
  }

  test("empty results for stopword-only and absent-term queries") {
    val res = BM25.topK(spark, docsDf, col("doc_id"), col("text"),
      Seq(5 -> "the a of", 6 -> "zzznotfound"))
    assert(res.count() === 0)
  }

  test("camelCase query is rank-identical to its multi-term form") {
    val res = BM25.topK(spark, docsDf, col("doc_id"), col("text"),
      Seq(3 -> "spark fast query", 4 -> "sparkFastQuery")).collect()
    val by = res.groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq)
    assert(by(3) === by(4))
  }

  test("postings invariants: sum(tf) == sum(doclen); df == distinct docs per term") {
    val post = Postings.build(docsDf, col("doc_id"), col("text"))
    val dl = Postings.doclens(docsDf, col("doc_id"), col("text"))
    val sumTf = post.agg(sum("tf")).head().getLong(0)
    val sumDl = dl.agg(sum("doclen")).head().getLong(0)
    assert(sumTf === sumDl)
    val dfA = Postings.docFreq(post).orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    val dfB = post.groupBy("term").agg(countDistinct("doc_id").as("df"))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dfA.toSeq === dfB.toSeq)
  }

  test("phrase queries: engine == oracle, adjacency enforced") {
    val engine = BM25.phraseTopK(spark, docsDf, col("doc_id"), col("text"),
      SparkEntry.PhraseQuerySet).collect()
      .groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap
    for ((qid, text) <- SparkEntry.PhraseQuerySet) {
      val oracle = graft.oracle.NaiveBM25.phraseTopK(docsLocal, text, 10)
        .map(h => (h.docId, h.score))
      assert(engine.getOrElse(qid, Seq.empty) === oracle, s"phrase q$qid <$text>")
    }
    // the adjacency-impossible pair must return nothing even though a
    // conjunctive query for the same terms does match docs
    assert(!engine.contains(5))
    val conj = BM25.topK(spark, docsDf, col("doc_id"), col("text"),
      Seq(5 -> "dup table"), conjunctive = true)
    assert(conj.count() > 0)
  }

  test("deterministic docId tie-break: equal-score docs ordered by docId asc") {
    // Synthetic corpus with exact duplicates -> guaranteed score ties.
    val docs = (0L until 20L).map(i => (i, if (i % 2 == 0) "alpha beta gamma" else "delta epsilon"))
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val res = BM25.topK(spark, df, col("doc_id"), col("text"), Seq(1 -> "alpha")).collect()
    val ids = res.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(ids === Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L, 16L, 18L))
    val oracle = NaiveBM25.topK(docs, "alpha", 10)
    assert(oracle.map(_.docId) === ids)
    res.foreach(r => assert(r.getDouble(3) === oracle.head.score))
  }
}
