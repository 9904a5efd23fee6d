package graft.oracle

import graft.analyze.CodeTokenizer
import graft.query.BM25

/** Independent single-machine BM25 scorer — the test stand-in for "the
  * reference query set the migration tool's Elasticsearch index would
  * return" (the reference itself is only an ES client:
  * /root/reference/Services/ElasticSearchService.cs:150-229). No Spark.
  *
  * Used by ScalaTest golden suites for rank-identity: docIDs AND scores
  * must match the engine exactly (deterministic tie-break: score desc,
  * docId asc; summation in ascending term order).
  */
object NaiveBM25 {

  final case class Hit(docId: Long, score: Double)

  /** Score `query` against `docs` = (docId, content); returns top-k. */
  def topK(docs: Seq[(Long, String)], query: String, k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): Seq[Hit] = {
    val tokenized: Seq[(Long, Array[String])] =
      docs.map { case (id, c) => (id, CodeTokenizer.tokenize(c)) }
    val n = tokenized.size.toLong
    val avgdl = if (n == 0) 0.0 else tokenized.map(_._2.length.toLong).sum.toDouble / n
    val terms = CodeTokenizer.queryTerms(query)
    // df per query term
    val dfMap: Map[String, Long] = terms.map { t =>
      t -> tokenized.count(_._2.contains(t)).toLong
    }.toMap
    val hits = tokenized.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      // ascending term order, like the engine's sort_array aggregation
      val ws = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        val df = dfMap(t)
        if (tf > 0 && df > 0) Some(BM25.weight(tf, dl, df, n, avgdl, k1, b)) else None
      }
      if (ws.isEmpty) None
      else Some(Hit(id, ws.foldLeft(0.0)(_ + _)))
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Phrase (adjacency, slop 0): docs containing the analyzed terms
    * consecutively in order, scored over the phrase's distinct terms
    * with corpus-wide stats. */
  def phraseTopK(docs: Seq[(Long, String)], phrase: String, k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): Seq[Hit] = {
    val terms = CodeTokenizer.tokenize(phrase).toSeq
    if (terms.isEmpty) return Seq.empty
    val tokenized = docs.map { case (id, c) => (id, CodeTokenizer.tokenize(c)) }
    val n = tokenized.size.toLong
    val avgdl = if (n == 0) 0.0 else tokenized.map(_._2.length.toLong).sum.toDouble / n
    val distinctSorted = terms.distinct.sorted
    val dfMap = distinctSorted.map(t => t -> tokenized.count(_._2.contains(t)).toLong).toMap
    val hits = tokenized.flatMap { case (id, toks) =>
      val matches = toks.length >= terms.length &&
        toks.sliding(terms.length).exists(_.toSeq == terms)
      if (!matches) None
      else {
        val dl = toks.length.toLong
        val ws = distinctSorted.map { t =>
          BM25.weight(toks.count(_ == t).toLong, dl, dfMap(t), n, avgdl, k1, b)
        }
        Some(Hit(id, ws.foldLeft(0.0)(_ + _)))
      }
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k)
  }
}
