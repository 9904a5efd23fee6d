package graft

import graft.analyze.CodeTokenizer

class GraftExtensionsSpec extends SparkSuite {

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_sql")
    val rows = spark.sql(
      """SELECT doc_id, graft_tokenize(text) AS toks,
        |       graft_token_tf(text).doclen AS doclen,
        |       size(graft_shingles(graft_tokenize(text))) AS n_shingles
        |FROM docs_sql ORDER BY doc_id LIMIT 20""".stripMargin).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      assert(toks.nonEmpty)
      assert(r.getLong(2) === toks.size.toLong)
      assert(r.getInt(3) === math.max(0, toks.size - 2))
    }
    // SQL path equals the canonical scala tokenizer
    val one = spark.sql(
      "SELECT graft_tokenize('parseCSVLine the access_log 42')").head().getSeq[String](0)
    assert(one === CodeTokenizer.tokenize("parseCSVLine the access_log 42").toSeq)
  }

  test("round-3 SQL surface: positions, cosine, ordered phrase match") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_token_positions('alpha beta alpha').pairs AS pairs,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos_same,
        |  graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS cos_orth,
        |  graft_phrase_match(array(array(0, 4), array(2)), 1) AS gap_ok,
        |  graft_phrase_match(array(array(0), array(2)), 0) AS gap_too_far
        |""".stripMargin).head()
    val pairs = r.getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(p => p.getString(0) -> p.getSeq[Int](2)).toMap ===
      Map("alpha" -> Seq(0, 2), "beta" -> Seq(1)))
    assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 0.0)
    assert(r.getBoolean(3) && !r.getBoolean(4))
  }

  test("extensions class installs the functions on a fresh session") {
    val ext = new GraftExtensions
    // apply against the running session's extension point via clone
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT size(graft_tokenize('alpha beta'))").head().getInt(0) === 2)
    assert(ext != null)
  }
}
