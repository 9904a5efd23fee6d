package graft

/** The exact driver contract: entry() must return rows; every queries()
  * entry must run at sf0.001; every oracleSql key must exist in queries. */
class SparkEntrySpec extends SparkSuite {

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries; all queries run at sf0.001") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet.diff(qs.keySet)
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}
