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
}
