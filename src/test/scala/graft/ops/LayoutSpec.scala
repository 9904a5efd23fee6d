package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Physical-layout craft: bucketed tables co-locate join keys so the
  * join runs with NO shuffle exchange — the lever that turns the
  * biggest 100 TB joins from full-network shuffles into local merges
  * (SURVEY.md §0 / build-plan "co-located joins via bucketing"). */
class LayoutSpec extends SparkSuite {

  test("bucketed co-located join plans without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle; the only exchange
      // allowed is the one feeding the final aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")

      // and it still computes the right thing
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
