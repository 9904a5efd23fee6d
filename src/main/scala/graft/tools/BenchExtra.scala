package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, TmpFs}

/** Extra benchmark main for the optimization loop (guide §1.4): times
  * ONLY the headline queries (no indexing/scaling/lifecycle phases) with
  * the same methodology as [[graft.Bench]] — noop sink, best-of-2,
  * labelled jobs — so per-query deltas can be measured in ~1 minute
  * instead of the full bench's ~17. Never replaces the canonical bench:
  * BENCH artifacts come from [[graft.Bench]] alone.
  *
  * Usage: sbt "runMain graft.tools.BenchExtra [query ...]"
  *   (no args = every query in SparkEntry.queries, bench order)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_BENCH_REPEATS. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("GRAFT_BENCH_REPEATS", "2").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (TmpFs.available)
      b.config("spark.local.dir", s"${TmpFs.base}/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = SparkEntry.queries
    val names =
      if (args.nonEmpty) args.toSeq
      else queries.keys.toSeq.sorted
    val times = names.map { name =>
      require(queries.contains(name), s"unknown query <$name>")
      def once(): Double = {
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ss = (1 to repeats).map(_ => once())
      (name, ss)
    }
    val js = times.map { case (k, ss) =>
      "\"" + k + "\":" + ss.map(s => math.rint(s * 1000) / 1000).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = times.map(_._2.min).sum
    println(s"""{"metric":"extra_total","value":$total,"unit":"sec","samples":$js}""")
    spark.stop()
  }
}
