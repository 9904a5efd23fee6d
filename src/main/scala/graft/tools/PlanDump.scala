package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, TmpFs}

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan evidence for the optimization round (plans/r06/<q>_<tag>.txt).
  *
  * Usage: sbt "runMain graft.tools.PlanDump <outDir> <tag> [query ...]"
  *   (no query args = all declared queries). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query ...]")
    val outDir = args(0); val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (TmpFs.available)
      b.config("spark.local.dir", s"${TmpFs.base}/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val queries = SparkEntry.queries
    val names = if (args.length > 2) args.drop(2).toSeq else queries.keys.toSeq.sorted
    names.foreach { name =>
      require(queries.contains(name), s"unknown query <$name>")
      val df = queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
