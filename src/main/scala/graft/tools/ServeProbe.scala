package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev profiling harness for the SERVING paths: replicates Bench's qps
  * sections (WAND + phrase batches against the persisted index) with
  * per-batch wall times so a serving regression can be localized.
  * Usage: runMain graft.tools.ServeProbe [cores] [reps]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (graft.TmpFs.available)
      b.config("spark.local.dir", s"${graft.TmpFs.base}/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val idx = SparkEntry.ensureIndex(spark, sfDir)
    println(f"[serve] ensureIndex ${(System.nanoTime() - t0) / 1e9}%.2f s -> $idx")

    def batchTimes(label: String, n: Int)(once: => Unit): Unit = {
      once // warmup
      val times = (1 to reps).map { _ =>
        val s = System.nanoTime(); once; (System.nanoTime() - s) / 1e9
      }
      val qps = reps * n / times.sum
      println(f"[serve] $label%-10s qps $qps%6.2f   batches " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    val handle = new graft.query.Wand.Handle(spark, idx, SparkEntry.IndexCfg)
    batchTimes("wand", SparkEntry.FtQuerySet.size) {
      handle.topK(SparkEntry.FtQuerySet).write.mode("overwrite").format("noop").save()
    }
    // same measurement condition as Bench: the reusable serving handle
    val phraseHandle = new graft.query.BM25.PhraseHandle(spark, idx, SparkEntry.IndexCfg)
    batchTimes("phrase", SparkEntry.PhraseQuerySet.size) {
      phraseHandle.topK(SparkEntry.PhraseQuerySet)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
