package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.SegmentBuilder

/** Throwaway measurement harness (not part of the engine surface):
  * interleaved A/B of corpus-partition granularity at one core count,
  * with ingest and buildAll timed separately, all in ONE JVM so host
  * noise hits both arms alike. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("PROBE_CORES", "16").toInt
    val replicas = sys.env.getOrElse("PROBE_REPLICAS", "1000").toInt
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "3").toInt
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder().master(s"local[$cores]").appName("probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SAME cfg and corpus generator as the bench it explains — the
    // probe's only degree of freedom is the task-layout granularity
    val cfg = graft.SparkEntry.IndexCfg.copy(buildPartitions = 32)
    val tmpBase = if (new java.io.File("/dev/shm").isDirectory)
      java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")

    def run(tag: String, parts: Int): Unit = {
      val dir = Files.createTempDirectory(tmpBase, "probe_").toString
      try {
        val corpus = graft.Bench.benchDocs(spark, sfDir, replicas, parts)
        val t0 = System.nanoTime()
        SegmentBuilder.ingest(spark, corpus, col("doc_id"), col("text"), dir, cfg)
        val t1 = System.nanoTime()
        SegmentBuilder.buildAll(spark, dir, cfg, concurrency = 4)
        val t2 = System.nanoTime()
        System.err.println(f"[probe] $tag parts=$parts ingest=${(t1 - t0) / 1e9}%.1fs " +
          f"buildAll=${(t2 - t1) / 1e9}%.1fs total=${(t2 - t0) / 1e9}%.1fs")
      } finally {
        new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(); ()
      }
    }

    run("warmup", 32)
    (1 to rounds).foreach { i => run(s"r$i-A", 32); run(s"r$i-B", cores * 4) }
    spark.stop()
  }
}
