package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.analyze.CodeTokenizer
import graft.index.SegmentBuilder

/** Dev profiling harness: stage-by-stage timings of the index build at a
  * given parallelism. Usage: runMain graft.tools.Probe <cores> [replicas] */
object Probe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .crossJoin(spark.range(replicas).toDF("rep"))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"))

    val m = graft.metrics.Metrics.attach(spark)
    def time[T](label: String)(f: => T): T = {
      val r0 = m.executorRunTimeMs.sum()
      val g0 = m.gcTimeMs.sum()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      val cpu = (m.executorRunTimeMs.sum() - r0) / 1e3
      val gc = (m.gcTimeMs.sum() - g0) / 1e3
      println(f"[probe] $label%-28s wall ${wall}%7.2f s   taskTime ${cpu}%8.2f s   gc ${gc}%7.2f s")
      r
    }

    val n = time("count docs")(docs.count())
    println(s"[probe] docs = $n, cores = $cores")
    time("tokenize+count postings") {
      docs.select(explode(CodeTokenizer.tokensColFast(col("text")))).count()
    }
    time("tokenize+tf groupBy") {
      graft.index.Postings.build(docs, col("doc_id"), col("text"))
        .write.mode("overwrite").format("noop").save()
    }
    val dir = Files.createTempDirectory("probe_idx_").toString
    val cfg = SparkEntry.IndexCfg.copy(buildPartitions = 64)
    println(s"[probe] maxMemory = ${Runtime.getRuntime.maxMemory() / (1 << 30)}g")
    val spread = docs.repartition(cfg.buildPartitions).cache()
    time("materialize spread docs")(spread.count())
    time("docmap write") {
      spread.select(col("doc_id"),
          sha2(col("text").cast("string"), 256).as("sha"),
          size(CodeTokenizer.tokensColFast(col("text"))).cast("long").as("doclen"))
        .write.mode("overwrite").parquet(s"$dir/docmap")
    }
    time("stats") {
      spark.read.parquet(s"$dir/docmap")
        .agg(count(lit(1)).as("n"), avg(col("doclen")).as("avgdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
    }
    time("postings build (noop)") {
      graft.index.Postings.build(spread, col("doc_id"), col("text"))
        .write.mode("overwrite").format("noop").save()
    }
    time("postings write partitionBy") {
      graft.index.Postings.build(spread, col("doc_id"), col("text"))
        .withColumn("shard", pmod(xxhash64(col("term")), lit(cfg.shards)).cast("int"))
        .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/postings")
    }
    spread.unpersist()
    time("buildAll (4 shards)") {
      SegmentBuilder.buildAll(spark, dir, cfg)
    }
    (0 until cfg.shards).foreach { s =>
      println("[probe] manifest " + Files.readString(
        java.nio.file.Paths.get(dir, "manifest", s"shard_$s.json")))
    }
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
