package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val sh = Dedup.shingleTable(docs, col("doc_id"), col("text")).cache()
    println("[p2] shingles = " + time("shingleTable")(sh.count()))
    val sig = time("signatures")(Dedup.minhashSignatures(sh, 64).cache())
    println("[p2] sigs = " + time("sig count")(sig.count()))
    val cand = Dedup.lshCandidates(sig, 16, 4)
    println("[p2] candidates = " + time("lshCandidates")(cand.count()))
    val out = time("full minhashNearDups")(
      Dedup.minhashNearDups(docs, col("doc_id"), col("text"), 0.5))
    println("[p2] pairs = " + out.count())
    spark.stop()
  }
}
