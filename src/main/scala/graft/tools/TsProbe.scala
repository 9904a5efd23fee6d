package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.TmpFs

/** Micro-probe for q_ts_coercion's cost structure: times each stage of
  * the timestamp-parse battery in isolation (noop sink, best-of-3) so
  * the slow expression can be identified instead of guessed. */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (TmpFs.available) b.config("spark.local.dir", s"${TmpFs.base}/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = pmod(col("event_id"), lit(4))
    val str = when(m === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
      .when(m === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .when(m === 2, unix_timestamp(col("ts")).cast("string"))
      .otherwise(lit("not-a-date"))
    val withS = e.select(col("event_id"), str.as("s"))
    val epoch = expr("try_cast(s as bigint)")
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ss = (1 to 3).map(_ => once())
      println(f"[tsprobe] $label%-28s min=${ss.min}%5.2f  ${ss.map(x => f"$x%.2f").mkString(" ")}")
    }
    t("gen only")(withS)
    t("gen+parse1(T)")(withS.select(col("event_id"),
      try_to_timestamp(col("s"), lit("yyyy-MM-dd'T'HH:mm:ss")).as("p")))
    t("gen+parse2(space)")(withS.select(col("event_id"),
      try_to_timestamp(col("s"), lit("yyyy-MM-dd HH:mm:ss")).as("p")))
    t("gen+epoch")(withS.select(col("event_id"),
      when(epoch.isNotNull, when(epoch > 1000000000000L, timestamp_millis(epoch))
        .otherwise(timestamp_seconds(epoch))).as("p")))
    val parsed = coalesce(
      try_to_timestamp(col("s"), lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(col("s"), lit("yyyy-MM-dd HH:mm:ss")),
      when(epoch.isNotNull,
        when(epoch > 1000000000000L, timestamp_millis(epoch))
          .otherwise(timestamp_seconds(epoch))))
    t("full coalesce")(withS.select(col("event_id"), col("s"),
      date_format(parsed, "yyyy-MM-dd HH:mm:ss").as("parsed")))
    t("full + orderBy")(withS.select(col("event_id"), col("s"),
      date_format(parsed, "yyyy-MM-dd HH:mm:ss").as("parsed")).orderBy("event_id"))
    // guarded variant: skip a pattern's parse when the discriminating
    // character cannot match (literal 'T'/' ' at position 11)
    val g1 = when(substring(col("s"), 11, 1) === "T",
      try_to_timestamp(col("s"), lit("yyyy-MM-dd'T'HH:mm:ss")))
    val g2 = when(substring(col("s"), 11, 1) === " ",
      try_to_timestamp(col("s"), lit("yyyy-MM-dd HH:mm:ss")))
    val guarded = coalesce(g1, g2,
      when(epoch.isNotNull,
        when(epoch > 1000000000000L, timestamp_millis(epoch))
          .otherwise(timestamp_seconds(epoch))))
    t("guarded + orderBy")(withS.select(col("event_id"), col("s"),
      date_format(guarded, "yyyy-MM-dd HH:mm:ss").as("parsed")).orderBy("event_id"))
    spark.stop()
  }
}
