package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed batch-wise in executors.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE standing in for a real decoder
  * (e.g. JPEG -> pixel array). Everything around it — the schema, the
  * binary column, the partition-wise batch iteration, the feature
  * vector shape — is the real Spark-side plumbing and is tested. In
  * PySpark the same stage would be a Pandas UDF over `mapInPandas`;
  * in Scala the idiomatic equivalent is a typed mapPartitions, which is
  * what runs here.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String,
                               width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, n_bytes: Long, mean_byte: Double,
                                 histogram: Seq[Long])

  val Formats: Seq[String] = Seq("jpg", "png", "webp", "wav")

  /** Deterministic synthetic media table from a text corpus: the binary
    * payload is the UTF-8 content (stand-in for encoded media) and the
    * metadata is a pure function of doc_id. */
  def synthesize(docs: DataFrame, idCol: Column, contentCol: Column): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        idCol.cast("long").as("doc_id"),
        contentCol.cast("binary").as("media"),
        element_at(typedLit(Formats), (idCol.cast("long") % 4 + 1).cast("int")).as("format"),
        (lit(16) + (idCol.cast("long") % 16) * 8).cast("int").as("width"),
        (lit(16) + (idCol.cast("long") % 9) * 12).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** STUB DECODER — ??? in spirit: a real implementation would invoke an
    * image/audio codec here; this container has none, so the "pixels"
    * are the payload bytes themselves. Deterministic so tests are
    * stable. Swap this single function for a real codec in production. */
  def decodeStub(media: Array[Byte], format: String): Array[Int] =
    media.map(b => b & 0xff)

  /** Frame sampling: n evenly-spaced slices of the payload (the video
    * analogue of frame extraction; deterministic). */
  def frameSample(media: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (media.isEmpty || n <= 0) return Seq.empty
    val step = math.max(1, media.length / n)
    (0 until math.min(n, media.length)).map { i =>
      val from = i * step
      media.slice(from, math.min(from + step, media.length))
    }
  }

  /** Batch feature extraction: per-partition iteration (one "batch" per
    * partition, the mapInPandas shape), emitting a fixed-width feature
    * row per record: byte mean + 16-bin histogram over decoded values. */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val px = decodeStub(r.media, r.format)
        val hist = new Array[Long](16)
        var sum = 0L
        px.foreach { v => hist(v >>> 4) += 1; sum += v }
        val mean = if (px.isEmpty) 0.0 else sum.toDouble / px.length
        MediaFeatures(r.doc_id, r.format, r.width, r.height,
          px.length.toLong, mean, hist.toSeq)
      }
    }
  }
}
