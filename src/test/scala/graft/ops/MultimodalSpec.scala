package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("binary media column round-trips content bytes with typed metadata") {
    val media = Multimodal.synthesize(docs, col("doc_id"), col("text")).collect()
    val byId = media.map(m => m.doc_id -> m).toMap
    val src = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    src.foreach { case (id, text) =>
      val m = byId(id)
      assert(new String(m.media, "UTF-8") === text)
      assert(Multimodal.Formats.contains(m.format))
      assert(m.width === 16 + (id % 16) * 8 && m.height === 16 + (id % 9) * 12)
    }
  }

  test("batch feature extraction: histogram + mean match direct computation") {
    val media = Multimodal.synthesize(docs, col("doc_id"), col("text"))
    val feats = Multimodal.features(media).collect().map(f => f.doc_id -> f).toMap
    val src = docs.select("doc_id", "text").limit(20).collect()
    src.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8").map(_ & 0xff)
      val f = feats(r.getLong(0))
      assert(f.n_bytes === bytes.length.toLong)
      assert(f.mean_byte === bytes.map(_.toLong).sum.toDouble / bytes.length)
      assert(f.histogram.map(_.toInt).sum === bytes.length)
      assert(f.histogram.length === 16)
    }
  }

  test("frame sampling: n deterministic slices covering a prefix partition") {
    val payload = (0 until 1000).map(_.toByte).toArray
    val frames = Multimodal.frameSample(payload, 10)
    assert(frames.length === 10)
    assert(frames.head.toSeq === payload.slice(0, 100).toSeq)
    assert(Multimodal.frameSample(Array.emptyByteArray, 4) === Seq.empty)
  }
}
