package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force cosine top-k: query vector ranks itself first with cos 1") {
    val res = Similarity.cosineTopK(emb, 0L, 10).collect()
    assert(res.length === 10)
    val first = res.minBy(_.getLong(0))
    assert(first.getLong(1) === 0L)
    assert(math.abs(first.getDouble(3) - 1.0) < 1e-12)
  }

  test("ANN recall@10 >= 0.8 on clustered embeddings (where LSH applies)") {
    import spark.implicits._
    // deterministic clustered corpus: 10 well-separated centers, tight noise
    val dims = 64
    def h(a: Int, b: Int): Double = Similarity.planeComponent(a * 131 + 7, b)
    val centers = Array.tabulate(10)(k => {
      val c = Array.tabulate(dims)(i => h(k, i))
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    })
    val vecs = (0 until 400).map { id =>
      val k = id % 10
      val v = Array.tabulate(dims)(i => centers(k)(i) + 0.08 * h(1000 + id, i))
      (id.toLong, k, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
    val exact = Similarity.cosineTopK(vecs, 0L, 10).collect().map(_.getLong(1)).toSet
    val ann = Similarity.annTopK(vecs, 0L, 10).collect().map(_.getLong(1)).toSet
    val recall = exact.intersect(ann).size / 10.0
    info(s"ANN recall@10 on clustered corpus = $recall")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF recall@10 >= 0.8 on clustered embeddings; exact on probed lists") {
    import spark.implicits._
    val dims = 64
    def h(a: Int, b: Int): Double = Similarity.planeComponent(a * 131 + 7, b)
    val centers = Array.tabulate(10)(k => {
      val c = Array.tabulate(dims)(i => h(k, i))
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    })
    val vecs = (0 until 400).map { id =>
      val k = id % 10
      val v = Array.tabulate(dims)(i => centers(k)(i) + 0.08 * h(1000 + id, i))
      (id.toLong, k, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
    val exact = Similarity.cosineTopK(vecs, 0L, 10).collect().map(_.getLong(1)).toSet
    val ivf = Similarity.ivfTopK(vecs, 0L, 10, nlist = 16, nprobe = 4).collect()
    val recall = exact.intersect(ivf.map(_.getLong(1)).toSet).size / 10.0
    info(s"IVF recall@10 on clustered corpus = $recall")
    assert(recall >= 0.8, s"recall $recall")
    assert(ivf.minBy(_.getLong(0)).getLong(1) === 0L) // query retrieves itself
  }

  test("ANN on near-random embeddings: exact scores, query self-retrieval, real pruning") {
    val ann = Similarity.annTopK(emb, 0L, 10).collect()
    val first = ann.minBy(_.getLong(0))
    assert(first.getLong(1) === 0L && math.abs(first.getDouble(3) - 1.0) < 1e-12)
    // returned cosines equal the brute-force cosines for the same ids
    val exact = Similarity.cosineTopK(emb, 0L, emb.count().toInt).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    ann.foreach(r => assert(r.getDouble(3) === exact(r.getLong(1))))
  }

  test("ANN candidates are a strict subset of the corpus (bucket pruning happens)") {
    val b = Similarity.bucketed(emb, 8)
    val total = b.count()
    val buckets = b.groupBy("bucket").count().count()
    assert(buckets > 8, "expected a spread of sign-pattern buckets")
    assert(total === emb.count())
  }

  test("deterministic planes: same component values on every call") {
    assert(Similarity.planeComponent(3, 17) === Similarity.planeComponent(3, 17))
    val p = Similarity.planes(8, 64)
    assert(p.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("native cosine yields NULL on length-mismatched vectors, like the HOF form") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      Similarity.cosineCol(col("a"), col("b")).as("native"),
      Similarity.cosineColHof(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0), "native must null on mismatched lengths")
    assert(r.isNullAt(1), "HOF nulls via zip_with padding — the parity target")
  }

  test("native cosine expression is bit-equal to the interpreted HOF form") {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.cosineCol(col("qv"), col("v")).as("native"),
        Similarity.cosineColHof(col("qv"), col("v")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
  }
}
