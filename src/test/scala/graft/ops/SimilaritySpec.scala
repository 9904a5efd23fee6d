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

  /** Deterministic clustered corpus: 10 well-separated centers, tight
    * noise — the regime where LSH/IVF pruning applies. */
  private lazy val clustered = {
    import spark.implicits._
    val dims = 64
    def h(a: Int, b: Int): Double = Similarity.planeComponent(a * 131 + 7, b)
    val centers = Array.tabulate(10)(k => {
      val c = Array.tabulate(dims)(i => h(k, i))
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    })
    (0 until 400).map { id =>
      val k = id % 10
      val v = Array.tabulate(dims)(i => centers(k)(i) + 0.08 * h(1000 + id, i))
      (id.toLong, k, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
  }

  private def qvOf(df: org.apache.spark.sql.DataFrame, id: Long): Array[Double] =
    df.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray

  private def tmpIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ann_${tag}_").toString

  test("LSH ANN (persisted buckets) recall@10 >= 0.8 on clustered embeddings") {
    val idx = tmpIdx("lsh")
    assert(AnnIndex.ensureLsh(spark, clustered, idx, srcPath = "n/a"))
    val exact = Similarity.cosineTopK(clustered, 0L, 10).collect().map(_.getLong(1)).toSet
    val ann = AnnIndex.lshQuery(spark, idx, qvOf(clustered, 0L), 10)
      .collect().map(_.getLong(1)).toSet
    val recall = exact.intersect(ann).size / 10.0
    info(s"ANN recall@10 on clustered corpus = $recall")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF (persisted centroids+assignment) recall@10 >= 0.8 on clustered embeddings") {
    val idx = tmpIdx("ivf")
    assert(AnnIndex.ensureIvf(spark, clustered, idx, srcPath = "n/a"))
    val exact = Similarity.cosineTopK(clustered, 0L, 10).collect().map(_.getLong(1)).toSet
    val ivf = AnnIndex.ivfQuery(spark, idx, qvOf(clustered, 0L), 10).collect()
    val recall = exact.intersect(ivf.map(_.getLong(1)).toSet).size / 10.0
    info(s"IVF recall@10 on clustered corpus = $recall")
    assert(recall >= 0.8, s"recall $recall")
    assert(ivf.minBy(_.getLong(0)).getLong(1) === 0L) // query retrieves itself
  }

  test("ANN build checkpoint: re-ensure is a no-op; marker-less artifacts rebuild") {
    val idx = tmpIdx("resume")
    val src = "/root/testdata/sf0.001/embeddings.parquet"
    assert(AnnIndex.ensureIvf(spark, emb, idx, src), "first ensure must build")
    assert(!AnnIndex.ensureIvf(spark, emb, idx, src), "matching lineage must skip")
    // different params -> different lineage -> rebuild
    assert(AnnIndex.ensureIvf(spark, emb, idx, src,
      AnnIndex.IvfConfig(nlist = 8)), "changed params must rebuild")
    // simulated crash between artifact write and marker commit
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_built"))
    assert(AnnIndex.ensureIvf(spark, emb, idx, src,
      AnnIndex.IvfConfig(nlist = 8)), "missing marker must rebuild")
    assert(AnnIndex.ivfQuery(spark, idx, qvOf(emb, 0L), 5).count() === 5)
  }

  test("ANN on near-random embeddings: exact scores, query self-retrieval, real pruning") {
    val idx = tmpIdx("lsh_rand")
    AnnIndex.ensureLsh(spark, emb, idx, srcPath = "n/a")
    val ann = AnnIndex.lshQuery(spark, idx, qvOf(emb, 0L), 10).collect()
    val first = ann.minBy(_.getLong(0))
    assert(first.getLong(1) === 0L && math.abs(first.getDouble(3) - 1.0) < 1e-12)
    // returned cosines equal the brute-force cosines for the same ids
    val exact = Similarity.cosineTopK(emb, 0L, emb.count().toInt).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    ann.foreach(r => assert(r.getDouble(3) === exact(r.getLong(1))))
  }

  test("probe-only query plans: one partition-pruned read of the persisted artifact") {
    val ivfIdx = tmpIdx("ivf_plan"); val lshIdx = tmpIdx("lsh_plan")
    AnnIndex.ensureIvf(spark, emb, ivfIdx, srcPath = "n/a")
    AnnIndex.ensureLsh(spark, emb, lshIdx, srcPath = "n/a")
    val qv = qvOf(emb, 0L)
    for ((plan, key) <- Seq(
      Similarity.topKPlanned(AnnIndex.ivfCandidates(spark, ivfIdx, qv), 10)
        .queryExecution.executedPlan.toString -> "list",
      Similarity.topKPlanned(AnnIndex.lshCandidates(spark, lshIdx, qv), 10)
        .queryExecution.executedPlan.toString -> "bucket")) {
      val scans = "FileScan parquet".r.findAllMatchIn(plan).size
      assert(scans === 1, s"query path must read ONLY the artifact:\n$plan")
      assert(plan.contains(s"PartitionFilters: [$key#") ||
        plan.contains(s"PartitionFilters: [isnotnull($key#") ||
        plan.contains(s"PartitionFilters: [$key"),
        s"probe must partition-prune on $key:\n$plan")
      assert(!plan.contains("InMemoryTableScan") && !plan.contains("InMemoryRelation"),
        s"no per-query corpus cache in the probe plan:\n$plan")
    }
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

  test("factored cosine (precomputed norms + dot) is bit-equal to the fused native form") {
    // the embedNearDups pair-scan shape: nsq = dot(v, v) once per row,
    // cos = dot(va, vb) / (sqrt(nsq_a) * sqrt(nsq_b)) — must reproduce
    // CosineSimExpr's double exactly (same ascending accumulation, same
    // association), or the exact-anchor oracle would drift
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nsq", graft.ops.VecExprs.dot(col("v"), col("v")))
    val q = e.filter(col("vec_id") === 0L)
      .select(col("v").as("qv"), col("nsq").as("qnsq"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.cosineCol(col("qv"), col("v")).as("fused"),
        (graft.ops.VecExprs.dot(col("qv"), col("v")) /
          (sqrt(col("qnsq")) * sqrt(col("nsq")))).as("factored"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: fused ${r.getDouble(1)} != factored ${r.getDouble(2)}")
    }
  }
}
