package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Similarity search over an embedding column (array&lt;float&gt;):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed ANN as the scale path (candidates come from
  * a handful of sign-pattern buckets instead of the full corpus; at
  * 100 TB the bucket table is the shuffle key and each query probes
  * O(planes) buckets).
  *
  * Ranking discipline (100 TB rule): top-k is ALWAYS a
  * TakeOrderedAndProject (`orderBy(...).limit(k)` — per-partition heaps
  * merged on the driver, no global sort, no single-partition exchange);
  * ranks are derived from the collected k rows, which are bounded by the
  * caller's k. A `Window.orderBy` without partitionBy would funnel every
  * candidate through one task — banned here and guarded in PlanSpec.
  */
object Similarity {

  /** cos(q, v) — native expression ([[CosineSimExpr]]); inputs must be
    * array&lt;double&gt;. */
  def cosineCol(qv: Column, v: Column): Column = VecExprs.cosine(qv, v)

  /** Interpreted higher-order form of [[cosineCol]] — kept only as the
    * property-test oracle for the native expression (bit-equal by
    * construction; ~100x slower per row). */
  def cosineColHof(qv: Column, v: Column): Column = {
    val dot = aggregate(zip_with(qv, v, (x, y) => x * y), lit(0.0), (a, x) => a + x)
    val nq = aggregate(transform(qv, x => x * x), lit(0.0), (a, x) => a + x)
    val nv = aggregate(transform(v, x => x * x), lit(0.0), (a, x) => a + x)
    dot / (sqrt(nq) * sqrt(nv))
  }

  /** The scale-safe top-k plan over a scored candidate frame: global
    * `orderBy(cos desc, vec_id asc).limit(k)` plans as
    * TakeOrderedAndProject (per-partition heap + driver merge). Exposed
    * separately so PlanSpec can pin the physical shape. */
  def topKPlanned(scored: DataFrame, k: Int): DataFrame =
    scored.select(col("vec_id"), col("label"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  /** Rank the top k of a scored frame: run [[topKPlanned]], then number
    * the <= k collected rows (bounded by the caller's k — never a
    * corpus-sized driver fetch). */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    val top = topKPlanned(scored, k)
    val ranked = top.collect().zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1).toLong +: r.toSeq)
    }
    val schema = StructType(
      StructField("rank", LongType, nullable = false) +: top.schema.fields)
    spark.createDataFrame(java.util.Arrays.asList(ranked: _*), schema)
  }

  /** Scored candidates for exact brute-force cosine vs vector `queryId`
    * (lazy — the full corpus crossJoins a broadcast 1-row query). */
  def cosineScored(embeddings: DataFrame, queryId: Long): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.crossJoin(broadcast(q)).withColumn("cos", cosineCol(col("qv"), col("v")))
  }

  /** Exact brute-force cosine top-k vs the vector with id `queryId`. */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame =
    rankTopK(cosineScored(embeddings, queryId), k)

  /** Exact cosine top-k for a BATCH of query vectors: one broadcast of
    * the query rows, one scored pass over the corpus, then the same
    * bounded per-key top-k aggregation the BM25 ranker uses (map-side
    * partial heaps; k rows per partition per query on the wire — never
    * a per-query window sort). Labels rejoin via a broadcast of the
    * <= nQ x k ranked rows. */
  def cosineTopKBatch(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val ranked = e.crossJoin(broadcast(q))
      .withColumn("cos", cosineCol(col("qv"), col("v")))
      .groupBy("qid")
      .agg(graft.query.TopKAgg.topK(k)(col("cos"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sd")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("sd.doc_id").as("vec_id"), col("sd.score").as("cos"))
    broadcast(ranked).join(embeddings.select(col("vec_id"), col("label")), "vec_id")
      .select("qid", "rank", "vec_id", "label", "cos")
  }

  // --- random-hyperplane LSH ----------------------------------------------------

  /** Deterministic pseudo-random hyperplane component in [-1, 1)
    * (splitmix64 over (plane, dim) — no RNG state, reproducible across
    * executors and runs). */
  def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def planes(nPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dims)(i => planeComponent(p, i)))

  def bucketOf(v: Array[Double], pl: Array[Array[Double]]): Int = {
    var mask = 0
    var p = 0
    while (p < pl.length) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += pl(p)(i) * v(i); i += 1 }
      if (dot >= 0) mask |= (1 << p)
      p += 1
    }
    mask
  }

  /** (vec_id, label, v, bucket) — bucket assignment is one narrow map. */
  def bucketed(embeddings: DataFrame, nPlanes: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val dims = e.select(size(col("v"))).head().getInt(0)
    val pl = planes(nPlanes, dims)
    e.as[(Long, Int, Array[Double])]
      .map { case (id, label, v) => (id, label, v, bucketOf(v, pl)) }
      .toDF("vec_id", "label", "v", "bucket")
  }

  // --- IVF (inverted-file) ANN ---------------------------------------------------

  private[ops] def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Distributed Lloyd k-means over the embedding column: deterministic
    * init (the `nlist` lowest vec_ids), then `iters` rounds of
    * assign (narrow map) + per-dimension mean (posexplode + hash agg —
    * nlist x dims groups, map-side combined). Everything the executors
    * touch is a narrow map or a bounded aggregation; only nlist x dims
    * doubles ever reach the driver per round. */
  def kmeansCentroids(e: DataFrame, nlist: Int, iters: Int = 3): Array[(Int, Array[Double])] = {
    val spark = e.sparkSession
    import spark.implicits._
    var cents: Array[(Int, Array[Double])] = e.orderBy("vec_id").limit(nlist)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](2).toArray) }
    val ds = e.as[(Long, Int, Array[Double])]
    for (_ <- 1 to iters) {
      val bc = cents
      val means = ds.map { case (_, _, v) => (bc.maxBy(c => cos(c._2, v))._1, v) }
        .toDF("list", "v")
        .select(col("list"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("list", "dim").agg(avg(col("x")).as("m"))
        .collect().groupBy(_.getInt(0))
      cents = cents.map { case (i, old) =>
        i -> means.get(i)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)))
          .getOrElse(old) // empty cluster keeps its centroid
      }
    }
    cents
  }

  // The IVF and LSH QUERY paths live in [[AnnIndex]]: the index build
  // (k-means training + assignment, bucket table) is a persisted,
  // lineage-checkpointed artifact partitioned by the probe key, and a
  // query is a partition-pruned read — never a per-query corpus job.
  // This object keeps the shared primitives (planes/bucketOf/bucketed,
  // kmeansCentroids, cos, the bounded rankTopK plan).
}
