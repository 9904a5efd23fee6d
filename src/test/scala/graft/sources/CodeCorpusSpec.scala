package graft.sources

import graft.{SparkEntry, SparkSuite}
import graft.query.BM25
import org.apache.spark.sql.functions._

/** The north-rule input table (BASELINE.json input_hint): exact shape,
  * deterministic synthesis, and the (repo, path, commit)-derived doc
  * identity with its surrogate-collision gate. */
class CodeCorpusSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("synthesized table has EXACTLY the input_hint shape, all strings") {
    val code = CodeCorpus.synthesize(spark, sfDir)
    assert(code.columns.toSeq === Seq("repo", "path", "commit", "lang", "content"))
    assert(code.schema.fields.forall(_.dataType.typeName == "string"))
    assert(code.count() === spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("synthesis is deterministic and content rides verbatim (sha invariant is real)") {
    val a = CodeCorpus.synthesize(spark, sfDir).orderBy("repo", "path").collect()
    val b = CodeCorpus.synthesize(spark, sfDir).orderBy("repo", "path").collect()
    assert(a.toSeq === b.toSeq)
    // content column is the source text verbatim — the per-row
    // sha256(content) invariant must check the real payload
    val srcSha = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(sha2(col("text"), 256)).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    val codeSha = CodeCorpus.synthesize(spark, sfDir)
      .select(sha2(col("content"), 256)).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(codeSha.toSeq === srcSha.toSeq)
  }

  test("doc identity: surrogate = leading 60 bits of the full key, unique, gate passes") {
    val ids = CodeCorpus.withDocIds(CodeCorpus.synthesize(spark, sfDir))
    val rows = ids.select("doc_key", "doc_id").collect()
    rows.foreach { r =>
      val key = r.getString(0)
      val expect = java.lang.Long.parseLong(key.substring(0, 15), 16)
      assert(r.getLong(1) === expect, s"surrogate mismatch for key $key")
      assert(r.getLong(1) >= 0L)
    }
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
  }

  test("identity gate fails loud on duplicate triples and null identity parts") {
    import spark.implicits._
    val dup = Seq(
      ("r1", "a/b.txt", "c0ffee", "en", "one"),
      ("r1", "a/b.txt", "c0ffee", "en", "two") // same triple, different content
    ).toDF("repo", "path", "commit", "lang", "content")
    val e1 = intercept[IllegalArgumentException] { CodeCorpus.withDocIds(dup) }
    assert(e1.getMessage.contains("duplicate"),
      "a duplicated identity triple must fail, not silently double-count postings")
    val nul = Seq(
      (Some("r1"), Some("a/b.txt"), Option.empty[String], "en", "x")
    ).toDF("repo", "path", "commit", "lang", "content")
    val e2 = intercept[IllegalArgumentException] { CodeCorpus.withDocIds(nul) }
    assert(e2.getMessage.contains("null"),
      "null identity parts must fail (they also diverge from the oracle's concat semantics)")
  }

  test("commit is 40-hex (git-SHA-shaped) and paths embed lang") {
    val code = CodeCorpus.synthesize(spark, sfDir).collect()
    code.foreach { r =>
      assert(r.getAs[String]("commit").matches("[0-9a-f]{40}"))
      assert(r.getAs[String]("path").startsWith(s"src/${r.getAs[String]("lang")}/"))
    }
  }

  test("BM25 over the code corpus: same per-query score multisets as the documents run") {
    val code = CodeCorpus.withDocIds(CodeCorpus.synthesize(spark, sfDir),
      failOnCollision = false)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[String]] =
      df.select(col("qid"), format_string("%.4f", col("score")).as("s")).collect()
        .groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).sorted.toSeq).toMap
    // content rides verbatim and ids are bijective, so ranked SCORE
    // multisets must be identical even though doc ids (and tie order)
    // differ between the two corpora
    val a = scores(BM25.topK(spark, code, col("doc_id"), col("content"), SparkEntry.FtQuerySet))
    val b = scores(BM25.topK(spark, docs, col("doc_id"), col("text"), SparkEntry.FtQuerySet))
    assert(a === b)
  }
}
