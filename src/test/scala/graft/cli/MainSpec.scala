package graft.cli

import graft.SparkSuite

class MainSpec extends SparkSuite {

  test("env-layered config overrides (reference ConfigurationService semantics)") {
    val cfg = Main.configFromEnv(Map(
      "GRAFT_SHARDS" -> "16", "GRAFT_K1" -> "0.9", "GRAFT_TOPK" -> "25"))
    assert(cfg.shards === 16 && cfg.k1 === 0.9 && cfg.topK === 25)
    assert(cfg.b === 0.75, "unset keys keep defaults")
    assertThrows[IllegalArgumentException](
      Main.configFromEnv(Map("GRAFT_TOPK" -> "0"))) // settings validator battery
  }

  test("dry-run analyzer reports corpus stats and the go/no-go gate") {
    val r = Main.analyze(spark, "/root/testdata/sf0.001/documents.parquet").head()
    assert(r.getAs[Long]("total_docs") === 500)
    assert(r.getAs[Long]("sampled") === 500)
    assert(r.getAs[Double]("valid_pct") === 100.0)
    assert(r.getAs[Boolean]("go"))
    assert(r.getAs[Long]("projected_postings") > 0)
    assert(r.getAs[String]("hot_terms").nonEmpty)
  }
}
