package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The bench harness must FAIL LOUD: a throwing query is recorded as a
  * failure (and Bench.main exits non-zero on any), never silently
  * dropped from the headline total. */
class BenchSpec extends SparkSuite {

  test("timeQueries records failures instead of swallowing them") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good" -> ((s, _) => s.range(10).toDF("n")),
      "broken" -> ((_, _) => throw new IllegalStateException("boom")),
      "lazy_broken" -> ((s, _) =>
        s.range(10).toDF("n").filter(expr("assert_true(n < 5)").isNull)))
    val (times, failures) = Bench.timeQueries(spark, "/unused",
      Seq("good", "broken", "lazy_broken"), qs)
    val byName = times.map { case (n, best, _) => n -> best }.toMap
    assert(byName("good") > 0)
    assert(byName("broken") === -1.0)
    assert(byName("lazy_broken") === -1.0, "failures at materialization count too")
    assert(failures.map(_._1).toSet === Set("broken", "lazy_broken"))
    assert(failures.toMap.apply("broken").contains("boom"))
    // both raw samples are recorded (weather-vs-regression evidence in
    // the artifact), and the best equals their minimum
    val samples = times.map { case (n, _, ss) => n -> ss }.toMap
    assert(samples("good").size === 2)
    assert(byName("good") === samples("good").min)
    assert(samples("broken").isEmpty)
  }

  test("serving qps floors: below-floor fails, at/above passes, 0 disables, skip-mode exempt") {
    def wand(q: Double, f: Double) = Bench.qpsFloorViolation("wand_queries_per_sec", q, f)
    assert(wand(4.2, Bench.DefaultQpsFloor).isDefined)
    assert(wand(26.8, Bench.DefaultQpsFloor).isEmpty)
    assert(wand(Bench.DefaultQpsFloor, Bench.DefaultQpsFloor).isEmpty)
    assert(wand(4.2, 0.0).isEmpty, "floor 0 disables the gate")
    assert(wand(-1.0, Bench.DefaultQpsFloor).isEmpty,
      "scaling-only mode (qps sentinel -1) is exempt")
    // the PHRASE floor is armed the same way: a phrase-serving
    // regression (r03's canonical 1.0 qps) exits 1 instead of sailing
    // through the harness
    def phrase(q: Double, f: Double) =
      Bench.qpsFloorViolation("phrase_queries_per_sec", q, f)
    assert(phrase(1.0, Bench.DefaultPhraseQpsFloor).isDefined,
      "r03's recorded phrase regression must trip the floor")
    assert(phrase(4.7, Bench.DefaultPhraseQpsFloor).isEmpty)
    assert(phrase(1.0, Bench.DefaultPhraseQpsFloor).get
      .contains("phrase_queries_per_sec"), "violation names its metric")
    // the layout-v3 prune-factor guard rides the same gate: a factor
    // collapse (pushdown broken, compaction back to overlapping spans)
    // fails the bench; the -1 sentinel (no measurement) is exempt
    def prune(f: Double, floor: Double) =
      Bench.qpsFloorViolation("phrase_prune_factor", f, floor)
    assert(prune(1.1, Bench.DefaultPruneFactorFloor).isDefined)
    assert(prune(16.7, Bench.DefaultPruneFactorFloor).isEmpty)
    assert(prune(-1.0, Bench.DefaultPruneFactorFloor).isEmpty)
  }

  test("scaling efficiency: headline is the per-leg-best throughput ratio; median of pairs rides along") {
    // rehearsal-7-shaped samples (contended run, r04): per-pair ratios
    // 0.734/0.857/0.793 while the per-leg bests (179.96, 52.51) imply
    // 0.857 — the headline must equal the ratio of the throughputs the
    // artifact prints, and the pair median must remain visible.
    val pairs = Seq((198.69, 67.65), (179.96, 52.51), (194.36, 61.24))
    val (headline, median) = Bench.scalingEfficiency(pairs)
    assert(math.abs(headline - 179.96 / 52.51 / 4.0) < 1e-12)
    assert(math.abs(median - 194.36 / 61.24 / 4.0) < 1e-12,
      "median-of-pairs picks the middle per-pair ratio")
    // a single pair: both statistics collapse to the same ratio
    val (h1, m1) = Bench.scalingEfficiency(Seq((100.0, 25.0)))
    assert(math.abs(h1 - 1.0) < 1e-12 && math.abs(m1 - 1.0) < 1e-12)
  }

  test("default floors arm only under the calibrated condition (sf0.1 + tmpfs)") {
    val tmpfs = new java.io.File("/dev/shm").isDirectory
    assert(Bench.floorsArmed("/root/testdata/sf0.1") === tmpfs)
    assert(!Bench.floorsArmed("/root/testdata/sf0.01"),
      "an uncalibrated corpus must not arm the default floors")
    assert(!Bench.floorsArmed("/some/other/corpus"))
  }
}
