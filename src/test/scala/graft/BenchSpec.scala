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
    val byName = times.toMap
    assert(byName("good") > 0)
    assert(byName("broken") === -1.0)
    assert(byName("lazy_broken") === -1.0, "failures at materialization count too")
    assert(failures.map(_._1).toSet === Set("broken", "lazy_broken"))
    assert(failures.toMap.apply("broken").contains("boom"))
  }

  test("serving qps floor: below-floor fails, at/above passes, 0 disables, skip-mode exempt") {
    assert(Bench.qpsFloorViolation(4.2, Bench.DefaultQpsFloor).isDefined)
    assert(Bench.qpsFloorViolation(26.8, Bench.DefaultQpsFloor).isEmpty)
    assert(Bench.qpsFloorViolation(10.0, Bench.DefaultQpsFloor).isEmpty)
    assert(Bench.qpsFloorViolation(4.2, 0.0).isEmpty, "floor 0 disables the gate")
    assert(Bench.qpsFloorViolation(-1.0, Bench.DefaultQpsFloor).isEmpty,
      "scaling-only mode (qps sentinel -1) is exempt")
  }
}
