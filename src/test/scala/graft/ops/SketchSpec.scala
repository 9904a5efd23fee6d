package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Approximate aggregates: HLL++ error bound vs exact (engine-specific
  * sketch values, so the driver gate is rows-only; the bound is the
  * testable contract). */
class SketchSpec extends SparkSuite {
  test("approx_count_distinct within 5% of exact on events users") {
    val rows = graft.SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
