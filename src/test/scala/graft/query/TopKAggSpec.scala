package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The bounded top-k aggregator is correctness-critical (it replaced
  * the per-key window rank in every ranking path): its reduce/merge
  * must equal sort-take under ANY partitioning and merge order, and its
  * comparator must be total so distributed merge order cannot leak into
  * results. */
class TopKAggSpec extends AnyFunSuite {

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge needed). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def reference(xs: Seq[ScoredDoc], k: Int): Seq[ScoredDoc] =
    xs.sortBy(d => (-d.score, d.doc_id)).take(k)

  // coarse scores force plenty of ties -> exercises the doc_id tiebreak
  private val docGen = for {
    s <- Gen.chooseNum(0, 5)
    id <- Gen.chooseNum(0L, 1000L)
  } yield ScoredDoc(s.toDouble / 2.0, id)

  private val caseGen = for {
    xs <- Gen.listOf(docGen)
    k <- Gen.chooseNum(1, 12)
    nSplits <- Gen.chooseNum(1, 5)
    marks <- Gen.listOfN(xs.length, Gen.chooseNum(0, nSplits - 1))
  } yield (xs, k, marks)

  test("property: reduce over any input order equals sort-take") {
    samples(caseGen, 200).foreach { case (xs, k, _) =>
      val agg = new TopKByScore(k)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(got) === reference(xs, k), s"k=$k xs=$xs")
    }
  }

  test("property: arbitrary partition splits + merge order equal sort-take") {
    samples(caseGen, 200).foreach { case (xs, k, marks) =>
      val agg = new TopKByScore(k)
      val parts = xs.zip(marks).groupBy(_._2).values.toSeq
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val mergedLtr = parts.foldLeft(agg.zero)(agg.merge)
      val mergedRtl = parts.reverse.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(mergedLtr) === reference(xs, k), s"k=$k xs=$xs")
      assert(agg.finish(mergedRtl) === reference(xs, k), s"k=$k xs=$xs")
    }
  }

  test("buffer never exceeds k entries (bounded map-side state)") {
    val agg = new TopKByScore(3)
    val big = (1L to 100L).map(i => ScoredDoc(i.toDouble, i))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size === 3)
    assert(agg.merge(buf, buf).size === 3)
  }
}
