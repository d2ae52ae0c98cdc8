package graft

import scala.util.Random

import graft.functions.{ScoredId, TopKAgg}
import graft.sources.CastMatrix

/** Property-style checks (SURVEY.md §5.3) with seeded random cases:
  * cast-matrix totality, TopKAgg's merge/reduce agreement under
  * arbitrary splits, and exact top-k selection.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  test("cast matrix: every supported name maps, every other name throws") {
    CastMatrix.all.foreach { t =>
      assert(CastMatrix.fromName(t.name) == t)
    }
    (1 to 100).foreach { _ =>
      val s = rnd.alphanumeric.take(8).mkString.toUpperCase
      if (!CastMatrix.all.exists(_.name == s))
        intercept[IllegalArgumentException](CastMatrix.fromName(s))
    }
  }

  test("TopKAgg: any split of any input merges to the same top-k as a fold") {
    (1 to 100).foreach { _ =>
      val items = List.fill(rnd.nextInt(40))(
        ScoredId(rnd.nextInt(50).toLong, (rnd.nextInt(2000) - 1000) / 100.0))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKAgg(k)
      val folded = items.foldLeft(agg.zero)(agg.reduce)
      (0 to items.size).foreach { cut =>
        val (l, r) = items.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(merged == folded, s"split at $cut diverged for k=$k items=$items")
      }
      assert(folded.size <= k)
      assert(folded == folded.sortBy(s => (-s.score, s.id)))
      // exact selection: fold == global sort-take
      assert(folded == items.sortBy(s => (-s.score, s.id)).take(k))
    }
  }
}
