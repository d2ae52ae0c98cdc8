package graft

import org.apache.spark.sql.functions._

import graft.operators.Spatial

/** Pins for the grid-blocked spatial proximity join: blocking
  * completeness against brute force (the property the oracle also
  * proves at fixture scale), cell-boundary behavior, and exact
  * distances on known geometry.
  */
class SpatialSpec extends SparkSpec {

  private def sites(pts: Seq[(Long, Double, Double)]) = {
    import spark.implicits._
    pts.toDF("site_id", "lat", "lon")
  }

  private def haversineKm(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val r = math.Pi / 180
    val h = math.pow(math.sin((lat2 - lat1) * r / 2), 2) +
      math.cos(lat1 * r) * math.cos(lat2 * r) *
        math.pow(math.sin((lon2 - lon1) * r / 2), 2)
    2 * 6371.0088 * math.asin(math.sqrt(h))
  }

  test("pairs straddling a cell boundary are found; far pairs are not") {
    // 0.35° cells: sites 1/2 sit 0.01° apart ACROSS the lat boundary at
    // -42.00 (different cells, adjacent); 3 is ~22 km east of 1 across a
    // lon cell boundary; 4 is ~100 km away — out.
    val s = sites(Seq(
      (1L, -41.995, 170.00), (2L, -42.005, 170.00),
      (3L, -41.995, 170.27), (4L, -41.10, 170.00)))
    val got = Spatial.proximityJoin(s).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $got")
    val d12 = haversineKm(-41.995, 170.00, -42.005, 170.00)
    assert(math.abs(got((1L, 2L)) - d12) < 1e-3, s"d12 ${got((1L, 2L))}")
  }

  test("blocking is complete: grid join equals brute force on a planted grid") {
    // a lattice of points spaced ~15 km: every adjacent pair qualifies,
    // diagonal ~21 km qualifies, two-step ~30 km does not
    val pts = for {
      i <- 0 until 6; j <- 0 until 6
    } yield ((i * 6 + j).toLong, -45.0 + i * 0.135, 168.0 + j * 0.19)
    val s = sites(pts)
    val got = Spatial.proximityJoin(s).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d = haversineKm(a._2, a._3, b._2, b._3)
      if math.rint(d * 1000) / 1000 <= 25.0
    } yield (a._1, b._1)).toSet
    assert(got == brute,
      s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty)
  }

  test("clusters: every cluster is labeled by its minimum site and " +
      "covers exactly the paired sites") {
    val pairs = Spatial.neighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Spatial.clusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // scalar union-find mirror
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.groupBy(find).map { case (root, ms) =>
      root -> ms.length.toLong
    }
    assert(clusters == expect, s"got $clusters expect $expect")
    assert(clusters.values.forall(_ >= 2))
  }

  test("nearest: every paired site appears once with its true minimum") {
    val pairs = Spatial.neighbors(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val best = pairs.flatMap { case ((a, b), d) => Seq(a -> (d, b), b -> (d, a)) }
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).minBy(x => (x._1, x._2)) }
    val got = Spatial.nearest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(1)))).toMap
    assert(got == best, s"got $got expect $best")
  }

  test("occupancy cap: a planted pile-up cell is excluded from pair " +
      "generation and audited, sparse cells are untouched (r8 verdict #6)") {
    // 20 sites stacked in one cell (pile-up) + 2 nearby sites in a
    // DIFFERENT cell ~1.5 km apart. cap=10: the pile-up cell (occ 20)
    // is dropped — none of its 190 internal pairs nor its cross pairs
    // appear — while the sparse pair survives, and every output row
    // carries capped_cells = 1.
    val pile = (1 to 20).map(i =>
      (i.toLong, -42.01 + i * 1e-4, 170.01))
    val sparse = Seq((100L, -42.01, 170.40), (101L, -42.0235, 170.40))
    val s = sites(pile ++ sparse)
    val got = Spatial.proximityJoin(s, maxCellOcc = 10L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 101L)), s"got ${got.toSeq}")
    assert(got.forall(_.getLong(3) == 1L),
      s"capped_cells audit must be 1: ${got.toSeq}")
    // control: without the cap firing, the pile-up pairs are all there
    // and the audit column reads zero capped cells
    val uncapped = Spatial.proximityJoin(s).collect()
    assert(uncapped.length > 190)
    assert(uncapped.forall(_.getLong(3) == 0L))
  }

  test("registered op emits consistent coordinates and symmetric distances") {
    val rows = Spatial.neighbors(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 25.0)
    }
  }
}
