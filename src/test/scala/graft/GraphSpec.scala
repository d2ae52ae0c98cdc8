package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("connected components: two islands and an isolated edge, exact labels") {
    import spark.implicits._
    // component {1,2,3,4} (a path), component {10,11}, component {20,21,22}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (21L, 20L), (21L, 22L), (22L, 20L)).toDF("u", "v")
    val labels = Graph.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("scc: cycles found exactly, direction respected, chains trim") {
    import spark.implicits._
    // SCC {1,2,3} (3-cycle), SCC {10,11} (mutual), 4 hangs off the
    // cycle one-way (OUT tendril), 20→21→22 a pure chain, 30 a
    // self-loop-only node: every non-cycle node must stay a singleton —
    // the undirected core would wrongly merge all of 20,21,22.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (11L, 10L), (4L, 10L),
      (20L, 21L), (21L, 22L), (30L, 30L)).toDF("u", "v")
    val got = Graph.stronglyConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L, 22L -> 22L,
      30L -> 30L), s"scc labels wrong: $got")
  }

  test("scc: decreasing-id chain (the coloring worst case) trims in one phase") {
    import spark.implicits._
    // ids DECREASE along the edges — pure coloring would extract one
    // node per outer round (O(n) color fixpoints); the trim phase must
    // absorb the whole chain without ever coloring
    val n = 40L
    val edges = (1L until n).map(i => (n - i + 1, n - i)).toDF("u", "v")
    val got = Graph.stronglyConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to n).map(i => i -> i).toMap,
      "every chain node must be its own SCC")
  }

  test("scc: two cycles bridged one-way stay separate; bridged both ways merge") {
    import spark.implicits._
    val oneWay = Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L), (2L, 5L))
      .toDF("u", "v")
    val got1 = Graph.stronglyConnectedComponents(oneWay).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    val bothWays = Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L),
      (2L, 5L), (6L, 1L)).toDF("u", "v")
    val got2 = Graph.stronglyConnectedComponents(bothWays).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("bowtie: planted core, IN chain, OUT chain, tendril, tube, island") {
    import spark.implicits._
    // giant SCC {5,6,7}; IN chain 2→1→5; OUT chain 7→10→11;
    // tendril 1→30 (hangs off IN); tube 2→40→10 (IN→OUT bypass);
    // island 20→21; decoy 2-SCC {50,51} (smaller than the giant)
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L), (2L, 1L), (1L, 5L),
      (7L, 10L), (10L, 11L), (1L, 30L), (2L, 40L), (40L, 10L),
      (20L, 21L), (50L, 51L), (51L, 50L)).toDF("u", "v")
    val got = Graph.bowtieClasses(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(5L) == ((5L, "scc")) && got(6L) == ((5L, "scc")) &&
      got(7L) == ((5L, "scc")), s"core wrong: $got")
    assert(got(1L)._2 == "in" && got(2L)._2 == "in", s"IN wrong: $got")
    assert(got(10L)._2 == "out" && got(11L)._2 == "out", s"OUT wrong: $got")
    assert(got(30L)._2 == "other", "tendril must be other")
    assert(got(40L)._2 == "other", "tube must be other")
    assert(got(20L)._2 == "other" && got(21L)._2 == "other", "island")
    assert(got(50L) == ((50L, "other")) && got(51L) == ((50L, "other")),
      "the smaller SCC keeps its own label but is not the giant")
  }

  test("connected components: long path converges within the round cap") {
    import spark.implicits._
    // a 60-edge path has diameter > MaxRounds(50): one-hop label
    // propagation would NOT converge inside the cap — finishing proves
    // the star contraction's logarithmic round count is real
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("u", "v")
    val labels = Graph.connectedComponents(pairs).collect()
    assert(labels.length == 61 && labels.forall(_.getLong(1) == 0L))
  }

  test("connected components: deep graph survives many rounds (stats/plan growth regression)") {
    import spark.implicits._
    // a 150k-edge path runs ~19 star rounds — past both historical
    // failure thresholds of this core's loop shape: per-round plan
    // multiplication OOMed explain within ~7 rounds (fixed by per-round
    // checkpoints), and checkpoint-PROPAGATED stats estimates overflowed
    // BigInteger at ~17 rounds (fixed by per-round persist, so planning
    // reads real InMemoryRelation sizes). This must finish in seconds,
    // not minutes, and converge exactly.
    val n = 150000L
    val pairs = spark.range(n).select(col("id").as("u"), (col("id") + 1).as("v"))
    val labels = Graph.connectedComponents(pairs)
    assert(labels.count() == n + 1)
    assert(labels.agg(max(col("label"))).head().getLong(0) == 0L)
  }

  test("bfs: exact hops on a hand graph, radius truncation, early exit") {
    import spark.implicits._
    def sym(s: Seq[(Long, Long)]) = (s ++ s.map(_.swap)).toDF("u", "v")
    // path 0-1-2-3 plus a branch 1-10; node 99 disconnected via 99-98
    val e = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 10L), (99L, 98L)))
    val d = Graph.bfs(e, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 10L -> 2L, 3L -> 3L),
      s"got $d") // disconnected 98/99 absent; early exit after round 4
    // radius bound truncates a 12-path at hop 3 exactly
    val path = sym((0L until 12L).map(i => (i, i + 1)))
    val d3 = Graph.bfs(path, 0L, radius = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $d3")
  }

  test("triangle census: known counts on a hand graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-1 + isolated edge 6-7;
    // input includes a duplicate and a reversed edge to exercise
    // canonicalization
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 1L), (6L, 7L), (6L, 7L)).toDF("u", "v")
    val r = Graph.triangleStats(pairs).head()
    // degrees: 1->4, 2..4->3, 5->1, 6,7->1; wedges = 6+3+3+3+0+0+0 = 15
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 8L, 15L, 4L)))
    assert(r.getDouble(4) == 0.8) // 3*4/15
  }

  test("triangle census: triangle-free and empty graphs") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val s = Graph.triangleStats(star).head()
    assert(s.getLong(3) == 0L && s.getDouble(4) == 0.0)
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val e = Graph.triangleStats(empty).head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("integer pagerank: matches a scalar reference implementation exactly") {
    import spark.implicits._
    // small directed graph incl. a dangling node (4) and a 2-cycle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
      .toDF("src", "dst")
    val got = Graph.pagerankInt(edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // scalar mirror of the documented arithmetic: floor divisions on Longs
    val scale = 1000000000000L
    val nodes = Seq(1L, 2L, 3L, 4L)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L, 4L), 3L -> Seq(1L))
    val n = nodes.size
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 5) {
      val sums = nodes.map { u =>
        u -> out.toSeq.collect {
          case (v, ds) if ds.contains(u) => r(v) / ds.size
        }.sum
      }.toMap
      r = nodes.map(u => u -> ((15L * scale) / (100L * n) +
        (85L * sums(u)) / 100L)).toMap
    }
    assert(got == r)
  }

  test("pagerank op: ranks are positive, customers outrank suppliers, output is 20") {
    val rows = Graph.pagerank(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(2) > 0L))
    // suppliers have no in-links: every supplier rank is the base term,
    // strictly below any customer that received contributions — the
    // top-20 of this graph must be all customers
    assert(rows.forall(_.getString(0) == "customer"))
  }

  test("graph ops leave nothing cached behind") {
    import spark.implicits._
    Graph.components(spark, sfDir).collect()
    Graph.nearDupTriangles(spark, sfDir).collect()
    Graph.pagerank(spark, sfDir).collect()
    Graph.stronglyConnectedComponents(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (5L, 6L)).toDF("u", "v")).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "graph operators must release their loop caches")
  }

  test("jaccard: a planted super-hub is capped out of pair generation " +
      "and counted in the audit column") {
    import spark.implicits._
    // hub supplier 100 touches customers 1..10 (45 pairs if uncapped);
    // suppliers 1 and 2 give customers {1,2} and {2,3} one small
    // overlap each. Cap 4 excludes only the hub.
    val hub = (1L to 10L).map(c => (100L, c))
    val small = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L))
    val e = (hub ++ small).toDF("s", "c")
    val rows = Graph.jaccardScores(e, maxHubDeg = 4, topN = 100).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // bounded pair volume: only the small suppliers generate pairs
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"got $pairs")
    // every row carries the capped-hub count
    assert(rows.forall(_.getLong(4) == 1L),
      s"capped_hubs: ${rows.map(_.getLong(4)).toSeq}")
    // degrees are capped-graph degrees: c2 has deg 2 (via s1 and s2),
    // so J(1,2) = 1 / (1 + 2 - 1) = 0.5
    val j = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(j((1L, 2L)) == 0.5 && j((2L, 3L)) == 0.5, s"got $j")
    // uncapped control: the hub floods pair generation — all C(10,2)
    // customer pairs appear (the two small-supplier pairs fold into
    // them), and nothing is counted capped
    val un = Graph.jaccardScores(e, maxHubDeg = 1000, topN = 1000).collect()
    assert(un.length == 45 && un.forall(_.getLong(4) == 0L),
      s"uncapped ${un.length}")
  }

  test("degree histogram: mass balances to node and edge counts") {
    val e = Graph.degrees(spark, sfDir).collect()
    val bySide = e.groupBy(_.getString(0))
    // sum(degree * n_nodes) per side = |edges|; both sides must agree
    val mass = bySide.map { case (s, rows) =>
      s -> rows.map(r => r.getLong(1) * r.getLong(2)).sum
    }
    assert(mass("supplier") == mass("customer") && mass("supplier") > 0)
  }

  test("k-core: K4 survives a pendant chain, every survivor keeps >= k neighbors") {
    import spark.implicits._
    // K4 on {1,2,3,4} with a pendant chain 4-5-6: the chain peels in
    // two rounds (6 first, then 5), the clique is untouched
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val core = Graph.kcore(pairs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core.toString)
  }

  test("k-core: a pure path peels to empty, round by round") {
    import spark.implicits._
    // an 8-node path has no 2-core; peeling eats one node per end per
    // round — 4 rounds deep, exercising the loop past a single pass
    val pairs = (0L until 7L).map(i => (i, i + 1)).toDF("u", "v")
    assert(Graph.kcore(pairs, 2).isEmpty)
  }

  test("k-core ship query: sf0.001 subgraph peels to empty; every core degree >= k") {
    // the sf0.001 peak subgraph is all tendrils (measured: 6 peel
    // rounds to zero) — the empty result IS the correct answer, and
    // reaching it exercises the full loop; nonemptiness is covered by
    // the sf0.01 oracle (13 survivors)
    assert(Graph.kcoreShip(spark, sfDir).isEmpty)
  }

  test("HITS: exact integer fixpoint on a hand bipartite graph") {
    import spark.implicits._
    // hubs {1,2,3} → auths {10,11}; 2 links to both, 1 and 3 to one each.
    // Hand-computed fixpoint (reached after round 1, stable thereafter):
    //   a(10)=a(11)=HScale; h(2)=HScale, h(1)=h(3)=HScale/2;
    //   sources score a=0, sinks score h=0.
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)).toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val r = Graph.hitsInt(e, iters).collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
      val s = Graph.HScale
      assert(r == Map(
        1L -> (s / 2, 0L), 2L -> (s, 0L), 3L -> (s / 2, 0L),
        10L -> (0L, s), 11L -> (0L, s)), s"iters=$iters got $r")
    }
  }

  test("HITS: mutual reinforcement beats raw degree") {
    import spark.implicits._
    // auths 10 and 20 both have in-degree 2, but 10's hubs (1,2) also
    // endorse each other's pick 11 — after round 2 hub 1,2 outrank 3,4
    // via 11's authority, which feeds BACK into 10 > 20: degree can't
    // see this, HITS must.
    val e = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 20L), (4L, 20L), (3L, 21L)).toDF("src", "dst")
    val r = Graph.hitsInt(e, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(10L) > r(20L), s"got $r")
    assert(r(10L) == Graph.HScale, s"got $r") // the top authority
  }

  test("label propagation: two cliques resolve to their min labels") {
    import spark.implicits._
    // triangle {1,2,3} + triangle {10,11,12} joined by nothing: each
    // converges to its minimum id (min tie-break drives the walk down)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("u", "v")
    val r = Graph.labelPropagation(e, 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), r.toString)
  }

  test("label propagation: bridge node joins the denser side deterministically") {
    import spark.implicits._
    // clique {1,2,3,4} – bridge 5 – pair {6,7}: 5 hears 4 clique votes
    // vs 1 pair vote once labels consolidate; the pair is then pulled in
    // through 5's label only if propagation continues — pin the exact
    // 4-round outcome so any tie-break regression shows up as a diff
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val e = (clique ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("u", "v")
    val r = Graph.labelPropagation(e, 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 4L).forall(n => r(n) == 1L), r.toString)
    assert(r(5L) == 1L, r.toString) // 4 clique labels beat the pair's 1
  }

  test("incremental components merge: cross-merge, internal no-op, novel island") {
    import spark.implicits._
    // history: {1,2,3} labeled 1, {5,6} labeled 5, isolated {9} labeled 9
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (9L, 9L)).toDF("id", "label")
    // batch: (3,6) merges the two components through their labels;
    // (1,2) is internal (contracts to a self-loop, must be a no-op);
    // (20,21) is an entirely novel island
    val batch = Seq((3L, 6L), (1L, 2L), (20L, 21L)).toDF("u", "v")
    val r = Graph.componentsIncrementalMerge(labels, batch).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      9L -> 9L, 20L -> 20L, 21L -> 20L), r.toString)
  }

  test("incremental components merge: batch node wins the min when smaller than labels") {
    import spark.implicits._
    // history component {7,8} labeled 7; batch attaches NEW node 2 to 8:
    // the merged component's minimum member is now 2, and a full
    // recompute would label {2,7,8} as 2 — the merge must agree
    val labels = Seq((7L, 7L), (8L, 7L)).toDF("id", "label")
    val batch = Seq((8L, 2L)).toDF("u", "v")
    val r = Graph.componentsIncrementalMerge(labels, batch).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(2L -> 2L, 7L -> 2L, 8L -> 2L), r.toString)
  }

  test("incremental components: fixture result equals the full recompute, twice") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = canon(Graph.components(spark, sfDir))
    // second call exercises the snapshot-reuse path (write-once gate)
    assert(canon(Graph.componentsIncremental(spark, sfDir)) == full)
    assert(canon(Graph.componentsIncremental(spark, sfDir)) == full)
  }

  test("powerlaw fit: Hill alpha matches a decimal-exact scalar recompute") {
    val got = Graph.powerlawFit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dec10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val edges = graft.Tables(spark, sfDir, "lineitem").as("l")
      .join(graft.Tables(spark, sfDir, "orders").as("o"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("l_suppkey AS s", "o_custkey AS c").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for ((label, key) <- Seq("supplier" -> true, "customer" -> false)) {
      val degs = edges.groupBy(e => if (key) e._1 else e._2)
        .map(_._2.length.toLong).filter(_ >= 5L).toSeq
      val slnr = degs.map(d => dec10(math.log(d.toDouble / 5.0))).sum
      val alpha = r6(1.0 + degs.length / slnr.toDouble)
      val (n, a, se) = got(label)
      assert(n == degs.length.toLong, label)
      assert(a == alpha, s"$label alpha $a vs $alpha")
      assert(se == r6((degs.length / slnr.toDouble) /
        math.sqrt(degs.length.toDouble)), label)
      assert(a > 1.0, label) // Hill estimate is > 1 by construction
    }
  }

  test("modularity: decimal-exact scalar recompute over the LPA labels") {
    val got = Graph.modularity(spark, sfDir).head()
    val edges = graft.Tables(spark, sfDir, "lineitem").as("l")
      .join(graft.Tables(spark, sfDir, "orders").as("o"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .where(org.apache.spark.sql.functions.expr(
        "l_quantity >= 49 AND month(l_shipdate) IN (1, 2)"))
      .selectExpr("l_suppkey * 2 + 1 AS u", "o_custkey * 2 AS v")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Graph.labelPropShip(spark, sfDir).collect().map { r =>
      val node = if (r.getString(0) == "supplier") r.getLong(1) * 2 + 1
        else r.getLong(1) * 2
      node -> r.getLong(2)
    }.toMap
    val m = edges.length.toDouble
    val ec = edges.filter { case (u, v) => lbl(u) == lbl(v) }
      .groupBy(e => lbl(e._1)).view.mapValues(_.length.toLong).toMap
    val dc = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(lbl).view.mapValues(_.length.toLong).toMap
    def dec10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val q = dc.keys.toSeq.map { c =>
      dec10(ec.getOrElse(c, 0L).toDouble / m -
        (dc(c).toDouble / (m * 2)) * (dc(c).toDouble / (m * 2)))
    }.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == dc.size.toLong)
    assert(got.getLong(1) == edges.length.toLong)
    assert(got.getDouble(2) == r6(q.toDouble),
      s"Q ${got.getDouble(2)} vs ${r6(q.toDouble)}")
    assert(got.getDouble(2) >= -0.5 && got.getDouble(2) <= 1.0)
  }

  test("ppr: teleport mass confined to the seed's component, decaying with distance") {
    import spark.implicits._
    // undirected path 1-2-3-4 plus a disconnected pair {10,11}; seed {1}
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L),
      (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.pprInt(e, seeds, 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // nothing reaches the island: no teleport there, no path there
    assert(r(10L) == 0L && r(11L) == 0L)
    // the seed dominates, and the farthest node holds the least
    // connected-component mass (a path is bipartite, so intermediate
    // nodes oscillate with walk parity — no monotone decay claim)
    assert(r(1L) == r.values.max && r(4L) < r(1L), s"seed not dominant: $r")
    // exact first-hop arithmetic: iteration math is pure floor division,
    // so recompute the fixpoint scalar-side and compare bit-for-bit
    val scale = 1000000000000L
    var rk = Map(1L -> scale, 2L -> 0L, 3L -> 0L, 4L -> 0L, 10L -> 0L,
      11L -> 0L)
    val adj = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
      4L -> Seq(3L), 10L -> Seq(11L), 11L -> Seq(10L))
    for (_ <- 1 to 4) {
      val contrib = adj.toSeq.flatMap { case (u, vs) =>
        vs.map(v => v -> rk(u) / vs.length)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rk = rk.keys.map { v =>
        val tp = if (v == 1L) (15L * scale) / 100L else 0L
        v -> (tp + 85L * contrib.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    rk.foreach { case (v, exp) => assert(r(v) == exp, s"node $v") }
  }
}
