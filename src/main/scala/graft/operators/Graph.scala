package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the link graphs the corpus naturally contains.
  *
  * The reference's whole output IS a link graph — every
  * `select_point_to_point_links.sql` row is a (tx site)→(rx site) edge —
  * so the questions a link-map user asks next (how connected is a site,
  * which sites form islands, which carry the most flow, do near-dup
  * families close transitively) are graph queries. Here they run over
  * the fixture's own link structures: the supplier→customer ship graph
  * (`lineitem ⋈ orders`, the fixture analog of tx→rx per SURVEY.md §6
  * mapping) and the document near-dup pair graph (`Dedup.minhashLsh`).
  *
  * Every algorithm is chosen for its DISTRIBUTED form, not ported from
  * a single-machine shape:
  *  - components: min-label propagation with pointer jumping
  *    (log-diameter rounds, frames confined to the edge set) — the same
  *    loop `Dedup.clusters` runs, extracted here as the shared core;
  *  - PageRank: fixed-iteration power method in INTEGER micro-units —
  *    every contribution is `rank div outdeg` on BIGINTs, so sums are
  *    order-independent and Spark and the SQL oracle produce
  *    bit-identical ranks (no IEEE accumulation-order divergence, the
  *    same trick as the quantized-embedding oracles);
  *  - triangles: compact-forward with degree orientation — each edge
  *    oriented from its lower-(degree, id) endpoint, so wedge fan-out is
  *    bounded by arboricity-ish degrees instead of hub degrees (the hub
  *    that breaks the naive id-ordering at 100 TB generates no wedges
  *    here; the count is orientation-invariant, which is why the oracle
  *    can use the simpler id-ordered triple join).
  */
object Graph {

  // ---------------------------------------------------------------- core

  private val MaxRounds = 50

  /** Connected components by min-label propagation with pointer jumping.
    *
    * Input: one row per undirected edge, columns (`u`, `v`). Output:
    * (`id`, `label`) for every endpoint, `label` = min node id in the
    * component. Each round a node takes the min of its own label, its
    * neighbors' labels, and its label's label — the shortcut makes
    * rounds grow as log(diameter). Throws rather than returning
    * non-converged labels.
    *
    * Every round ends in a LAZY `localCheckpoint` PLUS `persist`, and
    * both halves are load-bearing (each alone fails on a real graph):
    *  - without the checkpoint, the logical plan triples per round
    *    (`labels` feeds the neighbor join and both pointer-jump sides) —
    *    exponential analyzer/explain cost that OOMed the driver on a
    *    60-edge path (GraphSpec);
    *  - without the persist, planning reads the checkpoint's
    *    PROPAGATED stats (`LogicalRDD.originStats` carries the origin
    *    plan's sizeInBytes ESTIMATE, it never re-measures), and that
    *    estimate multiplies through three joins per round — a
    *    super-exponential BigInt whose arithmetic first slows planning
    *    to minutes and then throws `BigInteger would overflow` (hit at
    *    sf0.1, 17+ rounds). The persist routes planning through
    *    `InMemoryRelation`, whose stats are the REAL materialized bytes.
    * The lazy checkpoint, the cache fill, and the convergence count all
    * ride ONE job per round; superseded caches are released each round
    * and checkpoint blocks are reclaimed by the ContextCleaner.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("u"), col("v")).union(
      pairs.select(col("v").as("u"), col("u").as("v"))).cache()
    var backing = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .withColumn("old", col("label"))
      .localCheckpoint(eager = false)
    backing.persist()
    var labels = backing.select(col("id"), col("label"))
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < MaxRounds) {
      val neighborMin = edges
        .join(labels, edges("v") === labels("id"))
        .groupBy(edges("u").as("nid"))
        .agg(min(col("label")).as("nmin"))
      val jump = labels.as("l")
        .join(labels.select(col("id").as("jid"), col("label").as("jlabel")),
          col("l.label") === col("jid"))
        .select(col("l.id").as("id"), col("l.label").as("label"),
          col("jlabel"))
      val mat = jump
        .join(neighborMin, col("id") === col("nid"), "left_outer")
        .select(col("id"), col("label").as("old"),
          least(col("label"), col("jlabel"),
            coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
      mat.persist()
      // one job: runs the round, populates checkpoint + cache, counts
      changed = mat.where(col("label") =!= col("old")).count()
      backing.unpersist() // safe: the count above materialized `mat`
      backing = mat
      labels = mat.select(col("id"), col("label"))
      rounds += 1
    }
    edges.unpersist()
    if (changed > 0) {
      backing.unpersist()
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $MaxRounds pointer-" +
          "jumping rounds (labels would be wrong — refusing to return them)")
    }
    // materialize the small final labeling, then release the last round's
    // cache — nothing stays cached after the operator returns
    val out = labels.localCheckpoint()
    backing.unpersist()
    out
  }

  /** PageRank in integer micro-units, fixed `iters` power iterations.
    *
    * rank held as BIGINT micro-units of `Scale`; per iteration
    *   contrib(v→u) = rank(v) div outdeg(v)
    *   rank'(u)     = (15·Scale) div (100·N)  +  (85·Σ contrib(u)) div 100
    * — floor divisions on positive BIGINTs, so both engines compute the
    * identical integer regardless of partitioning or sum order. Dangling
    * mass (nodes with no out-edges) is dropped, not redistributed — the
    * standard "weak" formulation; both engines drop it identically.
    * `85·Σcontrib ≤ 85·Scale ≈ 8.5e13` — no BIGINT overflow.
    *
    * Shape at scale: each iteration is one src-keyed join plus one
    * dst-keyed reduction; the node and out-degree frames are computed
    * once and cached for the unrolled loop, then released after the
    * (tiny) result is materialized. The rank frame is used exactly once
    * per iteration, so the unrolled plan is a linear chain — nothing is
    * recomputed.
    */
  private val Scale = 1000000000000L

  def pagerankInt(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    val n = nodes.agg(count(lit(1)).as("n"))
    def withParams(df: DataFrame): DataFrame = df.crossJoin(broadcast(n))
    var ranks = withParams(nodes)
      .select(col("node"), expr(s"${Scale}L div n").as("r"))
    for (_ <- 1 to iters) {
      val sums = e
        .join(outdeg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = withParams(nodes)
        .join(sums, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (expr(s"(15 * ${Scale}L) div (100 * n)") +
            expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }
    val out = ranks.localCheckpoint()
    Seq(e, nodes, outdeg).foreach(_.unpersist())
    out
  }

  /** Triangle census of an undirected graph: one row with node, edge,
    * wedge and triangle counts plus the global clustering coefficient
    * `3·triangles / wedges` (two exact integers, one IEEE division).
    *
    * Input: (`u`, `v`) pairs in any order; canonicalized and
    * de-duplicated here. Wedges come straight off the degree frame
    * (Σ d·(d−1)/2 — no join). Triangles: compact-forward — orient each
    * edge from its lower-(degree, id) endpoint, join oriented edges on
    * the pivot, close the wedge against the canonical edge set.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct().cache()
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
    // orient by (deg, id): src = lower endpoint under that order
    val da = deg.select(col("node").as("a"), col("deg").as("dega"))
    val db = deg.select(col("node").as("b"), col("deg").as("degb"))
    val lowerA = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    val oriented = e.join(da, "a").join(db, "b")
      .select(when(lowerA, col("a")).otherwise(col("b")).as("src"),
        when(lowerA, col("b")).otherwise(col("a")).as("dst"))
    val wedge = oriented.as("o1")
      .join(oriented.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.dst") < col("o2.dst"))
      .select(col("o1.dst").as("x"), col("o2.dst").as("y"))
    val nTri = wedge
      .join(e, least(col("x"), col("y")) === col("a") &&
        greatest(col("x"), col("y")) === col("b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val out = broadcast(nNodes).crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(nWedges)).crossJoin(broadcast(nTri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("clustering"))
      .localCheckpoint()
    e.unpersist()
    out
  }

  // ------------------------------------------------------- fixture edges

  /** The ship graph: one directed edge per (supplier → customer) pair
    * that ever shipped, the fixture analog of the reference's tx→rx link
    * rows (SURVEY.md §6). One equi-join shuffled on the order key, then
    * a distinct on the pair — both map straight onto exchanges.
    */
  private def shipEdges(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .select(col("l.l_suppkey").as("s"), col("o.o_custkey").as("c"))
      .distinct()

  private val shipEdgesSql =
    """SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  /** Bipartite node ids folded into one BIGINT space: customers even,
    * suppliers odd. Pure integer arithmetic, identical in both engines.
    */
  private def suppNode(c: Column): Column = c * 2 + 1
  private def custNode(c: Column): Column = c * 2

  // ---------------------------------------------------------- operators

  /** Degree distribution of the ship graph, per side: how many suppliers
    * serve exactly d customers, how many customers buy from exactly d
    * suppliers. Two reductions off one shared edge frame; the histogram
    * frames are |distinct degrees|-sized.
    */
  def degrees(spark: SparkSession, dir: String): DataFrame = {
    val e = shipEdges(spark, dir)
    def side(key: String, label: String): DataFrame =
      e.groupBy(col(key)).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .select(lit(label).as("side"), col("degree"), col("n_nodes"))
    side("s", "supplier").unionAll(side("c", "customer"))
  }

  val degreesSql: String =
    s"""WITH e AS ($shipEdgesSql)
       |SELECT 'supplier' AS side, degree, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM (SELECT s, count(*) AS degree FROM e GROUP BY s) GROUP BY degree
       |UNION ALL
       |SELECT 'customer', degree, count(*)
       |FROM (SELECT c, count(*) AS degree FROM e GROUP BY c) GROUP BY degree""".stripMargin

  /** Connected components of the January–February high-volume ship
    * subgraph (quantity ≥ 49): which suppliers and customers form
    * trading islands when only peak shipments count. The restriction is
    * the operator's point — on the full graph everything is one giant
    * component; on the thresholded subgraph the fixture yields ~48
    * components from singleton stars up to a 193-node core. Pointer
    * jumping does the labeling; the oracle states the same fixpoint as
    * recursive reachability.
    */
  private val ComponentEdgeCond =
    "l_quantity >= 49 AND month(l_shipdate) IN (1, 2)"

  def components(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"))
      .distinct()
    connectedComponents(e)
      .select(
        when(col("id") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("id div 2").as("key"),
        col("label").as("component"))
  }

  val componentsSql: String =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS u, o_custkey * 2 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE $ComponentEdgeCond
       |), edges AS (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
       |), walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |)
       |SELECT CASE WHEN u % 2 = 1 THEN 'supplier' ELSE 'customer' END AS side,
       |       u // 2 AS key, min(x) AS component
       |FROM walk GROUP BY u""".stripMargin

  /** Top-20 ship-graph PageRank (5 integer-exact power iterations,
    * damping 0.85): which nodes sit at the center of the flow. Suppliers
    * are the only sources, so after round 1 their rank is the base term
    * and customer ranks order by weighted in-link mass — the "most
    * linked-to site" question a link-map user asks. The SQL twin unrolls
    * the same five iterations as chained CTEs; because the arithmetic is
    * all floor division on BIGINTs, the two engines agree bit-for-bit
    * (see `pagerankInt`).
    */
  private val PrIters = 5

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val e = shipEdges(spark, dir)
      .select(suppNode(col("s")).as("src"), custNode(col("c")).as("dst"))
    pagerankInt(e, PrIters)
      .orderBy(col("r").desc, col("node").asc)
      .limit(20)
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("r").as("rank_micros"))
  }

  val pagerankSql: String = {
    val rec = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT node,
         |         (15 * ${Scale}) // (100 * n) +
         |         (85 * COALESCE(s, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN params
         |  LEFT JOIN (SELECT e.dst AS d, sum(pr.r // od.outdeg) AS s
         |             FROM e JOIN r${i - 1} pr ON pr.node = e.src
         |             JOIN od ON od.src = e.src
         |             GROUP BY e.dst) agg ON agg.d = node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH se AS ($shipEdgesSql),
       |e AS (SELECT s * 2 + 1 AS src, c * 2 AS dst FROM se),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |params AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node, ${Scale} // n AS r FROM nodes CROSS JOIN params),
       |$rec
       |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS side,
       |       node // 2 AS key, CAST(r AS BIGINT) AS rank_micros
       |FROM r$PrIters
       |ORDER BY r DESC, node LIMIT 20""".stripMargin
  }

  /** Triangle census of the document near-dup graph: near-duplication
    * should be near-transitive (A~B, B~C usually means A~C), and the
    * clustering coefficient quantifies how true that is for the corpus —
    * a low value flags chains of borderline pairs that `dedup_clusters`
    * would glue into one family. Rides the persisted-pair machinery of
    * `Dedup.minhashLsh`; the oracle counts the same triangles with the
    * id-ordered triple join (the count is orientation-invariant).
    */
  def nearDupTriangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(Dedup.minhashLsh(spark, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v")))

  val nearDupTrianglesSql: String =
    s"""WITH pairs AS (
       |${Dedup.minhashLshSql}
       |), e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |), deg AS (
       |  SELECT node, count(*) AS deg FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e
       |  ) GROUP BY node
       |), tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
       |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
       |)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       |       (SELECT CAST(COALESCE(sum(deg * (deg - 1) // 2), 0) AS BIGINT)
       |        FROM deg) AS n_wedges,
       |       CAST(n_triangles AS BIGINT) AS n_triangles,
       |       CASE WHEN (SELECT sum(deg * (deg - 1) // 2) FROM deg) > 0
       |            THEN round(3.0 * n_triangles /
       |                       (SELECT sum(deg * (deg - 1) // 2) FROM deg), 6)
       |            ELSE 0.0 END AS clustering
       |FROM tri""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("graph_degree", degrees _, Some(degreesSql)),
    Op("graph_components", components _, Some(componentsSql)),
    Op("graph_pagerank", pagerank _, Some(pagerankSql)),
    Op("graph_triangles", nearDupTriangles _, Some(nearDupTrianglesSql)))
}
