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
  *  - components: alternating large-star/small-star contraction
  *    (O(log² n) rounds on any graph, frames confined to the edge set)
  *    — the shared core `Dedup.clusters` also rides;
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

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond" — O(log² n) rounds on ANY graph).
    *
    * Input: one row per undirected edge, columns (`u`, `v`). Output:
    * (`id`, `label`) for every endpoint, `label` = min node id in the
    * component. Throws rather than returning non-converged labels.
    *
    * Why not min-label propagation with pointer jumping (this core's
    * first form): its pointer doubling only compresses label CHAINS —
    * merging two local-minimum basins still crawls one edge-hop per
    * round, so rounds track the graph's effective diameter (measured: 29
    * rounds on the sf0.1 ship subgraph; the path-graph specs converge
    * fast only because ids are ordered along the path). The star
    * operations instead REWRITE the edge set toward a star forest —
    * large-star points every larger neighbor at the neighborhood
    * minimum, small-star folds the smaller neighbors — and provably
    * converge in logarithmically many alternations with the component
    * minimum as each star's root. Every step is a groupBy(min) + an
    * equi-join + a distinct: plain exchanges at any scale.
    *
    * Each alternation ends in a LAZY `localCheckpoint` PLUS `persist`,
    * and both halves are load-bearing (each alone failed on a real
    * graph in this core's loop-shaped history):
    *  - without the checkpoint the logical plan multiplies per round —
    *    exponential analyzer/explain cost (OOMed on a 60-edge path);
    *  - without the persist, planning reads the checkpoint's PROPAGATED
    *    stats (`LogicalRDD.originStats` carries the origin plan's
    *    sizeInBytes ESTIMATE, never re-measured), which multiply
    *    per round into a BigInt whose arithmetic first slows planning to
    *    minutes and then throws `BigInteger would overflow` (hit at
    *    sf0.1). The persist routes planning through `InMemoryRelation`'s
    *    REAL materialized bytes.
    * The checkpoint, cache fill, and the convergence count ride one job
    * per alternation; superseded caches are released each round.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    // NOTE the input subtree is consumed TWICE (edge build + node set):
    // callers whose pair frame is expensive to derive materialize it
    // first (components/spatial/incremental localCheckpoint theirs; the
    // fuzzy ER caller documents the same). r17 probed doing it HERE
    // unconditionally: callers with cheap or already-materialized
    // inputs regressed (+0.75 s dedup_clusters, +1.27 s fuzzy_er — a
    // second cache layer buys nothing), so the cut stays caller-side.
    val input = pairs.select(col("u"), col("v"))
    // canonical node set (for singletons via self-pairs, and the final
    // left join that labels every endpoint)
    val nodes = input.select(col("u").as("id"))
      .union(input.select(col("v").as("id"))).distinct().cache()

    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    // m(u) = min(N(u) ∪ {u}) over the symmetrized neighborhood
    def mins(s: DataFrame): DataFrame = s.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // large-star: (v, m(u)) for each neighbor v > u. No distinct here:
    // duplicates are bounded (≤ 2|E| rows) and small-star's closing
    // distinct dedups the round — one exchange instead of two.
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.join(mins(s), "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
    }
    // small-star: (v, m(u)) for each neighbor v ≤ u, plus (u, m(u))
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = mins(s)
      s.join(m, "u").where(col("v") < col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }

    var edges = input.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(eager = false)
    edges.persist()
    var rounds = 0
    var converged = false
    var prevCount = -1L
    // AQE re-optimizes at every exchange; on this loop's edge-graph-sized
    // frames that re-planning latency dominates the actual work (~8
    // exchanges × N rounds of milliseconds-sized shuffles). It is
    // switched off for the loop — and replaced, not just removed: the
    // shuffle width is re-derived from the MEASURED edge count every
    // round (~64k edges per partition, capped at the session setting),
    // which is the same width decision AQE's coalescing would make,
    // paid once per round instead of once per stage. Both confs are
    // restored on exit.
    val spark = pairs.sparkSession
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val widthWas = spark.conf.get("spark.sql.shuffle.partitions")
    def setWidth(edgeCount: Long): Unit =
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(widthWas.toLong, edgeCount / 64000 + 1)).toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // Whole-stage codegen recompiles EVERY round: the round's plan is
    // new (fresh expression ids over a new checkpoint RDD), so its
    // generated source never hits the codegen cache — ~6 Janino
    // compilations per round of pure driver latency. Below ~10M edges
    // the interpreted path wins outright (measured: compilation was the
    // round, the data is milliseconds); above it, per-row codegen gains
    // amortize the compiles and the threshold keeps codegen on.
    val codegenWas = spark.conf.get("spark.sql.codegen.wholeStage")
    def setCodegen(edgeCount: Long): Unit =
      spark.conf.set("spark.sql.codegen.wholeStage",
        (edgeCount >= 10000000L).toString)
    // Broadcast joins add three build-side jobs (driver collect +
    // broadcast each) of pure latency per round; on the loop's frames a
    // merge join at the size-derived width is one linear pipeline. At
    // scale the star-edge frame is never dimension-sized anyway.
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t0 = System.nanoTime()
      prevCount = edges.count()
      setWidth(prevCount)
      setCodegen(prevCount)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] edge build ${(System.nanoTime() - t0) / 1e9}%.2fs n=$prevCount")
      while (!converged && rounds < MaxRounds) {
        val tr = System.nanoTime()
        // one alternation per materialized round: chaining two (to
        // amortize fixed costs) was measured 5× SLOWER — the inner
        // star's output is never materialized, so the outer star plans
        // against compounded estimates and a doubled join depth
        val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
        next.persist()
        val nextCount = next.count() // one job: round + checkpoint + cache
        // set equality: same cardinality and no edge outside the old set
        converged = nextCount == prevCount &&
          next.join(edges, Seq("u", "v"), "left_anti").isEmpty
        edges.unpersist()
        edges = next
        prevCount = nextCount
        setWidth(nextCount)
        rounds += 1
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(f"[cc] round $rounds edges=$nextCount converged=$converged ${(System.nanoTime() - tr) / 1e9}%.2fs")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", widthWas)
      spark.conf.set("spark.sql.codegen.wholeStage", codegenWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    }
    if (!converged) {
      edges.unpersist(); nodes.unpersist()
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $MaxRounds star rounds " +
          "(component labels would be wrong — refusing to return them)")
    }
    // converged: `edges` is a star forest (child, root) with the
    // component minimum as root; roots and singletons label themselves
    val out = nodes
      .join(edges.select(col("u").as("id"), col("v").as("lbl")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
      .localCheckpoint()
    edges.unpersist(); nodes.unpersist()
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
  private[graft] val Scale = 1000000000000L

  /** The oracle's unrolled power-iteration CTE chain (`r1..rN`), shared
    * by `graph_pagerank` and the domain-graph rank — references CTEs
    * named `e`/`nodes`/`params`/`od`/`r0` that the caller defines.
    */
  private[graft] def pagerankIterSql(iters: Int): String =
    (1 to iters).map { i =>
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

  def pagerankInt(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // out-degree is static across iterations: attach it to the edge
    // frame ONCE and cache that, so each unrolled iteration pays only
    // the rank join + the dst reduction (the degree join would otherwise
    // repeat `iters` times)
    val eOut = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
      "src").cache()
    // Per-iteration crossJoin(broadcast(n)) retained: r17 probed
    // attaching n to the cached node frame once (fewer broadcast
    // builds on paper) and measured pagerank/ppr +35–70% twice — the
    // slim (node)-only cache feeding each iteration's rank join beats
    // saving the trivial 1-row broadcasts.
    val nodes = nodes0.cache()
    val n = nodes.agg(count(lit(1)).as("n"))
    def withParams(df: DataFrame): DataFrame = df.crossJoin(broadcast(n))
    var ranks = withParams(nodes)
      .select(col("node"), expr(s"${Scale}L div n").as("r"))
    // Per-iteration LAZY localCheckpoint — the components-loop hygiene at
    // `connectedComponents`: without it the unrolled chain is analyzed/
    // optimized as ONE deep plan on first execution (r6 measured a 16 s
    // first-run planning spike vs a 5 s steady state). The lazy barrier
    // keeps per-iteration planning flat while the whole chain still
    // executes as one job at the final materialization; the intermediate
    // node-sized rank caches are released once the result exists.
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      val sums = eOut
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = withParams(nodes)
        .join(sums, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (expr(s"(15 * ${Scale}L) div (100 * n)") +
            expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint(eager = false)
      intermediates += ranks
    }
    val out = ranks.localCheckpoint()
    Seq(e, nodes, eOut).foreach(_.unpersist())
    intermediates.foreach(_.unpersist())
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
  /** Strongly connected components of a DIRECTED graph — the question
    * the undirected `connectedComponents` cannot answer on a web graph
    * (u links v says nothing about v linking u; the web's bowtie
    * structure — giant SCC, IN, OUT, tendrils — is defined by MUTUAL
    * reachability). Trim-then-color, the FW-BW/coloring family (Orzan
    * 2004; Slota et al. 2014) reduced to its deterministic dataframe
    * core:
    *
    *  1. TRIM to fixpoint: a node with no in-edges or no out-edges in
    *     the remaining graph is its own SCC — peel all of them per
    *     iteration (one membership semi-join each side). Chains and
    *     tendrils (most of a crawl graph) never reach the expensive
    *     phase.
    *  2. COLOR forward to fixpoint: color(v) = max(id over ancestors ∪
    *     {v}). Every nonempty color class contains its root r
    *     (color(r) = r), and r's ancestors within the class are
    *     exactly… nothing larger, so:
    *  3. MARK backward within the class: v is in SCC(r) iff
    *     color(v) = r and v reaches r through same-colored nodes
    *     (⇐ r ⇝ v by color, v ⇝ r by mark; ⇒ members of SCC(r) share
    *     r's ancestor set so their color is r, and reach r inside it).
    *     Every marked class is emitted (label = MIN member id — the
    *     `connectedComponents` label convention, matched by the
    *     oracle's mutual-reachability min), removed, and the loop
    *     repeats on the remainder.
    *
    * Output: (`id`, `label`) for every endpoint. Throws rather than
    * returning non-converged labels (the components discipline) — and
    * the throw paths release every pinned frame (all persists go
    * through a pin set drained in the finally). Every step is a
    * groupBy + equi-join over the REMAINING edge frame; each inner
    * iteration and each outer round ends in a lazy localCheckpoint +
    * persist with superseded caches released (the loop hygiene
    * documented at [[connectedComponents]] — same plan-growth and
    * stats-propagation failure modes). At 100 TB the giant SCC empties
    * the graph in the first color round and trims absorb the tendrils,
    * so rounds stay far from the worst case. The inner fixpoint bounds
    * scale with the graph (trim ≤ edge count + 2 peels, color/mark ≤
    * node count + 2 waves — the true convergence bounds), so the
    * guards are pure runaway backstops, never reachable on a finite
    * graph; wall-clock on a pathological diameter-D graph is O(D)
    * joins (trim peels a pure chain 2 nodes per wave), which is the
    * algorithm's published behavior, not a budget.
    */
  def stronglyConnectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // input consumed twice (node set + edge build): materialization is
    // the CALLER's call, exactly as in [[connectedComponents]] —
    // bowtieClasses already passes a checkpointed frame, and the r17
    // probe showed an unconditional cut here re-materializes it
    val input = pairs.select(col("u"), col("v"))
    val allNodes = input.select(col("u").as("id"))
      .union(input.select(col("v").as("id"))).distinct()
      .localCheckpoint()
    var labels = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        allNodes.schema.fields.map(_.copy(name = "id")) ++
          allNodes.schema.fields.map(_.copy(name = "label"))))
    var edges = input.where(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    // every persist goes through the pin set so ANY exit — success or
    // a refusing-to-label throw — releases every cached frame
    val pinned = scala.collection.mutable.LinkedHashSet[DataFrame]()
    def pin(df: DataFrame): Unit = { df.persist(); pinned += df }
    def unpin(df: DataFrame): Unit = { df.unpersist(); pinned -= df }
    pin(edges)
    var edgeCount = edges.count()
    val nodeCount = allNodes.count()
    // true convergence bounds (+2 slack), NOT budgets: trim removes at
    // least one edge per effective wave; color/mark advance at least
    // one node per wave along the longest remaining path
    val waveCap = math.max(MaxRounds.toLong * 10L, nodeCount + 2L)
    var outer = 0
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      while (edgeCount > 0 && outer < MaxRounds) {
        // ---- trim: peel no-in / no-out nodes until none move
        var trimmed = true
        var trims = 0L
        val trimCap = math.max(waveCap, edgeCount + 2L)
        while (trimmed && trims < trimCap) {
          val next = edges
            .join(edges.select(col("v").as("u")).distinct(), Seq("u"),
              "left_semi") // u has an in-edge
            .join(edges.select(col("u").as("v")).distinct(), Seq("v"),
              "left_semi") // v has an out-edge
            .select(col("u"), col("v"))
            .localCheckpoint(eager = false)
          pin(next)
          val nextCount = next.count()
          trimmed = nextCount != edgeCount
          unpin(edges)
          edges = next
          edgeCount = nextCount
          trims += 1
        }
        if (trimmed) throw new IllegalStateException(
          "scc: trim did not reach a fixpoint — refusing to label")
        if (edgeCount > 0) {
          val live = edges.select(col("u").as("id"))
            .union(edges.select(col("v").as("id"))).distinct()
            .localCheckpoint(eager = false)
          pin(live); live.count()
          // ---- color: forward max propagation to fixpoint.
          // `colorsPinned` tracks the PERSISTED dataset: unpersist must
          // be called on the exact cached plan — unpersisting a
          // projection of it would leave the cache entry behind (the
          // cache-hygiene regression the GraphSpec sweep pins).
          var colorsPinned = live.select(col("id"), col("id").as("color"))
            .localCheckpoint(eager = false)
          pin(colorsPinned)
          var colors = colorsPinned
          var changed = 1L
          var iters = 0L
          while (changed > 0 && iters < waveCap) {
            val push = edges
              .join(colors.select(col("id").as("u"), col("color")), Seq("u"))
              .groupBy(col("v").as("id")).agg(max(col("color")).as("inc"))
            val next = colors.join(push, Seq("id"), "left_outer")
              .select(col("id"),
                greatest(col("color"), coalesce(col("inc"), col("color")))
                  .as("color"),
                (col("inc") > col("color")).as("chg"))
              .localCheckpoint(eager = false)
            pin(next)
            changed = next.where(col("chg")).count()
            unpin(colorsPinned)
            colorsPinned = next
            colors = next.select(col("id"), col("color"))
            iters += 1
          }
          if (changed > 0) throw new IllegalStateException(
            "scc: color propagation did not converge — refusing to label")
          // ---- mark: backward reachability to the root within a class
          var marked = colors.where(col("id") === col("color"))
            .localCheckpoint(eager = false)
          pin(marked)
          var mCount = marked.count()
          var grew = true
          var mIters = 0L
          val colored = edges
            .join(colors.select(col("id").as("u"), col("color")), Seq("u"))
            .join(colors.select(col("id").as("v"),
              col("color").as("cv")), Seq("v"))
            .where(col("color") === col("cv"))
            .select(col("u"), col("v"), col("color"))
            .localCheckpoint(eager = false)
          pin(colored); colored.count()
          while (grew && mIters < waveCap) {
            val next = marked.union(
                colored.join(marked.select(col("id").as("v"), col("color")),
                  Seq("v", "color"))
                  .select(col("u").as("id"), col("color")))
              .distinct()
              .localCheckpoint(eager = false)
            pin(next)
            val nCount = next.count()
            grew = nCount != mCount
            unpin(marked)
            marked = next
            mCount = nCount
            mIters += 1
          }
          if (grew) throw new IllegalStateException(
            "scc: backward mark did not converge — refusing to label")
          // ---- emit the marked classes, remove them, go around
          val emitted = marked
            .join(marked.groupBy(col("color")).agg(min(col("id")).as("label")),
              Seq("color"))
            .select(col("id"), col("label"))
          labels = labels.union(emitted).localCheckpoint()
          val survivors = live.join(marked.select(col("id")), Seq("id"),
            "left_anti").localCheckpoint(eager = false)
          pin(survivors); survivors.count()
          val nextEdges = edges
            .join(survivors.select(col("id").as("u")), Seq("u"), "left_semi")
            .join(survivors.select(col("id").as("v")), Seq("v"), "left_semi")
            .select(col("u"), col("v"))
            .localCheckpoint(eager = false)
          pin(nextEdges)
          edgeCount = nextEdges.count()
          unpin(edges); unpin(colorsPinned); unpin(marked)
          unpin(colored); unpin(live); unpin(survivors)
          edges = nextEdges
        }
        outer += 1
      }
      if (edgeCount > 0) throw new IllegalStateException(
        s"scc: residual edges after $MaxRounds rounds — refusing to label")
    } finally {
      pinned.foreach(_.unpersist())
      pinned.clear()
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    }
    // everything never emitted through a marked class is a singleton
    val out = allNodes
      .join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      .localCheckpoint()
    out
  }

  /** All nodes reachable from `seeds` along directed `edges` (u → v),
    * seeds included — frontier-expansion BFS with the loop hygiene
    * documented at [[connectedComponents]] (lazy checkpoint + persist
    * per wave, superseded caches released). Each wave is one semi-join
    * + one anti-join over the CURRENT frontier, so total work is
    * O(edges touched), not O(edges · diameter); at crawl scale the
    * frames are |domains|-sized. Throws on non-convergence.
    */
  def reachableFrom(edges: DataFrame, seeds: DataFrame): DataFrame = {
    var reached = seeds.select(col("id")).distinct()
      .localCheckpoint(eager = false)
    reached.persist()
    var frontier = reached
    var fCount = frontier.count()
    // the anti-join makes every continuing wave add >= 1 node, so
    // waves <= nodes reached: the cap scales with observed growth and
    // is a pure runaway backstop, unreachable on a finite graph of any
    // diameter
    var added = 0L
    var waves = 0L
    while (fCount > 0 && waves < MaxRounds.toLong * 10L + added) {
      val next = edges
        .join(frontier.select(col("id").as("u")), Seq("u"), "left_semi")
        .select(col("v").as("id")).distinct()
        .join(reached, Seq("id"), "left_anti")
        .localCheckpoint(eager = false)
      next.persist()
      fCount = next.count()
      val grown = reached.union(next).localCheckpoint(eager = false)
      grown.persist(); grown.count()
      reached.unpersist()
      if (frontier ne reached) frontier.unpersist()
      reached = grown
      frontier = next
      added += fCount
      waves += 1
    }
    if (fCount > 0) {
      reached.unpersist(); frontier.unpersist()
      throw new IllegalStateException(
        "reachableFrom: frontier still growing at the wave cap")
    }
    frontier.unpersist()
    val out = reached.localCheckpoint()
    reached.unpersist()
    out
  }

  /** Per-node bowtie class over a directed edge frame: `scc` (member
    * of the giant SCC — largest, ties by smallest label), `in` (reaches
    * the giant), `out` (reachable from it), `other` (tendrils, tubes,
    * disconnected). Returns (id, label, bowtie_class) where `label` is
    * the node's SCC label. The 1-row giant frame rides broadcast cross
    * joins, never a collect; the two reachability passes are the
    * frontier BFS above over |nodes|-sized frames.
    */
  def bowtieClasses(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("u"), col("v")).localCheckpoint()
    val scc = stronglyConnectedComponents(edges)
    val giant = scc.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label").asc).limit(1)
      .select(col("label").as("giant_label"))
    val members = scc.crossJoin(broadcast(giant))
      .where(col("label") === col("giant_label"))
      .select(col("id"))
    val outReach = reachableFrom(edges, members)
      .select(col("id"), lit(true).as("fwd"))
    val inReach = reachableFrom(
        edges.select(col("v").as("u"), col("u").as("v")), members)
      .select(col("id"), lit(true).as("bwd"))
    scc.crossJoin(broadcast(giant))
      .join(outReach, Seq("id"), "left_outer")
      .join(inReach, Seq("id"), "left_outer")
      .select(col("id"), col("label"),
        when(col("label") === col("giant_label"), "scc")
          .when(col("bwd").isNotNull, "in")
          .when(col("fwd").isNotNull, "out")
          .otherwise("other").as("bowtie_class"))
  }

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
    // NOT materialized (r17 probe): AQE's runtime exchange reuse
    // already shares the distinct's shuffle between the two per-side
    // reductions; an eager localCheckpoint measured +0.5 s at sf0.1
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
      // the components core consumes its input twice (edge build +
      // node set): materialize the scan-join once (r17, −0.35 s sf0.1)
      .localCheckpoint()
    connectedComponents(e)
      .select(
        when(col("id") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("id div 2").as("key"),
        col("label").as("component"))
  }

  /** Incremental connected components — the corpus-growth twin of
    * `components`, the way labeling actually runs at 100 TB: the
    * historical graph is represented ONLY by its persisted (node,
    * label) frame (labels are component MINIMUM ids from the star
    * core), a new edge batch contracts its endpoints through the
    * stored labels, and the components loop runs on that CONTRACTED
    * graph — O(batch edges + touched components), never O(corpus).
    *
    * Why the result is EXACT (bit-equal to a full recompute, which is
    * what the oracle checks): labels are component minima, so merging
    * components through the contracted edges takes the min over
    * {stored label ids} ∪ {new node ids} — precisely the min over all
    * member ids of the merged component, i.e. the label a full run
    * assigns. A batch edge inside one existing component contracts to
    * a self-loop, which the core reduces to a no-op singleton.
    *
    * History/batch split by l_orderkey parity (the `minhashIncremental`
    * convention) so both paths — novel components and cross-component
    * merges — exercise at any sf; the label snapshot is
    * content-addressed to the lineitem fixture via the SnapshotStore,
    * written once and reused (the persisted-index discipline).
    */
  def componentsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"),
        (col("l.l_orderkey") % 2 === 0).as("is_hist"))
    val histE = raw.where(col("is_hist")).select(col("u"), col("v")).distinct()
    val batchE = raw.where(!col("is_hist")).select(col("u"), col("v")).distinct()
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark,
        Seq(s"$dir/lineitem.parquet", s"$dir/orders.parquet"), "graft_ccstore")
    if (!store.hasTableSnapshot("cc_labels", ts))
      store.writeTableSnapshot(connectedComponents(histE), "cc_labels", ts)
    val labels = store.readTableSnapshot(spark, "cc_labels", ts)
      .select(col("id"), col("label"))
    componentsIncrementalMerge(labels, batchE)
      .select(
        when(col("id") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("id div 2").as("key"),
        col("label").as("component"))
  }

  /** The pure merge step of the incremental labeling: `labels` is the
    * persisted (id, label) frame where every label is its component's
    * MINIMUM member id, `batchE` is the new (u, v) edge batch. Returns
    * the updated (id, label) frame covering labels ∪ batch nodes. The
    * batch edges are contracted through the stored labels, the star
    * core runs on that contracted graph only, and the result relabels
    * history rows by their OLD label (one broadcast-sized join — the
    * contracted graph has at most 2·|batchE| nodes, never O(corpus)).
    * Exactness argument in [[componentsIncremental]]'s doc.
    */
  def componentsIncrementalMerge(labels: DataFrame, batchE: DataFrame)
      : DataFrame = {
    val contracted = batchE
      .join(labels.select(col("id").as("u"), col("label").as("lu")),
        Seq("u"), "left_outer")
      .join(labels.select(col("id").as("v"), col("label").as("lv")),
        Seq("v"), "left_outer")
      .select(coalesce(col("lu"), col("u")).as("u"),
        coalesce(col("lv"), col("v")).as("v"))
      // batch-sized; the core consumes it twice — materialize (r17)
      .localCheckpoint()
    val merged = connectedComponents(contracted)
    val relabel = merged
      .select(col("id").as("label"), col("label").as("new_label"))
    val histFinal = labels.join(relabel, Seq("label"), "left_outer")
      .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
    val batchOnly = batchE.select(col("u").as("id"))
      .union(batchE.select(col("v").as("id"))).distinct()
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .join(merged, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    histFinal.unionByName(batchOnly)
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
    val rec = pagerankIterSql(PrIters)
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

  /** Personalized PageRank in integer micro-units — the seed-expansion
    * primitive (related-domain discovery for crawl frontiers, "customers
    * like these" retrieval): identical floor-division power iterations
    * to `pagerankInt`, except the teleport mass lands UNIFORMLY ON THE
    * SEED SET instead of all nodes:
    *   rank'(u) = seed(u)·(15·Scale) div (100·|S∩V|) + (85·Σ contrib) div 100
    * Seeds outside the graph carry no mass (the |S∩V| denominator —
    * both engines intersect identically). Exchange profile is exactly
    * pagerank's: per iteration one src-keyed join + one dst-keyed
    * reduction over the cached edge/degree frames, lazy checkpoints.
    */
  private[graft] def pprIterSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT node,
         |         CASE WHEN is_seed THEN (15 * ${Scale}) // (100 * ns)
         |              ELSE 0 END +
         |         (85 * COALESCE(s, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN sparams
         |  LEFT JOIN (SELECT e.dst AS d, sum(pr.r // od.outdeg) AS s
         |             FROM e JOIN r${i - 1} pr ON pr.node = e.src
         |             JOIN od ON od.src = e.src
         |             GROUP BY e.dst) agg ON agg.d = node
         |)""".stripMargin
    }.mkString(",\n")

  private[graft] def pprInt(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seeds.select(col("node"), lit(true).as("sd")).distinct(),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("sd"), lit(false)).as("is_seed"))
    val eOut = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
      "src").cache()
    // per-iteration broadcast retained — the pagerankInt adjudication (r17)
    val nodes = nodes0.cache()
    val ns = nodes.where(col("is_seed")).agg(count(lit(1)).as("ns"))
    def withNs(df: DataFrame): DataFrame = df.crossJoin(broadcast(ns))
    var ranks = withNs(nodes)
      .select(col("node"),
        when(col("is_seed"), expr(s"${Scale}L div ns")).otherwise(lit(0L))
          .as("r"))
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      val sums = eOut
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = withNs(nodes)
        .join(sums, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (when(col("is_seed"), expr(s"(15 * ${Scale}L) div (100 * ns)"))
            .otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint(eager = false)
      intermediates += ranks
    }
    val out = ranks.localCheckpoint()
    Seq(e, nodes, eOut).foreach(_.unpersist())
    intermediates.foreach(_.unpersist())
    out
  }

  private val PprIters = 4

  /** graph_ppr: PPR over the BIDIRECTIONAL ship graph (supplier↔customer
    * — the standard bipartite random walk, so mass bounces seed →
    * customers → co-supplied suppliers → …) seeded at suppliers with
    * `s_suppkey % 5 = 1` (deterministic, non-empty at every SF). Top-20
    * by rank — "the entities most related to this seed set".
    */
  def ppr(spark: SparkSession, dir: String): DataFrame = {
    // materialize the directed edges ONCE: the bidirectional union would
    // otherwise execute the lineitem⋈orders subtree twice
    val se = shipEdges(spark, dir)
      .select(suppNode(col("s")).as("src"), custNode(col("c")).as("dst"))
      .localCheckpoint()
    val e = se.union(se.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Tables(spark, dir, "supplier")
      .where(col("s_suppkey") % 5 === 1)
      .select(suppNode(col("s_suppkey")).as("node"))
    pprInt(e, seeds, PprIters)
      .orderBy(col("r").desc, col("node").asc)
      .limit(20)
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("r").as("ppr_micros"))
  }

  val pprSql: String = {
    val rec = pprIterSql(PprIters)
    s"""WITH se AS ($shipEdgesSql),
       |e0 AS (SELECT s * 2 + 1 AS src, c * 2 AS dst FROM se),
       |e AS (SELECT src, dst FROM e0
       |      UNION SELECT dst AS src, src AS dst FROM e0),
       |seeds AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier
       |          WHERE s_suppkey % 5 = 1),
       |nodes AS (SELECT v.node, s.node IS NOT NULL AS is_seed
       |          FROM (SELECT src AS node FROM e
       |                UNION SELECT dst FROM e) v
       |          LEFT JOIN seeds s ON s.node = v.node),
       |sparams AS (SELECT count(*) AS ns FROM nodes WHERE is_seed),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node,
       |              CASE WHEN is_seed THEN ${Scale} // ns ELSE 0 END AS r
       |       FROM nodes CROSS JOIN sparams),
       |$rec
       |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS side,
       |       node // 2 AS key, CAST(r AS BIGINT) AS ppr_micros
       |FROM r$PprIters
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

  /** k-core of an undirected graph: the maximal subgraph in which every
    * node keeps at least `k` neighbors — the standard "dense backbone"
    * extraction (peripheral tendrils peel away; what survives is the
    * mutually-supported core). Iterative peel: each round drops every
    * node whose CURRENT degree is below k, until no node falls. Rounds
    * are bounded by the peel depth of the graph (the number of
    * "degeneracy layers"), not its diameter; each round is one
    * symmetrize + reduce + two semi joins — plain exchanges over the
    * shrinking edge frame at any scale.
    *
    * Loop hygiene follows `connectedComponents` (the measured failure
    * modes of this repo's loop shape): every round ends in a lazy
    * `localCheckpoint` + `persist`, the count that drives convergence
    * also materializes both, superseded caches release per round.
    * Edge sets only SHRINK under peeling, so count equality IS set
    * equality — convergence needs no anti-join. Throws rather than
    * returning a part-peeled graph.
    *
    * Output: (`node`, `core_degree`) — the surviving nodes with their
    * within-core degree (≥ k by construction, pinned in GraphSpec).
    */
  def kcore(pairs: DataFrame, k: Int): DataFrame = {
    def canon(e: DataFrame): DataFrame = e
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    var edges = canon(pairs).localCheckpoint(eager = false)
    edges.persist()
    var prev = edges.count()
    var rounds = 0
    var converged = prev == 0
    // One peel per materialized round. r17 probed chaining three peels
    // per round to amortize the ~0.18 s/round fixed latency (20 rounds
    // at sf0.1): 3.5 → 44 s — each peel consumes its input three times
    // (sym twice + the join base), so an unmaterialized 3-chain
    // re-evaluates the inner peels 3^depth times. The components loop
    // documented the same failure for its two-star chain; the peel
    // depth IS the graph's pendant-chain depth and each round is one
    // linear job — left as the round structure.
    while (!converged && rounds < MaxRounds) {
      val keep = sym(edges).groupBy(col("u")).agg(count(lit(1)).as("d"))
        .where(col("d") >= k)
      val next = edges
        .join(keep.select(col("u")), Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(eager = false)
      next.persist()
      val c = next.count()
      converged = c == prev
      edges.unpersist()
      edges = next
      prev = c
      rounds += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[kcore] round $rounds edges=$c converged=$converged")
    }
    if (!converged) {
      edges.unpersist()
      throw new IllegalStateException(
        s"kcore: no fixpoint after $MaxRounds peel rounds " +
          "(a part-peeled graph is not a k-core — refusing to return it)")
    }
    val out = sym(edges).groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .localCheckpoint()
    edges.unpersist()
    out
  }

  /** 2-core of the peak-shipment subgraph (the `components` edge set):
    * strip every pendant star and chain; what remains is the mutually-
    * reinforced trading core. The oracle unrolls the peel as chained
    * CTEs — peeling is IDEMPOTENT at its fixpoint (a converged round
    * recomputes itself), so a fixed unroll of `KcoreUnroll` rounds is
    * exact whenever the true peel depth is ≤ that (measured 14 rounds
    * at sf0.01 and 20 at sf0.1; GraphSpec re-asserts the margin at
    * fixture scale so drift in the fixture breaks the spec, not the
    * oracle silently).
    */
  private val KcoreK = 2
  private val KcoreUnroll = 26

  def kcoreShip(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"))
    kcore(e, KcoreK)
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("core_degree"))
  }

  val kcoreShipSql: String = {
    // AS MATERIALIZED is load-bearing: each round references the
    // previous CTE four times, and an inlining planner would expand the
    // chain 4^rounds ways (observed as fd exhaustion re-opening the
    // base parquet). Materialization pins each round to one evaluation
    // — the same thing the Spark loop's per-round checkpoint does.
    val rounds = (1 to KcoreUnroll).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT x AS node FROM (
         |    SELECT u AS x FROM p${i - 1} UNION ALL SELECT v FROM p${i - 1}
         |  ) GROUP BY x HAVING count(*) >= $KcoreK
         |), p$i AS MATERIALIZED (
         |  SELECT u, v FROM p${i - 1}
         |  WHERE u IN (SELECT node FROM d$i) AND v IN (SELECT node FROM d$i)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH p0 AS MATERIALIZED (
       |  SELECT DISTINCT least(l_suppkey * 2 + 1, o_custkey * 2) AS u,
       |         greatest(l_suppkey * 2 + 1, o_custkey * 2) AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE $ComponentEdgeCond
       |),
       |$rounds
       |SELECT CASE WHEN x % 2 = 1 THEN 'supplier' ELSE 'customer' END AS side,
       |       x // 2 AS key, CAST(count(*) AS BIGINT) AS core_degree
       |FROM (SELECT u AS x FROM p$KcoreUnroll
       |      UNION ALL SELECT v FROM p$KcoreUnroll)
       |GROUP BY x""".stripMargin
  }

  // -------------------------------------------------------------- BFS

  /** Radius bound shared with the oracle's recursion guard — both sides
    * compute "hop distance, for every node within `BfsRadius` hops",
    * so the operator is exact under the SAME truncation regardless of
    * the graph's true diameter.
    */
  private val BfsRadius = 8

  /** Single-source shortest HOPS over the peak-shipment subgraph
    * (same filtered edge set as `components`/`kcore`), source = the
    * minimum customer node — a pure function of the edge set, so both
    * engines and any two cluster runs pick it without coordination.
    *
    * Scale shape: textbook frontier BFS — each round joins only the
    * FRONTIER (nodes first reached last round) against the persisted
    * edge frame and anti-joins the visited set, so total work is
    * O(edges within the radius), not O(rounds · edges). Per-round lazy
    * `localCheckpoint` is the components-loop planning hygiene; the
    * loop exits early on an empty frontier (sf0.1 reaches fixpoint in
    * 5 rounds; the radius bound is the contract, the early exit just
    * skips provably-empty work).
    */
  /** Frontier BFS core over a DIRECTED edge frame (u, v): hop distance
    * from `src` for every node reachable within `radius` hops.
    * Symmetrize the input first for an undirected walk.
    */
  def bfs(input: DataFrame, src: Long, radius: Int = BfsRadius): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val edges = input.persist()
    var dist = Seq((src, 0L)).toDF("node", "d").persist()
    var frontier = dist
    var r = 1
    var done = false
    while (r <= radius && !done) {
      val next = frontier.join(edges, frontier("node") === edges("u"))
        .select(edges("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("d"))
        .localCheckpoint(eager = false).persist()
      // count(), not isEmpty(): the emptiness probe only computed a
      // partition prefix, so the merged count re-ran the frontier join
      // for the rest — one full-materializing job per wave instead of
      // two partial ones (r17), and the union below then reads caches
      if (next.count() == 0) { next.unpersist(); done = true }
      else {
        val merged = dist.union(next)
          .localCheckpoint(eager = false).persist()
        merged.count()
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = merged
        frontier = next
        r += 1
      }
    }
    // eager cut so every loop cache can release without recompute risk
    val finalDist = dist.localCheckpoint()
    if (frontier ne dist) frontier.unpersist()
    dist.unpersist()
    edges.unpersist()
    finalDist
  }

  def bfsShip(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"))
      .distinct()
      // two consumers (source-pick aggregate + the BFS edge cache):
      // one materialization instead of two lineitem⋈orders runs (r17)
      .localCheckpoint()
    val edges = e.union(e.select(col("v").as("u"), col("u").as("v")))
    // null min = empty edge set: no source exists, return the empty
    // frame instead of NPE-ing (EdgeCaseSpec)
    val srcRow = edges.agg(min(when(col("u") % 2 === 0, col("u"))).as("n"))
      .head()
    if (srcRow.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(String, Long, Long)].toDF("side", "key", "hops")
    }
    bfs(edges, srcRow.getLong(0))
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("d").as("hops"))
  }

  val bfsShipSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (
       |  SELECT u, v FROM (
       |    SELECT DISTINCT l_suppkey * 2 + 1 AS u, o_custkey * 2 AS v
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    WHERE $ComponentEdgeCond)
       |  UNION ALL
       |  SELECT v, u FROM (
       |    SELECT DISTINCT l_suppkey * 2 + 1 AS u, o_custkey * 2 AS v
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    WHERE $ComponentEdgeCond)
       |),
       |src AS (SELECT min(u) AS node FROM e WHERE u % 2 = 0),
       |walk(node, d) AS (
       |  SELECT node, 0 FROM src
       |  UNION
       |  SELECT e.v, w.d + 1 FROM walk w JOIN e ON e.u = w.node
       |  WHERE w.d < $BfsRadius
       |)
       |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
       |         AS side,
       |       node // 2 AS key, CAST(min(d) AS BIGINT) AS hops
       |FROM walk GROUP BY node""".stripMargin

  // ---------------------------------------- neighbor-overlap scoring

  private val JaccardTopN = 20

  /** Super-hub guard for the supplier-keyed self-join: suppliers whose
    * neighbor list exceeds this are EXCLUDED from candidate generation
    * (their deg² pair volume would dominate Σ deg(s)²), and the count
    * of excluded hubs rides every output row as the `capped_hubs`
    * audit column — a capped run is visibly capped, never silently
    * thinner. The r7 verdict required this filter to exist in code,
    * not as a "one filter away" note.
    */
  private val JaccardMaxHubDeg = 256

  /** Core scoring over any bipartite (s, c) edge frame: Jaccard
    * overlap of s-neighborhoods between c-pairs WITHIN the hub-capped
    * graph — both the pair counts and the degrees come from the capped
    * edge frame, so the score stays a true Jaccard of the graph
    * actually joined. Top-N under the total order (jaccard DESC, a,
    * b), so the cut is deterministic under ties.
    */
  def jaccardScores(e: DataFrame, maxHubDeg: Int = JaccardMaxHubDeg,
      topN: Int = JaccardTopN): DataFrame = {
    val sdeg = e.groupBy("s").agg(count(lit(1)).as("sdeg"))
    val kept = sdeg.where(col("sdeg") <= maxHubDeg).select("s")
    val cappedHubs = sdeg.where(col("sdeg") > maxHubDeg)
      .agg(count(lit(1)).as("capped_hubs"))
    val e2 = e.join(kept, Seq("s"), "left_semi")
    val deg = e2.groupBy("c").agg(count(lit(1)).as("deg"))
    val common = e2.as("a").join(e2.as("b"), Seq("s"))
      .where(col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("ca"), col("b.c").as("cb"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("c").as("ca"), col("deg").as("da")), Seq("ca"))
      .join(deg.select(col("c").as("cb"), col("deg").as("db")), Seq("cb"))
      .select(col("ca"), col("cb"), col("common"),
        round(col("common").cast("double") /
          (col("da") + col("db") - col("common")), 6).as("jaccard"))
      .crossJoin(broadcast(cappedHubs))
      .orderBy(col("jaccard").desc, col("ca").asc, col("cb").asc)
      .limit(topN)
  }

  /** Link-prediction candidate scoring: Jaccard overlap of supplier
    * neighborhoods between customer pairs of the peak-shipment
    * subgraph — common-neighbor evidence that two customers behave
    * alike, the classic "people also bought" primitive.
    *
    * Scale shape: pair generation is the supplier-keyed self-join —
    * cost Σ deg(s)², the structural floor for common-neighbor methods
    * — now bounded IN CODE by the `JaccardMaxHubDeg` cap: a 100×
    * skewed hub distribution costs at most deg-cap² per hub instead of
    * deg². Degrees broadcast back over the pair frame; the top-N is a
    * TakeOrdered, never a global sort.
    */
  def jaccardNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(col("l.l_suppkey").as("s"), col("o.o_custkey").as("c"))
      .distinct()
    jaccardScores(e)
  }

  val jaccardNeighborsSql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE $ComponentEdgeCond),
       |sdeg AS (SELECT s, count(*) AS sdeg FROM e GROUP BY s),
       |kept AS (SELECT s FROM sdeg WHERE sdeg <= $JaccardMaxHubDeg),
       |ch AS (SELECT CAST(count(*) AS BIGINT) AS capped_hubs
       |       FROM sdeg WHERE sdeg > $JaccardMaxHubDeg),
       |e2 AS (SELECT e.s, e.c FROM e JOIN kept USING (s)),
       |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS deg FROM e2 GROUP BY c),
       |common AS (
       |  SELECT a.c AS ca, b.c AS cb, CAST(count(*) AS BIGINT) AS common
       |  FROM e2 a JOIN e2 b ON a.s = b.s AND a.c < b.c
       |  GROUP BY a.c, b.c)
       |SELECT ca, cb, common,
       |       round(CAST(common AS DOUBLE) /
       |             (da.deg + db.deg - common), 6) AS jaccard,
       |       capped_hubs
       |FROM common
       |JOIN deg da ON da.c = ca
       |JOIN deg db ON db.c = cb
       |CROSS JOIN ch
       |ORDER BY jaccard DESC, ca ASC, cb ASC
       |LIMIT $JaccardTopN""".stripMargin

  // ------------------------------------------- degree assortativity

  /** Degree assortativity of the trading graph — do high-degree
    * suppliers trade with high-degree customers (hub-hub, r > 0) or
    * with the long tail (hub-leaf, r < 0)? The Pearson correlation of
    * endpoint degrees over the edge list, the standard one-number
    * mixing diagnostic (Newman 2002) read before trusting any
    * degree-driven sampling or cap.
    *
    * Exactness: degrees are integers; all five moments (Σx, Σy, Σxy,
    * Σx², Σy²) accumulate as DECIMAL(38,0) sums of integer products
    * (deg ≤ 10⁶ keeps deg² products within headroom at any corpus
    * size), and r is one fixed double expression over identical
    * scalars. Degrees broadcast back over the edge frame — two
    * node-keyed joins, one edge-keyed reduce, no window.
    */
  def assortativity(spark: SparkSession, dir: String): DataFrame = {
    // three consumers of the edge frame (two degree reduces + the
    // moment join): one materialization instead of three scans (r17)
    val e = shipEdges(spark, dir).localCheckpoint()
    val ds = e.groupBy("s").agg(count(lit(1)).as("ds"))
    val dc = e.groupBy("c").agg(count(lit(1)).as("dc"))
    val m = e.join(ds, "s").join(dc, "c")
      .agg(count(lit(1)).as("m"),
        sum(col("ds").cast("decimal(38,0)")).as("sx"),
        sum(col("dc").cast("decimal(38,0)")).as("sy"),
        sum((col("ds") * col("dc")).cast("decimal(38,0)")).as("sxy"),
        sum((col("ds") * col("ds")).cast("decimal(38,0)")).as("sxx"),
        sum((col("dc") * col("dc")).cast("decimal(38,0)")).as("syy"))
    val n = col("m").cast("double")
    def d(c0: org.apache.spark.sql.Column) = c0.cast("double")
    m.select(col("m").as("n_edges"),
      round((n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
          sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))), 6)
        .as("assortativity"))
  }

  val assortativitySql: String =
    s"""WITH e AS ($shipEdgesSql),
       |ds AS (SELECT s, CAST(count(*) AS BIGINT) AS ds FROM e GROUP BY s),
       |dc AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM e GROUP BY c),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |         CAST(sum(CAST(ds AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |         CAST(sum(CAST(dc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |         CAST(sum(CAST(ds * dc AS DECIMAL(38,0))) AS DECIMAL(38,0))
       |           AS sxy,
       |         CAST(sum(CAST(ds * ds AS DECIMAL(38,0))) AS DECIMAL(38,0))
       |           AS sxx,
       |         CAST(sum(CAST(dc * dc AS DECIMAL(38,0))) AS DECIMAL(38,0))
       |           AS syy
       |  FROM e JOIN ds USING (s) JOIN dc USING (c))
       |SELECT m AS n_edges,
       |       round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) -
       |              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |             (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) -
       |                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |              sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) -
       |                   CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       |         AS assortativity
       |FROM m""".stripMargin

  // ------------------------------------------------ HITS hubs/authorities

  /** HITS (Kleinberg 1999) in integer micro-units, fixed `iters`
    * mutual-reinforcement rounds. Per round, on the directed edge set:
    *
    *   rawA(u) = Σ h(v) over v→u        (authority mass from hubs)
    *   a(u)    = (HScale · rawA(u)) div max(rawA)
    *   rawH(v) = Σ a(u) over v→u        (hub mass from authorities)
    *   h(v)    = (HScale · rawH(v)) div max(rawH)
    *
    * The classical L2 normalization is replaced by max-normalization so
    * every step stays in positive-BIGINT floor arithmetic — both engines
    * compute the identical integers regardless of partitioning or sum
    * order (the `pagerankInt` discipline). Rankings are unaffected:
    * per-round normalization is a positive scalar either way. Nodes with
    * no in-edges score a=0, no out-edges h=0 (on the bipartite ship
    * graph this is the structure: suppliers are pure hubs, customers
    * pure authorities). Headroom: rawA ≤ indeg·HScale, so the
    * normalization product needs indeg ≤ 9·10⁶ at HScale 10⁶ — same
    * documented bound style as `assortativity`'s deg ≤ 10⁶.
    *
    * Shape at scale: each half-round is one node-keyed join + one
    * dst-keyed (or src-keyed) reduction plus a 1-row broadcast max —
    * identical exchange profile to a pagerank iteration; the edge frame
    * is cached once for the unrolled loop.
    */
  private[graft] val HScale = 1000000L

  def hitsInt(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def normalize(raw: DataFrame, out: String): DataFrame = {
      // raw: (node, raw) for nodes with any incident mass; others → 0.
      // raw feeds both the broadcast max and the outer join and is
      // deliberately NOT materialized: r17 probed persist() (+0.9 s on
      // graph_domain_hits — InMemoryRelation conversion) AND a lazy
      // localCheckpoint (+0.5 s on both hits queries) — the duplicated
      // one-join aggregation over already-cached edge/rank frames is
      // cheaper than every cut tried.
      val mx = raw.agg(max(col("raw")).as("mx"))
      val nm = nodes
        .join(raw, Seq("node"), "left_outer")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          coalesce(expr(s"(${HScale}L * raw) div mx"), lit(0L)).as(out))
        .localCheckpoint(eager = false)
      intermediates += nm
      nm
    }
    var hubs = nodes.select(col("node"), lit(HScale).as("h"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      auths = normalize(
        e.join(hubs, col("node") === col("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("raw")), "a")
      hubs = normalize(
        e.join(auths, col("node") === col("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("a")).as("raw")), "h")
    }
    val out = hubs.join(auths, "node")
      .select(col("node"), col("h").as("hub_micros"), col("a").as("auth_micros"))
      .localCheckpoint()
    e.unpersist(); nodes.unpersist(); intermediates.foreach(_.unpersist())
    out
  }

  /** The oracle's unrolled HITS CTE chain (`a1,h1..aN,hN`) — references
    * `e`/`nodes`/`h0` that the caller defines. DuckDB sums BIGINT into
    * HUGEINT, so every Σ is cast back before the scaled floor division.
    */
  private[graft] def hitsIterSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""a${i}r AS (
         |  SELECT e.dst AS node, CAST(sum(p.h) AS BIGINT) AS raw
         |  FROM e JOIN h${i - 1} p ON p.node = e.src GROUP BY e.dst),
         |a$i AS (
         |  SELECT n.node,
         |         COALESCE((${HScale} * r.raw) // m.mx, 0) AS a
         |  FROM nodes n
         |  CROSS JOIN (SELECT max(raw) AS mx FROM a${i}r) m
         |  LEFT JOIN a${i}r r ON r.node = n.node),
         |h${i}r AS (
         |  SELECT e.src AS node, CAST(sum(p.a) AS BIGINT) AS raw
         |  FROM e JOIN a$i p ON p.node = e.dst GROUP BY e.src),
         |h$i AS (
         |  SELECT n.node,
         |         COALESCE((${HScale} * r.raw) // m.mx, 0) AS h
         |  FROM nodes n
         |  CROSS JOIN (SELECT max(raw) AS mx FROM h${i}r) m
         |  LEFT JOIN h${i}r r ON r.node = n.node)""".stripMargin
    }.mkString(",\n")

  private val HitsIters = 3

  /** HITS over the ship graph: hub scores rank suppliers by how much
    * authority-weighted flow they originate, authority scores rank
    * customers by how much hub-weighted flow they receive — the
    * mutual-reinforcement refinement of `graph_degree` (a big customer
    * of important suppliers outranks an equally-big customer of
    * marginal ones). Bit-for-bit vs the unrolled-CTE oracle.
    */
  def hitsShip(spark: SparkSession, dir: String): DataFrame = {
    val e = shipEdges(spark, dir)
      .select(suppNode(col("s")).as("src"), custNode(col("c")).as("dst"))
    hitsInt(e, HitsIters)
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("hub_micros"), col("auth_micros"))
  }

  val hitsShipSql: String = {
    val rec = hitsIterSql(HitsIters)
    s"""WITH se AS ($shipEdgesSql),
       |e AS (SELECT s * 2 + 1 AS src, c * 2 AS dst FROM se),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, ${HScale} AS h FROM nodes),
       |$rec
       |SELECT CASE WHEN n.node % 2 = 1 THEN 'supplier' ELSE 'customer' END
       |         AS side,
       |       n.node // 2 AS key,
       |       h.h AS hub_micros, a.a AS auth_micros
       |FROM nodes n
       |JOIN h$HitsIters h ON h.node = n.node
       |JOIN a$HitsIters a ON a.node = n.node""".stripMargin
  }

  // ------------------------------------------- label propagation (LPA)

  /** Synchronous label propagation (Raghavan 2007), `iters` rounds with
    * a deterministic tie-break: each node adopts the label occurring
    * most among its neighbours, ties to the SMALLEST label — no RNG, no
    * visit-order dependence, so both engines converge to identical
    * communities. Runs on the same thresholded peak-shipment subgraph as
    * `graph_components`; where components answers "connected at all?",
    * LPA splits each island into densely-knit trading communities.
    *
    * Per round: one node-keyed join to pull neighbour labels, one
    * (node, label)-keyed count, one node-partitioned window to pick the
    * mode (partitioned on the node key — never unpartitioned). Label
    * frames are node-sized; per-round lazy localCheckpoint keeps the
    * unrolled plan flat exactly as in `pagerankInt`.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct().cache()
    val nodes = sym.select(col("u").as("node")).distinct().cache()
    val byNode = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("cnt").desc, col("lbl").asc)
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to iters) {
      labels = sym
        .join(labels, col("node") === col("v"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byNode))
        .where(col("rn") === 1)
        .select(col("u").as("node"), col("lbl"))
        .localCheckpoint(eager = false)
      intermediates += labels
    }
    val out = labels.localCheckpoint()
    sym.unpersist(); nodes.unpersist(); intermediates.foreach(_.unpersist())
    out
  }

  private val LpaIters = 4

  def labelPropShip(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"))
      .distinct()
    labelPropagation(e, LpaIters)
      .select(
        when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer"))
          .as("side"),
        expr("node div 2").as("key"),
        col("lbl").as("community"))
  }

  val labelPropShipSql: String = {
    val rounds = (1 to LpaIters).map { i =>
      s"""l$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT e.u AS node, p.lbl,
         |           row_number() OVER (PARTITION BY e.u
         |             ORDER BY count(*) DESC, p.lbl ASC) AS rn
         |    FROM edges e JOIN l${i - 1} p ON p.node = e.v
         |    GROUP BY e.u, p.lbl)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS u, o_custkey * 2 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE $ComponentEdgeCond
       |), edges AS (
       |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
       |), l0 AS (
       |  SELECT u AS node, u AS lbl FROM edges GROUP BY u
       |),
       |$rounds
       |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
       |         AS side,
       |       node // 2 AS key, lbl AS community
       |FROM l$LpaIters""".stripMargin
  }

  // ------------------------------------------------ power-law fit

  /** Hill estimator of the degree distribution's power-law tail,
    * per graph side: α̂ = 1 + n/Σ ln(dᵢ/d_min) over degrees ≥ d_min —
    * the "is this graph scale-free" diagnostic that decides whether
    * hub-capping (the `graph_jaccard` super-hub treatment) and
    * skew-aware planning are load-bearing for a given corpus. An α
    * near 2 means extreme hubs (heavy skew machinery required);
    * α ≥ 3 means tails thin enough for plain hash partitioning.
    * Also emits the standard error (α̂−1)/√n.
    *
    * Determinism: each ln(d/d_min) is one fixed double on exact
    * integer degrees, cast DECIMAL(30,10), summed exactly — the
    * entropy recipe. Shape: degree reduce per side, tail filter,
    * one |tail|-row aggregate; 2-row output.
    */
  private val HillDmin = 5L

  def powerlawFit(spark: SparkSession, dir: String): DataFrame = {
    // NOT materialized — same exchange-reuse adjudication as [[degrees]]
    val e = shipEdges(spark, dir)
    def side(key: String, label: String): DataFrame = {
      val deg = e.groupBy(col(key)).agg(count(lit(1)).as("d"))
        .where(col("d") >= HillDmin)
      deg.agg(count(lit(1)).as("n_tail"),
        sum((log(col("d").cast("double") / lit(HillDmin).cast("double")))
          .cast("decimal(30,10)")).as("slnr"))
        .select(lit(label).as("side"), lit(HillDmin).as("d_min"),
          col("n_tail"),
          round(lit(1.0) + col("n_tail").cast("double") /
            col("slnr").cast("double"), 6).as("alpha"),
          round((col("n_tail").cast("double") /
            col("slnr").cast("double")) /
            sqrt(col("n_tail").cast("double")), 6).as("alpha_se"))
    }
    side("s", "supplier").unionAll(side("c", "customer"))
  }

  val powerlawFitSql: String = {
    def one(key: String, label: String): String =
      s"""SELECT '$label' AS side, CAST($HillDmin AS BIGINT) AS d_min,
         |       n_tail,
         |       round(1.0 + CAST(n_tail AS DOUBLE) /
         |             CAST(slnr AS DOUBLE), 6) AS alpha,
         |       round((CAST(n_tail AS DOUBLE) / CAST(slnr AS DOUBLE)) /
         |             sqrt(CAST(n_tail AS DOUBLE)), 6) AS alpha_se
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tail,
         |         CAST(sum(CAST(ln(CAST(d AS DOUBLE) /
         |                          CAST($HillDmin AS DOUBLE))
         |                       AS DECIMAL(30,10))) AS DECIMAL(38,10))
         |           AS slnr
         |  FROM (SELECT $key, count(*) AS d FROM e GROUP BY 1)
         |  WHERE d >= $HillDmin)""".stripMargin
    s"""WITH e AS ($shipEdgesSql)
       |${one("s", "supplier")}
       |UNION ALL
       |${one("c", "customer")}""".stripMargin
  }

  // ------------------------------------------------ modularity score

  /** Newman modularity of the `graph_label_prop` communities —
    * Q = Σ_c (e_c/m − (d_c/2m)²) — the one-number answer to "are these
    * communities real structure or partition noise" (Q ≈ 0 means the
    * split explains nothing beyond degree; > 0.3 is conventionally
    * strong). Composes the SAME deterministic LPA labels the community
    * operator emits, so the score audits an output the engine already
    * serves.
    *
    * Exactness: e_c (intra-community edges), d_c (community degree
    * mass) and m are exact integers; each community's term is one
    * fixed double expression rounded to 10 dp and summed as
    * DECIMAL(30,10) — the χ² recipe. Shape: two label joins on the
    * edge frame, two |communities|-row reduces, a 1-row broadcast for
    * m; single-row output.
    */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(expr(ComponentEdgeCond))
      .select(suppNode(col("l.l_suppkey")).as("u"),
        custNode(col("o.o_custkey")).as("v"))
      .distinct()
      // four consumers (LPA input, m, intra, degs) would each re-run
      // the lineitem⋈orders distinct: materialize it once (r17)
      .localCheckpoint()
    val labels = labelPropagation(e, LpaIters)
      .select(col("node"), col("lbl"))
    val mAgg = e.agg(count(lit(1)).as("m"))
    val lu = labels.select(col("node").as("u"), col("lbl").as("lu"))
    val lv = labels.select(col("node").as("v"), col("lbl").as("lv"))
    val intra = e.join(lu, "u").join(lv, "v")
      .where(col("lu") === col("lv"))
      .groupBy(col("lu").as("lbl")).agg(count(lit(1)).as("ec"))
    val degs = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .join(labels, "node")
      .groupBy(col("lbl")).agg(count(lit(1)).as("dc"))
    val terms = degs.join(intra, Seq("lbl"), "left")
      .withColumn("ec", coalesce(col("ec"), lit(0L)))
      .crossJoin(broadcast(mAgg))
      .withColumn("term",
        round(col("ec").cast("double") / col("m").cast("double") -
          (col("dc").cast("double") / (col("m") * 2).cast("double")) *
          (col("dc").cast("double") / (col("m") * 2).cast("double")), 10)
          .cast("decimal(30,10)"))
    terms.agg(count(lit(1)).as("n_communities"),
      max(col("m")).as("m_edges"),
      round(sum(col("term")).cast("double"), 6).as("modularity"))
  }

  val modularitySql: String =
    s"""WITH lp AS (
       |$labelPropShipSql
       |), labels AS (
       |  SELECT CASE WHEN side = 'supplier' THEN key * 2 + 1
       |              ELSE key * 2 END AS node,
       |         community AS lbl
       |  FROM lp
       |), e AS (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS u, o_custkey * 2 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE $ComponentEdgeCond
       |), mm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m FROM e
       |), intra AS (
       |  SELECT a.lbl, CAST(count(*) AS BIGINT) AS ec
       |  FROM e
       |  JOIN labels a ON a.node = e.u
       |  JOIN labels b ON b.node = e.v
       |  WHERE a.lbl = b.lbl GROUP BY 1
       |), degs AS (
       |  SELECT l.lbl, CAST(count(*) AS BIGINT) AS dc
       |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) n
       |  JOIN labels l ON l.node = n.node GROUP BY 1
       |), terms AS (
       |  SELECT CAST(round(CAST(COALESCE(i.ec, 0) AS DOUBLE) /
       |                      CAST(m AS DOUBLE) -
       |                    (CAST(d.dc AS DOUBLE) /
       |                       CAST(m * 2 AS DOUBLE)) *
       |                    (CAST(d.dc AS DOUBLE) /
       |                       CAST(m * 2 AS DOUBLE)), 10)
       |              AS DECIMAL(30,10)) AS term,
       |         m
       |  FROM degs d LEFT JOIN intra i ON i.lbl = d.lbl CROSS JOIN mm
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |       CAST(max(m) AS BIGINT) AS m_edges,
       |       round(CAST(sum(term) AS DOUBLE), 6) AS modularity
       |FROM terms""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("graph_modularity", modularity _, Some(modularitySql)),
    Op("graph_powerlaw_fit", powerlawFit _, Some(powerlawFitSql)),
    Op("graph_assortativity", assortativity _, Some(assortativitySql)),
    Op("graph_hits", hitsShip _, Some(hitsShipSql)),
    Op("graph_label_prop", labelPropShip _, Some(labelPropShipSql)),
    Op("graph_jaccard", jaccardNeighbors _, Some(jaccardNeighborsSql)),
    Op("graph_degree", degrees _, Some(degreesSql)),
    Op("graph_components", components _, Some(componentsSql)),
    // exactness contract: the incremental path must reproduce the FULL
    // recompute bit-for-bit, so it shares components' oracle verbatim
    Op("graph_components_incremental", componentsIncremental _,
      Some(componentsSql)),
    Op("graph_pagerank", pagerank _, Some(pagerankSql)),
    Op("graph_ppr", ppr _, Some(pprSql)),
    Op("graph_triangles", nearDupTriangles _, Some(nearDupTrianglesSql)),
    Op("graph_kcore", kcoreShip _, Some(kcoreShipSql)),
    Op("graph_bfs", bfsShip _, Some(bfsShipSql)))
}
