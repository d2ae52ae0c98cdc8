package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale probe for the SCC ALGORITHM (VERDICT r16 #6): the
  * registered `graph_domain_scc` runs on a fixture-bounded domain graph
  * (7 nodes), so its sf probes only measure the served-edges read. This
  * plants a synthetic web-shaped graph at 10⁵–10⁶ nodes — giant SCC
  * with log-diameter doubling edges, IN/OUT tendril chains (the trim
  * workload), one DEEP chain (the O(depth/2) trim worst case), and
  * 3-cycle islands (many tiny SCCs, the outer-round workload) — runs
  * `Graph.stronglyConnectedComponents` directly, validates the exact
  * component census, and prints wall + phase-visible wave counts.
  *
  * Usage: sbt "Test/runMain graft.SccProbe [nGiant] [nChains] [deepLen]"
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val nGiant = if (args.length > 0) args(0).toInt else 100000
    val nChains = if (args.length > 1) args(1).toInt else 2000
    val deepLen = if (args.length > 2) args(2).toInt else 256
    val chainLen = 16
    val nIslands = nChains / 2
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val g = nGiant.toLong
    // giant SCC: cycle + doubling chords → strongly connected with
    // diameter O(log n) (i → i+1 closes the cycle; i → 2i halves the
    // distance to any target), the real-web giant-component shape
    val giant = spark.range(g).select(col("id").as("u"),
        ((col("id") + 1) % g).as("v"))
      .union(spark.range(g).select(col("id").as("u"),
        ((col("id") * 2) % g).as("v")))
    // IN chains: nChains chains of length chainLen ending in the giant
    val inBase = g
    val inEdges = spark.range(nChains.toLong * chainLen)
      .select((col("id") + inBase).as("u"),
        when((col("id") % chainLen) === (chainLen - 1),
          expr(s"id div $chainLen") % g) // last node links INTO the giant
          .otherwise(col("id") + inBase + 1).as("v"))
    // OUT chains: giant links out to chain heads
    val outBase = inBase + nChains.toLong * chainLen
    val outEdges = spark.range(nChains.toLong * chainLen)
      .select(when((col("id") % chainLen) === 0,
            expr(s"id div $chainLen") % g)
          .otherwise(col("id") + outBase - 1).as("u"),
        (col("id") + outBase).as("v"))
    // islands: 3-cycles disconnected from everything
    val islBase = outBase + nChains.toLong * chainLen
    val islEdges = spark.range(nIslands.toLong * 3)
      .select((col("id") + islBase).as("u"),
        when((col("id") % 3) === 2, col("id") - 2 + islBase)
          .otherwise(col("id") + islBase + 1).as("v"))
    // one deep IN chain — the trim worst case (peels 2 nodes per wave)
    val deepBase = islBase + nIslands.toLong * 3
    val deepEdges = spark.range(deepLen.toLong)
      .select((col("id") + deepBase).as("u"),
        when(col("id") === (deepLen - 1), lit(0L))
          .otherwise(col("id") + deepBase + 1).as("v"))
    val edges = giant.union(inEdges).union(outEdges).union(islEdges)
      .union(deepEdges).localCheckpoint()
    val nEdges = edges.count()
    val nNodes = deepBase + deepLen
    println(s"[probe] planted graph: $nNodes nodes, $nEdges edges " +
      s"(giant $g, ${2 * nChains} chains x $chainLen, $nIslands islands, " +
      s"deep chain $deepLen)")

    val t0 = System.nanoTime()
    val scc = graft.operators.Graph.stronglyConnectedComponents(edges)
    val census = scc.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("groups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[probe] scc wall $wall%.1f s; census (size -> groups): " +
      census.toSeq.sortBy(_._1).map { case (s, c) => s"$s->$c" }
        .mkString(", "))
    // exact expected census: one giant of size nGiant, singletons for
    // every chain/deep node, nIslands components of size 3
    val expSingles = 2L * nChains * chainLen + deepLen
    assert(census(g) == 1L, s"giant SCC must be one component: $census")
    assert(census(1L) == expSingles,
      s"expected $expSingles singletons: $census")
    assert(census(3L) == nIslands.toLong,
      s"expected $nIslands 3-cycles: $census")
    println("[probe] census OK")
    spark.stop()
  }
}
