package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Spatial proximity self-join — the 2-D neighbor query behind the
  * reference's map domain ("which licensed sites sit within D km of
  * each other?"): coordinate-error triage, co-located-site detection,
  * and interference-candidate screening all start here. Spark has no
  * native spatial join, so this is the standard GRID-BLOCKED plan: hash
  * every site to a fixed lat/lon cell, join each site's 3×3 cell
  * neighborhood against cell occupants, then confirm candidates with
  * the exact haversine — the `dedup_minhash_lsh` shape (block
  * subquadratically, verify exactly) applied to geometry.
  *
  * The DuckDB oracle is the QUADRATIC all-pairs filter, so a green row
  * proves the blocking is LOSSLESS at the configured geometry: the cell
  * size (0.35°) strictly exceeds the largest lat/lon extent a 25 km
  * great-circle gap can span inside the fixture's bounding box
  * (0.225° lat; 0.330° lon at 47° S), so any qualifying pair lands in
  * the same or an adjacent cell — same argument as LSH band bounds,
  * but exact rather than probabilistic.
  *
  * Scale shape: the only corpus-wide operation is the 9× cell-exploded
  * equi-join on (cell_y, cell_x) — shuffle volume 9·|sites| rows keyed
  * by bounded-density cells; the verify is a codegen'd per-row trig
  * projection. Σ occupancy² per cell is the structural floor (the
  * Jaccard Σ deg² analog), bounded IN CODE by the `MaxCellOcc` guard
  * below (r8 verdict #6): sites in an over-occupied cell are excluded
  * from candidate generation — at most cap² pair work per cell — and
  * the count of capped cells rides every output row as the
  * `capped_cells` audit column, so a capped run is visibly capped,
  * never silently thinner. The oracle applies the SAME cap.
  */
object Spatial {

  private val EarthRadiusKm = 6371.0088 // IUGG mean radius
  private val ToRad = math.Pi / 180
  private val MaxKm = 25.0
  private val CellDeg = 0.35

  /** Per-cell occupancy guard (the `graph_jaccard` super-hub cap
    * applied to geometry): a cell holding more sites than this is a
    * point pile-up — duplicate coordinates, a geocoding sink, a test
    * artifact — whose occ² candidate volume would dominate the join.
    * Its sites are excluded from pair generation and the exclusion is
    * audited, not silent.
    */
  private val MaxCellOcc = 4096L

  /** Core: all unordered site pairs within `maxKm`, via grid blocking.
    * `sites` needs (site_id, lat, lon); `cellDeg` must exceed the
    * worst-case angular extent of `maxKm` over the data's latitude
    * range or candidates are silently lost (the oracle catches that).
    */
  def proximityJoin(sites: DataFrame, maxKm: Double = MaxKm,
      cellDeg: Double = CellDeg, maxCellOcc: Long = MaxCellOcc): DataFrame = {
    val withCell0 = sites.select(col("site_id"), col("lat"), col("lon"),
      expr(s"CAST(floor(lat / $cellDeg) AS BIGINT)").as("cy"),
      expr(s"CAST(floor(lon / $cellDeg) AS BIGINT)").as("cx"))
    val occ = withCell0.groupBy("cy", "cx").agg(count(lit(1)).as("occ"))
    val keptCells = occ.where(col("occ") <= maxCellOcc).select("cy", "cx")
    val cappedCells = occ.where(col("occ") > maxCellOcc)
      .agg(count(lit(1)).as("capped_cells"))
    val withCell = withCell0.join(keptCells, Seq("cy", "cx"), "left_semi")
    // one side explodes its 3×3 neighborhood; the other keeps its own
    // cell — each qualifying pair meets in exactly one (jy, jx), so no
    // post-join dedup is needed
    val aExp = withCell
      .select(col("site_id").as("site_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"), col("cy"), col("cx"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
      .select(col("site_a"), col("lat_a"), col("lon_a"),
        (col("cy") + col("dy")).as("jy"), col("cx"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
      .select(col("site_a"), col("lat_a"), col("lon_a"), col("jy"),
        (col("cx") + col("dx")).as("jx"))
    val b = withCell.select(col("site_id").as("site_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"),
      col("cy").as("jy"), col("cx").as("jx"))
    def rad(c: org.apache.spark.sql.Column) = c * ToRad
    val dLat = rad(col("lat_b") - col("lat_a"))
    val dLon = rad(col("lon_b") - col("lon_a"))
    val h = pow(sin(dLat / 2), 2) +
      cos(rad(col("lat_a"))) * cos(rad(col("lat_b"))) * pow(sin(dLon / 2), 2)
    val dist = round(lit(2 * EarthRadiusKm) * asin(sqrt(h)), 3)
    aExp.join(b, Seq("jy", "jx"))
      .where(col("site_a") < col("site_b"))
      .select(col("site_a"), col("site_b"), dist.as("dist_km"))
      .where(col("dist_km") <= maxKm)
      .crossJoin(broadcast(cappedCells))
  }

  /** Deterministic site coordinates for the supplier table: two md5
    * hex-uniform draws mapped into an NZ-ish bounding box (13°×13°
    * from 47° S, 166° E) — the `events_ab_srm` md5-coin convention, so
    * both engines derive bit-identical doubles from integer hex.
    */
  private def siteCoord(axis: String) =
    lit(if (axis == "lat") -47.0 else 166.0) + lit(13.0) *
      (conv(substring(md5(concat_ws(":", lit(axis),
        col("s_suppkey").cast("string"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0))

  def neighbors(spark: SparkSession, dir: String): DataFrame = {
    val sites = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("site_id"),
        siteCoord("lat").as("lat"), siteCoord("lon").as("lon"))
    proximityJoin(sites)
  }

  private def coordSql(axis: String): String =
    s"(${if (axis == "lat") "-47.0" else "166.0"} + 13.0 * " +
      s"(CAST(CAST(concat('0x', substr(md5(concat_ws(':', '$axis', " +
      s"CAST(s_suppkey AS VARCHAR))), 1, 8)) AS UBIGINT) AS DOUBLE) " +
      "/ 4294967296.0))"

  /** Shared oracle CTEs: site coords, grid cells, per-cell occupancy,
    * the capped-cell census, and the occupancy-filtered `kept` site
    * set — the SAME cap the Spark plan applies, so the quadratic
    * oracle proves both the blocking AND the cap semantics.
    */
  private val sitesCappedSql: String =
    s"""sites AS (
       |  SELECT s_suppkey AS site_id,
       |         ${coordSql("lat")} AS lat,
       |         ${coordSql("lon")} AS lon
       |  FROM supplier),
       |cells AS (
       |  SELECT site_id, lat, lon,
       |         CAST(floor(lat / $CellDeg) AS BIGINT) AS cy,
       |         CAST(floor(lon / $CellDeg) AS BIGINT) AS cx
       |  FROM sites),
       |occ AS (SELECT cy, cx, count(*) AS occ FROM cells GROUP BY cy, cx),
       |ch AS (SELECT CAST(count(*) AS BIGINT) AS capped_cells
       |       FROM occ WHERE occ > $MaxCellOcc),
       |kept AS (
       |  SELECT c.site_id, c.lat, c.lon FROM cells c
       |  JOIN occ USING (cy, cx) WHERE occ.occ <= $MaxCellOcc)""".stripMargin

  val neighborsSql: String =
    s"""WITH $sitesCappedSql,
       |pairs AS (
       |  -- $ToRad is the interpolated Scala double π/180, NOT
       |  -- pi()/180 inline: the evaluation order c*(π/180) must match
       |  -- the Spark side bit-for-bit or boundary rows flap
       |  SELECT a.site_id AS site_a, b.site_id AS site_b,
       |         round(${2 * EarthRadiusKm} * asin(sqrt(
       |           pow(sin((b.lat - a.lat) * $ToRad / 2), 2) +
       |           cos(a.lat * $ToRad) * cos(b.lat * $ToRad) *
       |           pow(sin((b.lon - a.lon) * $ToRad / 2), 2))), 3)
       |           AS dist_km
       |  FROM kept a JOIN kept b ON a.site_id < b.site_id)
       |SELECT site_a, site_b, dist_km, capped_cells
       |FROM pairs CROSS JOIN ch WHERE dist_km <= $MaxKm""".stripMargin

  /** Proximity clusters — co-located site groups: the 25 km pair graph
    * contracted to connected components (single-linkage clustering, the
    * geometry form of `dedup_clusters`), reported as (cluster label =
    * component-minimum site, size). Reuses `Graph.connectedComponents`
    * — the alternation-bounded large-star/small-star core — so the
    * clustering inherits its O(log² n) round bound and checkpoint
    * hygiene; only sites with at least one neighbor appear (a singleton
    * site is not a cluster).
    */
  def clusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = neighbors(spark, dir)
      .select(col("site_a").as("u"), col("site_b").as("v"))
      // the components core consumes its input twice (edge build +
      // node set): materialize the blocking join once (r17)
      .localCheckpoint()
    Graph.connectedComponents(pairs)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_sites"))
  }

  val clustersSql: String =
    s"""WITH RECURSIVE $sitesCappedSql,
       |e0 AS (
       |  SELECT a.site_id AS u, b.site_id AS v
       |  FROM kept a JOIN kept b ON a.site_id < b.site_id
       |  WHERE round(${2 * EarthRadiusKm} * asin(sqrt(
       |          pow(sin((b.lat - a.lat) * $ToRad / 2), 2) +
       |          cos(a.lat * $ToRad) * cos(b.lat * $ToRad) *
       |          pow(sin((b.lon - a.lon) * $ToRad / 2), 2))), 3)
       |        <= $MaxKm),
       |edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |walk(u, x) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.x
       |),
       |lab AS (SELECT u, min(x) AS cluster FROM walk GROUP BY u)
       |SELECT cluster, CAST(count(*) AS BIGINT) AS n_sites
       |FROM lab GROUP BY cluster""".stripMargin

  /** Nearest neighbor within the search radius, per site: the map
    * popup's "closest other site" figure and the spacing histogram's
    * raw material. Rides the grid-blocked pair frame — symmetrize,
    * rank per site under the total order (dist, other id) so ties
    * cannot flap — rather than a fresh scan; sites with no neighbor
    * inside the radius are absent by contract (a k-NN without a radius
    * bound would need unbounded ring search, the wrong plan shape at
    * any scale).
    */
  def nearest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = neighbors(spark, dir)
    val sym = pairs.select(col("site_a").as("site_id"),
        col("site_b").as("nearest_id"), col("dist_km"))
      .union(pairs.select(col("site_b").as("site_id"),
        col("site_a").as("nearest_id"), col("dist_km")))
    val w = Window.partitionBy("site_id")
      .orderBy(col("dist_km").asc, col("nearest_id").asc)
    sym.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("site_id"), col("nearest_id"), col("dist_km"))
  }

  val nearestSql: String =
    s"""WITH $sitesCappedSql,
       |pairs AS (
       |  SELECT a.site_id AS site_a, b.site_id AS site_b,
       |         round(${2 * EarthRadiusKm} * asin(sqrt(
       |           pow(sin((b.lat - a.lat) * $ToRad / 2), 2) +
       |           cos(a.lat * $ToRad) * cos(b.lat * $ToRad) *
       |           pow(sin((b.lon - a.lon) * $ToRad / 2), 2))), 3)
       |           AS dist_km
       |  FROM kept a JOIN kept b ON a.site_id < b.site_id),
       |near AS (SELECT site_a, site_b, dist_km FROM pairs
       |         WHERE dist_km <= $MaxKm),
       |sym AS (
       |  SELECT site_a AS site_id, site_b AS nearest_id, dist_km FROM near
       |  UNION ALL
       |  SELECT site_b AS site_id, site_a AS nearest_id, dist_km FROM near),
       |ranked AS (
       |  SELECT site_id, nearest_id, dist_km,
       |         row_number() OVER (PARTITION BY site_id
       |           ORDER BY dist_km ASC, nearest_id ASC) AS rn
       |  FROM sym)
       |SELECT site_id, nearest_id, dist_km FROM ranked WHERE rn = 1"""
      .stripMargin

  val ops: Seq[Op] = Seq(
    Op("spatial_neighbors", neighbors _, Some(neighborsSql)),
    Op("spatial_clusters", clusters _, Some(clustersSql)),
    Op("spatial_nearest", nearest _, Some(nearestSql)))
}
