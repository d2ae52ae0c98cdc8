package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own query, verbatim semantics, on its own schema —
  * what a user of `mhansen/nzwirelessmap-fetch` runs today, as a library
  * function over PRISM-shaped DataFrames
  * (`select_point_to_point_links.sql:5-79`; domain schema SURVEY.md
  * §1.4). Hand it the seven tables (from any source — the converted
  * SQLite via JDBC, parquet exports, `TableMigrator` output) and it
  * produces the exact link rows the reference's CSV contains.
  *
  * Faithfully preserved semantics, each a documented trap (SURVEY.md
  * §7.3):
  *  - `USING (licenceid)` rx×tx cross product within a licence (sql:49-51);
  *  - `location`/`geographicreference` each joined twice under rx/tx
  *    roles (sql:52-55);
  *  - `spectrum` fan-out — one output row per spectrum row per rx×tx
  *    pair, no dedup (sql:58);
  *  - `georeferencetypeid = 3` = WGS84 only (sql:60-65);
  *  - SQLite's case-INsensitive `licencecode LIKE 'F%'` → `ilike`
  *    (sql:67-70);
  *  - `northing != 0` on both roles: geosynchronous-satellite exclusion
  *    (sql:72-78);
  *  - `trim` on client/licence-type/location names (sql:12-13,28,39);
  *  - `easting`→longitude, `northing`→latitude renames (sql:29-30).
  */
object PrismQueries {

  /** Column list exactly as the reference emits it (sql:5-41: licence
    * attrs, spectrum attrs, transmit attrs, receive attrs — the height
    * columns are commented out there and so absent here too).
    */
  val outputColumns: Seq[String] = Seq(
    "licenceid", "clientname", "licencetype", "frequency", "power",
    "tx_name", "tx_lng", "tx_lat",
    "rx_name", "rx_lng", "rx_lat")

  def pointToPointLinks(tables: String => DataFrame): DataFrame = {
    val licence    = tables("licence").as("licence")
    val clientname = tables("clientname").as("clientname")
    val spectrum   = tables("spectrum").as("spectrum")
    val rxconf     = tables("receiveconfiguration").as("rx")
    val txconf     = tables("transmitconfiguration").as("tx")
    val rxloc      = tables("location").as("rxlocation")
    val txloc      = tables("location").as("txlocation")
    val rxgeo      = tables("geographicreference").as("rxgeoref")
    val txgeo      = tables("geographicreference").as("txgeoref")

    rxconf
      // J1: USING(licenceid) — key emitted once, rx×tx cross product
      .join(txconf.withColumnRenamed("locationid", "tx_locationid"),
        Seq("licenceid"))
      .join(rxloc, col("rxlocation.locationid") === col("rx.locationid"))     // J2 (sql:52)
      .join(txloc, col("txlocation.locationid") === col("tx_locationid"))     // J3 (sql:53)
      .join(rxgeo, col("rxgeoref.locationid") === col("rxlocation.locationid")) // J4 (sql:54)
      .join(txgeo, col("txgeoref.locationid") === col("txlocation.locationid")) // J5 (sql:55)
      .join(licence, col("rx.licenceid") === col("licence.licenceid"))        // J6 (sql:56)
      .join(clientname, col("licence.clientid") === col("clientname.clientid")) // J7 (sql:57)
      .join(spectrum, col("spectrum.licenceid") === col("licence.licenceid")) // J8 fan-out (sql:58)
      .where(col("rxgeoref.georeferencetypeid") === 3)   // F1 (sql:64)
      .where(col("txgeoref.georeferencetypeid") === 3)   // F2 (sql:65)
      .where(col("licence.licencecode").ilike("f%"))     // F3 (sql:70, ci-LIKE)
      .where(col("txgeoref.northing") =!= 0)             // F4 (sql:77)
      .where(col("rxgeoref.northing") =!= 0)             // F5 (sql:78)
      .select(                                           // P1-P3 (sql:5-41)
        col("licence.licenceid").as("licenceid"),
        trim(col("clientname.name")).as("clientname"),
        trim(col("licence.licencetype")).as("licencetype"),
        col("spectrum.frequency").as("frequency"),
        col("spectrum.power").as("power"),
        trim(col("txlocation.locationname")).as("tx_name"),
        col("txgeoref.easting").as("tx_lng"),
        col("txgeoref.northing").as("tx_lat"),
        trim(col("rxlocation.locationname")).as("rx_name"),
        col("rxgeoref.easting").as("rx_lng"),
        col("rxgeoref.northing").as("rx_lat"))
  }

  /** Convenience: run against a directory of parquet tables named after
    * the PRISM catalog.
    */
  def pointToPointLinks(spark: SparkSession, dir: String): DataFrame =
    pointToPointLinks(name => spark.read.parquet(s"$dir/$name.parquet"))

  private val EarthRadiusKm = 6371.0088 // IUGG mean radius
  private val ToRad = math.Pi / 180

  /** Great-circle length + initial bearing of each link — the derived
    * columns the reference's MAP layer exists for (it renders these
    * exact tx→rx pairs, `select_point_to_point_links.sql:29-30`
    * easting/northing renames): link length is also the first QA
    * signal on licence data — a 2000 km "point-to-point" microwave
    * link is a coordinate error, which `max_plausible_km` flags
    * without dropping the row. Haversine + forward azimuth on the
    * IUGG mean sphere; pure per-row projection, no shuffle, stays
    * inside whole-stage codegen (all built-in trig expressions).
    */
  def linkDistances(links: DataFrame,
      maxPlausibleKm: Double = 500.0): DataFrame = {
    def rad(c: org.apache.spark.sql.Column) = c * ToRad
    val dLat = rad(col("rx_lat") - col("tx_lat"))
    val dLng = rad(col("rx_lng") - col("tx_lng"))
    val a = pow(sin(dLat / 2), 2) +
      cos(rad(col("tx_lat"))) * cos(rad(col("rx_lat"))) *
        pow(sin(dLng / 2), 2)
    val dist = lit(2 * EarthRadiusKm) * asin(sqrt(a))
    val bearing = (degrees(atan2(
      sin(dLng) * cos(rad(col("rx_lat"))),
      cos(rad(col("tx_lat"))) * sin(rad(col("rx_lat"))) -
        sin(rad(col("tx_lat"))) * cos(rad(col("rx_lat"))) * cos(dLng)))
      + 360) % 360
    links
      .withColumn("link_km", round(dist, 3))
      .withColumn("bearing_deg", round(bearing, 2))
      .withColumn("implausible", col("link_km") > maxPlausibleKm)
  }
}
