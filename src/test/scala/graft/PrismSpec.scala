package graft

import org.apache.spark.sql.DataFrame

import graft.operators.PrismQueries

/** The reference's literal query over a hand-built PRISM micro-fixture,
  * asserting each semantic trap from SURVEY.md §7.3.
  */
class PrismSpec extends SparkSpec {

  private def prism(): String => DataFrame = {
    import spark.implicits._
    val licence = Seq(
      (100L, 1L, " Fixed Link ", "f123", "cat"),  // lowercase code: ci-LIKE must keep it
      (200L, 2L, "Mobile", "M999", "cat"),        // non-F code: excluded
      (300L, 1L, "Fixed", "F456", "cat")          // satellite licence (northing 0)
    ).toDF("licenceid", "clientid", "licencetype", "licencecode", "licencecategory")
    val clientname = Seq((1L, "  Acme Radio  "), (2L, "Other"))
      .toDF("clientid", "name")
    // licence 100 has TWO spectrum rows → fan-out ×2
    val spectrum = Seq((100L, 5800.0, 30.0), (100L, 11000.0, 33.0), (200L, 900.0, 20.0),
      (300L, 14000.0, 40.0))
      .toDF("licenceid", "frequency", "power")
    // licence 100 has 1 rx and 2 tx configs → rx×tx cross product ×2
    val rxconf = Seq((100L, 10L, 12.0), (200L, 11L, 5.0), (300L, 10L, 9.0))
      .toDF("licenceid", "locationid", "rxantennaheight")
    val txconf = Seq((100L, 20L, 30.0), (100L, 21L, 31.0), (200L, 21L, 6.0), (300L, 22L, 7.0))
      .toDF("licenceid", "locationid", "txantennaheight")
    val location = Seq((10L, " RX Hill ", 500.0), (11L, "Other Hill", 200.0),
      (20L, "TX Ridge", 700.0), (21L, " TX Peak ", 800.0), (22L, "Sat Site", 0.0))
      .toDF("locationid", "locationname", "locationheight")
    // georeferencetypeid 3 = WGS84; loc 20 also has a type-1 row (must not dup);
    // loc 22 is the satellite: northing 0 under type 3.
    val geo = Seq(
      (10L, 3, 174.7, -36.8), (11L, 3, 175.0, -37.0),
      (20L, 3, 174.9, -36.9), (20L, 1, 1748000.0, 5910000.0),
      (21L, 3, 175.1, -37.1), (22L, 3, 170.0, 0.0))
      .toDF("locationid", "georeferencetypeid", "easting", "northing")
    Map(
      "licence" -> licence, "clientname" -> clientname, "spectrum" -> spectrum,
      "receiveconfiguration" -> rxconf, "transmitconfiguration" -> txconf,
      "location" -> location, "geographicreference" -> geo)
  }

  test("the reference query: fan-out, ci-LIKE, satellite exclusion, trim, renames") {
    val out = PrismQueries.pointToPointLinks(prism())
    assert(out.columns.toSeq == PrismQueries.outputColumns)
    val rows = out.collect()

    // licence 100 only: 200 fails LIKE 'F%', 300 fails northing != 0.
    assert(rows.map(_.getLong(0)).toSet == Set(100L))
    // 2 spectrum rows × (1 rx × 2 tx configs) = 4 rows — fan-out preserved
    assert(rows.length == 4)
    // case-insensitive LIKE admitted the lowercase 'f123' code
    // trim applied to names
    assert(rows.head.getString(1) == "Acme Radio")
    assert(rows.head.getString(2) == "Fixed Link")
    assert(rows.map(_.getString(5)).toSet == Set("TX Ridge", "TX Peak"))
    // easting/northing → lng/lat renames carry WGS84 values only
    assert(rows.map(_.getDouble(9)).toSet == Set(174.7))
    assert(rows.map(_.getDouble(7)).forall(_ != 0.0))
  }

  test("satellite rows (northing = 0) would appear without F4/F5 — guard is live") {
    val tables = prism()
    // relax licencecode so licence 300 passes LIKE; it must STILL be
    // excluded, purely by the northing != 0 satellite filter
    val out = PrismQueries.pointToPointLinks(tables)
    assert(!out.collect().map(_.getLong(0)).contains(300L))
  }

  test("link distances: haversine matches a scalar mirror, QA flag fires") {
    import spark.implicits._
    // Wellington -> Auckland, a same-point link, and a coordinate-error
    // link to the other side of the world
    val links = Seq(
      (1L, 174.7756, -41.2866, 174.7633, -36.8485),
      (2L, 174.7756, -41.2866, 174.7756, -41.2866),
      (3L, 174.7756, -41.2866, -5.2244, 41.2866))
      .toDF("licenceid", "tx_lng", "tx_lat", "rx_lng", "rx_lat")
    def scalarHaversine(lng1: Double, lat1: Double,
        lng2: Double, lat2: Double): Double = {
      val r = math.Pi / 180
      val a = math.pow(math.sin((lat2 - lat1) * r / 2), 2) +
        math.cos(lat1 * r) * math.cos(lat2 * r) *
          math.pow(math.sin((lng2 - lng1) * r / 2), 2)
      2 * 6371.0088 * math.asin(math.sqrt(a))
    }
    val got = PrismQueries.linkDistances(links).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(5), r.getDouble(6), r.getBoolean(7)))).toMap
    val wellAuck = scalarHaversine(174.7756, -41.2866, 174.7633, -36.8485)
    assert(math.abs(got(1L)._1 - wellAuck) < 0.01,
      s"Wellington-Auckland ${got(1L)._1} != $wellAuck")
    assert(wellAuck > 480 && wellAuck < 500) // sanity: ~493 km
    // almost due north — Auckland sits a hair WEST, so the azimuth
    // wraps just under 360 rather than just over 0
    assert(got(1L)._2 > 355 || got(1L)._2 < 5,
      s"bearing ${got(1L)._2} not northish")
    assert(!got(1L)._3)
    assert(got(2L) == ((0.0, 0.0, false)), s"same point: ${got(2L)}")
    // antipodal-ish coordinate error: ~19,500 km, flagged
    assert(got(3L)._1 > 15000 && got(3L)._3, s"QA flag: ${got(3L)}")
  }
}
