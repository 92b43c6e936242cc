package graft

import org.apache.spark.sql.functions._
import graft.ops.Geo

/** geo_distance: the box prune must be a pure optimization (identical
 *  matched set vs the unpruned filter), bounds must reach the parquet scan,
 *  and the ring agg must partition the corpus. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  // a grid crossing the origin's box boundary in both axes
  private def pts = (0L until 400L).map { i =>
    (i, -90.0 + (i * 7 % 1800) / 10.0, -180.0 + (i * 13 % 3600) / 10.0)
  }.toDF("id", "lat", "lon")

  test("box prune never drops a within-radius point") {
    for ((olat, olon, r) <- Seq((40.0, -75.0, 2000.0), (0.0, 0.0, 500.0),
                                (85.0, 10.0, 3000.0), (10.0, 179.0, 2500.0))) {
      val got = Geo.geoDistance(pts, "id", "lat", "lon", olat, olon, r, 1000)
        .select("id").collect().map(_.getLong(0)).toSet
      val brute = pts
        .withColumn("d", Geo.haversineKm(col("lat"), col("lon"), olat, olon))
        .where(col("d") <= r).select("id").collect().map(_.getLong(0)).toSet
      assert(got == brute, s"origin ($olat, $olon) r=$r: ${brute.diff(got)} dropped")
    }
  }

  test("k bounds the result and ordering is dist asc, id tiebreak") {
    val top = Geo.geoDistance(pts, "id", "lat", "lon", 0.0, 0.0, 20000.0, 10)
      .collect()
    assert(top.length == 10)
    val ds = top.map(_.getAs[Double]("dist_km")).toSeq
    assert(ds == ds.sorted)
  }

  test("lat/lon bounds reach the parquet scan as pushed filters") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/geo_spec_${System.nanoTime()}"
    pts.write.parquet(dir)
    val plan = Geo.geoDistance(spark.read.parquet(dir), "id", "lat", "lon",
        40.0, -75.0, 2000.0, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(lat,") &&
      plan.contains("LessThanOrEqual(lat,"), plan.take(2000))
  }

  test("distance rings partition the corpus; validation rejects bad bounds") {
    val rings = Geo.distanceRanges(pts, "lat", "lon", 0.0, 0.0, Seq(3000.0, 8000.0))
      .collect()
    assert(rings.map(_.getAs[Long]("n_points")).sum == 400L)
    assert(rings.map(_.getAs[String]("bucket")).toSet
      .subsetOf(Set("*-3000.0", "3000.0-8000.0", "8000.0-*")))
    // per-ring min/max stay inside the ring's [from, to) span
    rings.foreach { r =>
      val (mn, mx) = (r.getAs[Double]("min_km"), r.getAs[Double]("max_km"))
      r.getAs[String]("bucket") match {
        case "*-3000.0"        => assert(mx < 3000.0)
        case "3000.0-8000.0"   => assert(mn >= 3000.0 && mx < 8000.0)
        case "8000.0-*"        => assert(mn >= 8000.0)
      }
    }
    intercept[IllegalArgumentException](
      Geo.distanceRanges(pts, "lat", "lon", 0.0, 0.0, Nil))
    intercept[IllegalArgumentException](
      Geo.distanceRanges(pts, "lat", "lon", 0.0, 0.0, Seq(5000.0, 1000.0)))
    intercept[IllegalArgumentException](
      Geo.geoDistance(pts, "id", "lat", "lon", 95.0, 0.0, 100.0, 5))
    intercept[IllegalArgumentException](
      Geo.geoDistance(pts, "id", "lat", "lon", 0.0, 0.0, -1.0, 5))
  }

  test("bounding box filters exactly and validates orientation") {
    val in = Geo.boundingBox(pts, "lat", "lon", 30.0, -60.0, -30.0, 60.0)
      .collect()
    assert(in.nonEmpty)
    assert(in.forall { r =>
      val (la, lo) = (r.getDouble(1), r.getDouble(2))
      la <= 30.0 && la >= -30.0 && lo >= -60.0 && lo <= 60.0
    })
    intercept[IllegalArgumentException](
      Geo.boundingBox(pts, "lat", "lon", -10.0, 0.0, 10.0, 20.0))
    intercept[IllegalArgumentException](
      Geo.boundingBox(pts, "lat", "lon", 10.0, 20.0, -10.0, 0.0))
  }

  test("geotile grid: known tiles at zoom 1, Mercator-range drop, counts partition") {
    import spark.implicits._
    // zoom 1: 2x2 tiles — (west, north)=(0,0), (east, north)=(1,0), etc.
    val known = Seq(
      (1L, 40.0, -90.0), (2L, 40.0, 90.0), (3L, -40.0, -90.0), (4L, -40.0, 90.0),
      (5L, 89.0, 0.0) // beyond the Mercator bound -> dropped
    ).toDF("id", "lat", "lon")
    val tiles = Geo.geotileGrid(known, "lat", "lon", 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiles == Map("1/0/0" -> 1L, "1/1/0" -> 1L, "1/0/1" -> 1L, "1/1/1" -> 1L))
    // grid points inside Mercator range partition across tiles
    val inRange = pts.where(abs($"lat") <= Geo.MercatorMaxLat)
    val total = Geo.geotileGrid(pts, "lat", "lon", 3).collect()
      .map(_.getLong(1)).sum
    assert(total == inRange.count())
    intercept[IllegalArgumentException](Geo.geotileGrid(pts, "lat", "lon", 30))
  }

  test("geohash cell matches the canonical encoding at several precisions") {
    // the canonical geohash example: 57.64911, 10.40744 -> u4pruydqqvj
    val p = Seq((57.64911, 10.40744), (38.897, -77.036), (-33.8572, 151.2150))
      .toDF("lat", "lon")
    def cells(prec: Int): Seq[String] =
      p.select(Geo.geohashCell(col("lat"), col("lon"), prec)).collect()
        .map(_.getString(0)).toSeq
    assert(cells(4) == Seq("u4pr", "dqcj", "r3gx"))
    assert(cells(5) == Seq("u4pru", "dqcjr", "r3gx2"))
    assert(cells(6) == Seq("u4pruy", "dqcjr0", "r3gx2u"))
    // grid counts partition the input
    val grid = Geo.geohashGrid(pts, "lat", "lon", 3)
    assert(grid.agg(sum(col("n_points"))).collect().head.getLong(0) == 400L)
    intercept[IllegalArgumentException] { Geo.geohashCell(col("lat"), col("lon"), 0) }
    // boundary: lat 90 / lon 180 clamp into the LAST cell (canonical
    // encoders' behavior) — all-ones bits -> 'zzzz', not the first cell
    val edge = Seq((90.0, 180.0), (-90.0, -180.0)).toDF("lat", "lon")
    assert(edge.select(Geo.geohashCell(col("lat"), col("lon"), 4)).collect()
      .map(_.getString(0)).toSeq == Seq("zzzz", "0000"))
  }

  test("geo_bounds + geo_centroid: one-pass hand-math on a known point set") {
    import spark.implicits._
    val known = Seq(
      (1L, 10.0, -20.0), (2L, -30.0, 40.0), (3L, 50.0, 0.0), (4L, 0.0, 60.0)
    ).toDF("id", "lat", "lon")
    val r = Geo.boundsCentroid(known, "lat", "lon").collect().head
    assert(r.getDouble(0) == 50.0)   // top = max lat
    assert(r.getDouble(1) == -20.0)  // left = min lon
    assert(r.getDouble(2) == -30.0)  // bottom = min lat
    assert(r.getDouble(3) == 60.0)   // right = max lon
    assert(r.getDouble(4) == 7.5)    // centroid lat = (10-30+50+0)/4
    assert(r.getDouble(5) == 20.0)   // centroid lon = (-20+40+0+60)/4
    assert(r.getLong(6) == 4L)
  }
}
