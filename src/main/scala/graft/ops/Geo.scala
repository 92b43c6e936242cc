package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo queries over plain (lat, lon) double columns — `geo_distance` and
 *  the distance-range aggregation. OpenSearch backs these with BKD trees;
 *  the relational re-expression gets the same two-phase shape from plain
 *  range predicates: a CONSERVATIVE bounding box on raw lat/lon (pushable
 *  comparisons that reach the parquet scan, so only the box's row groups
 *  are read — the BKD-prune analogue) followed by the exact haversine
 *  filter as a codegen'd residual. Distances are great-circle km on the
 *  IUGG mean radius, matching the reference's arc distance. */
object Geo {

  val EarthRadiusKm = 6371.0088

  /** Minimum km per degree of latitude (at the equator); dividing a radius
   *  by it over-covers in degrees, which is what a PRUNE must do. */
  private val MinKmPerDegLat = 110.567

  /** Exact haversine distance (km) from the (olat, olon) origin, in a fixed
   *  operation order so an independent engine writing the same expression
   *  tree reproduces it to the last ulp of its libm. */
  def haversineKm(lat: Column, lon: Column, olat: Double, olon: Double): Column = {
    val s1 = sin(radians(lat - lit(olat)) / 2)
    val s2 = sin(radians(lon - lit(olon)) / 2)
    val a = s1 * s1 + cos(radians(lit(olat))) * cos(radians(lat)) * (s2 * s2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Conservative bounding-box prune: every point within `radiusKm` of the
   *  origin satisfies the returned predicate set (plain comparisons on the
   *  raw columns — scan-pushable). Near the poles, or when the longitude
   *  window would cross the antimeridian, the corresponding bound is
   *  dropped (still conservative, just wider). */
  private def boxed(points: DataFrame, latCol: String, lonCol: String,
                    olat: Double, olon: Double, radiusKm: Double): DataFrame = {
    val dLat = radiusKm / MinKmPerDegLat * 1.01
    val latLo = olat - dLat
    val latHi = olat + dLat
    val base = points.where(col(latCol) >= latLo && col(latCol) <= latHi)
    val maxAbsLat = math.max(math.abs(latLo), math.abs(latHi))
    if (maxAbsLat >= 89.0) base
    else {
      // longitude degrees shrink by cos(lat): size the window at the
      // band's widest |lat| so it over-covers everywhere in the band
      val dLon = radiusKm / (MinKmPerDegLat * math.cos(math.toRadians(maxAbsLat))) * 1.01
      if (dLon >= 180.0 || olon - dLon < -180.0 || olon + dLon > 180.0) base
      else base.where(col(lonCol) >= olon - dLon && col(lonCol) <= olon + dLon)
    }
  }

  /** `geo_distance` query: points within `radiusKm` of the origin, nearest
   *  first (dist asc, id tiebreak), bounded top-k. */
  def geoDistance(points: DataFrame, idCol: String, latCol: String, lonCol: String,
                  olat: Double, olon: Double, radiusKm: Double, k: Int): DataFrame = {
    require(radiusKm > 0, s"radius must be > 0, got $radiusKm")
    require(k > 0, s"k must be > 0, got $k")
    require(olat >= -90 && olat <= 90 && olon >= -180 && olon <= 180,
      s"origin out of range: ($olat, $olon)")
    boxed(points, latCol, lonCol, olat, olon, radiusKm)
      .withColumn("dist_km", haversineKm(col(latCol), col(lonCol), olat, olon))
      .where(col("dist_km") <= radiusKm)
      .orderBy(col("dist_km").asc, col(idCol).asc)
      .limit(k)
  }

  /** `geo_bounding_box` query: points inside the box — pure range
   *  predicates on the raw columns, fully scan-pushable (the simplest geo
   *  filter, and the one every map viewport issues). */
  def boundingBox(points: DataFrame, latCol: String, lonCol: String,
                  top: Double, left: Double, bottom: Double, right: Double): DataFrame = {
    require(top > bottom, s"top ($top) must be > bottom ($bottom)")
    require(right > left, s"right ($right) must be > left ($left) — antimeridian-crossing boxes not supported")
    points.where(col(latCol) <= top && col(latCol) >= bottom &&
      col(lonCol) >= left && col(lonCol) <= right)
  }

  /** `geo_bounds` + `geo_centroid` metric aggregations in ONE pass: the
   *  tightest non-wrapping box (top/left/bottom/right = max/min column
   *  aggregates) and the arithmetic-mean centroid with its point count.
   *  All six metrics are map-side-combinable partials merged into a single
   *  final row — the shape that costs one scan at any corpus size. The
   *  centroid mean is summed in Spark's partial-aggregate order; the
   *  entry rounds to a tolerance both engines reproduce. */
  def boundsCentroid(points: DataFrame, latCol: String, lonCol: String): DataFrame =
    points.agg(
      max(col(latCol)).as("top"), min(col(lonCol)).as("left"),
      min(col(latCol)).as("bottom"), max(col(lonCol)).as("right"),
      round(avg(col(latCol)), 6).as("centroid_lat"),
      round(avg(col(lonCol)), 6).as("centroid_lon"),
      count(lit(1)).as("n_points"))

  /** Web-Mercator bound: tiles only exist for |lat| <= this. */
  val MercatorMaxLat = 85.05112878

  /** `geotile_grid` aggregation: bucket points into z/x/y Web-Mercator
   *  tiles (the map-tile keys every slippy map uses). Pure column algebra
   *  — the x/y formulas are the standard tile math, written in a fixed
   *  operation order so an independent engine reproduces the same doubles
   *  before the floor. Points outside the Mercator latitude range have no
   *  tile and are dropped, as the reference does. */
  def geotileGrid(points: DataFrame, latCol: String, lonCol: String,
                  zoom: Int): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom must be in [0, 29], got $zoom")
    val n = (1L << zoom).toDouble
    val x = floor((col(lonCol) + 180.0) / 360.0 * n).cast("long")
    val latR = radians(col(latCol))
    val y = floor((lit(1.0) - log(tan(latR) + lit(1.0) / cos(latR)) / math.Pi)
      / 2.0 * n).cast("long")
    points
      .where(col(latCol) >= -MercatorMaxLat && col(latCol) <= MercatorMaxLat)
      .groupBy(concat_ws("/", lit(zoom), x, y).as("tile"))
      .agg(count(lit(1)).as("n_points"))
  }

  /** The base32 geohash cell of a point — `geohash_grid`'s bucket key.
   *  Precision p = 5p bits: lon and lat quantize to 2^ceil(5p/2) /
   *  2^floor(5p/2) steps and their bits interleave MSB-first starting with
   *  lon (the geohash contract), assembled as ONE closed-form integer
   *  expression (shift + mod bit extraction, no loops at runtime, no UDF)
   *  and mapped through the base32 alphabet. Codegen-friendly and
   *  bit-reproducible on any engine evaluating the same arithmetic. */
  def geohashCell(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 6,
      s"precision must be in [1, 6] (closed-form long arithmetic), got $precision")
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    // the valid upper boundary (lat 90 / lon 180) quantizes to 2^bits —
    // clamp to the last cell like canonical encoders, or every extracted
    // bit reads 0 and the point lands in the FIRST cell
    val lonQ = least(floor((lon + 180.0) / 360.0 * (1L << lonBits).toDouble),
      lit((1L << lonBits) - 1.0)).cast("long")
    val latQ = least(floor((lat + 90.0) / 180.0 * (1L << latBits).toDouble),
      lit((1L << latBits) - 1.0)).cast("long")
    def bit(c: Column, k: Int) = shiftright(c, k) % 2
    // interleave: global bit position g (0 = MSB) takes lon bit when g is
    // even, lat bit when odd
    val hash = (0 until bits).map { g =>
      val src = if (g % 2 == 0) bit(lonQ, lonBits - 1 - g / 2)
                else bit(latQ, latBits - 1 - g / 2)
      src * (1L << (bits - 1 - g))
    }.reduceLeft(_ + _)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    (0 until precision).map { j =>
      lit(alphabet).substr(
        (shiftright(hash, bits - 5 - 5 * j) % 32 + 1).cast("int"), lit(1))
    }.reduce(concat(_, _))
  }

  /** `geohash_grid` aggregation: cell -> point count at the given
   *  precision. Map-side combinable single pass, like [[geotileGrid]]. */
  def geohashGrid(points: DataFrame, latCol: String, lonCol: String,
                  precision: Int): DataFrame =
    points
      .groupBy(geohashCell(col(latCol), col(lonCol), precision).as("cell"))
      .agg(count(lit(1)).as("n_points"))

  /** `geo_distance` aggregation: distance-ring buckets from the origin with
   *  the reference's half-open [from, to) semantics and *-to keys. Bucket
   *  metrics are count/min/max — order-independent aggregates, so the
   *  result is deterministic under any shuffle order (an avg of millions of
   *  libm-noisy doubles would not be). One pass, no prune (every ring keeps
   *  every point by construction). */
  def distanceRanges(points: DataFrame, latCol: String, lonCol: String,
                     olat: Double, olon: Double, bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.head > 0,
      s"bounds must be ascending positive, got $bounds")
    val d = haversineKm(col(latCol), col(lonCol), olat, olon)
    val keys = (Seq("*") ++ bounds.map(_.toString)) :+ "*"
    val bucket = bounds.zipWithIndex.foldLeft(
      when(lit(false), "")) { case (acc, (b, i)) =>
        acc.when(d < b, s"${keys(i)}-${keys(i + 1)}")
      }.otherwise(s"${bounds.last}-*")
    points
      .withColumn("dist_km", d)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_points"),
        round(min(col("dist_km")), 3).as("min_km"),
        round(max(col("dist_km")), 3).as("max_km"))
  }
}
