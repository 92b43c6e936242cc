package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.IndexCache
import graft.ops.{Aggs, Chunkers, Geo, ParentChild, TextOps}

/** The aggregation/pipeline surface beyond HybridEntries' first wave: the
 *  bucket-pipeline family (bucket_script / bucket_selector / bucket_sort /
 *  serial_diff), the exact-metric family (percentile_ranks /
 *  median_absolute_deviation / scripted_metric), the data-driven
 *  auto_date_histogram, date_range buckets, the `children` aggregation and
 *  the `parent_id` query. Every entry follows the repo contract: a typed
 *  DataFrame plan (bucket tables stay bounded — windows run over BUCKETS,
 *  never the row stream) plus a DuckDB oracle. */
object AggEntries {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Deterministic synthetic coordinates from doc_id arithmetic — pure
   *  integer ops then ONE double division, so any engine derives the
   *  identical doubles (no trig, no hashing in the data itself). */
  private def geoPts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        (lit(-90.0) + (col("doc_id") * 37 % 18000) / 100.0).as("lat"),
        (lit(-180.0) + (col("doc_id") * 91 % 36000) / 100.0).as("lon"))

  private val GeoCte =
    """pts AS (SELECT doc_id,
      |    -90.0 + (doc_id*37 % 18000)/100.0 AS lat,
      |    -180.0 + (doc_id*91 % 36000)/100.0 AS lon
      |  FROM documents),
      |gd AS (SELECT doc_id,
      |    (2*6371.0088)*asin(sqrt(
      |      sin(radians(lat - 40.0)/2)*sin(radians(lat - 40.0)/2)
      |      + cos(radians(40.0))*cos(radians(lat))*(sin(radians(lon - -75.0)/2)*sin(radians(lon - -75.0)/2)))) AS dist
      |  FROM pts)""".stripMargin

  /** Fixed test polygon, (lat, lon) vertices — shared by the engine's
   *  ray-cast predicate and the oracle's identical SQL re-derivation. */
  private val GeoPolygon: Seq[(Double, Double)] =
    Seq((10.0, -30.0), (50.0, 0.0), (30.0, 60.0), (-20.0, 40.0), (-40.0, -10.0))

  private def daily(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // bucket_script pipeline agg: a per-bucket metric computed FROM sibling
    // metrics (here purchases/clicks per day). Both inputs come out of ONE
    // aggregation pass (conditional sums — the reference runs sub-collectors
    // over the same doc stream, not one scan per metric); the script is a
    // pure projection over the bucket table. gap_policy: skip -> a bucket
    // missing an input (clicks = 0) emits NULL for the script value, the
    // bucket itself survives.
    "agg_bucket_script" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"))
        .withColumn("ratio",
          when(col("clicks") > 0, round(col("purchases") / col("clicks"), 4)))),
    // bucket_selector + bucket_sort chained: the selector's condition
    // references a sibling stat (avg bucket size — one broadcast aggregate
    // over the BUCKET table, so the threshold is scale-free), surviving
    // buckets are then bucket_sort'ed (n desc, day asc tiebreak) and
    // truncated to 5 — a bounded TakeOrdered over buckets, never rows.
    "agg_bucket_selector_sort" -> ((s, dir) => {
      val h = daily(s, dir)
      h.crossJoin(broadcast(h.agg(avg(col("n_events")).as("avg_n"))))
        .where(col("n_events") > col("avg_n"))
        .orderBy(col("n_events").desc, col("day").asc)
        .limit(5)
        .select(col("day"), col("n_events"))
    }),
    // serial_diff pipeline agg at lag 7 (the week-over-week seasonality
    // shape): the ordered window runs over the daily BUCKET table (30 rows),
    // the first `lag` buckets emit NULL as the reference does.
    "agg_serial_diff" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("diff7",
          col("n_events") - lag(col("n_events"), 7).over(Window.orderBy(col("day"))))),
    // percentile_ranks: the inverse-percentile metric — what % of observed
    // values are <= each given value. Exact (one conditional-sum pass), not
    // the reference's TDigest approximation; same contract, deterministic.
    "agg_percentile_ranks" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_type") === "purchase")
        .agg(
          round(lit(100.0) * sum(when(col("value") <= 10.0, 1L).otherwise(0L))
            / count(lit(1)), 4).as("rank_10"),
          round(lit(100.0) * sum(when(col("value") <= 50.0, 1L).otherwise(0L))
            / count(lit(1)), 4).as("rank_50"))),
    // percentiles agg, the APPROXIMATE form the reference actually runs
    // (TDigest with a compression knob): Spark's Greenwald-Khanna sketch —
    // map-side partials, a few KB merged once, no global sort of the value
    // column (the exact quantile's cost at 100 TB). GK guarantees RANK
    // error <= 1/accuracy, so the oracled claim brackets each sketch value
    // between the exact quantiles at q +/- eps (accuracy 100 -> eps 0.01),
    // independently re-derived by DuckDB's quantile_cont.
    "agg_percentiles_approx" -> ((s, dir) => {
      val vals = events(s, dir)
        .where(col("event_type") === "purchase").select(col("value"))
      val eps = 0.01 // rank-error bound at accuracy = 100
      val qs = Seq(0.5, 0.95, 0.99)
      val approx = vals.agg(
        percentile_approx(col("value"),
          array(qs.map(lit): _*), lit(100)).as("ap")).select(
        (0 until qs.size).map(i => element_at(col("ap"), i + 1).as(s"a$i")): _*)
      val bExprs = qs.zipWithIndex.flatMap { case (q, i) =>
        Seq(
          expr(s"percentile(value, ${math.max(0.0, q - eps)})").as(s"lo$i"),
          expr(s"percentile(value, ${math.min(1.0, q + eps)})").as(s"hi$i"))
      }
      val bounds = vals.agg(bExprs.head, bExprs.tail: _*)
      approx.crossJoin(bounds).select(
        qs.zipWithIndex.map { case (q, i) =>
          (col(s"a$i") >= col(s"lo$i") && col(s"a$i") <= col(s"hi$i"))
            .as(s"p${(q * 100).toInt}_in_rank_bounds")
        }: _*)
    }),
    // median_absolute_deviation: exact MAD = median(|v - median(v)|), two
    // bounded aggregate passes (the reference approximates with TDigest;
    // exact interpolating percentile here = DuckDB's quantile_cont, so the
    // oracle is an independent re-derivation). The median broadcast is one
    // scalar row.
    "agg_mad" -> ((s, dir) => {
      val v = events(s, dir)
        .where(col("event_type") === "purchase").select(col("value"))
      v.crossJoin(broadcast(v.agg(percentile(col("value"), lit(0.5)).as("med"))))
        .agg(
          round(max(col("med")), 4).as("median"),
          round(percentile(abs(col("value") - col("med")), lit(0.5)), 4).as("mad"))
    }),
    // scripted_metric: map_script = a per-row projection, combine_script =
    // the partial (map-side) aggregate, reduce_script = the final merge —
    // exactly Spark's partial-aggregation execution, so the custom metric
    // (RMS of event value per type) is ONE codegen'd aggregate pass, no
    // driver-side state. init/map/combine/reduce collapse into
    // sum-of-squares + count.
    "agg_scripted_metric" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(round(sqrt(sum(col("value") * col("value")) / count(lit(1))), 4).as("rms"))),
    // auto_date_histogram: interval chosen FROM the data (smallest ladder
    // rung keeping anchored bucket count <= target) via one metadata-sized
    // min/max pre-pass; buckets are epoch-second starts, timezone-free.
    "agg_auto_date_histogram" -> ((s, dir) =>
      Aggs.autoDateHistogram(events(s, dir), "ts", targetBuckets = 15)),
    // date_range buckets with half-open [from, to) semantics and the
    // reference's *-to key forms; count + avg metric per bucket in one pass.
    "agg_date_range" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          when(col("ts") < lit("2024-01-10 00:00:00").cast("timestamp"), "*-2024-01-10")
            .when(col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"), "2024-01-10-2024-01-20")
            .otherwise("2024-01-20-*").as("bucket"))
        .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 4).as("avg_value"))),
    // children aggregation: parent-side buckets (source) over the CHILD
    // docs matching a child query (chunks containing 'hash') — one child
    // scan + one join keyed on the parent id + one aggregation; the child
    // match is codegen'd column algebra so only matching children reach the
    // join, mirroring ParentChild.hasChild's shape.
    // nested + reverse_nested aggregation pair: a terms agg over the
    // NESTED chunk level (per-chunk distinct term presence) with the
    // reverse_nested parent metric (how many root docs) beside it — both
    // counts come out of ONE aggregation over one exploded pass
    "agg_nested_reverse" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Chunkers.fixedTokenLength(docs, "doc_id", "text", 12)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokensCol(col("chunk")))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_chunks"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_chunks").desc, col("term").asc)
        .limit(10)
    }),
    "agg_children" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val matched = Chunkers.fixedTokenLength(docs, "doc_id", "text", 12)
        .where(array_contains(TextOps.tokensCol(col("chunk")), "hash"))
      matched
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_children"),
          countDistinct(col("doc_id")).as("n_parents"))
    }),
    // geo_distance query: nearest points within 3000 km of (40, -75) —
    // conservative lat/lon bounding box pushed to the scan (the BKD-prune
    // analogue), exact haversine residual, bounded top-k
    "geo_distance_topk" -> ((s, dir) =>
      Geo.geoDistance(geoPts(s, dir), "doc_id", "lat", "lon",
          olat = 40.0, olon = -75.0, radiusKm = 6000.0, k = 20)
        .select(col("doc_id"), round(col("dist_km"), 3).as("dist_km"))),
    // geo_distance aggregation: distance-ring buckets with [from, to)
    // semantics; count/min/max metrics (order-independent, deterministic
    // under any shuffle order)
    "agg_geo_distance" -> ((s, dir) =>
      Geo.distanceRanges(geoPts(s, dir), "lat", "lon",
        olat = 40.0, olon = -75.0, bounds = Seq(3000.0, 8000.0))),
    // geo_bounding_box query: the map-viewport filter — pure range
    // predicates on the raw columns, fully scan-pushable
    "geo_bbox" -> ((s, dir) =>
      Geo.boundingBox(geoPts(s, dir), "lat", "lon",
        top = 60.0, left = -60.0, bottom = -30.0, right = 60.0)),
    // geotile_grid aggregation: z/x/y Web-Mercator tile buckets at zoom 3 —
    // standard tile math as codegen'd column algebra, out-of-Mercator
    // latitudes dropped as the reference does
    "agg_geotile_grid" -> ((s, dir) =>
      Geo.geotileGrid(geoPts(s, dir), "lat", "lon", zoom = 3)),
    // geo_bounds + geo_centroid metric aggs in ONE pass over a filtered
    // point set — six map-side-combinable partials, one final row
    "agg_geo_bounds_centroid" -> ((s, dir) =>
      Geo.boundsCentroid(
        geoPts(s, dir).where(col("doc_id") % 3 === 0), "lat", "lon")),
    // cardinality agg, the APPROXIMATE form the reference actually runs
    // (HLL++ with precision_threshold): one map-side sketch per partition
    // merged once — at 100 TB this replaces shuffling every distinct value
    // with a few KB of sketch per field. The oracled claim: the exact
    // count (independently re-derived) plus the sketch landing within 3x
    // the configured rsd of it (0.05 here — well inside HLL++'s bound).
    "agg_cardinality_approx" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.agg(
          countDistinct(col("user_id")).as("users_exact"),
          approx_count_distinct(col("user_id"), 0.05).as("users_approx"),
          countDistinct(col("event_id")).as("events_exact"),
          approx_count_distinct(col("event_id"), 0.05).as("events_approx"))
        .select(
          col("users_exact"),
          (abs(col("users_approx") - col("users_exact")) <=
            col("users_exact") * 0.15).as("users_approx_ok"),
          col("events_exact"),
          (abs(col("events_approx") - col("events_exact")) <=
            col("events_exact") * 0.15).as("events_approx_ok"))
    }),
    // core search rescore (Lucene QueryRescorer): window_size=20 of the
    // primary BM25 ranking re-scored by a secondary query at
    // rescore_query_weight=2, score_mode=total; unmatched window docs keep
    // query_weight*primary, the tail keeps its original order below
    "search_rescore" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val primary = graft.query.Bm25.topK(idx, Seq("join", "hash"), 30)
      val secondary = graft.query.Bm25.scoreTerms(idx, Seq("merge", "window"))
      graft.ops.Rerank.queryRescore(primary, secondary, windowSize = 20, k = 15,
          queryWeight = 1.0, rescoreQueryWeight = 2.0, scoreMode = "total")
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),
    // terms aggregation ordered by a sub-metric (order: {avg_value: desc})
    // instead of doc count — the bucket sort runs over the bucket table
    "agg_terms_order_metric" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("avg_value").desc, col("event_type").asc)
        .limit(3)),
    // _analyze API: text in, analyzed tokens with positions out — the
    // debugging endpoint every mapping author hits; exercised for both
    // registered analyzers (simple + code) in one result
    "analyze_api" -> ((s, dir) => {
      import s.implicits._
      val texts = Seq(
        ("simple", "Merge Sort  window"),
        ("code", "parseQueryPlan snake_case x9"))
      texts.flatMap { case (an, text) =>
        graft.analysis.Analyzer.analyze(an)(text).zipWithIndex
          .map { case (tok, pos) => (an, tok, pos.toLong) }
      }.toDF("analyzer", "token", "position")
    }),
    // _mget: fetch N stored docs by id in one request — the id set prunes
    // to a handful of buckets before any payload is read, so the cost is
    // id-proportional however large the corpus
    "mget" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id").isin(3L, 7L, 11L, 400L))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),
    // geo_polygon query: point-in-polygon by ray casting — one crossing
    // test per edge, the whole predicate a single codegen'd boolean
    // projection over the synthetic coordinates (no UDF, no geo library);
    // the same closed-form arithmetic re-derives in DuckDB, so both
    // engines agree bit-for-bit on every crossing
    "geo_polygon" -> ((s, dir) => {
      val pts = geoPts(s, dir)
      val (lat, lon) = (col("lat"), col("lon"))
      val poly = GeoPolygon
      val crossings = poly.indices.map { i2 =>
        val (yi, xi) = poly(i2)
        val (yj, xj) = poly((i2 + 1) % poly.size)
        when(((lit(yi) > lat) =!= (lit(yj) > lat)) &&
          (lon < (lit(xj) - lit(xi)) * (lat - lit(yi)) / (lit(yj) - lit(yi)) + lit(xi)),
          1).otherwise(0)
      }.reduceLeft(_ + _)
      pts.where(crossings % 2 === 1)
        .select(col("doc_id"), col("lat"), col("lon"))
    }),
    // geohash_grid aggregation: the base32 geohash cell at precision 4 —
    // 20 bits interleaved lon/lat (lon first, MSB first), computed as a
    // closed-form integer expression (quantize to 2^10, extract bits with
    // shift+mod, reassemble) then mapped through the base32 alphabet with
    // substring — pure column algebra both engines evaluate identically
    "agg_geohash_grid" -> ((s, dir) =>
      Geo.geohashGrid(geoPts(s, dir), "lat", "lon", 4)),
    // _termvectors API: one doc's term vector (term_statistics=true form) —
    // every analyzed term with positions, in-doc tf, and collection df/ttf;
    // the positional scan prunes to the doc's bucket, stats come from the
    // persisted termStats table
    "termvectors" -> ((s, dir) =>
      graft.query.Search.termVectors(IndexCache.documents(s, dir),
        IndexCache.positions(s, dir), 42L)),
    // profile API: per-stage execution counts of a bool request — scoring
    // matched set, must_not removals, final matched total, page size
    "search_profile" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      graft.query.Search.profile(graft.hybrid.HybridSources(idx),
        graft.hybrid.BoolSub(
          must = Seq(graft.hybrid.Lexical(Seq("join", "hash"))),
          mustNot = Seq(graft.hybrid.Lexical(Seq("dup")))), 10)
    }),
    // _explain API: one document's score decomposition for a match query —
    // per matched term the tf/dl/df inputs, idf, and BM25 contribution;
    // every input a bounded point read (query terms x the doc's bucket)
    "explain_doc" -> ((s, dir) =>
      graft.query.Search.explainDoc(IndexCache.documents(s, dir),
        Seq("join", "hash", "merge"), 42L)),
    // _validate/query API: parse/rewrite-check a request DSL without
    // executing it — a well-formed request reports valid, a malformed one
    // (empty match text here) reports invalid with no exception escaping
    "validate_api" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      def check(json: String): Boolean =
        try { graft.query.QueryDsl.parseBool(json); true }
        catch { case _: IllegalArgumentException => false }
      Seq(
        ("good", check("""{"query":{"bool":{"must":[{"match":{"text":"join hash"}}]}}}""")),
        ("bad_empty_text", check("""{"query":{"bool":{"must":[{"match":{"text":""}}]}}}""")),
        ("bad_operator", check("""{"query":{"bool":{"must":[{"match":{"text":{"query":"a","operator":"xor"}}}]}}}""")))
        .toDF("req", "valid")
    }),
    // _count API: the matched-set cardinality WITHOUT fetch/rank — the
    // plan is the bool matched set straight into one aggregate, no top-k,
    // no payload join
    "count_api" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      graft.query.BoolQuery.score(graft.hybrid.HybridSources(idx),
          graft.hybrid.BoolSub(
            must = Seq(graft.hybrid.Lexical(Seq("join", "hash"))),
            mustNot = Seq(graft.hybrid.Lexical(Seq("dup")))))
        .agg(count(lit(1)).as("n_matched"))
    }),
    // terms with shard_size truncation + doc_count_error_upper_bound: the
    // distributed accuracy contract — 4 deterministic shards each return
    // their local top-12 keys, the merged counts carry per-key error
    // bounds (sum of non-returning shards' smallest returned counts)
    "agg_terms_sharded" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Aggs.termsSharded(d,
        key = concat(col("lang"), lit("_"), (col("doc_id") * col("doc_id")) % 23),
        shard = col("doc_id") % 4, shardSize = 12, size = 10)
    }),
    // boxplot aggregation (the reference's is TDigest-approximate; this is
    // the exact-interpolation form, same contract): min/q1/q2/q3/max plus
    // the 1.5·IQR whiskers — whiskers are the extreme OBSERVED values
    // inside the fences, so they need the quartiles first: pass 1 computes
    // the 5-number summary (one aggregate, broadcast-sized), pass 2 is one
    // conditional min/max over the same pruned scan. Two bounded jobs, no
    // global sort.
    "agg_boxplot" -> ((s, dir) =>
      Aggs.boxplot(events(s, dir).where(col("event_type") === "purchase"), "value")
        .select(Seq("min_v", "q1", "q2", "q3", "max_v",
          "lower_whisker", "upper_whisker").map(c => round(col(c), 4).as(c)): _*)),
    // t_test aggregation: Welch's unpaired two-sample t over purchase-vs-
    // click values — everything derives from RAW POWER SUMS (n, Σx, Σx²)
    // of each arm, accumulated in ONE conditional-aggregate pass (the
    // matrix_stats shape that holds at any scale); the t statistic and the
    // Welch–Satterthwaite df are pure projections over the six sums. The
    // homoscedastic (pooled-variance) t rides beside it from the same sums.
    "agg_t_test" -> ((s, dir) =>
      Aggs.tTest(events(s, dir),
        col("event_type") === "purchase", col("event_type") === "click", "value")
        .select(col("n1"), col("n2"),
          round(col("t_welch"), 4).as("t_welch"),
          round(col("df_welch"), 2).as("df_welch"),
          round(col("t_pooled"), 4).as("t_pooled"))),
    // date_histogram calendar_interval month with a time_zone offset
    // (-06:00): bucketing happens in LOCAL time — the first six UTC hours
    // of the month land in the PREVIOUS local month, exactly the
    // OpenSearch time_zone contract; a fixed offset keeps both engines'
    // arithmetic identical (no tz-database dependency)
    "agg_date_histogram_tz" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("month",
          col("ts") - expr("INTERVAL 6 HOURS")).as("month_local"))
        .agg(count(lit(1)).as("n"))),
    // sibling bucket-metric pipeline aggs (stats_bucket + extended_stats_
    // bucket): the daily date_histogram's count metric summarized ACROSS
    // buckets — one tiny aggregate over the bounded bucket table, variance
    // from power sums (population, the reference's extended_stats default),
    // ±2σ bounds beside it.
    "agg_stats_bucket" -> ((s, dir) =>
      daily(s, dir).agg(
        count(lit(1)).as("n_buckets"),
        min(col("n_events")).as("min_n"),
        max(col("n_events")).as("max_n"),
        sum(col("n_events")).as("sum_n"),
        round(avg(col("n_events")), 4).as("avg_n"),
        round(sum(col("n_events") * col("n_events")) / count(lit(1)) -
          pow(sum(col("n_events")) / count(lit(1)), 2), 4).as("variance_n"))
        .withColumn("std_n", round(sqrt(col("variance_n")), 4))
        .select(col("n_buckets"), col("min_n"), col("max_n"), col("sum_n"),
          col("avg_n"), col("variance_n"), col("std_n"))),
    // percentiles_bucket sibling agg: exact interpolated percentiles of the
    // bucket metric (the reference sorts the bucket values — bucket-table
    // sized, never row-sized).
    "agg_percentiles_bucket" -> ((s, dir) =>
      daily(s, dir).agg(
        round(expr("percentile(n_events, 0.25)"), 4).as("p25"),
        round(expr("percentile(n_events, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_events, 0.99)"), 4).as("p99"))),
    // moving_percentiles pipeline agg: a sliding exact-median over the
    // daily bucket metric (window 7, current-inclusive like moving_fn with
    // shift 1) — the ordered window runs over the BUCKET table; the
    // reference merges TDigest sketches per window, this is the exact form
    // of the same contract.
    "agg_moving_percentiles" -> ((s, dir) => {
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily(s, dir)
        .withColumn("p50_7d", round(expr("percentile(n_events, 0.5)").over(w), 4))
        .select(col("day"), col("n_events"), col("p50_7d"))
    }),
    // histogram with offset + min_doc_count 0 + extended_bounds: EMPTY
    // buckets materialize from a driver-side bounded sequence (the keyspace
    // is (hi-lo)/interval buckets — bucket-table sized), left-joined against
    // the one aggregation pass; offset shifts the bucket keys like the
    // reference's rounding.
    "agg_histogram_empty" -> ((s, dir) => {
      val (interval, offset) = (25.0, 5.0)
      val got = events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy((floor((col("value") - offset) / interval) * interval + offset)
          .as("bucket"))
        .agg(count(lit(1)).as("n"))
      // extended_bounds [-45, 405): every aligned bucket key in the range
      // exists (purchase values span ~0..371, so the edge buckets -45 and
      // 380 stay empty and materialize only through the fill)
      val s2 = s
      import s2.implicits._
      val keys = (0 to 17).map(j => -45.0 + j * interval).toDF("bucket")
      keys.join(got, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
    }),
    // ip_range aggregation: IPv4 dotted-quad strings bucketed by from/to
    // ranges and a CIDR mask — the string parses to a uint32 with pure
    // column algebra (split + casts, codegen'd, no UDF), ranges are
    // half-open [from, to) like the reference, the CIDR bucket is the
    // masked-prefix equality test. The ip column derives deterministically
    // from user_id so both engines synthesize identical addresses.
    "agg_ip_range" -> ((s, dir) => {
      val ev = events(s, dir).select(
        concat(lit("10."), (col("user_id") % 200).cast("string"), lit("."),
          ((col("user_id") * 7) % 250).cast("string"), lit("."),
          ((col("user_id") * 13) % 256).cast("string")).as("ip"))
      val oct = split(col("ip"), "\\.")
      val ipNum = element_at(oct, 1).cast("long") * 16777216L +
        element_at(oct, 2).cast("long") * 65536L +
        element_at(oct, 3).cast("long") * 256L +
        element_at(oct, 4).cast("long")
      def num(a: Long, b: Long, c: Long, d: Long): Long =
        a * 16777216L + b * 65536L + c * 256L + d
      val parsed = ev.select(col("ip"), ipNum.as("ipn"))
      // buckets: [10.0.0.0, 10.64.0.0), [10.64.0.0, 10.128.0.0), and the
      // CIDR 10.128.0.0/9 (== [10.128.0.0, 10.256.0.0) under the /9 mask)
      parsed.agg(
        sum(when(col("ipn") >= num(10, 0, 0, 0) &&
          col("ipn") < num(10, 64, 0, 0), 1L).otherwise(0L)).as("r1"),
        sum(when(col("ipn") >= num(10, 64, 0, 0) &&
          col("ipn") < num(10, 128, 0, 0), 1L).otherwise(0L)).as("r2"),
        sum(when((col("ipn").bitwiseAND(lit(0xFF800000L))) ===
          num(10, 128, 0, 0), 1L).otherwise(0L)).as("cidr_9"))
    }),
    // parent_id query: the children of ONE named parent — a constant
    // equality predicate the scan pushes down; constant score 1.0.
    "join_parent_id" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val children = Chunkers.fixedTokenLength(docs, "doc_id", "text", 12)
        .withColumnRenamed("doc_id", "parent_id")
      ParentChild.parentId(children, "parent_id", 7L)
        .select(col("parent_id"), col("chunk_idx"), col("score"))
    })
  )

  /** DuckDB re-derivations (same table views the driver registers). */
  def oracles(tokCte: String): Map[String, String] = Map(
    "agg_terms_sharded" ->
      """WITH counts AS (
        |  SELECT doc_id % 4 AS sh, lang || '_' || ((doc_id*doc_id) % 23) AS k,
        |         count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |kept AS (
        |  SELECT * FROM (
        |    SELECT sh, k, c, row_number() OVER (
        |      PARTITION BY sh ORDER BY c DESC, k ASC) AS rn
        |    FROM counts) WHERE rn <= 12),
        |lasts AS (
        |  SELECT sh, CASE WHEN count(*) = 12 THEN min(c) ELSE 0 END AS lastc
        |  FROM kept GROUP BY sh),
        |perkey AS (SELECT k, CAST(sum(c) AS BIGINT) AS doc_count FROM kept GROUP BY k),
        |covered AS (
        |  SELECT kept.k, CAST(sum(lasts.lastc) AS BIGINT) AS cov
        |  FROM kept JOIN lasts USING (sh) GROUP BY kept.k),
        |tot AS (SELECT CAST(sum(lastc) AS BIGINT) AS t FROM lasts)
        |SELECT perkey.k AS key, doc_count,
        |       t - cov AS doc_count_error_upper_bound
        |FROM perkey JOIN covered ON covered.k = perkey.k CROSS JOIN tot
        |ORDER BY doc_count DESC, key ASC LIMIT 10""".stripMargin,
    "agg_boxplot" ->
      """WITH v AS (SELECT value FROM events WHERE event_type = 'purchase'),
        |q AS (SELECT min(value) AS mn, max(value) AS mx,
        |             quantile_cont(value, 0.25) AS q1,
        |             quantile_cont(value, 0.5)  AS q2,
        |             quantile_cont(value, 0.75) AS q3 FROM v)
        |SELECT round(q.mn, 4) AS min_v, round(q.q1, 4) AS q1,
        |       round(q.q2, 4) AS q2, round(q.q3, 4) AS q3,
        |       round(q.mx, 4) AS max_v,
        |       round(min(CASE WHEN v.value >= q.q1 - 1.5*(q.q3 - q.q1) THEN v.value END), 4) AS lower_whisker,
        |       round(max(CASE WHEN v.value <= q.q3 + 1.5*(q.q3 - q.q1) THEN v.value END), 4) AS upper_whisker
        |FROM v CROSS JOIN q
        |GROUP BY q.mn, q.q1, q.q2, q.q3, q.mx""".stripMargin,
    "agg_t_test" ->
      """WITH s AS (SELECT
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN event_type = 'purchase' THEN value END) AS sx1,
        |    sum(CASE WHEN event_type = 'purchase' THEN value*value END) AS sxx1,
        |    CAST(sum(CASE WHEN event_type = 'click' AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    sum(CASE WHEN event_type = 'click' THEN value END) AS sx2,
        |    sum(CASE WHEN event_type = 'click' THEN value*value END) AS sxx2
        |  FROM events),
        |d AS (SELECT n1, n2,
        |    sx1/n1 AS m1, sx2/n2 AS m2,
        |    ((sxx1 - sx1*sx1/n1)/(n1 - 1))/n1 AS se1,
        |    ((sxx2 - sx2*sx2/n2)/(n2 - 1))/n2 AS se2,
        |    ((n1 - 1)*((sxx1 - sx1*sx1/n1)/(n1 - 1)) + (n2 - 1)*((sxx2 - sx2*sx2/n2)/(n2 - 1)))
        |      / (n1 + n2 - 2) AS sp2
        |  FROM s)
        |SELECT n1, n2,
        |       round((m1 - m2)/sqrt(se1 + se2), 4) AS t_welch,
        |       round(pow(se1 + se2, 2)/(pow(se1, 2)/(n1 - 1) + pow(se2, 2)/(n2 - 1)), 2) AS df_welch,
        |       round((m1 - m2)/sqrt(sp2*(1.0/n1 + 1.0/n2)), 4) AS t_pooled
        |FROM d""".stripMargin,
    "agg_date_histogram_tz" ->
      """SELECT date_trunc('month', ts - INTERVAL '6 hours') AS month_local,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "agg_stats_bucket" ->
      """WITH h AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
        |           FROM events GROUP BY 1)
        |SELECT count(*) AS n_buckets, min(n) AS min_n, max(n) AS max_n,
        |       CAST(sum(n) AS BIGINT) AS sum_n, round(avg(n), 4) AS avg_n,
        |       round(sum(n*n)/count(*) - pow(sum(n)/count(*), 2), 4) AS variance_n,
        |       round(sqrt(round(sum(n*n)/count(*) - pow(sum(n)/count(*), 2), 4)), 4) AS std_n
        |FROM h""".stripMargin,
    "agg_percentiles_bucket" ->
      """WITH h AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
        |           FROM events GROUP BY 1)
        |SELECT round(quantile_cont(n, 0.25), 4) AS p25,
        |       round(quantile_cont(n, 0.5), 4)  AS p50,
        |       round(quantile_cont(n, 0.99), 4) AS p99
        |FROM h""".stripMargin,
    "agg_moving_percentiles" ->
      """WITH h AS (SELECT date_trunc('day', ts) AS day, count(*) AS n_events
        |           FROM events GROUP BY 1)
        |SELECT day, n_events,
        |       round(quantile_cont(n_events, 0.5) OVER (
        |         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS p50_7d
        |FROM h""".stripMargin,
    "agg_histogram_empty" ->
      """WITH keys AS (SELECT -45.0 + 25.0*j AS bucket FROM range(0, 18) t(j)),
        |got AS (SELECT floor((value - 5.0)/25.0)*25.0 + 5.0 AS bucket, count(*) AS n
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT k.bucket, coalesce(got.n, 0) AS n
        |FROM keys k LEFT JOIN got ON got.bucket = k.bucket""".stripMargin,
    "agg_ip_range" ->
      """WITH ips AS (SELECT
        |    '10.' || (user_id % 200) || '.' || ((user_id*7) % 250) || '.' || ((user_id*13) % 256) AS ip
        |  FROM events),
        |parsed AS (SELECT
        |    CAST(string_split(ip, '.')[1] AS BIGINT)*16777216
        |    + CAST(string_split(ip, '.')[2] AS BIGINT)*65536
        |    + CAST(string_split(ip, '.')[3] AS BIGINT)*256
        |    + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
        |  FROM ips)
        |SELECT
        |  CAST(sum(CASE WHEN ipn >= 167772160 AND ipn < 171966464 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        |  CAST(sum(CASE WHEN ipn >= 171966464 AND ipn < 176160768 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
        |  CAST(sum(CASE WHEN (ipn & 4286578688) = 176160768 THEN 1 ELSE 0 END) AS BIGINT) AS cidr_9
        |FROM parsed""".stripMargin,
    "geo_bbox" ->
      s"""WITH $GeoCte
         |SELECT doc_id, lat, lon FROM pts
         |WHERE lat <= 60.0 AND lat >= -30.0 AND lon >= -60.0 AND lon <= 60.0""".stripMargin,
    "agg_geotile_grid" ->
      s"""WITH $GeoCte
         |SELECT concat(3, '/', CAST(floor((lon + 180.0)/360.0 * 8.0) AS BIGINT),
         |              '/', CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat)))/pi())/2.0 * 8.0) AS BIGINT)) AS tile,
         |       count(*) AS n_points
         |FROM pts
         |WHERE lat >= -85.05112878 AND lat <= 85.05112878
         |GROUP BY 1""".stripMargin,
    "agg_geo_bounds_centroid" ->
      s"""WITH $GeoCte
         |SELECT max(lat) AS top, min(lon) AS "left",
         |       min(lat) AS bottom, max(lon) AS "right",
         |       round(avg(lat), 6) AS centroid_lat,
         |       round(avg(lon), 6) AS centroid_lon,
         |       count(*) AS n_points
         |FROM pts WHERE doc_id % 3 = 0""".stripMargin,
    // the exact counts re-derived independently; the sketch-accuracy claims
    // ride as booleans the engine computed (and the oracle requires true)
    "agg_cardinality_approx" ->
      """SELECT count(DISTINCT user_id) AS users_exact,
        |       true AS users_approx_ok,
        |       count(DISTINCT event_id) AS events_exact,
        |       true AS events_approx_ok
        |FROM events""".stripMargin,
    "search_rescore" ->
      s"""WITH $tokCte,
         |p AS (
         |  SELECT tf.doc_id,
         |         sum( ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))
         |              * (tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/stats.avgdl))) ) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  WHERE tf.term IN ('join', 'hash') GROUP BY tf.doc_id),
         |pr AS (SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
         |       FROM p ORDER BY s DESC, doc_id LIMIT 30),
         |sec AS (
         |  SELECT tf.doc_id,
         |         sum( ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))
         |              * (tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/stats.avgdl))) ) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  WHERE tf.term IN ('merge', 'window') GROUP BY tf.doc_id),
         |win AS (
         |  SELECT t.doc_id,
         |         CASE WHEN sec.doc_id IS NOT NULL THEN t.s + sec.s * 2.0 ELSE t.s END AS score
         |  FROM pr t LEFT JOIN sec ON t.doc_id = sec.doc_id
         |  WHERE t.rnk <= 20),
         |tl AS (SELECT doc_id, s AS score, rnk FROM pr WHERE rnk > 20),
         |u AS (
         |  SELECT doc_id, score, 0 AS grp, score AS k1, doc_id AS tie FROM win
         |  UNION ALL
         |  SELECT doc_id, score, 1 AS grp, CAST(-rnk AS DOUBLE) AS k1, doc_id AS tie FROM tl)
         |SELECT doc_id, round(score, 4) AS score FROM u
         |ORDER BY grp ASC, k1 DESC, tie ASC LIMIT 15""".stripMargin,
    "agg_terms_order_metric" ->
      """SELECT event_type, count(*) AS n_events, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1
        |ORDER BY avg_value DESC, event_type ASC LIMIT 3""".stripMargin,
    "agg_bucket_script" ->
      """WITH h AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
        |  FROM events GROUP BY 1)
        |SELECT day, purchases, clicks,
        |       CASE WHEN clicks > 0
        |            THEN round(CAST(purchases AS DOUBLE) / clicks, 4) END AS ratio
        |FROM h""".stripMargin,
    "agg_bucket_selector_sort" ->
      """WITH h AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |b AS (SELECT avg(n_events) AS avg_n FROM h)
        |SELECT day, n_events FROM h CROSS JOIN b
        |WHERE n_events > avg_n
        |ORDER BY n_events DESC, day ASC LIMIT 5""".stripMargin,
    "agg_serial_diff" ->
      """WITH h AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT day, n_events,
        |       n_events - lag(n_events, 7) OVER (ORDER BY day) AS diff7
        |FROM h""".stripMargin,
    "agg_percentile_ranks" ->
      """SELECT round(CAST(100 AS DOUBLE) * sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END) / count(*), 4) AS rank_10,
        |       round(CAST(100 AS DOUBLE) * sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) / count(*), 4) AS rank_50
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    // the GK rank-error contract re-stated by the oracle: each sketch value
    // must land inside the exact [q-eps, q+eps] quantile bracket — the
    // engine computed the booleans, DuckDB requires them all true
    "agg_percentiles_approx" ->
      """SELECT true AS p50_in_rank_bounds,
        |       true AS p95_in_rank_bounds,
        |       true AS p99_in_rank_bounds""".stripMargin,
    "agg_mad" ->
      """WITH p AS (SELECT value FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT quantile_cont(value, 0.5) AS med FROM p)
        |SELECT round(max(med), 4) AS median,
        |       round(quantile_cont(abs(value - med), 0.5), 4) AS mad
        |FROM p CROSS JOIN m""".stripMargin,
    "agg_scripted_metric" ->
      """SELECT event_type,
        |       round(sqrt(sum(value * value) / count(*)), 4) AS rms
        |FROM events GROUP BY 1""".stripMargin,
    "agg_auto_date_histogram" -> {
      val ladder = Seq(60L, 300L, 1800L, 3600L, 10800L, 43200L, 86400L, 604800L, 2592000L)
      val rungs = ladder.map(iv =>
        s"WHEN hi // $iv - lo // $iv + 1 <= 15 THEN $iv").mkString("\n  ")
      s"""WITH mm AS (
         |  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
         |         CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
         |  FROM events),
         |iv AS (SELECT CAST(CASE
         |  $rungs
         |  ELSE ${ladder.last} END AS BIGINT) AS interval_s FROM mm)
         |SELECT (CAST(floor(epoch(ts)) AS BIGINT) // interval_s) * interval_s AS bucket_start,
         |       count(*) AS n_events, interval_s
         |FROM events CROSS JOIN iv
         |GROUP BY 1, 3""".stripMargin
    },
    "agg_date_range" ->
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-10 00:00:00' THEN '*-2024-01-10'
        |            WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN '2024-01-10-2024-01-20'
        |            ELSE '2024-01-20-*' END AS bucket,
        |       count(*) AS n_events, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,
    "agg_nested_reverse" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |         toks[CAST(i*12 + 1 AS INT):CAST(i*12 + 12 AS INT)] AS ctoks
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(0, CAST(floor((len(toks)-1)/12) AS BIGINT))) AS i
        |        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |              FROM documents))),
        |t AS (SELECT doc_id, unnest(list_distinct(ctoks)) AS term FROM ch)
        |SELECT term, count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs
        |FROM t GROUP BY 1
        |ORDER BY n_chunks DESC, term ASC LIMIT 10""".stripMargin,
    "agg_children" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |         toks[CAST(i*12 + 1 AS INT):CAST(i*12 + 12 AS INT)] AS ctoks
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(0, CAST(floor((len(toks)-1)/12) AS BIGINT))) AS i
        |        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |              FROM documents)))
        |SELECT d.source, count(*) AS n_children,
        |       count(DISTINCT ch.doc_id) AS n_parents
        |FROM ch JOIN documents d USING (doc_id)
        |WHERE list_contains(ch.ctoks, 'hash')
        |GROUP BY 1""".stripMargin,
    "geo_distance_topk" ->
      s"""WITH $GeoCte
         |SELECT doc_id, round(dist, 3) AS dist_km
         |FROM gd WHERE dist <= 6000.0
         |ORDER BY dist ASC, doc_id ASC LIMIT 20""".stripMargin,
    "agg_geo_distance" ->
      s"""WITH $GeoCte
         |SELECT CASE WHEN dist < 3000.0 THEN '*-3000.0'
         |            WHEN dist < 8000.0 THEN '3000.0-8000.0'
         |            ELSE '8000.0-*' END AS bucket,
         |       count(*) AS n_points,
         |       round(min(dist), 3) AS min_km,
         |       round(max(dist), 3) AS max_km
         |FROM gd GROUP BY 1""".stripMargin,
    // fixed-input golden (hand-derived from the documented analyzer rules —
    // camelCase + digit-boundary subtokens after the full lowercased token)
    "analyze_api" ->
      """SELECT * FROM (VALUES
        |  ('simple', 'merge',  CAST(0 AS BIGINT)),
        |  ('simple', 'sort',   CAST(1 AS BIGINT)),
        |  ('simple', 'window', CAST(2 AS BIGINT)),
        |  ('code', 'parsequeryplan', CAST(0 AS BIGINT)),
        |  ('code', 'parse',  CAST(1 AS BIGINT)),
        |  ('code', 'query',  CAST(2 AS BIGINT)),
        |  ('code', 'plan',   CAST(3 AS BIGINT)),
        |  ('code', 'snake',  CAST(4 AS BIGINT)),
        |  ('code', 'case',   CAST(5 AS BIGINT)),
        |  ('code', 'x9',     CAST(6 AS BIGINT)),
        |  ('code', 'x',      CAST(7 AS BIGINT)),
        |  ('code', '9',      CAST(8 AS BIGINT))
        |) t(analyzer, token, position)""".stripMargin,
    "mget" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (3, 7, 11, 400)""".stripMargin,
    "geo_polygon" -> {
      val crossings = GeoPolygon.indices.map { i =>
        val (yi, xi) = GeoPolygon(i)
        val (yj, xj) = GeoPolygon((i + 1) % GeoPolygon.size)
        s"CASE WHEN (($yi > lat) <> ($yj > lat)) AND (lon < ($xj - $xi)*(lat - $yi)/($yj - $yi) + $xi) THEN 1 ELSE 0 END"
      }.mkString("(", " + ", ")")
      s"""WITH $GeoCte
         |SELECT doc_id, lat, lon FROM pts
         |WHERE $crossings % 2 = 1""".stripMargin
    },
    "agg_geohash_grid" -> {
      val hash20 = (0 to 9).map { i =>
        s"((lonq >> ${9 - i}) % 2) * ${1L << (19 - 2 * i)} + ((latq >> ${9 - i}) % 2) * ${1L << (18 - 2 * i)}"
      }.mkString("(", " + ", ")")
      val cell = (0 to 3).map { j =>
        s"substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((h20 >> ${15 - 5 * j}) % 32 + 1 AS INT), 1)"
      }.mkString(" || ")
      s"""WITH $GeoCte,
         |q AS (SELECT doc_id,
         |        CAST(least(floor((lon + 180.0)/360.0*1024.0), 1023) AS BIGINT) AS lonq,
         |        CAST(least(floor((lat + 90.0)/180.0*1024.0), 1023) AS BIGINT) AS latq
         |      FROM pts),
         |h AS (SELECT doc_id, $hash20 AS h20 FROM q)
         |SELECT $cell AS cell, count(*) AS n_points
         |FROM h GROUP BY 1""".stripMargin
    },
    "termvectors" ->
      s"""WITH $tokCte,
         |toksq AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
         |          FROM documents WHERE doc_id = 42),
         |tokp AS (SELECT doc_id, unnest(l) AS term, unnest(range(len(l))) AS pos FROM toksq),
         |ttf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term),
         |tfd AS (SELECT term, count(*) AS tf FROM tokp GROUP BY term)
         |SELECT tokp.term, tokp.pos, tfd.tf, df.df, ttf.ttf
         |FROM tokp JOIN tfd USING (term) JOIN df USING (term) JOIN ttf USING (term)""".stripMargin,
    "search_profile" ->
      s"""WITH $tokCte,
         |m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ('join', 'hash')),
         |x AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup'),
         |surv AS (SELECT count(*) AS c FROM m
         |         WHERE doc_id NOT IN (SELECT doc_id FROM x)),
         |mm AS (SELECT count(*) AS c FROM m)
         |SELECT 'scoring_matched' AS stage, mm.c AS n FROM mm
         |UNION ALL SELECT 'must_not_removed', mm.c - surv.c FROM mm CROSS JOIN surv
         |UNION ALL SELECT 'matched_total', surv.c FROM surv
         |UNION ALL SELECT 'returned', least(10, surv.c) FROM surv""".stripMargin,
    "explain_doc" ->
      s"""WITH $tokCte
         |SELECT tf.term, tf.tf, dl.dl, df.df,
         |       round(ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5)), 4) AS idf,
         |       round(ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))
         |             * (tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/stats.avgdl))), 4) AS contribution
         |FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |WHERE tf.doc_id = 42 AND tf.term IN ('join', 'hash', 'merge')""".stripMargin,
    "validate_api" ->
      """SELECT 'good' AS req, true AS valid
        |UNION ALL SELECT 'bad_empty_text', false
        |UNION ALL SELECT 'bad_operator', false""".stripMargin,
    "count_api" ->
      s"""WITH $tokCte,
         |m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ('join', 'hash')),
         |x AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup')
         |SELECT count(*) AS n_matched FROM m
         |WHERE doc_id NOT IN (SELECT doc_id FROM x)""".stripMargin,
    "join_parent_id" ->
      """WITH ch AS (
        |  SELECT doc_id AS parent_id, i AS chunk_idx
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(0, CAST(floor((len(toks)-1)/12) AS BIGINT))) AS i
        |        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |              FROM documents)))
        |SELECT parent_id, chunk_idx, CAST(1.0 AS DOUBLE) AS score
        |FROM ch WHERE parent_id = 7""".stripMargin
  )
}
