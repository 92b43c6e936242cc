package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite aggregation: the scale-correct way to export a FULL bucket
 *  keyspace page by page (OpenSearch `composite` agg,
 *  reference context: aggregations run alongside hybrid results via the
 *  aggregation processor; composite is the only bucket agg designed to
 *  paginate an unbounded keyspace).
 *
 *  Semantics (matching the reference):
 *   - sources: an ordered tuple of bucket keys (terms = raw column,
 *     histogram = floor(v / interval) * interval), each with its own
 *     asc/desc direction;
 *   - buckets are emitted in lexicographic key order, `size` per page;
 *   - `after` — the key tuple of the previous page's last bucket — resumes
 *     strictly after that key.
 *
 *  Scale shape: the `after` cursor is a ROW-level predicate on the key
 *  columns, so it applies BEFORE the aggregation — page N never re-shuffles
 *  rows belonging to already-exported buckets. On top of the exact
 *  lexicographic predicate we add its derivable coarse bound on the FIRST
 *  key (`k1 >= a1` asc / `k1 <= a1` desc): when that key is a raw column
 *  the bound is a plain comparison Parquet accepts as a pushed filter, so
 *  later pages skip whole row groups at the scan while the exact tuple
 *  predicate evaluates residually (Catalyst does not infer the bound from
 *  the OR-of-ANDs itself). The per-page cost is one partial-agg shuffle of
 *  only the un-exported keyspace plus a size-bounded TakeOrdered — no
 *  global sort, no full-keyspace materialization, which is what makes "walk
 *  every bucket of a 100 TB table" a sequence of bounded jobs instead of
 *  one unbounded one. */
object Aggs {

  /** One composite source: `name` is the output column, `key` the bucket
   *  key expression (already bucketed for histogram sources), `desc` its
   *  direction, `rawAsc` whether `key` is a raw asc column whose coarse
   *  cursor bound is scan-pushable. */
  case class CompositeSource(name: String, key: Column, desc: Boolean = false)

  /** One page of the composite aggregation over `rows`.
   *
   *  @param metrics non-empty aggregate columns (already aliased)
   *  @param after   previous page's last key tuple, one literal per source
   */
  def composite(rows: DataFrame, sources: Seq[CompositeSource], size: Int,
                metrics: Seq[Column], after: Option[Seq[Any]] = None): DataFrame = {
    require(sources.nonEmpty, "composite requires at least one source")
    require(size >= 1, s"composite [size] must be >= 1, got $size")
    require(metrics.nonEmpty, "composite requires at least one metric")
    after.foreach(a => require(a.size == sources.size,
      s"[after] arity ${a.size} != sources arity ${sources.size}"))

    val keyed = sources.foldLeft(rows) { (df, s) => df.withColumn(s.name, s.key) }
    val cursored = after match {
      case None => keyed
      case Some(a) =>
        // exact lexicographic strictly-after over the key tuple …
        val exact = sources.indices.map { i =>
          val ties = (0 until i)
            .map(j => col(sources(j).name) === lit(a(j)))
            .foldLeft(lit(true))(_ && _)
          val strict =
            if (sources(i).desc) col(sources(i).name) < lit(a(i))
            else col(sources(i).name) > lit(a(i))
          ties && strict
        }.reduce(_ || _)
        // … plus its coarse first-key bound, the scan-pushable conjunct
        val s0 = sources.head
        val coarse = if (s0.desc) col(s0.name) <= lit(a.head)
                     else col(s0.name) >= lit(a.head)
        keyed.where(coarse && exact)
    }
    val order = sources.map(s =>
      if (s.desc) col(s.name).desc else col(s.name).asc)
    cursored
      .groupBy(sources.map(s => col(s.name)): _*)
      .agg(metrics.head, metrics.tail: _*)
      .orderBy(order: _*)
      .limit(size)
  }

  /** `auto_date_histogram` (fixed-interval ladder variant): pick the
   *  smallest interval from `ladderSeconds` whose ANCHORED bucket count
   *  (epoch-floor buckets, the fixed_interval rounding) stays within
   *  `targetBuckets`, then bucket in one pass. The selection reads ONE
   *  metadata-sized min/max aggregate (two longs to the driver — the same
   *  bounded-collect contract as a query's term-stats lookup), so the
   *  data-driven choice costs a cheap pre-pass, not a corpus re-shuffle.
   *  Buckets are emitted as epoch-second starts (BIGINT), deliberately not
   *  timestamps: epoch arithmetic is timezone-free in both this engine and
   *  any SQL oracle. OpenSearch's auto_date_histogram rounds on a calendar
   *  ladder (minute/hour/day/month); the fixed-second ladder keeps the same
   *  contract — at most `target` buckets, interval chosen by the data —
   *  without calendar-vs-session-timezone ambiguity. */
  def autoDateHistogram(rows: DataFrame, tsCol: String, targetBuckets: Int,
                        ladderSeconds: Seq[Long] = Seq(60L, 300L, 1800L, 3600L,
                          10800L, 43200L, 86400L, 604800L, 2592000L)): DataFrame = {
    require(targetBuckets >= 1, s"target buckets must be >= 1, got $targetBuckets")
    require(ladderSeconds.nonEmpty && ladderSeconds == ladderSeconds.sorted,
      "interval ladder must be non-empty and ascending")
    val mm = rows.agg(
      min(unix_timestamp(col(tsCol))).as("lo"),
      max(unix_timestamp(col(tsCol))).as("hi")).head()
    if (mm.isNullAt(0)) {
      return rows.sparkSession.range(0).select(
        col("id").as("bucket_start"), col("id").as("n_events"),
        col("id").as("interval_s"))
    }
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val interval = ladderSeconds
      .find(iv => hi / iv - lo / iv + 1 <= targetBuckets)
      .getOrElse(ladderSeconds.last)
    rows
      .groupBy((floor(unix_timestamp(col(tsCol)) / interval) * interval)
        .cast("long").as("bucket_start"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("interval_s", lit(interval))
  }

  /** Walk the whole keyspace: repeatedly page with the last emitted key as
   *  the next cursor until a short page. Each iteration is one bounded job;
   *  only `size` rows per page reach the driver (this driver-side loop is
   *  the composite agg's intended client protocol, not a scale hazard).
   *  Returns the concatenated pages tagged with their page number. */
  def compositeWalk(rows: DataFrame, sources: Seq[CompositeSource], size: Int,
                    metrics: Seq[Column], maxPages: Int = 1000): DataFrame = {
    require(maxPages >= 1, "maxPages must be >= 1")
    val spark = rows.sparkSession
    var after: Option[Seq[Any]] = None
    var page = 0
    var out: DataFrame = null
    var done = false
    while (!done && page < maxPages) {
      val p = composite(rows, sources, size, metrics, after)
        .withColumn("page", lit(page))
      val collected = p.collect()
      if (collected.nonEmpty) {
        val local = spark.createDataFrame(
          spark.sparkContext.parallelize(collected.toIndexedSeq, 1), p.schema)
        out = if (out == null) local else out.unionByName(local)
        after = Some(sources.indices.map(i =>
          collected.last.get(collected.last.fieldIndex(sources(i).name))))
      }
      if (collected.length < size) done = true
      page += 1
    }
    if (out == null)
      composite(rows, sources, size, metrics).withColumn("page", lit(0)).limit(0)
    else out
  }

  /** The DISTRIBUTED terms aggregation with its documented accuracy
   *  contract — `shard_size` truncation + `doc_count_error_upper_bound`:
   *  each shard contributes only its local top `shardSize` keys (count
   *  desc, key asc), the coordinator sums what it received, and a key's
   *  error bound is the sum of the LAST (smallest returned) counts of
   *  every shard that did NOT return it — the maximum count that shard
   *  could have hidden. A shard that returned its whole keyspace
   *  contributes zero error. This is the 100 TB shape of `terms`: the
   *  per-shard keep bounds what crosses the wire, and the error bound is
   *  the price, reported per key exactly as the reference reports it.
   *  All stages are bucket-table-sized (keys × shards), never row-sized. */
  def termsSharded(rows: DataFrame, key: Column, shard: Column,
                   shardSize: Int, size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardSize >= size, "shard_size must be >= size")
    val counts = rows.groupBy(shard.as("_sh"), key.as("_k"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_sh")).orderBy(col("_c").desc, col("_k").asc)
    val kept = counts.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= shardSize)
    // a shard's hiding potential: its smallest RETURNED count — unless it
    // returned everything it had (fewer than shardSize keys), then zero
    val lasts = kept.groupBy(col("_sh"))
      .agg(min(col("_c")).as("_mn"), count(lit(1)).as("_n"))
      .select(col("_sh"),
        when(col("_n") === shardSize, col("_mn")).otherwise(0L).as("_last"))
    val perKey = kept.groupBy(col("_k")).agg(sum(col("_c")).as("doc_count"))
    val covered = kept.join(lasts, "_sh")
      .groupBy(col("_k")).agg(sum(col("_last")).as("_covered"))
    val total = lasts.agg(sum(col("_last")).as("_tot"))
    perKey.join(covered, "_k").crossJoin(broadcast(total))
      .select(col("_k").as("key"), col("doc_count"),
        (col("_tot") - col("_covered")).as("doc_count_error_upper_bound"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)
  }

  /** `boxplot` aggregation — the exact-interpolation form of the
   *  reference's TDigest boxplot: the 5-number summary plus the 1.5·IQR
   *  whiskers. Whiskers are the extreme OBSERVED values inside the fences
   *  (not the fences themselves), so they need the quartiles first: pass 1
   *  is one aggregate producing a broadcast-sized scalar row, pass 2 one
   *  conditional min/max over the same pruned scan — two bounded jobs, no
   *  global sort of the value column. */
  def boxplot(values: DataFrame, valueCol: String): DataFrame = {
    val v = values.select(col(valueCol).as("value"))
    val q = v.agg(
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      expr("percentile(value, 0.25)").as("pq1"),
      expr("percentile(value, 0.5)").as("pq2"),
      expr("percentile(value, 0.75)").as("pq3"))
    val iqr = col("pq3") - col("pq1")
    v.crossJoin(broadcast(q)).agg(
      first(col("mn")).as("min_v"),
      first(col("pq1")).as("q1"),
      first(col("pq2")).as("q2"),
      first(col("pq3")).as("q3"),
      first(col("mx")).as("max_v"),
      min(when(col("value") >= col("pq1") - lit(1.5) * iqr, col("value")))
        .as("lower_whisker"),
      max(when(col("value") <= col("pq3") + lit(1.5) * iqr, col("value")))
        .as("upper_whisker"))
  }

  /** `t_test` aggregation — Welch's unpaired two-sample t (the reference's
   *  heteroscedastic default) plus the homoscedastic pooled-variance t,
   *  both derived from RAW POWER SUMS (n, Σx, Σx²) of each arm accumulated
   *  in ONE conditional-aggregate pass — the single-pass shape that holds
   *  at any scale. Returns (n1, n2, t_welch, df_welch, t_pooled) unrounded;
   *  df_welch is Welch–Satterthwaite. */
  def tTest(rows: DataFrame, arm1: Column, arm2: Column,
            valueCol: String): DataFrame = {
    val vc = col(valueCol)
    // n counts only rows whose value is present — a doc missing the field
    // contributes to neither n nor Σx/Σx² (the reference ignores docs
    // missing the field; counting them would silently deflate mean/variance)
    def arm(p: String, c: Column) = Seq(
      sum(when(c && vc.isNotNull, 1L).otherwise(0L)).as(s"n$p"),
      sum(when(c, vc)).as(s"sx$p"),
      sum(when(c, vc * vc)).as(s"sxx$p"))
    val aggs = arm("1", arm1) ++ arm("2", arm2)
    val sums = rows.agg(aggs.head, aggs.tail: _*)
    def m(p: String) = col(s"sx$p") / col(s"n$p")
    def v(p: String) =
      (col(s"sxx$p") - col(s"sx$p") * col(s"sx$p") / col(s"n$p")) / (col(s"n$p") - 1)
    val (se1, se2) = (v("1") / col("n1"), v("2") / col("n2"))
    val tW = (m("1") - m("2")) / sqrt(se1 + se2)
    val dfW = pow(se1 + se2, 2) /
      (pow(se1, 2) / (col("n1") - 1) + pow(se2, 2) / (col("n2") - 1))
    val sp2 = ((col("n1") - 1) * v("1") + (col("n2") - 1) * v("2")) /
      (col("n1") + col("n2") - 2)
    val tH = (m("1") - m("2")) /
      sqrt(sp2 * (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
    // an arm with < 2 rows has no sample variance: fail loudly (the
    // reference rejects undersized arms) instead of emitting NaN
    val guarded = when(col("n1") < 2 || col("n2") < 2,
      raise_error(concat(lit("t_test requires >= 2 rows per arm, got "),
        col("n1").cast("string"), lit(" / "), col("n2").cast("string"))))
    sums.select(col("n1"), col("n2"),
      coalesce(guarded, tW).as("t_welch"),
      coalesce(guarded, dfW).as("df_welch"),
      coalesce(guarded, tH).as("t_pooled"))
  }
}
