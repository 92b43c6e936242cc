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
}
