package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines: the mixture-shaping
 * step between dedup/quality-filter and packing (per-language / per-domain
 * rates and quotas are how a 100 TB corpus becomes a curated training mix).
 *
 * Everything is content-addressed off `md5(id)` — NO rand():
 *  - reruns pick the SAME sample (resumable pipelines, reproducible mixes);
 *  - the decision is row-local, so rate sampling is a map-only codegen'd
 *    filter with zero shuffle, trivially parallel at any scale;
 *  - an independent engine (the DuckDB oracle) reproduces the exact sample
 *    from the same public hash.
 *
 * The keep rule compares the first 8 hex chars of md5(id) — lowercase hex,
 * so LEXICOGRAPHIC order IS numeric order — against the rate's 8-hex-char
 * threshold: keep iff md5_prefix < hex(floor(rate * 2^32)).
 */
object Sample {

  /** First 32 hash bits of the id as an 8-hex-char string (the sampling
   *  coordinate: uniform on [0, 2^32), deterministic, engine-portable). */
  def hashKey(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** The rate's threshold as 8 lowercase hex chars (driver-side constant). */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.floor(rate * 4294967296.0).toLong.min(0xffffffffL)}%08x"
  }

  /** Deterministic Bernoulli(rate) sample: map-only filter, zero shuffle. */
  def fraction(df: DataFrame, id: String, rate: Double): DataFrame =
    df.where(hashKey(col(id)) < lit(rateThreshold(rate)))

  /**
   * Stratified rates: each stratum keeps its own fraction (e.g. en 0.1,
   * everything else 1.0 — the up/down-weighting of a training mixture).
   * Still map-only: the per-stratum threshold is a CASE over metadata-sized
   * driver constants. Strata absent from `rates` keep `defaultRate`.
   */
  def stratified(df: DataFrame, id: String, stratum: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.foldLeft(lit(rateThreshold(defaultRate))) { case (acc, (s, r)) =>
      when(col(stratum) === s, lit(rateThreshold(r))).otherwise(acc)
    }
    df.where(hashKey(col(id)) < thr)
  }

  /**
   * Exact per-stratum quota: the `n` rows of each stratum with the smallest
   * hash keys (hash order = a deterministic uniform shuffle, so this is
   * "sample exactly n without replacement" — reproducible across runs and
   * engines). Uses the salted two-level top-n, so a stratum holding half
   * the corpus never lands on one reducer.
   */
  def quota(df: DataFrame, id: String, stratum: String, n: Int): DataFrame =
    TopN.perGroup(df, Seq(stratum), id, n,
      Seq(hashKey(col(id)).asc, col(id).asc))

  /**
   * Temperature-based mixture sampling — the domain/language re-balancing
   * rule LLM training mixtures use: stratum `s` gets a share proportional
   * to `n_s^alpha` (alpha = 1 keeps the natural distribution, alpha -> 0
   * flattens it toward uniform). `target` rows are apportioned across
   * strata by the LARGEST-REMAINDER method over the `n_s^alpha` weights
   * (exact integer quotas, deterministic remainder tie-break by stratum
   * name, each quota capped at the stratum's size with capacity-aware
   * redistribution), then each stratum's quota is drawn by hash order —
   * the same content-addressed "exactly n without replacement" draw
   * [[quota]] uses.
   *
   * Scale shape: the per-stratum counts are ONE aggregate whose result is
   * dimension-sized by construction (one row per stratum) — that tiny
   * table is the only thing the driver touches; selection is one salted
   * two-level top-n with the quota map joined back as a broadcast literal.
   */
  def temperature(df: DataFrame, id: String, stratum: String,
                  alpha: Double, target: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(target >= 1, s"target must be >= 1, got $target")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
      .sortBy(_._1.toString)
    require(counts.nonEmpty, "temperature sampling over an empty input")
    val weights = counts.map { case (k, n) => (k, math.pow(n.toDouble, alpha), n) }
    val wSum = weights.map(_._2).sum
    val raw = weights.map { case (k, w, n) => (k, target * w / wSum, n) }
    val quotas = scala.collection.mutable.LinkedHashMap(
      raw.map { case (k, r, n) => k -> math.min(math.floor(r).toLong, n) }: _*)
    var left = target - quotas.values.sum
    // largest remainder first (stratum-name tie-break); repeat rounds so a
    // capped stratum's surplus flows to the next-largest remainders
    val order = raw.sortBy { case (k, r, _) => (-(r - math.floor(r)), k.toString) }
    val cap = counts.toMap
    var progressed = true
    while (left > 0 && progressed) {
      progressed = false
      order.foreach { case (k, _, _) =>
        if (left > 0 && quotas(k) < cap(k)) {
          quotas(k) += 1; left -= 1; progressed = true
        }
      }
    }
    val quotaDf = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(
        quotas.toSeq.map { case (k, q) => org.apache.spark.sql.Row(k, q) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_t_stratum",
          df.schema(stratum).dataType),
        org.apache.spark.sql.types.StructField("_t_quota",
          org.apache.spark.sql.types.LongType))))
    val maxQ = quotas.values.max.toInt
    if (maxQ == 0) return df.limit(0)
    TopN.perGroupRanked(df, Seq(stratum), id, maxQ,
        Seq(hashKey(col(id)).asc, col(id).asc), "_t_rank")
      .join(broadcast(quotaDf), col(stratum) === col("_t_stratum"))
      .where(col("_t_rank") <= col("_t_quota"))
      .drop("_t_rank", "_t_stratum", "_t_quota")
  }
}
