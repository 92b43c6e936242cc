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
}
