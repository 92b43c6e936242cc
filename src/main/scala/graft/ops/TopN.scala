package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Bounded top-n per group WITHOUT a single-partition-per-group sort.
 *
 * `Window.partitionBy(grp)` ships every row of a group to one task — a hot
 * partition when one group holds a corpus-sized share of the rows (the head
 * token of a postings prune, a low-cardinality collapse field). The fix is
 * the same two-level shape as the bucketed inverted-index build: rank within
 * (group, salt) first — groups are split `saltBuckets` ways, so stage 1
 * partitions are 1/saltBuckets of the group — then rank the survivors
 * (<= n x saltBuckets rows per group) within the group. The true top-n of a
 * group always survives stage 1: restricting to a subset can only improve a
 * row's rank.
 */
object TopN {

  /**
   * Keep the top `n` rows of each group under `order`.
   *
   * @param grpCols grouping columns
   * @param saltOn  a column spreading rows of one group across salt buckets
   *                (any per-row id; hashed, not interpreted)
   * @param order   total order, best first (include a unique tie-breaker)
   */
  def perGroup(df: DataFrame, grpCols: Seq[String], saltOn: String, n: Int,
               order: Seq[Column], saltBuckets: Int = 64): DataFrame =
    perGroupRanked(df, grpCols, saltOn, n, order, "_tn_rank", saltBuckets)
      .drop("_tn_rank")

  /** Same bounded two-level top-n, but the survivor's within-group rank
   *  (1-based, under `order`) is kept as `rankCol` — for callers that need
   *  the collection rank anyway (RRF) and would otherwise pay a third
   *  window for it. */
  def perGroupRanked(df: DataFrame, grpCols: Seq[String], saltOn: String,
                     n: Int, order: Seq[Column], rankCol: String,
                     saltBuckets: Int = 64): DataFrame = {
    require(n > 0 && saltBuckets >= 1)
    val w2 = Window.partitionBy(grpCols.map(col): _*).orderBy(order: _*)
    val pre =
      if (saltBuckets == 1) df
      else {
        val w1 = Window
          .partitionBy(grpCols.map(col) :+ col("_tn_salt"): _*)
          .orderBy(order: _*)
        df.withColumn("_tn_salt", pmod(hash(col(saltOn)), lit(saltBuckets)))
          .withColumn("_tn_rn", row_number().over(w1))
          .filter(col("_tn_rn") <= n)
          .drop("_tn_rn", "_tn_salt")
      }
    pre.withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= n)
  }

  /** Field collapse with `inner_hits` — OpenSearch's collapse + expand
   *  phase, set-based. The winners are the best doc per group ranked by
   *  (score desc, doc_id); each of the top-`k` winner GROUPS also returns
   *  its top `innerN` members with their in-group rank — what the expand
   *  phase fetches with one follow-up query per hit, collapsed here into
   *  the SAME bounded salted top-n pass that picked the winners (rank once
   *  to max(innerN, 1), split winners from inner hits by rank): one shuffle
   *  on the group key, then a k-row broadcast semi-join — no per-group
   *  round trips at any corpus size.
   *
   *  @param scored (doc_id, score) — the query's scored matched set
   *  @param groups (doc_id, `groupCol`) — the collapse field values
   *  @return (groupCol, rank_in_group, doc_id, score) rows for the top-k
   *          winner groups, rank_in_group <= innerN, winners rank 1 */
  def collapseInnerHits(scored: DataFrame, groups: DataFrame, groupCol: String,
                        k: Int, innerN: Int): DataFrame = {
    require(k >= 1, s"size must be >= 1, got $k")
    require(innerN >= 1, s"inner_hits size must be >= 1, got $innerN")
    val ranked = perGroupRanked(
      scored.join(groups, "doc_id"), Seq(groupCol), "doc_id",
      innerN, Seq(col("score").desc, col("doc_id").asc), "rank_in_group")
    val winnerGroups = ranked.filter(col("rank_in_group") === 1)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .select(col(groupCol))
    ranked.join(broadcast(winnerGroups), groupCol)
      .select(col(groupCol), col("rank_in_group"), col("doc_id"), col("score"))
  }
}
