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
}
