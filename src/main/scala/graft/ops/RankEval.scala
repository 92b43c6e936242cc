package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `_rank_eval` API: given ranked results and relevance judgments,
 *  compute the standard search-quality metrics per query plus the overall
 *  mean — precision@k, recall@k, MRR, NDCG@k (reference contract: the
 *  rank-eval endpoint's precision/recall/mean_reciprocal_rank/dcg metrics
 *  over caller-supplied rated documents).
 *
 *  Conventions matched to the reference: precision divides by the RETRIEVED
 *  count (<= k when a query matches fewer docs); a document is relevant
 *  when its grade is > 0; DCG uses the exponential gain (2^grade - 1) /
 *  log2(rank + 1) and NDCG normalizes by the ideal DCG of the query's best
 *  k judgments; MRR is 1 / first relevant rank, 0 when nothing relevant was
 *  retrieved.
 *
 *  Scale shape: one join of the (query x k)-bounded result set against the
 *  judgments, one aggregation per side, and a per-query window ONLY over
 *  each query's judgment list (bounded by the ratings file, never the
 *  corpus) for the ideal DCG. */
object RankEval {

  /** @param topk      (query_id, doc_id, rank) — rank 1-based, <= k rows/query
   *  @param judgments (query_id, doc_id, grade) — positive grades only is fine
   *  @param maxRelevance ERR's grade ceiling (the expected_reciprocal_rank
   *                      metric's maximum_relevance parameter)
   *  @return per-query metrics + an overall mean row with query_id = -1 */
  def evaluate(topk: DataFrame, judgments: DataFrame, k: Int,
               maxRelevance: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRelevance >= 1, s"maximum_relevance must be >= 1, got $maxRelevance")
    val j = judgments.select(col("query_id"), col("doc_id"),
      col("grade").cast("double").as("grade"))

    val joined = topk
      .join(j, Seq("query_id", "doc_id"), "left")
      .na.fill(0.0, Seq("grade"))
    val perQuery = joined.groupBy("query_id").agg(
      count(lit(1)).as("retrieved"),
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("rel_retrieved"),
      min(when(col("grade") > 0, col("rank"))).as("first_rel"),
      sum((pow(lit(2.0), col("grade")) - lit(1.0))
        / log2(col("rank") + lit(1.0))).as("dcg"),
      sort_array(collect_list(struct(col("rank"), col("grade")))).as("_rl"))

    // ideal DCG: each query's judgments sorted grade desc (doc_id asc
    // tie-break), best k positions — window bounded by the ratings file
    val w = Window.partitionBy("query_id")
      .orderBy(col("grade").desc, col("doc_id").asc)
    val idcg = j.where(col("grade") > 0)
      .withColumn("irank", row_number().over(w))
      .where(col("irank") <= k)
      .groupBy("query_id")
      .agg(sum((pow(lit(2.0), col("grade")) - lit(1.0))
        / log2(col("irank") + lit(1.0))).as("idcg"),
        count(lit(1)).as("_k_rel"))
    val nRel = j.where(col("grade") > 0)
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))

    val metrics = perQuery
      .join(idcg, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .select(
        col("query_id"),
        (col("rel_retrieved") / col("retrieved")).as("precision_k"),
        when(col("n_rel").isNull, 0.0)
          .otherwise(col("rel_retrieved") / col("n_rel")).as("recall_k"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rel")).as("mrr"),
        when(col("idcg").isNull || col("idcg") === 0.0, 0.0)
          .otherwise(col("dcg") / col("idcg")).as("ndcg_k"),
        // ERR (Chapelle et al. 2009): a sequential cascade over the ranked
        // list — R_i = (2^g - 1)/2^gmax, err += trust * R_i / i,
        // trust *= (1 - R_i). The fold runs over the k-bounded per-query
        // list (an aggregate HOF, codegen'd), never a corpus scan.
        aggregate(col("_rl"),
          struct(lit(0.0).as("err"), lit(1.0).as("p")),
          (acc, x) => {
            val r = (pow(lit(2.0), x("grade")) - lit(1.0)) /
              pow(lit(2.0), lit(maxRelevance.toDouble))
            struct(
              (acc("err") + acc("p") * r / x("rank")).as("err"),
              (acc("p") * (lit(1.0) - r)).as("p"))
          })("err").as("err_k"))

    val mean = metrics.agg(
      lit(-1L).as("query_id"),
      avg(col("precision_k")).as("precision_k"),
      avg(col("recall_k")).as("recall_k"),
      avg(col("mrr")).as("mrr"),
      avg(col("ndcg_k")).as("ndcg_k"),
      avg(col("err_k")).as("err_k"))
    metrics.unionByName(mean)
  }
}
