package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rerank processors (reference: processor/rerank/).
 *
 * `byField` replaces each hit's `_score` with a numeric value found at a
 * target field path, optionally retaining the previous score, then re-sorts
 * (reference: processor/rerank/ByFieldRerankProcessor.java:72-154). ML-model
 * rerankers are interface-stubbed per SURVEY.md §2.8 (zero-egress engine).
 */
object Rerank {

  /**
   * @param hits DataFrame with `score` plus the target column
   * @param targetField column whose numeric value becomes the new score
   * @param keepPrevious retain the old score as `previous_score`
   * @param removeTarget drop the target column from the output
   */
  def byField(
      hits: DataFrame,
      targetField: String,
      keepPrevious: Boolean = false,
      removeTarget: Boolean = true
  ): DataFrame = {
    val withPrev =
      if (keepPrevious) hits.withColumn("previous_score", col("score"))
      else hits
    val rescored = withPrev.withColumn("score", col(targetField).cast("double"))
    val cleaned = if (removeTarget && targetField != "score") rescored.drop(targetField) else rescored
    cleaned.orderBy(col("score").desc, col("doc_id").asc)
  }
}
