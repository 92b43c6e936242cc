package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.stats.EventStats

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
    EventStats.increment("rerank_by_field_executions")
    val withPrev =
      if (keepPrevious) hits.withColumn("previous_score", col("score"))
      else hits
    val rescored = withPrev.withColumn("score", col(targetField).cast("double"))
    val cleaned = if (removeTarget && targetField != "score") rescored.drop(targetField) else rescored
    cleaned.orderBy(col("score").desc, col("doc_id").asc)
  }

  /**
   * Rescoring rerank: the top window is re-scored by a second scorer and
   * re-sorted (reference: processor/rerank/RescoringRerankProcessor.java /
   * MLOpenSearchRerankProcessor — similarity inference over the collected
   * (query, doc) pairs replaces each hit's score; here the second scorer is
   * any DataFrame of (doc_id, score), e.g. dense cosine against the query
   * embedding as the deterministic stand-in for the cross-encoder call).
   * Only the hits window (<= depth rows) is rescored — the second scorer's
   * output joins against a broadcast of the tiny hit set, never the corpus.
   *
   * @param hits      candidate window: (doc_id, score, ...)
   * @param newScores second scorer output: (doc_id, score)
   * @param k         final page size
   * @return (doc_id, score, previous_score), re-sorted; hits the second
   *         scorer does not cover keep score 0.0 (sorted to the tail).
   */
  /** The core search `rescore` (Lucene QueryRescorer, distinct from the
   *  rerank processors): only the top `windowSize` primary hits are
   *  re-scored by the secondary query, combined per `scoreMode` with
   *  query_weight / rescore_query_weight; a window doc the secondary does
   *  NOT match keeps `queryWeight * primary` (Lucene's combine(first,
   *  false, _)); hits beyond the window keep their original score AND
   *  their original order below the re-sorted window. Everything operates
   *  on the bounded hits window (<= the caller's depth) — the corpus is
   *  never touched; the secondary side joins only window-sized ids.
   *
   *  @param hits      (doc_id, score) — primary ranking, bounded
   *  @param secondary (doc_id, score) — the rescore query's scores
   *  @return (doc_id, score) — final ranking, top `k` */
  def queryRescore(hits: DataFrame, secondary: DataFrame, windowSize: Int,
                   k: Int, queryWeight: Double = 1.0,
                   rescoreQueryWeight: Double = 1.0,
                   scoreMode: String = "total"): DataFrame = {
    require(windowSize > 0, s"window_size must be > 0, got $windowSize")
    require(k > 0, s"k must be > 0, got $k")
    val Modes = Set("total", "multiply", "avg", "max", "min")
    require(Modes.contains(scoreMode),
      s"score_mode must be one of ${Modes.mkString("/")}, got [$scoreMode]")
    val ranked = hits
      .withColumn("_rr_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
    val win = ranked.where(col("_rr_rank") <= windowSize)
    val sec = secondary.select(col("doc_id"), col("score").as("_rr_sec"))
    val p = col("score") * queryWeight
    val s = col("_rr_sec") * rescoreQueryWeight
    val combined = scoreMode match {
      case "total"    => p + s
      case "multiply" => p * s
      case "avg"      => (p + s) / 2
      case "max"      => greatest(p, s)
      case "min"      => least(p, s)
    }
    val rescored = win.join(broadcast(sec), Seq("doc_id"), "left")
      .withColumn("_rr_comb", when(col("_rr_sec").isNotNull, combined).otherwise(p))
      // the window re-sorts among itself; sort bucket 0 keeps it above the
      // untouched tail whatever the combined values are
      .select(col("doc_id"), col("_rr_comb").as("score"), lit(0).as("_rr_grp"),
        col("_rr_comb").as("_rr_key"), col("doc_id").as("_rr_tie"))
    val tail = ranked.where(col("_rr_rank") > windowSize)
      .select(col("doc_id"), col("score"), lit(1).as("_rr_grp"),
        (-col("_rr_rank")).cast("double").as("_rr_key"),
        col("doc_id").as("_rr_tie"))
    rescored.unionByName(tail)
      .orderBy(col("_rr_grp").asc, col("_rr_key").desc, col("_rr_tie").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  def rescore(hits: DataFrame, newScores: DataFrame, k: Int): DataFrame = {
    EventStats.increment("rerank_ml_executions")
    val prev = hits.select(col("doc_id"), col("score").as("previous_score"))
    prev.join(newScores.select(col("doc_id"), col("score")), Seq("doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"), col("previous_score"))
  }

  /**
   * Maximal Marginal Relevance rerank over a bounded candidate window
   * (reference: processor/mmr/MMRNeuralQueryTransformer.java:1-195 — MMR
   * diversity reranking runs on the coordinator over the collected top
   * candidates, never the corpus).
   *
   * Greedy selection: first pick = highest relevance; each next pick
   * maximizes  lambda * rel(d) - (1 - lambda) * max_{s in selected} cos(d, s),
   * ties broken by doc_id. The candidate set is the caller's top window
   * (<= pagination depth), so the driver-side loop is O(k * |window|) over a
   * bounded collect — the same coordinator-side shape as the reference, not a
   * distributed scan.
   *
   * @param hits candidates: (doc_id, score) — the relevance scores
   * @param emb  embedding source: (doc_id, vec: array<float>)
   * @return (doc_id, rank, mmr) in selection order, rank 1..k
   */
  def mmr(hits: DataFrame, emb: DataFrame, lambda: Double, k: Int): DataFrame = {
    EventStats.increment("mmr_neural_query_transformer_executions")
    val spark = hits.sparkSession
    import spark.implicits._
    val cand: Array[(Long, Double, Array[Float])] = hits
      .join(emb, "doc_id")
      .select(col("doc_id").cast("long"), col("score").cast("double"), col("vec"))
      .as[(Long, Double, Array[Float])]
      .collect()
      .sortBy(_._1)

    // left-to-right double accumulation, matching Ann.cosine / DuckDB
    // list_dot_product over CAST(... AS DOUBLE[]) exactly
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(cand.map(c => c._1 -> c): _*)
    val maxSim = scala.collection.mutable.HashMap.empty[Long, Double] // max cos to selected
    while (selected.length < k && remaining.nonEmpty) {
      val best = remaining.values.maxBy { case (id, rel, _) =>
        val m = if (selected.isEmpty) 0.0 else maxSim(id)
        val score = if (selected.isEmpty) rel else lambda * rel - (1 - lambda) * m
        (score, -id) // ties -> smallest doc_id
      }
      val mmrScore =
        if (selected.isEmpty) best._2
        else lambda * best._2 - (1 - lambda) * maxSim(best._1)
      selected += ((best._1, selected.length + 1, mmrScore))
      remaining.remove(best._1)
      remaining.values.foreach { case (id, _, v) =>
        val c = cos(v, best._3)
        if (!maxSim.contains(id) || c > maxSim(id)) maxSim(id) = c
      }
    }
    selected.toSeq.toDF("doc_id", "rank", "mmr")
  }
}
