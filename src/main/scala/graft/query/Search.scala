package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.hybrid.{Hybrid, HybridQuery}
import graft.index.Index

/**
 * The fetch phase: map the ranked top-k docIds back onto their stored fields
 * (reference: processor/NormalizationProcessorWorkflow.java:315-372 — fetched
 * SearchHits get their scores rewritten and returned with source payload).
 * The ranked side is <= k rows, so the payload join always broadcasts the
 * hits, never the corpus — the scan side prunes to the requested columns
 * (Catalyst column pruning reaches the parquet ReadSchema).
 */
object Search {

  /** BM25 search returning hits with payload columns, ordered. */
  def bm25(idx: Index, terms: Seq[String], k: Int, docs: DataFrame,
           payload: Seq[String]): DataFrame =
    fetch(Bm25.topK(idx, terms, k), docs, payload)

  /** Hybrid search returning hits with payload columns, ordered. */
  def hybrid(idx: Index, q: HybridQuery, docs: DataFrame,
             payload: Seq[String], filterDocs: Option[DataFrame] = None): DataFrame =
    fetch(Hybrid.execute(idx, q, filterDocs), docs, payload)

  /** Join ranked (doc_id, score) hits to their stored fields, keeping rank
   *  order. The hits side is broadcast (k <= 100-ish). */
  def fetch(hits: DataFrame, docs: DataFrame, payload: Seq[String]): DataFrame = {
    val cols = col("doc_id") +: col("score") +: payload.map(col)
    broadcast(hits)
      .join(docs.select((Seq("doc_id") ++ payload).map(col): _*), "doc_id")
      .select(cols: _*)
      .orderBy(col("score").desc, col("doc_id").asc)
  }
}
