package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Semantic-field ingest: the composed pipeline the reference's `semantic`
 * mapper drives — chunk the raw text, run sparse encoding per chunk, store
 * the derived token-weight sub-field next to the raw field
 * (reference: mapper/SemanticFieldMapper.java:54,136-147 chunking config +
 * auto-generated embedding sub-field; processor/TextChunkingProcessor.java:50;
 * processor/SparseEncodingProcessor.java:98-136). ML inference is replaced by
 * the deterministic mock encoder (SURVEY.md §2.8: w = tf x (1 + len%5/4)) so
 * the pipeline stays oracle-checkable in a zero-egress engine.
 *
 * Entirely relational: chunker posexplode -> token explode -> one
 * (doc, chunk, token) hash aggregate; no UDFs in the hot path.
 */
object Semantic {

  /** @return (doc_id, chunk_idx, token, w) — the exploded token-weight
   *  sub-field rows for every chunk. */
  def ingestSparse(docs: DataFrame, idCol: String, textCol: String, tokenLimit: Int): DataFrame = {
    val chunks = Chunkers.fixedTokenLength(docs, idCol, textCol, tokenLimit, 0.0)
    chunks
      .select(col(idCol), col("chunk_idx"),
        explode(TextOps.tokensCol(col("chunk"))).as("token"))
      .groupBy(col(idCol), col("chunk_idx"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w", col("tf") * (lit(1.0) + (length(col("token")) % 5) * lit(0.25)))
      .drop("tf")
  }
}
