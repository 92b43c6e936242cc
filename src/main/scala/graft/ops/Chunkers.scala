package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stats.EventStats

/**
 * Text chunkers, re-expressed as generated-column algebra (sequence +
 * transform + posexplode) instead of per-doc loops — fully codegen'd, no
 * UDFs, linear at corpus scale:
 *
 *  - fixed_char_length (reference: processor/chunker/FixedCharLengthChunker.java:84-120:
 *    char_limit, overlap_rate <= 0.5, next start = start + limit - overlap);
 *  - delimiter (reference: processor/chunker/DelimiterChunker.java:66-94:
 *    split, delimiter stays with the preceding chunk);
 *  - fixed_token_length (reference: processor/chunker/FixedTokenLengthChunker.java:119-156),
 *    with whitespace tokenization (our analyzer) instead of a Lucene analyzer.
 */
object Chunkers {

  /** fixed_char_length: chunks of `limit` chars, consecutive starts
   *  `limit - floor(limit*overlapRate)` apart. Emits (id, chunk_idx, chunk). */
  def fixedCharLength(docs: DataFrame, id: String, text: String,
                      limit: Int, overlapRate: Double = 0.0): DataFrame = {
    EventStats.increment("text_chunking_executions")
    EventStats.increment("text_chunking_fixed_char_length_executions")
    val step = limit - math.floor(limit * overlapRate).toInt
    require(step > 0, "overlap_rate too large")
    docs.select(
      col(id),
      posexplode(transform(
        sequence(lit(0), floor((length(col(text)) - 1) / step).cast("int")),
        i => substring(col(text), (i * step + 1).cast("int"), lit(limit))))
        .as(Seq("chunk_idx", "chunk")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
  }

  /** delimiter chunking: split on `delim`, delimiter kept with the PRECEDING
   *  chunk (DelimiterChunker.java:66-94). */
  def delimiter(docs: DataFrame, id: String, text: String, delim: String): DataFrame = {
    EventStats.increment("text_chunking_executions")
    EventStats.increment("text_chunking_delimiter_executions")
    val parts = split(col(text), java.util.regex.Pattern.quote(delim), -1)
    val n = size(parts)
    docs.select(
      col(id),
      posexplode(transform(parts, (p, i) =>
        when(i < n - 1, concat(p, lit(delim))).otherwise(p)))
        .as(Seq("chunk_idx", "chunk")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
  }

  /** fixed_token_length over whitespace tokens: windows of `tokenLimit`
   *  tokens, consecutive starts `tokenLimit - floor(tokenLimit*overlapRate)`
   *  apart, chunks re-joined with single spaces. */
  def fixedTokenLength(docs: DataFrame, id: String, text: String,
                       tokenLimit: Int, overlapRate: Double = 0.0): DataFrame = {
    EventStats.increment("text_chunking_executions")
    EventStats.increment("text_chunking_fixed_token_length_executions")
    val step = tokenLimit - math.floor(tokenLimit * overlapRate).toInt
    require(step > 0, "overlap_rate too large")
    val toks = TextOps.tokensCol(col(text))
    docs.select(
      col(id),
      posexplode(transform(
        sequence(lit(0), floor((size(toks) - 1) / step).cast("int")),
        i => array_join(slice(toks, (i * step + 1).cast("int"), lit(tokenLimit)), " ")))
        .as(Seq("chunk_idx", "chunk")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
  }
}
