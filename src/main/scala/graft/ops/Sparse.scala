package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.{Index, InvertedIndex}
import graft.stats.EventStats

/**
 * Sparse (token-weight) vector operators, the Spark re-expression of the
 * reference's neural-sparse pipeline pieces:
 *
 *  - mock encoder: a deterministic stand-in for ML sparse encoding
 *    (reference: processor/SparseEncodingProcessor.java:54-66 — inference is
 *    out of scope for a zero-egress engine, SURVEY.md §2.8);
 *  - prune strategies top_k / alpha_mass / max_ratio / abs_value
 *    (reference: util/prune/PruneUtils.java:34-201), expressed as window
 *    functions over the exploded (doc_id, token, w) form instead of per-map
 *    loops — the shape that scales;
 *  - byte quantization (reference: sparse/quantization/ByteQuantizer.java:67-77,
 *    Math.round == floor(x+0.5) for positives, ceilings 3.0 ingest / 16.0 search);
 *  - linear token-weight scoring (the FeatureField.newLinearQuery dot product,
 *    reference: query/NeuralSparseQueryBuilder.java:568-581);
 *  - two-phase search: phase 1 scores with the high-weight query tokens kept
 *    by max_ratio pruning, phase 2 rescores the expanded window with the full
 *    token set (reference: processor/NeuralSparseTwoPhaseProcessor.java:55-121).
 */
object Sparse {

  /** Deterministic mock sparse encoder: w(token) = tf * (1 + (len(token) mod 5)/4).
   *  Returns (doc_id, token, w). */
  def encode(idx: Index): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    idx.postings.flatMap { b =>
      val base = b.bucket << InvertedIndex.BucketBits
      val ids = graft.index.PostingCodec.decodeDeltas(b.docs, b.cnt)
      val tfs = graft.index.PostingCodec.decodeInts(b.tfs, b.cnt)
      ids.indices.map(i => (base + ids(i), b.term, tfs(i)))
    }.toDF("doc_id", "token", "tf")
      .withColumn("w", col("tf") * (lit(1.0) + (length(col("token")) % 5) * lit(0.25)))
      .drop("tf")
  }

  private def byWeight = Window.partitionBy(col("doc_id"))
    .orderBy(col("w").desc, col("token").asc)

  /** top_k prune: keep the k highest-weight tokens per doc (ties by token —
   *  the reference's heap order on equal weights is map-iteration-dependent,
   *  so we fix a deterministic total order). */
  def pruneTopK(tw: DataFrame, k: Int): DataFrame =
    tw.withColumn("rn", row_number().over(byWeight)).filter(col("rn") <= k).drop("rn")

  /** max_ratio prune: keep w >= ratio * max(w) per doc. */
  def pruneMaxRatio(tw: DataFrame, ratio: Double): DataFrame = {
    val mx = Window.partitionBy(col("doc_id"))
    tw.withColumn("mxw", max(col("w")).over(mx))
      .filter(col("w") >= lit(ratio) * col("mxw")).drop("mxw")
  }

  /** abs_value prune: keep w >= threshold. */
  def pruneAbsValue(tw: DataFrame, thresh: Double): DataFrame =
    tw.filter(col("w") >= thresh)

  /** alpha_mass prune: descending cumulative weight (inclusive) <= alpha * total. */
  def pruneAlphaMass(tw: DataFrame, alpha: Double): DataFrame = {
    val cum = byWeight.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("doc_id"))
    tw.withColumn("cw", sum(col("w")).over(cum))
      .withColumn("tw_", sum(col("w")).over(tot))
      .filter(col("cw") <= lit(alpha) * col("tw_"))
      .drop("cw", "tw_")
  }

  /** Byte quantization: floor(clamp(w,0,ceiling)*255/ceiling + 0.5)
   *  (Java Math.round semantics for non-negative inputs). */
  def quantize(w: Column, ceiling: Double): Column =
    floor(least(greatest(w, lit(0.0)), lit(ceiling)) * 255.0 / ceiling + 0.5).cast("long")

  /** FeatureField weight-in-term-freq trick: a positive float weight is
   *  stored as its top 16 IEEE bits in the term-frequency slot
   *  (reference: sparse/common/ValueEncoder.java:21-42). Lossy by design —
   *  decode(encode(v)) keeps the exponent + 8 mantissa bits. */
  def freqEncode(v: Float): Int = java.lang.Float.floatToIntBits(v) >>> 15
  def freqDecode(tf: Int): Float = java.lang.Float.intBitsToFloat(tf << 15)

  /** Query-side mock sparse encoding: the same deterministic stand-in as the
   *  doc-side [[encode]] (w = count x (1 + len%5/4)), applied to an analyzed
   *  query string. This is what the reference's `neural_sparse` clause does
   *  with `query_text` + `model_id` — run the sparse encoding model over the
   *  query text to get `query_tokens` (reference:
   *  query/NeuralSparseQueryBuilder.java:518-557); every mock "model"
   *  produces this same deterministic encoding under zero egress. */
  def encodeQueryTokens(tokens: Seq[String]): Map[String, Double] =
    tokens.groupBy(identity).map { case (t, occ) =>
      t -> occ.size * (1.0 + (t.length % 5) * 0.25)
    }

  /** Linear (dot-product) scoring of a token-weight query against encoded
   *  docs; OR semantics over tokens. Broadcast hash join on the tiny query
   *  side (SURVEY.md §2.3: query-token ∩ posting-term is always broadcast). */
  def linearScore(tw: DataFrame, query: Map[String, Double]): DataFrame = {
    val spark = tw.sparkSession
    import spark.implicits._
    val q = query.toSeq.toDF("token", "qw")
    tw.join(broadcast(q), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("qw")).as("score"))
  }

  def linearTopK(tw: DataFrame, query: Map[String, Double], k: Int): DataFrame =
    linearScore(tw, query).orderBy(col("score").desc, col("doc_id").asc).limit(k)

  /**
   * Two-phase neural-sparse search. Phase 1 scores with only the query tokens
   * whose weight >= maxRatio * max query weight; phase 2 rescores the top
   * (expansion * k) window with the full query. Defaults mirror the
   * reference: maxRatio 0.4, expansion >= 1.0.
   */
  def twoPhaseTopK(tw: DataFrame, query: Map[String, Double], k: Int,
                   maxRatio: Double = 0.4, expansion: Double = 2.0): DataFrame = {
    EventStats.increment("neural_sparse_two_phase_executions")
    val wmax = query.values.max
    val phase1Query = query.filter { case (_, w) => w >= maxRatio * wmax }
    val window = (expansion * k).toInt
    val candidates = linearTopK(tw, phase1Query, window).select("doc_id")
    linearScore(tw, query)
      .join(broadcast(candidates), Seq("doc_id"), "left_semi")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
