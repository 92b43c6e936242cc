package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stats.EventStats

/**
 * Multimodal-column plumbing: opaque `binary` payload columns with typed
 * metadata, processed by a batched per-partition featurizer.
 *
 * The decode step is a STUB (builder brief: image/audio libs are not in this
 * container) — `stubFeaturize` stands in for a real decoder and extracts
 * deterministic byte-level features, so the Spark-side plumbing (binary
 * schema, partition batching, featurizer signature, output schema) is real
 * and tested while the media decoding is swappable.
 */
object Multimodal {

  case class Payload(id: Long, payload: Array[Byte])
  case class Feature(doc_id: Long, n_bytes: Long, first_byte: Long, last_byte: Long)

  /** Attach a binary payload column (here: utf-8 bytes of a text column,
   *  standing in for image/audio bytes). */
  def withPayload(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).cast("long").as("id"),
      encode(col(text), "UTF-8").as("payload"))

  /** The stub decoder: a real per-partition batch featurizer with a fake
   *  feature extractor (byte-level stats). A real implementation swaps the
   *  body for image decode / resize / frame-sample. */
  def stubFeaturize(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[Payload].mapPartitions { it =>
      it.map { p =>
        val b = p.payload
        Feature(p.id, b.length.toLong,
          if (b.nonEmpty) (b(0) & 0xff).toLong else -1L,
          if (b.nonEmpty) (b(b.length - 1) & 0xff).toLong else -1L)
      }
    }.toDF()
  }

  def features(docs: DataFrame, id: String, text: String): DataFrame =
    stubFeaturize(withPayload(docs, id, text))

  /**
   * Uniform frame sampling over an opaque media payload — the frame-sample
   * member of the decode / feature-extract / resize / frame-sample family.
   * A real decoder derives frame geometry from the container; the stub
   * models the stream as fixed-size frames of `frameBytes` and features a
   * sampled frame by its leading byte. What is REAL and load-bearing at
   * scale: the sampling is pure column algebra (sequence + explode, no UDF,
   * no driver loop), the per-doc output is bounded at k rows regardless of
   * payload size, and the selected offsets are computed WITHOUT
   * materializing unsampled frames — the property that makes uniform-k
   * sampling affordable over hours-long videos.
   *
   * Indices: n_frames = floor(n_bytes / frameBytes); stride =
   * max(1, floor(n_frames / k)); sampled frame ids are i*stride for
   * i < min(k, n_frames) — the standard uniform-k sampler.
   *
   * @return (doc_id, frame_idx, offset, lead_byte) — one row per sampled
   *         frame; lead_byte is the stub per-frame feature.
   */
  def frameSample(docs: DataFrame, id: String, text: String,
                  k: Int = 4, frameBytes: Int = 16): DataFrame = {
    val p = withPayload(docs, id, text)
    p.select(col("id").as("doc_id"), col("payload"),
        floor(length(col("payload")) / frameBytes).cast("long").as("n_frames"))
      .where(col("n_frames") > 0)
      .withColumn("stride",
        greatest(lit(1L), floor(col("n_frames") / k).cast("long")))
      .select(col("doc_id"), col("payload"), col("stride"),
        explode(sequence(lit(0L),
          least(lit(k.toLong), col("n_frames")) - 1)).as("i"))
      .withColumn("frame_idx", col("i") * col("stride"))
      .withColumn("offset", col("frame_idx") * frameBytes)
      .select(col("doc_id"), col("frame_idx"), col("offset"),
        conv(hex(col("payload").substr(
          (col("offset") + 1).cast("int"), lit(1))), 16, 10)
          .cast("long").as("lead_byte"))
  }

  /**
   * Combined text+image embedding — the reference's text_image_embedding
   * processor fuses a text field and an image field into ONE vector through
   * multimodal inference (reference: processor/TextImageEmbeddingProcessor
   * .java); the deterministic stand-in concatenates the feature-hashing text
   * projection (dims 0..dims-1, the same w = tf x (1 + len%5/4) trick as the
   * semantic dense sub-field) with the payload's byte-level stub features
   * (dims dims..dims+2: n_bytes, first_byte, last_byte). Exploded sparse
   * rows (doc_id, dim, v) — only occupied dimensions materialize.
   */
  def textImageEmbed(docs: DataFrame, id: String, text: String, dims: Int = 8): DataFrame = {
    EventStats.increment("text_image_embedding_executions")
    val textPart = docs
      .select(col(id).cast("long").as("doc_id"),
        explode(TextOps.tokensCol(col(text))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("w", col("tf") * (lit(1.0) + (length(col("token")) % 5) * lit(0.25)))
      .withColumn("dim",
        ((length(col("token")) * 31 + ascii(substring(col("token"), 1, 1))) % dims).cast("long"))
      .groupBy(col("doc_id"), col("dim")).agg(sum(col("w")).as("v"))
    val imgPart = stubFeaturize(withPayload(docs, id, text))
      .select(col("doc_id"), posexplode(array(
        col("n_bytes").cast("double"),
        col("first_byte").cast("double"),
        col("last_byte").cast("double"))))
      .select(col("doc_id"), (col("pos") + dims).cast("long").as("dim"), col("col").as("v"))
    textPart.unionByName(imgPart)
  }
}
