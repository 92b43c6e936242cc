package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
