package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incoming doc, keyed for dedup by its content hash. */
case class DedupDoc(doc_id: Long, sha: String)

/** Per-doc dedup verdict: the canonical (first-seen) doc for its content and
 *  whether this doc is a duplicate of it. */
case class DedupOut(doc_id: Long, kept_doc_id: Long, is_dup: Boolean)

/**
 * Streaming exact deduplication with CUSTOM STATE — the "dedup documents as
 * they arrive" step of a continuously-fed training-data pipeline (the batch
 * analogue is [[graft.ops.Dedup.exactSummary]]; the reference's ingest
 * pipeline is batch-async per request, reference:
 * processor/InferenceProcessor.java:63-66, so the streaming form is the
 * design slot SURVEY.md §2.9 reserves).
 *
 * First-wins semantics: the stream groups by sha256(text) through
 * `flatMapGroupsWithState`, whose per-hash state is a single Long — the
 * doc_id that first claimed this content. Docs in LATER micro-batches that
 * collide with an earlier winner are flagged `is_dup` with the winner's id;
 * within one micro-batch (where "arrival order" is shuffle order, not a
 * stable fact) the smallest doc_id wins, making the result deterministic.
 * Under a single drained replay (the correctness gate) this equals the batch
 * rule "keep min(doc_id) per content"; across real micro-batches it is
 * exactly Bloom-filter-style streaming dedup, but exact.
 *
 * Scale: state is ONE Long per distinct content hash — the minimal streaming
 * dedup state — sharded by the hash across executors by the
 * groupByKey shuffle; at 10^10+ docs back the state store with RocksDB
 * (spark.sql.streaming.stateStore.providerClass) so per-executor state
 * spills to disk. Everything before the state op is a map-side projection
 * (doc_id, sha256), so the shuffle carries ~48 bytes per doc, not the text.
 */
object StreamingDedup {

  /** Apply first-wins exact dedup to a STREAMING DataFrame with `idCol` and
   *  `textCol`. Returns the streaming Dataset of per-doc verdicts; attach
   *  your own sink (Update mode — a doc's verdict emits once, in the batch
   *  it arrives). */
  def firstWins(stream: DataFrame, idCol: String, textCol: String): Dataset[DedupOut] = {
    val spark = stream.sparkSession
    import spark.implicits._

    def handle(sha: String, it: Iterator[DedupDoc],
               state: GroupState[Long]): Iterator[DedupOut] = {
      val docs = it.toArray.sortBy(_.doc_id)
      // FIRST-wins: an existing winner stays even if a smaller doc_id
      // arrives later (its verdict already emitted in an earlier batch and
      // must not be retroactively demoted); only a brand-new content hash
      // crowns the batch's smallest doc_id.
      val keep = state.getOption.getOrElse(docs.head.doc_id)
      state.update(keep)
      docs.iterator.map(d => DedupOut(d.doc_id, keep, d.doc_id != keep))
    }

    stream
      .select(col(idCol).cast("long").as("doc_id"), sha2(col(textCol), 256).as("sha"))
      .as[DedupDoc]
      .groupByKey(_.sha)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(handle)
  }
}
