package graft

import org.apache.spark.sql.functions._
import graft.index.{Deletes, InvertedIndex, PostingCodec}
import graft.query.Bm25

/** Delete / update lifecycle (Lucene liveDocs semantics): stale-stats search
 *  under tombstones, merge-time purge, update = delete + add. */
class DeletesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val idx = InvertedIndex.build(docs, "doc_id", "text")

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))

  test("withDeletes drops tombstoned docs from hits but keeps their scores stale") {
    val dead = docs.where(col("doc_id") % 5 === 1).select("doc_id")
    val deadSet = dead.collect().map(_.getLong(0)).toSet

    val full = hits(Bm25.scoreTerms(idx, Seq("merge", "sort"))
      .orderBy(col("score").desc, col("doc_id")))
    val live = hits(Bm25.scoreTerms(Deletes.withDeletes(idx, dead, "doc_id"),
      Seq("merge", "sort")).orderBy(col("score").desc, col("doc_id")))

    // exactly the full result minus tombstoned ids — same scores, i.e. the
    // statistics stayed pre-delete (Lucene's docFreq-includes-deleted rule)
    assert(live == full.filterNot(h => deadSet.contains(h._1)))
    assert(full.exists(h => deadSet.contains(h._1))) // the filter was not vacuous
  }

  test("withDeletes keeps WAND exact (bounds valid over masked doc lengths)") {
    val dead = docs.where(col("doc_id") % 5 === 1).select("doc_id")
    val live = Deletes.withDeletes(idx, dead, "doc_id")
    val plain = hits(Bm25.topK(live, Seq("hash", "join"), 25))
    val wand = hits(Bm25.topKWand(live, Seq("hash", "join"), 25))
    assert(wand == plain)
  }

  test("compact equals a fresh build over the live corpus") {
    val dead = docs.where(col("doc_id") % 5 === 1).select("doc_id")
    val compacted = Deletes.compact(idx, dead, "doc_id")
    val fresh = InvertedIndex.build(docs.where(col("doc_id") % 5 =!= 1), "doc_id", "text")

    assert(compacted.stats == fresh.stats)
    val cStats = compacted.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    val fStats = fresh.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    assert(cStats == fStats)
    assert(hits(Bm25.topK(compacted, Seq("merge", "sort"), 15)) ==
      hits(Bm25.topK(fresh, Seq("merge", "sort"), 15)))
  }

  test("compact drops emptied blocks instead of keeping zero-count husks") {
    val allIds = docs.select("doc_id")
    val emptied = Deletes.compact(idx, allIds, "doc_id")
    assert(emptied.postings.count() == 0)
    assert(emptied.docLens.count() == 0)
    assert(emptied.stats.doc_count == 0)
  }

  test("applyUpdate scores exactly as a fresh build over the updated corpus") {
    val updated = docs.where(col("doc_id") % 9 === 2)
      .withColumn("text", concat(col("text"), lit(" freshly rewritten body")))
    val viaUpdate = Deletes.applyUpdate(idx, updated, "doc_id", "text")
    val freshCorpus = docs.withColumn("text",
      when(col("doc_id") % 9 === 2, concat(col("text"), lit(" freshly rewritten body")))
        .otherwise(col("text")))
    val fresh = InvertedIndex.build(freshCorpus, "doc_id", "text")

    assert(viaUpdate.stats == fresh.stats)
    val uStats = viaUpdate.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    val fStats = fresh.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    assert(uStats == fStats)
    // the new tokens only exist in updated docs; old tokens still rank —
    // both paths must agree block-for-block after the merge shuffle
    assert(hits(Bm25.topK(viaUpdate, Seq("rewritten", "merge"), 20)) ==
      hits(Bm25.topK(fresh, Seq("rewritten", "merge"), 20)))
    val viaBlocks = viaUpdate.postings.collect().map { b =>
      (b.term, b.bucket) -> (PostingCodec.decodeDeltas(b.docs, b.cnt).toSeq,
        PostingCodec.decodeInts(b.tfs, b.cnt).toSeq)
    }.toMap
    val freshBlocks = fresh.postings.collect().map { b =>
      (b.term, b.bucket) -> (PostingCodec.decodeDeltas(b.docs, b.cnt).toSeq,
        PostingCodec.decodeInts(b.tfs, b.cnt).toSeq)
    }.toMap
    assert(viaBlocks == freshBlocks)
  }
}
