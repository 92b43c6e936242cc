package graft

import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.{InvertedIndex, PostingCodec, Segments}
import graft.query.Bm25

/** Segmented build + merge + lineage/resume semantics (north rule: merge
 *  stage unions per-partition segments into global postings; killed runs
 *  resume from committed lineage without recomputation). */
class SegmentsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def decodedPostings(idx: graft.index.Index): Map[(String, Long, Int), Int] =
    idx.postings.collect().flatMap { b =>
      val base = b.bucket << InvertedIndex.BucketBits
      val ids = PostingCodec.decodeDeltas(b.docs, b.cnt)
      val tfs = PostingCodec.decodeInts(b.tfs, b.cnt)
      ids.indices.map(i => ((b.term, b.bucket, (base + ids(i)).toInt), tfs(i)))
    }.toMap

  private def freshStore(): String = {
    val d = java.nio.file.Files.createTempDirectory("segspec").toString
    d
  }

  test("merge of 3 segments is identical to the single-shot build") {
    val store = freshStore()
    val built = Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 3)
    assert(built == Seq(0, 1, 2))
    val merged = Segments.merge(spark, store, 3)
    val full = InvertedIndex.build(docs, "doc_id", "text")

    assert(merged.stats == full.stats)
    assert(decodedPostings(merged) == decodedPostings(full))
    val mStats = merged.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    val fStats = full.termStats.collect().map(t => t.term -> (t.df, t.ttf)).toMap
    assert(mStats == fStats)
  }

  test("BM25 top-k over merged segments matches the single-shot index") {
    val store = freshStore()
    Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 4)
    val merged = Segments.merge(spark, store, 4)
    val full = InvertedIndex.build(docs, "doc_id", "text")
    val qm = Bm25.topK(merged, Seq("merge", "sort"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val qf = Bm25.topK(full, Seq("merge", "sort"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(qm.toSeq == qf.toSeq)
  }

  test("resume rebuilds only missing segments; lineage sha invariants hold") {
    val store = freshStore()
    val first = Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 4)
    assert(first == Seq(0, 1, 2, 3))

    // simulate a killed run: segment 2's lineage (the commit marker) is gone
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(s"$store/seg2/lineage"))
    val resumed = Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 4)
    assert(resumed == Seq(2), s"resume must rebuild exactly the uncommitted segment, got $resumed")

    // completed run resumes to a no-op
    val again = Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 4)
    assert(again.isEmpty)

    // lineage row ranges partition [0, maxId] and sha invariants match corpus
    val lin = Segments.readLineage(spark, store, 4).values.toSeq.sortBy(_.segment_id)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    assert(lin.head.row_lo == 0 && lin.last.row_hi == maxId)
    assert(lin.sliding(2).forall { case Seq(a, b) => b.row_lo == a.row_hi + 1; case _ => true })
    assert(lin.map(_.doc_count).sum == docs.count())

    val corpus = Corpus.ingest(spark, dir)
    val shaAll = corpus.agg(min(col("sha256")), max(col("sha256"))).head()
    assert(lin.map(_.sha_min).min == shaAll.getString(0))
    assert(lin.map(_.sha_max).max == shaAll.getString(1))
  }

  test("snapshot/restore: incremental skip, idempotent restore, corrupt-repo detection") {
    import graft.index.Segments.SnapshotAction
    val store = freshStore()
    Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 3)
    val repo = freshStore(); val dst = freshStore()
    // first snapshot copies all; second skips all (segments immutable)
    assert(Segments.snapshot(spark, store, repo, "s1", 3)
      .map(_.action).forall(_ == "copied"))
    assert(Segments.snapshot(spark, store, repo, "s1", 3)
      .map(_.action).forall(_ == "skipped"))
    // restore copies all; second restore finds them present; lineage equal
    assert(Segments.restore(spark, repo, "s1", dst)
      .map(_.action).forall(_ == "restored"))
    assert(Segments.restore(spark, repo, "s1", dst)
      .map(_.action).forall(_ == "present"))
    assert(Segments.readLineage(spark, dst, 3) ==
      Segments.readLineage(spark, store, 3))
    // a corrupt repository segment fails restore verification LOUDLY:
    // overwrite seg1's lineage in the repo with a tampered row
    import spark.implicits._
    val lin = spark.read.parquet(s"$repo/s1/seg1/lineage")
      .as[graft.index.SegmentLineage].head()
    Seq(lin.copy(sha_distinct = lin.sha_distinct + 1)).toDS()
      .write.mode("overwrite").parquet(s"$repo/s1/seg1/lineage")
    val dst2 = freshStore()
    intercept[IllegalArgumentException] {
      Segments.restore(spark, repo, "s1", dst2)
    }
  }

  test("synthetic corpus generator is deterministic and parallelism-invariant") {
    val a = Corpus.generate(spark, 200).orderBy("doc_id").collect()
    val b = Corpus.generate(spark, 200).repartition(7).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    val row = a(5)
    assert(row.getString(6).length == 64) // sha256 hex
    assert(row.getString(4).nonEmpty)
    // head-term skew present: 'import' must dominate a rare symbol
    val toks = a.flatMap(r => r.getString(5).split(' '))
    val counts = toks.groupBy(identity).view.mapValues(_.length)
    assert(counts.getOrElse("import", 0) > 20 * counts.getOrElse("sym17", 1).max(1) / 10)
  }

  test("tieredMergePlan: log-size tiers; a >=3-member tier merges its 3 " +
    "smallest, big/lonely tiers stay untouched") {
    import graft.index.{SegmentLineage, Segments}
    def lin(id: Int, dc: Long) = SegmentLineage(id, 0, 0, dc, 0, "", "", 0)
    val plan = Segments.tieredMergePlan(Seq(
      lin(0, 300), lin(1, 10), lin(2, 12), lin(3, 14), lin(4, 15),
      lin(5, 310), lin(6, 1000000)))
    val m = plan.map(p => p._1 -> p._4).toMap
    // tier floor(ln dc / ln 4): {10,12,14,15} -> tier 1 (4 members),
    // {300,310} -> tier 4 (2 members), {1e6} -> tier 9 (alone)
    assert(m(1).contains(1) && m(2).contains(1) && m(3).contains(1))
    assert(m(4).isEmpty, "4th (largest) member of the tier is left out")
    assert(m(0).isEmpty && m(5).isEmpty, "2-member tier below segments_per_tier")
    assert(m(6).isEmpty, "lone large segment never merges")
    // equal sizes tie-break on segment_id
    val tie = Segments.tieredMergePlan(
      Seq(lin(0, 10), lin(1, 10), lin(2, 10), lin(3, 10)))
    assert(tie.map(p => p._1 -> p._4).toMap ==
      Map(0 -> Some(1), 1 -> Some(1), 2 -> Some(1), 3 -> None))
    intercept[IllegalArgumentException](
      Segments.tieredMergePlan(Seq(lin(0, 10)), segmentsPerTier = 1))
  }

  test("tieredCompact executes the plan: merged store equals fresh build, " +
    "actions match the selection, lineage re-verifies") {
    val store = freshStore(); val dst = freshStore() + "/compacted"
    Segments.buildResumable(docs, "doc_id", "text", Analyzer.Simple, store, 4)
    val plan = Segments.tieredMergePlan(
      Segments.readLineage(spark, store, 4).values.toSeq.sortBy(_.segment_id))
    assert(plan.count(_._4.isDefined) == 3,
      "4 near-equal range slices share a tier -> exactly 3 smallest selected")

    val actions = Segments.tieredCompact(docs, "doc_id", "text", store, dst, 4)
    val byId = actions.filter(_.action != "written").map(a => a.segment_id -> a).toMap
    plan.foreach { case (id, _, _, g) =>
      assert(byId(id).action == (if (g.isDefined) "merged" else "copied")) }
    val written = actions.filter(_.action == "written")
    assert(written.map(_.segment_id) == Seq(4), "one fresh segment with the next free id")
    assert(actions.filter(_.action == "merged").forall(_.target == 4))

    // compacted store answers exactly like the single-shot build
    val compacted = Segments.mergeAll(spark, dst)
    val full = InvertedIndex.build(docs, "doc_id", "text")
    assert(compacted.stats == full.stats)
    assert(decodedPostings(compacted) == decodedPostings(full))
    val qm = Bm25.topK(compacted, Seq("merge", "sort"), 10).collect().toSeq
    val qf = Bm25.topK(full, Seq("merge", "sort"), 10).collect().toSeq
    assert(qm == qf)

    // the fresh segment's lineage carries real content checksums: union of
    // member doc ranges, re-derived counts, recomputed sha min/max
    val lin = Segments.readLineage(spark, dst, 8)
    assert(lin.keySet == Set(3, 4) || lin.keySet.size == 2)
    val merged = lin(4)
    val members = Segments.readLineage(spark, store, 4).filter(kv => plan
      .find(_._1 == kv._1).get._4.isDefined).values.toSeq
    assert(merged.doc_count == members.map(_.doc_count).sum)
    assert(merged.sum_dl == members.map(_.sum_dl).sum)
    assert(merged.sha_min == members.map(_.sha_min).min)
    assert(merged.sha_max == members.map(_.sha_max).max)
    // and the compacted store snapshots/restores like any built store
    val repo = freshStore(); val back = freshStore() + "/restored"
    assert(Segments.snapshot(spark, dst, repo, "c1", 8).map(_.action).forall(_ == "copied"))
    assert(Segments.restore(spark, repo, "c1", back).map(_.action).forall(_ == "restored"))
  }
}
