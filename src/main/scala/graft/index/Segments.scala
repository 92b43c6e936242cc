package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/**
 * Per-segment lineage row — the checkpoint unit of the build
 * (BASELINE.json north rule: "checkpoints per-partition lineage (segment id,
 * row ranges, content sha256) so a killed spark-submit run resumes without
 * recomputation").
 *
 * `sha_min` / `sha_max` / `sha_distinct` summarize the per-row
 * `sha256(content)` invariants of the segment's doc range deterministically
 * and order-independently (a sorted-concat digest would not scale to 10^12
 * rows; min/max/count-distinct are single-pass partial aggregates).
 */
/** Per-stage build metrics committed with each segment (north rule:
 *  "resumable from checkpoint with per-partition lineage + metrics"). */
case class SegmentMetric(segment_id: Int, stage: String, rows: Long, wall_ms: Long)

case class SegmentLineage(
    segment_id: Int,
    row_lo: Long,
    row_hi: Long,
    doc_count: Long,
    sum_dl: Long,
    sha_min: String,
    sha_max: String,
    sha_distinct: Long
)

/**
 * Segmented index build + merge — the Spark re-expression of the reference's
 * Lucene segment lifecycle: per-segment flush writes term dict + postings
 * (reference: sparse/codec/SparsePostingsConsumer.java:87-153), a merge stage
 * unions term sets across segments, remaps doc ids and rewrites one merged
 * segment (reference: sparse/codec/MergeHelper.java:82-179,
 * SparsePostingsReader.java:45-139).
 *
 * Spark-first differences:
 *  - a "segment" is a doc-id range slice of the corpus written as its own
 *    postings/doclens parquet dir — at cluster scale each spark-submit
 *    increment appends one segment, exactly the reference's flush;
 *  - doc ids are globally dense, so merge needs NO docId remap (the
 *    reference's `mergeState.docMaps` exists only because Lucene renumbers);
 *    merging = union of block Datasets + one (term, bucket) shuffle that
 *    re-encodes only the boundary buckets two segments share;
 *  - resume: a segment is committed iff its lineage row exists AND matches
 *    the recomputed range stats; `buildResumable` skips committed segments,
 *    so a killed run redoes only the in-flight slice.
 */
object Segments {

  /** Doc-id span per segment for an n-way segmentation of [0, maxId]. */
  def span(maxId: Long, nSegments: Int): Long =
    (maxId + nSegments) / nSegments // ceil((maxId+1)/n)

  private def segDir(dir: String, id: Int) = s"$dir/seg$id"

  /** Commit discovery goes through the SAME filesystem layer the segment
   *  writes use (Spark's Hadoop FS), so lineage markers work on HDFS/S3/
   *  local alike — a java.io.File check silently reports "nothing
   *  committed" on any non-local store. */
  private def fsExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Build ONE segment (docs with doc_id in [lo, hi]) and commit it with its
   *  lineage row. Idempotent: overwrite-mode writes + lineage-last ordering
   *  make the commit atomic at the segment granularity. */
  def buildSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      analyzer: String,
      dir: String,
      id: Int,
      lo: Long,
      hi: Long
  ): SegmentLineage = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slice = docs.filter(col(idCol) >= lo && col(idCol) <= hi)
    val t0 = System.currentTimeMillis()
    val idx = InvertedIndex.buildAndWrite(slice, idCol, textCol, segDir(dir, id), analyzer)
    val buildMs = System.currentTimeMillis() - t0
    Seq(
      SegmentMetric(id, "postings", idx.postings.count(), buildMs),
      SegmentMetric(id, "doclens", idx.docLens.count(), buildMs),
      SegmentMetric(id, "termstats", idx.termStats.count(), buildMs)
    ).toDS().write.mode("overwrite").parquet(s"${segDir(dir, id)}/metrics")

    val sha = slice
      .select(sha2(col(textCol), 256).as("sha"))
      .agg(min($"sha").as("mn"), max($"sha").as("mx"), countDistinct($"sha").as("nd"))
      .as[(String, String, Long)].head()
    val lineage = SegmentLineage(id, lo, hi, idx.stats.doc_count, idx.stats.sum_dl,
      sha._1, sha._2, sha._3)
    Seq(lineage).toDS().write.mode("overwrite").parquet(s"${segDir(dir, id)}/lineage")
    lineage
  }

  /** One segment's snapshot outcome: `copied` on first capture,
   *  `skipped` when the repository already holds this lineage (the
   *  incremental contract). */
  case class SnapshotAction(segment_id: Int, action: String)

  /** Snapshot the committed segments of `srcDir` into
   *  `repoDir/<name>` — the reference's repository snapshot, which is
   *  INCREMENTAL at segment granularity: Lucene segments are immutable, so
   *  a segment whose lineage row (content checksums included) already sits
   *  in the repository is skipped, and only new/changed segments copy. A
   *  manifest (the lineage rows) is written last, making the snapshot
   *  atomic-by-manifest: a reader only trusts segments the manifest names.
   *  Per-segment file copies are driver-side FileSystem ops over the
   *  segment DIRECTORY (metadata-scale, one per segment — never row
   *  data through the driver). */
  def snapshot(spark: SparkSession, srcDir: String, repoDir: String,
               name: String, nSegments: Int): Seq[SnapshotAction] = {
    import spark.implicits._
    val lineage = readLineage(spark, srcDir, nSegments)
    require(lineage.nonEmpty, s"nothing committed under $srcDir to snapshot")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(repoDir)
      .getFileSystem(conf)
    val actions = lineage.toSeq.sortBy(_._1).map { case (id, lin) =>
      val dst = new org.apache.hadoop.fs.Path(s"$repoDir/$name/seg$id")
      val already = fsExists(spark, s"$repoDir/$name/seg$id/lineage") &&
        scala.util.Try(spark.read.parquet(s"$repoDir/$name/seg$id/lineage")
          .as[SegmentLineage].head()).toOption.contains(lin)
      if (already) SnapshotAction(id, "skipped")
      else {
        fs.delete(dst, true)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(segDir(srcDir, id)),
          fs, dst, false, conf)
        SnapshotAction(id, "copied")
      }
    }
    // manifest written LAST: the snapshot exists only once it does
    lineage.values.toSeq.sortBy(_.segment_id).toDS()
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$repoDir/$name/manifest")
    actions
  }

  /** Restore snapshot `name` from the repository into `dstDir`: copy back
   *  only segments missing or lineage-mismatched at the target (the same
   *  incremental rule in reverse), then VERIFY every restored segment's
   *  lineage row against the manifest — a corrupt or partial copy fails
   *  loudly instead of serving wrong postings. Returns the per-segment
   *  (segment_id, action) with action `restored` or `present`. */
  def restore(spark: SparkSession, repoDir: String, name: String,
              dstDir: String): Seq[SnapshotAction] = {
    import spark.implicits._
    val manifestPath = s"$repoDir/$name/manifest"
    require(fsExists(spark, manifestPath), s"no snapshot [$name] in $repoDir")
    val manifest = spark.read.parquet(manifestPath).as[SegmentLineage]
      .collect().sortBy(_.segment_id)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dstDir).getFileSystem(conf)
    val actions = manifest.toSeq.map { lin =>
      val id = lin.segment_id
      val present = fsExists(spark, s"${segDir(dstDir, id)}/lineage") &&
        scala.util.Try(spark.read.parquet(s"${segDir(dstDir, id)}/lineage")
          .as[SegmentLineage].head()).toOption.contains(lin)
      if (present) SnapshotAction(id, "present")
      else {
        val dst = new org.apache.hadoop.fs.Path(segDir(dstDir, id))
        fs.delete(dst, true)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(s"$repoDir/$name/seg$id"),
          fs, dst, false, conf)
        SnapshotAction(id, "restored")
      }
    }
    // verification: every manifest row must now be readable at the target
    // and equal the manifest's lineage (content checksums included)
    manifest.foreach { lin =>
      val got = spark.read.parquet(s"${segDir(dstDir, lin.segment_id)}/lineage")
        .as[SegmentLineage].head()
      require(got == lin,
        s"restore verification failed for segment ${lin.segment_id}: $got != $lin")
    }
    actions
  }

  /** Metrics rows of all committed segments under `dir`. */
  def readMetrics(spark: SparkSession, dir: String, nSegments: Int): Seq[SegmentMetric] = {
    import spark.implicits._
    (0 until nSegments).flatMap { id =>
      val p = s"${segDir(dir, id)}/metrics"
      if (fsExists(spark, p))
        scala.util.Try(spark.read.parquet(p).as[SegmentMetric].collect().toSeq).getOrElse(Nil)
      else Nil
    }
  }

  /** Lineage rows of all committed segments under `dir` (empty if none). */
  def readLineage(spark: SparkSession, dir: String, nSegments: Int): Map[Int, SegmentLineage] = {
    import spark.implicits._
    (0 until nSegments).flatMap { id =>
      val p = s"${segDir(dir, id)}/lineage"
      if (fsExists(spark, p))
        scala.util.Try(spark.read.parquet(p).as[SegmentLineage].head()).toOption
      else None
    }.map(l => l.segment_id -> l).toMap
  }

  /**
   * Build all n segments, skipping segments whose lineage is already
   * committed (the resume path). Returns the ids actually built this run —
   * a killed-and-restarted run reports only the missing tail.
   */
  def buildResumable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      analyzer: String,
      dir: String,
      nSegments: Int
  ): Seq[Int] = {
    val spark = docs.sparkSession
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val sp = span(maxId, nSegments)
    // a segment is committed iff its lineage exists AND its recorded row
    // range matches the range THIS run would assign it — a rerun with a
    // different nSegments (or a grown corpus) changes the span, and reusing
    // a stale slice would silently double-count or drop docs at merge
    val done = readLineage(spark, dir, nSegments).filter { case (id, l) =>
      val lo = id.toLong * sp
      val hi = math.min(lo + sp - 1, maxId)
      l.row_lo == lo && l.row_hi == hi
    }
    val todo = (0 until nSegments).filterNot(done.contains)
    // segments are independent slices: build them as concurrent Spark jobs
    // (the analogue of the reference's parallel per-segment flushes on the
    // seismic thread pool, plugin/NeuralSearch.java:296-308)
    if (todo.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(4, todo.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      val fs = todo.map { id =>
        Future {
          val lo = id.toLong * sp
          val hi = math.min(lo + sp - 1, maxId)
          buildSegment(docs, idCol, textCol, analyzer, dir, id, lo, hi)
        }
      }
      try Await.result(Future.sequence(fs), scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
    todo
  }

  /**
   * Merge committed segments into one global Index. One (term, bucket)
   * shuffle over block rows — every group is <= nSegments blocks of <= 4096
   * postings, so merge work per reducer is bounded regardless of corpus
   * size; term stats re-aggregate from the merged blocks (partial+final).
   */
  def merge(spark: SparkSession, dir: String, nSegments: Int, analyzer: String = Analyzer.Simple): Index = {
    val lineage = readLineage(spark, dir, nSegments)
    require(lineage.size == nSegments, s"merge: only ${lineage.size}/$nSegments segments committed")
    mergeIds(spark, dir, (0 until nSegments).toSeq, lineage.values.toSeq, analyzer)
  }

  /** One selection round of a Lucene-TieredMergePolicy-style merge plan
   *  over the segment METADATA: segments bucket into size tiers
   *  (floor(log_tierFactor doc_count) — TMP's logarithmic size levels),
   *  and any tier holding at least `segmentsPerTier` segments yields one
   *  merge group: its `segmentsPerTier` SMALLEST members (doc_count asc,
   *  segment_id asc) — TMP's preference for merging small similar-sized
   *  segments while leaving large ones alone. Pure metadata decision over
   *  the lineage rows (bounded = segment count); postings are never read.
   *  Execute a group with [[mergeAll]]/`mergeIds` as usual.
   *
   *  @return one row per segment: (segment_id, doc_count, tier,
   *          merge_group) — merge_group = the tier id when the segment is
   *          selected for that tier's merge, None otherwise. */
  def tieredMergePlan(lineage: Seq[SegmentLineage], segmentsPerTier: Int = 3,
                      tierFactor: Double = 4.0): Seq[(Int, Long, Int, Option[Int])] = {
    require(segmentsPerTier >= 2, s"segments_per_tier must be >= 2, got $segmentsPerTier")
    require(tierFactor > 1.0, s"tier factor must be > 1, got $tierFactor")
    val tiers = lineage.map(l => (l.segment_id, l.doc_count,
      math.floor(math.log(math.max(l.doc_count, 1L).toDouble) /
        math.log(tierFactor)).toInt))
    val byTier = tiers.groupBy(_._3)
    tiers.sortBy(_._1).map { case (id, dc, t) =>
      val members = byTier(t)
      val selected: Set[Int] =
        if (members.size >= segmentsPerTier)
          members.sortBy(m => (m._2, m._1)).take(segmentsPerTier).map(_._1).toSet
        else Set.empty
      (id, dc, t, if (selected(id)) Some(t) else None)
    }
  }

  /** One original segment's fate in a [[tieredCompact]] round: `copied`
   *  (not selected — the immutable segment moves verbatim) or
   *  `merged` into `target` (the fresh segment id its group wrote). A
   *  `written` row per fresh segment records the group's output. */
  case class CompactAction(segment_id: Int, tier: Int, action: String, target: Int)

  /**
   * EXECUTE one [[tieredMergePlan]] selection round — Lucene's
   * TieredMergePolicy hands its OneMerge groups to the merge scheduler;
   * this is that scheduler step over the committed store at `srcDir`,
   * producing a compacted store at `dstDir`:
   *
   *  - unselected segments copy verbatim (segments are immutable — same
   *    driver-side directory copy the snapshot path uses);
   *  - each selected group runs the bounded (term, bucket) block merge
   *    ([[mergeIds]] — work per reducer <= group-size blocks of <= 4096
   *    postings, independent of corpus size) and lands as ONE fresh
   *    segment with the next free id;
   *  - the fresh segment's doc_count / sum_dl are RE-DERIVED from its
   *    merged doc-length blocks and verified against the member lineage
   *    sums — a dropped or duplicated posting fails loudly here, not at
   *    query time;
   *  - sha_min/max/distinct recompute over the members' doc ranges of
   *    `docs` (distinct-sha does not compose from member summaries), the
   *    same content pass [[buildSegment]] makes — so the compacted store's
   *    lineage carries first-class checksums and a later snapshot/restore
   *    verifies it like any built segment.
   *
   * The compacted store merges/queries through the ordinary readers
   * ([[mergeAll]] tolerates id gaps), so plan → execute → query equals a
   * fresh single-shot build — the oracle the `segments_tiered_compact`
   * entry checks. Reference behavior: Lucene TieredMergePolicy +
   * ConcurrentMergeScheduler (the reference's segment lifecycle,
   * e.g. sparse/codec/MergeHelper.java:82-179 drives per-field merge when
   * the scheduler fires).
   */
  def tieredCompact(docs: DataFrame, idCol: String, textCol: String,
                    srcDir: String, dstDir: String, nSegments: Int,
                    segmentsPerTier: Int = 3, tierFactor: Double = 4.0,
                    analyzer: String = Analyzer.Simple): Seq[CompactAction] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lineage = readLineage(spark, srcDir, nSegments)
    require(lineage.nonEmpty, s"tieredCompact: nothing committed under $srcDir")
    val linSeq = lineage.values.toSeq.sortBy(_.segment_id)
    val plan = tieredMergePlan(linSeq, segmentsPerTier, tierFactor)
    val tierOf = plan.map(p => p._1 -> p._3).toMap
    val groups = plan.flatMap { case (id, _, _, g) => g.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dstDir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dstDir), true)

    val selected = groups.flatMap(_._2).toSet
    val copied = plan.filterNot(p => selected(p._1)).map { case (id, _, t, _) =>
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(segDir(srcDir, id)),
        fs, new org.apache.hadoop.fs.Path(segDir(dstDir, id)), false, conf)
      CompactAction(id, t, "copied", id)
    }

    var nextId = linSeq.map(_.segment_id).max
    val mergedActions = groups.flatMap { case (tier, ids) =>
      nextId += 1
      val members = ids.map(lineage)
      val idx = mergeIds(spark, srcDir, ids, members, analyzer)
      val out = segDir(dstDir, nextId)
      InvertedIndex.write(idx, out)

      // re-verify from what was WRITTEN, not from the inputs: decode the
      // merged doc-length blocks back off disk and require the re-derived
      // doc_count / sum_dl to equal the member lineage sums
      val (gotN, gotDl) = InvertedIndex.docLensFromDir(spark, out)
        .map(b => (b.cnt.toLong, PostingCodec.decodeInts(b.dls, b.cnt).map(_.toLong).sum))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      val (wantN, wantDl) = (members.map(_.doc_count).sum, members.map(_.sum_dl).sum)
      require(gotN == wantN && gotDl == wantDl,
        s"tieredCompact verification failed for merged segment $nextId: " +
          s"re-derived (docs=$gotN, sum_dl=$gotDl) != member sums (docs=$wantN, sum_dl=$wantDl)")

      val inRange = members.map(l => col(idCol).between(l.row_lo, l.row_hi))
        .reduce(_ || _)
      val sha = docs.filter(inRange)
        .select(sha2(col(textCol), 256).as("sha"))
        .agg(min($"sha").as("mn"), max($"sha").as("mx"), countDistinct($"sha").as("nd"))
        .as[(String, String, Long)].head()
      val lin = SegmentLineage(nextId, members.map(_.row_lo).min,
        members.map(_.row_hi).max, gotN, gotDl, sha._1, sha._2, sha._3)
      Seq(lin).toDS().write.mode("overwrite").parquet(s"$out/lineage")
      Seq(SegmentMetric(nextId, "compact_merge", gotN, 0L))
        .toDS().write.mode("overwrite").parquet(s"$out/metrics")

      ids.map(i => CompactAction(i, tier, "merged", nextId)) :+
        CompactAction(nextId, tier, "written", nextId)
    }
    (copied ++ mergedActions).sortBy(a => (a.segment_id, a.action))
  }

  /** Merge every committed segment found under `dir` (whatever its id) —
   *  the shape the streaming/incremental path needs, where segment ids are
   *  micro-batch ids with possible gaps. */
  def mergeAll(spark: SparkSession, dir: String, analyzer: String = Analyzer.Simple): Index = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      (if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty)
        .filter(st => st.isDirectory && st.getPath.getName.matches("seg\\d+"))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "lineage")))
        .map(_.getPath.getName.drop(3).toInt).sorted
    require(ids.nonEmpty, s"mergeAll: no committed segments under $dir")
    val lineage = ids.map(id =>
      spark.read.parquet(s"${segDir(dir, id)}/lineage").as[SegmentLineage].head())
    mergeIds(spark, dir, ids, lineage, analyzer)
  }

  private def mergeIds(spark: SparkSession, dir: String, ids: Seq[Int],
                       lineage: Seq[SegmentLineage], analyzer: String): Index = {
    import spark.implicits._

    def mergeBlocks(grouped: Dataset[PostingBlock]): Dataset[PostingBlock] =
      grouped.groupByKey(b => (b.term, b.bucket)).mapGroups { (key, it) =>
        val blocks = it.toArray
        if (blocks.length == 1) blocks(0)
        else {
          val (term, bucket) = key
          val n = blocks.map(_.cnt).sum
          val ids = new Array[Int](n)
          val tfs = new Array[Int](n)
          var off = 0
          for (b <- blocks) {
            val bi = PostingCodec.decodeDeltas(b.docs, b.cnt)
            val bt = PostingCodec.decodeInts(b.tfs, b.cnt)
            System.arraycopy(bi, 0, ids, off, b.cnt)
            System.arraycopy(bt, 0, tfs, off, b.cnt)
            off += b.cnt
          }
          // same bucket from different segments holds disjoint local ids;
          // a single sort restores the monotone order delta-encoding needs
          val ord = ids.indices.toArray.sortBy(ids(_))
          val sIds = ord.map(ids(_))
          val sTfs = ord.map(tfs(_))
          PostingBlock(term, bucket, n, sTfs.max, sTfs.map(_.toLong).sum,
            PostingCodec.encodeDeltas(sIds), PostingCodec.encodeInts(sTfs))
        }
      }

    val postings = mergeBlocks(
      ids.map(id => InvertedIndex.postingsFromDir(spark, segDir(dir, id)))
        .reduce(_ union _))

    val docLens = ids.map(id => InvertedIndex.docLensFromDir(spark, segDir(dir, id)))
      .reduce(_ union _)
      .groupByKey(_.bucket).mapGroups { (bucket, it) =>
        val blocks = it.toArray
        if (blocks.length == 1) blocks(0)
        else {
          val pairs = blocks.flatMap { b =>
            val ids = PostingCodec.decodeDeltas(b.ids, b.cnt)
            val dls = PostingCodec.decodeInts(b.dls, b.cnt)
            ids.zip(dls)
          }.sortBy(_._1)
          DocLenBlock(bucket, pairs.length,
            if (pairs.isEmpty) 0 else pairs.map(_._2).min,
            PostingCodec.encodeDeltas(pairs.map(_._1)), PostingCodec.encodeInts(pairs.map(_._2)))
        }
      }

    val termStats = postings.groupBy($"term")
      .agg(sum($"cnt").as("df"), sum($"sum_tf").as("ttf")).as[TermStat]

    val docCount = lineage.map(_.doc_count).sum
    val sumDl = lineage.map(_.sum_dl).sum
    val stats = CorpusStats(docCount, sumDl, if (docCount == 0) 0.0 else sumDl.toDouble / docCount)
    Index(postings, docLens, termStats, stats, analyzer)
  }
}
