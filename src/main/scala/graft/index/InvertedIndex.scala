package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/**
 * One compressed posting block: all postings of `term` whose docIds fall in
 * the 4096-doc span `bucket` (localId = doc_id - bucket*4096), delta-varint
 * encoded, with the per-block max term frequency kept as the block-max impact
 * for WAND-style pruning.
 *
 * The reference accumulates per-term `DocWeight(docID, weight)` lists at
 * segment flush and vint-encodes them into clustered postings
 * (reference: sparse/codec/ClusteredPostingTermsWriter.java:155-198). Our
 * block-per-row layout replaces both the Lucene segment file and its term
 * dictionary: Parquet predicate pushdown on `term` is the term seek, and the
 * fixed docId span per block bounds every shuffle group at 4096 entries, so
 * head terms ("import"/"return"-style skew) can never produce a giant row —
 * the bucketing IS the salt.
 */
case class PostingBlock(
    term: String,
    bucket: Long,
    cnt: Int,
    max_tf: Int,
    sum_tf: Long,
    docs: Array[Byte],
    tfs: Array[Byte]
)

/** Forward doc-length block for one bucket (the BM25 norm source).
 *  Mirrors Lucene's per-doc norms that BM25Similarity reads; the reference
 *  keeps a BinaryDocValues forward index per doc
 *  (reference: sparse/codec/SparseDocValuesConsumer.java). `min_dl` is block
 *  metadata for WAND: the tightest per-bucket BM25 upper bound uses the
 *  bucket's shortest doc, not dl -> 0. */
case class DocLenBlock(bucket: Long, cnt: Int, min_dl: Int, ids: Array[Byte], dls: Array[Byte])

/** Per-term statistics feeding BM25 idf (Lucene TermStatistics analogue;
 *  reference stubs these in sparse/codec/SparseTerms.java:54-66 and delegates
 *  real BM25 stats to Lucene core). */
case class TermStat(term: String, df: Long, ttf: Long)

/**
 * One partition-local compressed fragment emitted by the single-pass build:
 * kind 0 = posting fragment of (term, bucket), payload tfs; kind 1 = doc-length
 * fragment of bucket (term empty), payload dls. Fragments are the unit shipped
 * through the shuffle — already delta-varint compressed, so the shuffle moves
 * ~10x fewer bytes than raw (doc, term, tf) rows would. This mirrors the
 * reference's per-segment flush-then-merge lifecycle (reference:
 * sparse/codec/SparsePostingsConsumer.java:87-153 flush,
 * MergeHelper.java:82-179 merge) inside one Spark job.
 */
case class BuildBlock(
    kind: Byte,
    term: String,
    bucket: Long,
    cnt: Int,
    max_tf: Int,
    min_v: Int,
    sum_tf: Long,
    docs: Array[Byte],
    tfs: Array[Byte]
)

case class CorpusStats(doc_count: Long, sum_dl: Long, avgdl: Double)

/** In-memory handle on a built index. */
case class Index(
    postings: Dataset[PostingBlock],
    docLens: Dataset[DocLenBlock],
    termStats: Dataset[TermStat],
    stats: CorpusStats,
    analyzer: String
)

object InvertedIndex {

  /** 4096-doc span per block — mirrors the reference's 4096-doc bulk-scoring
   *  window (reference: query/HybridBulkScorer.java:27-29). */
  val BucketBits = 12
  val BucketSpan: Int = 1 << BucketBits

  /** Growable primitive int buffer (no boxing in the build hot loop). */
  private final class IntBuf(initial: Int = 8) {
    var arr = new Array[Int](initial)
    var n = 0
    def add(v: Int): Unit = {
      if (n == arr.length) {
        val bigger = new Array[Int](arr.length * 2)
        System.arraycopy(arr, 0, bigger, 0, n)
        arr = bigger
      }
      arr(n) = v
      n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOfRange(arr, 0, n)
  }

  /**
   * Single-pass partition-local build: analyze each doc once, accumulate
   * per-(term, bucket) postings AND per-bucket doc lengths in primitive
   * buffers, emit compressed fragments. The downstream (kind, term, bucket)
   * shuffle then only moves varint blocks. Memory per task is bounded by the
   * partition's vocabulary x bucket span, independent of corpus size.
   */
  def buildBlocksOf(docs: DataFrame, idCol: String, textCol: String, analyzer: String): Dataset[BuildBlock] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // lang-tagged dispatch: the third column carries each ROW's analyzer
    // name — resolved from the document's `lang` column when the index is
    // declared LangTagged, constant otherwise. The single-pass build below
    // is analyzer-agnostic either way.
    val rows: Dataset[(Long, String, String)] =
      if (analyzer == Analyzer.LangTagged)
        docs.select(col(idCol).cast("long"), col(textCol),
          when(lower(col("lang")) === "en", Analyzer.EnSimple)
            .otherwise(Analyzer.Simple)).as[(Long, String, String)]
      else
        docs.select(col(idCol).cast("long"), col(textCol), lit(analyzer))
          .as[(Long, String, String)]
    rows.mapPartitions { rows =>
      // Postings accumulate in a BUCKET-LOCAL map flushed on bucket change:
      // doc ids arrive (near-)ordered, so the bucket switches once per 4096
      // docs and the map is keyed by plain term String — no (String, Long)
      // tuple allocation + boxing per unique term per doc, and task memory
      // is bounded by ONE bucket's vocabulary instead of the partition's
      // vocabulary x bucket span. Unordered arrivals stay correct: a
      // revisited bucket just emits another fragment for the same
      // (term, bucket) key and the merge shuffle combines them.
      val out = scala.collection.mutable.ArrayBuffer.empty[BuildBlock]
      val cur = new java.util.HashMap[String, (IntBuf, IntBuf)]()
      val doclens = new java.util.HashMap[Long, (IntBuf, IntBuf)]()
      val docTf = new java.util.HashMap[String, Array[Int]]()
      var curBucket = Long.MinValue
      var dlCell: (IntBuf, IntBuf) = null
      def flush(): Unit = if (curBucket != Long.MinValue) {
        val it = cur.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out += encodeFragment(0, e.getKey, curBucket, e.getValue._1.toArray, e.getValue._2.toArray)
        }
        cur.clear()
      }
      rows.foreach { case (docId, text, an) =>
        val toks = Analyzer.analyze(an)(text)
        val bucket = docId >> BucketBits
        val local = (docId - (bucket << BucketBits)).toInt
        if (bucket != curBucket) {
          flush()
          curBucket = bucket
          dlCell = doclens.get(bucket)
          if (dlCell == null) { dlCell = (new IntBuf(64), new IntBuf(64)); doclens.put(bucket, dlCell) }
        }
        dlCell._1.add(local)
        dlCell._2.add(toks.length)
        docTf.clear()
        var i = 0
        while (i < toks.length) {
          val cell = docTf.get(toks(i))
          if (cell == null) docTf.put(toks(i), Array(1)) else cell(0) += 1
          i += 1
        }
        val it = docTf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          var pCell = cur.get(e.getKey)
          if (pCell == null) { pCell = (new IntBuf(4), new IntBuf(4)); cur.put(e.getKey, pCell) }
          pCell._1.add(local)
          pCell._2.add(e.getValue()(0))
        }
      }
      flush()
      val dit = doclens.entrySet().iterator()
      while (dit.hasNext) {
        val e = dit.next()
        out += encodeFragment(1, "", e.getKey, e.getValue._1.toArray, e.getValue._2.toArray)
      }
      out.iterator
    }
  }

  /** Sort parallel (ids, vals) by id and delta/varint-encode into a fragment. */
  private def encodeFragment(kind: Byte, term: String, bucket: Long,
                             ids: Array[Int], vals: Array[Int]): BuildBlock = {
    // insertion order is usually already ascending (range-partitioned doc
    // ids); sort defensively via index permutation
    var sorted = true
    var i = 1
    while (sorted && i < ids.length) { sorted = ids(i - 1) < ids(i); i += 1 }
    val (sIds, sVals) = if (sorted) (ids, vals) else {
      val ord = ids.indices.toArray.sortBy(ids(_))
      (ord.map(ids(_)), ord.map(vals(_)))
    }
    var maxV = 0
    var minV = Int.MaxValue
    var sumV = 0L
    i = 0
    while (i < sVals.length) {
      if (sVals(i) > maxV) maxV = sVals(i)
      if (sVals(i) < minV) minV = sVals(i)
      sumV += sVals(i)
      i += 1
    }
    if (sVals.isEmpty) minV = 0
    BuildBlock(kind, term, bucket, sIds.length, maxV, minV, sumV,
      PostingCodec.encodeDeltas(sIds), PostingCodec.encodeInts(sVals))
  }

  /** Merge same-key fragments from different partitions into one block. */
  def mergeFragments(blocks: Array[BuildBlock]): BuildBlock = {
    if (blocks.length == 1) blocks(0)
    else {
      val n = blocks.map(_.cnt).sum
      val ids = new Array[Int](n)
      val vals = new Array[Int](n)
      var off = 0
      for (b <- blocks) {
        val bi = PostingCodec.decodeDeltas(b.docs, b.cnt)
        val bv = PostingCodec.decodeInts(b.tfs, b.cnt)
        System.arraycopy(bi, 0, ids, off, b.cnt)
        System.arraycopy(bv, 0, vals, off, b.cnt)
        off += b.cnt
      }
      encodeFragment(blocks(0).kind, blocks(0).term, blocks(0).bucket, ids, vals)
    }
  }

  /** All index blocks (postings + doclens) in one analyze pass + one
   *  compressed-fragment shuffle. */
  def mergedBlocksOf(docs: DataFrame, idCol: String, textCol: String, analyzer: String): Dataset[BuildBlock] = {
    val spark = docs.sparkSession
    import spark.implicits._
    buildBlocksOf(docs, idCol, textCol, analyzer)
      .groupByKey(b => (b.kind, b.term, b.bucket))
      .mapGroups((_, it) => mergeFragments(it.toArray))
  }

  def postingsFromBlocks(blocks: Dataset[BuildBlock]): Dataset[PostingBlock] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.filter(_.kind == 0.toByte)
      .map(b => PostingBlock(b.term, b.bucket, b.cnt, b.max_tf, b.sum_tf, b.docs, b.tfs))
  }

  def docLensFromBlocks(blocks: Dataset[BuildBlock]): Dataset[DocLenBlock] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.filter(_.kind == 1.toByte)
      .map(b => DocLenBlock(b.bucket, b.cnt, b.min_v, b.docs, b.tfs))
  }

  /** All live doc ids, decoded block-locally from the forward (doc-length)
   *  table — the MatchAllDocsQuery universe. Tombstoned docs never appear
   *  here (Deletes.maskDocLens removes their forward entries), so match_all
   *  respects deletes like every scorer. */
  def liveDocIds(docLens: Dataset[DocLenBlock]): org.apache.spark.sql.DataFrame = {
    val spark = docLens.sparkSession
    import spark.implicits._
    docLens.flatMap { b =>
      val ids = PostingCodec.decodeDeltas(b.ids, b.cnt)
      val base = b.bucket << BucketBits
      (0 until b.cnt).iterator.map(i => base + ids(i))
    }.toDF("doc_id")
  }

  /** Docs whose field produced AT LEAST ONE token — the `exists` universe.
   *  Unlike [[liveDocIds]] (which includes rows whose value analyzed to
   *  zero tokens — they are live for match_all), a token-less value
   *  indexes nothing, so the field "does not exist" for it. This is the
   *  index-derived analogue of Lucene's FieldExistsQuery; OpenSearch
   *  additionally counts a literal empty string as existing via the stored
   *  _field_names mapper, which has no index-side equivalent here — a
   *  documented divergence on ""-valued fields only. */
  def existsDocIds(docLens: Dataset[DocLenBlock]): org.apache.spark.sql.DataFrame = {
    val spark = docLens.sparkSession
    import spark.implicits._
    docLens.flatMap { b =>
      val ids = PostingCodec.decodeDeltas(b.ids, b.cnt)
      val dls = PostingCodec.decodeInts(b.dls, b.cnt)
      val base = b.bucket << BucketBits
      (0 until b.cnt).iterator.filter(dls(_) > 0).map(i => base + ids(i))
    }.toDF("doc_id")
  }

  /** Per-term stats derived from posting blocks — no re-tokenize: partial
   *  aggregation over the already-compressed block rows. */
  def termStatsOf(postings: Dataset[PostingBlock]): Dataset[TermStat] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings.groupBy($"term")
      .agg(sum($"cnt").as("df"), sum($"sum_tf").as("ttf"))
      .as[TermStat]
  }

  /** Corpus stats derived from doc-length blocks (decode is per-block local). */
  def statsOf(docLens: Dataset[DocLenBlock]): CorpusStats = {
    val spark = docLens.sparkSession
    import spark.implicits._
    val row = docLens
      .map { b =>
        var s = 0L
        val dls = PostingCodec.decodeInts(b.dls, b.cnt)
        var i = 0
        while (i < b.cnt) { s += dls(i); i += 1 }
        (b.cnt.toLong, s)
      }
      .toDF("c", "s").agg(sum($"c"), sum($"s")).as[(Option[Long], Option[Long])].head()
    val (n, sd) = (row._1.getOrElse(0L), row._2.getOrElse(0L))
    CorpusStats(n, sd, if (n == 0) 0.0 else sd.toDouble / n)
  }

  def build(docs: DataFrame, idCol: String, textCol: String, analyzer: String = Analyzer.Simple): Index = {
    val blocks = mergedBlocksOf(docs, idCol, textCol, analyzer)
    val postings = postingsFromBlocks(blocks)
    val docLens = docLensFromBlocks(blocks)
    Index(postings, docLens, termStatsOf(postings), statsOf(docLens), analyzer)
  }

  /**
   * The production build path: materialize each table ONCE and derive
   * downstream tables from what is already on disk — postings see exactly one
   * tokenize+shuffle pass, doc lengths one analyze pass, and term/corpus
   * stats re-read the compressed block tables instead of the raw corpus.
   * (The lazy `build` recomputes its inputs per downstream action unless the
   * caller persists them; at 10^12 docs re-tokenizing is the dominant cost,
   * so the write-then-derive ordering IS the optimization.)
   */
  def buildAndWrite(docs: DataFrame, idCol: String, textCol: String, dir: String,
                    analyzer: String = Analyzer.Simple): Index = {
    val spark = docs.sparkSession
    import spark.implicits._
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[graft-build] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // ONE job does tokenize + fragment shuffle + the kind-partitioned block
    // write — no persist and no separate materialize pass. The earlier
    // cache-then-derive design paid the whole pipeline twice (once into the
    // cache, once out of it) and its typed filter/map stats derivations
    // deserialized full payload bytes from the cache, defeating column
    // pruning. Every derived table (termstats, corpus stats) is a function
    // of the METADATA columns alone — kind=0: (term, cnt, sum_tf) aggregate
    // to df/ttf; kind=1: sum(cnt)/sum(sum_tf) ARE doc_count/sum_dl, because
    // a doc-length fragment's sum over payload values is kept as sum_tf at
    // encode time — so the read-back prunes to slim columns and never
    // touches the payload bytes. Rows are pre-sorted (kind, term, bucket)
    // inside each task so the dynamic partitioning needs no extra sort and
    // term row-group stats stay tight for the read-side seek.
    // Corpus stats ride the SAME job as the block write: an `observe`
    // (CollectMetrics — Spark's exactly-once job-level aggregate, safe under
    // task retries where accumulators are not) sums the kind=1 metadata
    // columns as the rows stream into parquet. That removes one of the two
    // post-write stats jobs entirely — at bench scale those jobs are
    // fixed-overhead (~1 s each regardless of core count), i.e. pure serial
    // tail that erodes N->4N wall scaling; at 10^12 docs it is one fewer
    // full re-listing of the block store.
    val obs = new org.apache.spark.sql.Observation("graft-corpus-stats")
    phase("blocks")(mergedBlocksOf(docs, idCol, textCol, analyzer)
      .observe(obs,
        sum(when($"kind" === 1, $"cnt").otherwise(0L)).as("n"),
        sum(when($"kind" === 1, $"sum_tf").otherwise(0L)).as("sd"))
      .sortWithinPartitions("kind", "term", "bucket")
      .write.mode("overwrite").partitionBy("kind").parquet(s"$dir/blocks"))
    val meta = spark.read.parquet(s"$dir/blocks")
      .select($"kind", $"term", $"cnt", $"sum_tf")
    // the remaining derived tables are independent metadata-scale jobs:
    // commit them concurrently so the post-write tail is max(), not sum()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    val fTs = Future(phase("termstats")(meta.filter($"kind" === 0)
      .groupBy($"term").agg(sum($"cnt").as("df"), sum($"sum_tf").as("ttf"))
      .as[TermStat]
      .write.mode("overwrite").parquet(s"$dir/termstats")))
    val fStats = Future(phase("stats") {
      // the listener bus delivers observed metrics asynchronously after the
      // write returns: await briefly, then fall back to the metadata scan
      val observed = try {
        val row = Await.result(obs.future, scala.concurrent.duration.Duration(2, "s"))
        if (row.isNullAt(0)) None
        else Some((row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)))
      } catch { case _: java.util.concurrent.TimeoutException => None }
      val (n, sd) = observed.getOrElse {
        val row = meta.filter($"kind" === 1).agg(sum($"cnt"), sum($"sum_tf"))
          .as[(Option[Long], Option[Long])].head()
        (row._1.getOrElse(0L), row._2.getOrElse(0L))
      }
      val st = CorpusStats(n, sd, if (n == 0) 0.0 else sd.toDouble / n)
      Seq(st).toDS().write.mode("overwrite").parquet(s"$dir/stats")
      st
    })
    val stats = try {
      Await.result(fTs, scala.concurrent.duration.Duration.Inf)
      Await.result(fStats, scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    Index(
      postingsFromDir(spark, dir),
      docLensFromDir(spark, dir),
      spark.read.parquet(s"$dir/termstats").as[TermStat],
      stats, analyzer)
  }

  /** Does `dir` hold the unified kind-partitioned block table (current
   *  layout), vs the legacy separate postings/doclens dirs? Hadoop FS check
   *  so resume works on any FS a committed segment store lives on. */
  private def hasUnifiedBlocks(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/blocks")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Postings view over an on-disk index dir: the kind=0 partition of the
   *  unified block table (directory-pruned; term predicates push into
   *  parquet row-group stats), falling back to a legacy postings dir. */
  def postingsFromDir(spark: SparkSession, dir: String): Dataset[PostingBlock] = {
    import spark.implicits._
    if (hasUnifiedBlocks(spark, dir))
      spark.read.parquet(s"$dir/blocks").filter(col("kind") === 0)
        .select(col("term"), col("bucket"), col("cnt"), col("max_tf"),
          col("sum_tf"), col("docs"), col("tfs")).as[PostingBlock]
    else spark.read.parquet(s"$dir/postings").as[PostingBlock]
  }

  /** Doc-length view over an on-disk index dir (kind=1 partition or the
   *  legacy doclens dir). */
  def docLensFromDir(spark: SparkSession, dir: String): Dataset[DocLenBlock] = {
    import spark.implicits._
    if (hasUnifiedBlocks(spark, dir))
      spark.read.parquet(s"$dir/blocks").filter(col("kind") === 1)
        .select(col("bucket"), col("cnt"), col("min_v").as("min_dl"),
          col("docs").as("ids"), col("tfs").as("dls")).as[DocLenBlock]
    else spark.read.parquet(s"$dir/doclens").as[DocLenBlock]
  }

  /** Persist all index tables (sorted by term so Parquet row-group min/max
   *  statistics prune term lookups, the analogue of the reference's term
   *  dictionary seek in sparse/codec/SparseTermsLuceneReader.java). */
  def write(idx: Index, dir: String): Unit = {
    idx.postings.sortWithinPartitions("term").write.mode("overwrite").parquet(s"$dir/postings")
    idx.docLens.write.mode("overwrite").parquet(s"$dir/doclens")
    idx.termStats.write.mode("overwrite").parquet(s"$dir/termstats")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    Seq(idx.stats).toDS().write.mode("overwrite").parquet(s"$dir/stats")
  }

  def read(spark: SparkSession, dir: String, analyzer: String = Analyzer.Simple): Index = {
    import spark.implicits._
    val stats = spark.read.parquet(s"$dir/stats").as[CorpusStats].head()
    Index(
      postingsFromDir(spark, dir),
      docLensFromDir(spark, dir),
      spark.read.parquet(s"$dir/termstats").as[TermStat],
      stats,
      analyzer
    )
  }
}
