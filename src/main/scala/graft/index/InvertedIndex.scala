package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/** One analyzed token occurrence group: (doc, term) with tf, plus doc length. */
case class Token(doc_id: Long, term: String, tf: Int, dl: Int)

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
 *  (reference: sparse/codec/SparseDocValuesConsumer.java). */
case class DocLenBlock(bucket: Long, cnt: Int, ids: Array[Byte], dls: Array[Byte])

/** Per-term statistics feeding BM25 idf (Lucene TermStatistics analogue;
 *  reference stubs these in sparse/codec/SparseTerms.java:54-66 and delegates
 *  real BM25 stats to Lucene core). */
case class TermStat(term: String, df: Long, ttf: Long)

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

  /** Analyze `textCol` into (doc_id, term, tf, dl) rows. Single map-side pass,
   *  no shuffle: per-doc tf aggregation happens inside the flatMap. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String, analyzer: String): Dataset[Token] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val an = analyzer
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].flatMap {
      case (docId, text) =>
        val toks = Analyzer.analyze(an)(text)
        val dl = toks.length
        val tfs = new java.util.HashMap[String, Array[Int]]()
        var i = 0
        while (i < toks.length) {
          val cell = tfs.get(toks(i))
          if (cell == null) tfs.put(toks(i), Array(1)) else cell(0) += 1
          i += 1
        }
        val out = new Array[Token](tfs.size)
        val it = tfs.entrySet().iterator()
        var j = 0
        while (it.hasNext) {
          val e = it.next()
          out(j) = Token(docId, e.getKey, e.getValue()(0), dl)
          j += 1
        }
        out
    }
  }

  /**
   * Build the full index from a corpus DataFrame.
   *
   * Shuffle profile (scale-first): one hash shuffle keyed (term, bucket) for
   * postings — every group ≤ 4096 rows by construction — plus one keyed
   * (bucket) for doc lengths, plus a partial+final agg for term stats that
   * runs over the already-small block rows, not raw tokens.
   */
  def build(docs: DataFrame, idCol: String, textCol: String, analyzer: String = Analyzer.Simple): Index = {
    val spark = docs.sparkSession
    import spark.implicits._

    val tokens = tokenize(docs, idCol, textCol, analyzer)

    val postings = tokens
      .groupByKey(t => (t.term, t.doc_id >> BucketBits))
      .mapGroups { (key: (String, Long), it: Iterator[Token]) =>
        val (term, bucket) = key
        val arr = it.toArray.sortBy(_.doc_id)
        val base = bucket << BucketBits
        val ids = new Array[Int](arr.length)
        val tfs = new Array[Int](arr.length)
        var maxTf = 0
        var sumTf = 0L
        var i = 0
        while (i < arr.length) {
          ids(i) = (arr(i).doc_id - base).toInt
          tfs(i) = arr(i).tf
          if (arr(i).tf > maxTf) maxTf = arr(i).tf
          sumTf += arr(i).tf
          i += 1
        }
        PostingBlock(term, bucket, arr.length, maxTf, sumTf,
          PostingCodec.encodeDeltas(ids), PostingCodec.encodeInts(tfs))
      }

    val docLens = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (docId, text) => (docId, Analyzer.analyze(analyzer)(text).length) }
      .groupByKey { case (docId, _) => docId >> BucketBits }
      .mapGroups { (bucket: Long, it: Iterator[(Long, Int)]) =>
        val arr = it.toArray.sortBy(_._1)
        val base = bucket << BucketBits
        val ids = arr.map(x => (x._1 - base).toInt)
        val dls = arr.map(_._2)
        DocLenBlock(bucket, arr.length, PostingCodec.encodeDeltas(ids), PostingCodec.encodeInts(dls))
      }

    val termStats = postings
      .groupBy($"term")
      .agg(sum($"cnt").as("df"), sum($"sum_tf").as("ttf"))
      .as[TermStat]

    val statsRow = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (_, text) => Analyzer.analyze(analyzer)(text).length.toLong }
      .agg(count(lit(1)).as("doc_count"), sum($"value").as("sum_dl"))
      .as[(Long, Long)]
      .head()
    val stats = CorpusStats(statsRow._1, statsRow._2,
      if (statsRow._1 == 0) 0.0 else statsRow._2.toDouble / statsRow._1)

    Index(postings, docLens, termStats, stats, analyzer)
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
      spark.read.parquet(s"$dir/postings").as[PostingBlock],
      spark.read.parquet(s"$dir/doclens").as[DocLenBlock],
      spark.read.parquet(s"$dir/termstats").as[TermStat],
      stats,
      analyzer
    )
  }
}
