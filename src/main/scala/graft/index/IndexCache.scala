package graft.index

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer

/**
 * Session-lifetime cache of built indexes keyed by (corpus dir, analyzer) —
 * the analogue of the reference's warmed posting cache
 * (reference: transport/NeuralSparseWarmupTransportAction.java; sparse cache pkg),
 * realized as Spark `persist()`. The merged block Dataset (the one
 * analyze+shuffle pass) is persisted FIRST and every index table derives from
 * it, so warming runs the expensive pass exactly once.
 */
object IndexCache {
  // keyed by applicationId too: a persisted Index bound to a stopped
  // SparkContext would fail at action time when sessions cycle in one JVM
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, String, String), Index]

  /** Drop every cached entry that belongs to another (stopped) application —
   *  session-cycling JVMs (the bench) would otherwise pin dead plans and
   *  cached-DataFrame references for the JVM's lifetime. */
  def evictOthers(appId: String): Unit =
    cache.keySet.filter(_._1 != appId).foreach(cache.remove)

  /** The single-Dataset session artifacts (positions, semantic chunk
   *  tables) live behind the memory-accounted LRU tier ([[BoundedCache]] —
   *  the reference's cache/ package: LRU recency, byte accounting against a
   *  limit, breaker-refused admissions reading through). The limit is
   *  effectively unbounded on the 128 GiB local harness unless configured
   *  (-Dgraft.cache.limitBytes); on a memory-tight cluster the bound turns
   *  cold artifacts back into recomputable lineage instead of letting
   *  Spark's block-level storage eviction shred hot ones. */
  val artifacts: BoundedCache[(String, String, String)] =
    new BoundedCache(
      sys.props.get("graft.cache.limitBytes").map(_.toLong).getOrElse(1L << 40))

  /** Positional block table over `documents.parquet` (the `.pos` analogue),
   *  warmed once per session like the main index. */
  def positions(spark: SparkSession, sfDir: String,
                analyzer: String = Analyzer.Simple): org.apache.spark.sql.Dataset[PosBlock] = {
    artifacts.retainKeys(_._1 == spark.sparkContext.applicationId)
    artifacts.get((spark.sparkContext.applicationId, s"$sfDir/documents.parquet#pos", analyzer)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Positions.build(docs, "doc_id", "text", analyzer)
    }
  }

  /** Positional blocks over a NON-text corpus column ([[corpusField]]'s
   *  positional analogue) — multi_match type=phrase verifies per-field
   *  adjacency against these. */
  def corpusFieldPositions(spark: SparkSession, sfDir: String, column: String,
                           analyzer: String = Analyzer.Simple): org.apache.spark.sql.Dataset[PosBlock] = {
    artifacts.retainKeys(_._1 == spark.sparkContext.applicationId)
    artifacts.get((spark.sparkContext.applicationId, s"$sfDir#$column#pos", analyzer)) {
      val corpus = graft.corpus.Corpus.ingest(spark, sfDir)
      Positions.build(corpus, "doc_id", column, analyzer)
    }
  }

  /** Session-cached semantic chunk sub-field tables. These are INDEX-time
   *  artifacts — the reference's semantic field mapper generates the chunk
   *  embeddings at ingest and stores them in the index; a query must never
   *  re-encode the corpus. Entries/benches that measure the ingest itself
   *  call the builders directly. */
  def semanticDense(spark: SparkSession, sfDir: String,
                    tokenLimit: Int = 20): org.apache.spark.sql.DataFrame = {
    artifacts.retainKeys(_._1 == spark.sparkContext.applicationId)
    artifacts.get((spark.sparkContext.applicationId, s"$sfDir#dense", s"$tokenLimit")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.Semantic.ingestDense(docs, "doc_id", "text", tokenLimit)
    }
  }

  /** Chunk-vector IVF artifact for the PROBE-ROUTED dense semantic path
   *  ([[graft.ops.Semantic.denseChunkIvf]]) — built once per (session,
   *  sfDir) like every index-time structure; queries only read probed
   *  `c_id` partitions off it. */
  private val denseIvfCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  def semanticDenseIvf(spark: SparkSession, sfDir: String, tokenLimit: Int = 20,
                       dims: Int = 8, nCentroids: Int = 16):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val app = spark.sparkContext.applicationId
    denseIvfCache.keySet.filter(_._1 != app).foreach(denseIvfCache.remove)
    denseIvfCache.getOrElseUpdate((app, s"$sfDir#denseivf/$tokenLimit/$dims/$nCentroids"), {
      val path = s"target/semivf/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}_$dims"
      graft.ops.Semantic.denseChunkIvf(
        semanticDense(spark, sfDir, tokenLimit), "doc_id", dims, nCentroids, path)
    })
  }

  def semanticSparse(spark: SparkSession, sfDir: String,
                     tokenLimit: Int = 20): org.apache.spark.sql.DataFrame = {
    artifacts.retainKeys(_._1 == spark.sparkContext.applicationId)
    artifacts.get((spark.sparkContext.applicationId, s"$sfDir#sparse", s"$tokenLimit")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.Semantic.ingestSparse(docs, "doc_id", "text", tokenLimit)
    }
  }

  /** Index over a NON-text column of the north-rule corpus projection
   *  ([[graft.corpus.Corpus.ingest]]) — e.g. `path` for multi_match
   *  queries. Each field is its own full index (postings, doc lengths,
   *  collection stats), exactly Lucene's per-field inverted index; the
   *  build shares the single-pass fragment shape with the primary index
   *  and is warmed/persisted per session the same way. */
  def corpusField(spark: SparkSession, sfDir: String, column: String,
                  analyzer: String = Analyzer.Simple): Index = {
    evictOthers(spark.sparkContext.applicationId)
    cache.getOrElseUpdate((spark.sparkContext.applicationId, s"$sfDir#$column", analyzer), {
      val corpus = graft.corpus.Corpus.ingest(spark, sfDir)
      val blocks = InvertedIndex.mergedBlocksOf(corpus, "doc_id", column, analyzer).persist()
      blocks.count()
      val postings = InvertedIndex.postingsFromBlocks(blocks).persist()
      val docLens = InvertedIndex.docLensFromBlocks(blocks).persist()
      val termStats = InvertedIndex.termStatsOf(postings).persist()
      val stats = InvertedIndex.statsOf(docLens)
      Index(postings, docLens, termStats, stats, analyzer)
    })
  }

  /** Index over the derived `title` field of the documents corpus — the
   *  first 5 whitespace tokens of `text`. A short sibling field whose
   *  vocabulary is a SUBSET of text's, so a combined_fields query over
   *  (text, title) genuinely merges per-field term frequencies before
   *  saturation (the property disjoint-vocabulary fields like `path`
   *  cannot exercise). Built and warmed like any per-field index. */
  def documentsTitle(spark: SparkSession, sfDir: String): Index = {
    import org.apache.spark.sql.functions.{col, concat_ws, slice, split}
    evictOthers(spark.sparkContext.applicationId)
    cache.getOrElseUpdate(
      (spark.sparkContext.applicationId, s"$sfDir#title", Analyzer.Simple), {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("title"))
        val blocks = InvertedIndex.mergedBlocksOf(docs, "doc_id", "title",
          Analyzer.Simple).persist()
        blocks.count()
        val postings = InvertedIndex.postingsFromBlocks(blocks).persist()
        val docLens = InvertedIndex.docLensFromBlocks(blocks).persist()
        val termStats = InvertedIndex.termStatsOf(postings).persist()
        val stats = InvertedIndex.statsOf(docLens)
        Index(postings, docLens, termStats, stats, Analyzer.Simple)
      })
  }

  /** Index over `documents.parquet` in sfDir (doc_id, text). */
  def documents(spark: SparkSession, sfDir: String, analyzer: String = Analyzer.Simple): Index = {
    evictOthers(spark.sparkContext.applicationId)
    cache.getOrElseUpdate((spark.sparkContext.applicationId, s"$sfDir/documents.parquet", analyzer), {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val blocks = InvertedIndex.mergedBlocksOf(docs, "doc_id", "text", analyzer).persist()
      blocks.count() // one materialization of the analyze + fragment shuffle
      val postings = InvertedIndex.postingsFromBlocks(blocks).persist()
      val docLens = InvertedIndex.docLensFromBlocks(blocks).persist()
      val termStats = InvertedIndex.termStatsOf(postings).persist()
      val stats = InvertedIndex.statsOf(docLens)
      Index(postings, docLens, termStats, stats, analyzer)
    })
  }
}
