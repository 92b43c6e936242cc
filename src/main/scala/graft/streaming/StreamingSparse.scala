package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.analysis.Analyzer
import graft.index.InvertedIndex
import graft.ops.{ClusteredPosting, Seismic, Sparse}

/**
 * Incremental SEISMIC artifact build as a Structured Streaming job — the
 * sparse sibling of [[StreamingIndex]]: the reference flushes a clustered
 * sparse artifact PER SEGMENT at index time and RE-CLUSTERS on segment
 * merge (reference: sparse/codec/SparsePostingsConsumer.java:184-197
 * per-segment flush; sparse/codec/MergeHelper.java:82-143 merge
 * re-clustering). Here each micro-batch's docs encode to sparse vectors
 * and cluster into one committed PART (parquet under
 * `storeDir/sparse<batchId>`), and [[Seismic.mergeClusteredIndexes]] folds
 * the committed parts — LAST-PART-WINS for docs reindexed across batches —
 * into the queryable artifact, sharing the exact merge the batch path
 * uses. Exactly-once comes from the streaming checkpoint (batch replay) +
 * idempotent overwrite-mode part writes keyed by batchId.
 *
 * Scale shape: per-batch work is batch-bounded (the clusterer's groups are
 * <= nPostings rows either way), the merge is one bounded shuffle over
 * recovered member vectors — no driver-side state grows with the stream.
 */
object StreamingSparse {

  /** Start the incremental clustered-sparse build over new parquet files
   *  in `corpusDir`. Parts land in `storeDir/sparse<batchId>`. */
  def start(
      spark: SparkSession,
      corpusDir: String,
      schema: StructType,
      storeDir: String,
      idCol: String,
      textCol: String,
      analyzer: String = Analyzer.Simple,
      nPostings: Int = 160,
      clusterRatio: Double = 0.1,
      summaryPruneRatio: Double = 0.4,
      maxClusters: Int = Int.MaxValue,
      hashAssign: Boolean = false,
      maxFilesPerTrigger: Int = 1
  ): StreamingQuery =
    StreamingIndex.drainEachBatch(spark, corpusDir, schema, storeDir,
      "_sparse_checkpoint", maxFilesPerTrigger) { (batch, batchId) =>
      // per-doc local encoding (tf x token weight — no corpus-level
      // stats), so per-batch vectors equal what a global build derives
      val idx = InvertedIndex.build(batch, idCol, textCol, analyzer)
      val tw = Sparse.encode(idx)
      Seismic.buildClusteredIndex(tw, nPostings, clusterRatio,
          summaryPruneRatio, maxClusters = maxClusters,
          hashAssign = hashAssign)
        .write.mode("overwrite").parquet(s"$storeDir/sparse$batchId")
    }

  /** Drain whatever is currently in `corpusDir` into clustered parts and
   *  merge them (commit order, last-part-wins) into the queryable
   *  artifact — the batch-incremental entry point. */
  def buildAvailableNow(
      spark: SparkSession,
      corpusDir: String,
      storeDir: String,
      idCol: String,
      textCol: String,
      analyzer: String = Analyzer.Simple,
      nPostings: Int = 160,
      clusterRatio: Double = 0.1,
      summaryPruneRatio: Double = 0.4,
      maxClusters: Int = Int.MaxValue,
      hashAssign: Boolean = false
  ): Dataset[ClusteredPosting] = {
    val schema = spark.read.parquet(corpusDir).schema
    val q = start(spark, corpusDir, schema, storeDir, idCol, textCol,
      analyzer, nPostings, clusterRatio, summaryPruneRatio, maxClusters,
      hashAssign)
    q.awaitTermination()
    import spark.implicits._
    val parts = new java.io.File(storeDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sparse"))
      .sortBy(_.getName.stripPrefix("sparse").toLong)
      .map(f => spark.read.parquet(f.getPath)
        .select(col("term"), col("cluster_id"), col("doc_ids"),
          col("doc_tokens"), col("doc_ws"), col("sum_tokens"), col("sum_ws"))
        .as[ClusteredPosting])
      .toSeq
    require(parts.nonEmpty, s"no committed sparse parts under $storeDir")
    Seismic.mergeClusteredIndexes(parts, nPostings, clusterRatio,
      summaryPruneRatio, maxClusters = maxClusters, hashAssign = hashAssign)
  }
}
