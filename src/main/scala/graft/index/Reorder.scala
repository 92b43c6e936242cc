package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Globally dense doc-id reassignment by a static ordering key — document
 * reordering, the classic impact-ordered-index trick: renumber docs so that
 * high-impact documents (short docs under BM25's length norm) share id
 * ranges, which concentrates top-k candidates into few 4096-doc buckets and
 * gives block-max WAND real skip opportunities. On an arrival-ordered corpus
 * impact is uniform across buckets and bucket-level upper bounds prune
 * nothing (see BENCH/BASELINE.md); after reordering the bucket frontier is
 * skewed by construction.
 *
 * The reference gets this ordering implicitly from Lucene's index-time sort
 * (Lucene `IndexWriterConfig.setIndexSort`); here it is an explicit
 * build-time corpus transform.
 *
 * Scale shape: one range repartition by the sort key (a total order — ties
 * broken by the old id, so the result is deterministic and independent of
 * sampling boundaries), one partition-count pass, one zip pass. No global
 * single-partition sort, no driver-side data beyond `partitions` counts.
 */
object Reorder {

  /**
   * Append a dense 0-based id column assigning ranks under
   * (orderCols, total order). Equivalent to `row_number() OVER (ORDER BY
   * orderCols) - 1` but without the single-reducer window: range
   * partitioning gives the global order across partitions, zipWithIndex
   * numbers within it.
   */
  def denseIds(df: DataFrame, orderCols: Seq[Column], newIdCol: String,
               partitions: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(partitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = ranged.schema.add(newIdCol, LongType, nullable = false)
    // zipWithIndex = one count job for partition offsets + one numbering
    // pass; the canonical dense-global-rank shape at any scale
    val rdd = ranged.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Index-time sort persisted for query-time EARLY TERMINATION — Lucene's
   *  `index.sort` contract (IndexWriterConfig.setIndexSort + the
   *  TopFieldCollector early-exit when the query sort matches the index
   *  sort), re-expressed as storage layout: the corpus writes PARTITIONED
   *  by a coarse range bucket of the sort key (`_sb = floor(key/width)`,
   *  a directory per bucket), rows sorted within. A matching-sort top-k
   *  then needs only the leading buckets. */
  def sortedWrite(docs: DataFrame, sortCol: String, bucketWidth: Long,
                  path: String): Unit = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    docs.withColumn("_sb", floor(col(sortCol) / bucketWidth).cast("long"))
      .repartition(col("_sb"))
      .sortWithinPartitions(col(sortCol))
      .write.partitionBy("_sb").mode("overwrite").parquet(path)
  }

  /** Early-terminating top-k over a [[sortedWrite]] layout: walk the range
   *  buckets in sort order, summing row counts read DIRECTLY from the
   *  parquet footers of each bucket directory (no Spark job, no data pages
   *  — `ParquetFileReader.getRecordCount` is row-group metadata) until the
   *  cumulative count covers k, then run the final bounded top-k over ONLY
   *  those buckets — the `_sb` predicate is a PARTITION filter, so trailing
   *  buckets are pruned at the directory level and never scanned. The
   *  driver loop is bounded by the covering-prefix bucket count (coarse,
   *  metadata-sized), exactly Lucene's early-terminated segment walk. */
  def sortedTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                 sortCol: String, idCol: String, k: Int): DataFrame = {
    val all = spark.read.parquet(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(conf)
    // bucket directories straight from the filesystem listing (the same
    // names partition-column discovery infers `_sb` from)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_sb="))
      .map(st => (st.getPath.getName.stripPrefix("_sb=").toLong, st.getPath))
      .sortBy(_._1)
    def footerCount(dir: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(dir).iterator
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
          try r.getRecordCount finally r.close()
        }.sum
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cum = 0L
    val it = buckets.iterator
    while (cum < k && it.hasNext) {
      val (sb, dir) = it.next()
      chosen += sb
      cum += footerCount(dir)
    }
    all.where(col("_sb").isin(chosen.toSeq.map(Long.box): _*))
      .orderBy(col(sortCol).asc, col(idCol).asc)
      .limit(k)
      .drop("_sb")
  }
}
