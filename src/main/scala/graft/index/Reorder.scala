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
}
