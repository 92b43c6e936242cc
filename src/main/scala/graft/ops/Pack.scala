package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Token-budget shard packing — the training-data sequence-packing step: walk
 * the corpus in a deterministic order and cut a new shard every time the
 * running token count crosses the budget, so each shard holds ~budget tokens
 * of consecutive documents (the data-loader unit for LLM pre-training).
 *
 * Semantics: shard(doc) = floor(exclusive_prefix_sum(tokens) / budget) under
 * the total order — identical to
 * `floor((sum(tokens) OVER (ORDER BY ...) - tokens) / budget)` but without
 * the single-reducer global window: one range repartition gives the global
 * order, a partition-sums collect (bounded by the partition count, not the
 * data) gives each partition its running offset, and a per-partition pass
 * assigns shards — the same two-level prefix-sum shape as
 * [[graft.index.Reorder.denseIds]].
 */
object Pack {

  /**
   * @param orderCols total order (include a unique tiebreaker)
   * @param tokensCol per-row token count column (must be non-negative)
   * @param budget    tokens per shard (> 0)
   * @return input rows plus `shardCol`: the 0-based shard id.
   */
  def byTokenBudget(df: DataFrame, orderCols: Seq[Column], tokensCol: Column,
                    budget: Long, shardCol: String = "shard",
                    partitions: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val withTok = df.withColumn("_pk_tokens", tokensCol.cast("long"))
    val ranged = withTok
      .repartitionByRange(partitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val tokIdx = ranged.schema.fieldIndex("_pk_tokens")
    // ONE RDD instance serves both the offsets job and the output: the two
    // jobs share its shuffle dependency, so the range-repartition's shuffle
    // files are written once and the second job's map stages are skipped —
    // no .cache() (a cached corpus-sized RDD pinned by the result's lineage
    // would leak for the session's lifetime), and no risk of the two passes
    // seeing different range boundaries (same shuffle output, byte-identical)
    val rdd0 = ranged.rdd
    // per-partition token sums -> driver (bounded by partition count);
    // exclusive scan gives each partition its global starting offset
    val partSums = rdd0
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(tokIdx)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = ranged.schema.add(shardCol, LongType, nullable = false)
    val out = rdd0.mapPartitionsWithIndex { (i, it) =>
      var running = offsets(i)
      it.map { r =>
        val shard = running / budget
        running += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ shard)
      }
    }
    spark.createDataFrame(out, schema).drop("_pk_tokens")
  }
}
