package graft.stats

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Query-side event counters — the engine analogue of the reference's
 * event-stat registry (stats/events/EventStatName.java: per-query-type and
 * per-processor counters like `hybrid_query_requests`,
 * `norm_minmax_executions`, `comb_arithmetic_executions`), using the same
 * stat names.
 *
 * All increments happen DRIVER-SIDE at query/processor construction — never
 * inside tasks — so counts are deterministic and partition-independent
 * (task-side counting would multiply by retries and partition counts).
 * Data-plane build metrics stay in [[graft.index.Segments]]'s SegmentMetric;
 * this registry is the query/control-plane complement, exactly the
 * reference's split between InfoStats and event stats.
 */
object EventStats {

  private val counters = new ConcurrentHashMap[String, LongAdder]()

  def increment(name: String): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).increment()

  def reset(): Unit = counters.clear()

  def value(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  /** Snapshot as (stat_name, value), one row per counter that fired. */
  def snapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    counters.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.sum()))
      .sortBy(_._1)
      .toDF("stat_name", "value")
  }
}
