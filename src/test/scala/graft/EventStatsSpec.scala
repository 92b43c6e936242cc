package graft

import graft.stats.EventStats
import org.scalatest.funsuite.AnyFunSuite

/** Registry semantics for the query-side event counters (reference:
 *  stats/events/EventStatName.java). Uses suite-unique stat names and no
 *  reset() so concurrent suites (and the query_stats oracle scenario, which
 *  owns reset) cannot interfere. */
class EventStatsSpec extends AnyFunSuite {

  test("increment accumulates per name and value() defaults to 0") {
    assert(EventStats.value("evspec_never_fired") == 0L)
    EventStats.increment("evspec_a")
    EventStats.increment("evspec_a")
    EventStats.increment("evspec_b")
    assert(EventStats.value("evspec_a") == 2L)
    assert(EventStats.value("evspec_b") == 1L)
  }

  test("snapshot lists fired counters sorted by name with their counts") {
    EventStats.increment("evspec_snap_y")
    EventStats.increment("evspec_snap_x")
    EventStats.increment("evspec_snap_x")
    val rows = EventStats.snapshot(TestSpark.spark)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val mine = rows.filter(_._1.startsWith("evspec_snap_"))
    assert(mine.toSeq == Seq("evspec_snap_x" -> 2L, "evspec_snap_y" -> 1L))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
  }

  test("concurrent increments from many threads lose no counts") {
    val threads = (0 until 8).map(_ => new Thread(() =>
      (0 until 1000).foreach(_ => EventStats.increment("evspec_conc"))))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(EventStats.value("evspec_conc") == 8000L)
  }
}
