package graft

import org.apache.spark.sql.functions._
import graft.ops.Aggs
import graft.ops.Aggs.CompositeSource

/** Composite aggregation: cursor pagination must be exactly a re-slicing of
 *  the one global bucket order, the coarse cursor bound must reach the
 *  parquet scan, and directions/validation must hold. */
class AggsSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 300).map { i =>
    (i.toLong, s"s${i % 7}", s"l${i % 3}", (i * 37 % 230).toLong)
  }.toDF("doc_id", "source", "lang", "n_chars")

  private val srcs = Seq(
    CompositeSource("src", col("source")),
    CompositeSource("lg", col("lang")),
    CompositeSource("bin", (col("n_chars") / 50).cast("long") * 50))

  private val mets = Seq(count(lit(1)).as("n_docs"), sum($"n_chars").as("s"))

  test("composite pages re-slice the global bucket order exactly") {
    val full = rows.groupBy($"source".as("src"), $"lang".as("lg"),
        ((col("n_chars") / 50).cast("long") * 50).as("bin"))
      .agg(mets.head, mets.tail: _*)
      .orderBy($"src", $"lg", $"bin")
      .collect().toSeq
    // walk with size 10: concatenated pages == full order, page tags right
    val walked = Aggs.compositeWalk(rows, srcs, 10, mets).collect().toSeq
    assert(walked.map(_.toSeq.dropRight(1)) == full.map(_.toSeq))
    assert(walked.map(_.getInt(walked.head.length - 1)) ==
      full.indices.map(_ / 10))
    // a single page with an explicit mid-stream cursor == the next slice
    val a = full(24)
    val page = Aggs.composite(rows, srcs, 10, mets,
      after = Some(Seq(a.get(0), a.get(1), a.get(2)))).collect().toSeq
    assert(page.map(_.toSeq) == full.slice(25, 35).map(_.toSeq))
  }

  test("boxplot: interpolated quartiles, whiskers exclude outliers but snap to observed values") {
    // sorted [-30,1..9,40]: linear-interpolation quartiles 2.5/5/7.5,
    // IQR 5 -> fences [-5, 15]: whiskers snap to the extreme OBSERVED
    // values inside (1 and 9), while min/max keep the true extremes
    val v = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 40, -30).map(_.toDouble).toDF("v")
    val r = Aggs.boxplot(v, "v").collect().head
    assert(r.getDouble(r.fieldIndex("min_v")) == -30.0)
    assert(r.getDouble(r.fieldIndex("q1")) == 2.5)
    assert(r.getDouble(r.fieldIndex("q2")) == 5.0)
    assert(r.getDouble(r.fieldIndex("q3")) == 7.5)
    assert(r.getDouble(r.fieldIndex("max_v")) == 40.0)
    assert(r.getDouble(r.fieldIndex("lower_whisker")) == 1.0)
    assert(r.getDouble(r.fieldIndex("upper_whisker")) == 9.0)
  }

  test("t_test matches the textbook Welch / pooled values") {
    // arms a = [2.1,3.4,1.9,4.0,2.8,3.3], b = [1.2,2.2,1.8,2.9,1.1]:
    // Welch t = 2.297841, Welch-Satterthwaite df = 8.873515,
    // pooled t = 2.278575 (scipy.stats.ttest_ind reference values)
    val rows =
      (Seq(2.1, 3.4, 1.9, 4.0, 2.8, 3.3).map(("a", _)) ++
        Seq(1.2, 2.2, 1.8, 2.9, 1.1).map(("b", _))).toDF("arm", "v")
    val r = Aggs.tTest(rows, col("arm") === "a", col("arm") === "b", "v")
      .collect().head
    assert(r.getLong(r.fieldIndex("n1")) == 6L)
    assert(r.getLong(r.fieldIndex("n2")) == 5L)
    assert(math.abs(r.getDouble(r.fieldIndex("t_welch")) - 2.297841) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("df_welch")) - 8.873515) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("t_pooled")) - 2.278575) < 1e-6)
  }

  test("t_test ignores rows whose value is NULL") {
    // a null-valued row in each arm must contribute to NEITHER n nor the
    // power sums (the reference ignores docs missing the field) — the
    // statistics are identical to the textbook fixture above
    val rows =
      (Seq(2.1, 3.4, 1.9, 4.0, 2.8, 3.3).map(v => ("a", Option(v))) ++
        Seq(1.2, 2.2, 1.8, 2.9, 1.1).map(v => ("b", Option(v))) ++
        Seq(("a", Option.empty[Double]), ("b", Option.empty[Double])))
        .toDF("arm", "v")
    val r = Aggs.tTest(rows, col("arm") === "a", col("arm") === "b", "v")
      .collect().head
    assert(r.getLong(r.fieldIndex("n1")) == 6L)
    assert(r.getLong(r.fieldIndex("n2")) == 5L)
    assert(math.abs(r.getDouble(r.fieldIndex("t_welch")) - 2.297841) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("df_welch")) - 8.873515) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("t_pooled")) - 2.278575) < 1e-6)
  }

  test("termsSharded: error bound brackets the true count; exhaustive shards are exact") {
    // skewed keys over 3 shards: shard = id % 3, key frequency decays
    val rows = (0L until 300L).map { i =>
      (i, s"k${(i * i) % 17 % (1 + i % 5)}")
    }.toDF("id", "key")
    val truth = rows.groupBy($"key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Aggs.termsSharded(rows, $"key", $"id" % 3, shardSize = 3, size = 3)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (k, dc, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      // soundness: received <= true <= received + error bound
      assert(dc <= truth(k), s"$k received $dc > true ${truth(k)}")
      assert(truth(k) <= dc + err, s"$k true ${truth(k)} > $dc + $err")
    }
    // shard_size covering the whole keyspace -> exact counts, zero error
    val exact = Aggs.termsSharded(rows, $"key", $"id" % 3, shardSize = 50, size = 5)
      .collect()
    exact.foreach { r =>
      assert(r.getLong(1) == truth(r.getString(0)))
      assert(r.getLong(2) == 0L)
    }
    intercept[IllegalArgumentException] {
      Aggs.termsSharded(rows, $"key", $"id" % 3, shardSize = 2, size = 5)
    }
  }

  test("significant_text: filter_duplicate_text drops repeated text before counting") {
    import graft.index.InvertedIndex
    // docs 1 and 2 are IDENTICAL boilerplate containing 'promo'; doc 3 is
    // unique. With dedupe the boilerplate counts once (fg_df = 1), without
    // it twice — the background stays the full 6-doc index either way.
    val docs = Seq(
      (1L, "promo sale now"), (2L, "promo sale now"), (3L, "alpha promo beta"),
      (4L, "gamma delta"), (5L, "epsilon zeta"), (6L, "eta theta")
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    val fg = Seq(1L, 2L, 3L).toDF("doc_id")
    def fgDfOf(df: org.apache.spark.sql.DataFrame, t: String): Long =
      df.where(col("term") === t).select("fg_df").collect()
        .headOption.map(_.getLong(0)).getOrElse(0L)
    val dd = graft.query.SignificantTerms.text(idx, docs, "text", fg, 20)
    val raw = graft.query.SignificantTerms.text(idx, docs, "text", fg, 20,
      filterDuplicateText = false)
    assert(fgDfOf(dd, "promo") == 2L)  // doc1-or-2 (first wins) + doc3
    assert(fgDfOf(raw, "promo") == 3L)
    // JLH positivity filter: background-flat terms never appear
    assert(!dd.collect().map(_.getString(0)).contains("theta"))
  }

  test("composite honors per-source desc direction") {
    val s2 = Seq(CompositeSource("src", col("source"), desc = true),
                 CompositeSource("lg", col("lang")))
    val full = rows.groupBy($"source".as("src"), $"lang".as("lg"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("s"))
      .orderBy($"src".desc, $"lg".asc).collect().toSeq
    val m2 = Seq(count(lit(1)).as("n_docs"), sum($"n_chars").as("s"))
    val p1 = Aggs.composite(rows, s2, 8, m2).collect().toSeq
    assert(p1.map(_.toSeq) == full.take(8).map(_.toSeq))
    val last = p1.last
    val p2 = Aggs.composite(rows, s2, 8, m2,
      after = Some(Seq(last.get(0), last.get(1)))).collect().toSeq
    assert(p2.map(_.toSeq) == full.slice(8, 16).map(_.toSeq))
  }

  test("coarse cursor bound on a raw first key reaches the parquet scan") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/aggs_spec_${System.nanoTime()}"
    rows.write.parquet(dir)
    val pq = spark.read.parquet(dir)
    val plan = Aggs.composite(pq, srcs, 10, mets,
        after = Some(Seq("s3", "l1", 100L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(source,s3)"), plan.take(2000))
  }

  test("composite validation") {
    intercept[IllegalArgumentException](Aggs.composite(rows, Nil, 10, mets))
    intercept[IllegalArgumentException](Aggs.composite(rows, srcs, 0, mets))
    intercept[IllegalArgumentException](Aggs.composite(rows, srcs, 10, Nil))
    intercept[IllegalArgumentException](
      Aggs.composite(rows, srcs, 10, mets, after = Some(Seq("s1"))))
  }

  private def tsRows(spanSeconds: Long, n: Int) = {
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    (0 until n).map(i => (i.toLong, base + i * spanSeconds / math.max(1, n - 1)))
      .toDF("id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
  }

  test("auto_date_histogram picks the smallest ladder rung within target") {
    // 2-hour span, target 10: 300 s gives 25 anchored buckets (> 10),
    // 1800 s gives 5 (<= 10) -> the 1800 rung must win
    val out = Aggs.autoDateHistogram(tsRows(7200L, 500), "ts", 10).collect()
    assert(out.forall(_.getLong(2) == 1800L), out.mkString(","))
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).sum == 500L)
    // every bucket start is anchored on its interval
    assert(out.forall(r => r.getLong(0) % 1800L == 0L))
  }

  test("auto_date_histogram bucket count respects the target at any rung") {
    for (span <- Seq(100L, 3600L, 86400L * 3, 86400L * 40)) {
      val out = Aggs.autoDateHistogram(tsRows(span, 200), "ts", 15).collect()
      assert(out.length <= 15, s"span=$span gave ${out.length} buckets")
    }
  }

  test("auto_date_histogram falls back to the widest rung and validates") {
    // 10-year span cannot fit 15 buckets of 30 d -> widest rung, count > target
    val out = Aggs.autoDateHistogram(tsRows(86400L * 3650, 300), "ts", 15).collect()
    assert(out.forall(_.getLong(2) == 2592000L))
    intercept[IllegalArgumentException](
      Aggs.autoDateHistogram(tsRows(100L, 10), "ts", 0))
    intercept[IllegalArgumentException](
      Aggs.autoDateHistogram(tsRows(100L, 10), "ts", 5, ladderSeconds = Seq(300L, 60L)))
    // empty input -> empty result, no NPE from the min/max pre-pass
    assert(Aggs.autoDateHistogram(tsRows(100L, 10).where(lit(false)), "ts", 5)
      .collect().isEmpty)
  }
}
