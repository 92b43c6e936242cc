package graft

import graft.index.{InvertedIndex, PostingCodec}
import graft.query.Bm25

/**
 * BM25 rank + score oracle on a tiny deterministic corpus (SURVEY.md §5:
 * golden floats for pure score math, tolerance 1e-4 mirroring the reference's
 * unit-test delta in MinMaxScoreNormalizationTechniqueTests.java:42).
 */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val Eps = 1e-9

  // d0: "a b a c", d1: "a b", d2: "c"  => N=3, avgdl=7/3
  private lazy val idx = InvertedIndex.build(
    Seq((0L, "a b a c"), (1L, "a b"), (2L, "c")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("corpus stats") {
    assert(idx.stats.doc_count == 3)
    assert(idx.stats.sum_dl == 7)
    assert(math.abs(idx.stats.avgdl - 7.0 / 3) < Eps)
  }

  test("term stats: df and ttf") {
    val m = idx.termStats.collect().map(t => t.term -> ((t.df, t.ttf))).toMap
    assert(m == Map("a" -> ((2L, 3L)), "b" -> ((2L, 2L)), "c" -> ((2L, 2L))))
  }

  test("postings round-trip through the compressed blocks") {
    val decoded = idx.postings.collect().flatMap { b =>
      val base = b.bucket << InvertedIndex.BucketBits
      val ids = PostingCodec.decodeDeltas(b.docs, b.cnt)
      val tfs = PostingCodec.decodeInts(b.tfs, b.cnt)
      ids.indices.map(i => (b.term, base + ids(i), tfs(i)))
    }.toSet
    assert(decoded == Set(
      ("a", 0L, 2), ("a", 1L, 1), ("b", 0L, 1), ("b", 1L, 1), ("c", 0L, 1), ("c", 2L, 1)))
  }

  test("single-term BM25 scores match hand-computed goldens") {
    val rows = Bm25.topK(idx, Seq("a"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L)) // rank order
    assert(math.abs(rows(0)._2 - 0.2446115542542862) < 1e-10)
    assert(math.abs(rows(1)._2 - 0.22689830377380343) < 1e-10)
  }

  test("multi-term BM25 sums per-term scores; rank by score desc, docId asc") {
    val rows = Bm25.topK(idx, Seq("a", "c"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq == Seq(0L, 2L, 1L))
    assert(math.abs(rows(0)._2 - 0.4099394640392183) < 1e-10)
    assert(math.abs(rows(1)._2 - 0.2788157122644195) < 1e-10)
    assert(math.abs(rows(2)._2 - 0.22689830377380343) < 1e-10)
  }

  test("limitPerBucket top-k agrees with unlimited scoring") {
    val full = Bm25.scoreTerms(idx, Seq("a", "c"))
      .orderBy($"score".desc, $"doc_id".asc).limit(2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lim = Bm25.topK(idx, Seq("a", "c"), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == lim)
  }

  test("unknown terms score empty, known+unknown mix still works") {
    assert(Bm25.topK(idx, Seq("zzz"), 10).count() == 0)
    assert(Bm25.topK(idx, Seq("zzz", "c"), 10).collect().map(_.getLong(0)).toSeq == Seq(2L, 0L))
  }

  test("docs spanning multiple buckets score correctly") {
    // place docs in two different 4096-doc buckets
    val idx2 = InvertedIndex.build(
      Seq((1L, "x y"), (5000L, "x"), (9000L, "x x z")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(idx2.postings.filter($"term" === "x").count() == 3) // 3 buckets
    val rows = Bm25.topK(idx2, Seq("x"), 10).collect().map(_.getLong(0)).toSeq
    assert(rows.size == 3 && rows.contains(9000L) && rows.contains(5000L) && rows.contains(1L))
    val m = Bm25.topK(idx2, Seq("x"), 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // tf=2 longest doc vs tf=1 shortest: exact check vs direct formula
    val avgdl = 6.0 / 3
    def s(tf: Int, dl: Int, df: Long) = Bm25.idf(df, 3) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
    assert(math.abs(m(9000L) - s(2, 3, 3)) < Eps)
    assert(math.abs(m(5000L) - s(1, 1, 3)) < Eps)
    assert(math.abs(m(1L) - s(1, 2, 3)) < Eps)
  }

  test("synonymTopK: tf sums BEFORE saturation, df blends to the max") {
    // d0 has a twice, d1 has a once and b once, d2 has b once
    val idx4 = InvertedIndex.build(
      Seq((0L, "a a x"), (1L, "a b x"), (2L, "b x x")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Bm25.synonymTopK(idx4, Seq("a", "b"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = 3.0
    val w = Bm25.idf(2L, 3L) // max(df_a=2, df_b=2)
    // d1: synonyms a+b occur once each -> MUST score like tf=2, same as d0
    assert(math.abs(got(0L) - w * Bm25.tfNorm(2, 3, avgdl)) < Eps)
    assert(got(0L) == got(1L), "one occurrence of each synonym == one term twice")
    assert(math.abs(got(2L) - w * Bm25.tfNorm(1, 3, avgdl)) < Eps)
    // and it is NOT the two-independent-terms score (scoreTerms would give
    // d1 two idf*tfNorm(1) contributions > one tfNorm(2))
    val indep = Bm25.topK(idx4, Seq("a", "b"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(indep(1L) > got(1L))
    // unknown synonym set -> empty; validation
    assert(Bm25.synonymTopK(idx4, Seq("zz"), 10).count() == 0)
    intercept[IllegalArgumentException](Bm25.synonymTopK(idx4, Nil, 10))
    intercept[IllegalArgumentException](Bm25.synonymTopK(idx4, Seq("a"), 0))
  }

  test("msearch == the single-request scorer, request by request, bit-exact") {
    val docs = (0L until 40L).map { i =>
      val words = Seq("a", "b", "c", "d", "e").filter(w => (i + w.head) % 3 != 0)
      (i, (words ++ words.take((i % 3).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val idx3 = InvertedIndex.build(docs, "doc_id", "text")
    val reqs = Seq(
      "q0" -> Seq("a", "b"), "q1" -> Seq("c"),
      "q2" -> Seq("b", "d", "e"), "q3" -> Seq("zz")) // q3 matches nothing
    val got = graft.query.Search.msearch(idx3, reqs, 5).collect()
      .groupBy(_.getString(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    for ((qid, terms) <- reqs) {
      val want = Bm25.topK(idx3, terms, 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.getOrElse(qid, Nil) == want, s"request $qid diverges")
    }
    // validation: empty request list, duplicate ids, bad k
    intercept[IllegalArgumentException](graft.query.Search.msearch(idx3, Nil, 5))
    intercept[IllegalArgumentException](
      graft.query.Search.msearch(idx3, Seq("q" -> Seq("a"), "q" -> Seq("b")), 5))
    intercept[IllegalArgumentException](
      graft.query.Search.msearch(idx3, Seq("q" -> Seq("a")), 0))
    // all-unknown-terms batch -> empty result with the right schema
    val empty = graft.query.Search.msearch(idx3, Seq("q" -> Seq("zz")), 5)
    assert(empty.columns.toSeq == Seq("query_id", "rank", "doc_id", "score"))
    assert(empty.count() == 0)
  }
}
