package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.hybrid.{BoolSub, Hybrid, HybridSources, SubQuery}
import graft.index.InvertedIndex

/**
 * Scoring boolean query — Lucene's `BooleanQuery` / the OpenSearch `bool`
 * query (reference: the bool queries neural-search's own IT suites wrap
 * around neural/match clauses, e.g.
 * src/test/java/org/opensearch/neuralsearch/query/NeuralQueryIT.java
 * testBooleanQuery_withMultipleNeuralQueries): `must` clauses all have to
 * match and contribute their score, `should` clauses are optional score
 * boosters (with `minimum_should_match` forcing at least m of them),
 * `must_not` clauses exclude matching docs and never score.
 *
 * Clauses reuse the hybrid [[SubQuery]] ADT and its scorers, so a bool can
 * nest anything a hybrid clause can: match, term, match_phrase, multi_match,
 * neural_sparse, knn, match_all — and [[BoolSub]] itself, since Lucene
 * BooleanQueries nest arbitrarily (the spec type IS the nested-clause type).
 *
 * Execution is one shuffle per nesting level: every clause's matched set
 * (one row per doc, posting-proportional, never corpus-sized unless a
 * match_all demands it) is tagged with its clause index and kind, unioned,
 * and aggregated by doc_id. Per-clause scores come back as pivoted columns
 * so the final score is a FIXED left-to-right sum — bit-deterministic
 * across runs and engines, not a float sum in shuffle arrival order. The
 * top-k collection is TakeOrdered (bounded heap per partition + one small
 * merge), like every other scorer here.
 *
 * Lucene semantics notes:
 *  - score = sum of matching `must` + `should` scores (must_not adds 0)
 *  - `minimum_should_match` defaults to 1 when there are should clauses and
 *    NO must clauses, else 0 (BooleanQuery's documented default)
 *  - a bool with NO scoring clause (must_not only, or filter only) runs in
 *    pure filter context: every live doc not excluded matches with score
 *    0.0 — OpenSearch wraps the implicit MatchAllDocsQuery as a
 *    FILTER clause, which contributes no score.
 */
object BoolQuery {

  /** The bool request shape — the same type as the nested-clause ADT case,
   *  because a top-level bool and a nested bool are the same query. */
  type BoolSpec = BoolSub
  val BoolSpec: BoolSub.type = BoolSub

  /** Top-k page with the per-clause score breakdown — the explain-API
   *  shape: `score` plus one column per scoring clause (`must<i>` /
   *  `should<i>`), null where that clause didn't match the doc. Computed
   *  from the same pivot aggregate the plain path uses, so explain costs
   *  nothing extra. */
  def explainTopK(src: HybridSources, bq: BoolSub, k: Int,
                  filterDocs: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "size must be >= 1")
    require(bq.must.nonEmpty || bq.should.nonEmpty,
      "explain requires at least one scoring clause")
    val spark = src.idx.postings.sparkSession
    import spark.implicits._
    val names = bq.must.indices.map(i => s"must$i") ++
      bq.should.indices.map(i => s"should$i")
    val cols = $"doc_id" +: $"score" +: names.zipWithIndex.map {
      case (n, i) => col(s"_s$i").as(n)
    }
    score(src, bq, filterDocs, keepPivots = true)
      .select(cols: _*)
      .orderBy($"score".desc, $"doc_id".asc).limit(k)
  }

  /** All qualifying docs with their bool scores, unbounded and unsorted. */
  def score(src: HybridSources, bq: BoolSub,
            filterDocs: Option[DataFrame] = None,
            keepPivots: Boolean = false): DataFrame = {
    bq.minimumShouldMatch.foreach { m =>
      require(m >= 0 && m <= bq.should.size,
        s"minimum_should_match must be in [0, ${bq.should.size}]")
    }
    val spark = src.idx.postings.sparkSession
    import spark.implicits._

    if (bq.must.isEmpty && bq.should.isEmpty && bq.filter.isEmpty) {
      // pure exclusion context: live universe minus must_not, score 0.0
      require(bq.mustNot.nonEmpty || filterDocs.nonEmpty,
        "bool query requires at least one clause")
      Hybrid.validateClauseSources(src, bq.mustNot)
      val live = InvertedIndex.liveDocIds(src.idx.docLens)
      val base = filterDocs match {
        case Some(f) => live.join(f.select("doc_id"), Seq("doc_id"), "left_semi")
        case None    => live
      }
      val kept = bq.mustNot
        .map(sq => Hybrid.scoreClause(src, sq, boundPerBucket = 0).select("doc_id"))
        .reduceOption(_ unionByName _) match {
        case Some(ex) => base.join(ex, Seq("doc_id"), "left_anti")
        case None     => base
      }
      return kept.select($"doc_id", lit(0.0).as("score"))
    }

    // kind "f" = FILTER context: required to match, contributes no score
    // (Occur.FILTER). Placed after should so the explain pivot names
    // (must<i>/should<i>) keep their positions.
    val all: Seq[(SubQuery, String)] =
      bq.must.map(_ -> "m") ++ bq.should.map(_ -> "s") ++
        bq.filter.map(_ -> "f") ++ bq.mustNot.map(_ -> "n")
    Hybrid.validateClauseSources(src, all.map(_._1))

    // no per-bucket collection bound: must-intersection / must_not-exclusion
    // can promote docs from below any bucket-local top-k
    val tagged = all.zipWithIndex.map { case ((sq, kind), i) =>
      val scored = sq match {
        // a sparse ANN clause is k-BOUNDED inside its scorer: in scoring
        // context the request filter must reach the ANN search (the
        // union-level semi-join below would post-filter the bounded heap
        // and under-fill it — the same filter-during-search contract the
        // hybrid collection path honors). Exclusion context (must_not)
        // keeps the unfiltered top-k: the excluded set is the ANN result
        // itself, independent of the request filter.
        case sa: graft.hybrid.SparseAnn if kind != "n" =>
          Hybrid.scoreSparseAnn(src, sa, filterDocs)
        case _ => Hybrid.scoreClause(src, sq, boundPerBucket = 0)
      }
      scored.select($"doc_id", $"score", lit(i).as("cid"), lit(kind).as("kind"))
    }
    val union0 = tagged.reduce(_ unionByName _)
    // non-scoring filter applied once to the union (left_semi, no broadcast
    // hint from our code — AQE picks the join per the filter's actual size)
    val union = filterDocs match {
      case Some(f) => union0.join(f.select("doc_id"), Seq("doc_id"), "left_semi")
      case None    => union0
    }

    // one aggregation shuffle: pivot per-clause scores + per-kind match
    // counts. Each clause emits at most one row per doc, so plain counts
    // are exact clause-match counts.
    val scoreCols = all.indices.map(i =>
      max(when($"cid" === i, $"score")).as(s"_s$i"))
    val countCols = Seq(
      count(when($"kind" === "m", 1)).as("_nm"),
      count(when($"kind" === "s", 1)).as("_ns"),
      count(when($"kind" === "f", 1)).as("_nf"),
      count(when($"kind" === "n", 1)).as("_nn"))
    val agg = union.groupBy($"doc_id")
      .agg((scoreCols ++ countCols).head, (scoreCols ++ countCols).tail: _*)

    val scoringIdx = all.zipWithIndex.collect {
      case ((_, k), i) if k == "m" || k == "s" => i }
    // fixed left-to-right sum over clause order — deterministic FP
    val total = scoringIdx.foldLeft(lit(0.0)) { (acc, i) =>
      acc + coalesce(col(s"_s$i"), lit(0.0))
    }
    val gated = agg.filter($"_nm" === bq.must.size &&
      $"_ns" >= bq.effectiveMsm && $"_nf" === bq.filter.size && $"_nn" === 0)
    if (keepPivots)
      gated.select($"doc_id" +: total.as("score") +:
        scoringIdx.map(i => col(s"_s$i")): _*)
    else gated.select($"doc_id", total.as("score"))
  }

  /** Top-k page, ordered (score desc, doc_id asc). */
  def topK(src: HybridSources, bq: BoolSub, k: Int,
           filterDocs: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "size must be >= 1")
    val spark = src.idx.postings.sparkSession
    import spark.implicits._
    score(src, bq, filterDocs).orderBy($"score".desc, $"doc_id".asc).limit(k)
  }
}
