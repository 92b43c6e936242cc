package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.hybrid.{Hybrid, HybridSources, SubQuery}

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
 * nest anything a hybrid clause can: match, term, match_phrase,
 * neural_sparse, knn — against the same [[HybridSources]].
 *
 * Execution is one shuffle: every clause's matched set (one row per doc,
 * posting-proportional, never corpus-sized) is tagged with its clause index
 * and kind, unioned, and aggregated by doc_id. Per-clause scores come back
 * as pivoted columns so the final score is a FIXED left-to-right sum —
 * bit-deterministic across runs and engines, not a float sum in shuffle
 * arrival order. The top-k collection is TakeOrdered (bounded heap per
 * partition + one small merge), like every other scorer here.
 *
 * Lucene semantics notes:
 *  - score = sum of matching `must` + `should` scores (must_not adds 0)
 *  - `minimum_should_match` defaults to 1 when there are should clauses and
 *    NO must clauses, else 0 (BooleanQuery's documented default)
 *  - a purely negative bool (must_not only) needs a match-all base query;
 *    out of scope here — at least one scoring clause is required.
 */
object BoolQuery {

  case class BoolSpec(
      must: Seq[SubQuery] = Nil,
      should: Seq[SubQuery] = Nil,
      mustNot: Seq[SubQuery] = Nil,
      minimumShouldMatch: Option[Int] = None
  ) {
    def effectiveMsm: Int =
      minimumShouldMatch.getOrElse(if (must.isEmpty && should.nonEmpty) 1 else 0)
  }

  /** All qualifying docs with their bool scores, unbounded and unsorted. */
  def score(src: HybridSources, bq: BoolSpec,
            filterDocs: Option[DataFrame] = None): DataFrame = {
    require(bq.must.nonEmpty || bq.should.nonEmpty,
      "bool query requires at least one scoring clause (must or should); " +
        "a purely negative query needs a match_all base, which is out of scope")
    bq.minimumShouldMatch.foreach { m =>
      require(m >= 0 && m <= bq.should.size,
        s"minimum_should_match must be in [0, ${bq.should.size}]")
    }
    val all: Seq[(SubQuery, String)] =
      bq.must.map(_ -> "m") ++ bq.should.map(_ -> "s") ++ bq.mustNot.map(_ -> "n")
    Hybrid.validateClauseSources(src, all.map(_._1))

    val spark = src.idx.postings.sparkSession
    import spark.implicits._

    // no per-bucket collection bound: must-intersection / must_not-exclusion
    // can promote docs from below any bucket-local top-k
    val tagged = all.zipWithIndex.map { case ((sq, kind), i) =>
      Hybrid.scoreClause(src, sq, boundPerBucket = 0)
        .select($"doc_id", $"score", lit(i).as("cid"), lit(kind).as("kind"))
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
      count(when($"kind" === "n", 1)).as("_nn"))
    val agg = union.groupBy($"doc_id")
      .agg((scoreCols ++ countCols).head, (scoreCols ++ countCols).tail: _*)

    val scoringIdx = all.zipWithIndex.collect { case ((_, k), i) if k != "n" => i }
    // fixed left-to-right sum over clause order — deterministic FP
    val total = scoringIdx.foldLeft(lit(0.0)) { (acc, i) =>
      acc + coalesce(col(s"_s$i"), lit(0.0))
    }
    agg.filter($"_nm" === bq.must.size &&
        $"_ns" >= bq.effectiveMsm && $"_nn" === 0)
      .select($"doc_id", total.as("score"))
  }

  /** Top-k page, ordered (score desc, doc_id asc). */
  def topK(src: HybridSources, bq: BoolSpec, k: Int,
           filterDocs: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "size must be >= 1")
    val spark = src.idx.postings.sparkSession
    import spark.implicits._
    score(src, bq, filterDocs).orderBy($"score".desc, $"doc_id".asc).limit(k)
  }
}
