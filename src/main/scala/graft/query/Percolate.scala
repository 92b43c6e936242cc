package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/** The `percolate` query — search INVERTED: queries are registered as data,
 *  and each incoming document returns the queries that match it (the
 *  alerting / saved-search primitive; reference context: OpenSearch's
 *  percolator indexes query DSL into a queries index and, per document,
 *  runs only the TERM-CANDIDATE queries against an in-memory index of that
 *  document).
 *
 *  Registered form: one row per query — (query_id, terms, msm, not_terms):
 *  a disjunction of analyzed terms gated by minimum_should_match, minus
 *  documents containing any prohibited term. That is the percolator's
 *  candidate-extraction shape: the reference extracts each query's term set
 *  at registration time precisely so matching can be driven FROM the terms.
 *
 *  Scale shape: the registered queries explode into a (term -> query)
 *  posting table — the queries ARE the indexed side — and the document
 *  batch's tokens join it on the term: only (doc, query) pairs sharing at
 *  least one term ever materialize (the candidate prefilter), one
 *  aggregation counts distinct matched terms per pair against msm, and
 *  prohibited terms anti-join the survivors. Three bounded shuffles total
 *  for ANY number of registered queries × documents — no per-query scan,
 *  no per-document loop. */
object Percolate {

  /** One registered percolation query. */
  case class Registered(queryId: Long, terms: Seq[String], msm: Int,
                        notTerms: Seq[String] = Nil)

  /** (doc_id, query_id) pairs: which registered queries match each doc. */
  def matches(spark: SparkSession, queries: Seq[Registered],
              docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
              analyzer: String = Analyzer.Simple): DataFrame = {
    require(queries.nonEmpty, "percolate requires at least one registered query")
    queries.foreach { q =>
      require(q.terms.nonEmpty, s"query ${q.queryId} has no terms")
      require(q.msm >= 1 && q.msm <= q.terms.distinct.size,
        s"query ${q.queryId}: msm ${q.msm} out of [1, ${q.terms.distinct.size}]")
    }
    require(queries.map(_.queryId).distinct.size == queries.size,
      "duplicate query_id in registered set")
    import spark.implicits._

    // the queries-as-postings tables; registered sets are broadcast-sized
    // relative to the document batch, but the joins below do not REQUIRE
    // that — a million-query registry shuffles like any dimension table
    val qTerms = queries
      .flatMap(q => q.terms.distinct.map(t => (q.queryId, t, q.msm)))
      .toDF("query_id", "term", "msm")
    val qNot = queries
      .flatMap(q => q.notTerms.distinct.map(t => (q.queryId, t)))
      .toDF("query_id", "not_term")

    val tok = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, t) =>
        Analyzer.analyze(analyzer)(t).distinct.map(id -> _)
      }
      .toDF("doc_id", "term")

    val candidates = tok.join(qTerms, "term")
      .groupBy($"doc_id", $"query_id", $"msm")
      .agg(count(lit(1)).as("hits"))
      .where($"hits" >= $"msm")
      .select($"doc_id", $"query_id")

    if (queries.forall(_.notTerms.isEmpty)) candidates
    else {
      val prohibited = tok.join(qNot, $"term" === $"not_term")
        .select($"doc_id", $"query_id")
      candidates.join(prohibited, Seq("doc_id", "query_id"), "left_anti")
    }
  }
}
