package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Bound, BoundMode, Combine}
import graft.hybrid._
import graft.index.IndexCache
import graft.query.Bm25

/**
 * Hybrid-query entries for the driver's correctness gate, plus a DuckDB
 * oracle-SQL generator that mirrors the exact pipeline shape
 * (per-sub-query BM25 -> top-depth -> normalize -> zero-filled align ->
 * combine -> page). Keeping the Spark plan and the SQL generator side by
 * side guarantees the oracle tests the same semantics SURVEY.md §3.1 maps
 * from the reference.
 */
object HybridEntries {

  // fixed sub-query shapes over the `documents` corpus (FIXTURES.md §2)
  private val A = Seq("join", "hash")
  private val B = Seq("merge", "sort", "window")
  private val C = Seq("dup", "key")

  private val Depth = 50

  private def q(sub: Seq[Seq[String]], norm: Normalization, comb: Combination,
                k: Int = 10, from: Int = 0, minScore: Option[Double] = None) =
    HybridQuery(sub.map(t => SubQuery(t)), norm, comb, k = k, depth = Depth, from = from,
      minScore = minScore)

  private def run(query: HybridQuery, langFilter: Option[String] = None)(
      s: SparkSession, dir: String): DataFrame = {
    val idx = IndexCache.documents(s, dir)
    val filter = langFilter.map(l =>
      s.read.parquet(s"$dir/documents.parquet").where(col("lang") === l).select("doc_id"))
    Hybrid.execute(idx, query, filter)
      .select(col("doc_id"), round(col("score"), 4).as("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_minmax_arith" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic))) _,
    "hybrid_k100" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic), k = 100)) _,
    "hybrid_minmax_weighted" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic, Seq(0.7, 0.3)))) _,
    "hybrid_minmax_bounds" ->
      run(q(Seq(A, B),
        MinMaxNormTech(
          lower = Some(Seq(Bound(BoundMode.Apply, 0.05), Bound(BoundMode.Apply, 0.05))),
          upper = Some(Seq(Bound(BoundMode.Clip, 0.2), Bound(BoundMode.Clip, 0.2)))),
        Combination(Combine.Arithmetic))) _,
    "hybrid_l2_geometric" ->
      run(q(Seq(A, B), L2NormTech, Combination(Combine.Geometric))) _,
    "hybrid_l2_harmonic3" ->
      run(q(Seq(A, B, C), L2NormTech, Combination(Combine.Harmonic, Seq(0.5, 0.3, 0.2)))) _,
    "hybrid_zscore_arith" ->
      run(q(Seq(A, B), ZScoreNormTech, Combination(Combine.Arithmetic))) _,
    "hybrid_rrf" ->
      run(q(Seq(A, B), RrfNormTech(60), Combination(Combine.Rrf))) _,
    "hybrid_filtered" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic)),
        langFilter = Some("en")) _,
    "hybrid_paginated" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic), k = 10, from = 5)) _,
    "collapse_by_source" -> (collapseBySource _),
    // explain mode: per-sub-query normalized scores alongside the combined one
    "hybrid_explain" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      Hybrid.executeExplain(idx, q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic)))
        .select(col("doc_id"), round(col("norm0"), 4).as("norm0"),
          round(col("norm1"), 4).as("norm1"), round(col("score"), 4).as("score"))
    }),
    // min_score filter on the combined score (reference:
    // processor/combination/ScoreCombiner.java:377-395)
    "hybrid_min_score" ->
      run(q(Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
        k = 50, minScore = Some(0.35))) _,
    // sort-enabled hybrid: hits ordered by a stored field instead of score,
    // first-wins dedupe across sub-queries (reference:
    // processor/combination/ScoreCombiner.java:281-311 TopDocs.merge + dedup)
    "hybrid_sorted" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val union = Seq(A, B).map(t => Bm25.scoreTerms(idx, t).select("doc_id"))
        .reduce(_ unionByName _).dropDuplicates("doc_id")
      union
        .join(s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"), "doc_id")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .limit(10)
    }),
    // metric aggregation alongside hybrid (reference: §2.11
    // HybridAggregationProcessor — aggs run over the matched doc set)
    "hybrid_agg_lang" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val matched = Seq(A, B).map(t => Bm25.scoreTerms(idx, t).select("doc_id"))
        .reduce(_ unionByName _).dropDuplicates("doc_id")
      matched
        .join(s.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    }),
    // the JSON DSL parse path end-to-end (fromXContent analogue) — same
    // shape as hybrid_filtered, arriving as a request document
    "dsl_hybrid" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val json =
        """{ "query": { "hybrid": {
          |    "queries": [ { "match": { "text": "join hash" } },
          |                 { "match": { "text": "merge sort window" } } ],
          |    "filter": { "term": { "lang": "en" } },
          |    "pagination_depth": 50 } },
          |  "size": 10,
          |  "search_pipeline": {
          |    "normalization": { "technique": "min_max" },
          |    "combination":   { "technique": "arithmetic_mean" } } }""".stripMargin
      graft.query.QueryDsl.execute(idx, json, s, s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),
    // by-field rerank: _score replaced by a stored numeric field, old score kept
    "rerank_by_field" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val hits = Bm25.topK(idx, A, 20)
        .join(s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"), "doc_id")
      graft.ops.Rerank.byField(hits, "n_chars", keepPrevious = true)
        .select(col("doc_id"), col("score"),
          round(col("previous_score"), 4).as("previous_score"))
    })
  )

  /** Field collapsing: best hit per `source` group (reference:
   *  processor/collapse/CollapseExecutor.java:23-36 / row_number==1). */
  private def collapseBySource(s: SparkSession, dir: String): DataFrame = {
    val idx = IndexCache.documents(s, dir)
    val scored = Bm25.scoreTerms(idx, A)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("doc_id").asc)
    scored.join(docs, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
      .select(col("source"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle SQL
  // ------------------------------------------------------------------

  private def termList(ts: Seq[String]) = ts.map(t => s"'$t'").mkString(", ")

  private val Bm25Sum =
    """sum( ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))
      |              * (tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/stats.avgdl))) )""".stripMargin

  private def subqCtes(i: Int, terms: Seq[String], filterSql: String): String =
    s"""sq$i AS (
       |  SELECT tf.doc_id, $Bm25Sum AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
       |  WHERE tf.term IN (${termList(terms)})$filterSql
       |  GROUP BY tf.doc_id),
       |top$i AS (
       |  SELECT doc_id, s, rnk FROM (
       |    SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk FROM sq$i)
       |  WHERE rnk <= $Depth)""".stripMargin

  private def normCtes(i: Int, norm: Normalization): String = norm match {
    case MinMaxNormTech(None, None) =>
      s"""st$i AS (SELECT min(s) AS mn, max(s) AS mx FROM top$i),
         |n$i AS (SELECT doc_id,
         |  CASE WHEN st.mx = st.mn AND st.mx = t.s THEN 1.0
         |       WHEN st.mx = st.mn THEN 1.0
         |       WHEN (t.s - st.mn)/(st.mx - st.mn) = 0.0 THEN 0.001
         |       ELSE (t.s - st.mn)/(st.mx - st.mn) END AS ns
         |  FROM top$i t, st$i st)""".stripMargin
    case MinMaxNormTech(lower, upper) =>
      val lb = lower.map(_(i))
      val ub = upper.map(_(i))
      val emn = lb match {
        case Some(Bound(BoundMode.Apply, b)) =>
          s"CASE WHEN st.mx > $b AND t.s > $b THEN $b ELSE st.mn END"
        case Some(Bound(BoundMode.Clip, b)) =>
          s"CASE WHEN st.mx < $b THEN st.mn ELSE $b END"
        case _ => "st.mn"
      }
      val emx = ub match {
        case Some(Bound(BoundMode.Apply, b)) =>
          s"CASE WHEN st.mn < $b AND t.s < $b THEN $b ELSE st.mx END"
        case Some(Bound(BoundMode.Clip, b)) =>
          s"CASE WHEN st.mn > $b THEN st.mx ELSE $b END"
        case _ => "st.mx"
      }
      val lowerClip = lb match {
        case Some(Bound(BoundMode.Clip, _)) => "WHEN x.s < x.emn THEN 0.001"
        case _ => ""
      }
      val upperClip = ub match {
        case Some(Bound(BoundMode.Clip, _)) => "WHEN x.s > x.emx THEN 1.0"
        case _ => ""
      }
      s"""st$i AS (SELECT min(s) AS mn, max(s) AS mx FROM top$i),
         |n$i AS (
         |  SELECT doc_id,
         |    CASE WHEN x.mx = x.mn AND x.mx = x.s THEN 1.0
         |         $lowerClip
         |         $upperClip
         |         WHEN x.emx = x.emn THEN 1.0
         |         WHEN (x.s - x.emn)/(x.emx - x.emn) = 0.0 THEN 0.001
         |         ELSE (x.s - x.emn)/(x.emx - x.emn) END AS ns
         |  FROM (SELECT t.doc_id, t.s AS s, st.mn, st.mx, $emn AS emn, $emx AS emx
         |        FROM top$i t, st$i st) x)""".stripMargin
    case L2NormTech =>
      s"""st$i AS (SELECT sqrt(sum(s*s)) AS nrm FROM top$i),
         |n$i AS (SELECT doc_id,
         |  CASE WHEN st.nrm = 0 THEN 0.001 ELSE t.s/st.nrm END AS ns
         |  FROM top$i t, st$i st)""".stripMargin
    case ZScoreNormTech =>
      s"""st$i AS (SELECT avg(s) AS mean, coalesce(stddev_samp(s), 0) AS sd,
         |               max(s) AS mx, min(s) AS mn FROM top$i),
         |n$i AS (SELECT doc_id,
         |  CASE WHEN t.s = st.mean THEN st.mx
         |       WHEN st.sd = 0 THEN st.mn
         |       WHEN (t.s - st.mean)/st.sd <= 0.0 THEN 0.001
         |       ELSE (t.s - st.mean)/st.sd END AS ns
         |  FROM top$i t, st$i st)""".stripMargin
    case RrfNormTech(rc) =>
      s"""n$i AS (SELECT doc_id, round(1.0/($rc + rnk), 10) AS ns FROM top$i)""".stripMargin
  }

  private def alignCte(n: Int): String = {
    val joins = (1 until n).map { j =>
      val leftId = if (j == 1) "a0.doc_id" else s"coalesce(${(0 until j).map(x => s"a$x.doc_id").mkString(", ")})"
      s"FULL OUTER JOIN n$j a$j ON $leftId = a$j.doc_id"
    }.mkString("\n  ")
    val ids = (0 until n).map(x => s"a$x.doc_id").mkString(", ")
    val ss = (0 until n).map(x => s"coalesce(a$x.ns, 0.0) AS s$x").mkString(", ")
    s"""al AS (
       |  SELECT coalesce($ids) AS doc_id, $ss
       |  FROM n0 a0
       |  $joins)""".stripMargin
  }

  private def combineSql(n: Int, comb: Combination): String = {
    def w(i: Int): Double = if (i < comb.weights.length) comb.weights(i) else 1.0
    comb.technique match {
      case Combine.Arithmetic | Combine.Rrf =>
        val num = (0 until n).map(i => s"s$i*${w(i)}").mkString(" + ")
        val den = (0 until n).map(i => s"${w(i)}").mkString(" + ")
        if (comb.technique == Combine.Arithmetic) s"($num)/($den)" else s"($num)"
      case Combine.Geometric =>
        val ws = (0 until n).map(i => s"(CASE WHEN s$i > 0 THEN ${w(i)} ELSE 0 END)").mkString(" + ")
        val ls = (0 until n).map(i => s"(CASE WHEN s$i > 0 THEN ${w(i)}*ln(s$i) ELSE 0 END)").mkString(" + ")
        s"(CASE WHEN ($ws) = 0 THEN 0.0 ELSE exp(($ls)/($ws)) END)"
      case Combine.Harmonic =>
        val ws = (0 until n).map(i => s"(CASE WHEN s$i > 0 THEN ${w(i)} ELSE 0 END)").mkString(" + ")
        val hs = (0 until n).map(i => s"(CASE WHEN s$i > 0 THEN ${w(i)}/s$i ELSE 0 END)").mkString(" + ")
        s"(CASE WHEN ($hs) > 0 THEN ($ws)/($hs) ELSE 0.0 END)"
      case other => throw new IllegalArgumentException(other)
    }
  }

  def hybridOracle(tokCte: String, sub: Seq[Seq[String]], norm: Normalization,
                   comb: Combination, k: Int = 10, from: Int = 0,
                   filterSql: String = "", explain: Boolean = false,
                   minScore: Option[Double] = None): String = {
    val n = sub.size
    val subq = sub.zipWithIndex.map { case (t, i) => subqCtes(i, t, filterSql) }.mkString(",\n")
    val norms = (0 until n).map(i => normCtes(i, norm)).mkString(",\n")
    val cmb = combineSql(n, comb)
    val offset = if (from > 0) s" OFFSET $from" else ""
    val msWhere = minScore.map(ms => s"\nWHERE c >= $ms").getOrElse("")
    val normOut =
      if (explain) (0 until n).map(i => s"round(s$i, 4) AS norm$i, ").mkString
      else ""
    val normIn = if (explain) (0 until n).map(i => s"s$i, ").mkString else ""
    s"""WITH $tokCte,
       |$subq,
       |$norms,
       |${alignCte(n)}
       |SELECT doc_id, ${normOut}round(c, 4) AS score
       |FROM (SELECT doc_id, $normIn$cmb AS c FROM al)$msWhere
       |ORDER BY c DESC, doc_id LIMIT $k$offset""".stripMargin
  }

  def oracles(tokCte: String): Map[String, String] = {
    val langF = " AND tf.doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"
    Map(
      "hybrid_minmax_arith" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic)),
      "hybrid_k100" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          k = 100),
      "hybrid_minmax_weighted" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(),
          Combination(Combine.Arithmetic, Seq(0.7, 0.3))),
      "hybrid_minmax_bounds" ->
        hybridOracle(tokCte, Seq(A, B),
          MinMaxNormTech(
            lower = Some(Seq(Bound(BoundMode.Apply, 0.05), Bound(BoundMode.Apply, 0.05))),
            upper = Some(Seq(Bound(BoundMode.Clip, 0.2), Bound(BoundMode.Clip, 0.2)))),
          Combination(Combine.Arithmetic)),
      "hybrid_l2_geometric" ->
        hybridOracle(tokCte, Seq(A, B), L2NormTech, Combination(Combine.Geometric)),
      "hybrid_l2_harmonic3" ->
        hybridOracle(tokCte, Seq(A, B, C), L2NormTech,
          Combination(Combine.Harmonic, Seq(0.5, 0.3, 0.2))),
      "hybrid_zscore_arith" ->
        hybridOracle(tokCte, Seq(A, B), ZScoreNormTech, Combination(Combine.Arithmetic)),
      "hybrid_rrf" ->
        hybridOracle(tokCte, Seq(A, B), RrfNormTech(60), Combination(Combine.Rrf)),
      "hybrid_filtered" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          filterSql = langF),
      "dsl_hybrid" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          filterSql = langF),
      "hybrid_paginated" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          k = 10, from = 5),
      "hybrid_explain" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          explain = true),
      "hybrid_min_score" ->
        hybridOracle(tokCte, Seq(A, B), MinMaxNormTech(), Combination(Combine.Arithmetic),
          k = 50, minScore = Some(0.35)),
      "hybrid_sorted" ->
        s"""WITH $tokCte,
           |m AS (
           |  SELECT DISTINCT doc_id FROM tf
           |  WHERE term IN (${termList(A)}) OR term IN (${termList(B)}))
           |SELECT m.doc_id, d.n_chars
           |FROM m JOIN documents d USING (doc_id)
           |ORDER BY d.n_chars DESC, m.doc_id LIMIT 10""".stripMargin,
      "hybrid_agg_lang" ->
        s"""WITH $tokCte,
           |m AS (
           |  SELECT DISTINCT doc_id FROM tf
           |  WHERE term IN (${termList(A)}) OR term IN (${termList(B)}))
           |SELECT d.lang, count(*) AS n_docs
           |FROM m JOIN documents d USING (doc_id)
           |GROUP BY d.lang""".stripMargin,
      "rerank_by_field" ->
        s"""WITH $tokCte,
           |sc AS (
           |  SELECT tf.doc_id, $Bm25Sum AS s
           |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
           |  WHERE tf.term IN (${termList(A)})
           |  GROUP BY tf.doc_id),
           |topd AS (
           |  SELECT doc_id, s FROM (
           |    SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM sc)
           |  WHERE rn <= 20)
           |SELECT t.doc_id, CAST(d.n_chars AS DOUBLE) AS score,
           |       round(t.s, 4) AS previous_score
           |FROM topd t JOIN documents d USING (doc_id)""".stripMargin,
      "collapse_by_source" ->
        s"""WITH $tokCte,
           |sc AS (
           |  SELECT tf.doc_id, $Bm25Sum AS s
           |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
           |  WHERE tf.term IN (${termList(A)})
           |  GROUP BY tf.doc_id),
           |r AS (
           |  SELECT d.source, s.doc_id, s.s,
           |         row_number() OVER (PARTITION BY d.source ORDER BY s.s DESC, s.doc_id) AS rn
           |  FROM sc s JOIN documents d USING (doc_id))
           |SELECT source, doc_id, round(s, 4) AS score
           |FROM r WHERE rn = 1
           |ORDER BY s DESC, doc_id LIMIT 20""".stripMargin
    )
  }
}
