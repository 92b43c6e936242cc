package graft.hybrid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Bound, Combine, ScoreFunctions}
import graft.index.Index
import graft.query.Bm25

/**
 * The hybrid-query pipeline: N scored sub-queries -> per-sub-query top-depth
 * -> cross-sub-query normalization -> per-doc combination -> final ranked
 * page. This is the Spark re-expression of the reference's full
 * `hybrid` search lifecycle (SURVEY.md §3.1):
 *
 *  - sub-query scoring + per-sub-query top-k collection
 *    (reference: search/collector/HybridTopScoreDocCollector.java:135-190)
 *    = BM25 block scorer + a rank window bounded by `depth`
 *    (`pagination_depth`, reference: query/HybridQueryBuilder.java:61-68);
 *  - filter pushed into every sub-query as a non-scoring clause
 *    (reference: query/HybridQueryBuilder.java:116-127) = a left-semi join
 *    applied before top-depth selection;
 *  - normalization across the whole collected set per sub-query
 *    (reference: processor/NormalizationProcessorWorkflow.java:66-124) =
 *    a per-subQueryIdx aggregate broadcast-joined back, feeding the Catalyst
 *    normalization expressions;
 *  - per-doc score alignment with missing entries as 0.0
 *    (reference: processor/combination/ScoreCombiner.java:361-375) = one hash
 *    aggregate building the dense score array (no N-way outer join);
 *  - combination + min_score filter + pagination
 *    (reference: ScoreCombiner.java:377-395, NormalizationProcessorWorkflow.java:276-282).
 *
 * Scale notes: everything after sub-query scoring operates on at most
 * depth x numSubQueries rows, so the only scale-bearing stages are the BM25
 * scorers themselves; stats aggregates are single-row-per-subquery and
 * broadcast.
 */
sealed trait Normalization
case class MinMaxNormTech(lower: Option[Seq[Bound]] = None, upper: Option[Seq[Bound]] = None) extends Normalization
case object L2NormTech extends Normalization
case object ZScoreNormTech extends Normalization
case class RrfNormTech(rankConstant: Int = 60) extends Normalization

case class Combination(technique: String, weights: Seq[Double] = Nil)

case class SubQuery(terms: Seq[String], boosts: Map[String, Double] = Map.empty)

case class HybridQuery(
    subQueries: Seq[SubQuery],
    norm: Normalization = MinMaxNormTech(),
    comb: Combination = Combination(Combine.Arithmetic),
    k: Int = 10,
    depth: Int = 50,
    from: Int = 0,
    minScore: Option[Double] = None,
    useFloat: Boolean = false
)

object Hybrid {

  /** max sub-queries, as the reference enforces (HybridQueryBuilder.java:67). */
  val MaxSubQueries = 5

  /** z_score only combines with arithmetic_mean
   *  (reference: ScoreNormalizationFactory.java:111-132). */
  private def validate(q: HybridQuery): Unit = {
    require(q.subQueries.nonEmpty && q.subQueries.size <= MaxSubQueries,
      s"hybrid query supports 1..$MaxSubQueries sub-queries")
    require(q.norm != ZScoreNormTech || q.comb.technique == Combine.Arithmetic,
      "z_score normalization supports only arithmetic_mean combination")
    if (q.comb.weights.nonEmpty) {
      require(q.comb.weights.size == q.subQueries.size, "weights count must match sub-queries")
      require(math.abs(q.comb.weights.sum - 1.0) <= 0.01, "weights must sum to 1.0 (+-0.01)")
      require(q.comb.weights.forall(w => w >= 0 && w <= 1), "weights must be in [0,1]")
    }
  }

  /**
   * Execute a hybrid query. @param filterDocs optional non-scoring filter: a
   * DataFrame with a `doc_id` column; only those docs may match any sub-query.
   * @return DataFrame(doc_id, score) — the final page, ordered.
   */
  def execute(idx: Index, q: HybridQuery, filterDocs: Option[DataFrame] = None): DataFrame =
    full(idx, q, filterDocs).select($"doc_id", $"score")

  /** Explain mode: the final page plus the per-sub-query normalized scores
   *  that produced each combined score (reference:
   *  processor/ExplanationResponseProcessor.java — per-doc normalization/
   *  combination breakdown attached to every hit). Columns:
   *  doc_id, norm0..norm{n-1}, score. */
  def executeExplain(idx: Index, q: HybridQuery, filterDocs: Option[DataFrame] = None): DataFrame = {
    val normCols = q.subQueries.indices.map(i =>
      element_at($"scores", i + 1).as(s"norm$i"))
    full(idx, q, filterDocs).select(($"doc_id" +: normCols :+ $"score"): _*)
  }

  private def full(idx: Index, q: HybridQuery, filterDocs: Option[DataFrame] = None): DataFrame = {
    validate(q)
    val spark = idx.postings.sparkSession

    // 1. per-sub-query scoring, filter pushed before top-depth selection
    val scoredPerSub: Seq[DataFrame] = q.subQueries.zipWithIndex.map { case (sq, i) =>
      val raw = Bm25.scoreTerms(idx, sq.terms, sq.boosts,
        limitPerBucket = if (filterDocs.isEmpty) q.depth else 0)
      val filtered = filterDocs match {
        case Some(f) => raw.join(broadcast(f.select("doc_id")), Seq("doc_id"), "left_semi")
        case None    => raw
      }
      filtered.withColumn("subq", lit(i))
    }
    val union = scoredPerSub.reduce(_ unionByName _)

    // 2. top-depth per sub-query (the collector's HitQueue bound)
    val byRank = Window.partitionBy($"subq").orderBy($"score".desc, $"doc_id".asc)
    val collected = union
      .withColumn("rank", row_number().over(byRank))
      .filter($"rank" <= q.depth)

    // 3. normalize
    val normalized: DataFrame = q.norm match {
      case MinMaxNormTech(lower, upper) =>
        val stats = collected.groupBy($"subq")
          .agg(min($"score").as("mn"), max($"score").as("mx"))
        val joined = collected.join(broadcast(stats), "subq")
        val ns = (lb: Option[Bound], ub: Option[Bound]) =>
          ScoreFunctions.minmaxNorm($"score", $"mn", $"mx", lb, ub, q.useFloat)
        val withBounds =
          if (lower.isEmpty && upper.isEmpty) joined.withColumn("nscore", ns(None, None))
          else {
            // bounds are per-sub-query: build a CASE over subq index
            val expr = q.subQueries.indices.foldLeft(lit(null).cast("double")) { (acc, i) =>
              when($"subq" === i, ns(lower.map(_(i)), upper.map(_(i)))).otherwise(acc)
            }
            joined.withColumn("nscore", expr)
          }
        withBounds
      case L2NormTech =>
        val stats = collected.groupBy($"subq")
          .agg(sqrt(sum($"score" * $"score")).as("l2"))
        collected.join(broadcast(stats), "subq")
          .withColumn("nscore", ScoreFunctions.l2Normalize($"score", $"l2", q.useFloat))
      case ZScoreNormTech =>
        val stats = collected.groupBy($"subq").agg(
          avg($"score").as("mean"),
          coalesce(stddev_samp($"score"), lit(0.0)).as("sd"),
          max($"score").as("mx"),
          min($"score").as("mn"))
        collected.join(broadcast(stats), "subq")
          .withColumn("nscore",
            ScoreFunctions.zscoreNorm($"score", $"mean", $"sd", $"mx", $"mn", q.useFloat))
      case RrfNormTech(rc) =>
        // global rank per sub-query: score desc, doc_id asc (the single-
        // collection analogue of the reference's cross-shard PQ merge,
        // RRFNormalizationTechnique.java:94-134)
        collected.withColumn("nscore", ScoreFunctions.rrfScore($"rank", rc, q.useFloat))
    }

    // 4. align per-doc scores (missing -> 0.0) and combine
    val nSub = q.subQueries.size
    val aligned = normalized
      .groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"subq", $"nscore"))).as("m"))
      .withColumn("scores",
        transform(sequence(lit(0), lit(nSub - 1)), i => coalesce(element_at($"m", i), lit(0.0))))
      .withColumn("score",
        ScoreFunctions.combineScores($"scores", q.comb.technique, q.comb.weights, q.useFloat))
      .select($"doc_id", $"scores", $"score")

    // 5. min_score filter + final page
    val filtered = q.minScore.fold(aligned)(ms => aligned.filter($"score" >= ms))
    val ordered = filtered.orderBy($"score".desc, $"doc_id".asc)
    val paged = if (q.from > 0) ordered.offset(q.from) else ordered
    paged.limit(q.k)
  }

  // Column shorthand used above
  private def $(name: String): Column = col(name)
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.parts.mkString)
  }
}
