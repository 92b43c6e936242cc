package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.analysis.Analyzer
import graft.functions.Combine
import graft.hybrid._
import graft.index.Index

/**
 * JSON query DSL — the parse step of the reference's search lifecycle
 * (reference: query/HybridQueryBuilder.java:202-299 fromXContent — <=5
 * sub-queries, optional filter, pagination_depth; plus the search-pipeline
 * normalization/combination config the normalization processor reads,
 * processor/NormalizationProcessor.java). A request like:
 *
 * {{{
 * { "query": { "hybrid": {
 *     "queries": [ { "match": { "text": "merge sort" } },
 *                  { "term":  { "text": "join" } } ],
 *     "filter": { "term": { "lang": "en" } },
 *     "pagination_depth": 50 } },
 *   "size": 10, "from": 0, "min_score": 0.1,
 *   "search_pipeline": {
 *     "normalization": { "technique": "min_max" },
 *     "combination":   { "technique": "arithmetic_mean", "weights": [0.7, 0.3] } } }
 * }}}
 *
 * parses to a [[HybridQuery]] + an optional field filter, and `execute` runs
 * it against an index. Jackson ships with Spark (no extra dependency).
 */
object QueryDsl {

  private val mapper = new ObjectMapper()

  case class Parsed(query: HybridQuery, filterField: Option[(String, String)])

  def parse(json: String, analyzer: String = Analyzer.Simple): Parsed = {
    val root = mapper.readTree(json)
    val hybrid = Option(root.path("query").path("hybrid"))
      .filterNot(_.isMissingNode)
      .getOrElse(throw new IllegalArgumentException("query.hybrid is required"))

    val subs = {
      val arr = hybrid.path("queries")
      require(arr.isArray && arr.size() > 0, "hybrid.queries must be a non-empty array")
      (0 until arr.size()).map { i =>
        val q = arr.get(i)
        if (!q.path("match").isMissingNode) {
          val (_, text) = firstField(q.path("match"))
          SubQuery(Analyzer.analyze(analyzer)(text.asText()).toSeq)
        } else if (!q.path("term").isMissingNode) {
          val (_, v) = firstField(q.path("term"))
          SubQuery(Seq(v.asText()))
        } else throw new IllegalArgumentException(s"unsupported sub-query: $q")
      }
    }

    val filterField = Option(hybrid.path("filter").path("term"))
      .filterNot(_.isMissingNode)
      .filter(_.isObject)
      .map(firstField)
      .map { case (name, v) => (name, v.asText()) }

    val pipeline = root.path("search_pipeline")
    val normNode = pipeline.path("normalization")
    val norm: Normalization = normNode.path("technique").asText("min_max") match {
      case "min_max" => MinMaxNormTech()
      case "l2"      => L2NormTech
      case "z_score" => ZScoreNormTech
      case "rrf"     => RrfNormTech(normNode.path("rank_constant").asInt(60))
      case other     => throw new IllegalArgumentException(s"unknown normalization: $other")
    }
    val combNode = pipeline.path("combination")
    val weights =
      if (combNode.path("weights").isArray)
        (0 until combNode.path("weights").size()).map(combNode.path("weights").get(_).asDouble())
      else Seq.empty[Double]
    val comb = Combination(combNode.path("technique").asText(Combine.Arithmetic), weights)

    Parsed(
      HybridQuery(
        subQueries = subs,
        norm = norm,
        comb = comb,
        k = root.path("size").asInt(10),
        depth = hybrid.path("pagination_depth").asInt(50),
        from = root.path("from").asInt(0),
        minScore = Option(root.path("min_score")).filter(_.isNumber).map(_.asDouble())
      ),
      filterField
    )
  }

  /** Parse + execute against an index; `docs` supplies filter fields. */
  def execute(idx: Index, json: String, spark: SparkSession, docs: => DataFrame): DataFrame = {
    val parsed = parse(json, idx.analyzer)
    val filterDf = parsed.filterField.map { case (field, value) =>
      docs.where(col(field) === value).select("doc_id")
    }
    Hybrid.execute(idx, parsed.query, filterDf)
  }

  private def firstField(n: JsonNode): (String, JsonNode) = {
    val it = n.fields()
    require(it.hasNext, s"expected an object with one field, got $n")
    val e = it.next()
    (e.getKey, e.getValue)
  }
}
