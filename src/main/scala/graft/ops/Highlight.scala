package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Lexical highlighting — the search-response processor that attaches matched
 * spans and tagged snippets to every hit. The reference's highlight surface
 * is semantic (model-scored sentence spans, highlight/SemanticHighlighter.java,
 * out of scope under zero egress); this is the deterministic lexical analogue
 * of the same response-processor stage (SURVEY.md §2.10 response processors):
 * for each (hit, query term) the first occurrence position and a snippet with
 * every in-window occurrence of that term wrapped in `<em>` tags.
 *
 * Pure column algebra over the tokenized text — array_position / slice /
 * transform / array_join, all codegen'd, no UDFs; the hits side is tiny
 * (<= k rows) so the doc-text join broadcasts the hit ids, and only the k
 * hit documents' text is ever tokenized (the scan is column-pruned to
 * (doc_id, text)).
 */
object Highlight {

  /**
   * @param hits   ranked hits (doc_id, score, ...) — small (<= k rows)
   * @param docs   stored-fields table with `doc_id` and `textCol`
   * @param terms  query terms to highlight
   * @param window tokens of context kept on each side of the first match
   * @return (doc_id, term, pos, snippet): one row per (hit, matched term);
   *         pos is the 1-based token position of the first occurrence.
   */
  /** Analyzer-side normalization of one whitespace token: lowercase, strip
   *  non-alphanumeric edges — so hits matched through the analyzer
   *  ("Merge", "window.") still highlight in the raw text. (A token with
   *  INTERNAL punctuation analyzes to several terms; edge-stripping covers
   *  the common prose cases without re-running the full analyzer per token.) */
  private def norm(t: org.apache.spark.sql.Column) =
    lower(regexp_replace(t, "^[^a-zA-Z0-9]+|[^a-zA-Z0-9]+$", ""))

  def matchedTerms(hits: DataFrame, docs: DataFrame, textCol: String,
                   terms: Seq[String], window: Int = 3): DataFrame = {
    val spark = hits.sparkSession
    import spark.implicits._
    val termDf = terms.toDF("term")
    val withText = docs.select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .join(broadcast(hits.select("doc_id")), "doc_id")
    val withTerm = withText
      .crossJoin(broadcast(termDf))
      .withColumn("pos", array_position(transform(col("toks"), norm(_)), col("term")))
      .where(col("pos") > 0)
    val lo = greatest(col("pos") - window, lit(1))
    val len = col("pos") + window - lo + lit(1)
    withTerm
      .withColumn("snippet",
        array_join(
          transform(slice(col("toks"), lo.cast("int"), len.cast("int")),
            t => when(norm(t) === col("term"), concat(lit("<em>"), t, lit("</em>")))
              .otherwise(t)),
          " "))
      .select(col("doc_id"), col("term"), col("pos"), col("snippet"))
  }
}
