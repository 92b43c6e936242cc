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

  /** `number_of_fragments: 0` — the whole-field highlight form: the ENTIRE
   *  field value returns as one highlighted string with every analyzed
   *  occurrence of every query term `<em>`-wrapped (no fragmenting, no
   *  windowing). Same distribution contract as the fragment forms: only
   *  the <= k hit documents' text is ever touched (broadcast semi join),
   *  the tagging is one codegen'd array HOF pass. */
  def wholeField(hits: DataFrame, docs: DataFrame, textCol: String,
                 terms: Seq[String]): DataFrame = {
    val withText = docs.select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .join(broadcast(hits.select("doc_id")), "doc_id")
    val termArr = array(terms.map(lit): _*)
    withText.select(col("doc_id"),
      array_join(
        transform(col("toks"),
          t => when(array_contains(termArr, norm(t)),
            concat(lit("<em>"), t, lit("</em>"))).otherwise(t)),
        " ").as("highlighted"))
  }

  /**
   * Multi-fragment, phrase-aware highlighting — the unified-highlighter
   * shape (reference surface: the highlight/single package): per hit, EVERY
   * occurrence of every query term plus every exact phrase span is located
   * in the tokenized text; occurrences whose context windows touch merge
   * into one fragment (interval islands); the best `maxFragments`
   * fragments per doc (match count desc, start asc) are emitted with every
   * matched token `<em>`-wrapped.
   *
   * Distribution shape: the hits side is <= k rows, so only k documents'
   * text is ever tokenized (broadcast semi join, column-pruned scan);
   * occurrence rows are per-match (bounded by k x matches-per-doc), the
   * island assignment is a per-doc window over those rows, and the snippet
   * renders through codegen'd array HOFs — no UDFs, no corpus-wide work.
   *
   * @param phrases   exact-adjacency phrase spans (analyzed tokens); every
   *                  position a phrase covers highlights, and a phrase
   *                  match counts each covered position toward the
   *                  fragment's match count (Lucene's unified highlighter
   *                  weights passages by term-occurrence density too)
   * @return (doc_id, frag_rank, n_matches, snippet), frag_rank 1-based in
   *         (n_matches desc, fragment start asc) order.
   */
  def fragments(hits: DataFrame, docs: DataFrame, textCol: String,
                terms: Seq[String], phrases: Seq[Seq[String]] = Nil,
                window: Int = 3, maxFragments: Int = 2): DataFrame = {
    require(window >= 0, s"window must be >= 0, got $window")
    require(maxFragments >= 1, s"max fragments must be >= 1, got $maxFragments")
    require(terms.nonEmpty || phrases.nonEmpty, "nothing to highlight")
    val spark = hits.sparkSession
    import spark.implicits._
    val withText = docs.select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .join(broadcast(hits.select("doc_id")), "doc_id")
      .withColumn("normed", transform(col("toks"), norm(_)))
    // 1-based positions of every single-term occurrence
    val termPos =
      if (terms.isEmpty) None
      else Some(withText
        .select(col("doc_id"), posexplode(col("normed")).as(Seq("p0", "tk")))
        .join(broadcast(terms.toDF("tk")), "tk")
        .select(col("doc_id"), (col("p0") + 1).as("pos")))
    // positions covered by each exact phrase span: start where every
    // phrase token matches at consecutive offsets, then explode the span
    val phrasePos = phrases.map { ph =>
      require(ph.size >= 2, s"a phrase needs >= 2 tokens, got $ph")
      // `get` is 0-based and null-safe past the array end (ANSI-safe),
      // so no separate length guard is needed: an out-of-range probe
      // yields null === t -> filtered
      val startOk = ph.zipWithIndex.map { case (t, j) =>
        get(col("normed"), col("p0") + j) === lit(t)
      }.reduce(_ && _)
      withText
        .select(col("doc_id"), col("normed"),
          explode(sequence(lit(0), greatest(size(col("normed")) - ph.size, lit(0))))
            .as("p0"))
        .where(startOk)
        .select(col("doc_id"),
          explode(sequence(col("p0") + 1, col("p0") + ph.size)).as("pos"))
    }
    val matched = (termPos.toSeq ++ phrasePos).reduce(_ unionByName _)
      .distinct()
    // island merge: context windows [pos-w, pos+w] sorted by pos have
    // monotone ends, so a new fragment starts exactly when the gap to the
    // previous match exceeds 2w+1
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val isl = matched
      .withColumn("_new",
        when(coalesce(col("pos") - lag("pos", 1).over(byPos),
          lit(Int.MaxValue)) > 2 * window + 1, 1).otherwise(0))
      .withColumn("island", sum(col("_new")).over(
        byPos.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val frags = isl.groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos")).as("_mn"), max(col("pos")).as("_mx"),
        sort_array(collect_set(col("pos"))).as("_mpos"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("n_matches").desc, col("_mn").asc)
    frags
      .withColumn("frag_rank", row_number().over(byDoc))
      .where(col("frag_rank") <= maxFragments)
      .join(withText.select(col("doc_id"), col("toks")), "doc_id")
      .withColumn("_lo", greatest(col("_mn") - window, lit(1)))
      .withColumn("_hi", least(col("_mx") + window, size(col("toks"))))
      .withColumn("snippet",
        array_join(
          transform(sequence(col("_lo"), col("_hi")),
            i => when(array_contains(col("_mpos"), i),
              concat(lit("<em>"), element_at(col("toks"), i), lit("</em>")))
              .otherwise(element_at(col("toks"), i))),
          " "))
      .select(col("doc_id"), col("frag_rank"), col("n_matches"), col("snippet"))
  }
}
