package graft.query

import graft.analysis.Analyzer
import graft.hybrid._

/**
 * Query-tree text extraction for highlighting — the reference's
 * highlight/single/extractor/QueryTextExtractorRegistry.java: a per-query-class
 * registry walked over the parsed query tree to recover the text the
 * highlighter should mark up. Only REGISTERED query kinds contribute
 * (NeuralKNNQuery, TermQuery, BooleanQuery, HybridQuery, nested block-join —
 * QueryTextExtractorRegistry.java:37-48); every other kind is logged and
 * skipped (extractQueryText returns null on a missing extractor), prohibited
 * (must_not) bool clauses are dropped
 * (BooleanQueryTextExtractor.java "Skip MUST_NOT clauses"), term queries
 * contribute only when their field IS the highlighted field
 * (TermQueryTextExtractor.java), and hybrid sub-query texts are
 * de-duplicated before joining (HybridQueryTextExtractor.java).
 *
 * Spark-side the registry is a match over the [[SubQuery]] algebra. The
 * clause-kind -> Lucene-class mapping decides what is "registered":
 *  - [[Lexical]] / [[LexicalMsm]] (match) rewrite to a BooleanQuery of
 *    TermQuery — registered; contribute their terms iff the highlighted
 *    field is the primary "text" field they score.
 *  - [[LexicalMulti]] with [[MostFields]] is a BooleanQuery of per-field
 *    term bools — the sub-bool on the highlighted field contributes;
 *    [[BestFields]] compiles to DisMaxQuery, which has NO registered
 *    extractor, so it contributes nothing (faithful to the reference).
 *  - [[BoolSub]] — registered; must + should texts in clause order,
 *    must_not skipped.
 *  - [[SemanticText]] is the neural clause built from query_text — the
 *    NeuralKNNQuery extractor returns the original query text regardless of
 *    field. (The analyzed form is what this engine retains; the highlighter
 *    normalizes tokens the same way, so marked spans are identical.)
 *  - Dense clauses built from query_id ([[DenseCosine]]/[[DenseIvf]]/
 *    [[DenseRadial]]/[[DenseVector]]) carry no original text — the reference
 *    returns null for a vector-built NeuralKNNQuery — and everything else
 *    (phrase, prefix, wildcard, regexp, fuzzy, span, dis_max, boosting,
 *    constant_score, sparse, ids, exists, more_like_this) has no registered
 *    extractor: all contribute "".
 *
 * Determinism note: the reference de-duplicates hybrid sub-texts through a
 * HashSet, leaving the join order unspecified; here first-seen order is kept
 * so the extracted string is deterministic.
 */
object QueryText {

  /** Extract highlightable text from one clause — the registry dispatch. */
  def extract(q: SubQuery, field: String): String = q match {
    case Lexical(terms, _) =>
      if (field == "text") terms.mkString(" ") else ""
    case LexicalMsm(terms, _, _) =>
      if (field == "text") terms.mkString(" ") else ""
    case LexicalMulti(fields, terms, MostFields) =>
      if (fields.exists(_._1 == field)) terms.mkString(" ") else ""
    case b: BoolSub =>
      (b.must ++ b.should).map(extract(_, field)).filter(_.nonEmpty).mkString(" ")
    case SemanticText(_, terms) =>
      terms.mkString(" ")
    case _ => ""
  }

  /** Hybrid-level extraction: per-sub-query texts, de-duplicated (first-seen
   *  order), joined with spaces — HybridQueryTextExtractor.java. */
  def extractHybrid(h: HybridQuery, field: String): String =
    h.subQueries.map(extract(_, field)).filter(_.nonEmpty).distinct.mkString(" ").trim

  /** The highlighter's term list: analyzed extracted text, first-seen
   *  distinct — what the semantic highlighter receives as its query text. */
  def highlightTerms(h: HybridQuery, field: String,
                     analyzer: String = Analyzer.Simple): Seq[String] =
    Analyzer.analyze(analyzer)(extractHybrid(h, field)).toSeq.distinct
}
