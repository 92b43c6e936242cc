package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.Index
import graft.ops.TopN

/** The `term` suggester ("did you mean"): per misspelled input token, the
 *  dictionary terms within `maxEdits` Levenshtein, ranked (distance asc,
 *  df desc, term asc), top `size` each — OpenSearch's term suggester under
 *  its default `suggest_mode: missing` (a token already in the dictionary
 *  returns no suggestions) with the deterministic classic-Levenshtein
 *  ranking (the reference's `internal` distance adds transposition-as-one
 *  -edit; same documented divergence as the fuzzy query).
 *
 *  Execution: ONE broadcast of the (tiny) analyzed token list against the
 *  term dictionary — the per-token work is a shared dictionary scan with a
 *  codegen'd length prefilter + levenshtein, not a scan per token; ranking
 *  is the salted two-level TopN (no per-token hot partition even when one
 *  token matches half the dictionary at maxEdits=2). */
object Suggest {

  def termSuggest(idx: Index, text: String, maxEdits: Int = 2, size: Int = 5,
                  analyzer: String = Analyzer.Simple): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"max_edits must be in [1, 2] (Lucene's bound), got $maxEdits")
    require(size >= 1, s"size must be >= 1, got $size")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val tokens = Analyzer.analyze(analyzer)(text).distinct.toSeq
    require(tokens.nonEmpty, "term suggester needs at least one analyzed token")
    val inputs = tokens.toDF("input")
    val dict = idx.termStats.select($"term", $"df")
    // suggest_mode missing: inputs present in the dictionary suggest nothing
    val missing = inputs.join(dict, $"input" === $"term", "left_anti")
    val cand = dict.join(broadcast(missing),
        abs(length($"term") - length($"input")) <= maxEdits &&
          $"term" =!= $"input" &&
          levenshtein($"term", $"input") <= maxEdits)
      .withColumn("dist", levenshtein($"term", $"input"))
    TopN.perGroup(cand, Seq("input"), "term", size,
        Seq(col("dist").asc, col("df").desc, col("term").asc))
      .select($"input", $"term".as("suggestion"), $"dist", $"df")
  }
}
