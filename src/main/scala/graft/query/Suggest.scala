package graft.query

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.{Index, PosBlock, Positions}
import graft.ops.TopN

/** The `term` suggester ("did you mean"): per input token, the dictionary
 *  terms within `maxEdits` edits, ranked (distance asc, df desc, term asc),
 *  top `size` each — OpenSearch's term suggester across all three
 *  `suggest_mode`s (DirectSpellChecker's SuggestMode; reference exercises
 *  it via the suggest section any search request carries):
 *   - `missing` (the default): a token already in the dictionary returns
 *     no suggestions;
 *   - `popular`: every token is corrected, but a candidate must be MORE
 *     FREQUENT than the input token (df > input df; an absent input has
 *     df 0, so popular degrades to always for misspellings);
 *   - `always`: every token, any candidate df.
 *  `distance` picks the edit metric: "levenshtein" (classic) or "damerau"
 *  (unrestricted transposition-as-one-edit, Lucene's internal default —
 *  the same codegen'd expression the fuzzy query uses).
 *
 *  Execution: ONE broadcast of the (tiny) analyzed token list against the
 *  term dictionary — the per-token work is a shared dictionary scan with a
 *  codegen'd length prefilter + edit distance, not a scan per token; the
 *  popular-mode input-df lookup is a broadcast left join on the same
 *  dictionary, never a second scan per token; ranking is the salted
 *  two-level TopN (no per-token hot partition even when one token matches
 *  half the dictionary at maxEdits=2). */
object Suggest {

  def termSuggest(idx: Index, text: String, maxEdits: Int = 2, size: Int = 5,
                  analyzer: String = Analyzer.Simple, mode: String = "missing",
                  distance: String = "levenshtein"): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"max_edits must be in [1, 2] (Lucene's bound), got $maxEdits")
    require(size >= 1, s"size must be >= 1, got $size")
    require(Set("missing", "popular", "always")(mode),
      s"suggest_mode must be missing|popular|always, got [$mode]")
    require(Set("levenshtein", "damerau")(distance),
      s"string_distance must be levenshtein|damerau, got [$distance]")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    def dist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (distance == "damerau") graft.functions.StringFunctions.damerauDistance(a, b)
      else levenshtein(a, b)
    val tokens = Analyzer.analyze(analyzer)(text).distinct.toSeq
    require(tokens.nonEmpty, "term suggester needs at least one analyzed token")
    val inputs = tokens.toDF("input")
    val dict = idx.termStats.select($"term", $"df")
    // per-mode input gate: `missing` drops in-dictionary tokens entirely;
    // `popular` keeps every token but remembers its df as the candidate
    // frequency floor; `always` keeps every token with no floor
    val gated = mode match {
      case "missing" => inputs.join(dict, $"input" === $"term", "left_anti")
        .withColumn("input_df", lit(0L))
      case "popular" => inputs.join(dict, $"input" === $"term", "left")
        .select($"input", coalesce($"df", lit(0L)).as("input_df"))
      case "always" => inputs.withColumn("input_df", lit(0L))
    }
    val cand = dict.join(broadcast(gated),
        abs(length($"term") - length($"input")) <= maxEdits &&
          $"term" =!= $"input" &&
          dist($"term", $"input") <= maxEdits &&
          $"df" > $"input_df")
      .withColumn("dist", dist($"term", $"input"))
    TopN.perGroup(cand, Seq("input"), "term", size,
        Seq(col("dist").asc, col("df").desc, col("term").asc))
      .select($"input", $"term".as("suggestion"), $"dist", $"df")
  }

  /** The `completion` suggester: type-ahead over a weighted suggestion
   *  dictionary — here the term dictionary with weight = corpus df (the
   *  reference indexes caller-supplied inputs/weights into an in-memory
   *  FST; the relational analogue keeps distinct (term, weight) rows and
   *  makes the prefix a predicate the scan can prune on). Ranking is the
   *  completion contract: weight desc (popularity), term asc tie-break.
   *  `fuzziness` > 0 is the FuzzyCompletionQuery variant — edit distance
   *  computed between the typed prefix and the candidate's same-length
   *  head, first character required to match (the default prefix_length 1)
   *  — ranked exact-prefix-first (dist asc) then weight, as Lucene boosts
   *  exact prefixes above fuzzy ones. skip_duplicates is inherent
   *  (dictionary rows are distinct). Work is one bounded dictionary scan +
   *  a size-bounded TakeOrdered, never postings. */
  def completionSuggest(idx: Index, prefix: String, size: Int = 5,
                        fuzziness: Int = 0): DataFrame = {
    require(prefix.nonEmpty && prefix.matches("[a-z0-9]+"),
      s"completion prefix must be a non-empty analyzed token, got [$prefix]")
    require(size >= 1, s"size must be >= 1, got $size")
    require(fuzziness >= 0 && fuzziness <= 2,
      s"fuzziness must be in [0, 2] (Lucene's bound), got $fuzziness")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val dict = idx.termStats.select($"term", $"df")
    val matched =
      if (fuzziness == 0)
        dict.where($"term".startsWith(prefix)).withColumn("dist", lit(0))
      else
        dict.where($"term".startsWith(prefix.substring(0, 1)) &&
            levenshtein(substring($"term", 1, prefix.length), lit(prefix)) <= fuzziness)
          .withColumn("dist",
            levenshtein(substring($"term", 1, prefix.length), lit(prefix)))
    matched.orderBy($"dist".asc, $"df".desc, $"term".asc).limit(size)
      .select($"term".as("suggestion"), $"dist", $"df".as("weight"))
  }

  /** Context-filtered completion — the completion field's `contexts`
   *  feature: suggestions come only from entries CARRYING the requested
   *  context, so the same typed prefix completes differently per context.
   *  The dictionary is the context-tagged sub-corpus's own (term, df)
   *  table, derived from one filtered scan (the context predicate pushes
   *  down with the scan like any filter); ranking is weight (context df)
   *  desc, term asc — one bounded TakeOrdered, postings never touched. */
  def completionSuggestContext(docs: DataFrame, idCol: String,
                               textCol: String, context: Column,
                               prefix: String, size: Int = 5): DataFrame = {
    require(prefix.nonEmpty && prefix.matches("[a-z0-9]+"),
      s"completion prefix must be a non-empty analyzed token, got [$prefix]")
    require(size >= 1, s"size must be >= 1, got $size")
    docs.where(context)
      .select(col(idCol).as("_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "" && col("term").startsWith(prefix))
      .groupBy(col("term"))
      .agg(countDistinct(col("_id")).as("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(size)
      .select(col("term").as("suggestion"), col("weight"))
  }

  /** The `phrase` suggester ("did you mean" over whole phrases): per
   *  analyzed token slot a direct-generator candidate set — the original
   *  term when indexed, plus the top `candidatesPerSlot` dictionary terms
   *  within `maxEdits` ranked (dist asc, df desc, term asc); suggest_mode
   *  `always`, so real-word slots still generate corrections — and every
   *  slot-candidate combination scored by channel prior × stupid-backoff
   *  bigram LM over the corpus token stream (Brants et al. 2007, the
   *  default smoothing of OpenSearch's phrase suggester):
   *
   *    ln score  = ln prior(c₁..cₖ) + ln p(c₁) + Σ ln p(cᵢ | cᵢ₋₁)
   *    p(w)      = cnt(w) / T
   *    p(w₂|w₁)  = cnt(w₁w₂) / cnt(w₁) when cnt(w₁w₂) > 0,
   *                else 0.4 · cnt(w₂) / T
   *    prior(cᵢ) = realWordErrorLikelihood for the original token,
   *                (1 − rwel) / dist for an edit-distance-dist correction
   *
   *  Scale shape: the LM is NEVER materialized corpus-wide. Unigram counts
   *  are an aggregate of the postings blocks' per-block `sum_tf` over the
   *  term-pruned rows; bigram counts decode the POSITIONAL index pruned to
   *  the candidate terms at the scan (the same bounded per-bucket decode a
   *  phrase query performs) and count adjacency only for the ≤ |slots|·c²
   *  candidate pairs; only query-sized candidate/sequence sets reach the
   *  driver. */
  def phraseSuggest(idx: Index, pos: Dataset[PosBlock], text: String,
                    maxEdits: Int = 2, candidatesPerSlot: Int = 3,
                    size: Int = 5, realWordErrorLikelihood: Double = 0.95,
                    analyzer: String = Analyzer.Simple): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"max_edits must be in [1, 2] (Lucene's bound), got $maxEdits")
    require(candidatesPerSlot >= 1 && size >= 1, "candidates and size must be >= 1")
    require(realWordErrorLikelihood > 0 && realWordErrorLikelihood < 1,
      s"real_word_error_likelihood must be in (0, 1)")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val rwel = realWordErrorLikelihood
    val toks = Analyzer.analyze(analyzer)(text).toSeq
    require(toks.size >= 2 && toks.size <= 5,
      s"phrase suggester takes 2-5 analyzed tokens, got ${toks.size}")

    // one shared dictionary scan generates every slot's corrections
    val inputs = toks.zipWithIndex.toDF("input", "slot")
    val dict = idx.termStats.select($"term", $"df")
    val cand = dict.join(broadcast(inputs),
        abs(length($"term") - length($"input")) <= maxEdits &&
          $"term" =!= $"input" &&
          levenshtein($"term", $"input") <= maxEdits)
      .withColumn("dist", levenshtein($"term", $"input"))
    val corr = TopN.perGroup(cand, Seq("slot"), "term", candidatesPerSlot,
        Seq(col("dist").asc, col("df").desc, col("term").asc))
      .select($"slot", $"term", $"dist").collect()
      .map(r => (r.getAs[Int]("slot"), r.getAs[String]("term"), r.getAs[Int]("dist")))
    val inDict: Set[String] = idx.termStats
      .filter($"term".isin(toks.distinct: _*))
      .select($"term").collect().map(_.getString(0)).toSet

    val perSlot: Seq[Seq[(String, Double)]] = toks.zipWithIndex.map { case (t, i) =>
      val orig = if (inDict(t)) Seq((t, rwel)) else Nil
      val all = orig ++ corr.collect { case (`i`, term, d) => (term, (1 - rwel) / d) }
      require(all.nonEmpty, s"no candidates for token [$t] within $maxEdits edits")
      all
    }
    // bounded enumeration: <= (1 + candidatesPerSlot)^5 sequences
    val seqs: Seq[(Seq[String], Double)] =
      perSlot.foldLeft(Seq(Seq.empty[String] -> 0.0)) { (acc, cands) =>
        for ((s0, lp) <- acc; (t, p) <- cands) yield (s0 :+ t, lp + math.log(p))
      }

    // unigram counts: per-block sum_tf aggregated over the pruned term rows
    val candTerms = perSlot.flatten.map(_._1).distinct
    val ug: Map[String, Long] = idx.postings.filter($"term".isin(candTerms: _*))
      .groupBy($"term").agg(sum($"sum_tf").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalT = idx.stats.sum_dl.toDouble

    // bigram counts for exactly the adjacent candidate pairs
    val pairs: Set[(String, String)] =
      seqs.flatMap { case (s, _) => s.sliding(2).map(p => (p(0), p(1))) }.toSet
    val pairsB = spark.sparkContext.broadcast(pairs)
    val bg: Map[(String, String), Long] = pos
      .filter($"term".isin(candTerms: _*))
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        val byTerm = it.map(b => b.term -> Positions.decodeEntries(b)).toMap
        pairsB.value.iterator.flatMap { case (a, b2) =>
          (byTerm.get(a), byTerm.get(b2)) match {
            case (Some(ea), Some(eb)) =>
              val posB = eb.toMap
              var c = 0L
              ea.foreach { case (id, ps) =>
                posB.get(id).foreach { pb =>
                  val set = pb.toSet
                  ps.foreach(p => if (set.contains(p + 1)) c += 1)
                }
              }
              if (c > 0) Iterator.single((a, b2, c)) else Iterator.empty
            case _ => Iterator.empty
          }
        }
      }.toDF("a", "b", "c").groupBy($"a", $"b").agg(sum($"c").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // driver-side scoring of the bounded sequence set — additions kept in
    // one fixed left-to-right order (prior, unigram, bigrams) so an
    // independent engine reproduces the exact double
    val scored = seqs.map { case (s, lprior) =>
      var sc = lprior + math.log(ug(s.head) / totalT)
      s.sliding(2).foreach { w =>
        val (a, b2) = (w(0), w(1))
        sc += (bg.getOrElse((a, b2), 0L) match {
          case 0L => math.log(0.4 * ug(b2) / totalT)
          case c  => math.log(c.toDouble / ug(a))
        })
      }
      (s.mkString(" "), sc)
    }
    scored.sortBy { case (t, sc) => (-sc, t) }.take(size).toDF("suggestion", "score")
  }
}
