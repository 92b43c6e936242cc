package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines (builder
 * brief: language-ID heuristic, quality scoring, token counting, document
 * fingerprinting). All pure `functions._` column algebra — whole-stage
 * codegen, no UDFs, scales linearly with the corpus and pushes column
 * pruning to the scan.
 */
object TextOps {

  /** whitespace-ish token array with empties removed. */
  def tokensCol(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private val Stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Token counting: whitespace tokens, alnum-regex tokens, distinct tokens. */
  def tokenCounts(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      size(tokensCol(col(text))).cast("long").as("ws_tokens"),
      size(filter(split(col(text), "[^a-zA-Z0-9]+"), t => t =!= "")).cast("long").as("alnum_tokens"),
      size(array_distinct(tokensCol(col(text)))).cast("long").as("distinct_tokens"))

  // PII patterns kept to syntax Java regex and RE2 (the DuckDB oracle)
  // interpret identically: character classes, bounded quantifiers, \b.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat  = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  private val PhonePat = "\\+[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction — the privacy-scrub step of a training-data pipeline
   *  (the C4/Gopher-era pipelines drop or mask emails, IPs and phone
   *  numbers before training): masks emails, IPv4 addresses and
   *  international-format phone numbers with typed placeholders and counts
   *  each category (counts are matches of each pattern on the ORIGINAL
   *  text; the redaction itself applies email -> ip -> phone in sequence).
   *  Pure regexp column algebra — codegen'd, map-only, zero shuffle. */
  def redactPii(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    docs.select(
      col(id),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        PhonePat, "<PHONE>").as("clean"),
      regexp_count(t, lit(EmailPat)).cast("long").as("n_email"),
      regexp_count(t, lit(Ipv4Pat)).cast("long").as("n_ip"),
      regexp_count(t, lit(PhonePat)).cast("long").as("n_phone"))
  }

  /** Quality scoring: length stats + stopword ratio + a composite score
   *  in [0,1] (len-saturation x (1 - stopword_ratio)). */
  def quality(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokensCol(col(text))
    val nTok = size(toks).cast("double")
    val stop = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    val stopRatio = when(nTok > 0, stop / nTok).otherwise(0.0)
    val avgWordLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok).otherwise(0.0)
    val lenSat = least(lit(1.0), nTok / 50.0)
    docs.select(
      col(id),
      nTok.cast("long").as("n_tokens"),
      length(col(text)).cast("long").as("n_chars"),
      round(avgWordLen, 4).as("avg_word_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(lenSat * (lit(1.0) - stopRatio), 4).as("quality"))
  }

  /** Language-ID heuristic: marker-token ratio (n-gram-style stopword
   *  profile). The synthetic corpus is English-vocab, so the heuristic
   *  resolves to en/unk — the operator shape (per-language marker profiles,
   *  argmax) is what matters at scale. */
  def langId(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokensCol(col(text))
    val nTok = size(toks).cast("double")
    val markers = size(filter(toks, t => t.isInCollection(Seq("the", "a")))).cast("double")
    val ratio = when(nTok > 0, markers / nTok).otherwise(0.0)
    docs.select(
      col(id),
      round(ratio, 4).as("marker_ratio"),
      when(ratio >= 0.02, "en").otherwise("unk").as("pred_lang"))
  }

  /** Document fingerprint: md5 over the sorted distinct token set (the
   *  canonicalize-then-hash fingerprinting used for near-dup detection). */
  def fingerprint(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      md5(concat_ws(" ", array_sort(array_distinct(tokensCol(col(text)))))).as("fingerprint"))

  /** Word n-gram array (space-joined), empty when the doc is shorter than n. */
  private def gramsCol(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, (i + 1).cast("int"), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Occurrences belonging to a value that appears more than once, counted
   *  over the SORTED array in one linear pass: element i is part of a
   *  duplicate run iff it equals a neighbour. */
  /** Occurrences belonging to a value that appears more than once =
   *  n - (values appearing exactly once), via ONE linear fold over the
   *  sorted array. The previous formulation filtered an index sequence with
   *  element_at(sorted, i) back-references — and higher-order functions
   *  evaluate interpreted, where each back-reference RE-EVALUATES the whole
   *  sorted-grams child per element: O(n² · sort) per row, which turned a
   *  sub-second metric into minutes on longer documents. */
  private def dupOccurrences(sorted: Column): Column =
    when(size(sorted) > 0,
      size(sorted).cast("long") - aggregate(sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("singles")),
        (acc, x) => {
          val isNew = acc.getField("run") === 0L || x =!= acc.getField("prev")
          struct(
            x.as("prev"),
            when(isNew, 1L).otherwise(acc.getField("run") + 1L).as("run"),
            (acc.getField("singles") +
              when(isNew && acc.getField("run") === 1L, 1L).otherwise(0L))
              .as("singles"))
        },
        acc => acc.getField("singles") +
          when(acc.getField("run") === 1L, 1L).otherwise(0L)))
      .otherwise(lit(0L))

  /** Count of the most frequent value = longest equal run of the sorted
   *  array, via a linear `aggregate` fold (prev, run, best). */
  private def topCount(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Intra-document repetition metrics — the Gopher "repetitious text"
   *  quality signals (Rae et al. 2021, table A1): fraction of token
   *  occurrences that are repeats, and for n-grams (n = 2, 3) the fraction
   *  of occurrences belonging to a duplicated n-gram plus the fraction
   *  taken by the single most frequent n-gram. Entirely map-side: each
   *  doc's gram arrays are sorted in place and folded linearly — no
   *  explode/groupBy shuffle, so the operator is one projection over the
   *  corpus scan and scales with pure data parallelism at 100 TB. */
  def repetition(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokensCol(col(text))
    def frac(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 4)
    def metrics(n: Int): Seq[Column] = {
      val sorted = array_sort(gramsCol(toks, n))
      val nG = size(sorted)
      Seq(frac(dupOccurrences(sorted), nG).as(s"dup_${n}gram_frac"),
          frac(topCount(sorted), nG).as(s"top_${n}gram_frac"))
    }
    val sortedToks = array_sort(toks)
    docs.select(
      Seq(col(id), size(toks).cast("long").as("n_tokens"),
          frac(dupOccurrences(sortedToks), size(toks)).as("dup_token_frac")) ++
        metrics(2) ++ metrics(3): _*)
  }

  /** Corpus-trained bigram-LM perplexity per doc — the CCNet-style quality
   *  signal (an in-domain LM scores each document; high perplexity flags
   *  boilerplate/garble for the filtering stage). Add-one-smoothed bigram
   *  model trained on the SAME corpus it scores:
   *  p(w2|w1) = (c(w1 w2) + 1) / (c_ctx(w1) + V), where c_ctx counts w1 as
   *  a bigram left-context and V is the corpus vocabulary; per-doc
   *  ppl = exp(mean over its bigrams of -ln p). Docs with < 2 tokens carry
   *  no bigram and are excluded.
   *
   *  Shape: two map-side-combined count aggregates (bigram, context) + one
   *  join of the doc's bigrams against those counts — no driver-side model
   *  object, so the "LM" scales with the corpus like any aggregate; a real
   *  KenLM would slot in as a broadcast scorer over the same bigram
   *  relation. */
  def bigramPerplexity(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id).as("doc_id"), tokensCol(col(text)).as("t"))
      .where(size(col("t")) >= 2)
    val bg = toks.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val spark = docs.sparkSession
    val vocab = docs.select(explode(tokensCol(col(text))).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0).toDouble
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("c1") + lit(vocab)) / (col("c12") + lit(1.0)))).as("nll"))
      .select(col("doc_id"), col("n_bigrams"), round(exp(col("nll")), 4).as("ppl"))
  }
}
