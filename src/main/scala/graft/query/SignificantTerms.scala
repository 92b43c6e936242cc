package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.{Index, InvertedIndex, PostingCodec}

/** `significant_terms` bucket aggregation: terms over-represented in the
 *  matched (foreground) doc set relative to the whole index (background),
 *  scored with OpenSearch's default JLH heuristic
 *  `(fgPct - bgPct) * (fgPct / bgPct)` — positive-signal terms only, top-k
 *  by score. The reference runs bucket aggs over the hybrid matched set via
 *  its aggregation processor (SURVEY §2.11); this is the "what is special
 *  about these hits" agg.
 *
 *  Execution shape: the postings scan is pruned to the BUCKETS containing
 *  foreground docs BEFORE any block decode (the scorers' bucket-broadcast
 *  idiom), so per-query work scales with the foreground's posting volume,
 *  never the index; the per-term foreground count is a map-side-combined
 *  aggregate, and background stats come free from the persisted termStats
 *  table. The result feeds one TakeOrdered — no global sort. */
object SignificantTerms {

  /** @param matched DataFrame(doc_id) — the foreground (query-matched) docs.
   *  @return (term, fg_df, bg_df, score) — top `k` by JLH score. */
  def apply(idx: Index, matched: DataFrame, k: Int): DataFrame = {
    val fgTotal = matched.count().toDouble
    require(fgTotal > 0, "significant_terms needs a non-empty foreground")
    scored(idx, matched, k, fgTotal)
  }

  /** The scoring tail with the foreground cardinality precomputed — lets
   *  [[heuristics]] reuse ONE count of the foreground query. */
  private def scored(idx: Index, matched: DataFrame, k: Int,
                     fgTotal: Double): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val buckets = matched
      .select(shiftright(col("doc_id"), InvertedIndex.BucketBits).as("bucket"))
      .distinct()
    val pruned = idx.postings.join(broadcast(buckets), "bucket")
      .select("term", "bucket", "cnt", "max_tf", "sum_tf", "docs", "tfs")
      .as[graft.index.PostingBlock]
    val fgPairs = pruned.flatMap { b =>
      val base = b.bucket << InvertedIndex.BucketBits
      val ids = PostingCodec.decodeDeltas(b.docs, b.cnt)
      (0 until b.cnt).iterator.map(i => (b.term, base + ids(i)))
    }.toDF("term", "doc_id")
    val fg = fgPairs.join(matched, "doc_id")
      .groupBy("term").agg(count(lit(1)).as("fg_df"))
    val n = idx.stats.doc_count.toDouble
    val fgPct = col("fg_df") / lit(fgTotal)
    val bgPct = col("df") / lit(n)
    fg.join(idx.termStats.select(col("term"), col("df")), "term")
      .where(fgPct > bgPct)
      .withColumn("jlh", (fgPct - bgPct) * (fgPct / bgPct))
      .orderBy(col("jlh").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("fg_df"), col("df").as("bg_df"),
        round(col("jlh"), 4).as("score"))
  }

  /** The alternate significance heuristics beside JLH — `chi_square` and
   *  `mutual_information`, computed from the SAME one-pass fg/bg counts as
   *  the Manning & Schütze formulas the reference's heuristics document as
   *  their basis (χ² 5.3.3 over the 2×2 doc contingency table; MI 13.5.1),
   *  with the default background-is-superset adjustment (the background
   *  cell counts exclude the foreground — OpenSearch's
   *  `background_is_superset: true`). Emitted side by side per term so a
   *  caller can rank by any of the three; ordering here is JLH
   *  (score desc, term asc), the reference default. Constant conventions
   *  (log base 2 for MI, no Yates correction for χ²) follow the cited
   *  definitions. */
  def heuristics(idx: Index, matched: DataFrame, k: Int): DataFrame = {
    val fgTotal = matched.count().toDouble
    require(fgTotal > 0, "significant_terms needs a non-empty foreground")
    val base = scored(idx, matched, k, fgTotal)
    val n = idx.stats.doc_count.toDouble
    // 2x2 contingency over docs, background-as-superset adjusted:
    //   o11 = fg_df            o12 = fgTotal - fg_df
    //   o21 = bg_df - fg_df    o22 = (n - fgTotal) - o21
    val o11 = col("fg_df").cast("double")
    val o12 = lit(fgTotal) - o11
    val o21 = col("bg_df").cast("double") - o11
    val o22 = lit(n - fgTotal) - o21
    val nn = lit(n)
    val chi2 = nn * pow(o11 * o22 - o12 * o21, 2) /
      ((o11 + o12) * (o11 + o21) * (o12 + o22) * (o21 + o22))
    def miTerm(oxy: Column, px: Column, py: Column) =
      when(oxy > 0, (oxy / nn) * log2((oxy / nn) / (px * py))).otherwise(0.0)
    val (pT, pNt) = ((o11 + o21) / nn, (o12 + o22) / nn)
    val (pFg, pBg) = (lit(fgTotal) / nn, lit(1.0) - lit(fgTotal) / nn)
    val mi = miTerm(o11, pT, pFg) + miTerm(o12, pNt, pFg) +
      miTerm(o21, pT, pBg) + miTerm(o22, pNt, pBg)
    base.select(col("term"), col("fg_df"), col("bg_df"), col("score").as("jlh"),
      round(chi2, 4).as("chi_square"), round(mi, 6).as("mutual_information"))
  }

  /** `significant_text` aggregation — significant_terms' sibling for text
   *  fields: instead of reading the index, it RE-ANALYZES the stored text
   *  of the (sampled) foreground hits on the fly, and optionally drops
   *  duplicate text first (`filter_duplicate_text`, first-wins by doc_id)
   *  so boilerplate repeated across hits cannot dominate the signal.
   *  OpenSearch documents it for use under a `sampler` agg precisely
   *  because re-analysis costs per-doc work: here `matched` IS that
   *  bounded sample (top-k hits), so the re-tokenize + dedupe window run
   *  over <= sample-size rows — never corpus-shaped. Background stats
   *  still come from the persisted termStats table; scoring is the same
   *  JLH heuristic, counting each term once per surviving doc. */
  def text(idx: Index, docs: DataFrame, textCol: String, matched: DataFrame,
           k: Int, filterDuplicateText: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fg0 = docs.join(matched.select("doc_id"), "doc_id")
      .select(col("doc_id"), col(textCol).as("_txt"))
    val fgDocs =
      if (!filterDuplicateText) fg0
      else fg0
        .withColumn("_rn", row_number().over(
          Window.partitionBy(md5(col("_txt"))).orderBy(col("doc_id"))))
        .where(col("_rn") === 1).drop("_rn")
    val fgTotal = fgDocs.count().toDouble
    require(fgTotal > 0, "significant_text needs a non-empty foreground")
    val fgTok = fgDocs
      .select(col("doc_id"), explode(split(col("_txt"), " ")).as("term"))
      .where(col("term") =!= "")
      .distinct()
    val fg = fgTok.groupBy("term").agg(count(lit(1)).as("fg_df"))
    val n = idx.stats.doc_count.toDouble
    val fgPct = col("fg_df") / lit(fgTotal)
    val bgPct = col("df") / lit(n)
    fg.join(idx.termStats.select(col("term"), col("df")), "term")
      .where(fgPct > bgPct)
      .withColumn("jlh", (fgPct - bgPct) * (fgPct / bgPct))
      .orderBy(col("jlh").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("fg_df"), col("df").as("bg_df"),
        round(col("jlh"), 4).as("score"))
  }
}
