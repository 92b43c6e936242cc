package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Train/test decontamination: flag training documents that share word
 * n-grams with a held-out benchmark set — the overlap rule LLM training
 * pipelines apply before training (GPT-3 appendix C / PaLM appendix use
 * 8-13-gram collisions; the n is a parameter here).
 *
 * Scale shape: the benchmark side is metadata-sized next to a 100 TB
 * corpus, so its distinct shingle set is collected into a BROADCAST hash
 * relation and the corpus side is a map-side left join over the shingle
 * stream — the corpus is never shuffled by shingle; the only shuffle is
 * the per-doc count aggregate keyed by doc_id (partial aggregation
 * map-side, bounded groups).
 */
object Decontam {

  /** Per-corpus-doc overlap report against `bench`: distinct-shingle count,
   *  how many of them occur anywhere in the benchmark set, the contaminated
   *  fraction, and the flag (any overlap). Docs shorter than k n-grams have
   *  no shingles and are dropped (nothing to match on — same convention as
   *  the Jaccard dedup operators). */
  def overlap(corpus: DataFrame, bench: DataFrame, id: String, text: String,
              k: Int): DataFrame = {
    val benchShingles = Dedup.shingles(bench, id, text, k)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1L))
    Dedup.shingles(corpus, id, text, k)
      .join(broadcast(benchShingles), Seq("shingle"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce(col("hit"), lit(0L))).as("n_contam"))
      .withColumn("contam_frac",
        round(col("n_contam").cast("double") / col("n_shingles"), 4))
      .withColumn("contaminated", col("n_contam") > 0)
  }
}
