package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The north-rule corpus: an Iceberg-style table of source-code repositories
 * with columns `(repo, path, commit, lang, content)` plus the per-row
 * `sha256(content)` invariant (`BASELINE.json` input_hint). The reference
 * ingests arbitrary JSON docs through its pipeline
 * (reference: processor/InferenceProcessor.java:63-139); our ingest stage is a
 * pure `DataFrame -> DataFrame` projection, so Catalyst keeps it inside one
 * codegen'd scan-project over the source table — no shuffle at any scale.
 */
object Corpus {

  /**
   * Deterministic ingest of the driver's `documents` table into the exact
   * north-rule corpus shape. Every derived column is a pure function of the
   * row (doc_id, text, lang), so re-running ingest on any subset yields
   * byte-identical rows — the property the lineage/resume machinery relies on.
   */
  def ingest(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id"),
      concat(lit("repo-"), col("doc_id") % 50).as("repo"),
      concat(lit("src/pkg"), col("doc_id") % 97, lit("/File"), col("doc_id"), lit("."), col("lang")).as("path"),
      col("lang"),
      col("text").as("content")
    ).withColumn("commit",
      substring(sha2(concat_ws("/", col("repo"), col("path"), col("content")), 256), 1, 12))
      .withColumn("sha256", sha2(col("content"), 256))
      .select("doc_id", "repo", "path", "commit", "lang", "content", "sha256")
  }

  /**
   * Seeded synthetic source-code corpus at arbitrary scale, for benchmarks
   * (FIXTURES.md §1): keyword-skewed token stream (Zipf head terms `import` /
   * `return` / `def` / `class`) plus camelCase/snake_case identifiers,
   * 20-220 tokens per doc. Generated distributed from `spark.range` — no
   * driver-side data, no unseeded randomness, identical at every parallelism.
   *
   * Partition count is FIXED (not defaultParallelism): input granularity in
   * production comes from files/splits, not from the executor count, and a
   * corpus whose partitioning tracked the core count would confound every
   * scaling measurement run on top of it.
   */
  def generate(spark: SparkSession, nDocs: Long, seed: Long = 42L,
               numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    val langs = Array("java", "scala", "py", "go", "js")
    val keywords = Array("import", "return", "def", "class", "val", "if", "else", "for", "new", "match")
    val idents = Array("parseQueryPlan", "buildIndexBlock", "mergeSegments", "scoreTopDocs",
      "snake_case_util", "normalizeScores", "combineResults", "tokenStream", "docFreqStats",
      "blockMaxWand", "postingCodec", "shuffleWriter", "bucketSpan", "avgDocLength")
    spark.range(0, nDocs, 1, numPartitions).map { i =>
      // splitmix64 — deterministic per doc id, independent of partitioning
      var x = i + seed * 0x9e3779b97f4a7c15L
      def next(): Long = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val lang = langs(((i % langs.length).toInt + langs.length) % langs.length)
      val nTok = 20 + (Math.floorMod(next(), 200L)).toInt
      val sb = new StringBuilder(nTok * 8)
      var t = 0
      while (t < nTok) {
        val r = Math.floorMod(next(), 100L)
        // Zipf-ish: 45% keywords (head skew), 45% identifiers, 10% uniques
        val tok =
          if (r < 45) keywords((Math.floorMod(next(), keywords.length.toLong)).toInt)
          else if (r < 90) idents((Math.floorMod(next(), idents.length.toLong)).toInt)
          else s"sym${Math.floorMod(next(), 5000L)}"
        if (t > 0) sb.append(' ')
        sb.append(tok)
        t += 1
      }
      val content = sb.toString
      (i, s"repo-${i % 50}", s"src/pkg${i % 97}/File$i.$lang", lang, content)
    }.toDF("doc_id", "repo", "path", "lang", "content")
      .withColumn("commit",
        substring(sha2(concat_ws("/", col("repo"), col("path"), col("content")), 256), 1, 12))
      .withColumn("sha256", sha2(col("content"), 256))
      .select("doc_id", "repo", "path", "commit", "lang", "content", "sha256")
  }
}
