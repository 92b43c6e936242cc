package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (Array[Float]):
 *
 *  - brute-force cosine top-k (the exact baseline, analogue of the
 *    reference's ExactMatchScorer fallback for small segments,
 *    sparse/query/ExactMatchScorer.java:20-64);
 *  - IVF-style two-level search: assign every vector to its nearest of a
 *    fixed centroid set, probe only the nProbe centroids closest to the
 *    query — the same skip-most-of-the-index idea as SEISMIC's
 *    cluster-summary pruning (sparse/query/SeismicBaseScorer.java:202-220),
 *    re-expressed as a pre-partitioned (clustered) table + a pruned scan.
 *
 * Dot products are `zip_with` + `aggregate` column algebra over
 * double-cast arrays — codegen'd, no UDFs. At scale the assignment table is
 * written partitioned by centroid so a probe reads only nProbe partitions.
 */
object Ann {

  /** Left-to-right double dot product (matches DuckDB list_dot_product order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k against the embedding of `queryId`. */
  def bruteTopK(emb: DataFrame, id: String, vec: String, queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col(id), round(cosine(col(vec), col("qv")), 4).as("cos"),
        cosine(col(vec), col("qv")).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .drop("_c")
  }

  /** Deterministic IVF: centroids = the embeddings of ids [0, nCentroids);
   *  every vector is assigned to its max-cosine centroid (ties -> smallest
   *  centroid id). Returns (id, centroid_id). One hash aggregate over the
   *  N x C cross rows — `max(struct(cos, -c_id))` picks the argmax without
   *  the per-vector window sort a row_number formulation would pay. */
  def ivfAssign(emb: DataFrame, id: String, vec: String, nCentroids: Int): DataFrame = {
    val cents = emb.where(col(id) < nCentroids)
      .select(col(id).as("c_id"), col(vec).as("cv"))
    emb.crossJoin(broadcast(cents))
      .select(col(id),
        struct(cosine(col(vec), col("cv")).as("c"), (-col("c_id")).as("nc")).as("s"))
      .groupBy(col(id))
      .agg(max(col("s")).as("m"))
      .select(col(id), (-col("m.nc")).as("c_id"))
  }

  /**
   * Build-time IVF artifact: compute the assignment once and persist it
   * partitioned by centroid, so a probe scans only the nProbe partitions it
   * needs (partition pruning = the cluster-skip of SEISMIC's summaries,
   * sparse/query/SeismicBaseScorer.java:202-220, in storage-layout form).
   * Returns the read-back assignment (id, c_id).
   */
  def ivfBuild(emb: DataFrame, id: String, vec: String, nCentroids: Int, path: String): DataFrame = {
    ivfAssign(emb, id, vec, nCentroids)
      .write.mode("overwrite").partitionBy("c_id").parquet(path)
    emb.sparkSession.read.parquet(path)
  }

  /** IVF search: probe the nProbe centroids nearest to the query embedding,
   *  brute-force only within their assigned vectors. `assigned` is the
   *  build-time artifact from [[ivfBuild]]; recomputing it per query would
   *  make every query O(corpus x centroids). */
  def ivfTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
              nCentroids: Int, nProbe: Int, k: Int,
              assigned: Option[DataFrame] = None): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    val cents = emb.where(col(id) < nCentroids)
      .select(col(id).as("c_id"), col(vec).as("cv"))
    val probed = cents.crossJoin(broadcast(q))
      .orderBy(cosine(col("cv"), col("qv")).desc, col("c_id").asc)
      .limit(nProbe)
      .select("c_id")
    val asg = assigned.getOrElse(ivfAssign(emb, id, vec, nCentroids))
    emb.join(asg, id)
      .join(broadcast(probed), "c_id")
      .crossJoin(broadcast(q))
      .select(col(id), round(cosine(col(vec), col("qv")), 4).as("cos"),
        cosine(col(vec), col("qv")).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .drop("_c")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by an equality key
   *  (e.g. a cluster/label column) to bound the pair explosion. */
  def cosinePairs(emb: DataFrame, id: String, vec: String, blockCol: String,
                  threshold: Double): DataFrame = {
    val a = emb.select(col(id).as("id_a"), col(vec).as("va"), col(blockCol).as("blk"))
    val b = emb.select(col(id).as("id_b"), col(vec).as("vb"), col(blockCol).as("blk"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("c", cosine(col("va"), col("vb")))
      .where(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cos"))
  }
}
