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
  def ivfAssign(emb: DataFrame, id: String, vec: String, nCentroids: Int): DataFrame =
    assignTo(emb, id, vec,
      emb.where(col(id) < nCentroids).select(col(id).as("c_id"), col(vec).as("cv")))

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

  /** Assignment of every vector to its max-cosine centroid from an explicit
   *  centroid table (c_id, cv). Same max-struct argmax as [[ivfAssign]]. */
  def assignTo(emb: DataFrame, id: String, vec: String, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col(id),
        struct(cosine(col(vec), col("cv")).as("c"), (-col("c_id")).as("nc")).as("s"))
      .groupBy(col(id))
      .agg(max(col("s")).as("m"))
      .select(col(id), (-col("m.nc")).as("c_id"))

  /**
   * Learned IVF centroids: Lloyd's k-means over the embedding table, the
   * scale path that replaces the fixed "embeddings of ids < nCentroids" seed
   * set (whose partition balance is luck). Deterministic: init = those same
   * seed embeddings, a fixed iteration count, cosine assignment with
   * smallest-centroid-id tie-break. Each iteration is one broadcast-join
   * argmax assignment plus one (c_id, dim) mean aggregate — no windows and
   * no driver-side loop over data rows (only over `iters`, a constant).
   * A centroid that loses every member keeps its previous position.
   * Cosine is scale-invariant, so the plain element-wise mean serves as the
   * spherical-k-means update without renormalization.
   *
   * @return centroid table (c_id, cv) — bounded by nCentroids rows.
   */
  def kmeansCentroids(emb: DataFrame, id: String, vec: String, nCentroids: Int,
                      iters: Int = 5, trainSampleMod: Int = 1): DataFrame = {
    // Sample-trained centroids (the corpus-scale path): Lloyd's iterations
    // run over the deterministic id-mod sample only — at 10¹¹ vectors you
    // train on a sample and assign the full corpus ONCE (ivfBuildLearned),
    // instead of paying `iters` full-corpus assignment scans. Centroid
    // QUALITY depends on the sample; partition-cover correctness does not
    // (assignment is exhaustive for any centroid set).
    require(trainSampleMod >= 1, "trainSampleMod must be >= 1")
    val train =
      if (trainSampleMod == 1) emb
      else emb.where(pmod(col(id), lit(trainSampleMod)) === 0)
    val init = emb.where(col(id) < nCentroids)
      .select(col(id).cast("long").as("c_id"), col(vec).as("cv"))
    (0 until iters).foldLeft(init) { (cents, _) =>
      val asg = assignTo(train, id, vec, cents)
      val means = train.join(asg, id)
        .select(col("c_id"), posexplode(col(vec)))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("col").cast("double")).as("av"))
        .groupBy(col("c_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("av")))),
          e => e.getField("av")).as("cv_new"))
      // persist the small (<= nCentroids rows) result so the next iteration's
      // lineage doesn't recompute every prior assignment pass
      val next = cents.join(means, Seq("c_id"), "left")
        .select(col("c_id"), coalesce(col("cv_new"), col("cv")).as("cv"))
        .localCheckpoint(true)
      next
    }
  }

  /** Learned-IVF build artifact: k-means centroids + the final assignment,
   *  both persisted; the assignment is partitioned by centroid for probe-time
   *  partition pruning. Returns (centroids, assignment) read back. */
  def ivfBuildLearned(emb: DataFrame, id: String, vec: String, nCentroids: Int,
                      path: String, iters: Int = 5,
                      trainSampleMod: Int = 1): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    val cents = kmeansCentroids(emb, id, vec, nCentroids, iters, trainSampleMod)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val centsBack = spark.read.parquet(s"$path/centroids")
    assignTo(emb, id, vec, centsBack)
      .write.mode("overwrite").partitionBy("c_id").parquet(s"$path/assign")
    (centsBack, spark.read.parquet(s"$path/assign"))
  }

  /** Build-time IVF artifact with VECTORS inline, partitioned by centroid:
   *  a probe reads only its nProbe partitions and never joins the embedding
   *  table again — the layout a corpus-scale dense index needs (the
   *  reference's neural clause is always ANN-backed,
   *  query/NeuralKNNQueryBuilder.java:1-489; this is its Lucene-HNSW role
   *  re-expressed as storage partitioning). Returns the read-back
   *  (id, vec, c_id) table. */
  def ivfBuildVectors(emb: DataFrame, id: String, vec: String,
                      centroids: DataFrame, path: String): DataFrame = {
    emb.join(assignTo(emb, id, vec, centroids), id)
      .write.mode("overwrite").partitionBy("c_id").parquet(path)
    emb.sparkSession.read.parquet(path)
  }

  /** Probe-time scoring against [[ivfBuildVectors]]'s artifact: cosine of
   *  every vector in the nProbe query-closest centroids' partitions against
   *  the query vector `qv` (a 1-row DataFrame with column `qv`). The probed
   *  centroid ids are resolved eagerly (a collect bounded by nProbe over the
   *  centroid table — metadata-sized, <= a few thousand rows even at corpus
   *  scale, the planner-side partition selection every partition-pruned scan
   *  does) and applied as a STATIC `c_id IN (...)` predicate, so the
   *  PartitionFilter reaches the parquet scan and only nProbe directories
   *  are ever read — no reliance on dynamic pruning firing for a join.
   *  Exact when nProbe = centroid count. Returns (doc_id, score), unbounded
   *  rows (callers bound with their own top-k / threshold). */
  def ivfProbeScore(vectors: DataFrame, centroids: DataFrame, qv: DataFrame,
                    id: String, vec: String, nProbe: Int): DataFrame = {
    val probedIds = centroids.crossJoin(broadcast(qv))
      .orderBy(cosine(col("cv"), col("qv")).desc, col("c_id").asc)
      .limit(nProbe)
      .select("c_id")
      .collect().map(_.get(0)).toSeq
    vectors.where(col("c_id").isin(probedIds: _*))
      .crossJoin(broadcast(qv))
      .select(col(id).as("doc_id"), cosine(col(vec), col("qv")).as("score"))
  }

  /** IVF search against an explicit (learned) centroid table: probe the
   *  nProbe centroids nearest to the query, brute-force only their assigned
   *  vectors. With nProbe = nCentroids this is exact. */
  def ivfTopKLearned(emb: DataFrame, id: String, vec: String, queryId: Long,
                     centroids: DataFrame, assigned: DataFrame,
                     nProbe: Int, k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    val probed = centroids.crossJoin(broadcast(q))
      .orderBy(cosine(col("cv"), col("qv")).desc, col("c_id").asc)
      .limit(nProbe)
      .select("c_id")
    emb.join(assigned, id)
      .join(broadcast(probed), "c_id")
      .crossJoin(broadcast(q))
      .select(col(id), round(cosine(col(vec), col("qv")), 4).as("cos"),
        cosine(col(vec), col("qv")).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .drop("_c")
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

  /** Radial (range) kNN: every vector within the similarity radius of the
   *  query embedding, instead of the k nearest — the reference's
   *  `min_score` / `max_distance` neural-clause forms
   *  (query/NeuralQueryBuilder.java:156-157,547-551). `max_distance` is
   *  cosine distance (1 - cosine), so both forms reduce to a lower bound on
   *  cosine; exactly one must be given, as the reference validates
   *  (util/NeuralQueryValidationUtil.java:139-148). Result size is
   *  data-dependent (radius semantics), ordered best-first. */
  def radial(emb: DataFrame, id: String, vec: String, queryId: Long,
             minScore: Option[Double] = None,
             maxDistance: Option[Double] = None): DataFrame = {
    require(minScore.isDefined ^ maxDistance.isDefined,
      "radial knn requires exactly one of [min_score], [max_distance]")
    require(maxDistance.forall(_ >= 0.0), "max_distance must be >= 0")
    val bound = minScore.getOrElse(1.0 - maxDistance.get)
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col(id), cosine(col(vec), col("qv")).as("_c"))
      .where(col("_c") >= bound)
      .orderBy(col("_c").desc, col(id).asc)
      .select(col(id), round(col("_c"), 4).as("cos"))
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
