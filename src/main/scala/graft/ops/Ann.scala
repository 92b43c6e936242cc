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

  /** Scalar int8 quantization of the embedding column — the 4x memory/IO
   *  reduction that makes a 100 TB vector corpus storable and scannable
   *  (the byte-vector index form of the reference ecosystem): per vector
   *  scale = max|v| / 127, q_i = floor(v_i / scale + 0.5) stored as
   *  tinyint (symmetric round-half-up written as floor(+0.5) — an
   *  expression both engines reproduce bit-identically, where native
   *  round() functions disagree on halves), so q is always in [-127, 127].
   *  A zero vector quantizes to scale 0 with an all-zero qvec and is
   *  excluded from cosine scoring (undefined norm). Pure codegen'd column
   *  algebra — one pass, no UDFs. */
  def quantizeInt8(emb: DataFrame, id: String, vec: String): DataFrame = {
    val scale = array_max(transform(col(vec), x => abs(x.cast("double")))) / lit(127.0)
    emb.select(col(id), scale.as("scale"),
      when(scale > 0,
        transform(col(vec), x =>
          floor(x.cast("double") / scale + lit(0.5)).cast("tinyint")))
        .otherwise(transform(col(vec), x => lit(0).cast("tinyint")))
        .as("qvec"))
  }

  /** Top-k cosine against [[quantizeInt8]]'s artifact: dequantize
   *  q * scale on the fly (one multiply per element) against the float
   *  query vector — the scan reads a quarter of the bytes and the rest is
   *  the exact brute-force shape (codegen'd score, bounded TakeOrdered). */
  def int8CosineTopK(quantized: DataFrame, id: String,
                     queryVec: Seq[Double], k: Int): DataFrame = {
    require(queryVec.nonEmpty, "int8 cosine requires a non-empty query vector")
    val dv = transform(col("qvec"), q => q.cast("double") * col("scale"))
    val qv = array(queryVec.map(lit): _*)
    quantized.where(col("scale") > 0)
      .select(col(id), cosine(dv, qv).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .select(col(id), round(col("_c"), 4).as("cos"))
  }

  /** Brute top-k in the `l2` space — the kNN space_type beside cosine:
   *  score = 1/(1 + l2²), the reference ecosystem's bounded-(0,1] form, so
   *  higher is better and the TakeOrdered contract matches every other
   *  scorer. Same scan shape as [[bruteTopK]]. */
  def bruteL2TopK(emb: DataFrame, id: String, vec: String, queryId: Long,
                  k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    val diff = zip_with(col(vec), col("qv"),
      (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    val l2sq = aggregate(diff, lit(0.0), (acc, v) => acc + v)
    emb.crossJoin(broadcast(q))
      .select(col(id), (lit(1.0) / (lit(1.0) + l2sq)).as("_s"))
      .orderBy(col("_s").desc, col(id).asc)
      .limit(k)
      .select(col(id), round(col("_s"), 4).as("score"))
  }

  /** Brute top-k in the `innerproduct` space: raw dot product, the
   *  maximum-inner-product retrieval shape. */
  def bruteIpTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
                  k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col(id), dot(col(vec), col("qv")).as("_s"))
      .orderBy(col("_s").desc, col(id).asc)
      .limit(k)
      .select(col(id), round(col("_s"), 4).as("score"))
  }

  /** Sign-bit binary packing: one BIGINT of per-dimension sign bits (bit d
   *  set iff v[d] > 0) — the 1-bit-per-dimension binary vector type, a
   *  64x storage/scan reduction for dim <= 64. Distinct powers of two
   *  never carry, so the fold is exactly a bitwise OR both engines
   *  evaluate identically (including the sign bit at d = 63). */
  def signPack(vec: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"signPack packs into one long, dim <= 64, got $dim")
    (0 until dim).map { d =>
      when(element_at(vec, d + 1) > 0, lit(1L << d)).otherwise(0L)
    }.reduceLeft(_ + _)
  }

  /** Binary (Hamming) kNN over [[signPack]]ed vectors — the byte/binary
   *  vector space of the reference ecosystem: distance =
   *  popcount(h XOR qh), one codegen'd expression per row over the packed
   *  column, bounded TakeOrdered. The cheapest possible 100 TB scan shape:
   *  8 bytes per vector, XOR+popcount per candidate. */
  def hammingTopK(emb: DataFrame, id: String, vec: String, dim: Int,
                  queryId: Long, k: Int): DataFrame = {
    val packed = emb.select(col(id), signPack(col(vec), dim).as("h"))
    val q = packed.where(col(id) === queryId).select(col("h").as("qh"))
    packed.crossJoin(broadcast(q))
      .select(col(id), expr("bit_count(h ^ qh)").cast("long").as("hamming"))
      .orderBy(col("hamming").asc, col(id).asc)
      .limit(k)
  }

  /** Quantization RESCORE (the knn `rescore` / oversample contract of the
   *  reference ecosystem's disk-optimized quantized indexes): phase 1
   *  collects k·oversample candidates by the LOSSY int8 score — reading a
   *  quarter of the bytes — phase 2 re-scores ONLY those candidates
   *  against the full-precision vectors and keeps the exact top-k. The
   *  full-precision table is touched for k·oversample rows via a
   *  broadcast-sized semi join, so the expensive reads stay
   *  candidate-bounded while recall approaches exact as oversample grows.
   *  Returns the EXACT cosine for the survivors (ordering may differ from
   *  brute force only by candidates the lossy phase missed). */
  def int8RescoreTopK(quantized: DataFrame, emb: DataFrame, id: String,
                      vec: String, queryVec: Seq[Double], k: Int,
                      oversample: Double): DataFrame = {
    require(oversample >= 1.0, s"oversample must be >= 1, got $oversample")
    val cand = int8CosineTopK(quantized, id, queryVec,
      math.ceil(k * oversample).toInt).select(col(id))
    val qv = array(queryVec.map(lit): _*)
    emb.join(broadcast(cand), id)
      .select(col(id), cosine(col(vec), qv).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .select(col(id), round(col("_c"), 4).as("cos"))
  }

  /** Seeded PQ codebook: codeword c of subspace j is the j-th subvector of
   *  the embedding with id c — the same deterministic seeding the fixed-
   *  centroid IVF uses (ids < nCentroids); per-subspace k-means is the
   *  standard refinement, exactly as learned centroids refine IVF. The
   *  collect is nCodes rows — bounded, never corpus-shaped. */
  def pqSeededCodebook(emb: DataFrame, id: String, vec: String,
                       m: Int, nCodes: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && nCodes >= 2, s"bad PQ shape m=$m nCodes=$nCodes")
    val seeds = emb.where(col(id) < nCodes)
      .select(col(id), col(vec)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1).map(_._2)
    require(seeds.length == nCodes, s"need ids 0..${nCodes - 1} as codebook seeds")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m, nCodes)((j, c) => seeds(c).slice(j * sub, j * sub + sub))
  }

  /** Product-quantize the embedding column: the vector splits into `m`
   *  subvectors, each encoded as the index of its nearest codeword
   *  (squared L2, first-match tie-break) — m small ints instead of dim
   *  floats, the 16-32x compression that makes a 100 TB vector corpus's
   *  candidate scan memory-resident. Pure codegen'd column algebra: the
   *  codebook rides along as literals, argmin is array_position of the
   *  array_min over the per-codeword distance array. */
  def pqEncode(emb: DataFrame, id: String, vec: String,
               codebook: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebook.length
    val sub = codebook(0)(0).length
    val codeCols = (0 until m).map { j =>
      val s = slice(col(vec), j * sub + 1, sub)
      val dists = array(codebook(j).map { cw =>
        aggregate(zip_with(s, lit(cw), (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    emb.select(col(id), array(codeCols: _*).as("codes"))
  }

  /** PQ top-k by asymmetric distance computation (ADC): the query stays
   *  float and a per-(subspace, codeword) dot-product table — m x nCodes
   *  doubles, computed ONCE on the driver — scores every encoded vector by
   *  m table lookups: approx dot(v, q) = sum_j table[j][code_j]. The scan
   *  reads only the codes. */
  def pqTopK(codes: DataFrame, id: String, queryVec: Seq[Double],
             codebook: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebook.length
    val sub = codebook(0)(0).length
    require(queryVec.length == m * sub,
      s"query dim ${queryVec.length} != ${m * sub}")
    val table: Array[Array[Double]] = Array.tabulate(m, codebook(0).length) {
      (j, c) =>
        val q = queryVec.slice(j * sub, j * sub + sub)
        // left-to-right dot, matching the oracle's list_dot_product
        q.zip(codebook(j)(c)).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
    }
    val approx = (0 until m).map { j =>
      element_at(lit(table(j)), element_at(col("codes"), j + 1) + 1)
    }.reduceLeft(_ + _)
    codes.select(col(id), approx.as("_a"))
      .orderBy(col("_a").desc, col(id).asc).limit(k)
      .select(col(id), round(col("_a"), 4).as("approx_dot"))
  }

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
    // repartition by the partition column before the partitioned write:
    // without it every write task emits a file into ALL nCentroids
    // directories (tasks x centroids tiny files + their commit round-trips);
    // with it each directory gets one file per shuffle partition holding
    // that c_id, and AQE sizes those partitions
    ivfAssign(emb, id, vec, nCentroids)
      .repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(path)
    emb.sparkSession.read.parquet(path)
  }

  /** Assignment of every vector to its max-cosine centroid from an explicit
   *  centroid table (c_id, cv) — MAP-SIDE: the centroid table is
   *  metadata-sized by construction (<= a few thousand rows even at corpus
   *  scale), so it is collected once and baked into the plan as a literal
   *  array, making assignment a shuffle-free map-only projection. The
   *  previous crossJoin + groupBy-argmax formulation multiplied the corpus
   *  x C before reducing it back — at 10^11 vectors that intermediate (and
   *  its hash aggregate) IS the build cost; here no row is ever widened.
   *  Tie-break parity with the old max(struct(cos, -c_id)): equal cosines
   *  pick the smallest centroid id. */
  def assignTo(emb: DataFrame, id: String, vec: String, centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    emb.select(col(id).as("_id"), col(vec).as("_v"),
        sqrt(dot(col(vec), col(vec))).as("_nv"))
      .select(col("_id"), centroidScores(col("_v"), col("_nv"), cents).as("_sc"))
      .select(col("_id").as(id), bestOf(cents).as("c_id"))
  }

  /** (c_id, cv) rows -> driver array, ordered by centroid id. Bounded by the
   *  centroid count — the same metadata-sized collect every partition-pruned
   *  probe already does ([[ivfProbeScore]]). */
  private def collectCentroids(centroids: DataFrame): Array[(Long, Array[Double])] =
    centroids.select(col("c_id").cast("long"), col("cv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Per-centroid cosine scores as one array column. Bit-parity with
   *  [[cosine]]: score_c = dot(v, cv_c) / (nv * normC) where nv is the
   *  hoisted sqrt(dot(v,v)) (computed once per row instead of once per
   *  centroid) and normC = sqrt(sum cv_i^2) is folded on the DRIVER in the
   *  same left-to-right order `aggregate` uses — identical IEEE ops, so the
   *  values (and any nProbe<C result that depends on them) are unchanged. */
  private def centroidScores(v: Column, nv: Column,
                             cents: Array[(Long, Array[Double])]): Column = {
    require(cents.nonEmpty, "centroid set must be non-empty")
    array(cents.toIndexedSeq.map { case (_, cv) =>
      val normC = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
      dot(v, typedLit(cv.toSeq)) / (nv * lit(normC))
    }: _*)
  }

  /** argmax over the `_sc` scores column: array_position finds the FIRST
   *  index holding the max, and the array is ordered by centroid id — so
   *  ties pick the smallest id, the same tie-break as the previous
   *  max(struct(cos, -c_id)) formulation. */
  private def bestOf(cents: Array[(Long, Array[Double])]): Column =
    element_at(typedLit(cents.toIndexedSeq.map(_._1)),
      array_position(col("_sc"), array_max(col("_sc"))).cast("int"))

  /**
   * Learned IVF centroids: Lloyd's k-means over the embedding table, the
   * scale path that replaces the fixed "embeddings of ids < nCentroids" seed
   * set (whose partition balance is luck). Deterministic: init = those same
   * seed embeddings, a fixed iteration count, cosine assignment with
   * smallest-centroid-id tie-break, sample rows visited in id order.
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
    //
    // Lloyd's state AND loop are driver-side over the collected sample — the
    // standard IVF trainer shape (a few hundred vectors per centroid
    // suffice; pick trainSampleMod so the sample is driver-bounded). One
    // distributed job total: the sample collect. Iterating distributedly
    // paid a fixed per-action cost (codegen + scheduling) per iteration for
    // work that is milliseconds on metadata-sized state; the corpus-scale
    // pass — the final full assignment — stays distributed and map-side
    // ([[assignTo]]).
    require(trainSampleMod >= 1, "trainSampleMod must be >= 1")
    val spark = emb.sparkSession
    // one collect fetches seeds (ids < nCentroids) and the id-mod sample
    val sampled = emb
      .where(pmod(col(id), lit(trainSampleMod)) === 0 || col(id) < nCentroids)
      .select(col(id).cast("long").as("_id"), col(vec).cast("array<double>").as("_v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    var cents: Array[(Long, Array[Double])] =
      sampled.takeWhile(_._1 < nCentroids).map { case (i, v) => (i, v) }
    val train = sampled.filter { case (i, _) => i % trainSampleMod == 0 }.map(_._2)
    // bit-parity with the SQL cosine: dot and norm are left-to-right folds
    def fDot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for (_ <- 0 until iters) {
      val norms = cents.map { case (_, cv) => math.sqrt(fDot(cv, cv)) }
      val sums = Array.fill(cents.length)(Array.fill(cents.head._2.length)(0.0))
      val counts = Array.fill(cents.length)(0L)
      train.foreach { v =>
        val nv = math.sqrt(fDot(v, v))
        var best = 0; var bestScore = Double.NegativeInfinity; var c = 0
        while (c < cents.length) { // first max wins: smallest centroid id on ties
          val s = fDot(v, cents(c)._2) / (nv * norms(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < v.length) { sums(best)(d) += v(d); d += 1 }
      }
      // a centroid that loses every member keeps its previous position
      cents = cents.zipWithIndex.map { case ((cid, old), c) =>
        if (counts(c) == 0) (cid, old)
        else (cid, sums(c).map(_ / counts(c)))
      }
    }
    import spark.implicits._
    cents.toSeq.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("c_id", "cv")
  }

  /** Learned-IVF build artifact: k-means centroids + the corpus vectors
   *  INLINE, partitioned by centroid ([[ivfBuildVectors]]'s layout) — the
   *  probe reads only its nProbe partitions and NEVER joins the embedding
   *  table again. (An assignment-only artifact forces every query through a
   *  corpus-wide id join to fetch the vectors back — the per-query corpus
   *  shuffle this layout exists to eliminate; vectors duplicated into the
   *  index is the standard IVF/HNSW trade.) Returns (centroids, vectors)
   *  read back. */
  def ivfBuildLearned(emb: DataFrame, id: String, vec: String, nCentroids: Int,
                      path: String, iters: Int = 5,
                      trainSampleMod: Int = 1): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    val cents = kmeansCentroids(emb, id, vec, nCentroids, iters, trainSampleMod)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val centsBack = spark.read.parquet(s"$path/centroids")
    (centsBack, ivfBuildVectors(emb, id, vec, centsBack, s"$path/vectors"))
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
    // repartition by c_id before the partitioned write (see [[ivfBuild]]):
    // one file per directory per holding shuffle partition instead of
    // tasks x centroids tiny files
    emb.join(assignTo(emb, id, vec, centroids), id)
      .repartition(col("c_id"))
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

  /** IVF search against an explicit (learned) centroid table and
   *  [[ivfBuildLearned]]'s vectors-inline artifact: probe the nProbe
   *  centroids nearest to the query, brute-force only their PARTITIONS
   *  (partition-pruned scan via [[ivfProbeScore]] — no corpus-wide id join
   *  to fetch vectors back; `emb` serves only the bounded query-vector
   *  lookup). With nProbe = nCentroids this is exact. */
  def ivfTopKLearned(emb: DataFrame, id: String, vec: String, queryId: Long,
                     centroids: DataFrame, vectors: DataFrame,
                     nProbe: Int, k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    ivfProbeScore(vectors, centroids, q, id, vec, nProbe)
      .select(col("doc_id").as(id), round(col("score"), 4).as("cos"),
        col("score").as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .drop("_c")
  }

  /** Filtered kNN with the reference's "efficient filtering" decision: a
   *  selective filter makes ANN probing counterproductive — probed
   *  partitions may hold almost none of the filtered docs, costing recall
   *  for no work saved — so when the filter matches at most
   *  `exactThreshold` docs the engine brute-forces EXACT cosine over the
   *  filtered subset (the k-NN filtered-search fallback: guaranteed k
   *  results and full recall on selective filters); above the threshold it
   *  probes the IVF partitions and intersects with the filter. The
   *  selectivity check is ONE count aggregate over the (pushed) filter —
   *  the same cardinality peek AQE performs before choosing a join
   *  strategy; the returned `strategy` column records the branch taken. */
  def filteredTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
                   nCentroids: Int, nProbe: Int, k: Int,
                   filterIds: DataFrame, exactThreshold: Long,
                   assigned: Option[DataFrame] = None): DataFrame = {
    require(exactThreshold >= 0, "exactThreshold must be >= 0")
    val nFilter = filterIds.count()
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    if (nFilter <= exactThreshold) {
      emb.join(filterIds.select(col(id)), Seq(id), "left_semi")
        .crossJoin(broadcast(q))
        .select(col(id), round(cosine(col(vec), col("qv")), 4).as("cos"),
          cosine(col(vec), col("qv")).as("_c"))
        .orderBy(col("_c").desc, col(id).asc).limit(k).drop("_c")
        .withColumn("strategy", lit("exact"))
    } else {
      val cents = emb.where(col(id) < nCentroids)
        .select(col(id).as("c_id"), col(vec).as("cv"))
      val probed = cents.crossJoin(broadcast(q))
        .orderBy(cosine(col("cv"), col("qv")).desc, col("c_id").asc)
        .limit(nProbe).select("c_id")
      val asg = assigned.getOrElse(ivfAssign(emb, id, vec, nCentroids))
      emb.join(filterIds.select(col(id)), Seq(id), "left_semi")
        .join(asg, id).join(broadcast(probed), "c_id")
        .crossJoin(broadcast(q))
        .select(col(id), round(cosine(col(vec), col("qv")), 4).as("cos"),
          cosine(col(vec), col("qv")).as("_c"))
        .orderBy(col("_c").desc, col(id).asc).limit(k).drop("_c")
        .withColumn("strategy", lit("ann"))
    }
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
   *  (e.g. a cluster/label column) to bound the pair explosion.
   *
   *  The block column is CALLER-SUPPLIED, so its cardinality is untrusted:
   *  one fat block (e.g. lang='en') makes the within-block self-join
   *  quadratic. `maxBlock` is the scale guard — blocks larger than it never
   *  reach the all-pairs join. With `dim > 0`, oversized blocks auto-route
   *  through in-block random-hyperplane LSH banding (candidates must share
   *  the block AND at least one band, survivors verify exact cosine —
   *  approximate per the standard 1-(1-s^rows)^bands recall curve, bounded
   *  band buckets by construction, the [[lshCosinePairs]] shape). With
   *  `dim <= 0` an oversized block FAILS LOUDLY (bounded limit-1 peek at
   *  plan construction) instead of silently going quadratic. */
  def cosinePairs(emb: DataFrame, id: String, vec: String, blockCol: String,
                  threshold: Double, maxBlock: Int = 10000,
                  nPlanes: Int = 32, nBands: Int = 4, dim: Int = -1): DataFrame = {
    require(maxBlock > 0, s"maxBlock must be > 0, got $maxBlock")
    // block sizes join back on the block key (no driver collect — any
    // number of blocks), splitting the corpus into the all-pairs-safe
    // small blocks and the LSH-routed oversized ones
    val sizes = emb.groupBy(col(blockCol).as("blk")).agg(count(lit(1)).as("_bn"))
    val tagged = emb
      .select(col(id).as("_id"), col(vec).as("_v"), col(blockCol).as("blk"))
      .join(sizes, "blk")
    val small = tagged.where(col("_bn") <= maxBlock)
    val a = small.select(col("_id").as("id_a"), col("_v").as("va"), col("blk"))
    val b = small.select(col("_id").as("id_b"), col("_v").as("vb"), col("blk"))
    val smallPairs = a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("c", cosine(col("va"), col("vb")))
      .where(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cos"))
    val big = tagged.where(col("_bn") > maxBlock)
    if (dim <= 0) {
      val offending = big.select(col("blk")).limit(1).collect()
      require(offending.isEmpty,
        s"cosinePairs: block '${offending.headOption.map(_.get(0)).orNull}' exceeds " +
          s"maxBlock=$maxBlock rows — the all-pairs join would be quadratic. " +
          "Pass dim>0 to auto-route oversized blocks through LSH banding, or " +
          "raise maxBlock deliberately.")
      smallPairs
    } else {
      require(nPlanes % nBands == 0, s"nBands $nBands must divide nPlanes $nPlanes")
      val bits = (0 until nPlanes).map { p =>
        val w = array(hyperplane(p, dim).map(x => lit(x.toDouble)): _*)
        when(dot(col("_v"), w) >= 0, "1").otherwise("0")
      }
      val sig = big.select(col("_id").as("id"), col("blk"), concat(bits: _*).as("sig"))
        .localCheckpoint(true)
      val rows = nPlanes / nBands
      val bands = sig.select(col("id"), col("blk"), posexplode(array(
        (0 until nBands).map(bi => substring(col("sig"), bi * rows + 1, rows)): _*))
        .as(Seq("band", "bh")))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.blk") === col("b.blk") && col("a.band") === col("b.band") &&
            col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val routed = cand
        .join(big.select(col("_id").as("id_a"), col("_v").as("va")), "id_a")
        .join(big.select(col("_id").as("id_b"), col("_v").as("vb")), "id_b")
        .withColumn("c", cosine(col("va"), col("vb")))
        .where(col("c") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cos"))
      smallPairs.unionByName(routed)
    }
  }

  // -------------------------------------------------------------------
  // Random-hyperplane LSH (sign-of-projection, Charikar 2002): the
  // LSH-bucketed scale path next to IVF. Signature bit p is the SIGN of
  // vec . r_p for a deterministic +-1 hyperplane r_p, so
  // P[bit differs] = angle/pi — near-cosine-duplicates agree on most
  // bits, and banding the signature turns near-duplicate search into
  // bounded equality-join buckets (no caller-supplied block column, no
  // trained centroids). Everything below is codegen'd column algebra:
  // the hyperplanes bake into the plan as literal arrays (metadata-sized,
  // deterministic from md5, shipped inside the serialized plan).
  // -------------------------------------------------------------------

  /** Deterministic +-1 hyperplane for plane `p`: weight d is the top bit of
   *  md5("p:d") — reproducible anywhere (incl. the SQL oracle, which inlines
   *  these as literals). */
  def hyperplane(p: Int, dim: Int): Array[Int] =
    Array.tabulate(dim) { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$d".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1 else -1
    }

  /** Sign-bit signature as an nPlanes-char '0'/'1' string (map-only; one
   *  dot product per plane, left-to-right fold for cross-engine parity). */
  def lshSignature(emb: DataFrame, id: String, vec: String,
                   nPlanes: Int, dim: Int): DataFrame = {
    val bits = (0 until nPlanes).map { p =>
      val w = array(hyperplane(p, dim).map(x => lit(x.toDouble)): _*)
      when(dot(col(vec), w) >= 0, "1").otherwise("0")
    }
    emb.select(col(id).as("id"), concat(bits: _*).as("sig"))
  }

  /** Bands of rows = nPlanes/nBands adjacent signature bits (id, band, bh). */
  private def lshBands(sig: DataFrame, nPlanes: Int, nBands: Int): DataFrame = {
    require(nPlanes % nBands == 0, s"nBands $nBands must divide nPlanes $nPlanes")
    val rows = nPlanes / nBands
    sig.select(col("id"), posexplode(array(
      (0 until nBands).map(b => substring(col("sig"), b * rows + 1, rows)): _*))
      .as(Seq("band", "bh")))
  }

  /**
   * LSH near-duplicate pairs: candidates agree on at least one band,
   * survivors verify cosine >= threshold. The band self-join is the
   * bounded-bucket shape (a band bucket of B vectors yields pairs only
   * within itself), and the expensive cosine runs on candidates only —
   * the derived-bucket replacement for [[cosinePairs]]'s caller-supplied
   * block column. Approximate by design: recall is the standard
   * 1-(1-s^rows)^bands LSH curve, tuned by (nPlanes, nBands).
   */
  def lshCosinePairs(emb: DataFrame, id: String, vec: String, nPlanes: Int,
                     nBands: Int, threshold: Double, dim: Int): DataFrame = {
    // the signature table feeds both sides of the band self-join: compute
    // the nPlanes dot products once, not once per branch
    val sig = lshSignature(emb, id, vec, nPlanes, dim).localCheckpoint(true)
    val bands = lshBands(sig, nPlanes, nBands)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair matching several bands verifies once
    cand
      .join(emb.select(col(id).as("id_a"), col(vec).as("va")), "id_a")
      .join(emb.select(col(id).as("id_b"), col(vec).as("vb")), "id_b")
      .withColumn("c", cosine(col("va"), col("vb")))
      .where(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cos"))
  }

  /**
   * LSH-bucketed approximate top-k: score only the vectors sharing at least
   * one band with the query (a semi join against the query's <= nBands band
   * values — broadcast-sized by construction), exact cosine top-k within the
   * candidate set. The query itself always collides with its own buckets, so
   * rank 1 is the query at cosine 1 — same convention as [[bruteTopK]].
   */
  def lshTopK(emb: DataFrame, id: String, vec: String, queryId: Long, k: Int,
              nPlanes: Int, nBands: Int, dim: Int): DataFrame = {
    val sig = lshSignature(emb, id, vec, nPlanes, dim).localCheckpoint(true)
    val bands = lshBands(sig, nPlanes, nBands)
    val qBands = bands.where(col("id") === queryId)
      .select(col("band"), col("bh"))
    val candIds = bands.join(broadcast(qBands), Seq("band", "bh"), "left_semi")
      .select(col("id")).distinct()
    val q = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.join(candIds, emb(id) === candIds("id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col(id), cosine(col(vec), col("qv")).as("_c"))
      .orderBy(col("_c").desc, col(id).asc)
      .limit(k)
      .select(col(id), round(col("_c"), 4).as("cos"))
  }

  /**
   * Recall@k of the APPROXIMATE ANN regimes against in-plan brute force,
   * over a deterministic multi-query panel (every `queryMod`-th vector) —
   * the evidence that the configurations a 100-TB deployment actually runs
   * (nProbe < C IVF probing, banded LSH) lose bounded, MEASURED recall
   * rather than assumed recall. Seeded centroids (ids < nCentroids, the
   * [[ivfTopK]] convention) keep every stage SQL-re-derivable.
   *
   * Output: one row per configuration — (method, param, recall) with
   * recall = Σ_q |approx_topk(q) ∩ brute_topk(q)| / (nQueries · k).
   * The Q×N scored table is computed ONCE (Q is metadata-sized, one corpus
   * scan) and shared by brute force and every approximate branch.
   *
   * Two LOSSY-SCORE regimes join the candidate-set regimes when enabled:
   * `pq` (param = m subspaces) ranks by the ADC approximate dot — the
   * compression loss itself, not a candidate-set loss — and `int8`
   * (param = 8 bits) ranks by the dequantized cosine. Both re-derive in
   * SQL exactly like their `ann_pq_topk` / `ann_int8_topk` siblings.
   */
  def recallCurve(emb: DataFrame, id: String, vec: String, queryMod: Long,
                  k: Int, nCentroids: Int, probes: Seq[Int],
                  nPlanes: Int, bandChoices: Seq[Int], dim: Int,
                  pqMs: Seq[Int] = Nil, pqCodes: Int = 16,
                  int8: Boolean = false): DataFrame = {
    require(queryMod > 0 && k > 0 && probes.nonEmpty)
    val queries = emb.where(col(id) % queryMod === 0)
      .select(col(id).as("qid"), col(vec).as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .select(col("qid"), col(id).as("vid"), cosine(col(vec), col("qv")).as("c"))
      .localCheckpoint(true)
    val ord = Seq(col("c").desc, col("vid").asc)
    val brute = TopN.perGroup(scored, Seq("qid"), "vid", k, ord)
      .select("qid", "vid").localCheckpoint(true)
    val nq = queries.count() // bounded: the query panel is metadata-sized
    def recallOf(cand: DataFrame, method: String, param: Int): DataFrame =
      TopN.perGroup(scored.join(cand, Seq("qid", "vid"), "left_semi"),
          Seq("qid"), "vid", k, ord)
        .join(brute, Seq("qid", "vid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(method).as("method"), lit(param).as("param"),
          round(col("hits").cast("double") / lit((nq * k).toDouble), 4).as("recall"))
    // IVF: rank the seeded centroids per query, probe the top-n lists
    val cents = emb.where(col(id) < nCentroids)
      .select(col(id).as("c_id"), col(vec).as("cv"))
    val asg = assignTo(emb, id, vec, cents)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cc").desc, col("c_id").asc)
    val ranked = queries.crossJoin(broadcast(cents)) // Q x C: metadata-sized
      .select(col("qid"), col("c_id"), cosine(col("qv"), col("cv")).as("cc"))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint(true)
    val ivf = probes.map { p =>
      val probed = ranked.where(col("rn") <= p).select("qid", "c_id")
      val cand = asg.join(broadcast(probed), "c_id")
        .select(col("qid"), col(id).as("vid"))
      recallOf(cand, "ivf", p)
    }
    // LSH: candidates share >= 1 band with the query at each banding choice
    val lsh = bandChoices.map { nb =>
      val sig = lshSignature(emb, id, vec, nPlanes, dim).localCheckpoint(true)
      val bands = lshBands(sig, nPlanes, nb)
      val qBands = bands.join(broadcast(queries.select(col("qid"))),
          bands("id") === col("qid"))
        .select(col("qid"), col("band"), col("bh"))
      val cand = bands.join(broadcast(qBands), Seq("band", "bh"))
        .select(col("qid"), col("id").as("vid")).distinct()
      recallOf(cand, "lsh", nb)
    }
    // lossy-score regimes: the approximate score itself does the ranking
    // (no candidate set — every vector is scanned in its compressed form)
    def recallOfScored(appr: DataFrame, method: String, param: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("a").desc, col("vid").asc)
      appr.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .join(brute, Seq("qid", "vid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(method).as("method"), lit(param).as("param"),
          round(col("hits").cast("double") / lit((nq * k).toDouble), 4).as("recall"))
    }
    val pq = pqMs.map { m =>
      val cb = pqSeededCodebook(emb, id, vec, m, pqCodes)
      val sub = cb(0)(0).length
      val codes = pqEncode(emb, id, vec, cb)
      // in-plan ADC over the query panel: per subspace j the codeword array
      // rides as a literal and codes[j] indexes it; approx dot is the sum of
      // per-subspace (query-slice · codeword) dots, j ascending — the same
      // left-to-right order the oracle's grouped sum re-derives
      val approx = (0 until m).map { j =>
        val cwArr = array(cb(j).map(cw => lit(cw)): _*)
        dot(slice(col("qv"), j * sub + 1, sub),
          element_at(cwArr, element_at(col("codes"), j + 1) + 1))
      }.reduceLeft(_ + _)
      recallOfScored(codes.crossJoin(broadcast(queries))
        .select(col("qid"), col(id).as("vid"), approx.as("a")), "pq", m)
    }
    val i8 = if (!int8) Nil else {
      val dv = transform(col("qvec"), q => q.cast("double") * col("scale"))
      Seq(recallOfScored(quantizeInt8(emb, id, vec).where(col("scale") > 0)
        .crossJoin(broadcast(queries))
        .select(col("qid"), col(id).as("vid"), cosine(dv, col("qv")).as("a")),
        "int8", 8))
    }
    (ivf ++ lsh ++ pq ++ i8).reduce(_ unionByName _)
  }
}
