package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stats.EventStats

/**
 * Semantic-field ingest: the composed pipeline the reference's `semantic`
 * mapper drives — chunk the raw text, run sparse encoding per chunk, store
 * the derived token-weight sub-field next to the raw field
 * (reference: mapper/SemanticFieldMapper.java:54,136-147 chunking config +
 * auto-generated embedding sub-field; processor/TextChunkingProcessor.java:50;
 * processor/SparseEncodingProcessor.java:98-136). ML inference is replaced by
 * the deterministic mock encoder (SURVEY.md §2.8: w = tf x (1 + len%5/4)) so
 * the pipeline stays oracle-checkable in a zero-egress engine.
 *
 * Entirely relational: chunker posexplode -> token explode -> one
 * (doc, chunk, token) hash aggregate; no UDFs in the hot path.
 */
object Semantic {

  /** Reference default prefixes for asymmetric (E5-style) embedding models
   *  (ml/AsymmetricTextEmbeddingConstants.java: DEFAULT_QUERY_PREFIX /
   *  DEFAULT_PASSAGE_PREFIX — trailing space dropped, the analyzer splits on
   *  whitespace anyway). */
  final val DefaultQueryPrefix = "query:"
  final val DefaultPassagePrefix = "passage:"

  /** A model config's asymmetry marker — the reference's
   *  ml/AsymmetricModelDetector.java: a model is asymmetric iff EITHER
   *  prefix is configured (isAsymmetricLocalModel: passagePrefix != null ||
   *  queryPrefix != null). Asymmetric models embed queries and passages
   *  differently; the ingest path must use the passage prefix and the query
   *  path the query prefix, or scores silently degrade. */
  case class AsymmetricConfig(queryPrefix: Option[String] = None,
                              passagePrefix: Option[String] = None) {
    def isAsymmetric: Boolean = queryPrefix.nonEmpty || passagePrefix.nonEmpty
  }

  /** @param prefix optional asymmetric-model content prefix prepended to
   *  every chunk BEFORE encoding (`embed(prefix + " " + chunk)`) — the
   *  per-inference-text prefixing the reference's MLInput builder applies
   *  AFTER chunking, so chunk boundaries are prefix-independent.
   *  @return (doc_id, chunk_idx, token, w) — the exploded token-weight
   *  sub-field rows for every chunk. */
  def ingestSparse(docs: DataFrame, idCol: String, textCol: String, tokenLimit: Int,
                   prefix: String = ""): DataFrame = {
    EventStats.increment("semantic_field_executions")
    EventStats.increment("semantic_field_chunking_executions")
    EventStats.increment("sparse_encoding_executions")
    val chunks = Chunkers.fixedTokenLength(docs, idCol, textCol, tokenLimit, 0.0)
    val chunkText =
      if (prefix.isEmpty) col("chunk")
      else concat_ws(" ", lit(prefix), col("chunk"))
    chunks
      .select(col(idCol), col("chunk_idx"),
        explode(TextOps.tokensCol(chunkText)).as("token"))
      .groupBy(col(idCol), col("chunk_idx"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w", col("tf") * (lit(1.0) + (length(col("token")) % 5) * lit(0.25)))
      .drop("tf")
  }

  /**
   * Dense-vector semantic sub-field: chunk -> deterministic hashing-trick
   * embedding — the knn_vector sub-field the reference's semantic mapper
   * auto-generates for dense models (reference:
   * mapper/SemanticFieldMapper.java:136-147); ML inference is replaced by a
   * feature-hashing projection (dim = hash(token) mod D, value += w), the
   * standard zero-model embedding that keeps the pipeline oracle-checkable.
   *
   * @return exploded sparse-dense rows (doc_id, chunk_idx, dim, v) — only
   *         occupied dimensions materialize, the shape that scales.
   */
  def ingestDense(docs: DataFrame, idCol: String, textCol: String, tokenLimit: Int,
                  dims: Int = 8, passagePrefix: String = ""): DataFrame = {
    EventStats.increment("text_embedding_executions")
    ingestSparse(docs, idCol, textCol, tokenLimit, passagePrefix)
      .withColumn("dim",
        (length(col("token")) * 31 + ascii(substring(col("token"), 1, 1))) % dims)
      .groupBy(col(idCol), col("chunk_idx"), col("dim"))
      .agg(sum(col("w")).as("v"))
  }

  /**
   * Nested kNN over the dense chunk vectors: cosine of every chunk against
   * the query chunk's vector, best chunk per doc (the reference's semantic
   * query returns documents via their best-matching chunk), global top-k.
   * Fully relational: the query vector is <= dims rows (broadcast), dots and
   * norms are hash aggregates, the per-doc best is a max-struct aggregate —
   * no per-doc window sort.
   */
  def denseKnnBestChunk(dense: DataFrame, idCol: String, queryDoc: Long, queryChunk: Int,
                        k: Int): DataFrame = {
    val q = dense
      .filter(col(idCol) === queryDoc && col("chunk_idx") === queryChunk)
      .select(col("dim"), col("v").as("qv"))
    val qNorm = sqrt(sum(col("qv") * col("qv")))
    val cosv = chunkCosines(dense, idCol, q)
      .crossJoin(broadcast(q.agg(qNorm.as("qn"))))
      .select(col(idCol), col("chunk_idx"), (col("dot") / (col("n") * col("qn"))).as("c"))
    cosv
      .groupBy(col(idCol))
      .agg(max(struct(col("c"), (-col("chunk_idx")).as("nc"))).as("m"))
      .select(col(idCol), (-col("m.nc")).as("chunk_idx"), col("m.c").as("c"))
      .orderBy(col("c").desc, col(idCol).asc)
      .limit(k)
  }

  /** One aggregation computing dot AND norm per chunk: left-join the
   *  broadcast query dims (missing dims contribute 0 to the dot, still
   *  count into the chunk norm), keep only chunks sharing >= 1 dim with the
   *  query — the exact matched set the former dots-join-norms pair
   *  produced, at half the aggregations and no chunk-cardinality join. */
  private def chunkCosines(dense: DataFrame, idCol: String,
                           q: DataFrame): DataFrame =
    dense.join(broadcast(q), Seq("dim"), "left")
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(sum(col("v") * coalesce(col("qv"), lit(0.0))).as("dot"),
        sqrt(sum(col("v") * col("v"))).as("n"),
        count(col("qv")).as("_nm"))
      .filter(col("_nm") > 0)
      .drop("_nm")

  /**
   * Per-chunk hit expansion — the reference's `expand_nested` kNN form
   * (query/NeuralKNNQueryBuilder.java:139,425-470): every matching CHUNK is
   * returned as its own hit instead of collapsing to the best chunk per
   * document. Same cosine math as [[denseKnnBestChunk]], global top-k over
   * chunks (a bounded TakeOrdered, never a per-doc window).
   */
  def denseKnnExpanded(dense: DataFrame, idCol: String, queryDoc: Long, queryChunk: Int,
                       k: Int): DataFrame = {
    val q = dense
      .filter(col(idCol) === queryDoc && col("chunk_idx") === queryChunk)
      .select(col("dim"), col("v").as("qv"))
    chunkCosines(dense, idCol, q)
      .crossJoin(broadcast(q.agg(sqrt(sum(col("qv") * col("qv"))).as("qn"))))
      .select(col(idCol), col("chunk_idx"), (col("dot") / (col("n") * col("qn"))).as("c"))
      .orderBy(col("c").desc, col(idCol).asc, col("chunk_idx").asc)
      .limit(k)
  }

  /**
   * Nested kNN with inner hits — the reference extracts `inner_hits`
   * contexts from every hybrid sub-query (query/HybridQueryBuilder.java:
   * 289-291,425-430, stat HYBRID_QUERY_INNER_HITS_REQUESTS) and OpenSearch
   * core resolves them for nested neural queries as: parent documents
   * ranked by their BEST child chunk (score_mode max — the same collapse
   * [[denseKnnBestChunk]] performs), each hit carrying its top `innerSize`
   * matching chunks sorted by child score.
   *
   * Scale shape: the chunk cosines are computed ONCE; the parent top-k is a
   * bounded TakeOrdered; the inner-hit expansion joins the k parent ids
   * (broadcast — k is query-sized) back to the cosines, so the per-group
   * collect is bounded at k groups x chunks-per-doc, never corpus-wide.
   *
   * @return (doc_id, score, inner_rank, chunk_idx, chunk_cos) — one row per
   *         inner hit, inner_rank 0-based within its parent.
   */
  def denseKnnInnerHits(dense: DataFrame, idCol: String, queryDoc: Long, queryChunk: Int,
                        k: Int, innerSize: Int): DataFrame = {
    EventStats.increment("hybrid_query_inner_hits_requests")
    val q = dense
      .filter(col(idCol) === queryDoc && col("chunk_idx") === queryChunk)
      .select(col("dim"), col("v").as("qv"))
    val cosv = chunkCosines(dense, idCol, q)
      .crossJoin(broadcast(q.agg(sqrt(sum(col("qv") * col("qv"))).as("qn"))))
      .select(col(idCol), col("chunk_idx"), (col("dot") / (col("n") * col("qn"))).as("c"))
    val top = cosv
      .groupBy(col(idCol))
      .agg(max(col("c")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    cosv.join(broadcast(top), Seq(idCol))
      .groupBy(col(idCol), col("score"))
      .agg(slice(sort_array(collect_list(struct((-col("c")).as("negc"),
        col("chunk_idx"), col("c").as("cos")))), 1, innerSize).as("hits"))
      .select(col(idCol), col("score"), posexplode(col("hits")))
      .select(col(idCol), col("score"), col("pos").as("inner_rank"),
        col("col.chunk_idx").as("chunk_idx"), col("col.cos").as("chunk_cos"))
  }

  /**
   * Nested score_mode family — OpenSearch's nested query aggregates child
   * (chunk) scores into the parent per `score_mode`: max (what the
   * reference's neural kNN wrap uses and [[denseKnnBestChunk]] implements),
   * avg (the nested default), sum, min. All four computed side by side from
   * ONE chunk-cosine pass — a single aggregation over the same cosines the
   * best-chunk path scores, ranked by avg (the default mode), bounded
   * TakeOrdered top-k.
   */
  def denseKnnScoreModes(dense: DataFrame, idCol: String, queryDoc: Long,
                         queryChunk: Int, k: Int): DataFrame = {
    val q = dense
      .filter(col(idCol) === queryDoc && col("chunk_idx") === queryChunk)
      .select(col("dim"), col("v").as("qv"))
    val cosv = chunkCosines(dense, idCol, q)
      .crossJoin(broadcast(q.agg(sqrt(sum(col("qv") * col("qv"))).as("qn"))))
      .select(col(idCol), col("chunk_idx"), (col("dot") / (col("n") * col("qn"))).as("c"))
    cosv.groupBy(col(idCol))
      .agg(avg(col("c")).as("s_avg"), max(col("c")).as("s_max"),
        sum(col("c")).as("s_sum"), min(col("c")).as("s_min"),
        count(lit(1)).as("n_chunks"))
      .orderBy(col("s_avg").desc, col(idCol).asc)
      .limit(k)
  }

  /** Best-chunk SPARSE score of an encoded token-weight query against the
   *  chunked sparse sub-field (doc_id, chunk_idx, token, w): dot product per
   *  chunk, max over chunks per doc — the nested scoring a routed
   *  `neural`/`neural_sparse` query runs against a sparse-model semantic
   *  field (reference: NeuralQueryBuilder semantic rewrite +
   *  SemanticFieldProcessor). Returns (doc_id, score), unbounded rows. */
  def sparseBestChunkScore(chunks: DataFrame, idCol: String,
                           query: Map[String, Double]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val q = query.toSeq.toDF("token", "qw")
    chunks.join(broadcast(q), "token")
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(sum(col("w") * col("qw")).as("cs"))
      .groupBy(col(idCol))
      .agg(max(col("cs")).as("score"))
      .select(col(idCol).as("doc_id"), col("score"))
  }

  /** Best-chunk DENSE cosine of a hashed query vector against the chunked
   *  dense sub-field (doc_id, chunk_idx, dim, v): cosine per chunk, max over
   *  chunks per doc — the nested best-chunk scoring of a routed `neural`
   *  query on a dense-model semantic field. The query norm is a driver-side
   *  constant (the query vector has <= dims entries). */
  def denseBestChunkScore(chunks: DataFrame, idCol: String,
                          queryVec: Map[Int, Double]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val q = queryVec.toSeq.toDF("dim", "qv")
    val qn = math.sqrt(queryVec.values.map(v => v * v).sum)
    chunkCosines(chunks, idCol, q)
      .select(col(idCol), (col("dot") / (col("n") * lit(qn))).as("cs"))
      .groupBy(col(idCol))
      .agg(max(col("cs")).as("score"))
      .select(col(idCol).as("doc_id"), col("score"))
  }

  /** Assemble each chunk's hashed dense vector from the exploded
   *  (id, chunk_idx, dim, v) sub-field rows into one dims-length array —
   *  the stored chunk embedding a kNN structure holds. Absent dims are 0
   *  (the hashed weights are non-negative, so a chunk's dot with a query is
   *  > 0 iff they share a dim — the same matched set the exploded join
   *  produces). */
  def denseChunkVectors(dense: DataFrame, idCol: String, dims: Int): DataFrame =
    dense.groupBy(col(idCol), col("chunk_idx"))
      .agg(map_from_arrays(collect_list(col("dim")), collect_list(col("v"))).as("m"))
      .select(col(idCol), col("chunk_idx"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => coalesce(element_at(col("m"), d), lit(0.0))).as("cvec"))

  /** Build the IVF artifact a PROBE-ROUTED semantic dense query scans: the
   *  chunk vectors assigned map-side to `nCentroids` deterministic centroids
   *  (the first centroid-count chunk vectors by (id, chunk_idx) — fixed
   *  seeds, like `ann_ivf_topk`'s id<16 rule) and written partitioned by
   *  `c_id`, so a query touches only its probed partitions at the storage
   *  layer instead of brute-scanning every chunk (the reference's semantic
   *  query ultimately runs Lucene kNN over the generated embedding
   *  sub-field — this is that index structure, Spark-first).
   *  Returns (centroids, vectors-read-back). */
  def denseChunkIvf(dense: DataFrame, idCol: String, dims: Int,
                    nCentroids: Int, path: String): (DataFrame, DataFrame) = {
    val spark = dense.sparkSession
    val vecs = denseChunkVectors(dense, idCol, dims)
    // bounded head: nCentroids rows through the driver, same scale as every
    // probe's centroid collect
    val cents = vecs.orderBy(col(idCol), col("chunk_idx")).limit(nCentroids)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](2)) }.toSeq
    import spark.implicits._
    val centDf = cents.toDF("c_id", "cv")
    val keyed = vecs.withColumn("_ck", concat_ws("#", col(idCol), col("chunk_idx")))
    val assigned = Ann.assignTo(keyed, "_ck", "cvec", centDf)
    keyed.join(assigned, "_ck").drop("_ck")
      .repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(path)
    (centDf, spark.read.parquet(path))
  }

  /** Probe-routed best-chunk scoring against [[denseChunkIvf]]'s artifact:
   *  the nProbe query-closest centroid ids become a STATIC `c_id IN (...)`
   *  PartitionFilter on the artifact scan (only those directories are
   *  read), cosine per surviving chunk, max per doc. Exact when
   *  nProbe = centroid count — same contract as the `DenseIvf` clause.
   *  Zero-dot chunks are dropped to keep the exploded path's matched set
   *  (weights are non-negative: dot > 0 iff a dim is shared). */
  def denseBestChunkScoreIvf(vectors: DataFrame, centroids: DataFrame,
                             queryVec: Map[Int, Double], dims: Int,
                             nProbe: Int, idCol: String): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qArr = (0 until dims).map(d => queryVec.getOrElse(d, 0.0))
    val qv = Seq(Tuple1(qArr)).toDF("qv")
    Ann.ivfProbeScore(vectors.withColumnRenamed(idCol, "_sid"), centroids,
        qv, "_sid", "cvec", nProbe)
      .where(col("score") > 0.0)
      .groupBy(col("doc_id"))
      .agg(max(col("score")).as("score"))
  }

  /** Query-side analogue of [[ingestDense]]'s feature-hashing projection:
   *  the mock-encoded token weights of the analyzed query text folded into
   *  the same `(len*31 + ascii(first)) % dims` buckets — what "running the
   *  search model" produces for a dense semantic field under zero egress. */
  def hashQueryVector(terms: Seq[String], dims: Int,
                      queryPrefix: String = ""): Map[Int, Double] =
    graft.ops.Sparse.encodeQueryTokens(
        if (queryPrefix.isEmpty) terms else queryPrefix +: terms).toSeq
      .groupBy { case (t, _) => (t.length * 31 + t.head.toInt) % dims }
      .map { case (d, tws) => d -> tws.map(_._2).sum }

  /**
   * Inference-skip incremental ingest — the reference's InferenceFilter
   * optimization (processor/optimization/TextEmbeddingInferenceFilter.java:
   * if the text is identical between the existing and new document, the
   * existing embedding is copied and inference is skipped). At 100 TB the
   * encoder is the expensive stage, so re-running it over the unchanged bulk
   * of a refreshed corpus is the scale killer this avoids: only changed or
   * new rows reach `encode`.
   *
   * Texts compare by sha256 (the north-rule per-row invariant) through a
   * plain id join — no broadcast, because the unchanged side is usually MOST
   * of the corpus; semi/anti joins leave the strategy to AQE.
   *
   * @param encode the (expensive) encoder: docs slice -> encoded rows keyed
   *               by idCol; runs ONLY over changed + new docs.
   * @return prevEncoded rows for unchanged docs (reused = true) unioned with
   *         freshly encoded rows (reused = false).
   */
  def incremental(newDocs: DataFrame, prevDocs: DataFrame, prevEncoded: DataFrame,
                  idCol: String, textCol: String)(encode: DataFrame => DataFrame): DataFrame = {
    EventStats.increment("skip_existing_executions")
    val newH = newDocs.select(col(idCol), sha2(col(textCol), 256).as("_sha_new"))
    val prevH = prevDocs.select(col(idCol), sha2(col(textCol), 256).as("_sha_prev"))
    val unchangedIds = newH.join(prevH, Seq(idCol))
      .where(col("_sha_new") === col("_sha_prev"))
      .select(col(idCol))
    val reused = prevEncoded.join(unchangedIds, Seq(idCol), "left_semi")
      .withColumn("reused", lit(true))
    val encoded = encode(newDocs.join(unchangedIds, Seq(idCol), "left_anti"))
      .withColumn("reused", lit(false))
    reused.unionByName(encoded)
  }
}
