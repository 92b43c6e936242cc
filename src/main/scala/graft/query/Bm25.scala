package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.index.{DocLenBlock, Index, InvertedIndex, PostingBlock, PostingCodec}

/**
 * Exact BM25 (k1=1.2, b=0.75 — the Lucene BM25Similarity defaults the
 * reference relies on for its `match` sub-queries; reference:
 * query/HybridQueryBuilder.java:368-377 delegates scoring to Lucene) over the
 * block-per-row compressed postings.
 *
 * Formula (Lucene 8+ / OpenSearch 3.x): idf * tf / (tf + k1*(1 - b + b*dl/avgdl))
 * with idf = ln(1 + (N - df + 0.5)/(df + 0.5)). We score with exact doc
 * lengths rather than Lucene's lossy SmallFloat-encoded norms (SURVEY.md
 * §7.4) so the engine is self-consistent and oracle-checkable.
 *
 * Execution model: matched posting blocks are co-grouped with the forward
 * doc-length blocks on `bucket` (the 4096-doc span), scored into a dense
 * per-bucket float window — the exact analogue of the reference's 4096-doc
 * bulk-scoring window (reference: query/HybridBulkScorer.java:75-100) — then
 * reduced per bucket to a bounded top-k heap (reference:
 * search/collector/HybridTopScoreDocCollector.java:135-190 HitQueue) before
 * the global TakeOrderedAndProject. Blocks whose summed block-max upper
 * bounds cannot beat the running per-partition threshold are skipped without
 * decoding (block-max WAND, reference: query/HybridQueryScorer.java:155-176).
 */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  def idf(df: Long, docCount: Long): Double =
    math.log(1.0 + (docCount - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Int, dl: Int, avgdl: Double): Double =
    tf / (tf + K1 * (1 - B + B * dl / avgdl))

  /**
   * Score a bag of query terms (OR semantics, per-term scores summed — the
   * Lucene BooleanQuery-of-TermQuery shape a `match` query compiles to).
   *
   * @param boosts  per-term multiplicative boost (default 1.0)
   * @param limitPerBucket if >0, keep only the top `limitPerBucket` candidates
   *        per 4096-doc bucket (safe when >= final k and no post-filter runs)
   * @return DataFrame(doc_id: Long, score: Double) — all matching docs,
   *         unsorted; callers apply filter/top-k.
   */
  /** Per-term BM25 weight map for a query (idf x boost), from the broadcast-
   *  sized term-stats lookup — the Lucene TermStatistics analogue. */
  private def termWeights(idx: Index, terms: Seq[String], boosts: Map[String, Double]): Map[String, Double] = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val uniq = terms.distinct
    val statsMap: Map[String, Long] = idx.termStats
      .filter($"term".isin(uniq: _*))
      .collect()
      .map(t => t.term -> t.df)
      .toMap
    val n = idx.stats.doc_count
    uniq.flatMap { t =>
      statsMap.get(t).map(df => t -> idf(df, n) * boosts.getOrElse(t, 1.0))
    }.toMap
  }

  def scoreTerms(
      idx: Index,
      terms: Seq[String],
      boosts: Map[String, Double] = Map.empty,
      limitPerBucket: Int = 0,
      buckets: Option[DataFrame] = None,
      bucketList: Option[Array[Long]] = None
  ): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._

    val avgdl = idx.stats.avgdl
    val weightPerTerm = termWeights(idx, terms, boosts)
    if (weightPerTerm.isEmpty) return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")

    val matchedAll = idx.postings.filter($"term".isin(weightPerTerm.keys.toSeq: _*))
    // driver-known bucket lists (the WAND passes) become isin predicates
    // pushed straight into both parquet scans — no extra broadcast exchange
    val matched = (bucketList, buckets) match {
      case (Some(bl), _) => matchedAll.filter($"bucket".isin(bl.toSeq: _*))
      case (_, Some(b))  => matchedAll.join(b.hint("broadcast"), "bucket").as[PostingBlock]
      case _             => matchedAll
    }
    // Ship only the doc-length blocks of buckets that can match: the semi
    // join keeps the per-query shuffle proportional to the posting volume of
    // the query terms, not to corpus size. The derivation re-reads only the
    // column-pruned (term, bucket) metadata of the postings scan, so the
    // payload bytes are not scanned twice.
    val docLens = (bucketList, buckets) match {
      case (Some(bl), _) => idx.docLens.filter($"bucket".isin(bl.toSeq: _*))
      case (_, Some(b))  => idx.docLens.join(b.hint("broadcast"), "bucket").as[DocLenBlock]
      case _ => idx.docLens
        .join(matched.select($"bucket").distinct().hint("broadcast"), "bucket")
        .as[DocLenBlock]
    }
    val lim = limitPerBucket
    val span = InvertedIndex.BucketSpan

    val scored: Dataset[(Long, Double)] = matched
      .groupByKey(_.bucket)
      .cogroup(docLens.groupByKey(_.bucket)) { (bucket, blocksIt, dlIt) =>
        // deterministic accumulation order: shuffle arrival order varies run
        // to run, and a different FP summation order shifts near-tied scores
        // by an ulp — enough to flip a rank at a page boundary
        val blocks = blocksIt.toArray.sortBy(b => (b.term, b.bucket))
        if (blocks.isEmpty) Iterator.empty
        else {
          // dense doc-length window for this 4096-doc span
          val dlArr = new Array[Int](span)
          dlIt.foreach { dlb =>
            val ids = PostingCodec.decodeDeltas(dlb.ids, dlb.cnt)
            val dls = PostingCodec.decodeInts(dlb.dls, dlb.cnt)
            var i = 0
            while (i < dlb.cnt) { dlArr(ids(i)) = dls(i); i += 1 }
          }
          val scores = new Array[Double](span)
          val seen = new Array[Boolean](span)
          var i = 0
          while (i < blocks.length) {
            val b = blocks(i)
            val w = weightPerTerm(b.term)
            val ids = PostingCodec.decodeDeltas(b.docs, b.cnt)
            val tfs = PostingCodec.decodeInts(b.tfs, b.cnt)
            var j = 0
            while (j < b.cnt) {
              val local = ids(j)
              scores(local) += w * tfNorm(tfs(j), dlArr(local), avgdl)
              seen(local) = true
              j += 1
            }
            i += 1
          }
          val base = bucket << InvertedIndex.BucketBits
          if (lim <= 0) {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
            var d = 0
            while (d < span) {
              if (seen(d)) out += ((base + d, scores(d)))
              d += 1
            }
            out.iterator
          } else {
            // bounded min-heap: keep best `lim` by (score desc, doc_id asc)
            val ord = Ordering.by[(Long, Double), (Double, Long)] { case (id, s) => (s, -id) }
            val pq = new scala.collection.mutable.PriorityQueue[(Long, Double)]()(ord.reverse)
            var d = 0
            while (d < span) {
              if (seen(d)) {
                val cand = (base + d, scores(d))
                if (pq.size < lim) pq.enqueue(cand)
                else if (ord.gt(cand, pq.head)) { pq.dequeue(); pq.enqueue(cand) }
              }
              d += 1
            }
            pq.iterator
          }
        }
      }

    scored.toDF("doc_id", "score")
  }

  /** Top-k by (score desc, doc_id asc) — Spark plans this as
   *  TakeOrderedAndProject, the distributed HitQueue merge. */
  def topK(idx: Index, terms: Seq[String], k: Int, boosts: Map[String, Double] = Map.empty): DataFrame = {
    scoreTerms(idx, terms, boosts, limitPerBucket = k)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /**
   * Block-max-WAND top-k: exact results, but most posting blocks are never
   * decoded. The reference's collector feeds its heap threshold back into the
   * scorers so blocks whose max impact cannot beat it are skipped
   * (reference: search/collector/HybridTopScoreDocCollector.java:160-171,
   * query/HybridQueryScorer.java:155-176 advanceShallow/getMaxScore). Spark
   * partitions cannot share a live threshold, so we run the two-pass scheme
   * from SURVEY.md §7.4:
   *
   *  1. bucket upper bounds from block METADATA only (sum over terms of
   *     idf x max_tf/(max_tf + k1(1-b)), the dl->0 bound) — one tiny agg over
   *     matched block rows, no payload decode;
   *  2. pass 1 scores the k most-promising buckets exactly -> threshold
   *     theta = k-th best real score;
   *  3. pass 2 scores only remaining buckets whose upper bound >= theta
   *     (>= keeps doc-id tie-breaks exact); everything below theta is
   *     provably non-competitive and its payload bytes are never read.
   *
   * For rare/mid terms pass 2 is empty or near-empty; for head terms it
   * degenerates to a full scan, same as the reference's WAND on a
   * constant-impact corpus.
   */
  /**
   * Cost-based scorer choice from one tiny aggregate over the (persisted)
   * term-stats table: WAND's two extra scheduling rounds only pay off when
   * the candidate posting volume is large enough that skipping block decodes
   * wins. Mirrors Lucene's cost-aware scorer selection
   * (reference: query/HybridQueryScorer.java:222-299 orders two-phase
   * iterators by matchCost).
   */
  def topKAuto(idx: Index, terms: Seq[String], k: Int, boosts: Map[String, Double] = Map.empty,
               wandThreshold: Long = 1000000L): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val row = idx.termStats
      .filter($"term".isin(terms.distinct: _*))
      .agg(org.apache.spark.sql.functions.sum($"df")).head()
    val volume = if (row.isNullAt(0)) 0L else row.getLong(0)
    if (volume >= wandThreshold) topKWand(idx, terms, k, boosts)
    else topK(idx, terms, k, boosts)
  }

  /** Bucket-frontier collect cap: 2^17 buckets = ~5*10^8 candidate docs of
   *  metadata (16 bytes/bucket, ~2 MB on the driver). A query matching more
   *  buckets than that is in the head-term regime where WAND degenerates to
   *  a full scan anyway, so it routes to the plain scorer. */
  private val MaxWandBuckets = 1 << 17

  def topKWand(idx: Index, terms: Seq[String], k: Int, boosts: Map[String, Double] = Map.empty): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._

    val weightPerTerm = termWeights(idx, terms, boosts)
    if (weightPerTerm.isEmpty)
      return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")

    // Bucket upper bounds from METADATA only — no payload decode. The bound
    // uses the bucket's shortest doc (min_dl), not dl -> 0: for any doc in
    // the bucket, tf <= max_tf and dl >= min_dl, and tfNorm is increasing in
    // tf / decreasing in dl, so w * tfNorm(max_tf, min_dl) dominates every
    // real contribution of the block.
    val avgdl = idx.stats.avgdl
    val wMap = typedLit(weightPerTerm)
    val matchedMeta = idx.postings
      .filter($"term".isin(weightPerTerm.keys.toSeq: _*))
      .select($"bucket", $"term", $"max_tf")
    val dlMeta = idx.docLens.select($"bucket", $"min_dl")
    val ub = matchedMeta.join(dlMeta, "bucket")
      .select($"bucket",
        (element_at(wMap, $"term") * ($"max_tf".cast("double") /
          ($"max_tf" + lit(K1) * (lit(1 - B) + lit(B) * $"min_dl" / lit(avgdl))))).as("u"))
      .groupBy($"bucket").agg(sum($"u").as("ub"))

    // one metadata collect gives the whole bucket frontier; every later
    // decision (pass-1 set, theta survivors) is driver-side arithmetic
    val ubArr: Array[(Long, Double)] = ub.orderBy($"ub".desc, $"bucket".asc)
      .limit(MaxWandBuckets + 1).as[(Long, Double)].collect()
    if (ubArr.length > MaxWandBuckets) return topK(idx, terms, k, boosts)

    // pass 1: the k best buckets by upper bound establish theta exactly
    val topBuckets = ubArr.take(k).map(_._1)
    val pass1: Array[(Long, Double)] =
      scoreTerms(idx, terms, boosts, limitPerBucket = k, bucketList = Some(topBuckets))
        .orderBy($"score".desc, $"doc_id".asc).limit(k)
        .as[(Long, Double)].collect()
    val theta = if (pass1.length < k) Double.NegativeInfinity else pass1.last._2
    val pass1Df = pass1.toSeq.toDF("doc_id", "score")

    // pass 2: only buckets whose bound can still beat theta
    // (>= because a theta-tied doc with a smaller doc_id still wins);
    // survivor selection costs no Spark job — the frontier is on the driver
    val survivors = ubArr.drop(k).filter(_._2 >= theta).map(_._1)
    if (survivors.isEmpty)
      return pass1Df.orderBy($"score".desc, $"doc_id".asc).limit(k)
    val pass2 =
      if (survivors.length <= 4096)
        scoreTerms(idx, terms, boosts, limitPerBucket = k, bucketList = Some(survivors))
      else // too many for an isin predicate: broadcast-join the bucket list
        scoreTerms(idx, terms, boosts, limitPerBucket = k,
          buckets = Some(survivors.toSeq.toDF("bucket")))

    pass1Df.union(pass2)
      .orderBy($"score".desc, $"doc_id".asc).limit(k)
  }
}
