package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One clustered posting row: the docs of `term`'s (pruned) posting list that
 *  landed in cluster `cluster_id`, plus the cluster's summary vector
 *  (token-wise max over member vectors, mass-pruned). Mirrors the reference's
 *  DocumentCluster (reference: sparse/data/DocumentCluster.java:140-171,
 *  PostingsProcessingUtils.java:70-108). */
case class ClusteredPosting(
    term: String,
    cluster_id: Int,
    doc_ids: Array[Long],
    sum_tokens: Array[String],
    sum_ws: Array[Double]
)

/**
 * SEISMIC-style clustered sparse index + cluster-skipping ANN, re-expressed
 * as Dataset operators (reference: sparse/ package — the one place the
 * plugin builds its own index):
 *
 *  - posting prune to n_postings by weight
 *    (reference: ClusteredPostingTermsWriter.java:136-143);
 *  - per-term clustering: seeded random centers + dot-product assignment,
 *    cluster count = ceil(cluster_ratio x postings), lists under
 *    min_cluster_size stay unclustered
 *    (reference: algorithm/RandomClusteringAlgorithm.java:42-91,
 *    SeismicPostingClusterer.java:23,55-68);
 *  - summary vector = token-wise max, pruned to the smallest prefix holding
 *    summary_prune_ratio of total mass (reference:
 *    PostingsProcessingUtils.java:70-108);
 *  - query: top query_cut tokens -> candidate clusters -> skip clusters whose
 *    summary upper bound cannot beat the running threshold / heap_factor ->
 *    exact dot-product rescore of survivors
 *    (reference: query/SeismicBaseScorer.java:74-122,202-220).
 *
 * Scale shape: clustering happens per term AFTER the n_postings prune, so a
 * group is <= n_postings rows no matter the corpus; query-time pruning is the
 * same two-pass threshold scheme as block-max WAND (pass 1 establishes theta
 * from the most promising clusters, pass 2 touches only clusters whose
 * summary bound survives), so pruned clusters' doc vectors are never read.
 * With summaryPruneRatio = 1.0 and heapFactor = 1.0 the bound is exact and
 * results are rank-identical to brute-force linear scoring (oracle-checked);
 * the reference's defaults (0.4 / 1.0) give the approximate mode.
 */
object Seismic {

  val MinClusterSize = 10 // reference: SeismicPostingClusterer.java:23

  /** Forward sparse vectors (token-sorted) from exploded (doc_id, token, w). */
  def forward(tw: DataFrame): DataFrame = {
    tw.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("token"), col("w")))).as("vec"))
      .select(col("doc_id"),
        col("vec.token").as("tokens"), col("vec.w").as("ws"))
  }

  /** Sorted-merge dot product of two token-sorted sparse vectors. */
  def dot(aTok: Seq[String], aW: Seq[Double], bTok: Seq[String], bW: Seq[Double]): Double = {
    var i = 0
    var j = 0
    var s = 0.0
    while (i < aTok.length && j < bTok.length) {
      val c = aTok(i).compareTo(bTok(j))
      if (c == 0) { s += aW(i) * bW(j); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  private def dotMap(tok: Seq[String], w: Seq[Double], q: Map[String, Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < tok.length) {
      val qw = q.getOrElse(tok(i), 0.0)
      if (qw != 0.0) s += w(i) * qw
      i += 1
    }
    s
  }

  /**
   * Build the clustered index from exploded token weights.
   * One window prune (bounded groups), one doc_id join to attach vectors,
   * one per-term groupBy whose groups are <= nPostings rows.
   */
  def buildClusteredIndex(
      tw: DataFrame,
      nPostings: Int = 160,
      clusterRatio: Double = 0.1,
      summaryPruneRatio: Double = 0.4,
      seed: Long = 42L
  ): Dataset[ClusteredPosting] = {
    val spark = tw.sparkSession
    import spark.implicits._

    // n_postings prune per term by weight (desc), deterministic tie-break.
    // Two-level salted rank: a head token's full posting list would otherwise
    // land on ONE task (the hot partition the bucketed inverted-index build
    // avoids by design); stage 1 ranks within (token, salt), stage 2 ranks
    // the <= 64 x nPostings survivors per token.
    val pruned = TopN.perGroup(tw, Seq("token"), "doc_id", nPostings,
      Seq(col("w").desc, col("doc_id").asc))

    val fwd = forward(tw)
    val member = pruned.select(col("token").as("term"), col("doc_id"))
      .join(fwd, "doc_id")

    val ratio = clusterRatio
    val spr = summaryPruneRatio
    val sd = seed
    member.select(col("term"), col("doc_id"), col("tokens"), col("ws"))
      .as[(String, Long, Seq[String], Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (term, it) =>
        val docs = it.toArray.sortBy(_._2)
        val n = docs.length
        val nClusters =
          if (n < MinClusterSize) 1 else math.max(1, math.ceil(ratio * n).toInt)
        val rnd = new scala.util.Random(sd ^ term.hashCode.toLong)
        val centerIdx = rnd.shuffle(docs.indices.toList).take(nClusters).toArray
        val assign = new Array[Int](n)
        var i = 0
        while (i < n) {
          var best = 0
          var bestDot = Double.NegativeInfinity
          var c = 0
          while (c < centerIdx.length) {
            val ctr = docs(centerIdx(c))
            val d = dot(docs(i)._3, docs(i)._4, ctr._3, ctr._4)
            if (d > bestDot) { bestDot = d; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
        (0 until nClusters).iterator.flatMap { c =>
          val members = docs.indices.filter(assign(_) == c)
          if (members.isEmpty) Iterator.empty
          else {
            // token-wise max summary
            val acc = scala.collection.mutable.HashMap.empty[String, Double]
            members.foreach { m =>
              val (_, _, toks, ws) = docs(m)
              var t = 0
              while (t < toks.length) {
                val cur = acc.getOrElse(toks(t), 0.0)
                if (ws(t) > cur) acc(toks(t)) = ws(t)
                t += 1
              }
            }
            // mass prune: smallest prefix (by weight desc) reaching spr * total
            val entries = acc.toArray.sortBy { case (t, w) => (-w, t) }
            val total = entries.map(_._2).sum
            val target = spr * total
            val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
            var cum = 0.0
            var e = 0
            while (e < entries.length && cum < target) {
              kept += entries(e)
              cum += entries(e)._2
              e += 1
            }
            val keptSorted = kept.sortBy(_._1).toArray
            Iterator.single(ClusteredPosting(term, c,
              members.map(docs(_)._2).toArray,
              keptSorted.map(_._1), keptSorted.map(_._2)))
          }
        }
      }
  }

  /**
   * Cluster-skipping ANN top-k. Two-pass threshold pruning:
   * pass 1 exactly scores the k highest-upper-bound clusters -> theta;
   * pass 2 scores only remaining clusters with ub >= theta / heapFactor.
   * heapFactor > 1 relaxes the skip (more recall work), < 1 prunes
   * aggressively (reference semantics: heap_factor scales the threshold,
   * SeismicBaseScorer.java:202-220).
   */
  def annTopK(
      index: Dataset[ClusteredPosting],
      fwd: DataFrame,
      query: Map[String, Double],
      k: Int,
      queryCut: Int = 10,
      heapFactor: Double = 1.0,
      filterDocs: Option[DataFrame] = None
  ): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._

    val q = query.toSeq.sortBy { case (t, w) => (-w, t) }.take(queryCut).toMap
    val qB = spark.sparkContext.broadcast(q)

    val cand = index.filter(col("term").isin(q.keys.toSeq: _*))
    // upper bound per cluster: dot(summary, query) — summaries are token-wise
    // maxima, so this dominates every member's true score when unpruned
    val ubs = cand.map { cp =>
      (cp.term, cp.cluster_id, dotMap(cp.sum_tokens, cp.sum_ws, qB.value), cp.doc_ids)
    }.toDF("term", "cluster_id", "ub", "doc_ids")

    // non-scoring filter intersected with candidates before rescoring
    // (reference: sparse/query/OrderedPostingWithClustersScorer.java:46-52).
    // No broadcast hint: the filter can be an unbounded share of the corpus
    // (e.g. lang = 'en'), so the semi-join strategy is AQE's call.
    def score(docIds: DataFrame): DataFrame = {
      val filtered = filterDocs match {
        case Some(f) => docIds.join(f.select("doc_id"), Seq("doc_id"), "left_semi")
        case None    => docIds
      }
      filtered.distinct()
        .join(fwd, "doc_id")
        .select(col("doc_id"), col("tokens"), col("ws"))
        .as[(Long, Seq[String], Seq[Double])]
        .map { case (id, toks, ws) => (id, dotMap(toks, ws, qB.value)) }
        .toDF("doc_id", "score")
    }

    // pass 1: k most promising clusters establish the threshold
    val top = ubs.orderBy(col("ub").desc, col("term").asc, col("cluster_id").asc).limit(k)
    val pass1 = score(top.select(explode(col("doc_ids")).as("doc_id")))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .as[(Long, Double)].collect()
    val theta = if (pass1.length < k) Double.NegativeInfinity else pass1.last._2

    // pass 2: surviving clusters only (summary bound beats theta/heapFactor)
    val p1Docs = pass1.map(_._1).toSet
    val survivors = ubs
      .filter(col("ub") >= lit(theta / heapFactor))
      .select(explode(col("doc_ids")).as("doc_id"))
      .filter(!col("doc_id").isin(p1Docs.toSeq: _*))
    val pass2 = score(survivors)

    pass1.toSeq.toDF("doc_id", "score").union(pass2)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }
}
