package graft

import org.apache.spark.sql.functions._
import graft.index.IndexCache
import graft.ops.{Seismic, Sparse}

/** SEISMIC clustered-ANN semantics: exactness of the unpruned bound,
 *  cluster partitioning invariants, summary dominance, approximate recall. */
class SeismicSpec extends SparkSpec {

  private lazy val tw = Sparse.encode(IndexCache.documents(spark, "/root/testdata/sf0.001")).cache()
  private lazy val fwd = Seismic.forward(tw).cache()

  private def exact(q: Map[String, Double], k: Int): Seq[(Long, Double)] =
    Sparse.linearTopK(tw, q, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("exact mode (unpruned summary, heap_factor 1) == brute-force dot top-k") {
    val cidx = Seismic.buildClusteredIndex(tw, nPostings = Int.MaxValue, summaryPruneRatio = 1.0).cache()
    for (q <- Seq(
      Map("join" -> 3.0, "hash" -> 1.0, "scan" -> 0.5),
      Map("window" -> 2.0, "sort" -> 1.0),
      Map("dup" -> 1.0))) {
      val got = Seismic.annTopK(cidx, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exact(q, 10), s"q=$q")
    }
  }

  test("clusters partition the pruned posting list") {
    val cidx = Seismic.buildClusteredIndex(tw, nPostings = 20).cache()
    val perTerm = cidx.collect().groupBy(_.term)
    val dfs = tw.groupBy(col("token")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perTerm.foreach { case (term, rows) =>
      val all = rows.flatMap(_.doc_ids)
      assert(all.length == all.distinct.length, s"$term: doc in 2 clusters")
      assert(all.length == math.min(dfs(term), 20), s"$term: pruned size")
    }
  }

  test("unpruned summary dominates every member vector tokenwise") {
    val cidx = Seismic.buildClusteredIndex(tw, nPostings = Int.MaxValue, summaryPruneRatio = 1.0)
    val fwdMap = fwd.collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Double](2))).toMap
    cidx.filter(col("term") === "join").collect().foreach { cp =>
      val sum = cp.sum_tokens.zip(cp.sum_ws).toMap
      cp.doc_ids.foreach { d =>
        val (toks, ws) = fwdMap(d)
        toks.indices.foreach { i =>
          assert(sum.getOrElse(toks(i), 0.0) >= ws(i) - 1e-9,
            s"doc $d token ${toks(i)} exceeds summary")
        }
      }
    }
  }

  test("approximate-regime recall grid: heap_factor prune, query_cut " +
    "truncation, pruned summaries — exact pins hold, floors are measured") {
    // The heap skip is ORDER-DEPENDENT (partition-local thetas evolve in
    // stream order), so unlike the ann_recall_curve oracle entry this
    // evidence is measured in-engine against brute force: one cell per
    // regime the reference's SeismicBaseScorer tunes
    // (sparse/query/SeismicBaseScorer.java:202-220 — heap_factor scales
    // the skip threshold; query_cut truncates the scored query).
    val q = Map("join" -> 3.0, "hash" -> 1.5, "scan" -> 0.9,
      "window" -> 2.0, "sort" -> 1.2, "dup" -> 0.7)
    val exactIds = exact(q, 10).map(_._1).toSet
    def recall(cidx: org.apache.spark.sql.Dataset[graft.ops.ClusteredPosting],
               cut: Int, hf: Double): Int =
      Seismic.annTopK(cidx, q, 10, queryCut = cut, heapFactor = hf)
        .collect().map(_.getLong(0)).toSet.intersect(exactIds).size
    val unpruned = Seismic.buildClusteredIndex(tw,
      nPostings = Int.MaxValue, summaryPruneRatio = 1.0).cache()
    val pruned = Seismic.buildClusteredIndex(tw,
      nPostings = 160, summaryPruneRatio = 0.4).cache()

    // exact pins: dominating bounds + exact threshold (hf = 1) are
    // rank-identical to brute force; a RELAXED skip (hf > 1 makes the skip
    // condition strictly weaker) can never lose what hf = 1 keeps
    assert(recall(unpruned, cut = 10, hf = 1.0) == 10)
    assert(recall(unpruned, cut = 10, hf = 2.0) == 10)

    // aggressive threshold prune on exact bounds: hf < 1 skips clusters
    // whose bound is below theta/hf — measured floors on this fixed corpus
    // + query (values are deterministic: same plan, same stream order)
    // measured on this corpus: 10/10 at both — the ub-desc stream saturates
    // theta with the best clusters first, so even a 2x-tightened threshold
    // only skips clusters that were truly below the final top-10
    val hf08 = recall(unpruned, cut = 10, hf = 0.8)
    val hf05 = recall(unpruned, cut = 10, hf = 0.5)
    assert(hf08 >= 9, s"recall@10 at hf=0.8 was $hf08 (measured 10)")
    assert(hf05 >= 8, s"recall@10 at hf=0.5 was $hf05 (measured 10)")

    // query_cut truncation: only the top-cut weighted terms score at all —
    // the one regime that measurably loses (8/10 at cut=4, 6/10 at cut=2)
    val cut4 = recall(unpruned, cut = 4, hf = 1.0)
    val cut2 = recall(unpruned, cut = 2, hf = 1.0)
    assert(cut4 >= 7, s"recall@10 at query_cut=4 was $cut4 (measured 8)")
    assert(cut2 >= 5, s"recall@10 at query_cut=2 was $cut2 (measured 6)")

    // the reference-default production shape: pruned postings + pruned
    // summaries + exact threshold (measured 10/10 — pruned summaries still
    // dominate the kept postings' vectors on this corpus)
    val prodDefault = recall(pruned, cut = 10, hf = 1.0)
    assert(prodDefault >= 8, s"recall@10 pruned-summary default was $prodDefault (measured 10)")
    info(s"measured recall@10 cells: hf08=$hf08 hf05=$hf05 " +
      s"cut4=$cut4 cut2=$cut2 prunedDefault=$prodDefault")
  }

  test("merged clustered artifacts == fresh build, bit-identically (production + exact params)") {
    // the merge recovers member vectors, re-prunes, and RE-CLUSTERS per
    // term — a pure function of (term, member set, vectors, seed), so the
    // merged artifact must equal a fresh build over the union corpus on
    // BOTH parameter regimes (pruned random-clustered production defaults
    // and the unpruned exact mode)
    val even = tw.where(pmod(col("doc_id"), lit(2)) === 0)
    val odd = tw.where(pmod(col("doc_id"), lit(2)) === 1)
    def norm(ds: org.apache.spark.sql.Dataset[graft.ops.ClusteredPosting]) =
      ds.collect().map(cp => (cp.term, cp.cluster_id) ->
        (cp.doc_ids.toSeq, cp.doc_tokens.map(_.toSeq).toSeq,
          cp.doc_ws.map(_.toSeq).toSeq, cp.sum_tokens.toSeq, cp.sum_ws.toSeq)).toMap
    for ((np, cr, spr, ha) <- Seq(
      (160, 0.1, 0.4, false),
      (Int.MaxValue, 0.02, 1.0, true))) {
      def build(x: org.apache.spark.sql.DataFrame) =
        Seismic.buildClusteredIndex(x, nPostings = np, clusterRatio = cr,
          summaryPruneRatio = spr, maxClusters = 32, hashAssign = ha)
      val fresh = norm(build(tw))
      val merged = norm(Seismic.mergeClusteredIndexes(
        Seq(build(even), build(odd)), nPostings = np, clusterRatio = cr,
        summaryPruneRatio = spr, maxClusters = 32, hashAssign = ha))
      assert(merged.keySet == fresh.keySet, s"np=$np cluster keys differ")
      fresh.foreach { case (k, v) =>
        assert(merged(k) == v, s"np=$np cluster $k differs")
      }
    }
  }

  test("merge last-wins: a doc reindexed into a later part overrides its old vector") {
    // segment model: parts are segments in commit order; an updated doc
    // appears in an early part with its OLD vector and a later part with
    // the NEW one — the merge must resolve last-part-wins and equal a
    // fresh build over the last-wins corpus
    val target = 7L
    val updated = tw.where(col("doc_id") === target)
      .withColumn("w", col("w") * 2.0)
    val lastWins = tw.where(col("doc_id") =!= target).unionByName(updated)
    def build(x: org.apache.spark.sql.DataFrame) =
      Seismic.buildClusteredIndex(x, nPostings = Int.MaxValue,
        clusterRatio = 0.02, summaryPruneRatio = 1.0, maxClusters = 32,
        hashAssign = true)
    def norm(ds: org.apache.spark.sql.Dataset[graft.ops.ClusteredPosting]) =
      ds.collect().map(cp => (cp.term, cp.cluster_id) ->
        (cp.doc_ids.toSeq, cp.doc_ws.map(_.toSeq).toSeq,
          cp.sum_tokens.toSeq, cp.sum_ws.toSeq)).toMap
    val merged = norm(Seismic.mergeClusteredIndexes(
      Seq(build(tw), build(updated)), nPostings = Int.MaxValue,
      clusterRatio = 0.02, summaryPruneRatio = 1.0, maxClusters = 32,
      hashAssign = true))
    val fresh = norm(build(lastWins))
    assert(merged.keySet == fresh.keySet)
    fresh.foreach { case (k, v) => assert(merged(k) == v, s"cluster $k differs") }
  }

  test("SparseAnn: DSL method_parameters route; request + clause filters reach the scorer") {
    import graft.hybrid._
    import graft.query.QueryDsl
    // parse: method_parameters turns the neural_sparse clause into SparseAnn
    val p = QueryDsl.parse(
      """{"query":{"hybrid":{"queries":[
        |  {"neural_sparse":{"sf":{"query_tokens":{"join":3.0,"hash":1.0},
        |     "method_parameters":{"top_n":5,"k":20,"heap_factor":1.5}}}},
        |  {"match":{"text":"scan"}}]}}}""".stripMargin)
    assert(p.query.subQueries(0) ==
      SparseAnn(Map("join" -> 3.0, "hash" -> 1.0), topN = 5, heapFactor = 1.5, k = 20))
    // unknown method_parameters keys fail loudly
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query":{"hybrid":{"queries":[
        |  {"neural_sparse":{"sf":{"query_tokens":{"a":1.0},
        |     "method_parameters":{"bogus":1}}}}]}}}""".stripMargin))

    // execution: the NON-SCORING filter must reach the cluster-skipping
    // scorer (post-filtering a k-bounded heap would under-fill it)
    val dir = "/root/testdata/sf0.001"
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val idx = IndexCache.documents(spark, dir)
    val cidx = Seismic.buildClusteredIndex(tw, nPostings = Int.MaxValue,
      summaryPruneRatio = 1.0, clusterRatio = 0.02, maxClusters = 32,
      hashAssign = true).cache()
    val q = Map("join" -> 3.0, "hash" -> 1.0)
    val filtIds = docsDf.where(col("lang") === "en").select("doc_id")
    val want = Sparse.linearTopK(tw.join(filtIds, Seq("doc_id"), "left_semi"), q, 10)
      .collect().map(_.getLong(0)).toSeq
    val src = HybridSources(idx, seismic = Some(cidx), fields = Some(docsDf))
    // request-level filter, hybrid path
    val gotReq = Hybrid.execute(src,
      HybridQuery(Seq(SparseAnn(q, topN = 10, heapFactor = 1.0, k = 10)), k = 10, depth = 10),
      Some(filtIds)).collect().map(_.getLong(0)).toSeq
    assert(gotReq == want, s"request filter: $gotReq vs $want")
    // clause-level filter (method_parameters.filter), no request filter
    val gotClause = Hybrid.execute(src,
      HybridQuery(Seq(SparseAnn(q, topN = 10, heapFactor = 1.0, k = 10,
        filter = Some(col("lang") === "en"))), k = 10, depth = 10),
      None).collect().map(_.getLong(0)).toSeq
    assert(gotClause == want, s"clause filter: $gotClause vs $want")
    // both at once: intersection (en AND doc_id < 300)
    val filt2 = docsDf.where(col("doc_id") < 300).select("doc_id")
    val want2 = Sparse.linearTopK(
      tw.join(filtIds.join(filt2, Seq("doc_id"), "left_semi"), Seq("doc_id"), "left_semi"),
      q, 10).collect().map(_.getLong(0)).toSeq
    val gotBoth = Hybrid.execute(src,
      HybridQuery(Seq(SparseAnn(q, topN = 10, heapFactor = 1.0, k = 10,
        filter = Some(col("lang") === "en"))), k = 10, depth = 10),
      Some(filt2)).collect().map(_.getLong(0)).toSeq
    assert(gotBoth == want2, s"both filters: $gotBoth vs $want2")
    // bool/bare-leaf DSL path: the request filter reaches the ANN scorer
    // too (BoolQuery scores SparseAnn through scoreSparseAnn, not a
    // post-filter over the bounded heap)
    val gotBool = QueryDsl.execute(
      HybridSources(idx, seismic = Some(cidx), fields = Some(docsDf)),
      """{ "query": { "bool": {
        |    "must": [ { "neural_sparse": { "sf": {
        |        "query_tokens": { "join": 3.0, "hash": 1.0 },
        |        "method_parameters": { "top_n": 10, "k": 10, "heap_factor": 1.0 } } } } ],
        |    "filter": { "term": { "lang": "en" } } } },
        |  "size": 10 }""".stripMargin, docsDf)
      .collect().map(_.getLong(0)).toSeq
    assert(gotBool == want, s"bool filter: $gotBool vs $want")
    // missing seismic source fails loudly
    intercept[IllegalArgumentException](Hybrid.execute(
      HybridSources(idx, fields = Some(docsDf)),
      HybridQuery(Seq(SparseAnn(q)), k = 10, depth = 10), None))
  }

  test("reference-default approximate mode returns k plausible results") {
    val cidx = Seismic.buildClusteredIndex(tw, nPostings = 160, summaryPruneRatio = 0.4).cache()
    val q = Map("join" -> 3.0, "hash" -> 1.0, "scan" -> 0.5)
    val got = Seismic.annTopK(cidx, q, 10, queryCut = 10, heapFactor = 1.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    // every returned score is a true dot product
    val ex = exact(q, 1000).toMap
    got.foreach { case (d, s) => assert(math.abs(ex(d) - s) < 1e-9) }
    // recall sanity vs exact top-10
    val recall = exact(q, 10).map(_._1).toSet.intersect(got.map(_._1).toSet).size
    assert(recall >= 5, s"recall@10 = $recall")
  }
}
