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
