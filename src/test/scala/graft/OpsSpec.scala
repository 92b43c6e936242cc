package graft

class IngestSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Ingest

  test("processor chain is one projection; validation fails fast") {
    val docs = Seq((1L, " Ab ", "x"), (2L, "cD", "y")).toDF("id", "s", "t")
    val out = Ingest(docs, Seq(
      Ingest.Trim("s"), Ingest.Lowercase("s"),
      Ingest.Rename("t", "u"), Ingest.SetCopy("v", "s"),
      Ingest.Gsub("v", "[b]", "Z"), Ingest.Convert("id", "string"),
      Ingest.Remove("u"), Ingest.SetLit("tag", 7)))
    assert(out.columns.toSeq == Seq("id", "s", "v", "tag"))
    val r = out.orderBy($"id").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(r.map(_.getString(1)).toSeq == Seq("ab", "cd"))
    assert(r.map(_.getString(2)).toSeq == Seq("aZ", "cd"))
    // the whole chain is a single projection over one scan — no shuffle
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException] {
      Ingest(docs, Seq(Ingest.Lowercase("nope")))
    }
    intercept[IllegalArgumentException] {
      Ingest(docs, Seq(Ingest.Rename("s", "t")))
    }
    intercept[IllegalArgumentException] {
      Ingest(docs, Seq(Ingest.Convert("id", "decimal")))
    }
  }
}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.Reorder
import graft.ops.{Dedup, Rerank, TopN}

/** Unit coverage for the round-2 operators: salted two-level top-N,
 *  dense-id reordering, pigeonhole SimHash blocking, MMR rerank. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def sampleScores = (1 to 200).map { i =>
    (i.toLong, s"g${i % 3}", (i * 37 % 101).toDouble)
  }.toDF("doc_id", "grp", "score")

  test("TopN.perGroup equals the single-window top-n for every salt count") {
    val df = sampleScores
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"doc_id".asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).drop("rn")
      .orderBy($"grp", $"doc_id").collect().toSeq
    for (salt <- Seq(1, 4, 64)) {
      val got = TopN.perGroup(df, Seq("grp"), "doc_id", 5,
        Seq($"score".desc, $"doc_id".asc), saltBuckets = salt)
        .orderBy($"grp", $"doc_id").collect().toSeq
      assert(got == expected, s"saltBuckets=$salt")
    }
  }

  test("Reorder.denseIds equals row_number() - 1 under the same total order") {
    val df = (1 to 500).map(i => (i.toLong, (i * 13 % 41).toLong)).toDF("doc_id", "key")
    val w = Window.orderBy($"key", $"doc_id")
    val expected = df.withColumn("new_id", row_number().over(w).cast("long") - 1)
      .orderBy($"doc_id").select("doc_id", "new_id").collect().toSeq
    val got = Reorder.denseIds(df, Seq($"key", $"doc_id"), "new_id", partitions = 7)
      .orderBy($"doc_id").select("doc_id", "new_id").collect().toSeq
    assert(got == expected)
  }

  test("simhashPairs pigeonhole blocking finds every pair within the radius (64 and 128 bit)") {
    // near-duplicate texts differ in few tokens -> small hamming distances
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, base), (1L, base), (2L, base + " extra"), (3L, base.replace("beta", "mu")),
      (4L, "totally different words here nothing shared at all xyz")
    ).toDF("doc_id", "text")
    val maxH = 3
    for (bits <- Seq(64, 128)) {
      val got = Dedup.simhashPairs(docs, "doc_id", "text", maxH, bits)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force over the packed word signatures
      val nW = bits / 32
      val sigs = Dedup.simhashSignaturesWide(docs, "doc_id", "text", bits)
        .collect().map(r => r.getLong(0) -> (1 to nW).map(r.getLong)).toMap
      val expected = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        h = sigs(a).zip(sigs(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
        if h <= maxH
      } yield (a, b)).toSet
      assert(got == expected, s"bits=$bits")
      assert(expected.contains((0L, 1L)), s"bits=$bits") // identical docs must pair
    }
  }

  test("minhashLshPairs duplicate-cluster pre-grouping reproduces the naive pair set") {
    // a 4-doc exact-duplicate cluster plus near/far docs: the rep-level band
    // join must expand back to every in-cluster and cross-cluster pair the
    // naive self-join would emit
    val base = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (0L, base), (1L, base), (2L, base), (3L, base),
      (4L, base + " eleven twelve"),
      (5L, "unrelated text entirely different tokens everywhere")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", k = 2,
      numHashes = 8, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    // all 6 in-cluster pairs of {0,1,2,3} must be present
    val cluster = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    cluster.foreach(p => assert(got.contains(p), p.toString))
    // the near-dup doc 4 shares most shingles -> banded with the cluster
    assert(got.exists { case (a, b) => b == 4L || a == 4L })
    // the unrelated doc must not pair with anything
    assert(!got.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("bandBounds covers all bits without overlap (32 and 64)") {
    for (bits <- Seq(32, 64); n <- 1 to 6) {
      val b = Dedup.bandBounds(n, bits)
      assert(b.head == 0 && b.last == bits && b == b.sorted && b.distinct == b)
    }
  }

  test("MMR greedy selection balances relevance and diversity") {
    // two clusters of identical vectors; relevance prefers cluster A, but
    // after one pick from A, diversity must pull in cluster B
    val hits = Seq((1L, 10.0), (2L, 9.9), (3L, 5.0)).toDF("doc_id", "score")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), // cluster A (identical)
      (3L, Array(0.0f, 1.0f))                           // cluster B (orthogonal)
    ).toDF("doc_id", "vec")
    val got = Rerank.mmr(hits, emb, lambda = 0.5, k = 3)
      .orderBy($"rank").select("doc_id").as[Long].collect().toSeq
    // pick 1 (best rel); then doc 2 scores 0.5*9.9-0.5*1.0=4.45 < doc 3's
    // 0.5*5.0-0.5*0.0=2.5? no: 4.45 > 2.5 -> doc 2 second, doc 3 third
    assert(got == Seq(1L, 2L, 3L))
    val diverse = Rerank.mmr(hits, emb, lambda = 0.3, k = 2)
      .orderBy($"rank").select("doc_id").as[Long].collect().toSeq
    // 0.3*9.9-0.7*1.0 = 2.27 < 0.3*5.0-0.7*0.0 = 1.5? no: 2.27 > 1.5 ->
    // still doc 2; make cluster A's second doc weaker
    val hits2 = Seq((1L, 10.0), (2L, 6.0), (3L, 5.0)).toDF("doc_id", "score")
    val got2 = Rerank.mmr(hits2, emb, lambda = 0.3, k = 2)
      .orderBy($"rank").select("doc_id").as[Long].collect().toSeq
    // second pick: doc2 = 0.3*6.0-0.7*1.0 = 1.1 < doc3 = 0.3*5.0 = 1.5
    assert(got2 == Seq(1L, 3L))
    assert(diverse.head == 1L)
  }

  // three well-separated directions + noise; ids chosen so the seed set
  // (ids < 3) starts with one vector from each direction already mixed up
  private def kmeansData = {
    val groups = Seq(Array(10f, 0f, 0f), Array(0f, 10f, 0f), Array(0f, 0f, 10f))
    (0 until 60).map { i =>
      val base = groups(i % 3)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + ((i * 7 + d) % 5) * 0.1f })
    }.toDF("vec_id", "embedding")
  }

  test("deterministic sampling: reproducible, rate-accurate, quota-exact") {
    import graft.ops.Sample
    val rows = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val s1 = Sample.fraction(rows, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    val s2 = Sample.fraction(rows, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same input, same sample — no rand() anywhere")
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.05, s"rate off: ${s1.size}")
    // a smaller rate's sample NESTS inside a larger rate's (threshold is a
    // prefix-ordered cut of the same hash coordinate)
    val s3 = Sample.fraction(rows, "doc_id", 0.1).select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1), "rate 0.1 sample must nest inside rate 0.3")

    val strat = Sample.stratified(rows, "doc_id", "lang", Map("en" -> 0.0))
    assert(strat.where($"lang" === "en").count() == 0, "rate 0 stratum drops everything")
    assert(strat.where($"lang" =!= "xx").count() == 0 || strat.count() > 1000,
      "default rate 1.0 keeps the other stratum")

    val q = Sample.quota(rows, "doc_id", "lang", 17)
    val counts = q.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 17L, "xx" -> 17L), s"exact quota per stratum: $counts")
    // quota picks the smallest hash keys — equals the plain window formulation
    val expected = rows
      .withColumn("hk", Sample.hashKey($"doc_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")
          .orderBy($"hk".asc, $"doc_id".asc)))
      .where($"rn" <= 17).select("doc_id").as[Long].collect().toSet
    assert(q.select("doc_id").as[Long].collect().toSet == expected)
  }

  test("hyperplane LSH: identical vectors always pair; every pair is sound vs brute force") {
    import graft.ops.Ann
    // 0 and 1 identical (must share every band); 2 near 0; 3 orthogonal-ish
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(1.1f, 2.1f, 2.9f, 4.2f)),
      (3L, Array(-4.0f, 3.0f, -2.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Ann.lshCosinePairs(emb, "vec_id", "embedding",
      nPlanes = 16, nBands = 4, threshold = 0.9, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0),
      s"identical vectors share every band and must be found: $pairs")
    // soundness: every reported pair really clears the cosine threshold
    val brute = Ann.cosinePairs(emb.withColumn("blk", lit(1)),
      "vec_id", "embedding", "blk", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall(p => brute.contains((p._1, p._2))), s"unsound pair in $pairs")
  }

  test("cosinePairs: oversized blocks fail loudly without dim, auto-route via LSH with it") {
    import graft.ops.Ann
    // block "a": 4 vectors (all-pairs safe at maxBlock=10); block "b": 30
    // vectors including an identical pair (must survive LSH routing)
    val rows = (0 until 4).map(i =>
        (i.toLong, Array.tabulate(8)(d => math.sin(i * 2.1 + d).toFloat), "a")) ++
      (10 until 40).map(i =>
        (i.toLong, Array.tabulate(8)(d =>
          if (i == 11) math.cos(10 * 0.9 + d * 1.7).toFloat // 11 == 10 exactly
          else math.cos(i * 0.9 + d * 1.7).toFloat), "b"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    // no dim -> the quadratic branch is refused, not silently executed
    val ex = intercept[IllegalArgumentException](
      Ann.cosinePairs(emb, "vec_id", "embedding", "label", 0.5, maxBlock = 10))
    assert(ex.getMessage.contains("maxBlock"), ex.getMessage)
    // dim -> small block exact, big block LSH-routed (sound + identicals kept)
    val got = Ann.cosinePairs(emb, "vec_id", "embedding", "label", 0.5,
        maxBlock = 10, nPlanes = 16, nBands = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.cosinePairs(emb, "vec_id", "embedding", "label", 0.5,
        maxBlock = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSmall = brute.filter(_._1 < 4)
    assert(got.filter(_._1 < 4) == bruteSmall, "small blocks stay exact all-pairs")
    assert(got.subsetOf(brute), s"routed pairs must be sound: ${got.diff(brute)}")
    assert(got.contains((10L, 11L)), "identical vectors share every band and must pair")
  }

  test("ngramJaccardPairs caps stop-shingle df by default; uncapped is explicit opt-in") {
    import graft.ops.Dedup
    // 70 docs share ONLY the ubiquitous shingle "x y z" (df 70 > default 64)
    val docs = (0 until 70).map(i => (i.toLong, s"x y z w$i")).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.2)
    assert(capped.count() == 0, "default cap drops the stop-shingle before the self-join")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.2, maxShingleDf = Int.MaxValue)
    assert(uncapped.count() == 70L * 69 / 2, "explicit opt-out keeps the quadratic baseline")
  }

  test("LSH top-k is the exact cosine rank within the candidate set, query first") {
    import graft.ops.Ann
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 3.7 + d * 1.3).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Ann.lshTopK(emb, "vec_id", "embedding", queryId = 7L, k = 5,
      nPlanes = 16, nBands = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.head == ((7L, 1.0)), "the query collides with its own buckets and ranks first")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "descending cosine order")
    // every returned id shares at least one band with the query
    val sig = Ann.lshSignature(emb, "vec_id", "embedding", 16, 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val qBands = (0 until 4).map(b => (b, sig(7L).substring(b * 4, b * 4 + 4)))
    got.foreach { case (id, _) =>
      assert(qBands.exists { case (b, bh) => sig(id).substring(b * 4, b * 4 + 4) == bh },
        s"id $id shares no band with the query")
    }
  }

  test("kmeans centroids are deterministic and the assignment partitions the corpus") {
    val emb = kmeansData
    val c1 = graft.ops.Ann.kmeansCentroids(emb, "vec_id", "embedding", 3, iters = 3)
      .orderBy($"c_id").collect().toSeq
    val c2 = graft.ops.Ann.kmeansCentroids(emb, "vec_id", "embedding", 3, iters = 3)
      .orderBy($"c_id").collect().toSeq
    assert(c1.map(_.toString) == c2.map(_.toString), "same input must learn the same centroids")
    val asg = graft.ops.Ann.assignTo(emb, "vec_id", "embedding",
      graft.ops.Ann.kmeansCentroids(emb, "vec_id", "embedding", 3, iters = 3))
    assert(asg.count() == 60, "every vector assigned")
    assert(asg.select("vec_id").distinct().count() == 60, "assigned exactly once")
    // the three axis-aligned groups must each land in one cluster
    val byGroup = asg.withColumn("g", $"vec_id" % 3)
      .groupBy($"g").agg(countDistinct($"c_id").as("nc"))
      .select("nc").as[Long].collect().toSeq
    assert(byGroup.forall(_ == 1L), s"each direction maps to a single learned cluster: $byGroup")
  }

  test("incremental ingest encodes only changed/new docs and reuses the rest") {
    val prev = Seq((1L, "same text"), (2L, "old text"), (3L, "gone doc"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "same text"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    // encoder output marks which snapshot produced it, so a reused row is
    // distinguishable from a re-encoded one
    def enc(tag: String)(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", lit(tag).as("payload"))
    val out = graft.ops.Semantic.incremental(next, prev, enc("prev")(prev),
      "doc_id", "text")(enc("next"))
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("payload"),
      r.getAs[Boolean]("reused"))).toSeq ==
      Seq((1L, "prev", true), (2L, "next", false), (4L, "next", false)),
      "doc 1 unchanged -> prev rows reused; doc 2 changed + doc 4 new -> encoded; doc 3 deleted -> absent")
  }

  test("nested score_mode family: avg/max/sum/min/count equal brute-force " +
    "over the per-chunk cosines") {
    val sem = graft.ops.Semantic
    val d = Seq(
      (1L, "merge sort join hash scan filter"),
      (2L, "merge sort merge sort merge sort"),
      (3L, "hash scan dup key probe build"),
      (4L, "sort merge partition shuffle spill block")).toDF("doc_id", "text")
    val dense = sem.ingestDense(d, "doc_id", "text", tokenLimit = 2, dims = 8)
    val per = sem.denseKnnExpanded(dense, "doc_id", 1L, 0, k = 1000)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("c")))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2) }
    val modes = sem.denseKnnScoreModes(dense, "doc_id", 1L, 0, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("s_avg"), r.getAs[Double]("s_max"),
          r.getAs[Double]("s_sum"), r.getAs[Double]("s_min"),
          r.getAs[Long]("n_chunks")))).toMap
    assert(modes.keySet == per.keySet)
    per.foreach { case (id, cs) =>
      val (a, mx, sm, mn, n) = modes(id)
      assert(math.abs(a - cs.sum / cs.size) < 1e-9, s"doc $id avg")
      assert(math.abs(mx - cs.max) < 1e-9 && math.abs(mn - cs.min) < 1e-9)
      assert(math.abs(sm - cs.sum) < 1e-9 && n == cs.size)
    }
  }

  test("inner_hits nested kNN: parents match best-chunk top-k; inner hits are " +
    "each parent's chunks ranked by cosine, bounded at size") {
    val sem = graft.ops.Semantic
    // multi-chunk docs: tokenLimit 2 forces several chunks per doc
    val d = Seq(
      (1L, "merge sort join hash scan filter"),
      (2L, "merge sort merge sort merge sort"),
      (3L, "hash scan dup key probe build"),
      (4L, "sort merge partition shuffle spill block")).toDF("doc_id", "text")
    val dense = sem.ingestDense(d, "doc_id", "text", tokenLimit = 2, dims = 8)
    val ih = sem.denseKnnInnerHits(dense, "doc_id", queryDoc = 1L, queryChunk = 0,
      k = 3, innerSize = 2).collect()

    // parent set + parent scores == the best-chunk top-k contract
    val best = sem.denseKnnBestChunk(dense, "doc_id", 1L, 0, 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        BigDecimal(r.getAs[Double]("c")).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toMap
    val parents = ih.map(r => (r.getAs[Long]("doc_id"),
      BigDecimal(r.getAs[Double]("score")).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toMap
    assert(parents == best, s"parent hits must equal best-chunk top-k: $parents vs $best")

    val byParent = ih.groupBy(_.getAs[Long]("doc_id"))
    byParent.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("inner_rank"))
      assert(sorted.length <= 2, s"doc $id: inner hits bounded at size")
      assert(sorted.map(_.getAs[Int]("inner_rank")).toSeq ==
        sorted.indices.toSeq, s"doc $id: dense 0-based inner ranks")
      // rank 0 carries the parent's own score (score_mode max)
      assert(math.abs(sorted.head.getAs[Double]("chunk_cos") -
        sorted.head.getAs[Double]("score")) < 1e-12,
        s"doc $id: rank-0 inner hit must be the scoring chunk")
      // non-increasing cosine down the ranks
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("chunk_cos") >= b.getAs[Double]("chunk_cos") - 1e-12,
            s"doc $id: inner hits ordered by cosine")
        case _ =>
      }
    }
  }

  test("asymmetric encoding: detector flags prefixed configs; prefixes shift " +
    "exactly the prefix token's feature (AsymmetricModelDetector)") {
    val sem = graft.ops.Semantic
    // detector: asymmetric iff either prefix is configured
    assert(!sem.AsymmetricConfig().isAsymmetric)
    assert(sem.AsymmetricConfig(queryPrefix = Some(sem.DefaultQueryPrefix)).isAsymmetric)
    assert(sem.AsymmetricConfig(passagePrefix = Some(sem.DefaultPassagePrefix)).isAsymmetric)

    // empty prefix is the identity: symmetric path unchanged
    val d = Seq((1L, "merge sort join"), (2L, "hash scan")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy($"doc_id", $"chunk_idx", $"dim")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("dim"), r.getAs[Double]("v"))).toSeq
    assert(rows(sem.ingestDense(d, "doc_id", "text", 20, 8)) ==
      rows(sem.ingestDense(d, "doc_id", "text", 20, 8, passagePrefix = "")))

    // 'passage:' hashes to dim (8*31 + ascii('p')) % 8 = 0 with weight
    // 1*(1 + 8%5*0.25) = 1.75: the asymmetric chunk vector is the symmetric
    // one plus exactly that feature, every chunk
    val sym = sem.ingestDense(d, "doc_id", "text", 20, 8)
    val asym = sem.ingestDense(d, "doc_id", "text", 20, 8,
      passagePrefix = sem.DefaultPassagePrefix)
    val diff = asym.withColumnRenamed("v", "va")
      .join(sym.withColumnRenamed("v", "vs"),
        Seq("doc_id", "chunk_idx", "dim"), "full")
      .select($"doc_id", $"chunk_idx", $"dim",
        (coalesce($"va", lit(0.0)) - coalesce($"vs", lit(0.0))).as("dv"))
      .where(abs($"dv") > 1e-9)
      .collect().map(r => (r.getAs[Int]("dim"), r.getAs[Double]("dv"))).toSeq
    assert(diff.nonEmpty && diff.forall { case (dim, dv) =>
      dim == 0 && math.abs(dv - 1.75) < 1e-9 },
      s"asymmetric-symmetric delta must be the passage token's feature only: $diff")

    // query side: the prefix token joins the bag before hashing
    val q = sem.hashQueryVector(Seq("merge", "sort"), 8,
      queryPrefix = sem.DefaultQueryPrefix)
    val qSym = sem.hashQueryVector(Seq("merge", "sort"), 8)
    assert(q((6 * 31 + 'q'.toInt) % 8) ==
      qSym.getOrElse((6 * 31 + 'q'.toInt) % 8, 0.0) + 1.25)
    assert(q.filterNot(_._1 == (6 * 31 + 'q'.toInt) % 8) ==
      qSym.filterNot(_._1 == (6 * 31 + 'q'.toInt) % 8))
  }

  test("frameSample: uniform-k over fixed-size frames, bounded rows, exact offsets") {
    // 70 bytes -> 4 frames, stride 1 -> frames 0..3 at offsets 0,16,32,48;
    // 200 bytes -> 12 frames, stride 3 -> frames 0,3,6,9 at 0,48,96,144;
    // 10 bytes -> 0 frames -> no rows
    val t1 = ("a" * 16) + ("b" * 16) + ("c" * 16) + ("d" * 16) + ("e" * 6)
    val t2 = (0 until 200).map(i => ('a' + (i / 16) % 26).toChar).mkString
    val d = Seq((1L, t1), (2L, t2), (3L, "tiny bytes")).toDF("doc_id", "text")
    val got = graft.ops.Multimodal.frameSample(d, "doc_id", "text", k = 4, frameBytes = 16)
      .orderBy($"doc_id", $"frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 'a'.toLong), (1L, 1L, 16L, 'b'.toLong),
      (1L, 2L, 32L, 'c'.toLong), (1L, 3L, 48L, 'd'.toLong),
      (2L, 0L, 0L, 'a'.toLong), (2L, 3L, 48L, 'd'.toLong),
      (2L, 6L, 96L, 'g'.toLong), (2L, 9L, 144L, 'j'.toLong)))
  }

  test("rescore reorders the window by the second scorer, keeping previous_score") {
    val hits = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("doc_id", "score")
    val second = Seq((2L, 0.9), (3L, 0.5)).toDF("doc_id", "score") // doc 1 uncovered -> 0.0
    val got = graft.ops.Rerank.rescore(hits, second, 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Double]("previous_score")))
    assert(got.toSeq == Seq((2L, 0.9, 9.0), (3L, 0.5, 8.0), (1L, 0.0, 10.0)))
  }

  test("highlight emits first-occurrence pos and a clamped <em> snippet") {
    val docs = Seq(
      (1L, "alpha merge beta merge gamma delta epsilon"),
      (2L, "merge at the very start of this doc"),
      (3L, "no match here at all")
    ).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("doc_id")
    val got = graft.ops.Highlight.matchedTerms(hits, docs, "text", Seq("merge"), window = 2)
      .orderBy($"doc_id").collect()
    assert(got.length == 2, "unmatched docs produce no rows")
    val r1 = got(0)
    assert(r1.getAs[Long]("pos") == 2L)
    // window 2 around pos 2 -> tokens 1..4, both occurrences inside get tagged
    assert(r1.getAs[String]("snippet") == "alpha <em>merge</em> beta <em>merge</em>")
    val r2 = got(1)
    assert(r2.getAs[Long]("pos") == 1L)
    assert(r2.getAs[String]("snippet") == "<em>merge</em> at the")
  }

  test("fragment highlighting: phrase spans + term occurrences, island merge, density rank") {
    val docs = Seq(
      (1L, "a merge sort b c d e f g h window i j k window l"),
      (2L, "window a b c d e f window window x y z"),
      (3L, "merge sort merge sort"),
      (4L, "nothing to see")
    ).toDF("doc_id", "text")
    val hits = Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("doc_id")
    val got = graft.ops.Highlight.fragments(hits, docs, "text",
        terms = Seq("window"), phrases = Seq(Seq("merge", "sort")),
        window = 2, maxFragments = 2)
      .orderBy($"doc_id", $"frag_rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frag_rank"),
        r.getAs[Long]("n_matches"), r.getAs[String]("snippet")))
    // doc 1: phrase at (2,3), terms at 11 and 15 — gap 11-3=8 > 2w+1=5
    // splits islands; equal density ties break by start
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1, 2L, "a <em>merge</em> <em>sort</em> b c"),
      (1L, 2, 2L, "g h <em>window</em> i j k <em>window</em> l")))
    // doc 2: the denser island {8,9} outranks the earlier singleton {1}
    assert(got.filter(_._1 == 2L).toSeq == Seq(
      (2L, 1, 2L, "e f <em>window</em> <em>window</em> x y"),
      (2L, 2, 1L, "<em>window</em> a b")))
    // doc 3: phrase spans cover everything once (positions dedupe), one island
    assert(got.filter(_._1 == 3L).toSeq == Seq(
      (3L, 1, 4L, "<em>merge</em> <em>sort</em> <em>merge</em> <em>sort</em>")))
    assert(!got.exists(_._1 == 4L), "unmatched docs produce no fragments")
    // maxFragments=1 keeps only the densest fragment per doc
    val top1 = graft.ops.Highlight.fragments(hits, docs, "text",
        terms = Seq("window"), phrases = Seq(Seq("merge", "sort")),
        window = 2, maxFragments = 1)
      .groupBy($"doc_id").count().collect()
    assert(top1.forall(_.getAs[Long]("count") == 1L))
  }

  test("token-budget packing equals the single-window prefix-sum for every partition count") {
    val df = (1 to 300).map(i => (i.toLong, (i * 17 % 40 + 1).toLong)).toDF("doc_id", "n_tokens")
    val w = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("shard", ((sum($"n_tokens").over(w) - $"n_tokens") / 100).cast("long"))
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    for (parts <- Seq(1, 7, 64)) {
      val got = graft.ops.Pack.byTokenBudget(df, Seq($"doc_id"), $"n_tokens", 100,
        partitions = parts)
        .select($"doc_id", $"n_tokens", $"shard")
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(got == expected, s"partitions=$parts")
    }
  }

  test("highlight matches analyzer-normalized tokens in mixed-case punctuated text") {
    val docs = Seq((1L, "First Merge, then window.")).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L)).toDF("doc_id")
    val got = graft.ops.Highlight.matchedTerms(hits, docs, "text",
      Seq("merge", "window"), window = 1)
      .orderBy($"term").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("pos") == 2L) // "Merge," matched as "merge"
    assert(got(0).getAs[String]("snippet") == "First <em>Merge,</em> then")
    assert(got(1).getAs[Long]("pos") == 4L) // "window." matched as "window"
    assert(got(1).getAs[String]("snippet") == "then <em>window.</em>")
  }

  test("repetition metrics match hand-computed Gopher fractions") {
    // "a b a b a c": tokens 6, dup occurrences a(3)+b(2)=5 -> 0.8333
    // 2-grams: [a b, b a, a b, b a, a c] n=5, dup 4 -> 0.8, top "a b" 2 -> 0.4
    // 3-grams: [a b a, b a b, a b a, b a c] n=4, dup 2 -> 0.5, top 2 -> 0.5
    val docs = Seq((1L, "a b a b a c"), (2L, "x y z"), (3L, "q")).toDF("doc_id", "text")
    val m = graft.ops.TextOps.repetition(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(m(0).toSeq == Seq(1L, 6L, 0.8333, 0.8, 0.4, 0.5, 0.5))
    // all-distinct doc: every fraction 0 except top (each gram count 1)
    assert(m(1).toSeq == Seq(2L, 3L, 0.0, 0.0, 0.5, 0.0, 1.0))
    // doc shorter than n: gram fractions defined as 0
    assert(m(2).toSeq == Seq(3L, 1L, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("redactPii masks emails, IPv4s and phone numbers with per-category counts") {
    val docs = Seq(
      (1L, "reach bob.smith+x@corp.example.org or alice@ex.io today"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "no pii here")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.redactPii(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "reach <EMAIL> or <EMAIL> today", 2L, 0L, 0L),
      (2L, "server <IP> and <IP> up", 0L, 2L, 0L),
      (3L, "call <PHONE> now", 0L, 0L, 1L),
      (4L, "no pii here", 0L, 0L, 0L)))
  }

  test("duplicateSpans merges overlapping duplicated windows into maximal spans") {
    // k=3. doc 1 and doc 2 share the 5-token run "p q r s t": windows
    // starting at 0,1,2 in doc 1 (and 1,2,3 in doc 2) are duplicated and
    // overlap -> ONE span covering tokens [0, 5) in doc 1, [1, 6) in doc 2.
    // doc 3 repeats "u v w" at positions 0 and 5 WITHIN itself (self-dup,
    // counted per the paper), gap 5 > k -> two separate spans of len 3.
    // doc 4 shares nothing -> no rows.
    val docs = Seq(
      (1L, "p q r s t x0 y0"),
      (2L, "z1 p q r s t y1"),
      (3L, "u v w a b u v w"),
      (4L, "only unique tokens here none repeat")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicateSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L, 5L), (2L, 1L, 5L), (3L, 0L, 3L), (3L, 5L, 3L)))
  }

  test("decontamination flags exactly the docs sharing a k-gram with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox" with bench
      (2L, "wholly unrelated text here"),  // clean
      (3L, "quick brown fox runs away")    // shares the same 3-gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox appeared")).toDF("doc_id", "text")
    val got = graft.ops.Decontam.overlap(corpus, bench, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getBoolean(4))).toSeq ==
      Seq((1L, true), (2L, false), (3L, true)))
    assert(got(0).getLong(2) == 1L && got(0).getLong(1) == 3L) // 1 of 3 shingles
    assert(got(1).getLong(2) == 0L && got(1).getDouble(3) == 0.0)
  }

  test("connectedComponents equals brute-force union-find on random pair graphs") {
    def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    // seeded random graphs: long chains (worst case for label propagation),
    // cycles, stars, singleton pairs, and isolated cliques
    for (seed <- Seq(7, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val chain = (0 until 40).map(i => (i.toLong * 3 + 1, i.toLong * 3 + 4))
      val cycle = (0 until 10).map(i => (1000L + i, 1000L + (i + 1) % 10))
      val random = (0 until 60).map(_ => (rnd.nextInt(50).toLong + 2000,
        rnd.nextInt(50).toLong + 2000)).filter(p => p._1 != p._2)
      val pairs = chain ++ cycle ++ random
      val expected = unionFind(0, pairs)
      val got = graft.ops.Dedup.connectedComponents(
          pairs.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("keepCanonical drops exactly the non-minimum cluster members") {
    // components {1,2,3} (chain) and {10,11}; 20 is pair-free and survives
    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = graft.ops.Dedup.keepCanonical(corpus, "doc_id", pairs, "id_a", "id_b")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 20L))
  }

  test("bigramPerplexity matches the hand-computed add-one bigram model") {
    // corpus: d0 = "a b a" (bigrams ab, ba), d1 = "b b" (bigram bb),
    // d2 = "x" (no bigram, but "x" counts in the vocabulary -> V = 3)
    // contexts: c1(a)=1, c1(b)=2; bigram counts all 1
    // d0: ppl = exp(avg(ln(4/2), ln(5/2))) = sqrt(10)/sqrt(2) = sqrt(5)
    // d1: ppl = (2+3)/(1+1) = 2.5
    val docs = Seq((0L, "a b a"), (1L, "b b"), (2L, "x")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(0L, 1L)) // the 1-token doc carries no bigram
    assert(got(0L) == ((2L, BigDecimal(math.sqrt(5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(1L) == ((1L, 2.5)))
  }

  test("termSuggest ranks by (distance, df desc, term) and skips in-dictionary tokens") {
    import graft.index.InvertedIndex
    val idx = InvertedIndex.build(Seq(
      (0L, "scan hash scan"), (1L, "span hash"), (2L, "scat")
    ).toDF("doc_id", "text"), "doc_id", "text")
    val got = graft.query.Suggest.termSuggest(idx, "scam hash", maxEdits = 1, size = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // "hash" is in the dictionary -> no suggestions; "scam" -> scan/scat/span
    // all at distance 1, ranked df desc (scan df=2) then term asc (scat)
    assert(got == Seq(("scam", "scan", 1), ("scam", "scat", 1)))
    intercept[IllegalArgumentException] {
      graft.query.Suggest.termSuggest(idx, "scam", maxEdits = 3)
    }
  }

  test("termSuggest suggest_mode popular/always and damerau distance") {
    import graft.index.InvertedIndex
    // dictionary dfs: scan 1 (doc 0 only), hash 2, span 2, scat 1
    val idx = InvertedIndex.build(Seq(
      (0L, "scan hash scan"), (1L, "span hash"), (2L, "scat span")
    ).toDF("doc_id", "text"), "doc_id", "text")
    def rows(text: String, mode: String, dist: String = "levenshtein") =
      graft.query.Suggest.termSuggest(idx, text, maxEdits = 1, size = 3,
        mode = mode, distance = dist)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // "scan" is in the dictionary: missing -> nothing; popular -> only the
    // strictly-more-frequent span (df 2 > 1); always -> span then scat
    // (dist ties, df desc)
    assert(rows("scan", "missing").isEmpty)
    assert(rows("scan", "popular") == Seq(("scan", "span", 1)))
    assert(rows("scan", "always") == Seq(("scan", "span", 1), ("scan", "scat", 1)))
    // transposed misspelling: classic levenshtein needs 2 edits, damerau 1
    assert(rows("hsah", "missing").isEmpty)
    assert(rows("hsah", "missing", "damerau") == Seq(("hsah", "hash", 1)))
    intercept[IllegalArgumentException](rows("scan", "sometimes"))
    intercept[IllegalArgumentException](rows("scan", "missing", "jaro"))
  }

  test("temperature sampling: apportionment, caps with redistribution, determinism") {
    import graft.ops.Sample
    // strata: a=64 docs, b=16, c=4 -> sqrt weights 8/4/2, target 28 ->
    // exact shares 16/8/4 (no remainders, no caps)
    val df = ((1 to 64).map(i => (i.toLong, "a")) ++
      (101 to 116).map(i => (i.toLong, "b")) ++
      (201 to 204).map(i => (i.toLong, "c"))).toDF("doc_id", "src")
    val got = Sample.temperature(df, "doc_id", "src", alpha = 0.5, target = 28)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 16L, "b" -> 8L, "c" -> 4L))
    // caps bind: target 80 wants 45.7/22.9/11.4 -> c capped at 4, its
    // surplus flows to the larger strata; total stays 80
    val capped = Sample.temperature(df, "doc_id", "src", alpha = 0.5, target = 80)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("c") == 4L && capped.values.sum == 80L)
    // alpha = 1 keeps the natural distribution: 64/84, 16/84, 4/84 of 21
    val nat = Sample.temperature(df, "doc_id", "src", alpha = 1.0, target = 21)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat == Map("a" -> 16L, "b" -> 4L, "c" -> 1L))
    // content-addressed: the same call returns the same rows
    val a1 = Sample.temperature(df, "doc_id", "src", 0.5, 28)
      .collect().map(_.getLong(0)).toSet
    val a2 = Sample.temperature(df, "doc_id", "src", 0.5, 28)
      .collect().map(_.getLong(0)).toSet
    assert(a1 == a2)
    intercept[IllegalArgumentException](Sample.temperature(df, "doc_id", "src", 0.0, 10))
    intercept[IllegalArgumentException](Sample.temperature(df, "doc_id", "src", 0.5, 0))
  }

  test("PQ: codes pick the nearest codeword, ADC equals the table sum, recall") {
    import graft.ops.Ann
    // 4-dim vectors, m=2 subspaces of 2 dims, codebook seeded from ids 0..1
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),   // codeword source 0
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),   // codeword source 1
      (2L, Seq(0.9f, 0.1f, 0.9f, 0.1f)),   // sub0 -> code 0, sub1 -> code 1
      (3L, Seq(0.1f, 0.9f, 0.1f, 0.9f)))   // sub0 -> code 1, sub1 -> code 0
      .toDF("vec_id", "embedding")
    val cb = Ann.pqSeededCodebook(emb, "vec_id", "embedding", m = 2, nCodes = 2)
    assert(cb(0)(0).toSeq == Seq(1.0, 0.0) && cb(1)(1).toSeq == Seq(1.0, 0.0))
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(2L) == Seq(0, 1) && codes(3L) == Seq(1, 0))
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1))
    // ADC vs hand math for query [1, 0, 1, 0]:
    // table[0] = (dot([1,0],[1,0]), dot([1,0],[0,1])) = (1, 0)
    // table[1] = (dot([1,0],[0,1]), dot([1,0],[1,0])) = (0, 1)
    val got = Ann.pqTopK(Ann.pqEncode(emb, "vec_id", "embedding", cb),
        "vec_id", Seq(1.0, 0.0, 1.0, 0.0), cb, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) == 2.0 && got(3L) == 0.0) // codes (0,1) -> 1+1; (1,0) -> 0+0
    assert(got(0L) == 1.0 && got(1L) == 1.0)
    intercept[IllegalArgumentException](
      Ann.pqTopK(Ann.pqEncode(emb, "vec_id", "embedding", cb),
        "vec_id", Seq(1.0, 0.0), cb, 4))
  }

  test("int8 quantization: range, reconstruction bound, zero-vector handling, recall") {
    import graft.ops.Ann
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 30L).map(i => (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))) :+
      (31L, Seq.fill(8)(0.0))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = Ann.quantizeInt8(emb, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Byte](2))).toSeq
    val byId = vecs.toMap
    q.foreach { case (id, scale, qv) =>
      if (id == 31L) assert(scale == 0.0 && qv.forall(_ == 0))
      else {
        assert(qv.forall(b => b >= -127 && b <= 127))
        // reconstruction error bound: half a quantization step per element
        byId(id).zip(qv).foreach { case (v, b) =>
          assert(math.abs(b * scale - v) <= scale / 2 + 1e-12, s"id=$id")
        }
      }
    }
    val qv = (0 until 8).map(i => (i - 4) / 4.0)
    val got = Ann.int8CosineTopK(
      Ann.quantizeInt8(emb, "vec_id", "embedding"), "vec_id", qv, 5)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(31L)) // zero vector excluded
    // exact top-5 on the original floats: int8 recall stays high
    val qcol = org.apache.spark.sql.functions.array(qv.map(lit): _*)
    val exact = emb.where($"vec_id" =!= 31L)
      .select($"vec_id", Ann.cosine($"embedding", qcol).as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(5)
      .collect().map(_.getLong(0)).toSet
    assert((got & exact).size >= 4, s"int8=$got exact=$exact")
  }

  test("rank_eval: precision/recall/MRR/NDCG hand math + the no-relevant query") {
    import graft.ops.RankEval
    val topk = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val jd = Seq((1L, 11L, 2.0), (1L, 12L, 1.0), (1L, 99L, 3.0))
      .toDF("query_id", "doc_id", "grade")
    val got = RankEval.evaluate(topk, jd, 10).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def ~=(a: Double, b: Double) = math.abs(a - b) < 1e-9
    val (p1, r1, m1, n1, e1) = got(1L)
    assert(~=(p1, 2.0 / 3) && ~=(r1, 2.0 / 3) && ~=(m1, 0.5))
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    assert(~=(n1, dcg / idcg))
    // ERR cascade (gmax 2): grades 0, 2, 1 -> R = 0, 3/4, 1/4:
    // err = 0 + 1*(3/4)/2 + (1/4)*(1/4)/3
    assert(~=(e1, 3.0 / 8 + 1.0 / 48))
    assert(got(2L) == ((0.0, 0.0, 0.0, 0.0, 0.0)))
    val (pm, rm, mm, nm, em) = got(-1L)
    assert(~=(pm, p1 / 2) && ~=(rm, r1 / 2) && ~=(mm, 0.25) && ~=(nm, n1 / 2)
      && ~=(em, e1 / 2))
    intercept[IllegalArgumentException](RankEval.evaluate(topk, jd, 0))
    intercept[IllegalArgumentException](RankEval.evaluate(topk, jd, 10, 0))
  }

  test("has_child score modes + children bounds; has_parent score inheritance") {
    import graft.ops.ParentChild
    val children = Seq(
      (1L, 0L, "hash join x"),   // cs=2
      (1L, 1L, "hash y z"),      // cs=1
      (2L, 0L, "join join a"),   // cs=1 (distinct terms)
      (2L, 1L, "b c d"),         // no match
      (3L, 0L, "e f g"))         // no match
      .toDF("parent_id", "chunk_idx", "chunk")
    def run(mode: String, minC: Int = 1) =
      ParentChild.hasChild(children, "parent_id", "chunk",
          Seq("hash", "join"), mode, minChildren = minC)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(run("sum") == Set((1L, 3.0, 2L), (2L, 1.0, 1L)))
    assert(run("avg") == Set((1L, 1.5, 2L), (2L, 1.0, 1L)))
    assert(run("max") == Set((1L, 2.0, 2L), (2L, 1.0, 1L)))
    assert(run("min") == Set((1L, 1.0, 2L), (2L, 1.0, 1L)))
    assert(run("none") == Set((1L, 1.0, 2L), (2L, 1.0, 1L)))
    assert(run("sum", minC = 2) == Set((1L, 3.0, 2L)))
    intercept[IllegalArgumentException](run("prod"))
    intercept[IllegalArgumentException](
      ParentChild.hasChild(children, "parent_id", "chunk", Nil, "sum"))
    // has_parent: children of parent 1 inherit its score; score=false -> 1.0
    val parents = Seq((1L, 7.5)).toDF("parent_id", "score")
    val hp = ParentChild.hasParent(children, "parent_id", parents, withScore = true)
      .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Double]("score"))).toSet
    assert(hp == Set((0L, 7.5), (1L, 7.5)))
    val hpc = ParentChild.hasParent(children, "parent_id", parents, withScore = false)
      .collect().map(_.getAs[Double]("score")).toSet
    assert(hpc == Set(1.0))
  }

  test("percolate: msm gating, prohibited terms, validation") {
    import graft.query.Percolate, Percolate.Registered
    val docs = Seq(
      (1L, "hash join fast"),      // q1 (both terms), q3 (join, no hash? no — hash present)
      (2L, "join only here"),      // q3 (join, neither hash nor merge)
      (3L, "hash alone"),          // nothing (q1 needs 2 of 2)
      (4L, "merge join slow"))     // q2? merge only 1 of 2 -> no; q3 blocked by merge
      .toDF("doc_id", "text")
    val qs = Seq(
      Registered(1L, Seq("hash", "join"), 2),
      Registered(2L, Seq("merge", "sort"), 2),
      Registered(3L, Seq("join"), 1, notTerms = Seq("hash", "merge")))
    val got = Percolate.matches(spark, qs, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 3L)))
    intercept[IllegalArgumentException](Percolate.matches(spark, Nil, docs))
    intercept[IllegalArgumentException](
      Percolate.matches(spark, Seq(Registered(1L, Seq("a"), 2)), docs))
    intercept[IllegalArgumentException](
      Percolate.matches(spark,
        Seq(Registered(1L, Seq("a"), 1), Registered(1L, Seq("b"), 1)), docs))
  }

  test("completionSuggest: popularity order, fuzzy exact-prefix-first, validation") {
    import graft.index.InvertedIndex
    val idx = InvertedIndex.build(Seq(
      (1L, "hash join"), (2L, "hash merge join"), (3L, "hash hat"), (4L, "hat jolt")
    ).toDF("doc_id", "text"), "doc_id", "text")
    def run(p: String, f: Int = 0, size: Int = 5) =
      graft.query.Suggest.completionSuggest(idx, p, size, f)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    // plain prefix: weight (df) desc — hash df=3 above hat df=2
    assert(run("ha", size = 2) == Seq(("hash", 0, 3L), ("hat", 0, 2L)))
    // fuzzy: 1 edit on the typed prefix vs the same-length head, first char
    // fixed — join's head "joib"-distance is 1, jolt's is 2
    assert(run("joib", f = 1) == Seq(("join", 1, 2L)))
    // exact-prefix candidates rank ABOVE fuzzy ones regardless of weight:
    // jolt (dist 0, df 1) before join (dist 1, df 2)
    assert(run("jol", f = 1) == Seq(("jolt", 0, 1L), ("join", 1, 2L)))
    intercept[IllegalArgumentException](run(""))
    intercept[IllegalArgumentException](run("ha", f = 3))
    intercept[IllegalArgumentException](run("ha", size = 0))
  }

  test("phraseSuggest: candidates, channel priors, stupid-backoff bigram LM " +
    "— exact hand math") {
    import graft.index.{InvertedIndex, Positions}
    val docs = Seq((1L, "a b a c"), (2L, "b a"), (3L, "c c b a b"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    val pos = Positions.build(docs, "doc_id", "text")
    val got = graft.query.Suggest.phraseSuggest(idx, pos, "ab cb",
      maxEdits = 1, candidatesPerSlot = 2, size = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // slot "ab": corrections a, b (both dist 1, df 3 each, term asc);
    // slot "cb": b (df 3) then c (df 2). T=11, cnt(a)=4, cnt(b)=4, cnt(c)=3,
    // bigrams: (a,b)=2, (a,c)=1, (b,b)=0, (b,c)=0
    val pr = 2 * math.log((1 - 0.95) / 1)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      ("a b", pr + math.log(4.0 / 11) + math.log(2.0 / 4)),
      ("a c", pr + math.log(4.0 / 11) + math.log(1.0 / 4)),
      ("b b", pr + math.log(4.0 / 11) + math.log(0.4 * 4 / 11)),
      ("b c", pr + math.log(4.0 / 11) + math.log(0.4 * 3 / 11)))
      .map { case (t, s) => (t, r4(s)) }
    assert(got.map { case (t, s) => (t, r4(s)) } == want, s"got $got")
    // real-word slot keeps the original at the rwel prior AND generates
    // corrections (suggest_mode always)
    val rw = graft.query.Suggest.phraseSuggest(idx, pos, "a cb",
      maxEdits = 1, candidatesPerSlot = 1, size = 10)
      .collect().map(_.getString(0)).toSeq
    // slot "a": original (.95) + top-1 correction b; slot "cb": top-1 b
    assert(rw.toSet == Set("a b", "b b"), s"got $rw")
    assert(rw.head == "a b") // original 'a' at .95 prior + best LM path
    intercept[IllegalArgumentException] {
      graft.query.Suggest.phraseSuggest(idx, pos, "ab", maxEdits = 1)
    }
  }

  test("connectedComponents handles an empty pair list") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.ops.Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0L)
  }

  test("queryRescore: window combine per mode, unmatched keep qw*primary, tail order kept") {
    // primary ranking: docs 1..5 at 10, 8, 6, 4, 2
    val hits = Seq((1L, 10.0), (2L, 8.0), (3L, 6.0), (4L, 4.0), (5L, 2.0))
      .toDF("doc_id", "score")
    // secondary matches docs 2 (5.0) and 3 (20.0); window = top 3
    val sec = Seq((2L, 5.0), (3L, 20.0)).toDF("doc_id", "score")
    def run(mode: String, qw: Double = 1.0, rqw: Double = 2.0) =
      graft.ops.Rerank.queryRescore(hits, sec, windowSize = 3, k = 5, qw, rqw, mode)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // total: d1=10 (unmatched), d2=8+10=18, d3=6+40=46 -> window order 3,2,1;
    // tail 4,5 keeps original order and scores below the window
    assert(run("total") == Seq((3L, 46.0), (2L, 18.0), (1L, 10.0), (4L, 4.0), (5L, 2.0)))
    // multiply: d2=8*10=80, d3=6*40=240, d1 unmatched stays 10
    assert(run("multiply") == Seq((3L, 240.0), (2L, 80.0), (1L, 10.0), (4L, 4.0), (5L, 2.0)))
    // max with rqw=1: d3=max(6,20)=20, d2=max(8,5)=8, d1=10
    assert(run("max", rqw = 1.0) == Seq((3L, 20.0), (1L, 10.0), (2L, 8.0), (4L, 4.0), (5L, 2.0)))
    // min with rqw=1: d3=min(6,20)=6, d2=min(8,5)=5, d1=10
    assert(run("min", rqw = 1.0) == Seq((1L, 10.0), (3L, 6.0), (2L, 5.0), (4L, 4.0), (5L, 2.0)))
    // avg with rqw=1: d2=(8+5)/2=6.5, d3=(6+20)/2=13
    assert(run("avg", rqw = 1.0) == Seq((3L, 13.0), (1L, 10.0), (2L, 6.5), (4L, 4.0), (5L, 2.0)))
    // the tail never outranks the window even when its raw score is higher
    val lowWin = graft.ops.Rerank.queryRescore(hits,
        Seq((1L, -100.0)).toDF("doc_id", "score"), 1, 5, 1.0, 1.0, "total")
      .collect().map(_.getLong(0)).toSeq
    assert(lowWin == Seq(1L, 2L, 3L, 4L, 5L)) // d1 stays first: window group
    intercept[IllegalArgumentException](run("bogus"))
    intercept[IllegalArgumentException](
      graft.ops.Rerank.queryRescore(hits, sec, 0, 5))
  }

  test("collapseInnerHits: winner groups, in-group ranks, k/innerN bounds") {
    import spark.implicits._
    // groups: g1 = {1:9.0, 2:7.0, 3:5.0, 4:1.0}, g2 = {5:8.0, 6:2.0}, g3 = {7:3.0}
    val scored = Seq((1L, 9.0), (2L, 7.0), (3L, 5.0), (4L, 1.0),
      (5L, 8.0), (6L, 2.0), (7L, 3.0)).toDF("doc_id", "score")
    val groups = Seq((1L, "g1"), (2L, "g1"), (3L, "g1"), (4L, "g1"),
      (5L, "g2"), (6L, "g2"), (7L, "g3")).toDF("doc_id", "grp")
    val all = graft.ops.TopN.collapseInnerHits(scored, groups, "grp", k = 2, innerN = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // winners by best score: g1 (9.0), g2 (8.0) — g3 cut by k=2; each
    // winner group keeps its top-2 members with ranks
    assert(all == Set(
      ("g1", 1, 1L, 9.0), ("g1", 2, 2L, 7.0),
      ("g2", 1, 5L, 8.0), ("g2", 2, 6L, 2.0)))
    // innerN = 1 degenerates to plain collapse winners
    val winners = graft.ops.TopN.collapseInnerHits(scored, groups, "grp", 3, 1)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(winners == Set(("g1", 1L), ("g2", 5L), ("g3", 7L)))
    intercept[IllegalArgumentException](
      graft.ops.TopN.collapseInnerHits(scored, groups, "grp", 0, 1))
    intercept[IllegalArgumentException](
      graft.ops.TopN.collapseInnerHits(scored, groups, "grp", 1, 0))
  }
}
