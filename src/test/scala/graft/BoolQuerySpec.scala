package graft

import graft.hybrid.{Hybrid, HybridQuery, HybridSources, Lexical, SubQuery, TermsSetFieldQ}
import graft.index.InvertedIndex
import graft.query.{Bm25, BoolQuery, QueryDsl}
import graft.query.BoolQuery.BoolSpec

/** Scoring bool semantics on a tiny corpus with hand-checkable postings:
 *  doc 0: a b a c | doc 1: a b | doc 2: c d | doc 3: d d e | doc 4: e a c */
class BoolQuerySpec extends SparkSpec {

  import spark.implicits._

  private lazy val idx = InvertedIndex.build(
    Seq(
      (0L, "a b a c"),
      (1L, "a b"),
      (2L, "c d"),
      (3L, "d d e"),
      (4L, "e a c")
    ).toDF("doc_id", "text"), "doc_id", "text")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("must is an intersection; score sums the matching clauses") {
    // must: a AND c -> docs {0, 4}
    val r = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Lexical(Seq("a")), Lexical(Seq("c")))), 10)
    assert(ids(r).toSet == Set(0L, 4L))
    // per-doc score = bm25(a) + bm25(c), cross-checked against the
    // single-clause scorers
    val a = Bm25.scoreTerms(idx, Seq("a"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val c = Bm25.scoreTerms(idx, Seq("c"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.collect().foreach { row =>
      val d = row.getLong(0)
      assert(math.abs(row.getDouble(1) - (a(d) + c(d))) < 1e-12)
    }
  }

  test("should adds score but does not gate when must is present") {
    // must: a -> {0, 1, 4}; should: d matches none of them except... d -> {2, 3}
    val r = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Lexical(Seq("a"))), should = Seq(Lexical(Seq("b")))), 10)
    assert(ids(r).toSet == Set(0L, 1L, 4L))
    // docs 0 and 1 (contain b) must outscore their must-only baseline
    val aOnly = Bm25.scoreTerms(idx, Seq("a"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val scores = r.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(scores(0L) > aOnly(0L) && scores(1L) > aOnly(1L))
    assert(math.abs(scores(4L) - aOnly(4L)) < 1e-12) // no b in doc 4
  }

  test("must_not excludes matching docs and never scores") {
    // must: a -> {0, 1, 4}; must_not: b -> {0, 1}; result {4}
    val r = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Lexical(Seq("a"))), mustNot = Seq(Lexical(Seq("b")))), 10)
    assert(ids(r) == Seq(4L))
  }

  test("minimum_should_match: default 1 when should-only, explicit m gates") {
    // should: a {0,1,4}, d {2,3} — default msm=1 -> union
    val union = BoolQuery.topK(HybridSources(idx),
      BoolSpec(should = Seq(Lexical(Seq("a")), Lexical(Seq("d")))), 10)
    assert(ids(union).toSet == Set(0L, 1L, 2L, 3L, 4L))
    // msm=2 -> docs matching both a and d: none
    val both = BoolQuery.topK(HybridSources(idx),
      BoolSpec(should = Seq(Lexical(Seq("a")), Lexical(Seq("d"))),
        minimumShouldMatch = Some(2)), 10)
    assert(ids(both).isEmpty)
    // msm=2 of {a, c, e}: docs matching at least two -> {0, 4} (a+c / e+a+c)
    val two = BoolQuery.topK(HybridSources(idx),
      BoolSpec(should = Seq(Lexical(Seq("a")), Lexical(Seq("c")), Lexical(Seq("e"))),
        minimumShouldMatch = Some(2)), 10)
    assert(ids(two).toSet == Set(0L, 4L))
  }

  test("must_not-only bool runs in filter context: excluded set removed, score 0") {
    // must_not: a -> {0, 1, 4}; universe minus that = {2, 3}, all score 0.0
    val r = BoolQuery.topK(HybridSources(idx),
      BoolSpec(mustNot = Seq(Lexical(Seq("a")))), 10).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(r.forall(_.getDouble(1) == 0.0))
  }

  test("empty bool and out-of-range msm are rejected") {
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx), BoolSpec(), 10)
    }
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx),
        BoolSpec(should = Seq(Lexical(Seq("a"))), minimumShouldMatch = Some(2)), 10)
    }
  }

  test("match_all scores every doc at boost; nested bool gates and sums") {
    import graft.hybrid.{BoolSub, MatchAll}
    val all = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(MatchAll(2.0)), mustNot = Seq(Lexical(Seq("e")))), 10)
      .collect()
    // universe {0..4} minus e-docs {3, 4}
    assert(all.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(all.forall(_.getDouble(1) == 2.0))

    // nested bool in must: (b OR d) gate; outer should adds a's score
    val nested = BoolQuery.topK(HybridSources(idx),
      BoolSpec(
        must = Seq(BoolSub(should = Seq(Lexical(Seq("b")), Lexical(Seq("d"))))),
        should = Seq(Lexical(Seq("a")))), 10)
    val got = nested.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // b -> {0,1}, d -> {2,3}; a adds on {0,1}
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    val b = Bm25.scoreTerms(idx, Seq("b"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val a = Bm25.scoreTerms(idx, Seq("a"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(got(0L) - (b(0L) + a(0L))) < 1e-12)
    assert(math.abs(got(1L) - (b(1L) + a(1L))) < 1e-12)
  }

  test("filter context: required but non-scoring; should msm defaults to 0 with a filter") {
    import graft.hybrid.BoolSub
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = m(Bm25.scoreTerms(idx, Seq("a"), Map.empty))
    val b = m(Bm25.scoreTerms(idx, Seq("b"), Map.empty))
    // must a + filter c: intersection {0,4}, score = a alone (c unscored)
    val f1 = m(BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Lexical(Seq("a"))), filter = Seq(Lexical(Seq("c")))), 10))
    assert(f1.keySet == Set(0L, 4L))
    f1.foreach { case (d, s) => assert(math.abs(s - a(d)) < 1e-12, s"doc $d") }
    // with a filter present, a bare should drops to msm 0 (Lucene's
    // documented default): every c-doc matches, b adds score where it hits
    val f2 = m(BoolQuery.topK(HybridSources(idx),
      BoolSpec(should = Seq(Lexical(Seq("b"))), filter = Seq(Lexical(Seq("c")))), 10))
    assert(f2.keySet == Set(0L, 2L, 4L))
    assert(math.abs(f2(0L) - b(0L)) < 1e-12 && f2(2L) == 0.0 && f2(4L) == 0.0)
    // explicit msm = 1 restores the should gate
    val f3 = BoolQuery.topK(HybridSources(idx),
      BoolSpec(should = Seq(Lexical(Seq("b"))), filter = Seq(Lexical(Seq("c"))),
        minimumShouldMatch = Some(1)), 10)
    assert(ids(f3) == Seq(0L))
    // filter-only bool: the matched set at score 0.0
    val f4 = BoolQuery.topK(HybridSources(idx),
      BoolSpec(filter = Seq(Lexical(Seq("c")))), 10).collect()
    assert(f4.map(_.getLong(0)).toSet == Set(0L, 2L, 4L))
    assert(f4.forall(_.getDouble(1) == 0.0))
    // nested bool with filter parses into the FILTER occur
    val p = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"bool":{
        |"should":[{"match":{"text":"a"}}],
        |"filter":[{"term":{"text":"c"}}]}}]}}}""".stripMargin)
    assert(p.bool.must.head == BoolSub(
      should = Seq(Lexical(Seq("a"))), filter = Seq(Lexical(Seq("c")))))
  }

  test("match msm gate: operator-and requires every term, msm=m at least m") {
    import graft.hybrid.LexicalMsm
    // and-semantics: a AND c -> {0, 4}; score still the full OR-sum
    val and = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(LexicalMsm(Seq("a", "c"), 2))), 10)
    assert(and.collect().map(_.getLong(0)).toSet == Set(0L, 4L))
    // msm=2 of (a, c, e): {0 (a,c), 4 (a,c,e)}
    val msm = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(LexicalMsm(Seq("a", "c", "e"), 2))), 10)
    assert(msm.collect().map(_.getLong(0)).toSet == Set(0L, 4L))
    // a term absent from the index can never satisfy and-semantics
    val none = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(LexicalMsm(Seq("a", "zzz"), 2))), 10)
    assert(none.collect().isEmpty)
  }

  test("term pattern matches are constant-score, deduped across expanded terms") {
    import graft.hybrid.{ConstantScore, TermPattern}
    // LIKE 'a%' | corpus a-terms: just "a" -> docs {0, 1, 4}, each 1.0
    val pre = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(TermPattern("a%"))), 10).collect()
    assert(pre.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    assert(pre.forall(_.getDouble(1) == 1.0))
    // multi-term expansion dedup: its own index with composite terms —
    // 'ca%' matches cat AND car; doc 0 holds both -> exactly one row
    import spark.implicits._
    val idx2 = InvertedIndex.build(
      Seq((0L, "cat car"), (1L, "car"), (2L, "dog")).toDF("doc_id", "text"),
      "doc_id", "text")
    val multi = BoolQuery.topK(HybridSources(idx2),
      BoolSpec(must = Seq(TermPattern("ca%", 2.0))), 10).collect()
    assert(multi.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(multi.forall(_.getDouble(1) == 2.0))
    // constant_score flattens a scored clause to the boost
    val cs = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(ConstantScore(Lexical(Seq("a", "c")), 1.5))), 10).collect()
    assert(cs.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L))
    assert(cs.forall(_.getDouble(1) == 1.5))
    // all-wildcard pattern rejected (that's a match_all)
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx), BoolSpec(must = Seq(TermPattern("%"))), 10)
    }
  }

  test("fuzzy transpositions: Damerau counts an adjacent swap as one edit") {
    import graft.functions.StringMath
    import graft.hybrid.Fuzzy
    // fixtures incl. the probe cases the DuckDB oracle was checked against
    assert(StringMath.damerau("ca", "abc") == 2)    // unrestricted, not OSA(3)
    assert(StringMath.damerau("hte", "the") == 1)
    assert(StringMath.damerau("ahsh", "hash") == 1)
    assert(StringMath.damerau("abc", "abc") == 0)
    assert(StringMath.damerau("", "ab") == 2)
    assert(StringMath.damerau("ab", "") == 2)
    assert(StringMath.damerau("fast", "fats") == 1)
    assert(StringMath.damerau("abcd", "badc") == 2)
    // brute-force model: BFS over single edit ops (ins/del/sub/adjacent
    // transposition) on the evolving string — the operational definition
    // of unrestricted Damerau-Levenshtein
    def bfs(a: String, b: String, cap: Int): Int = {
      val alpha = "abc"
      var frontier = Set(a)
      val seen = scala.collection.mutable.Set(a)
      var d = 0
      while (d <= cap) {
        if (frontier.contains(b)) return d
        val next = scala.collection.mutable.Set.empty[String]
        for (s <- frontier) {
          val edits =
            (0 to s.length).flatMap(i => alpha.map(c => s.take(i) + c + s.drop(i))) ++
            s.indices.map(i => s.take(i) + s.drop(i + 1)) ++
            s.indices.flatMap(i => alpha.map(c => s.take(i) + c + s.drop(i + 1))) ++
            (0 until s.length - 1).map(i =>
              s.take(i) + s(i + 1) + s(i) + s.drop(i + 2))
          edits.filter(e => e.length <= b.length + cap && !seen(e))
            .foreach { e => seen += e; next += e }
        }
        frontier = next.toSet
        d += 1
      }
      cap + 1
    }
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(5))("abc"(rnd.nextInt(3))).mkString
      val b = Seq.fill(rnd.nextInt(5))("abc"(rnd.nextInt(3))).mkString
      val want = bfs(a, b, 3)
      val got = StringMath.damerau(a, b)
      assert(got == want || (want == 4 && got >= 4), s"[$a] [$b] got=$got want=$want")
    }
    // expansion-set divergence: "hte"~1 reaches "the" ONLY with
    // transpositions (the Lucene default); classic Levenshtein needs 2
    val docs = Seq((0L, "the end"), (1L, "eth coin"), (2L, "tea time"))
      .toDF("doc_id", "text")
    val i2 = InvertedIndex.build(docs, "doc_id", "text")
    val osa = BoolQuery.topK(HybridSources(i2),
      BoolSpec(must = Seq(Fuzzy("hte", 1))), 10).collect().map(_.getLong(0)).toSet
    assert(osa == Set(0L))
    val classic = BoolQuery.topK(HybridSources(i2),
      BoolSpec(must = Seq(Fuzzy("hte", 1, transpositions = false))), 10)
      .collect()
    assert(classic.isEmpty)
  }

  test("dis_max takes the best clause + tie_breaker; boosting demotes; fuzzy expands") {
    import graft.hybrid.{Boosting, DisMax, Fuzzy}
    val a = Bm25.scoreTerms(idx, Seq("a"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val d = Bm25.scoreTerms(idx, Seq("d"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    def at(m: Map[Long, Double], k: Long) = m.getOrElse(k, 0.0)

    // dis_max(a, d) tb=0.25: union matched; max + 0.25 * others
    val dm = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(DisMax(Seq(Lexical(Seq("a")), Lexical(Seq("d"))), 0.25))), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dm.keySet == a.keySet.union(d.keySet))
    dm.keySet.foreach { k =>
      val (mx, sm) = (math.max(at(a, k), at(d, k)), at(a, k) + at(d, k))
      assert(math.abs(dm(k) - (mx + 0.25 * (sm - mx))) < 1e-12)
    }

    // boosting(positive=a, negative=b, nb=0.5): matched set == a's; b-docs halved
    val bs = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Boosting(Lexical(Seq("a")), Lexical(Seq("b")), 0.5))), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bs.keySet == a.keySet)
    // docs 0, 1 contain b -> demoted; doc 4 does not
    assert(math.abs(bs(0L) - a(0L) * 0.5) < 1e-12)
    assert(math.abs(bs(1L) - a(1L) * 0.5) < 1e-12)
    assert(math.abs(bs(4L) - a(4L)) < 1e-12)

    // fuzzy: 1 edit from "ab" reaches terms a and b -> docs {0,1,4} ∪ {0,1}
    val fz = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Fuzzy("ab", 1, 2.0))), 10).collect()
    assert(fz.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    assert(fz.forall(_.getDouble(1) == 2.0))
    // fuzziness 0 of an unindexed term matches nothing
    assert(BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Fuzzy("zz", 0))), 10).collect().isEmpty)
    // fuzziness outside Lucene's [0, 2] bound is rejected at validation
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx), BoolSpec(must = Seq(Fuzzy("ab", 3))), 10)
    }
  }

  test("DSL parse: bool with must/should/must_not/minimum_should_match") {
    val pb = QueryDsl.parseBool(
      """{"query":{"bool":{
        |  "must":     [{"match":{"text":"a c"}}],
        |  "should":   {"term":{"text":"b"}},
        |  "must_not": [{"term":{"text":"d"}}],
        |  "minimum_should_match": 0,
        |  "filter":   {"term":{"lang":"en"}}}},
        |"size": 7}""".stripMargin)
    assert(pb.bool.must == Seq(Lexical(Seq("a", "c"))))
    assert(pb.bool.should == Seq(Lexical(Seq("b"))))
    assert(pb.bool.mustNot == Seq(Lexical(Seq("d"))))
    assert(pb.bool.minimumShouldMatch.contains(0))
    assert(pb.filters == Seq(("lang", "en")))
    assert(pb.k == 7)
  }

  test("more_like_this selects the doc's terms and excludes the source doc") {
    import graft.hybrid.MoreLikeThisQ
    // doc 0 = "a b a c": tf(a)=2 passes min_term_freq=2; a's df=3 passes
    // min_doc_freq=3 -> selected terms = {a}; msm = max(1, floor(0.3*1)) = 1
    val src = HybridSources(idx,
      fields = Some(Seq((0L, "a b a c"), (1L, "a b"), (2L, "c d"),
        (3L, "d d e"), (4L, "e a c")).toDF("doc_id", "text")))
    val r = BoolQuery.topK(src,
      BoolSpec(must = Seq(MoreLikeThisQ(0L, minTermFreq = 2, minDocFreq = 3))), 10)
      .collect()
    // a-docs {0, 1, 4} minus the source doc 0
    assert(r.map(_.getLong(0)).toSet == Set(1L, 4L))
    val a = Bm25.scoreTerms(idx, Seq("a"), Map.empty).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.foreach(row => assert(math.abs(row.getDouble(1) - a(row.getLong(0))) < 1e-12))
    // unknown like-doc fails fast; missing fields source fails fast
    intercept[IllegalArgumentException] {
      BoolQuery.topK(src, BoolSpec(must = Seq(MoreLikeThisQ(99L))), 10)
    }
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx), BoolSpec(must = Seq(MoreLikeThisQ(0L))), 10)
    }
  }

  test("a bare top-level leaf query executes as an implicit single-must bool") {
    val docs = Seq((0L, "x")).toDF("doc_id", "src")
    val plain = QueryDsl.execute(HybridSources(idx),
      """{"query": {"term": {"text": "a"}}, "size": 10}""", docs)
    val viaBool = QueryDsl.execute(HybridSources(idx),
      """{"query": {"bool": {"must": [{"term": {"text": "a"}}]}}, "size": 10}""", docs)
    assert(plain.collect().toSeq == viaBool.collect().toSeq)
  }

  test("DSL execute routes query.bool to the bool engine") {
    val docs = Seq((0L, "x"), (1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"))
      .toDF("doc_id", "src")
    val r = QueryDsl.execute(HybridSources(idx),
      """{"query":{"bool":{
        |  "must": [{"term":{"text":"a"}}],
        |  "must_not": [{"term":{"text":"b"}}]}},
        |"size": 10}""".stripMargin, docs)
    assert(ids(r) == Seq(4L))
  }

  test("regexp anchors the whole term and rejects non-portable syntax") {
    val words = InvertedIndex.build(Seq(
      (0L, "scan hash"), (1L, "scala dup"), (2L, "duplicate join")
    ).toDF("doc_id", "text"), "doc_id", "text")
    val src = HybridSources(words)
    def run(p: String) = ids(BoolQuery.topK(src,
      BoolSpec(must = Seq(graft.hybrid.RegexPattern(p))), 10)).toSet
    assert(run("du[a-z]*") == Set(1L, 2L))
    // whole-term: "sca." matches scan (4 chars) but NOT scala — an
    // unanchored engine would match scala's prefix too
    assert(run("sca.") == Set(0L))
    assert(run("(hash|join)") == Set(0L, 2L))
    // invalid syntax and non-portable constructs fail at validation
    intercept[IllegalArgumentException] {
      BoolQuery.topK(src, BoolSpec(must = Seq(graft.hybrid.RegexPattern("(a"))), 10)
    }
    intercept[IllegalArgumentException] {
      BoolQuery.topK(src, BoolSpec(must = Seq(graft.hybrid.RegexPattern("a{2}"))), 10)
    }
  }

  test("exists matches exactly the docs whose field produced tokens") {
    val docs = Seq((0L, "a b", "p q"), (1L, "a", ""), (2L, "c", "r"))
      .toDF("doc_id", "text", "path")
    val ti = InvertedIndex.build(docs, "doc_id", "text")
    val pi = InvertedIndex.build(docs, "doc_id", "path")
    val src = HybridSources(ti, fieldIdx = Map("path" -> pi))
    // doc 1's path analyzed to zero tokens -> it does not exist
    val r = BoolQuery.topK(src,
      BoolSpec(must = Seq(graft.hybrid.ExistsQ("path"))), 10)
    assert(ids(r).toSet == Set(0L, 2L))
    val r2 = BoolQuery.topK(src,
      BoolSpec(must = Seq(graft.hybrid.ExistsQ("text"))), 10)
    assert(ids(r2).toSet == Set(0L, 1L, 2L))
    // a field with no registered index fails fast
    intercept[IllegalArgumentException] {
      BoolQuery.topK(src, BoolSpec(must = Seq(graft.hybrid.ExistsQ("nope"))), 10)
    }
  }

  test("terms_set: per-doc msm gate from a field, <=1 degrades, unmatchable need") {
    // corpus: 0 -> {a,b,c}, 1 -> {a,b}, 2 -> {c,d}, 3 -> {d,e}, 4 -> {e,a,c}
    // query terms {a, b, c}; matched distinct counts: 0->3, 1->2, 2->1, 4->2
    def fields(needs: Map[Long, Long]) =
      needs.toSeq.toDF("doc_id", "required_matches")
    def run(needs: Map[Long, Long]): Map[Long, Double] =
      BoolQuery.topK(
        HybridSources(idx, fields = Some(fields(needs))),
        BoolSpec(must = Seq(TermsSetFieldQ(Seq("a", "b", "c"), "required_matches"))), 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // per-doc needs: doc 0 needs 3 (has 3 ✓), doc 1 needs 3 (has 2 ✗),
    // doc 2 needs 1 (has 1 ✓), doc 4 needs 2 (has 2 ✓)
    val got = run(Map(0L -> 3L, 1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    assert(got.keySet == Set(0L, 2L, 4L))
    // the score is the plain BM25 sum over matching terms — identical to
    // the ungated match for qualifying docs
    val plain = BoolQuery.topK(HybridSources(idx),
      BoolSpec(must = Seq(Lexical(Seq("a", "b", "c")))), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, s) => assert(math.abs(s - plain(id)) < 1e-12) }
    // need <= 1 degrades to >= 1 (docs only enter through a matching term)
    assert(run(Map(0L -> 0L, 1L -> -5L, 2L -> 1L, 3L -> 0L, 4L -> 1L)).keySet
      == Set(0L, 1L, 2L, 4L))
    // a need above the distinct term count can never be met
    assert(run(Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L)).isEmpty)
    // validation: fields source required, non-empty analyzed terms
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx),
        BoolSpec(must = Seq(TermsSetFieldQ(Seq("a"), "required_matches"))), 10)
    }
    intercept[IllegalArgumentException] {
      BoolQuery.topK(HybridSources(idx, fields = Some(fields(Map(0L -> 1L)))),
        BoolSpec(must = Seq(TermsSetFieldQ(Nil, "required_matches"))), 10)
    }
  }

  test("span_near validation: positions source, term count, slop bounds") {
    val posSrc = HybridSources(idx,
      positions = Some(graft.index.Positions.build(
        Seq((0L, "a b a c"), (1L, "a b"), (2L, "c d"), (3L, "d d e"),
          (4L, "e a c")).toDF("doc_id", "text"), "doc_id", "text")))
    intercept[IllegalArgumentException] { // no positions registered
      BoolQuery.topK(HybridSources(idx),
        BoolSpec(must = Seq(graft.hybrid.SpanNearQ(Seq("a", "b"), 1, inOrder = true))), 10)
    }
    intercept[IllegalArgumentException] { // 1 term
      BoolQuery.topK(posSrc,
        BoolSpec(must = Seq(graft.hybrid.SpanNearQ(Seq("a"), 1, inOrder = true))), 10)
    }
    intercept[IllegalArgumentException] { // negative slop
      BoolQuery.topK(posSrc,
        BoolSpec(must = Seq(graft.hybrid.SpanNearQ(Seq("a", "b"), -1, inOrder = true))), 10)
    }
    // and the DSL parse path end-to-end: ordered a..c within slop 1
    // (doc 0 "a b a c": a@2, c@3 -> width 2 - 2 = 0 <= 1; doc 4 "e a c")
    val r = QueryDsl.execute(posSrc,
      """{"query":{"bool":{"must":[{"span_near":{
        |  "clauses":[{"span_term":{"text":"a"}},{"span_term":{"text":"c"}}],
        |  "slop":1,"in_order":true}}]}},"size":10}""".stripMargin,
      Seq((0L, "x")).toDF("doc_id", "src"))
    assert(ids(r).toSet == Set(0L, 4L))
    intercept[IllegalArgumentException] { // slop is required
      QueryDsl.parse(
        """{"query":{"bool":{"must":[{"span_near":{
          |  "clauses":[{"span_term":{"text":"a"}},{"span_term":{"text":"c"}}],
          |  "in_order":true}}]}}}""".stripMargin)
    }
  }
}
