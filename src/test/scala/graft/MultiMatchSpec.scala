package graft

import graft.hybrid.{BestFields, HybridSources, Lexical, LexicalMulti, MostFields}
import graft.index.InvertedIndex
import graft.query.{Bm25, BoolQuery, QueryDsl}
import graft.query.BoolQuery.BoolSpec

/** multi_match semantics on a two-field toy corpus: each field has its OWN
 *  postings/lengths/stats (Lucene's per-field inverted index), per-field
 *  boosts scale the field score, best_fields is dismax + tie_breaker,
 *  most_fields is the plain sum.
 *  title: doc 0 "a b" | 1 "b c" | 2 "c"     (field name "text" = primary)
 *  body:  doc 0 "c d" | 1 "a a d" | 2 "b"   (field name "body") */
class MultiMatchSpec extends SparkSpec {

  import spark.implicits._

  private lazy val titleIdx = InvertedIndex.build(
    Seq((0L, "a b"), (1L, "b c"), (2L, "c")).toDF("doc_id", "text"),
    "doc_id", "text")
  private lazy val bodyIdx = InvertedIndex.build(
    Seq((0L, "c d"), (1L, "a a d"), (2L, "b")).toDF("doc_id", "text"),
    "doc_id", "text")

  private lazy val src =
    HybridSources(titleIdx, fieldIdx = Map("body" -> bodyIdx))

  private def scoresOf(mm: graft.hybrid.MultiMatchType,
                       fields: Seq[(String, Double)],
                       terms: Seq[String]): Map[Long, Double] =
    BoolQuery.score(src, BoolSpec(must = Seq(LexicalMulti(fields, terms, mm))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def fieldScores(idx: graft.index.Index, terms: Seq[String]): Map[Long, Double] =
    Bm25.scoreTerms(idx, terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("most_fields sums per-field BM25 x boost; best_fields(0) is the max") {
    val terms = Seq("a", "b")
    val t = fieldScores(titleIdx, terms) // docs 0,1,2(b? no: title 2 = c) -> {0,1}
    val b = fieldScores(bodyIdx, terms)  // body: a in 1, b in 2 -> {1,2}
    def at(m: Map[Long, Double], d: Long) = m.getOrElse(d, 0.0)

    val most = scoresOf(MostFields, Seq("text" -> 1.0, "body" -> 2.0), terms)
    val best = scoresOf(BestFields(0.0), Seq("text" -> 1.0, "body" -> 2.0), terms)
    // matched set = union of the field matches
    assert(most.keySet == t.keySet.union(b.keySet))
    assert(best.keySet == most.keySet)
    most.keySet.foreach { d =>
      assert(math.abs(most(d) - (at(t, d) + 2.0 * at(b, d))) < 1e-12)
      assert(math.abs(best(d) - math.max(at(t, d), 2.0 * at(b, d))) < 1e-12)
    }
  }

  test("tie_breaker interpolates: tb=1 equals most_fields; 0<tb<1 strictly between") {
    val terms = Seq("a", "b", "c")
    val fields = Seq("text" -> 1.0, "body" -> 1.0)
    val most = scoresOf(MostFields, fields, terms)
    val tb1 = scoresOf(BestFields(1.0), fields, terms)
    val tb0 = scoresOf(BestFields(0.0), fields, terms)
    val mid = scoresOf(BestFields(0.4), fields, terms)
    most.keySet.foreach { d =>
      assert(math.abs(tb1(d) - most(d)) < 1e-12)
      assert(mid(d) >= tb0(d) - 1e-12 && mid(d) <= most(d) + 1e-12)
      // doc matching in both fields: strictly between
      if (math.abs(most(d) - tb0(d)) > 1e-9) {
        assert(mid(d) > tb0(d) && mid(d) < most(d))
      }
    }
  }

  test("single-field multi_match degenerates to the plain lexical clause") {
    val terms = Seq("a", "c")
    val plain = fieldScores(titleIdx, terms)
    val multi = scoresOf(BestFields(0.3), Seq("text" -> 1.0), terms)
    assert(multi.keySet == plain.keySet)
    multi.keySet.foreach(d => assert(math.abs(multi(d) - plain(d)) < 1e-12))
  }

  test("validation: unregistered field, bad boost, bad tie_breaker") {
    intercept[IllegalArgumentException] {
      scoresOf(MostFields, Seq("nope" -> 1.0), Seq("a"))
    }
    intercept[IllegalArgumentException] {
      scoresOf(MostFields, Seq("text" -> 0.0), Seq("a"))
    }
    intercept[IllegalArgumentException] {
      scoresOf(BestFields(1.5), Seq("text" -> 1.0), Seq("a"))
    }
  }

  test("DSL parse: caret boosts, type, tie_breaker; bad forms rejected") {
    val pb = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":{
        |  "query": "a b", "fields": ["text", "body^2.5"],
        |  "type": "best_fields", "tie_breaker": 0.3}}]}}}""".stripMargin)
    assert(pb.bool.must == Seq(LexicalMulti(
      Seq(("text", 1.0), ("body", 2.5)), Seq("a", "b"), BestFields(0.3))))

    // default type is best_fields with tie_breaker 0
    val dflt = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":{
        |  "query": "a", "fields": ["text"]}}]}}}""".stripMargin)
    assert(dflt.bool.must == Seq(LexicalMulti(
      Seq(("text", 1.0)), Seq("a"), BestFields(0.0))))

    def bad(q: String): Unit = intercept[IllegalArgumentException] {
      QueryDsl.parseBool(s"""{"query":{"bool":{"must":[{"multi_match":$q}]}}}""")
    }
    bad("""{"query": "a", "fields": []}""")
    bad("""{"query": "", "fields": ["text"]}""")
    bad("""{"query": "a", "fields": ["text"], "type": "fuzzy_fields"}""")
    bad("""{"query": "a", "fields": ["text"], "type": "most_fields", "tie_breaker": 0.3}""")
    bad("""{"query": "a", "fields": ["text"], "type": "cross_fields", "tie_breaker": 0.3}""")
  }

  test("combined_fields merges tf/dl/df into one pseudo-field before saturation") {
    import graft.hybrid.CombinedFields
    val titleDocs = Map(0L -> "a b", 1L -> "b c", 2L -> "c")
    val bodyDocs  = Map(0L -> "c d", 1L -> "a a d", 2L -> "b")
    val (wT, wB) = (1.0, 2.0)
    val terms = Seq("a", "b", "d")
    val n = 3.0
    def tf(docs: Map[Long, String], d: Long, t: String) =
      docs(d).split(' ').count(_ == t).toDouble
    def dl(docs: Map[Long, String], d: Long) = docs(d).split(' ').length.toDouble
    def df(docs: Map[Long, String], t: String) =
      docs.values.count(_.split(' ').contains(t)).toDouble
    val avgdlC = (titleDocs.keys.toSeq.map(dl(titleDocs, _)).sum * wT +
      bodyDocs.keys.toSeq.map(dl(bodyDocs, _)).sum * wB) / n
    def expected(d: Long): Double = terms.map { t =>
      val ctf = wT * tf(titleDocs, d, t) + wB * tf(bodyDocs, d, t)
      if (ctf == 0) 0.0
      else {
        val cdl = wT * dl(titleDocs, d) + wB * dl(bodyDocs, d)
        val mdf = math.max(df(titleDocs, t), df(bodyDocs, t))
        math.log(1 + (n - mdf + 0.5) / (mdf + 0.5)) *
          (ctf / (ctf + 1.2 * (1 - 0.75 + 0.75 * cdl / avgdlC)))
      }
    }.sum
    val got = scoresOf(CombinedFields(), Seq("text" -> wT, "body" -> wB), terms)
    // every doc matches at least one of a/b/d somewhere
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (d, s) => assert(math.abs(s - expected(d)) < 1e-9, s"doc $d") }

    // merged-tf saturation differs from most_fields' per-field saturation:
    // doc 1 has 'a' twice in body and zero in title — combined saturates
    // 2·2=4 merged occurrences ONCE, most_fields saturates per field
    val most = scoresOf(MostFields, Seq("text" -> wT, "body" -> wB), terms)
    assert(math.abs(got(1L) - most(1L)) > 1e-6)

    // msm gates on DISTINCT matched terms across the pseudo-field:
    // doc 2 matches only {b, c∉q} -> 1 term -> dropped at msm 2
    val gated = scoresOf(CombinedFields(2), Seq("text" -> wT, "body" -> wB), terms)
    assert(gated.keySet == Set(0L, 1L))
    gated.foreach { case (d, s) => assert(math.abs(s - expected(d)) < 1e-9) }
  }

  test("combined_fields validation + DSL parse") {
    import graft.hybrid.CombinedFields
    // Lucene rejects field weights < 1
    intercept[IllegalArgumentException] {
      scoresOf(CombinedFields(), Seq("text" -> 0.5), Seq("a"))
    }
    val pb = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"combined_fields":{
        |  "query": "a b", "fields": ["text", "body^2"],
        |  "operator": "and"}}]}}}""".stripMargin)
    assert(pb.bool.must == Seq(LexicalMulti(
      Seq(("text", 1.0), ("body", 2.0)), Seq("a", "b"), CombinedFields(2))))
    val msm = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"combined_fields":{
        |  "query": "a b c", "fields": ["text"],
        |  "minimum_should_match": 2}}]}}}""".stripMargin)
    assert(msm.bool.must == Seq(LexicalMulti(
      Seq(("text", 1.0)), Seq("a", "b", "c"), CombinedFields(2))))
    def bad(q: String): Unit = intercept[IllegalArgumentException] {
      QueryDsl.parseBool(s"""{"query":{"bool":{"must":[{"combined_fields":$q}]}}}""")
    }
    bad("""{"query": "a", "fields": []}""")
    bad("""{"query": "", "fields": ["text"]}""")
    bad("""{"query": "a", "fields": ["text"], "operator": "xor"}""")
    // msm under operator=and is contradictory — rejected like OpenSearch
    bad("""{"query": "a b", "fields": ["text"], "operator": "and",
          |  "minimum_should_match": 1}""".stripMargin)
  }

  test("cross_fields blends df to the max across fields; per-term best field wins") {
    import graft.hybrid.CrossFields
    val got = scoresOf(CrossFields, Seq("text" -> 1.0, "body" -> 2.0), Seq("a", "b"))
    def idf(df: Double, n: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Double, dl: Double, avg: Double) =
      tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg))
    val titleDl = Map(0L -> 2.0, 1L -> 2.0, 2L -> 1.0); val tAvg = 5.0 / 3
    val bodyDl = Map(0L -> 2.0, 1L -> 3.0, 2L -> 1.0); val bAvg = 2.0
    val titleTf = Map(("a", 0L) -> 1.0, ("b", 0L) -> 1.0, ("b", 1L) -> 1.0)
    val bodyTf = Map(("a", 1L) -> 2.0, ("b", 2L) -> 1.0)
    // blended df: a = max(1, 1) = 1, b = max(2, 1) = 2 — b scores with the
    // COMMON idf in the body field too, though its body df is 1
    val blend = Map("a" -> 1.0, "b" -> 2.0)
    def model(d: Long) = Seq("a", "b").map { t =>
      val ts = titleTf.get((t, d))
        .map(tf => 1.0 * idf(blend(t), 3) * tfn(tf, titleDl(d), tAvg)).getOrElse(0.0)
      val bs = bodyTf.get((t, d))
        .map(tf => 2.0 * idf(blend(t), 3) * tfn(tf, bodyDl(d), bAvg)).getOrElse(0.0)
      math.max(ts, bs)
    }.sum
    Seq(0L, 1L, 2L).foreach { d =>
      assert(math.abs(got.getOrElse(d, 0.0) - model(d)) < 1e-9, s"doc $d")
    }
    val p = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":
        |{"query":"a b","fields":["text","body^2"],"type":"cross_fields"}}]}}}""".stripMargin)
    assert(p.bool.must.head == LexicalMulti(
      Seq("text" -> 1.0, "body" -> 2.0), Seq("a", "b"), CrossFields))
  }

  test("type=phrase: per-field match_phrase under dis-max; slop routes to the sloppy matcher") {
    import graft.hybrid.PhraseFields
    import graft.index.Positions
    // phrase "a b": title matches docs 0,1 (adjacent), NOT 2 (reversed);
    // body matches docs 0 and 2 (twice in 2)
    val tDocs = Seq((0L, "a b x"), (1L, "x a b"), (2L, "b a")).toDF("doc_id", "text")
    val bDocs = Seq((0L, "a b y"), (1L, "y y"), (2L, "a b a b")).toDF("doc_id", "text")
    val tIdx = InvertedIndex.build(tDocs, "doc_id", "text")
    val bIdx = InvertedIndex.build(bDocs, "doc_id", "text")
    val tPos = Positions.build(tDocs, "doc_id", "text")
    val bPos = Positions.build(bDocs, "doc_id", "text")
    val s2 = HybridSources(tIdx, positions = Some(tPos),
      fieldIdx = Map("body" -> bIdx), fieldPositions = Map("body" -> bPos))
    val terms = Seq("a", "b")
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def at(mp: Map[Long, Double], d: Long) = mp.getOrElse(d, 0.0)
    val fields = Seq("text" -> 1.0, "body" -> 2.0)
    def got(tb: Double, slop: Int = 0): Map[Long, Double] =
      m(BoolQuery.score(s2, BoolSpec(must = Seq(
        LexicalMulti(fields, terms, PhraseFields(tb, slop))))))

    val t = m(graft.query.Phrase.score(tIdx, tPos, terms))
    val b = m(graft.query.Phrase.score(bIdx, bPos, terms))
    assert(t.keySet == Set(0L, 1L) && b.keySet == Set(0L, 2L))
    val g0 = got(0.0)
    assert(g0.keySet == Set(0L, 1L, 2L))
    g0.keySet.foreach { d =>
      assert(math.abs(g0(d) - math.max(at(t, d), 2.0 * at(b, d))) < 1e-12, s"doc $d")
    }
    val g3 = got(0.3)
    g3.keySet.foreach { d =>
      val (mx, sm) = (math.max(at(t, d), 2.0 * at(b, d)), at(t, d) + 2.0 * at(b, d))
      assert(math.abs(g3(d) - (mx + 0.3 * (sm - mx))) < 1e-12, s"doc $d")
    }
    // slop>0 routes each field through the SLOPPY matcher — the combined
    // result must equal per-field Phrase.sloppyScore under the same dis-max
    // (matcher semantics themselves are PhraseSpec's brute-forced ground)
    val ts = m(graft.query.Phrase.sloppyScore(tIdx, tPos, terms, 2))
    val bs = m(graft.query.Phrase.sloppyScore(bIdx, bPos, terms, 2))
    val gs = got(0.0, slop = 2)
    assert(gs.keySet == ts.keySet.union(bs.keySet))
    gs.keySet.foreach { d =>
      assert(math.abs(gs(d) - math.max(at(ts, d), 2.0 * at(bs, d))) < 1e-12, s"doc $d")
    }
    // DSL parse + validation: positional blocks required per field
    val pp = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":
        |{"query":"a b","fields":["text","body^2"],"type":"phrase",
        | "tie_breaker":0.3,"slop":1}}]}}}""".stripMargin)
    assert(pp.bool.must.head == LexicalMulti(
      Seq("text" -> 1.0, "body" -> 2.0), Seq("a", "b"), PhraseFields(0.3, 1)))
    intercept[IllegalArgumentException] {
      BoolQuery.score(HybridSources(tIdx, positions = Some(tPos),
        fieldIdx = Map("body" -> bIdx)),
        BoolSpec(must = Seq(LexicalMulti(fields, terms, PhraseFields()))))
    }
  }

  test("type=phrase_prefix: the prefix expands against each field's own dictionary") {
    import graft.hybrid.PhrasePrefixFields
    import graft.index.Positions
    // "a ba…": title expands ba -> {bar, bat}, body expands ba -> {bat}
    val tDocs = Seq((0L, "a bat"), (1L, "a bar"), (2L, "bat a")).toDF("doc_id", "text")
    val bDocs = Seq((0L, "a box"), (1L, "a bat"), (2L, "z z")).toDF("doc_id", "text")
    val tIdx = InvertedIndex.build(tDocs, "doc_id", "text")
    val bIdx = InvertedIndex.build(bDocs, "doc_id", "text")
    val tPos = Positions.build(tDocs, "doc_id", "text")
    val bPos = Positions.build(bDocs, "doc_id", "text")
    val s2 = HybridSources(tIdx, positions = Some(tPos),
      fieldIdx = Map("body" -> bIdx), fieldPositions = Map("body" -> bPos))
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def at(mp: Map[Long, Double], d: Long) = mp.getOrElse(d, 0.0)
    val fields = Seq("text" -> 1.0, "body" -> 2.0)
    val t = m(graft.query.Phrase.phrasePrefixScore(tIdx, tPos, Seq("a"), "ba", 10))
    val b = m(graft.query.Phrase.phrasePrefixScore(bIdx, bPos, Seq("a"), "ba", 10))
    assert(t.keySet == Set(0L, 1L) && b.keySet == Set(1L))
    val got = m(BoolQuery.score(s2, BoolSpec(must = Seq(
      LexicalMulti(fields, Seq("a", "ba"), PhrasePrefixFields(0.3, 10))))))
    assert(got.keySet == Set(0L, 1L))
    got.keySet.foreach { d =>
      val (mx, sm) = (math.max(at(t, d), 2.0 * at(b, d)), at(t, d) + 2.0 * at(b, d))
      assert(math.abs(got(d) - (mx + 0.3 * (sm - mx))) < 1e-12, s"doc $d")
    }
    // maxExpansions binds per field: at 1, title's expansion set is {bar}
    // (term order), so only the a-bar doc matches the title side
    val t1 = m(graft.query.Phrase.phrasePrefixScore(tIdx, tPos, Seq("a"), "ba", 1))
    assert(t1.keySet == Set(1L))
    val got1 = m(BoolQuery.score(s2, BoolSpec(must = Seq(
      LexicalMulti(fields, Seq("a", "ba"), PhrasePrefixFields(0.0, 1))))))
    got1.keySet.foreach { d =>
      assert(math.abs(got1(d) - math.max(at(t1, d), 2.0 * at(b, d))) < 1e-12, s"doc $d")
    }
    val pp = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":
        |{"query":"a ba","fields":["text","body^2"],"type":"phrase_prefix",
        | "max_expansions":7,"tie_breaker":0.2}}]}}}""".stripMargin)
    assert(pp.bool.must.head == LexicalMulti(
      Seq("text" -> 1.0, "body" -> 2.0), Seq("a", "ba"), PhrasePrefixFields(0.2, 7)))
  }

  test("type=bool_prefix: leading tokens score, last is a constant prefix " +
    "per field's own dictionary, fields dis-max") {
    import graft.hybrid.BoolPrefixFields
    // query "a d" -> lead term "a" (scored), prefix "d%" (constant 1).
    // title dictionary: {a,b,c} — d% matches nothing;
    // body dictionary: {a,b,c,d} — d in body docs 0 and 1.
    val terms = Seq("a", "d")
    val tLead = fieldScores(titleIdx, Seq("a")) // title: doc 0
    val bLead = fieldScores(bodyIdx, Seq("a"))  // body: doc 1
    val bPref = Set(0L, 1L)                     // body docs containing d
    val boost = 2.0
    def fieldScore(lead: Map[Long, Double], pref: Set[Long], b: Double): Map[Long, Double] =
      (lead.keySet ++ pref).map { id =>
        id -> (lead.getOrElse(id, 0.0) + (if (pref(id)) 1.0 else 0.0)) * b
      }.toMap
    val t = fieldScore(tLead, Set.empty, 1.0)
    val b = fieldScore(bLead, bPref, boost)
    val tb = 0.3
    val want = (t.keySet ++ b.keySet).map { id =>
      val ts = t.getOrElse(id, 0.0); val bs = b.getOrElse(id, 0.0)
      val mx = math.max(ts, bs)
      id -> (mx + tb * (ts + bs - mx))
    }.toMap
    val got = scoresOf(BoolPrefixFields(tb),
      Seq("text" -> 1.0, "body" -> boost), terms)
    assert(got.keySet == want.keySet, s"got $got want $want")
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-9, s"doc $id: got $s want ${want(id)}")
    }
    // single-token query: prefix only — matched set is the prefix set
    val gotP = scoresOf(BoolPrefixFields(0.0), Seq("body" -> 1.0), Seq("d"))
    assert(gotP == Map(0L -> 1.0, 1L -> 1.0))
    // DSL parse
    val bp = QueryDsl.parseBool(
      """{"query":{"bool":{"must":[{"multi_match":
        |{"query":"a d","fields":["text","body^2"],"type":"bool_prefix",
        | "tie_breaker":0.3}}]}}}""".stripMargin)
    assert(bp.bool.must.head == LexicalMulti(
      Seq("text" -> 1.0, "body" -> 2.0), Seq("a", "d"), BoolPrefixFields(0.3)))
  }
}
