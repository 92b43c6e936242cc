package graft

import graft.hybrid._
import graft.index.InvertedIndex
import graft.query.{Bm25, BoolQuery}

/**
 * Randomized model check for the whole clause algebra: random corpora and
 * random (nested) bool queries, compared against a first-principles Scala
 * model that recomputes BM25 and the bool/dis_max/boosting/fuzzy/span/
 * terms-set semantics
 * from the tokenized docs directly — an independent reference implementation
 * next to the DuckDB oracle, exercising clause SHAPES the fixed entries
 * never compose (nested dis_max inside must_not, fuzzy under boosting, ...).
 * Seeded, so failures replay deterministically.
 */
class BoolModelSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(20260818L)
  private val vocab =
    Vector("a", "b", "c", "d", "e", "ab", "bc", "cde", "zz")

  // ---- first-principles model -------------------------------------------

  private class Model(docs: Map[Long, Seq[String]],
                      head: Map[Long, Seq[String]]) {
    val n: Long = docs.size.toLong
    val dl: Map[Long, Int] = docs.map { case (k, v) => k -> v.size }
    val avgdl: Double = dl.values.sum.toDouble / n
    val df: Map[String, Long] = docs.values.toSeq.flatMap(_.distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    private val dfH: Map[String, Long] = head.values.toSeq.flatMap(_.distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    private def toksOf(f: String, id: Long): Seq[String] =
      if (f == "text") docs(id) else head(id)
    private def dfOf(f: String): Map[String, Long] =
      if (f == "text") df else dfH

    private def likeMatch(pattern: String, term: String): Boolean = {
      val re = pattern.flatMap {
        case '%' => ".*"
        case '_' => "."
        case c   => java.util.regex.Pattern.quote(c.toString)
      }
      term.matches(re)
    }

    private def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }

    /** matched docs -> score for one clause */
    def eval(sq: SubQuery): Map[Long, Double] = sq match {
      case LexicalMulti(fields, terms, CombinedFields(msm)) =>
        // merged pseudo-field: tf' = Σ w_f·tf_f, dl' = Σ w_f·dl_f,
        // df' = max over fields, avgdl' = Σ w_f·sumdl_f / n; msm gates on
        // distinct matched terms (the engine's exact formulation)
        val uniq = terms.distinct
        val mergedDf = uniq.flatMap { t =>
          val ds = fields.flatMap { case (f, _) => dfOf(f).get(t) }
          if (ds.isEmpty) None else Some(t -> ds.max)
        }.toMap
        val gate = math.max(msm, 1)
        if (mergedDf.size < gate) Map.empty
        else {
          val avgdlC = fields.map { case (f, w) =>
            w * docs.keys.toSeq.map(id => toksOf(f, id).size.toLong).sum }.sum / n
          docs.keys.flatMap { id =>
            val cdl = fields.map { case (f, w) => w * toksOf(f, id).size }.sum
            val per = uniq.filter(mergedDf.contains).flatMap { t =>
              val ctf = fields.map { case (f, w) =>
                w * toksOf(f, id).count(_ == t) }.sum
              if (ctf == 0) None
              else Some(Bm25.idf(mergedDf(t), n) *
                (ctf / (ctf + 1.2 * (1 - 0.75 + 0.75 * cdl / avgdlC))))
            }
            if (per.size >= gate) Some(id -> per.sum) else None
          }.toMap
        }
      case Lexical(terms, boosts) =>
        docs.flatMap { case (id, toks) =>
          val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
          val matched = terms.distinct.filter(tf.contains)
          if (matched.isEmpty) None
          else Some(id -> matched.map(t =>
            Bm25.idf(df(t), n) * boosts.getOrElse(t, 1.0) *
              Bm25.tfNorm(tf(t), dl(id), avgdl)).sum)
        }
      case LexicalMsm(terms, m, boosts) =>
        eval(Lexical(terms, boosts)).filter { case (id, _) =>
          docs(id).distinct.count(terms.distinct.contains) >= m
        }
      case MatchAll(b) => docs.keys.map(_ -> b).toMap
      case TermPattern(p, b) =>
        docs.collect { case (id, toks) if toks.exists(likeMatch(p, _)) => id -> b }
      case Fuzzy(t, f, b, tr) =>
        // the Damerau helper itself is verified against an independent BFS
        // model in BoolQuerySpec; here it feeds the bool-algebra model
        val dist: (String, String) => Int =
          if (tr) graft.functions.StringMath.damerau else lev
        docs.collect { case (id, toks) if toks.exists(x => dist(x, t) <= f) => id -> b }
      case ConstantScore(inner, b) => eval(inner).map { case (id, _) => id -> b }
      case DisMax(cs, tb) =>
        val evs = cs.map(eval)
        evs.flatMap(_.keys).toSet.map { (id: Long) =>
          val ss = evs.flatMap(_.get(id))
          id -> (ss.max + tb * (ss.sum - ss.max))
        }.toMap
      case Boosting(p, neg, nb) =>
        val nm = eval(neg).keySet
        eval(p).map { case (id, s) => id -> (if (nm(id)) s * nb else s) }
      case b: BoolSub =>
        val mus = b.must.map(eval)
        val shs = b.should.map(eval)
        val nos = b.mustNot.map(eval)
        val fils = b.filter.map(eval)
        if (b.must.isEmpty && b.should.isEmpty) {
          // filter-only (or empty) bool: required non-scoring context
          val excluded = nos.flatMap(_.keys).toSet
          val base =
            if (fils.isEmpty) docs.keys.toSet
            else fils.map(_.keySet).reduce(_ intersect _)
          base.filterNot(excluded).map(_ -> 0.0).toMap
        } else {
          val req = mus ++ fils
          val candidates =
            if (req.nonEmpty) req.map(_.keySet).reduce(_ intersect _)
            else shs.map(_.keySet).reduce(_ union _)
          candidates.toSeq.flatMap { id =>
            val shMatched = shs.count(_.contains(id))
            val excluded = nos.exists(_.contains(id))
            if (excluded || shMatched < b.effectiveMsm) None
            else Some(id -> // filter clauses contribute NO score
              (mus.flatMap(_.get(id)) ++ shs.flatMap(_.get(id))).sum)
          }.toMap
        }
      case TermsSet(vals, b) =>
        docs.collect { case (id, toks) if vals.exists(toks.contains) => id -> b }
      case SpanFirstQ(t, end, b) =>
        docs.collect {
          case (id, toks) if toks.indexOf(t) >= 0 && toks.indexOf(t) < end => id -> b
        }
      case SpanNotQ(inc, exc, pre, post, b) =>
        docs.flatMap { case (id, toks) =>
          val ip = toks.zipWithIndex.collect { case (w, i) if w == inc => i }
          val ep = toks.zipWithIndex.collect { case (w, i) if w == exc => i }.toSet
          if (ip.exists(p => !(p - pre to p + post).exists(ep))) Some(id -> b)
          else None
        }
      case SpanNearQ(ts, slop, ord, b) =>
        docs.flatMap { case (id, toks) =>
          if (spanTuples(posOf(toks, ts), slop, ord).nonEmpty) Some(id -> b) else None
        }
      case SpanContainingQ(big, slop, ord, little, b) =>
        docs.flatMap { case (id, toks) =>
          val lp = toks.zipWithIndex.collect { case (w, i) if w == little => i }
          val hit = lp.nonEmpty && spanTuples(posOf(toks, big), slop, ord)
            .exists(tup => lp.exists(p => p >= tup.min && p <= tup.max))
          if (hit) Some(id -> b) else None
        }
      case IntervalsQ(src, b) =>
        docs.flatMap { case (id, toks) =>
          if (ivMinimal(src, toks).nonEmpty) Some(id -> b) else None
        }
      case other => throw new IllegalArgumentException(s"model can't eval $other")
    }

    /** exhaustive minimal-interval sets for the interval sources the
     *  generator emits (match / term-set / any_of / all_of) — literal
     *  set-filters, no DFS pruning; members minimize per recursion exactly
     *  as Lucene's algebra requires (a non-minimal member can fake an
     *  in-budget all_of window a minimal one cannot) */
    private def ivMinimal(src: graft.query.Intervals.Source,
                          toks: Seq[String]): Set[(Int, Int)] = {
      import graft.query.Intervals._
      def minimalSet(s: Set[(Int, Int)]): Set[(Int, Int)] =
        s.filter(iv => !s.exists(o => o != iv && o._1 >= iv._1 && o._2 <= iv._2))
      src match {
        case IMatch(ts, mg, ord) =>
          val budget = if (mg < 0) Int.MaxValue / 4 else mg
          minimalSet(spanTuples(posOf(toks, ts), budget, ord)
            .map(t => (t.min, t.max)).toSet)
        case ITermSet(ts) =>
          ts.flatMap(t => toks.zipWithIndex.collect { case (`t`, p) => (p, p) }).toSet
        case IAnyOf(ss) => minimalSet(ss.flatMap(s => ivMinimal(s, toks)).toSet)
        case IAllOf(ss, mg, ord) =>
          val budget = if (mg < 0) Int.MaxValue / 4 else mg
          val subs = ss.map(s => ivMinimal(s, toks).toSeq.sorted)
          if (subs.exists(_.isEmpty)) Set.empty
          else minimalSet(
            subs.foldLeft(Seq(Seq.empty[(Int, Int)]))((acc, l) =>
              acc.flatMap(pre => l.map(pre :+ _)))
            .filter { ivs =>
              val disjoint = ivs.combinations(2).forall {
                case Seq(x, y) => x._2 < y._1 || y._2 < x._1
              }
              val chained = !ord ||
                ivs.sliding(2).forall(s => s.size < 2 || s(1)._1 > s(0)._2)
              val window = ivs.map(_._2).max - ivs.map(_._1).min + 1
              val widths = ivs.map(iv => iv._2 - iv._1 + 1).sum
              disjoint && chained && window - widths <= budget
            }
            .map(ivs => (ivs.map(_._1).min, ivs.map(_._2).max)).toSet)
        case other => throw new IllegalArgumentException(s"model can't eval $other")
      }
    }

    private def posOf(toks: Seq[String], ts: Seq[String]): Seq[Seq[Int]] =
      ts.map(t => toks.zipWithIndex.collect { case (w, i) if w == t => i })

    /** brute enumeration of valid span tuples (one position per term,
     *  pairwise distinct, width within slop, optionally ascending) */
    private def spanTuples(posOf: Seq[Seq[Int]], slop: Int,
                           inOrder: Boolean): Seq[Seq[Int]] =
      if (posOf.exists(_.isEmpty)) Nil
      else posOf.foldLeft(Seq(Seq.empty[Int]))((acc, arr) =>
        acc.flatMap(pre => arr.map(pre :+ _)))
        .filter { tup =>
          tup.distinct.size == tup.size &&
            (!inOrder || tup.sliding(2).forall(s => s.size < 2 || s(0) < s(1))) &&
            tup.max - tup.min + 1 - tup.size <= slop
        }
  }

  // ---- random generators -------------------------------------------------

  private def term(): String = vocab(rnd.nextInt(vocab.size))

  private def leaf(): SubQuery = rnd.nextInt(14) match {
    case 0 => Lexical(Seq.fill(1 + rnd.nextInt(3))(term()))
    case 1 =>
      val ts = Seq.fill(2 + rnd.nextInt(2))(term())
      LexicalMsm(ts, 1 + rnd.nextInt(ts.distinct.size))
    case 2 => MatchAll(0.5 + rnd.nextInt(3) * 0.5)
    case 3 => TermPattern(if (rnd.nextBoolean()) term().take(1) + "%" else "_" + term().take(1) + "%",
      0.5 + rnd.nextInt(3) * 0.5)
    case 4 => Fuzzy(term(), rnd.nextInt(2), 1.0 + rnd.nextInt(2))
    case 5 => ConstantScore(Lexical(Seq(term())), 0.5 + rnd.nextInt(4) * 0.5)
    case 6 => TermsSet(Seq.fill(1 + rnd.nextInt(2))(term()).distinct,
      0.5 + rnd.nextInt(3) * 0.5)
    case 7 => SpanFirstQ(term(), 1 + rnd.nextInt(4), 0.5 + rnd.nextInt(3) * 0.5)
    case 8 =>
      val inc = term()
      val exc = Iterator.continually(term()).find(_ != inc).get
      SpanNotQ(inc, exc, rnd.nextInt(2), rnd.nextInt(2), 0.5 + rnd.nextInt(3) * 0.5)
    case 9 => SpanNearQ(Seq.fill(2)(term()), rnd.nextInt(4), rnd.nextBoolean(),
      0.5 + rnd.nextInt(3) * 0.5)
    case 10 => SpanContainingQ(Seq.fill(2)(term()), rnd.nextInt(4),
      rnd.nextBoolean(), term(), 0.5 + rnd.nextInt(3) * 0.5)
    case 11 =>
      // intervals match: 1-3 distinct terms, gaps -1 (unlimited) .. 3
      import graft.query.Intervals
      IntervalsQ(Intervals.IMatch(
        Seq.fill(1 + rnd.nextInt(3))(term()).distinct,
        rnd.nextInt(5) - 1, rnd.nextBoolean()), 0.5 + rnd.nextInt(3) * 0.5)
    case 12 =>
      // composed intervals: all_of / any_of over term-set + match leaves
      import graft.query.Intervals
      val l1 = Intervals.ITermSet(Seq.fill(1 + rnd.nextInt(2))(term()).distinct)
      val l2 = Intervals.IMatch(Seq(term()))
      val tree =
        if (rnd.nextBoolean())
          Intervals.IAllOf(Seq(l1, l2), rnd.nextInt(5) - 1, rnd.nextBoolean())
        else Intervals.IAnyOf(Seq(l1, l2))
      IntervalsQ(tree, 0.5 + rnd.nextInt(3) * 0.5)
    case 13 =>
      // combined_fields over (text, head): weights >= 1 (the Lucene
      // contract), random or/and-style msm over 1-3 analyzed terms
      val ts = Seq.fill(1 + rnd.nextInt(3))(term())
      LexicalMulti(
        Seq("text" -> 1.0, "head" -> (1.0 + rnd.nextInt(2)).toDouble),
        ts, CombinedFields(rnd.nextInt(ts.distinct.size + 1)))
  }

  private def clause(depth: Int): SubQuery =
    if (depth <= 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => DisMax(Seq.fill(1 + rnd.nextInt(3))(clause(depth - 1)), rnd.nextInt(3) * 0.25)
      case 1 => Boosting(clause(depth - 1), clause(depth - 1), rnd.nextInt(3) * 0.3)
      case 2 => genBool(depth - 1)
      case _ => leaf()
    }

  private def genBool(depth: Int): BoolSub = {
    val nm = rnd.nextInt(3)
    val ns = rnd.nextInt(3)
    val nn = rnd.nextInt(2)
    val nf = rnd.nextInt(2) // FILTER context: required, non-scoring
    val b = BoolSub(
      must = Seq.fill(nm)(clause(depth)),
      should = Seq.fill(ns)(clause(depth)),
      mustNot = Seq.fill(nn)(clause(depth)),
      minimumShouldMatch = if (ns > 0 && rnd.nextBoolean()) Some(rnd.nextInt(ns + 1)) else None,
      filter = Seq.fill(nf)(clause(depth)))
    if (b.must.isEmpty && b.should.isEmpty && b.mustNot.isEmpty && b.filter.isEmpty)
      BoolSub(must = Seq(leaf()))
    else b
  }

  test("combined_fields leaf matches the model explicitly (not just via the random stream)") {
    val corpus = (0L until 30L).map(i => i -> Seq.fill(1 + (i % 7).toInt)(vocab((i % vocab.size).toInt)))
      .map { case (id, ts) => id -> (ts :+ vocab(((id * 3) % vocab.size).toInt)) }
    val headCorpus = corpus.map { case (id, toks) => id -> toks.take(2) }
    val idx = InvertedIndex.build(
      corpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text"),
      "doc_id", "text")
    val headIdx = InvertedIndex.build(
      headCorpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text"),
      "doc_id", "text")
    val model = new Model(corpus.toMap, headCorpus.toMap)
    for (msm <- 0 to 2; w <- Seq(1.0, 2.0)) {
      val bq = BoolSub(must = Seq(LexicalMulti(
        Seq("text" -> 1.0, "head" -> w), Seq("a", "ab", "zz"), CombinedFields(msm))))
      val expected = model.eval(bq)
      val got = BoolQuery.score(
        HybridSources(idx, fieldIdx = Map("head" -> headIdx)), bq).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expected.keySet, s"msm=$msm w=$w")
      got.foreach { case (id, s) =>
        assert(math.abs(s - expected(id)) < 1e-9, s"doc $id msm=$msm w=$w") }
    }
  }

  test("random nested bool trees match the first-principles model (12 corpora)") {
    for (round <- 1 to 12) {
      val nDocs = 20 + rnd.nextInt(20)
      val corpus = (0L until nDocs.toLong).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(8))(term()))
      val idx = InvertedIndex.build(
        corpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text")
      // secondary `head` field (first 2 tokens): the combined_fields leaf's
      // second per-field index, vocabulary a subset of text's
      val headCorpus = corpus.map { case (id, toks) => id -> toks.take(2) }
      val headIdx = InvertedIndex.build(
        headCorpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text")
      val model = new Model(corpus.toMap, headCorpus.toMap)
      val bq = genBool(depth = 2)
      val expected = model.eval(bq)
      val pos = graft.index.Positions.build(
        corpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text")
      val got = BoolQuery.score(HybridSources(idx, positions = Some(pos),
          fieldIdx = Map("head" -> headIdx)), bq).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expected.keySet,
        s"round $round matched-set mismatch for $bq:\n got ${got.keySet.toSeq.sorted}\n exp ${expected.keySet.toSeq.sorted}")
      got.foreach { case (id, s) =>
        assert(math.abs(s - expected(id)) < 1e-9,
          s"round $round score mismatch doc $id for $bq: got $s exp ${expected(id)}")
      }
    }
  }
}
