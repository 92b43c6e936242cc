package graft

import graft.index.{InvertedIndex, Positions}
import graft.query.Intervals
import graft.query.Intervals.{IAllOf, IAnyOf, IFiltered, IFuzzy, IMatch,
  IPrefix, ITermSet, IWildcard, Source}

/** Composed intervals (match / all_of / any_of) vs an independent
 *  brute-force model of the minimal-interval algebra: exhaustive tuple
 *  enumeration with no DFS pruning, minimality applied as a literal
 *  set-filter. Checks both the per-doc interval SETS and the matched-doc
 *  sets through the positional-block engine path. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // --- independent model ---------------------------------------------
  private def minimal(s: Set[(Int, Int)]): Set[(Int, Int)] =
    s.filter(iv => !s.exists(o =>
      o != iv && o._1 >= iv._1 && o._2 <= iv._2))

  private def tuples[A](lists: Seq[Seq[A]]): Seq[Seq[A]] =
    lists.foldLeft(Seq(Seq.empty[A]))((acc, l) => acc.flatMap(pre => l.map(pre :+ _)))

  private def bruteEval(src: Source, toks: Seq[String]): Set[(Int, Int)] = src match {
    case IMatch(terms, mg, ord) =>
      val posLists = terms.map(t => toks.zipWithIndex.collect { case (`t`, p) => p })
      if (posLists.exists(_.isEmpty)) Set.empty
      else minimal(tuples(posLists).filter { tup =>
        tup.distinct.size == tup.size &&
          (!ord || tup.sliding(2).forall(s => s.size < 2 || s(0) < s(1))) &&
          (mg < 0 || tup.max - tup.min + 1 - tup.size <= mg) // -1 = unlimited
      }.map(tup => (tup.min, tup.max)).toSet)
    case IAllOf(srcs, mg, ord) =>
      val subs = srcs.map(s => bruteEval(s, toks).toSeq.sorted)
      if (subs.exists(_.isEmpty)) Set.empty
      else minimal(tuples(subs).filter { ivs =>
        val disjoint = ivs.combinations(2).forall {
          case Seq(a, b) => a._2 < b._1 || b._2 < a._1
        }
        val inOrder = !ord || ivs.sliding(2).forall(s => s.size < 2 || s(1)._1 > s(0)._2)
        val window = ivs.map(_._2).max - ivs.map(_._1).min + 1
        val widths = ivs.map(iv => iv._2 - iv._1 + 1).sum
        disjoint && inOrder && (mg < 0 || window - widths <= mg)
      }.map(ivs => (ivs.map(_._1).min, ivs.map(_._2).max)).toSet)
    case IAnyOf(srcs) =>
      minimal(srcs.flatMap(s => bruteEval(s, toks)).toSet)
    case ITermSet(ts) =>
      ts.flatMap(t => toks.zipWithIndex.collect { case (`t`, p) => (p, p) }).toSet
    case IFiltered(s, kind, f) =>
      // literal set-filter over the two sides' independently-derived
      // minimal sets — the pinned FilteredIntervalsSource semantics
      val ss = bruteEval(s, toks)
      val fs = bruteEval(f, toks)
      def con(o: (Int, Int), i: (Int, Int)) = o._1 <= i._1 && i._2 <= o._2
      def ov(a: (Int, Int), b: (Int, Int)) = a._1 <= b._2 && b._1 <= a._2
      kind match {
        case Intervals.FContaining     => ss.filter(x => fs.exists(con(x, _)))
        case Intervals.FContainedBy    => ss.filter(x => fs.exists(con(_, x)))
        case Intervals.FNotContaining  => ss.filterNot(x => fs.exists(con(x, _)))
        case Intervals.FNotContainedBy => ss.filterNot(x => fs.exists(con(_, x)))
        case Intervals.FOverlapping    => ss.filter(x => fs.exists(ov(x, _)))
        case Intervals.FNotOverlapping => ss.filterNot(x => fs.exists(ov(x, _)))
        case Intervals.FBefore         => ss.filter(x => fs.exists(f2 => x._2 < f2._1))
        case Intervals.FAfter          => ss.filter(x => fs.exists(f2 => x._1 > f2._2))
      }
    case _ => fail(s"model: unexpected unresolved leaf $src")
  }

  private val rnd = new scala.util.Random(13)
  // single-char terms for the composition trees + two-char terms so the
  // pattern leaves (prefix/wildcard/fuzzy) expand to REAL multi-term sets
  private val vocab = Vector("a", "b", "c", "d", "e", "ab", "ac")
  private val docs = (1L to 60L).map(i =>
    (i, Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
  private lazy val df = docs.toDF("doc_id", "text")
  private lazy val idx = InvertedIndex.build(df, "doc_id", "text")
  private lazy val pos = Positions.build(df, "doc_id", "text")

  private val trees: Seq[Source] = Seq(
    IMatch(Seq("a", "b"), maxGaps = 1, ordered = true),
    IMatch(Seq("a", "b", "c"), maxGaps = 2, ordered = false),
    IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b"))), maxGaps = 1, ordered = true),
    IAllOf(Seq(IMatch(Seq("a")),
      IAnyOf(Seq(IMatch(Seq("b")), IMatch(Seq("c"))))), maxGaps = 1, ordered = true),
    IAllOf(Seq(IMatch(Seq("a", "b"), 1, ordered = true), IMatch(Seq("c"))),
      maxGaps = 2, ordered = false),
    IAnyOf(Seq(
      IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b"))), 0, ordered = true),
      IMatch(Seq("c", "d"), 1, ordered = false))),
    IAllOf(Seq(
      IAnyOf(Seq(IMatch(Seq("a")), IMatch(Seq("b")))),
      IAnyOf(Seq(IMatch(Seq("c")), IMatch(Seq("d"))))), maxGaps = 3, ordered = false),
    // -1 = unlimited gaps (the reference's default)
    IMatch(Seq("a", "b"), maxGaps = -1, ordered = true),
    IMatch(Seq("a", "b", "c"), maxGaps = -1, ordered = false),
    IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b", "c"), maxGaps = -1)),
      maxGaps = -1, ordered = false),
    // resolved multi-term leaves (what prefix/wildcard/fuzzy expand into)
    ITermSet(Seq("ab", "ac")),
    IAllOf(Seq(ITermSet(Seq("a", "ab", "ac")), IMatch(Seq("b"))),
      maxGaps = 2, ordered = true),
    IAnyOf(Seq(ITermSet(Seq("ab")), IMatch(Seq("c", "d"), 1, ordered = false))),
    ITermSet(Seq.empty), // an expansion that matched nothing
    // every filter kind over a 2-term window vs a point / window filter
    IFiltered(IMatch(Seq("a", "b"), 2, ordered = true),
      Intervals.FNotContaining, IMatch(Seq("c"))),
    IFiltered(IMatch(Seq("a", "b"), 3, ordered = true),
      Intervals.FContaining, IMatch(Seq("c"))),
    IFiltered(IMatch(Seq("a", "b"), -1, ordered = true),
      Intervals.FBefore, IMatch(Seq("d"))),
    IFiltered(IMatch(Seq("a", "b"), -1, ordered = true),
      Intervals.FAfter, IMatch(Seq("d"))),
    IFiltered(IMatch(Seq("a"), -1),
      Intervals.FContainedBy, IMatch(Seq("c", "d"), 2, ordered = false)),
    IFiltered(IMatch(Seq("a"), -1),
      Intervals.FNotContainedBy, IMatch(Seq("c", "d"), 2, ordered = false)),
    IFiltered(IMatch(Seq("a", "c"), 2, ordered = false),
      Intervals.FOverlapping, IMatch(Seq("b", "d"), 2, ordered = false)),
    IFiltered(IMatch(Seq("a", "c"), 2, ordered = false),
      Intervals.FNotOverlapping, IMatch(Seq("b", "d"), 2, ordered = false)),
    // filters nest like any other source
    IFiltered(
      IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b"))), 2, ordered = true),
      Intervals.FNotContaining, ITermSet(Seq("c", "e"))))

  test("per-doc interval sets equal the brute-force minimal-interval model") {
    for (tree <- trees; (id, text) <- docs) {
      val toks = text.split(" ").toSeq
      def posOf(t: String): Array[Int] =
        toks.zipWithIndex.collect { case (`t`, p) => p }.toArray
      val got = Intervals.eval(tree, posOf).toSet
      val want = bruteEval(tree, toks)
      assert(got == want, s"doc $id tree=$tree got=$got want=$want toks=$toks")
    }
  }

  test("matchDocs through the positional engine equals the model's doc set") {
    for (tree <- trees) {
      val got = Intervals.matchDocs(idx, pos, tree)
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter { case (_, text) =>
        bruteEval(tree, text.split(" ").toSeq).nonEmpty
      }.map(_._1).toSet
      assert(got == want, s"tree=$tree")
    }
  }

  test("resolve expands pattern leaves against the dictionary, term-asc, capped") {
    // dictionary of the 60-doc corpus = the vocab (every term occurs)
    assert(Intervals.resolve(idx, IPrefix("a")) == ITermSet(Seq("a", "ab", "ac")))
    assert(Intervals.resolve(idx, IWildcard("a?")) == ITermSet(Seq("ab", "ac")))
    assert(Intervals.resolve(idx, IWildcard("*b")) == ITermSet(Seq("ab", "b")))
    // "ab" within 1 Damerau edit: a, b (delete), ab, ac (substitute)
    assert(Intervals.resolve(idx, IFuzzy("ab", fuzziness = 1)) ==
      ITermSet(Seq("a", "ab", "ac", "b")))
    // prefix_length pins the first char: b drops out
    assert(Intervals.resolve(idx, IFuzzy("ab", fuzziness = 1, prefixLength = 1)) ==
      ITermSet(Seq("a", "ab", "ac")))
    // unmatched pattern resolves to the EMPTY set (matches nothing)
    assert(Intervals.resolve(idx, IPrefix("zz")) == ITermSet(Seq.empty))
    // past the cap fails loudly (the reference's 128-expansion contract)
    intercept[IllegalArgumentException](
      Intervals.resolve(idx, IPrefix("a", maxExpansions = 2)))
    // resolve recurses through compositions and filters
    val t = Intervals.resolve(idx, IFiltered(
      IAllOf(Seq(IPrefix("a"), IMatch(Seq("b"))), 1, ordered = true),
      Intervals.FNotContaining, IWildcard("?c")))
    assert(t == IFiltered(
      IAllOf(Seq(ITermSet(Seq("a", "ab", "ac")), IMatch(Seq("b"))), 1, ordered = true),
      Intervals.FNotContaining, ITermSet(Seq("ac"))))
  }

  test("matchDocs with pattern leaves equals the model over the resolved tree") {
    val patternTrees: Seq[(Source, Source)] = Seq(
      IAllOf(Seq(IPrefix("a"), IMatch(Seq("b"))), 2, ordered = true) ->
        IAllOf(Seq(ITermSet(Seq("a", "ab", "ac")), IMatch(Seq("b"))), 2, ordered = true),
      IFiltered(IMatch(Seq("a", "b"), 2, ordered = true),
        Intervals.FNotContaining, IWildcard("a?")) ->
        IFiltered(IMatch(Seq("a", "b"), 2, ordered = true),
          Intervals.FNotContaining, ITermSet(Seq("ab", "ac"))))
    for ((raw, resolved) <- patternTrees) {
      val got = Intervals.matchDocs(idx, pos, raw)
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter { case (_, text) =>
        bruteEval(resolved, text.split(" ").toSeq).nonEmpty
      }.map(_._1).toSet
      assert(got == want, s"tree=$raw")
    }
  }

  test("guards: empty sources, bad max_gaps, single-source compositions") {
    intercept[IllegalArgumentException](IMatch(Nil))
    intercept[IllegalArgumentException](IMatch(Seq("a"), maxGaps = -2))
    intercept[IllegalArgumentException](IAllOf(Seq(IMatch(Seq("a"))), 0, ordered = false))
    intercept[IllegalArgumentException](IAnyOf(Seq(IMatch(Seq("a")))))
    intercept[IllegalArgumentException](IPrefix(""))
    intercept[IllegalArgumentException](IPrefix("a", maxExpansions = 0))
    intercept[IllegalArgumentException](IWildcard("A*"))
    intercept[IllegalArgumentException](IFuzzy("ab", fuzziness = 3))
    intercept[IllegalArgumentException](IFuzzy("ab", prefixLength = -1))
    intercept[IllegalArgumentException](ITermSet(Seq("not a token")))
    // unresolved pattern leaves never reach eval
    intercept[IllegalStateException](
      Intervals.eval(IPrefix("a"), _ => Array.emptyIntArray))
  }
}
