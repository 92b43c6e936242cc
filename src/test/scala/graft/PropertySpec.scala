package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.index.PostingCodec
import graft.ops.Sparse

/** ScalaCheck property suites (SURVEY.md §5): codec round-trips and the
 *  scoring invariants that must hold for ANY input. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("delta-varint codec round-trips any strictly increasing id list") {
    val gen = Gen.listOf(Gen.chooseNum(0, 1 << 20)).map(_.distinct.sorted)
    check(Prop.forAll(gen) { ids0 =>
      val ids = ids0.toArray
      PostingCodec.decodeDeltas(PostingCodec.encodeDeltas(ids), ids.length).toSeq == ids.toSeq
    })
  }

  test("varint codec round-trips any non-negative int list") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0, Int.MaxValue))) { xs0 =>
      val xs = xs0.toArray
      PostingCodec.decodeInts(PostingCodec.encodeInts(xs), xs.length).toSeq == xs.toSeq
    })
  }

  test("freq encode/decode keeps exponent + 8 mantissa bits (relative err < 2^-8)") {
    check(Prop.forAll(Gen.chooseNum(1e-6f, 1e6f)) { v =>
      val d = Sparse.freqDecode(Sparse.freqEncode(v))
      d <= v + 1e-12 && (v - d) / v < 1.0f / 256 + 1e-6
    })
  }

  test("bm25 idf is positive and monotone decreasing in df") {
    check(Prop.forAll(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(1L, 1000000L)) { (a, b) =>
      val n = math.max(a, b) + 1
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      graft.query.Bm25.idf(hi, n) > 0 &&
        graft.query.Bm25.idf(lo, n) >= graft.query.Bm25.idf(hi, n)
    })
  }

  test("bm25 tfNorm is in (0,1) and monotone in tf, anti-monotone in dl") {
    check(Prop.forAll(Gen.chooseNum(1, 1000), Gen.chooseNum(1, 10000)) { (tf, dl) =>
      val avgdl = 100.0
      val v = graft.query.Bm25.tfNorm(tf, dl, avgdl)
      v > 0 && v < 1 &&
        graft.query.Bm25.tfNorm(tf + 1, dl, avgdl) > v &&
        graft.query.Bm25.tfNorm(tf, dl + 1, avgdl) < v
    })
  }
}
