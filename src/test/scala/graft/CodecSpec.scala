package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PostingCodec

class CodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("delta varint round-trips sorted local ids") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val sorted = Array.fill(n)(rnd.nextInt(4096)).distinct.sorted
      val dec = PostingCodec.decodeDeltas(PostingCodec.encodeDeltas(sorted), sorted.length)
      assert(dec.toSeq == sorted.toSeq)
    }
  }

  test("varint round-trips non-negative ints incl. multi-byte values") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextInt(Int.MaxValue))
      val dec = PostingCodec.decodeInts(PostingCodec.encodeInts(arr), arr.length)
      assert(dec.toSeq == arr.toSeq)
    }
  }

  test("edge values round-trip") {
    val arr = Array(0, 1, 127, 128, 16383, 16384, Int.MaxValue)
    assert(PostingCodec.decodeInts(PostingCodec.encodeInts(arr), arr.length).toSeq == arr.toSeq)
  }

  test("single-byte encoding for small deltas") {
    val ids = (0 until 128).toArray
    assert(PostingCodec.encodeDeltas(ids).length == 128)
  }
}
