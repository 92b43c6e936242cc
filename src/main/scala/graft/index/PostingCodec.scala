package graft.index

/**
 * Delta + varint codec for posting blocks.
 *
 * The reference's SEISMIC postings format vint-encodes docId deltas and
 * weights inside each cluster (reference:
 * sparse/codec/ClusteredPostingTermsWriter.java:155-181 — writeVInt of doc
 * deltas and weights; sparse/data/DocWeight.java:96-103). We keep the same
 * wire idea — monotone docIds stored as unsigned varint deltas, term
 * frequencies as unsigned varints — but the container is a Parquet/Iceberg
 * row per (term, bucket) block instead of a Lucene `.sip` segment file, so
 * Spark's scan pruning replaces the term-dictionary seek.
 *
 * Blocks carry `maxTf` (the per-block maximum impact) at build time, which is
 * what query-time block-max pruning (WAND-style upper bounds, reference:
 * query/HybridQueryScorer.java:155-176 advanceShallow/getMaxScore) consumes.
 */
object PostingCodec extends Serializable {

  /** Unsigned LEB128 varint append. */
  @inline private def writeVarInt(buf: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    buf.write(v.toInt)
  }

  /** Encode strictly increasing local doc ids as first-value + deltas. */
  def encodeDeltas(sorted: Array[Int]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(sorted.length + 4)
    var prev = 0
    var i = 0
    while (i < sorted.length) {
      writeVarInt(buf, (sorted(i) - prev).toLong)
      prev = sorted(i)
      i += 1
    }
    buf.toByteArray
  }

  /** Encode non-negative ints (term frequencies / doc lengths) as varints. */
  def encodeInts(xs: Array[Int]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(xs.length + 4)
    var i = 0
    while (i < xs.length) { writeVarInt(buf, xs(i).toLong); i += 1 }
    buf.toByteArray
  }

  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var prev = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      prev += v.toInt
      out(i) = prev
      i += 1
    }
    out
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }
}
