package graft.sketch

/** Interleaved multi-bin Bloom filter — the Spark port of the reference's
  * namesake structure (interleaved XOR filter,
  * /root/reference/src/main/xorfilter.hpp bit layout; bulk count
  * /root/reference/src/hixf/build/hierarchical_interleaved_xor_filter.hpp:
  * 307-334): B per-group filters with identical (k, sliceBits, seed) are
  * bit-TRANSPOSED into one blob so that bit position p of every bin lives
  * in one contiguous block of ceil(B/64) words. Probing one hash then reads
  * k consecutive blocks — one cache line serves ALL bins — and a query's
  * per-bin match counts come from a single pass over its hash set
  * (bulk count), instead of re-probing B separate blobs.
  *
  * The bits are exactly the member [[Bloom]] filters' bits, so per-bin
  * counts are provably identical to probing each filter alone — the
  * equality is gated (`classify_interleaved` vs the flat probe) rather
  * than trusted. Merge story unchanged: build per-group Blooms with the
  * salted aggregate, interleave once at the end (cheap transpose of the
  * final blobs, not a new aggregation path).
  *
  * Layout: [0]=type(5) [1]=ver [2..5]=k [6..13]=sliceBits [14..21]=seed
  * [22..25]=nBins [26..)=blocks, block index (i*sliceBits + pos), each
  * block ceil(nBins/64) little-endian words.
  */
object Interleaved {
  val TYPE: Byte = 5
  val VER: Byte = 1
  val HEADER = 26

  @inline def k(buf: Array[Byte]): Int = Bytes.getInt(buf, 2)
  @inline def sliceBits(buf: Array[Byte]): Long = Bytes.getLong(buf, 6)
  @inline def seed(buf: Array[Byte]): Long = Bytes.getLong(buf, 14)
  @inline def nBins(buf: Array[Byte]): Int = Bytes.getInt(buf, 22)
  @inline private def wordsPerBlock(bins: Int): Int = (bins + 63) >>> 6

  /** Transpose per-bin Bloom blobs (identical params required) into one
    * interleaved blob. Bin order = argument order; the caller owns the
    * bin→group mapping. */
  def fromFilters(filters: Seq[Array[Byte]]): Array[Byte] = {
    require(filters.nonEmpty, "no filters to interleave")
    val h = filters.head
    val kk = Bloom.k(h); val slice = Bloom.sliceBits(h); val sd = Bloom.seed(h)
    require(filters.forall(f => Bloom.k(f) == kk &&
      Bloom.sliceBits(f) == slice && Bloom.seed(f) == sd &&
      f.length == h.length), "bloom parameter mismatch across bins")
    val bins = filters.size
    val wpb = wordsPerBlock(bins)
    val totalBits = kk.toLong * slice
    require(totalBits * wpb <= (Int.MaxValue.toLong - HEADER) / 8,
      s"interleaved blob too large: $bins bins x $totalBits positions")
    val out = new Array[Byte](HEADER + (totalBits * wpb * 8).toInt)
    out(0) = TYPE; out(1) = VER
    Bytes.putInt(out, 2, kk)
    Bytes.putLong(out, 6, slice)
    Bytes.putLong(out, 14, sd)
    Bytes.putInt(out, 22, bins)
    var b = 0
    while (b < bins) {
      val f = filters(b)
      val word = b >>> 6
      val bit = 1L << (b & 63)
      // walk the flat filter byte-wise, visiting only set bits
      var byteIdx = Bloom.HEADER
      while (byteIdx < f.length) {
        var v = f(byteIdx) & 0xff
        val base = (byteIdx - Bloom.HEADER).toLong << 3
        while (v != 0) {
          val tz = java.lang.Integer.numberOfTrailingZeros(v)
          v &= v - 1
          val pos = base + tz // flat bit index i*slice + p == block index
          val off = HEADER + ((pos * wpb + word) * 8).toInt
          Bytes.putLong(out, off, Bytes.getLong(out, off) | bit)
        }
        byteIdx += 1
      }
      b += 1
    }
    out
  }

  /** Bulk count: for each bin, how many of `hashes` are contained — ONE
    * pass over the hash set, k block-reads + ANDs per hash (the
    * reference's counting bulk_count). Returns an array of length nBins. */
  def countContained(
      buf: Array[Byte],
      hashes: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val kk = k(buf); val slice = sliceBits(buf); val sd = seed(buf)
    val bins = nBins(buf)
    val wpb = wordsPerBlock(bins)
    val counts = new Array[Long](bins)
    val acc = new Array[Long](wpb)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h1 = Bytes.mix64(hashes.getLong(j) ^ sd)
      val h2 = Bytes.mix64(h1) | 1L
      var w = 0
      while (w < wpb) { acc(w) = -1L; w += 1 }
      var i = 0
      while (i < kk) {
        val pos = ((h1 + i * h2) & Long.MaxValue) % slice
        val off = HEADER + (((i * slice + pos) * wpb) * 8).toInt
        var w2 = 0
        while (w2 < wpb) {
          acc(w2) &= Bytes.getLong(buf, off + w2 * 8)
          w2 += 1
        }
        i += 1
      }
      var w3 = 0
      while (w3 < wpb) {
        var m = acc(w3)
        while (m != 0) {
          val b = (w3 << 6) + java.lang.Long.numberOfTrailingZeros(m)
          m &= m - 1
          if (b < bins) counts(b) += 1
        }
        w3 += 1
      }
      j += 1
    }
    counts
  }
}
