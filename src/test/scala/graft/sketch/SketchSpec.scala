package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pure-Scala sketch correctness: published error bounds vs exact answers,
  * and merge associativity / split-merge equivalence (north rule; the
  * reference only gets this trivially by unioning raw hash sets before
  * construction, /root/reference/src/hixf/build/insert_into_bins.cpp:14-28).
  */
class SketchSpec extends AnyFunSuite {
  private def hashes(n: Int, seed: Long): Array[Long] = {
    val r = new Random(seed)
    Array.fill(n)(r.nextLong())
  }

  // ---- HLL ----------------------------------------------------------------

  test("hll estimate within 3x published bound (1.04/sqrt(m))") {
    for (p <- Seq(10, 12, 14); n <- Seq(100, 10000, 500000)) {
      val h = Hll.empty(p)
      val data = hashes(n, seed = p * 1000L + n)
      data.foreach(Hll.update(h, _))
      val exact = data.distinct.length
      val est = Hll.estimate(h)
      val bound = 3 * Hll.stdError(p) * exact
      assert(math.abs(est - exact) <= math.max(bound, 2.0),
        s"p=$p n=$n est=$est exact=$exact")
    }
  }

  test("hll merge == sketch of union, and merge is associative") {
    val p = 12
    val a = hashes(5000, 1); val b = hashes(5000, 2); val c = hashes(5000, 3)
    def sk(xs: Array[Long]*): Array[Byte] = {
      val h = Hll.empty(p); xs.foreach(_.foreach(Hll.update(h, _))); h
    }
    val merged1 = Hll.merge(Hll.merge(sk(a), sk(b)), sk(c))
    val merged2 = Hll.merge(sk(a), Hll.merge(sk(b), sk(c)))
    val union = sk(a, b, c)
    assert(merged1.sameElements(merged2), "associativity")
    assert(merged1.sameElements(union), "merge == union sketch")
  }

  // ---- Bloom ---------------------------------------------------------------

  test("bloom has no false negatives and fpr within 3x configured bound") {
    val n = 20000
    val fpp = 0.01
    val b = Bloom.empty(n, fpp, seed = 7)
    val members = hashes(n, 11)
    members.foreach(Bloom.update(b, _))
    assert(members.forall(Bloom.contains(b, _)), "no false negatives")
    val nonMembers = hashes(100000, 12).filterNot(members.toSet)
    val fp = nonMembers.count(Bloom.contains(b, _))
    val rate = fp.toDouble / nonMembers.length
    assert(rate <= 3 * fpp, s"fpr=$rate configured=$fpp")
    assert(Bloom.expectedFpp(b) <= 2 * fpp)
  }

  test("bloom slice-fill item estimate tracks the true insert count") {
    // Swamidass–Baldi estimate (feeds Classify.planCoarseBuckets loads):
    // within 10% at design load, and a saturating filter still reads as
    // way-over-capacity rather than wrapping or NaN-ing
    val n = 20000
    val b = Bloom.empty(n, 0.01, seed = 5)
    hashes(n, 31).foreach(Bloom.update(b, _))
    val est = Bloom.estimateItems(b)
    assert(math.abs(est - n) <= 0.1 * n, s"est=$est true=$n")
    val empty = Bloom.empty(n, 0.01, seed = 5)
    assert(Bloom.estimateItems(empty) === 0.0)
    val over = Bloom.empty(100, 0.01, seed = 6)
    hashes(5000, 32).foreach(Bloom.update(over, _))
    val overEst = Bloom.estimateItems(over)
    assert(!overEst.isNaN && !overEst.isInfinite && overEst > 200,
      s"saturated estimate $overEst")
  }

  test("bloom xor-parity sizing reaches <= 0.0039 fpr") {
    // FPR parity with the reference's 8-bit XOR fingerprints
    // (/root/reference/src/main/xorfilter.hpp:60-62).
    val n = 5000
    val b = Bloom.empty(n, Bloom.XorParityFpp, seed = 3)
    val members = hashes(n, 21)
    members.foreach(Bloom.update(b, _))
    val nonMembers = hashes(300000, 22).filterNot(members.toSet)
    val rate = nonMembers.count(Bloom.contains(b, _)).toDouble / nonMembers.length
    assert(rate <= 2 * Bloom.XorParityFpp, s"rate=$rate")
  }

  test("bloom merge (OR) == build over union; associative; idempotent") {
    val a = hashes(3000, 31); val b = hashes(3000, 32); val c = hashes(3000, 33)
    def sk(xs: Array[Long]*): Array[Byte] = {
      val s = Bloom.empty(10000, 0.01, seed = 5)
      xs.foreach(_.foreach(Bloom.update(s, _))); s
    }
    val m1 = Bloom.merge(Bloom.merge(sk(a), sk(b)), sk(c))
    val m2 = Bloom.merge(sk(a), Bloom.merge(sk(b), sk(c)))
    assert(m1.sameElements(m2))
    assert(m1.sameElements(sk(a, b, c)))
    assert(Bloom.merge(sk(a), sk(a)).sameElements(sk(a)), "idempotent")
  }

  // ---- CountMin -------------------------------------------------------------

  test("cms never undercounts; overcount <= eps*N for most items") {
    val eps = 0.001; val delta = 0.01
    val c = CountMin.empty(eps, delta, seed = 9)
    val r = new Random(99)
    // zipf-ish: item i gets ~ N/i occurrences
    val counts = (1 to 2000).map(i => i.toLong -> (20000 / i + 1).toLong).toMap
    counts.foreach { case (item, cnt) =>
      var j = 0L
      while (j < cnt) { CountMin.update(c, item, 1L); j += 1 }
    }
    val total = CountMin.totalWeight(c)
    assert(total == counts.values.sum)
    var violations = 0
    counts.foreach { case (item, cnt) =>
      val est = CountMin.estimate(c, item)
      assert(est >= cnt, s"undercount for $item")
      if (est > cnt + eps * total) violations += 1
    }
    assert(violations <= math.max(1, delta * counts.size),
      s"violations=$violations of ${counts.size}")
  }

  test("cms merge is element-wise add and associative") {
    def sk(seed: Long, items: Range): Array[Byte] = {
      val s = CountMin.empty(0.01, 0.01, seed = 4)
      items.foreach(i => CountMin.update(s, i.toLong, 1L)); s
    }
    val a = sk(4, 1 to 100); val b = sk(4, 50 to 150); val c = sk(4, 1 to 10)
    val m1 = CountMin.merge(CountMin.merge(a.clone, b), c)
    val m2 = CountMin.merge(a.clone, CountMin.merge(b.clone, c))
    assert(m1.sameElements(m2))
    assert(CountMin.estimate(m1, 50L) >= 2)
    assert(CountMin.totalWeight(m1) == 211) // 100 + 101 + 10 items
  }

  test("cms inner product never undercounts the exact join size, bounded") {
    val eps = 0.001; val delta = 0.01
    val r = new Random(7)
    val fa = (1 to 500).map(i => i.toLong -> (r.nextInt(20) + 1).toLong).toMap
    val fb = (300 to 800).map(i => i.toLong -> (r.nextInt(20) + 1).toLong).toMap
    val a = CountMin.empty(eps, delta, seed = 11)
    val b = CountMin.empty(eps, delta, seed = 11)
    fa.foreach { case (k, c) => CountMin.update(a, k, c) }
    fb.foreach { case (k, c) => CountMin.update(b, k, c) }
    val exact = fa.iterator.map { case (k, c) => c * fb.getOrElse(k, 0L) }.sum
    val est = CountMin.innerProduct(a, b)
    assert(est >= exact, s"undercount: est=$est exact=$exact")
    val slack = eps * CountMin.totalWeight(a) * CountMin.totalWeight(b)
    assert(est <= exact + slack, s"est=$est exact=$exact slack=$slack")
  }

  test("cms inner product: merge only raises the row-wise min; mismatch rejected") {
    def sk(items: Seq[Long], seed: Long = 4, eps: Double = 0.01): Array[Byte] = {
      val s = CountMin.empty(eps, 0.01, seed)
      items.foreach(CountMin.update(s, _, 1L)); s
    }
    val a1 = sk(1L to 100L); val a2 = sk(80L to 120L); val b = sk(90L to 200L)
    val merged = CountMin.merge(a1.clone, a2)
    // counters add per cell, so each row's dot product is additive and the
    // min over rows can only be >= the sum of the parts' mins
    assert(CountMin.innerProduct(merged, b) >=
      CountMin.innerProduct(a1, b) + CountMin.innerProduct(a2, b))
    // exact on the merged stream: keys 90..120 appear twice (a1 once for
    // 90..100, a2 once for 90..120... compute directly)
    val fm = ((1L to 100L) ++ (80L to 120L)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fb2 = (90L to 200L).map(_ -> 1L).toMap
    val exact = fm.iterator.map { case (k, c) => c * fb2.getOrElse(k, 0L) }.sum
    assert(CountMin.innerProduct(merged, b) >= exact)
    intercept[IllegalArgumentException] {
      CountMin.innerProduct(a1, sk(1L to 10L, seed = 5))
    }
    intercept[IllegalArgumentException] {
      CountMin.innerProduct(a1, sk(1L to 10L, eps = 0.02))
    }
  }

  test("hll + bloom sparse wire codecs round-trip byte-identically") {
    // hll: 50 distinct values into 16384 registers → sparse
    val h = Hll.empty(14)
    (1 to 50).foreach(i => Hll.update(h, Bytes.mix64(i.toLong * 77L)))
    val hw = Hll.toWire(h)
    assert(hw.length < h.length / 10, s"hll wire not compact: ${hw.length}")
    assert(hw(1) == Hll.VER_SPARSE)
    assert(Hll.fromWire(hw).sameElements(h))
    assert(Hll.estimate(Hll.fromWire(hw)) == Hll.estimate(h))
    assert(Hll.fromWire(h) eq h, "dense hll must pass through")
    // saturated hll ships dense
    val full = Hll.empty(4)
    (1 to 10000).foreach(i => Hll.update(full, Bytes.mix64(i.toLong)))
    assert(Hll.toWire(full) eq full)
    // bloom: 30 items into a 1<<16-sized filter → sparse
    val b = Bloom.empty(1 << 16, 0.0039, seed = 5)
    (1 to 30).foreach(i => Bloom.update(b, i.toLong * 31L))
    val bw = Bloom.toWire(b)
    assert(bw.length < b.length / 10, s"bloom wire not compact: ${bw.length}")
    assert(bw(1) == Bloom.VER_SPARSE)
    val bBack = Bloom.fromWire(bw)
    assert(bBack.sameElements(b))
    (1 to 30).foreach(i => assert(Bloom.contains(bBack, i.toLong * 31L)))
    // saturated bloom ships dense
    val tiny = Bloom.empty(8, 0.1, seed = 5)
    (1 to 500).foreach(i => Bloom.update(tiny, i.toLong))
    assert(Bloom.toWire(tiny) eq tiny)
  }

  test("cms sparse wire codec round-trips byte-identically; dense fallback") {
    // sparse: a 1e-4-eps sketch (27183x5 counters) touched by 40 keys
    val sparse = CountMin.empty(0.0001, 0.01, seed = 7)
    (1 to 40).foreach(i => CountMin.update(sparse, i.toLong * 1337L, i.toLong))
    val wire = CountMin.toWire(sparse)
    assert(wire.length < sparse.length / 100,
      s"sparse wire not compact: ${wire.length} of ${sparse.length}")
    assert(wire(1) == CountMin.VER_SPARSE)
    val back = CountMin.fromWire(wire)
    assert(back.sameElements(sparse), "wire round-trip lost bytes")
    assert(CountMin.totalWeight(back) == CountMin.totalWeight(sparse))
    // dense input passes through fromWire untouched
    assert(CountMin.fromWire(sparse) eq sparse)
    // saturated: a tiny-width sketch fully touched ships dense (no loss)
    val dense = CountMin.empty(0.9, 0.5, seed = 7)
    (1 to 500).foreach(i => CountMin.update(dense, i.toLong, 1L))
    assert(CountMin.toWire(dense) eq dense,
      "saturated sketch must ship dense")
  }

  // ---- KLL -------------------------------------------------------------------

  test("kll quantiles within rank-error bound vs exact") {
    val k = 200
    val n = 100000
    val r = new Random(5)
    val data = Array.fill(n)(r.nextGaussian() * 100 + 50)
    val s = Kll.empty(k)
    data.foreach(s.update)
    assert(s.n == n)
    val sorted = data.sorted
    val eps = 3 * s.rankErrorBound
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      // rank of the estimate in the exact data must be within eps of q
      val rank = sorted.count(_ < est).toDouble / n
      assert(math.abs(rank - q) <= eps, s"q=$q est=$est rank=$rank eps=$eps")
    }
    assert(s.quantile(0.0) == sorted.head && s.quantile(1.0) == sorted.last)
  }

  test("kll merge keeps rank-error bound and total count") {
    val r = new Random(6)
    val parts = Array.fill(10)(Array.fill(5000)(r.nextDouble() * 1000))
    val sketches = parts.map { p =>
      val s = Kll.empty(200); p.foreach(s.update); s
    }
    val merged = sketches.reduce(_.merge(_))
    val all = parts.flatten.sorted
    assert(merged.n == all.length)
    val eps = 3 * merged.rankErrorBound
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val rank = all.count(_ < merged.quantile(q)).toDouble / all.length
      assert(math.abs(rank - q) <= eps, s"q=$q rank=$rank")
    }
  }

  test("kll codec round-trips") {
    val s = Kll.empty(128)
    (1 to 10000).foreach(i => s.update(i.toDouble))
    val back = Kll.fromBytes(s.toBytes)
    assert(back.n == s.n && back.quantile(0.5) == s.quantile(0.5))
    // continues to accept updates after round-trip
    back.update(1.0)
    assert(back.n == s.n + 1)
  }

  // ---- TDigest -----------------------------------------------------------------

  test("tdigest quantiles accurate, tails tighter") {
    val n = 200000
    val r = new Random(8)
    val data = Array.fill(n)(math.exp(r.nextGaussian())) // skewed
    val t = TDigest.empty(100)
    data.foreach(t.update)
    val sorted = data.sorted
    for ((q, eps) <- Seq(0.001 -> 0.002, 0.01 -> 0.005, 0.5 -> 0.02,
        0.99 -> 0.005, 0.999 -> 0.002)) {
      val est = t.quantile(q)
      val rank = sorted.count(_ < est).toDouble / n
      assert(math.abs(rank - q) <= eps, s"q=$q rank=$rank")
    }
  }

  test("tdigest merge keeps accuracy and weight") {
    val r = new Random(10)
    val parts = Array.fill(8)(Array.fill(20000)(r.nextDouble() * 100))
    val ds = parts.map { p => val t = TDigest.empty(100); p.foreach(t.update); t }
    val merged = ds.reduce(_.merge(_))
    val all = parts.flatten.sorted
    assert(math.abs(merged.totalWeight - all.length) < 1e-6)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val rank = all.count(_ < merged.quantile(q)).toDouble / all.length
      assert(math.abs(rank - q) <= 0.03, s"q=$q rank=$rank")
    }
  }

  test("kll two-sample KS distance tracks the exact statistic") {
    val r = new Random(13)
    val xs = Array.fill(30000)(r.nextDouble() * 100.0)
    val ys = Array.fill(20000)(r.nextDouble() * 100.0 + 25.0) // shifted
    def sketch(v: Array[Double]): Kll = {
      val s = Kll.empty(200); v.foreach(s.update); s
    }
    // exact KS over the union of values (step CDFs jump only at values)
    def exactKs(a: Array[Double], b: Array[Double]): Double = {
      val sa = a.sorted; val sb = b.sorted
      (sa ++ sb).distinct.map { v =>
        val fa = sa.count(_ <= v).toDouble / sa.length
        val fb = sb.count(_ <= v).toDouble / sb.length
        math.abs(fa - fb)
      }.max
    }
    val slack = 3 * (2.296 / 200 + 2.296 / 200)
    val est = Kll.ksDistance(sketch(xs), sketch(ys))
    assert(math.abs(est - exactKs(xs, ys)) <= slack,
      s"est=$est exact=${exactKs(xs, ys)}")
    // identical distribution: KS near zero
    val same = Kll.ksDistance(sketch(xs), sketch(xs.reverse))
    assert(same <= slack, s"same-dist KS=$same")
    intercept[IllegalArgumentException] {
      Kll.ksDistance(sketch(xs), Kll.empty(200))
    }
  }

  test("tdigest trimmed mean tracks the exact rank-windowed mean") {
    val r = new Random(5)
    val xs = Array.fill(20000)(r.nextDouble() * 1000.0)
    val t = TDigest.empty(100)
    xs.foreach(t.update)
    val sorted = xs.sorted
    val lo = xs.length / 10; val hi = 9 * xs.length / 10
    val exact = sorted.slice(lo, hi).sum / (hi - lo)
    val est = t.trimmedMean(0.1, 0.9)
    assert(math.abs(est - exact) <= 0.01 * (sorted.last - sorted.head),
      s"est=$est exact=$exact")
    // the untrimmed window recovers the overall mean (centroid means are
    // exact weighted averages of the inputs, modulo fp accumulation)
    val mean = xs.sum / xs.length
    assert(math.abs(t.trimmedMean(0.0, 1.0) - mean) <= 1e-6 * math.abs(mean))
    intercept[IllegalArgumentException] { t.trimmedMean(0.9, 0.1) }
  }

  test("tdigest codec round-trips") {
    val t = TDigest.empty(100)
    (1 to 50000).foreach(i => t.update(i.toDouble))
    val back = TDigest.fromBytes(t.toBytes)
    assert(math.abs(back.quantile(0.5) - t.quantile(0.5)) < 1e-9)
    assert(back.totalWeight == t.totalWeight)
  }

  // ---- SpaceSaving / Misra–Gries -------------------------------------------

  /** Zipf-ish stream: key "k<i>" with frequency ∝ 1/(i+1); returns the
    * stream plus exact counts. */
  private def zipfStream(n: Int, keys: Int, seed: Long)
      : (Array[String], Map[String, Long]) = {
    val r = new Random(seed)
    val hn = (1 to keys).map(1.0 / _).sum
    val stream = Array.fill(n) {
      // inverse CDF over harmonic weights
      val u = r.nextDouble() * hn
      var cum = 0.0
      var k = 0
      while (k < keys - 1 && { cum += 1.0 / (k + 1); cum < u }) k += 1
      s"k$k"
    }
    (stream, stream.groupBy(identity).view.mapValues(_.length.toLong).toMap)
  }

  test("spacesaving: published MG guarantees on a skewed stream") {
    val m = 8
    val (stream, exact) = zipfStream(50000, 200, seed = 42)
    val s = SpaceSaving.empty(m)
    stream.foreach(s.update(_))
    val n = stream.length.toLong
    assert(s.n == n, "total weight conserved")
    assert(s.counts.size <= 2 * m)
    assert(s.dec * (m + 1) <= n, "dec <= N/(m+1)")
    exact.foreach { case (k, cnt) =>
      val est = s.estimate(k)
      assert(est <= cnt, s"$k overcounts: est=$est exact=$cnt")
      assert(cnt - est <= s.dec, s"$k busts dec certificate")
      if (cnt * (m + 1) > n)
        assert(est > 0, s"heavy hitter $k (cnt=$cnt) evicted")
    }
    // top-k enumeration is est-desc, key-asc and bounded
    val top = s.topK(m)
    assert(top.size <= m)
    assert(top == top.sortBy { case (k, c) => (-c, k) })
  }

  test("spacesaving: merged parts keep all guarantees (mergeable summaries)") {
    val m = 8
    val (stream, exact) = zipfStream(60000, 300, seed = 7)
    val parts = stream.grouped(9173).map(_.toSeq).toSeq
    def sk(p: Seq[String]): SpaceSaving = {
      val s = SpaceSaving.empty(m); p.foreach(s.update(_)); s
    }
    // two association orders — both must satisfy the deterministic bounds
    val left = parts.map(sk).reduceLeft(_.merge(_))
    val right = parts.map(sk).reduceRight((a, b) => b.merge(a))
    val n = stream.length.toLong
    for (s <- Seq(left, right)) {
      assert(s.n == n)
      assert(s.dec * (m + 1) <= n)
      exact.foreach { case (k, cnt) =>
        val est = s.estimate(k)
        assert(est <= cnt)
        assert(cnt - est <= s.dec)
        if (cnt * (m + 1) > n) assert(est > 0, s"heavy $k evicted post-merge")
      }
    }
  }

  test("spacesaving: weighted updates keep the MG bounds with N = total weight") {
    val m = 8
    val r = new Random(11)
    // skewed keys with independent weights 1..50
    val rows = Array.fill(30000)((s"k${r.nextInt(r.nextInt(120) + 1)}",
      (r.nextInt(50) + 1).toLong))
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = rows.map(_._2).sum
    // split into parts, merge both association orders
    val parts = rows.grouped(7919).map(_.toSeq).toSeq
    def sk(p: Seq[(String, Long)]): SpaceSaving = {
      val s = SpaceSaving.empty(m); p.foreach { case (k, c) => s.update(k, c) }; s
    }
    val whole = sk(rows.toSeq)
    val merged = parts.map(sk).reduceLeft(_.merge(_))
    for (s <- Seq(whole, merged)) {
      assert(s.n == w, "total weight conserved")
      assert(s.dec * (m + 1) <= w, "dec <= W/(m+1)")
      exact.foreach { case (k, cnt) =>
        val est = s.estimate(k)
        assert(est <= cnt, s"$k overcounts: est=$est exact=$cnt")
        assert(cnt - est <= s.dec, s"$k busts dec certificate")
        if (cnt * (m + 1) > w) assert(est > 0, s"heavy $k (w=$cnt) evicted")
      }
    }
  }

  test("spacesaving codec round-trips (counts, n, dec, capacity)") {
    val s = SpaceSaving.empty(5)
    Seq("a", "b", "a", "c", "a", "d", "b", "e", "f", "g", "a")
      .foreach(s.update(_))
    val back = SpaceSaving.fromBytes(s.toBytes)
    assert(back.capacity == s.capacity && back.n == s.n && back.dec == s.dec)
    assert(back.counts == s.counts)
  }

  test("hll union estimate within bound; intersection by inclusion-exclusion") {
    val p = 12
    val a = hashes(30000, 21)
    val b = a.take(10000) ++ hashes(20000, 22) // ~1/3 overlap
    val (ha, hb) = (Hll.empty(p), Hll.empty(p))
    a.foreach(Hll.update(ha, _)); b.foreach(Hll.update(hb, _))
    val exactUnion = (a ++ b).distinct.length
    val est = graft.functions.SketchOps.hllUnionEstimate(ha, hb)
    assert(math.abs(est - exactUnion) <= 3 * Hll.stdError(p) * exactUnion + 2,
      s"union est=$est exact=$exactUnion")
    // must not mutate its inputs (Catalyst may re-evaluate)
    assert(math.abs(Hll.estimate(ha) - a.distinct.length) <=
      3 * Hll.stdError(p) * a.distinct.length + 2, "left input mutated")
    val exactInter = a.toSet.intersect(b.toSet).size
    val interEst = Hll.estimate(ha) + Hll.estimate(hb) - est
    assert(math.abs(interEst - exactInter) <=
      9 * Hll.stdError(p) * exactUnion + 6, // three estimates' errors add
      s"intersection est=$interEst exact=$exactInter")
  }
}
