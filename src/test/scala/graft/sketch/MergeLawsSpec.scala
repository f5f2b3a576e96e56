package graft.sketch

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the associative-merge law the north rule
  * demands of every sketch: merge(a, merge(b, c)) == merge(merge(a, b), c),
  * and sketch(A ++ B) == merge(sketch(A), sketch(B)) for order-insensitive
  * sketches (HLL / Bloom / CMS). KLL and t-digest are compared by estimate
  * (their bytes legitimately differ under re-ordering; SURVEY.md §7.4).
  */
object MergeLawsSpec extends Properties("MergeLaws") {
  private val longs = Gen.listOf(Gen.long)
  private val doubles = Gen.listOf(Gen.choose(-1e6, 1e6))

  property("hll split/merge law") = forAll(longs, longs, longs) { (a, b, c) =>
    def sk(xs: List[Long]*): Array[Byte] = {
      val h = Hll.empty(8); xs.foreach(_.foreach(Hll.update(h, _))); h
    }
    val left = Hll.merge(Hll.merge(sk(a), sk(b)), sk(c))
    val right = Hll.merge(sk(a), Hll.merge(sk(b), sk(c)))
    left.sameElements(right) && left.sameElements(sk(a, b, c))
  }

  property("bloom split/merge law") = forAll(longs, longs) { (a, b) =>
    def sk(xs: List[Long]*): Array[Byte] = {
      val s = Bloom.emptyRaw(4, 512, seed = 1)
      xs.foreach(_.foreach(Bloom.update(s, _))); s
    }
    Bloom.merge(sk(a), sk(b)).sameElements(sk(a, b))
  }

  property("cms split/merge law") = forAll(longs, longs) { (a, b) =>
    def sk(xs: List[Long]*): Array[Byte] = {
      val s = CountMin.emptyRaw(3, 64, seed = 2)
      xs.foreach(_.foreach(CountMin.update(s, _, 1L))); s
    }
    CountMin.merge(sk(a), sk(b)).sameElements(sk(a, b))
  }

  property("kll merge: count conserved, median within bound") =
    forAll(doubles, doubles) { (a, b) =>
      val sa = Kll.empty(64); a.foreach(sa.update)
      val sb = Kll.empty(64); b.foreach(sb.update)
      val merged = sa.merge(sb)
      val all = (a ++ b).sorted
      if (all.isEmpty) Prop.passed
      else {
        val est = merged.quantile(0.5)
        val rank = all.count(_ < est).toDouble / all.length
        Prop(merged.n == all.length) &&
          Prop(math.abs(rank - 0.5) <=
            math.max(3 * merged.rankErrorBound + 1.0 / all.length, 0.25))
      }
    }

  property("tdigest merge: weight conserved, median within bound") =
    forAll(doubles, doubles) { (a, b) =>
      val ta = TDigest.empty(50); a.foreach(ta.update)
      val tb = TDigest.empty(50); b.foreach(tb.update)
      val merged = ta.merge(tb)
      val all = (a ++ b).sorted
      if (all.isEmpty) Prop.passed
      else {
        val est = merged.quantile(0.5)
        val rank = all.count(_ < est).toDouble / all.length
        Prop(math.abs(merged.totalWeight - all.length) < 1e-6) &&
          Prop(math.abs(rank - 0.5) <= math.max(0.3, 6.0 / all.length))
      }
    }

  private val keyLists =
    Gen.listOf(Gen.choose(0, 40).map(i => s"k$i"))

  property("spacesaving merge: bounds hold under both association orders") =
    forAll(keyLists, keyLists, keyLists) { (a, b, c) =>
      val m = 4
      def sk(xs: List[String]): SpaceSaving = {
        val s = SpaceSaving.empty(m); xs.foreach(s.update(_)); s
      }
      val all = a ++ b ++ c
      val exact = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = all.length.toLong
      // MG is not byte-deterministic across splits (prune survivors depend
      // on arrival order) — the LAW is that every published bound holds for
      // every association order, at the combined N
      val orders = Seq(
        sk(a).merge(sk(b).merge(sk(c))),
        sk(a).merge(sk(b)).merge(sk(c)))
      Prop.all(orders.map { s =>
        Prop(s.n == n) &&
          Prop(s.dec * (m + 1) <= n) &&
          Prop(exact.forall { case (k, cnt) =>
            val est = s.estimate(k)
            est <= cnt && cnt - est <= s.dec &&
              (cnt * (m + 1) <= n || est > 0)
          })
      }: _*)
    }

  property("codec round-trip: kll and tdigest survive bytes") =
    forAll(doubles) { xs =>
      val s = Kll.empty(64); xs.foreach(s.update)
      val t = TDigest.empty(50); xs.foreach(t.update)
      val s2 = Kll.fromBytes(s.toBytes)
      val t2 = TDigest.fromBytes(t.toBytes)
      Prop(s2.n == s.n) && Prop(t2.totalWeight == t.totalWeight) &&
        Prop(xs.isEmpty ||
          (s2.quantile(0.5) == s.quantile(0.5) &&
            math.abs(t2.quantile(0.5) - t.quantile(0.5)) < 1e-9))
    }
}
