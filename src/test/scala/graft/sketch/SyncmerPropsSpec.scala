package graft.sketch

import graft.functions.TextOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties of the open-syncmer tokenizer. The defining
  * invariant: the predicate depends only on a k-gram's own bytes, so over
  * offsets t = 0..k-s the syncmer sets PARTITION the full distinct-shingle
  * set — every k-gram's minimal s-gram sits at exactly one offset.
  */
object SyncmerPropsSpec extends Properties("SyncmerProps") {
  private val texts: Gen[String] = for {
    n <- Gen.choose(0, 300)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
  } yield cs.mkString

  private val params: Gen[(Int, Int, Int)] = for {
    k <- Gen.choose(4, 16)
    s <- Gen.choose(1, k - 1)
    t <- Gen.choose(0, k - s)
  } yield (k, s, t)

  private def set(a: org.apache.spark.sql.catalyst.util.ArrayData): Set[Long] =
    a.toLongArray().toSet

  property("syncmer sets partition the shingle set across offsets") =
    forAll(texts, params) { case (txt, (k, s, _)) =>
      val u = UTF8String.fromString(txt)
      val all = set(TextOps.shingleHashes(u, k, 7L, 1L))
      val perT = (0 to k - s).map(t =>
        set(TextOps.syncmerHashes(u, k, s, t, 7L)))
      perT.forall(_.subsetOf(all)) &&
        perT.foldLeft(Set.empty[Long])(_ ++ _) == all &&
        perT.map(_.size).sum == all.size // disjoint (context-free predicate)
    }

  property("syncmers are deterministic") =
    forAll(texts, params) { case (txt, (k, s, t)) =>
      val u = UTF8String.fromString(txt)
      set(TextOps.syncmerHashes(u, k, s, t, 7L)) ==
        set(TextOps.syncmerHashes(u, k, s, t, 7L))
    }

  property("seed changes WHICH k-grams are selected (fixed fixture)") = {
    // hash values trivially differ with the seed; the real claim is that
    // the SELECTION moves — compare the per-offset partition SIZE profile,
    // which is invariant to hash relabeling, across seeds on a long text
    val u = UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog 0123456789 " * 5)
    def profile(seed: Long): Seq[Int] =
      (0 to 4).map(t =>
        TextOps.syncmerHashes(u, 8, 4, t, seed).numElements())
    org.scalacheck.Prop(profile(7L) != profile(99L)) :|
      s"profiles: ${profile(7L)} vs ${profile(99L)}"
  }
}
