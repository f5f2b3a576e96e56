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

  property("syncmers are deterministic and seed-sensitive") =
    forAll(texts, params) { case (txt, (k, s, t)) =>
      val u = UTF8String.fromString(txt)
      val a = set(TextOps.syncmerHashes(u, k, s, t, 7L))
      val b = set(TextOps.syncmerHashes(u, k, s, t, 7L))
      val other = set(TextOps.syncmerHashes(u, k, s, t, 99L))
      a == b && (a.isEmpty || txt.length < k + 4 || a != other ||
        a.size <= 2) // different seed moves minima except on tiny inputs
    }
}
