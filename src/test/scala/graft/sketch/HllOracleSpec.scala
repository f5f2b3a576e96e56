package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Cross-check our HLL against the independent datasketches-java estimate
  * (test-only oracle; ships in /opt/spark/jars) and against exact counts at
  * a tighter 2-sigma band — the Ertl estimator should be comfortably
  * unbiased across small, mid and large ranges with no case-split seams.
  */
class HllOracleSpec extends AnyFunSuite {
  test("hll tracks exact within 2 sigma across ranges; comparable to datasketches") {
    val p = 12
    val sigma = Hll.stdError(p)
    for (n <- Seq(50, 500, 5000, 50000, 500000, 2000000)) {
      val r = new Random(n)
      val ours = Hll.empty(p)
      val theirs = new org.apache.datasketches.hll.HllSketch(p)
      var i = 0
      var seen = 0L
      while (i < n) {
        val v = r.nextLong()
        Hll.update(ours, v)
        theirs.update(v)
        i += 1
        seen += 1
      }
      val est = Hll.estimate(ours)
      val errOurs = math.abs(est - n) / n
      val errTheirs = math.abs(theirs.getEstimate - n) / n
      assert(errOurs <= 2 * sigma + 2.0 / n,
        s"n=$n est=$est err=$errOurs (2sigma=${2 * sigma})")
      // sanity: same order of accuracy as the independent implementation
      assert(errOurs <= math.max(3 * errTheirs, 3 * sigma),
        s"n=$n ours=$errOurs theirs=$errTheirs")
    }
  }
}
