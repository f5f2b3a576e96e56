package graft

import graft.functions.Thresholds
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ThresholdsSpec extends AnyFunSuite with SparkTestBase {
  test("inverse normal cdf matches known quantiles within 5e-4") {
    val known = Seq(0.5 -> 0.0, 0.975 -> 1.959964, 0.995 -> 2.575829,
      0.025 -> -1.959964, 0.8413447 -> 1.0)
    known.foreach { case (p, z) =>
      assert(math.abs(Thresholds.inverseNormalCdf(p) - z) < 5e-4, s"p=$p")
    }
  }

  test("kmer lower bound is monotone and sane") {
    val n = 1000L
    assert(Thresholds.kmerLowerBound(n, 8, 0.0) == n)
    val b4 = Thresholds.kmerLowerBound(n, 8, 0.04)
    val b15 = Thresholds.kmerLowerBound(n, 8, 0.15)
    assert(b4 > b15 && b15 >= 0, s"b4=$b4 b15=$b15")
    assert(b4 < n)
    // empirically: simulate mutations, check the bound holds ~95% of time
    val r = new Random(1)
    val k = 8
    val trials = (1 to 200).count { _ =>
      // a read of length n+k-1 with iid errors; count intact k-mers
      val errs = Array.fill(1000 + k - 1)(r.nextDouble() < 0.04)
      val intact = (0 until 1000).count(i => !(i until i + k).exists(errs))
      intact >= b4
    }
    assert(trials >= 180, s"bound violated too often: $trials/200")
  }

  test("percentage and fp correction") {
    assert(Thresholds.percentage(1000, 0.1) == 100)
    assert(Thresholds.percentage(3, 0.1) == 1)
    assert(Thresholds.fpCorrection(1000, 0.0039) == 4)
    assert(Thresholds.minMatches(1000, Thresholds.Percentage(0.1),
      sketchFpr = 0.0039) == 104)
  }

  test("fracminhash bound is per observed hash, slightly wider CI than kmer") {
    // same number of PROBED hashes: the fracminhash bound reconstructs the
    // unscaled count for the variance and must sit at/below the plain kmer
    // bound (extra sampling variance), but in the same ballpark
    val kmer = Thresholds.minMatches(1000, Thresholds.KmerCI(8, 0.04))
    val fm = Thresholds.minMatches(1000,
      Thresholds.FracMinHashCI(8, 0.04, scale = 10))
    // never above the expected-containment ceiling for the probed count...
    val ceiling = math.floor(math.pow(1.0 - 0.04, 8) * 1000).toLong
    assert(fm > 0 && fm <= ceiling, s"fm=$fm ceiling=$ceiling")
    // ...and in the same ballpark as the plain kmer bound (the larger
    // reconstructed unscaled n tightens the relative CI, so fm may exceed
    // the small-n kmer bound slightly)
    assert(fm >= (0.8 * kmer).toLong && fm <= (1.2 * kmer).toLong,
      s"kmer=$kmer fm=$fm")
  }

  test("syncmer table parity with the reference at sampled (k, error) points") {
    // indexing identical to syncmer_model.hpp:38-50:
    // row = ceil((1-e)*100 - 80); col = k-10-(k-10)/2-1
    assert(Thresholds.syncmerMatchRatio(12, 0.0) == 1.0) // row 20, col 0
    assert(Thresholds.syncmerMatchRatio(12, 0.2) == 0.552077) // row 0, col 0
    assert(Thresholds.syncmerMatchRatio(30, 0.1) == 0.139616) // row 10, col 9
    assert(Thresholds.syncmerMatchRatio(16, 0.05) == 0.552085) // row 15, col 2
    assert(Thresholds.syncmerMatchRatio(20, 0.12) == 0.206963) // row 8, col 4
    // dispatcher: truncating count*ratio, NO fp correction in this branch
    // (threshold.hpp:57-61 returns before the correction applies)
    assert(Thresholds.minMatches(100, Thresholds.SyncmerTable(12, 0.1)) == 57)
    assert(Thresholds.minMatches(100, Thresholds.SyncmerTable(12, 0.1),
      sketchFpr = 0.0039) == 57)
    intercept[IllegalArgumentException](Thresholds.syncmerMatchRatio(13, 0.1))
    intercept[IllegalArgumentException](Thresholds.syncmerMatchRatio(12, 0.3))
  }

  test("column dispatcher parity with scalar minMatches (all 4 modes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ns = (Seq(1L, 2L, 5L) ++ (1 to 40).map(i => (i * i * 7 + 3).toLong))
      .distinct
    val df = ns.toDF("n")
    val modes = Seq(
      Thresholds.Percentage(0.1),
      Thresholds.KmerCI(8, 0.05),
      Thresholds.FracMinHashCI(8, 0.05, 16),
      Thresholds.SyncmerTable(12, 0.1))
    for (m <- modes; fpr <- Seq(0.0, 0.0039)) {
      val got = df
        .select(col("n"), Thresholds.minMatchesCol(col("n"), m, fpr).as("t"))
        .as[(Long, Long)].collect().toMap
      ns.foreach { n =>
        val want = Thresholds.minMatches(n, m, fpr)
        assert(math.abs(got(n) - want) <= 1,
          s"mode=$m fpr=$fpr n=$n got=${got(n)} want=$want")
      }
    }
  }

  test("kmer variance matches the published closed form at a spot value") {
    // n=1000, k=8, r=0.05: direct evaluation of the reference formula
    val q = 1.0 - math.pow(0.95, 8)
    val byHand = 1000 * (1 - q) * (q * (16 + 40 - 1) - 16) +
      8 * 7 * math.pow(1 - q, 2) +
      (2 * (1 - q) / 0.0025) * ((1 + 7 * (1 - q)) * 0.05 - q)
    assert(math.abs(Thresholds.varNmutKmer(1000, 8, 0.05) - byHand) < 1e-9)
  }
}
