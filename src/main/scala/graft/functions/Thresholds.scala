package graft.functions

/** Statistical match-threshold models — the reference's confidence-interval
  * machinery re-derived from its published formulas
  * (/root/reference/src/hixf/search/threshold.hpp:22-81, kmer_model.cpp:10-47,
  * fracminhash_model.cpp:9-33, gaussian_inverse.cpp:12-51).
  *
  * Given a query's token-hash count, these return the minimum number of
  * matching hashes required to call a group a hit at the configured error
  * rate / confidence — used as the `minFraction`/absolute floor of the
  * Classify pipelines.
  */
object Thresholds {
  /** Inverse standard-normal CDF, Abramowitz & Stegun 26.2.23 rational
    * approximation (|error| < 4.5e-4) — the same public formula the
    * reference implements. */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1, s"p out of range: $p")
    def rational(t: Double): Double = {
      val (c0, c1, c2) = (2.515517, 0.802853, 0.010328)
      val (d1, d2, d3) = (1.432788, 0.189269, 0.001308)
      t - (c0 + c1 * t + c2 * t * t) /
        (1.0 + d1 * t + d2 * t * t + d3 * t * t * t)
    }
    if (p < 0.5) -rational(math.sqrt(-2.0 * math.log(p)))
    else rational(math.sqrt(-2.0 * math.log(1.0 - p)))
  }

  /** Variance of the number of mutated k-mers among n under iid per-base
    * error rate r (Blanca et al. model; the exact published formula the
    * reference implements, kmer_model.cpp:32-41). */
  def varNmutKmer(n: Long, k: Int, r: Double): Double = {
    val q = 1.0 - math.pow(1.0 - r, k)
    val nD = n.toDouble
    nD * (1.0 - q) * (q * (2.0 * k + 2.0 / r - 1.0) - 2.0 * k) +
      k * (k - 1.0) * math.pow(1.0 - q, 2.0) +
      (2.0 * (1.0 - q) / (r * r)) * ((1.0 + (k - 1.0) * (1.0 - q)) * r - q)
  }

  /** k-mer mutation model (SF7): a read with per-base error rate r keeps a
    * k-mer intact with prob (1-r)^k; the expected number of mutated k-mers
    * among n is nq with q = 1-(1-r)^k. Returns the *lower* bound of
    * surviving (matching) k-mers at the given confidence. */
  def kmerLowerBound(n: Long, k: Int, errorRate: Double,
      confidence: Double = 0.95): Long = {
    if (errorRate <= 0) return n
    val q = 1.0 - math.pow(1.0 - errorRate, k)
    val z = inverseNormalCdf(1.0 - (1.0 - confidence) / 2.0)
    val nD = n.toDouble
    val sd = math.sqrt(math.max(0.0, varNmutKmer(n, k, errorRate)))
    val mutatedHigh = nD * q + z * sd
    math.max(0L, math.floor(nD - mutatedHigh).toLong)
  }

  /** FracMinHash containment CI (SF8, fracminhash_model.cpp:14-31):
    * expected containment C = (1-r)^k; variance combines the k-mer mutation
    * variance with the scaled-sampling term. `nScaled` is the OBSERVED
    * (already downsampled) hash count of the query; the unscaled count is
    * reconstructed as nScaled*scale for the variance. Returns the lower
    * bound of matches among the observed scaled hashes. */
  def fracMinHashLowerBound(nScaled: Long, k: Int, errorRate: Double,
      scale: Long, confidence: Double = 0.95): Long = {
    if (errorRate <= 0) return nScaled
    if (scale <= 1) return kmerLowerBound(nScaled, k, errorRate, confidence)
    val s = 1.0 / scale
    val n = nScaled * scale // unscaled k-mer count estimate
    val nD = n.toDouble
    val expC = math.pow(1.0 - errorRate, k)
    val q = 1.0 - expC
    val expNmut = nD * q
    val varNmut = math.max(0.0, varNmutKmer(n, k, errorRate))
    val expNmutSq = expNmut * expNmut + varNmut
    val term3 = varNmut / (nD * nD)
    val term2 = nD * expNmut - expNmutSq
    val denom = s * nD * nD * nD *
      math.pow(1.0 - math.pow(1.0 - s, nD), 2.0)
    val varC = math.max(0.0, (1.0 - s) / denom * term2 + term3)
    val z = inverseNormalCdf(1.0 - (1.0 - confidence) / 2.0)
    val cLow = expC - z * math.sqrt(varC)
    math.max(0L, math.floor(cLow * nScaled).toLong)
  }

  /** Fixed-percentage threshold (the reference's default mode). */
  def percentage(n: Long, fraction: Double): Long =
    math.max(1L, math.ceil(n * fraction).toLong)

  /** False-positive correction: expected sketch false positives among n
    * probes (the reference adds count*fpr slack, taxor_search.cpp:262). */
  def fpCorrection(n: Long, fpr: Double): Long = math.ceil(n * fpr).toLong

  sealed trait Mode
  case class Percentage(fraction: Double) extends Mode
  case class KmerCI(k: Int, errorRate: Double, confidence: Double = 0.95)
      extends Mode
  case class FracMinHashCI(k: Int, errorRate: Double, scale: Long,
      confidence: Double = 0.95) extends Mode

  /** SF10 dispatcher: minimum matches required for `n` query hashes, where
    * `n` is always the number of hashes actually probed (for FracMinHashCI
    * that is the observed downsampled count — the fp correction then
    * applies to the same probe count, as in taxor_search.cpp:262). */
  def minMatches(n: Long, mode: Mode, sketchFpr: Double = 0.0): Long = {
    val base = mode match {
      case Percentage(f) => percentage(n, f)
      case KmerCI(k, e, c) => kmerLowerBound(n, k, e, c)
      case FracMinHashCI(k, e, s, c) => fracMinHashLowerBound(n, k, e, s, c)
    }
    base + (if (sketchFpr > 0) fpCorrection(n, sketchFpr) else 0L)
  }
}
