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

  /** SF9 — the reference's empirical open-syncmer matching-ratio table
    * (/root/reference/src/hixf/search/syncmer_model.hpp:14-50, data
    * constants reproduced verbatim with the same indexing): rows are read
    * accuracies 80%..100% in 1% steps, columns are even k-mer sizes
    * 12,14,...,30. Cell = minimal fraction of a read's syncmers expected to
    * survive at that error rate. */
  private val SyncmerMatchingRatios: Array[Array[Double]] = Array(
    Array(0.552077, 0.195989, 0.151428, 0.118475, 0.0946177, 0.0797244, 0.0604658, 0.0480255, 0.0367569, 0.0252911),
    Array(0.552385, 0.207533, 0.161204, 0.127368, 0.103704, 0.0881939, 0.0689396, 0.0556991, 0.044185, 0.0298818),
    Array(0.552239, 0.220393, 0.17382, 0.139866, 0.113736, 0.0966358, 0.0783558, 0.0639223, 0.0523452, 0.0389549),
    Array(0.552682, 0.236329, 0.188152, 0.152267, 0.126191, 0.106106, 0.0876917, 0.0730642, 0.0621864, 0.0489249),
    Array(0.553172, 0.254091, 0.202686, 0.165344, 0.137087, 0.116649, 0.098822, 0.0831266, 0.0703342, 0.0582562),
    Array(0.553716, 0.271183, 0.219848, 0.181959, 0.152163, 0.130048, 0.110622, 0.0942414, 0.0810792, 0.0688187),
    Array(0.554532, 0.292154, 0.240059, 0.199738, 0.168952, 0.144956, 0.122726, 0.105878, 0.0940805, 0.0777557),
    Array(0.557957, 0.313553, 0.260912, 0.220014, 0.186567, 0.16101, 0.137399, 0.119867, 0.10453, 0.0900014),
    Array(0.563925, 0.338316, 0.283689, 0.2401, 0.206963, 0.179541, 0.155347, 0.135128, 0.121575, 0.104741),
    Array(0.568519, 0.364594, 0.310373, 0.267578, 0.231083, 0.20088, 0.174376, 0.153111, 0.139339, 0.120042),
    Array(0.579726, 0.395595, 0.338947, 0.295287, 0.258713, 0.22876, 0.200759, 0.175309, 0.161306, 0.139616),
    Array(0.599258, 0.430241, 0.371291, 0.325596, 0.289651, 0.257329, 0.228011, 0.201799, 0.186956, 0.164794),
    Array(0.611572, 0.468953, 0.410482, 0.363923, 0.325828, 0.293046, 0.26167, 0.235216, 0.216716, 0.192162),
    Array(0.624341, 0.510411, 0.452122, 0.407016, 0.370022, 0.334601, 0.303413, 0.275232, 0.254563, 0.227871),
    Array(0.655724, 0.555245, 0.498564, 0.453201, 0.416285, 0.381883, 0.352291, 0.322556, 0.299739, 0.271481),
    Array(0.694872, 0.608367, 0.552085, 0.509395, 0.471692, 0.437803, 0.405938, 0.377117, 0.354352, 0.325132),
    Array(0.742071, 0.669034, 0.613738, 0.57366, 0.539215, 0.50832, 0.476855, 0.449152, 0.42683, 0.397277),
    Array(0.795543, 0.733694, 0.68341, 0.647737, 0.617382, 0.588448, 0.56083, 0.533714, 0.514757, 0.486399),
    Array(0.853121, 0.802585, 0.763169, 0.733734, 0.708902, 0.684331, 0.660171, 0.637633, 0.621567, 0.596993),
    Array(0.918163, 0.882314, 0.854479, 0.835831, 0.819643, 0.804269, 0.788526, 0.771895, 0.763059, 0.742114),
    Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))

  /** SF9 lookup, same indexing as the reference
    * (syncmer_model.hpp:38-50): row = ceil((1-e)*100 - 80),
    * col = k - 10 - (k-10)/2 - 1; k must be even in [12, 30], e in [0, 0.2]. */
  def syncmerMatchRatio(kmerSize: Int, errorRate: Double): Double = {
    require(kmerSize % 2 == 0 && kmerSize >= 12 && kmerSize <= 30,
      s"syncmer table needs even k in [12,30], got $kmerSize")
    require(errorRate >= 0 && errorRate <= 0.2,
      s"syncmer table needs error rate in [0,0.2], got $errorRate")
    val row = math.ceil((1.0 - errorRate) * 100.0 - 80.0).toInt
    val col = kmerSize - 10 - (kmerSize - 10) / 2 - 1
    SyncmerMatchingRatios(row)(col)
  }

  /** varNmutKmer(n) = A·n + B for fixed (k, r) — the affine decomposition
    * the Column dispatcher AND the SQL oracle builder both inline, so the
    * constants stay byte-identical by construction (single definition). */
  def kmerVarAB(k: Int, r: Double): (Double, Double) = {
    val q = 1.0 - math.pow(1.0 - r, k)
    val a = (1.0 - q) * (q * (2.0 * k + 2.0 / r - 1.0) - 2.0 * k)
    val b = k * (k - 1.0) * math.pow(1.0 - q, 2.0) +
      (2.0 * (1.0 - q) / (r * r)) * ((1.0 + (k - 1.0) * (1.0 - q)) * r - q)
    (a, b)
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
  /** SF10's 4th branch (threshold.hpp:57-61): empirical table lookup. */
  case class SyncmerTable(k: Int, errorRate: Double) extends Mode

  /** SF10 dispatcher: minimum matches required for `n` query hashes, where
    * `n` is always the number of hashes actually probed (for FracMinHashCI
    * that is the observed downsampled count — the fp correction then
    * applies to the same probe count, as in taxor_search.cpp:262). The
    * syncmer branch applies NO fp correction and truncates — exactly the
    * reference's `count * ratio` cast (threshold.hpp:57-61). */
  def minMatches(n: Long, mode: Mode, sketchFpr: Double = 0.0): Long =
    mode match {
      case SyncmerTable(k, e) => (n * syncmerMatchRatio(k, e)).toLong
      case other =>
        val base = other match {
          case Percentage(f) => percentage(n, f)
          case KmerCI(k, e, c) => kmerLowerBound(n, k, e, c)
          case FracMinHashCI(k, e, s, c) =>
            fracMinHashLowerBound(n, k, e, s, c)
          case _: SyncmerTable => 0L // unreachable
        }
        base + (if (sketchFpr > 0) fpCorrection(n, sketchFpr) else 0L)
    }

  /** Column form of the SF10 dispatcher: the per-query threshold as a
    * codegen'd Catalyst expression over the probe-count column `n`, so the
    * reference's adaptive CI thresholds run INSIDE the classify plan with
    * no UDF — everything except `n` is a driver constant, and each model is
    * a closed form in n (the k-mer mutation variance is affine in n).
    * Parity with the scalar `minMatches` is within ±1 match (floating-point
    * association differs at expression-tree granularity); asserted in
    * ThresholdsSpec. */
  def minMatchesCol(
      n: org.apache.spark.sql.Column, mode: Mode,
      sketchFpr: Double = 0.0): org.apache.spark.sql.Column = {
    // selective import: functions.mode (the aggregate) shadows our param
    import org.apache.spark.sql.functions.{ceil, floor, greatest, lit, pow, sqrt}
    val nD = n.cast("double")
    def z(c: Double) = inverseNormalCdf(1.0 - (1.0 - c) / 2.0)
    def kmerCol(k: Int, e: Double, c: Double, nn: org.apache.spark.sql.Column) = {
      if (e <= 0) nn.cast("long")
      else {
        val q = 1.0 - math.pow(1.0 - e, k)
        val (a, b) = kmerVarAB(k, e)
        val sd = sqrt(greatest(lit(0.0), nn * a + b))
        greatest(lit(0L),
          floor(nn - (nn * q + sd * z(c))).cast("long"))
      }
    }
    val base = mode match {
      case Percentage(f) => greatest(lit(1L), ceil(nD * f).cast("long"))
      case SyncmerTable(k, e) =>
        floor(nD * syncmerMatchRatio(k, e)).cast("long")
      case KmerCI(k, e, c) => kmerCol(k, e, c, nD)
      case FracMinHashCI(k, e, scale, c) =>
        if (e <= 0) n.cast("long")
        else if (scale <= 1) kmerCol(k, e, c, nD)
        else {
          val s = 1.0 / scale
          val nU = nD * scale.toDouble // unscaled k-mer count estimate
          val expC = math.pow(1.0 - e, k)
          val q = 1.0 - expC
          val (a, b) = kmerVarAB(k, e)
          val varNmut = greatest(lit(0.0), nU * a + b)
          val expNmut = nU * q
          val expNmutSq = expNmut * expNmut + varNmut
          val term3 = varNmut / (nU * nU)
          val term2 = nU * expNmut - expNmutSq
          val denom = nU * nU * nU * s *
            pow(lit(1.0) - pow(lit(1.0 - s), nU), 2.0)
          val varC = greatest(lit(0.0), term2 * (1.0 - s) / denom + term3)
          val cLow = lit(expC) - sqrt(varC) * z(c)
          greatest(lit(0L), floor(cLow * nD).cast("long"))
        }
    }
    val corrected = mode match {
      case _: SyncmerTable => base // reference skips fp correction here
      case _ if sketchFpr > 0 => base + ceil(nD * sketchFpr).cast("long")
      case _ => base
    }
    corrected
  }
}
