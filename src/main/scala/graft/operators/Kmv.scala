package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct-count sketch over an
  * engine-portable hash.
  *
  * The sketch keeps the k smallest values of a uniform hash of each distinct
  * element; with u_(k) the k-th smallest hash mapped into [0,1), the distinct
  * count is estimated by (k-1)/u_(k) (Bar-Yossef et al. 2002, "Counting
  * distinct elements in a data stream"; sd ≈ |D|/sqrt(k-2)). Unions merge by
  * taking the bottom-k of the two hash sets — the same min-k law as
  * [[Sampling.bottomK]] and the reference's FracMinHash scaling filter
  * (/root/reference/src/main/taxor_build.cpp:335-340), which is the
  * unbounded-k / fixed-threshold cousin of this sketch.
  *
  * Why carry a second distinct sketch next to HLL: the hash is the first 15
  * hex digits of md5("<seed>:<value>") decoded as a BIGINT, so every
  * intermediate — the surviving hash set, the k-th order statistic, and the
  * estimate itself (one IEEE division of integer-derived operands) — is
  * byte-identical in any SQL engine. Unlike the HLL/KLL gates, which can
  * only bound-check estimates, the KMV ESTIMATE is gated byte-exact against
  * DuckDB. That determinism is also what makes it auditable at 100 TB: two
  * independent jobs over the same corpus produce bit-identical sketches
  * regardless of partitioning.
  *
  * Scale shape: one projection to (stratum, hash), a distinct on those two
  * integral/string columns (never on payloads), then a per-stratum bottom-k
  * whose rank predicate Spark pushes into the exchange as a per-partition
  * top-k (WindowGroupLimit) — at most k·partitions rows per stratum cross
  * the wire. Merging is row-local array algebra over ≤2k-element arrays.
  */
object Kmv {
  /** Hashes are 15 hex digits, i.e. uniform in [0, 2^60); 2^60 is a power
    * of two and therefore exact as a Double. */
  val HashSpace: Double = 1152921504606846976.0 // 2^60

  /** (k-1)·2^60 as the exact-Double numerator of the estimator; its
    * toString round-trips through DuckDB's strtod (CLAUDE.md convention),
    * so both engines divide the same numerator by the same integer. */
  def numerator(k: Int): Double = (k - 1).toDouble * HashSpace

  /** Spark Column: BIGINT hash of `id` (rendered via cast to string, so it
    * must be an integral or string column — floats don't render portably). */
  def hash(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** The same hash as portable SQL over a column expression `idSql` that is
    * already a VARCHAR. DuckDB has no hex→int conversion, so the decode is
    * a fixed 15-term digit polynomial via instr/substr — verbatim runnable
    * in Spark SQL too (instr argument order agrees). */
  def hashSql(idSql: String, seed: String): String = {
    val md = s"substr(md5(concat('$seed:', $idSql)), 1, 15)"
    decodeHexSql(md)
  }

  /** Decode a 15-hex-digit string expression to BIGINT, portably. */
  def decodeHexSql(hexSql: String): String =
    (1 to 15).map { i =>
      val pow = java.math.BigInteger.valueOf(16).pow(15 - i)
      s"(instr('0123456789abcdef', substr($hexSql, $i, 1)) - 1) * CAST($pow AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Build one sketch per stratum: output (strataCols*, ks ARRAY<BIGINT>
    * ascending, |ks| ≤ k). Distinct elements with colliding 60-bit hashes
    * collapse — by design, identically in every engine. */
  def sketch(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int,
      seed: String = "graft"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df
      .select(strataCols.map(col) :+ hash(col(idCol), seed).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(col("h"))
    hashed.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .groupBy(strataCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("ks"))
  }

  /** Merge two sketches' hash arrays: bottom-k of the union. Row-local. */
  def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch array. |ks| < k means every
    * distinct hash survived, so the count is exact (to hash collisions). */
  def estimate(ks: Column, k: Int): Column =
    when(size(ks) < k, size(ks).cast("double"))
      .otherwise(lit(numerator(k)) / element_at(ks, k).cast("double"))

  /** The estimate as portable SQL over `cntSql` (number of surviving
    * hashes, BIGINT) and `hkSql` (k-th smallest hash, BIGINT) — the same
    * expression tree as [[estimate]], so the doubles gate byte-exact. */
  def estimateSql(cntSql: String, hkSql: String, k: Int): String =
    s"CASE WHEN $cntSql < $k THEN CAST($cntSql AS DOUBLE) " +
      s"ELSE ${numerator(k)} / CAST($hkSql AS DOUBLE) END"

  // ---- set operations beyond union (theta-sketch-style) --------------------
  //
  // The union sketch U = bottom-k(A ∪ B) is an unbiased size-|U| sample of
  // the distinct union (every distinct element's hash is an iid uniform;
  // the |U| smallest are a uniform without-replacement sample). Jaccard is
  // estimated by the shared fraction WITHIN that sample (the Mash /
  // MinHash bottom-k estimator, Ondov et al. 2016; Cohen 2014 reviews the
  // theta-sketch view): j = |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|, and the
  // intersection follows as j · est(U). Everything up to the two final
  // IEEE operations (one division of integer-derived operands, one
  // multiplication of the two resulting doubles) is integer set algebra
  // over the hash arrays, so BOTH estimates gate byte-exact cross-engine —
  // the auditable counterpart of hll_union_estimate's bound-only posture.

  /** Count of union-sample hashes present in BOTH input sketches: the
    * Jaccard numerator. Row-local array algebra over ≤k-element arrays.
    * The intersect with `merged` matters: a hash in A ∩ B but above the
    * union's k-th order statistic is outside the sample and must not
    * count. */
  def sharedInUnion(a: Column, b: Column, k: Int): Column =
    size(array_intersect(merge(a, b, k), array_intersect(a, b)))

  /** Jaccard estimate from two sketches: shared/|U|, one IEEE division of
    * integer operands (byte-exact portable). Empty-universe pairs (both
    * sketches empty) yield 0.0 rather than NaN. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val u = merge(a, b, k)
    when(size(u) === 0, lit(0.0))
      .otherwise(sharedInUnion(a, b, k).cast("double") /
        size(u).cast("double"))
  }

  /** Intersection-cardinality estimate: jaccard · union estimate — the
    * product of two doubles each derived from integers by one correctly-
    * rounded IEEE op, so it too gates byte-exact when the SQL twin keeps
    * the same association (see [[intersectionEstimateSql]]). */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column =
    jaccardEstimate(a, b, k) * estimate(merge(a, b, k), k)

  /** [[jaccardEstimate]] as portable SQL over `sharedSql` (BIGINT count of
    * union-sample hashes in both sides) and `cntSql` (|U|, BIGINT). */
  def jaccardEstimateSql(sharedSql: String, cntSql: String): String =
    s"CASE WHEN $cntSql = 0 THEN 0.0 " +
      s"ELSE CAST($sharedSql AS DOUBLE) / CAST($cntSql AS DOUBLE) END"

  /** [[intersectionEstimate]] as portable SQL — jaccard × union estimate,
    * same left-to-right association as the Column form. */
  def intersectionEstimateSql(
      sharedSql: String, cntSql: String, hkSql: String, k: Int): String =
    s"(${jaccardEstimateSql(sharedSql, cntSql)}) * " +
      s"(${estimateSql(cntSql, hkSql, k)})"

  /** Directional containment estimate |A ∩ B| / |A| — the decontamination
    * question ("what fraction of the eval set also appears in train") that
    * Jaccard, being symmetric, cannot answer: a tiny eval fully inside a
    * huge train has Jaccard ≈ 0 but containment-of-eval = 1. One further
    * IEEE division on top of [[intersectionEstimate]], all operands
    * integer-derived, so it gates byte-exact like the others when the SQL
    * twin keeps the association (intersection) / (estimate-of-A). */
  def containmentEstimate(a: Column, b: Column, k: Int): Column =
    intersectionEstimate(a, b, k) / estimate(a, k)

  /** [[containmentEstimate]] as portable SQL. `cntASql`/`hkASql` describe
    * side A's OWN sketch (not the union sample). */
  def containmentEstimateSql(
      sharedSql: String, cntSql: String, hkSql: String, k: Int,
      cntASql: String, hkASql: String): String =
    s"(${intersectionEstimateSql(sharedSql, cntSql, hkSql, k)}) / " +
      s"(${estimateSql(cntASql, hkASql, k)})"
}
