package graft.operators

import graft.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated join pruning.
  *
  * At 100 TB the dominant join cost is shuffling probe-side rows that can
  * never match — a Bloom filter of the build side's keys, broadcast as ONE
  * fixed-size blob and evaluated row-locally BEFORE the exchange, removes
  * them at scan speed. False positives only pass extra rows into the join,
  * which discards them — the result is EXACT (byte-equality oracle), only
  * the pruning rate is probabilistic. This is the same build→probe shape as
  * the reference's filter-then-verify classification
  * (/root/reference/src/main/taxor_search.cpp: Bloom probe gates the exact
  * count), re-aimed at relational joins; Spark's own runtime bloom-filter
  * injection (InjectRuntimeFilter) applies the identical idea when its
  * heuristics fire — this operator makes it explicit, deterministic
  * (seeded), and available on any column expression.
  */
object Joins {
  /** Build the filter blob with ONE aggregate over the build side and
    * apply it as a probe-side predicate via the SIZE-AWARE scalar-blob
    * route (`bloom_contains_routed`, the measured SURVEY §9 boundary):
    *
    *  - below ~1 MB the blob embeds as a binary LITERAL — it lands in the
    *    codegen references array and is probed in place, zero per-row
    *    copies, riding the task binary once per stage. (The earlier
    *    crossJoin(broadcast(blob)) form was quadratic in disguise: the
    *    probe predicate read the blob out of the joined UnsafeRow and
    *    `getBinary` COPIES — ~95 KB × every scanned row ⇒ tens of GB of
    *    memcpy at sf0.1, measured as the dominant CPU of
    *    join_bloom_pruned);
    *  - above the boundary (a build side of ~1e9 keys at fpp 0.0039 is a
    *    ~1.7 GB filter) a Literal is itself the scale-killer — Catalyst
    *    re-hashes a Literal's full bytes per tree compare and
    *    re-serializes it into every stage's task binary — so the blob
    *    travels as a TorrentBroadcast handle resolved at analysis time
    *    (the IxfBlobs token route), released as soon as the plan is
    *    constructed. */
  private def bloomFiltered(
      probe: DataFrame, build: DataFrame, key: String, expectedKeys: Long,
      fpp: Double, seed: Long): DataFrame = {
    val blob = build
      .agg(bloom_agg_hashed(xxhash64(col(key)), expectedKeys, fpp, seed))
      .first().getAs[Array[Byte]](0)
    val (pred, release) =
      bloom_contains_routed(probe.sparkSession, blob, xxhash64(col(key)))
    try probe.where(pred) finally release()
  }

  /** Inner-join `probe` with `build`, pre-filtering the probe side with a
    * Bloom filter of the build side's join keys, applied as a codegen'd
    * row-local predicate before the shuffle — at selectivity s only
    * ~(s + fpp) of probe rows reach the exchange.
    *
    * @param expectedKeys sizing for the filter (distinct build keys); use
    *                     an HLL pre-pass or domain knowledge at scale.
    */
  def bloomPrunedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      expectedKeys: Long = 1 << 16,
      fpp: Double = 0.0039,
      seed: Long = DefaultSeed): DataFrame =
    bloomFiltered(probe, build, key, expectedKeys, fpp, seed).join(build, key)

  /** The pruning predicate alone — for callers composing their own join
    * (different join types, multi-key, or pre-shuffle placement in a larger
    * plan): returns `probe` with non-members of `build`'s key set removed
    * (false-positive rate `fpp` of non-members survive; all members do). */
  def bloomSemiFilter(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      expectedKeys: Long = 1 << 16,
      fpp: Double = 0.0039,
      seed: Long = DefaultSeed): DataFrame =
    bloomFiltered(probe, build, key, expectedKeys, fpp, seed)
}
