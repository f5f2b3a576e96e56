package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew armor: explicit two-stage (salted) aggregation.
  *
  * Stage 1 groups by (keys, salt) so one giant group ("split bin",
  * /root/reference/src/hixf/build/hierarchical_build.cpp:91-111) fans out
  * across `buckets` reducers; stage 2 merges the per-salt partial sketches.
  * Because every sketch merge is associative (MergeLawsSpec), the salted
  * result is semantically identical to the unsalted one — SaltedAggSpec
  * proves byte-identity for the order-insensitive sketches.
  *
  * The salt is derived from deterministic row content (hash of all grouping
  * + value columns), never from partition id or RNG, so task retries and
  * different parallelism produce identical results.
  */
object SaltedAgg {
  /** @param partialAggs stage-1 aggregates, each aliased; their outputs feed
    *                    `finalAggs`, which must aggregate those alias names.
    */
  def twoStage(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltOn: Seq[Column],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(buckets >= 1 && partialAggs.nonEmpty && finalAggs.nonEmpty)
    val salted = df.withColumn("__salt", pmod(xxhash64(saltOn: _*), lit(buckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Pick a salt-bucket count from an estimated max group size: one bucket
    * per ~targetRowsPerTask rows of the biggest group (the analogue of the
    * reference's layout search sizing technical bins from HLL estimates,
    * /root/reference/src/main/taxor_build.cpp:168-233).
    */
  def bucketsFor(maxGroupRows: Long, targetRowsPerTask: Long = 1000000L): Int =
    math.max(1, math.min(1024, (maxGroupRows / targetRowsPerTask).toInt))
}
