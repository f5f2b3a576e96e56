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

  /** C3 planning pre-pass: estimate the biggest group cheaply (sampled exact
    * count scaled back up) and pick the salt-bucket count from it. One extra
    * small job; the sample fraction keeps it O(rows·fraction). */
  def planBuckets(
      df: DataFrame,
      keys: Seq[String],
      sampleFraction: Double = 0.02,
      targetRowsPerTask: Long = 1000000L): Int = {
    val top = df.sample(sampleFraction)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")))
      .first()
    val maxRows =
      if (top.isNullAt(0)) 0L else (top.getLong(0) / sampleFraction).toLong
    bucketsFor(maxRows, targetRowsPerTask)
  }

  /** twoStage with the bucket count chosen by planBuckets. */
  def autoTwoStage(
      df: DataFrame,
      keys: Seq[String],
      saltOn: Seq[Column],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      targetRowsPerTask: Long = 1000000L): DataFrame =
    twoStage(df, keys, planBuckets(df, keys, targetRowsPerTask = targetRowsPerTask),
      saltOn, partialAggs, finalAggs)
}
