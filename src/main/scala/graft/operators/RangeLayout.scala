package graft.operators

import graft.GraftFunctions._
import graft.sketch.Kll
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth range layout from a quantile sketch — the partitioning
  * planner's half of the skew story ([[Joins.saltedJoin]] is the rescue
  * half): boundaries at quantiles i/B give every range bucket ≈ n/B mass
  * (within the sketch's rank error), so range-partitioned writes, sorted
  * layouts and co-located range joins get balanced tasks WITHOUT Spark's
  * RangePartitioner sampling job. The KLL pass is mergeable (salted
  * pre-aggregation, streaming, checkpoint-resumable like every sketch
  * here) and the blob is reusable across queries — at 10^12 rows the
  * sampling job Spark would run per `repartitionByRange` is the thing
  * this replaces.
  *
  * Reference analogue: the expected-probe-cost layout planning over bin
  * fill estimates (src/hixf/build — Classify.scala:269-333's coarse-layout
  * sweep); here the "fill estimate" is a rank sketch over any numeric
  * column.
  */
object RangeLayout {

  /** Interior boundaries at quantiles 1/B .. (B−1)/B from ONE aggregate
    * pass. Deduplicated (a heavy point mass can collapse adjacent
    * quantiles) and sorted; `bucketOf` therefore yields at most B, possibly
    * fewer, buckets. */
  def equiDepthBounds(
      df: DataFrame,
      xCol: String,
      buckets: Int,
      k: Int = 200): Array[Double] = {
    require(buckets >= 2 && buckets <= 4096, s"buckets=$buckets")
    graft.GraftFunctions.register(df.sparkSession)
    val kll = Kll.fromBytes(
      df.agg(kll_agg(col(xCol), k)).first().getAs[Array[Byte]](0))
    (1 until buckets).map(i => kll.quantile(i.toDouble / buckets))
      .distinct.sorted.toArray
  }

  /** Bucket index of `x` under sorted `bounds`: the number of boundaries at
    * or below x — a codegen'd chain of boolean adds (no UDF), row-local,
    * safe to evaluate before any exchange. Engine-portable: the oracle
    * computes the same count from the dumped bounds table. */
  def bucketOf(x: Column, bounds: Array[Double]): Column = {
    require(bounds.sameElements(bounds.sorted), "bounds must be sorted")
    bounds.foldLeft(lit(0))((acc, b) =>
      acc + when(x >= lit(b), 1).otherwise(0)).cast("long")
  }
}
