package graft.operators

import graft.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's `taxor search` pipeline re-expressed in Spark: classify
  * query documents against grouped reference corpora by shingle-set
  * containment (/root/reference/src/main/taxor_search.cpp:153-338).
  *
  * Two physical strategies with identical logical semantics:
  *  - `exact`: inverted shingle equi-join + count (the ground truth; one
  *    shuffle on the shingle hash);
  *  - `sketch`: per-group partitioned Bloom filters built once (salted
  *    two-stage agg), broadcast to the probe side, counted with a single
  *    codegen'd `bloom_count_contained` pass — no shuffle of query shingles
  *    at all, the Spark analogue of probing the static HIXF index.
  *
  * Both end with the reference's filters: a minimum match threshold
  * (threshold.hpp:51-81, percentage mode) and the keep-if
  * `count >= 0.8 * max(count) over query` rule (taxor_search.cpp:275-286).
  */
object Classify {
  val RelMaxFactor = 0.8 // taxor_search.cpp:278

  /** Raw exact match counts, no filters.
    * Output: (query_id, group, match_cnt, query_n).
    *
    * `maxGroupDf`: skew guard for scale — a shingle present in more than
    * this many reference groups (a stopword n-gram) multiplies every query
    * containing it by its group posting list in the join; capping drops it
    * from BOTH sides (and from query_n), i.e. containment over the
    * discriminative shingle universe only — a documented approximation.
    * None (default, used by the byte-equality gates) disables it. */
  def exactCounts(
      corpus: DataFrame, // (group, text)
      queries: DataFrame, // (query_id, text)
      shingleK: Int = 8,
      seed: Long = DefaultSeed,
      maxGroupDf: Option[Long] = None): DataFrame = {
    val groupSh0 = corpus
      .select(col("group"), explode(shingles(col("text"), shingleK, seed = seed)).as("h"))
      .distinct()
    val querySh0 = queries
      .select(col("query_id"), explode(shingles(col("text"), shingleK, seed = seed)).as("h"))
      .distinct()
    val (groupSh, querySh) = maxGroupDf match {
      case Some(cap) =>
        val hot = groupSh0.groupBy("h").agg(count(lit(1)).as("__df"))
          .where(col("__df") > cap).select("h")
        (groupSh0.join(hot, Seq("h"), "left_anti"),
          querySh0.join(hot, Seq("h"), "left_anti"))
      case None => (groupSh0, querySh0)
    }
    val queryN = querySh.groupBy("query_id").agg(count(lit(1)).as("query_n"))
    querySh.join(groupSh, "h")
      .groupBy("query_id", "group")
      .agg(count(lit(1)).as("match_cnt"))
      .join(queryN, "query_id")
      .select("query_id", "group", "match_cnt", "query_n")
  }

  /** Exact classification. Output: (query_id, group, match_cnt, query_n). */
  def exact(
      corpus: DataFrame, // (group, text)
      queries: DataFrame, // (query_id, text)
      shingleK: Int = 8,
      minFraction: Double = 0.1,
      seed: Long = DefaultSeed): DataFrame =
    applyFilters(exactCounts(corpus, queries, shingleK, seed), minFraction)

  /** Raw Bloom-filter match counts, no filters; same shape as exactCounts. */
  def sketchCounts(
      corpus: DataFrame, // (group, text)
      queries: DataFrame, // (query_id, text)
      shingleK: Int = 8,
      expectedShinglesPerGroup: Long = 1 << 17,
      fpp: Double = 0.0039,
      saltBuckets: Int = 8,
      seed: Long = DefaultSeed): DataFrame = {
    val groupSh = corpus.select(col("group"),
      explode(shingles(col("text"), shingleK, seed = seed)).as("h"))
    // salted two-stage Bloom build: skew-proof and byte-identical to direct
    val filters = SaltedAgg.twoStage(
      groupSh, Seq("group"), saltBuckets,
      saltOn = Seq(col("h")),
      partialAggs =
        Seq(bloom_agg_hashed(col("h"), expectedShinglesPerGroup, fpp, seed).as("bf_p")),
      finalAggs =
        Seq(bloom_merge_agg(col("bf_p"), expectedShinglesPerGroup, fpp, seed).as("bf")))
    val probes = queries.select(col("query_id"),
      shingles(col("text"), shingleK, seed = seed).as("hs"))
      .withColumn("query_n", size(col("hs")))
    probes.crossJoin(broadcast(filters))
      .withColumn("match_cnt", bloom_count_contained(col("bf"), col("hs")))
      .where(col("match_cnt") > 0)
      .select("query_id", "group", "match_cnt", "query_n")
  }

  /** Bloom-accelerated classification; identical shape to `exact`. `fpp`
    * controls the overcount slack (reference parity: 0.0039,
    * xorfilter.hpp:60-62). */
  def sketch(
      corpus: DataFrame,
      queries: DataFrame,
      shingleK: Int = 8,
      minFraction: Double = 0.1,
      expectedShinglesPerGroup: Long = 1 << 17,
      fpp: Double = 0.0039,
      saltBuckets: Int = 8,
      seed: Long = DefaultSeed): DataFrame =
    applyFilters(
      sketchCounts(corpus, queries, shingleK, expectedShinglesPerGroup, fpp,
        saltBuckets, seed),
      minFraction)

  /** Classification under a reference-style ADAPTIVE threshold (the SF10
    * dispatcher: percentage / k-mer CI / FracMinHash CI / syncmer table)
    * instead of a fixed fraction — the per-query minimum match count is a
    * codegen'd closed-form expression of query_n evaluated inside the plan
    * (threshold.hpp:51-81's `threshold.get(count)` analogue, no UDF). */
  def exactCI(
      corpus: DataFrame,
      queries: DataFrame,
      mode: graft.functions.Thresholds.Mode,
      shingleK: Int = 8,
      sketchFpr: Double = 0.0,
      seed: Long = DefaultSeed): DataFrame =
    applyFiltersCI(exactCounts(corpus, queries, shingleK, seed), mode, sketchFpr)

  /** Bloom-path twin of exactCI; `fpp` feeds both the filter build and the
    * threshold's fp correction (taxor_search.cpp:262). */
  def sketchCI(
      corpus: DataFrame,
      queries: DataFrame,
      mode: graft.functions.Thresholds.Mode,
      shingleK: Int = 8,
      expectedShinglesPerGroup: Long = 1 << 17,
      fpp: Double = 0.0039,
      saltBuckets: Int = 8,
      seed: Long = DefaultSeed): DataFrame =
    applyFiltersCI(
      sketchCounts(corpus, queries, shingleK, expectedShinglesPerGroup, fpp,
        saltBuckets, seed),
      mode, fpp)

  /** F4 — null-result preservation: queries with no surviving match are
    * re-emitted with a null group (the reference's `-` rows,
    * taxor_search.cpp:268-273 / taxor_profile.cpp:154-158). */
  def withUnmatched(classified: DataFrame, queries: DataFrame): DataFrame =
    classified.unionByName(
      queries.select(col("query_id"))
        .join(classified.select("query_id").distinct(),
          Seq("query_id"), "left_anti")
        .withColumn("group", lit(null).cast("string"))
        .withColumn("match_cnt", lit(null).cast("long"))
        .withColumn("query_n", lit(null).cast("long")))

  /** Threshold + relative-max filters shared by both strategies. */
  private def applyFilters(counts: DataFrame, minFraction: Double): DataFrame = {
    val w = Window.partitionBy("query_id")
    counts
      .where(col("match_cnt") >= lit(minFraction) * col("query_n"))
      .withColumn("mx", max(col("match_cnt")).over(w))
      .where(col("match_cnt") >= lit(RelMaxFactor) * col("mx"))
      .select("query_id", "group", "match_cnt", "query_n")
  }

  private def applyFiltersCI(
      counts: DataFrame,
      mode: graft.functions.Thresholds.Mode,
      sketchFpr: Double): DataFrame = {
    val w = Window.partitionBy("query_id")
    counts
      .where(col("match_cnt") >=
        graft.functions.Thresholds.minMatchesCol(col("query_n"), mode, sketchFpr))
      .withColumn("mx", max(col("match_cnt")).over(w))
      .where(col("match_cnt") >= lit(RelMaxFactor) * col("mx"))
      .select("query_id", "group", "match_cnt", "query_n")
  }
}
